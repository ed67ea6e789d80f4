package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic sampling / splitting (round 5) — the missing third leg
  * of the training-data-pipeline triad (dedup, quality, SAMPLE): every
  * large corpus job ends in "take a reproducible X% / exactly-k-per-
  * stratum / train-val-test cut", and it must be DETERMINISTIC (same
  * doc → same side on every run, engine, and partitioning — a random()
  * sample is neither reproducible nor oracle-able).
  *
  * The splitting hash is a 32-bit multiplicative mix computed in plain
  * BIGINT arithmetic: h = ((id mod 2^31)·2654435761 + 1013904223) mod
  * 2^32, bucket = h·100 div 2^32 (the HIGH bits — the low bits of an
  * LCG-style mix are weak). The id pre-folds into 2^31 BEFORE the
  * multiply, so the product is < 2^62 for ANY non-negative int64 id —
  * without the fold, ids ≥ ~3.5e9 overflow the multiply, which DuckDB
  * rejects and Spark's ANSI mode throws on (the 10× ScaleProbe's
  * shifted ids found exactly that; avoiding overflow entirely is the
  * only portable contract). Ids congruent mod 2^31 share a bucket —
  * fine for sampling, stated for the record. At 100 TB the hash is one
  * codegen'd projection — no shuffle, no state — and the per-stratum
  * variant is a single window top-k per group.
  */
object Sampling {

  /** Knuth multiplicative constant + LCG increment, mod 2^32. */
  private val MixMul = 2654435761L
  private val MixAdd = 1013904223L
  private val Mod32 = 4294967296L
  private val Fold31 = 2147483648L

  /** 0..99 bucket from the high bits of the mixed id — Column side.
    * `h·100 div 2^32` is a shiftright, NOT `/` (Spark's `/` on longs is
    * double division; the shift keeps everything in exact int64).
    */
  // private[graft] so tests exercise the REAL bucket function instead of
  // re-implementing its constants (review r5)
  private[graft] def bucket(id: Column): Column =
    shiftright(mix(id) * lit(100L), 32)

  /** The same bucket in DuckDB SQL (integer div via //). */
  private[ops] def bucketSql(id: String): String =
    s"(${mixSql(id)} * 100) // $Mod32"

  /** Raw 32-bit mix (for smallest-k ordering) — Column + SQL twins. */
  private[ops] def mix(id: Column): Column =
    ((id % lit(Fold31)) * lit(MixMul) + lit(MixAdd)) % lit(Mod32)
  private[ops] def mixSql(id: String): String =
    s"((($id % $Fold31) * $MixMul + $MixAdd) % $Mod32)"

  /** 10% reproducible sample of documents: census of the kept rows.
    * The checksum pins EXACTLY which rows were kept, not just how many.
    */
  private val sampleHash = QueryDef(
    "q_sample_hash",
    (s, d) =>
      Tables.documents(s, d)
        .filter(bucket(col("doc_id")) < 10)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy(ascf("lang")),
    Some(s"""SELECT lang, count(*) AS n_docs,
            |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
            |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
            |FROM documents WHERE ${bucketSql("doc_id")} < 10
            |GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Exactly-k-per-stratum sample: the 20 smallest-mix docs per lang
    * (ties broken by doc_id — the mix is injective mod 2^32 only for
    * ids < 2^32, so the tiebreak keeps the order total regardless).
    * This is the distributed form of per-stratum reservoir sampling
    * with a fixed seed: one window top-k per group, no global sort.
    */
  private val sampleStratified = QueryDef(
    "q_sample_stratified",
    (s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(ascf(col("h")), ascf(col("doc_id")))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), col("n_chars"),
          mix(col("doc_id")).as("h"))
        .withColumn("rnk", row_number().over(w).cast("bigint"))
        .filter(col("rnk") <= 20)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_checksum"),
          min(col("h")).as("min_h"), max(col("h")).as("max_h"))
        .orderBy(ascf("lang"))
    },
    Some(s"""WITH h AS (SELECT lang, doc_id, n_chars,
            |    ${mixSql("doc_id")} AS h FROM documents),
            |r AS (SELECT *, row_number() OVER (PARTITION BY lang
            |    ORDER BY h ASC, doc_id ASC) AS rnk FROM h)
            |SELECT lang, count(*) AS n_docs,
            |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
            |  CAST(min(h) AS BIGINT) AS min_h, CAST(max(h) AS BIGINT) AS max_h
            |FROM r WHERE rnk <= 20
            |GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Reproducible 90/5/5 train/val/test split: per (lang, split) census.
    * The same hash bucket that drives q_sample_hash routes each doc, so
    * sample and split decisions compose consistently across jobs.
    */
  private val splitTrainVal = QueryDef(
    "q_split_train_val",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("split",
          when(bucket(col("doc_id")) < 90, lit("train"))
            .when(bucket(col("doc_id")) < 95, lit("val"))
            .otherwise(lit("test")))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy(ascf("lang"), ascf("split")),
    Some(s"""WITH b AS (SELECT lang, n_chars, doc_id,
            |    CASE WHEN ${bucketSql("doc_id")} < 90 THEN 'train'
            |         WHEN ${bucketSql("doc_id")} < 95 THEN 'val'
            |         ELSE 'test' END AS split
            |  FROM documents)
            |SELECT lang, split, count(*) AS n_docs,
            |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
            |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
            |FROM b GROUP BY lang, split
            |ORDER BY lang ASC NULLS FIRST, split ASC NULLS FIRST""".stripMargin))

  /** Deterministic bootstrap resampling (round 5): B = 16 replicas of
    * the corpus, each doc drawn w ∈ {0,1,2,3} times per replica by a
    * Poisson(1)-CDF threshold test on the shared mix hash of
    * (doc_id·16 + j) — the with-replacement draw a bootstrap needs,
    * with ZERO variance across runs/engines/partitionings (`rand()`
    * bootstrap is neither reproducible nor oracle-able). Thresholds
    * are the Poisson(1) CDF in exact 2³²-units (e⁻¹, 2e⁻¹, 2.5e⁻¹
    * cumulative → 1580030169 / 3160060338 / 3950075423; the ≥ 4 tail,
    * mass ~1.9%, rounds into w = 3 — a pinned, documented truncation).
    * Per-replica mean doc length: the spread across the 16 rows IS the
    * bootstrap standard error of the corpus mean — error bars for any
    * corpus statistic without a second pass over history.
    *
    * A threshold test is immune to the sequential-id structure that
    * biased the HLL's trailing-zero test on a linear hash: an
    * arithmetic progression equidistributes over [0, 2³²), so the
    * fraction below each threshold converges correctly (same argument
    * as the sample/split keys).
    *
    * Scale: ×16 lane explode is map-side projection; the shuffle
    * carries 16 partial rows per map partition. sum_len·10⁶ widened to
    * DECIMAL(38,0)/HUGEINT (overflows int64 past ~9·10¹² total chars).
    */
  private val sampleBootstrap = QueryDef(
    "q_sample_bootstrap",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          explode(sequence(lit(0L), lit(15L))).as("j"))
        .withColumn("u", mix(col("doc_id") * 16 + col("j")))
        .withColumn("w",
          when(col("u") < 1580030169L, 0L)
            .when(col("u") < 3160060338L, 1L)
            .when(col("u") < 3950075423L, 2L)
            .otherwise(3L))
        .groupBy(col("j"))
        .agg(sum(col("w")).as("n_drawn"),
          sum(col("w") * col("n_chars")).as("sum_len"))
        .withColumn("mean_len_e6", expr(
          "CAST(sum_len AS DECIMAL(38,0)) * 1000000 div n_drawn"))
        .select(col("j"), col("n_drawn"), col("sum_len"),
          col("mean_len_e6"))
        .orderBy(ascf("j")),
    Some(s"""WITH l AS (SELECT doc_id, n_chars, r.range AS j
           |  FROM documents CROSS JOIN range(16) r),
           |u AS (SELECT j, n_chars,
           |    ${mixSql("(doc_id * 16 + j)")} AS u FROM l),
           |w AS (SELECT j, n_chars,
           |    CASE WHEN u < 1580030169 THEN 0
           |         WHEN u < 3160060338 THEN 1
           |         WHEN u < 3950075423 THEN 2 ELSE 3 END AS w FROM u),
           |a AS (SELECT j, CAST(sum(w) AS BIGINT) AS n_drawn,
           |    CAST(sum(w * n_chars) AS BIGINT) AS sum_len
           |  FROM w GROUP BY j)
           |SELECT j, n_drawn, sum_len,
           |  CAST(CAST(sum_len AS HUGEINT) * 1000000 // n_drawn AS BIGINT)
           |    AS mean_len_e6
           |FROM a ORDER BY j ASC NULLS FIRST""".stripMargin))

  /** Class-balanced downsampling (round 7): every embedding label class
    * cut to the MINORITY class's size — the rebalancing step before
    * training any classifier on skewed labels (q_sample_stratified
    * takes a FIXED k per stratum; here k is data-derived, so the output
    * is balance-invariant under any label drift).
    *
    * Determinism: within each label, rows rank by the same injective
    * mix hash every sampler shares (doc_id tiebreak), so the kept set
    * is a pure function of the data; the minority size comes from a
    * broadcast 1-row min over the label census.
    *
    * Scale: one label-partitioned window top-k (bounded partitions —
    * labels are balanced within ~2× here) + a label-grain census join;
    * no global sort, no second corpus pass (the census derives from
    * the same grouped relation).
    */
  private val sampleBalanced = QueryDef(
    "q_sample_balanced",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("long").as("label"))
      val counts = graft.Caches.scoped(
        e.groupBy(col("label")).agg(count(lit(1)).as("n_before")))
      val kmin = counts.agg(min(col("n_before")).as("k"))
      val w = Window.partitionBy(col("label"))
        .orderBy(ascf(mix(col("vec_id"))), ascf("vec_id"))
      e.withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(kmin))
        .filter(col("rn") <= col("k"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("vec_id")).as("id_checksum"))
        .join(broadcast(counts), "label")
        .select(col("label"), col("n_before"), col("n_kept"),
          col("id_checksum"))
        .orderBy(ascf("label"))
    },
    Some(s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label
            |  FROM embeddings),
            |c AS (SELECT label, CAST(count(*) AS BIGINT) AS n_before
            |  FROM e GROUP BY label),
            |k AS (SELECT min(n_before) AS k FROM c),
            |r AS (SELECT label, vec_id, row_number() OVER (
            |    PARTITION BY label
            |    ORDER BY ${mixSql("vec_id")} ASC NULLS FIRST,
            |      vec_id ASC NULLS FIRST) AS rn
            |  FROM e),
            |kept AS (SELECT label, CAST(count(*) AS BIGINT) AS n_kept,
            |    CAST(sum(vec_id) AS BIGINT) AS id_checksum
            |  FROM r, k WHERE rn <= k GROUP BY label)
            |SELECT c.label, c.n_before, kept.n_kept, kept.id_checksum
            |FROM kept JOIN c ON kept.label = c.label
            |ORDER BY c.label ASC NULLS FIRST""".stripMargin))

  /** Rendezvous (highest-random-weight) sharding (round 7): each
    * document goes to the shard with the highest mix-hash of
    * (doc, shard) — the consistent-assignment primitive behind
    * coordinator-free shard maps. The graded exhibit is the
    * consistent-hashing GUARANTEE itself: the same assignment is
    * computed for 8 shards and for 9, and every document that moves
    * must move INTO the new shard 9 — rendezvous never reshuffles
    * between surviving shards, so n_moved is exactly the new shard's
    * population and everything else stays put (vs mod-N sharding,
    * which moves ~8/9 of all keys).
    *
    * Scale: the score relation is a 9× fan-out of the corpus keys (a
    * generate, no join); the per-doc argmax partitions by doc_id — at
    * fleet scale the same argmax runs as a max(struct) aggregate with
    * map-side partials. Census is shard-count-sized.
    *
    * Determinism (D2): the shared 32-bit integer mix ([[mix]]); score
    * ties break by shard ASC on both engines.
    */
  private val shardRendezvous = QueryDef(
    "q_shard_rendezvous",
    (s, d) => {
      val scored = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("shard", explode(sequence(lit(0L), lit(8L))))
        .withColumn("score", mix(col("doc_id") * 31 + col("shard")))
      val w8 = Window.partitionBy(col("doc_id"))
        .orderBy(descl("score"), ascf("shard"))
      val a8 = scored.filter(col("shard") <= 7)
        .withColumn("rn", row_number().over(w8)).filter(col("rn") === 1)
        .select(col("doc_id"), col("shard").as("shard8"))
      val a9 = scored
        .withColumn("rn", row_number().over(w8)).filter(col("rn") === 1)
        .select(col("doc_id").as("doc9"), col("shard").as("shard9"))
      a8.join(a9, col("doc_id") === col("doc9"))
        .groupBy(col("shard8"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_checksum"),
          sum(when(col("shard9") =!= col("shard8"), 1L).otherwise(0L))
            .as("n_moved"),
          sum(when(col("shard9") =!= col("shard8") &&
            col("shard9") =!= 8, 1L).otherwise(0L))
            .as("n_moved_sideways"))
        .orderBy(ascf("shard8"))
    },
    Some(s"""WITH sc AS (SELECT doc_id, sh.shard,
           |    ${mixSql("(doc_id * 31 + sh.shard)")} AS score
           |  FROM documents
           |  CROSS JOIN (SELECT unnest(range(0, 9)) AS shard) sh),
           |a8 AS (SELECT doc_id, shard AS shard8 FROM (
           |    SELECT doc_id, shard, row_number() OVER (
           |      PARTITION BY doc_id ORDER BY score DESC, shard ASC)
           |      AS rn
           |    FROM sc WHERE shard <= 7) WHERE rn = 1),
           |a9 AS (SELECT doc_id, shard AS shard9 FROM (
           |    SELECT doc_id, shard, row_number() OVER (
           |      PARTITION BY doc_id ORDER BY score DESC, shard ASC)
           |      AS rn
           |    FROM sc) WHERE rn = 1)
           |SELECT CAST(a8.shard8 AS BIGINT) AS shard8,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(a8.doc_id) AS BIGINT) AS id_checksum,
           |  CAST(sum(CASE WHEN a9.shard9 <> a8.shard8 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_moved,
           |  CAST(sum(CASE WHEN a9.shard9 <> a8.shard8
           |      AND a9.shard9 <> 8 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_moved_sideways
           |FROM a8 JOIN a9 ON a8.doc_id = a9.doc_id
           |GROUP BY a8.shard8
           |ORDER BY shard8 ASC NULLS FIRST""".stripMargin))

  /** Stratified systematic sampling (round 7): within each nation,
    * order customers by the avalanche mix (a deterministic "random"
    * order), then keep every 17th starting at offset 3 — the classic
    * every-k-th survey design (cheap, evenly spread through the frame,
    * exactly reproducible), per-stratum so every nation is covered at
    * the same rate. Complements [[sampleHash]] (Bernoulli by hash:
    * binomially NOISY per-stratum counts) with the FIXED-rate design:
    * the kept count per stratum is ⌈(n−3)/17⌉ by construction, which
    * the census grades.
    *
    * Scale: rank = one window partitioned by the stratum (parallel
    * per-nation sorts); census nation-sized. At fleet scale the same
    * design runs on any key the frame is already sorted/bucketed by.
    *
    * Determinism (D1/D2): (mix, custkey) is a total order; the kept
    * SET is pinned by an id checksum, not just counts.
    */
  private val sampleSystematic = QueryDef(
    "q_sample_systematic",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(ascf("mx"), ascf("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
        .withColumn("mx", mix(col("c_custkey")))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(pmod(col("rn"), lit(17)) === 3, 1L).otherwise(0L))
            .as("n_kept"),
          coalesce(sum(when(pmod(col("rn"), lit(17)) === 3,
            col("c_custkey"))), lit(0L)).as("kept_checksum"))
        .orderBy(ascf("nationkey"))
    },
    Some(s"""WITH r AS (SELECT c_custkey, c_nationkey,
           |    row_number() OVER (PARTITION BY c_nationkey
           |      ORDER BY ${mixSql("c_custkey")} ASC, c_custkey ASC) AS rn
           |  FROM customer)
           |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           |  CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CASE WHEN rn % 17 = 3 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_kept,
           |  CAST(coalesce(sum(CASE WHEN rn % 17 = 3 THEN c_custkey END), 0)
           |    AS BIGINT) AS kept_checksum
           |FROM r GROUP BY c_nationkey
           |ORDER BY nationkey ASC NULLS FIRST""".stripMargin))

  /** Consistent-hash ring placement (round 7): 16 virtual nodes per
    * shard on the mix-hash ring, each key owned by its clockwise
    * successor vnode — the OTHER standard minimal-movement placement
    * scheme next to [[shardRendezvous]] (HRW scores per node; the ring
    * binary-searches one precomputed structure, which is why caches
    * and distributed stores ship it). Graded on both rings: the 4-shard
    * assignment census AND the movement when shard 4 joins —
    * consistent hashing's contract is that keys only move TO the new
    * shard (n_moved_sideways = 0 by construction, and by grade).
    *
    * The ring is PRECOMPUTED in Scala from the same mix() formula and
    * shipped as parallel sorted literal arrays into both engines (the
    * LSH-hyperplane precedent: no arithmetic re-derivation in SQL to
    * keep in sync); lookup is count(positions < key) — a per-row
    * expression over a 64/80-literal array, NO explode and NO window,
    * so the plan is one corpus-sized projection + a shard-sized census
    * (cheaper than rendezvous's ×N score explode; at fleet scale this
    * is the same broadcast-ring lookup every router does).
    *
    * Determinism: vnode positions are distinct (asserted at
    * construction — alignment of the parallel arrays cannot silently
    * break); integer compares only.
    */
  private val shardConsistent = {
    def posOf(shard: Long, vnode: Long): Long = {
      val id = shard * 1000L + vnode
      ((id % Fold31) * MixMul + MixAdd) % Mod32
    }
    def ring(nShards: Int): (Seq[Long], Seq[Long]) = {
      val pv = for (sh <- 0 until nShards; v <- 0 until 16)
        yield (posOf(sh.toLong, v.toLong), sh.toLong)
      require(pv.map(_._1).distinct.size == pv.size,
        "vnode position collision — pick different vnode ids")
      val sorted = pv.sortBy(_._1)
      (sorted.map(_._1), sorted.map(_._2))
    }
    val (pos4, own4) = ring(4)
    val (pos5, own5) = ring(5)
    def lookup(posArr: Seq[Long], ownArr: Seq[Long], kp: Column): Column =
      element_at(typedlit(ownArr),
        (size(filter(typedlit(posArr), p => p < kp)) % posArr.size) + 1)
    def sqlArr(a: Seq[Long]): String = a.mkString("[", ", ", "]")
    def lookupSql(posArr: Seq[Long], ownArr: Seq[Long], kp: String): String =
      s"""list_extract(${sqlArr(ownArr)},
         |    (len(list_filter(${sqlArr(posArr)}, p -> p < $kp))
         |      % ${posArr.size}) + 1)""".stripMargin
    QueryDef(
      "q_shard_consistent",
      (s, d) =>
        Tables.documents(s, d).select(col("doc_id"))
          .withColumn("kp", mix(col("doc_id")))
          .withColumn("shard4", lookup(pos4, own4, col("kp")))
          .withColumn("shard5", lookup(pos5, own5, col("kp")))
          .groupBy(col("shard4"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_checksum"),
            sum(when(col("shard5") =!= col("shard4"), 1L).otherwise(0L))
              .as("n_moved"),
            sum(when(col("shard5") =!= col("shard4") &&
              col("shard5") =!= 4, 1L).otherwise(0L))
              .as("n_moved_sideways"))
          .orderBy(ascf("shard4")),
      Some(s"""WITH k AS (SELECT doc_id, ${mixSql("doc_id")} AS kp
             |  FROM documents),
             |a AS (SELECT doc_id,
             |    ${lookupSql(pos4, own4, "kp")} AS shard4,
             |    ${lookupSql(pos5, own5, "kp")} AS shard5
             |  FROM k)
             |SELECT CAST(shard4 AS BIGINT) AS shard4,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
             |  CAST(sum(CASE WHEN shard5 <> shard4 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_moved,
             |  CAST(sum(CASE WHEN shard5 <> shard4 AND shard5 <> 4
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_sideways
             |FROM a GROUP BY shard4
             |ORDER BY shard4 ASC NULLS FIRST""".stripMargin))
  }

  /** Deterministic weighted sampling WITHOUT replacement (round 7):
    * Efraimidis–Spirtakis A-ES — each doc draws u ∈ (0,1] from the
    * shared mix hash and is ranked by the exponential key −ln(u)/w
    * (equivalently u^(1/w) descending); the k smallest keys per lang
    * are EXACTLY a weight-proportional without-replacement sample.
    * Weight = character mass, so the sampler is the "pick docs
    * proportional to token budget" curation pass — q_sample_hash's
    * uniform cut and q_sample_stratified's per-stratum top-k can't
    * express inclusion ∝ size; A-ES is the standard one-pass
    * distributed answer (and at 100 TB it is a codegen'd projection +
    * one per-group top-k — the same shape as q_sample_stratified, no
    * extra shuffle, trivially reservoir-mergeable per partition).
    *
    * Determinism: u = (mix(id)+1)/2³² never materializes — the key is
    * −ln u = ln 2³² − lnInt(mix+1), with ln 2³² the EXACT double
    * 32·LN2 (a power-of-two scaling of the nearest-double LN2 literal
    * — no rounding, spliced as the same literal in both engines) and
    * lnInt the staged D12 ladder; the division by the exact double of
    * int w is correctly rounded over bit-identical operands; the sort
    * key is floor(key·1e12) int64 (≤ 2.3e13) with doc_id tiebreak —
    * fully integer ordering, no double ever compared.
    */
  private val sampleWeighted = QueryDef(
    "q_sample_weighted",
    (s, d) => {
      import graft.functions.DetMath
      val L = lit(22.18070977791825) // ln(2^32) = 32·LN2, exact
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("w", greatest(col("n_chars"), lit(1L)))
        .withColumn("h1", mix(col("doc_id")) + lit(1L))
        .withColumn("key_e12",
          floor((L - DetMath.lnInt(col("h1"))) / col("w").cast("double")
            * lit(1000000000000.0)).cast("long"))
      val rn = Window.partitionBy(col("lang"))
        .orderBy(ascf("key_e12"), ascf("doc_id"))
      scored.withColumn("rn", row_number().over(rn))
        .filter(col("rn") <= 16)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("kept_chars"),
          sum(col("doc_id")).as("id_checksum"),
          max(col("key_e12")).as("max_key_e12"))
        .orderBy(ascf("lang"))
    },
    Some {
      import graft.functions.DetMath._
      s"""WITH base AS (SELECT doc_id, lang, n_chars,
         |    greatest(n_chars, 1) AS w,
         |    ${mixSql("doc_id")} + 1 AS h1
         |  FROM documents),
         |r1 AS (SELECT *, ${kSql("h1")} AS kh FROM base),
         |r2 AS (SELECT *, ${mSql("h1", "kh")} AS mh FROM r1),
         |r3 AS (SELECT *, ${zSql("mh")} AS zh FROM r2),
         |r4 AS (SELECT *, zh * zh AS z2h FROM r3),
         |r5 AS (SELECT *, ${hornerSql("z2h")} AS hh FROM r4),
         |keyed AS (SELECT doc_id, lang, n_chars,
         |    CAST(floor((CAST('22.18070977791825' AS DOUBLE)
         |      - ${lnSql("kh", "zh", "hh")}) / CAST(w AS DOUBLE)
         |      * CAST(1000000000000 AS DOUBLE)) AS BIGINT) AS key_e12
         |  FROM r5),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY lang
         |    ORDER BY key_e12 ASC NULLS FIRST, doc_id ASC NULLS FIRST)
         |    AS rn FROM keyed)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(n_chars) AS BIGINT) AS kept_chars,
         |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
         |  CAST(max(key_e12) AS BIGINT) AS max_key_e12
         |FROM ranked WHERE rn <= 16
         |GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin
    })

  /** Orthogonal experiment layers (round 7): the experimentation-
    * platform assignment primitive — every user is hashed into a
    * bucket INDEPENDENTLY per layer (two concurrent experiments must
    * not correlate, or one's treatment contaminates the other's
    * control). Two 20-bucket layers via the mod-prime hash family with
    * different (multiplier, offset) salts; the census grades, per
    * layer-1 bucket: its size, how many distinct layer-2 buckets its
    * users land in (full spread = 20), the largest/smallest joint
    * cell, and the joint collision statistic Σcell² whose excess over
    * n²/20 measures dependence — the orthogonality audit every
    * layered-experiment platform runs before launch.
    *
    * Scale: assignment is stateless per-row hashing (the whole point:
    * no assignment table at any user count); the joint census is one
    * 400-cell partial agg.
    *
    * Determinism: the mod-prime family with a SQUARING round spelled
    * identically in both engines (plain affine maps of contiguous keys
    * correlate across layers — measured 5x the independent collision
    * mass — the squaring restores orthogonality); pure integer
    * counting.
    */
  private val sampleLayers = QueryDef(
    "q_sample_layers",
    (s, d) => {
      // affine-only maps of CONTIGUOUS keys correlate across layers
      // (measured 5x the independent collision mass) — squaring the
      // mixed value before the final mod decorrelates (measured ratio
      // 1.00 at 150/1500/15000 keys)
      def bucket(a: Long, b: Long) =
        expr(s"(((c_custkey % 2147483647) * ${a}L + ${b}L) % 2147483647) " +
          s"* (((c_custkey % 2147483647) * ${a}L + ${b}L) % 2147483647) " +
          s"% 2147483647 % 20")
      val assigned = Tables.customer(s, d)
        .select(col("c_custkey"),
          bucket(1299721L, 7L).as("b1"),
          bucket(15485863L, 101L).as("b2"))
      val cells = assigned.groupBy(col("b1"), col("b2"))
        .agg(count(lit(1)).as("n"))
      cells.groupBy(col("b1"))
        .agg(sum(col("n")).as("n_users"),
          count(lit(1)).as("n_b2_spread"),
          max(col("n")).as("max_cell"),
          min(col("n")).as("min_cell"),
          sum(col("n") * col("n")).as("collision_stat"))
        .orderBy(ascf("b1"))
    },
    Some("""WITH v AS (SELECT c_custkey,
           |    ((c_custkey % 2147483647) * 1299721 + 7) % 2147483647 AS v1,
           |    ((c_custkey % 2147483647) * 15485863 + 101) % 2147483647 AS v2
           |  FROM customer),
           |a AS (SELECT c_custkey,
           |    v1 * v1 % 2147483647 % 20 AS b1,
           |    v2 * v2 % 2147483647 % 20 AS b2
           |  FROM v),
           |c AS (SELECT b1, b2, count(*) AS n FROM a GROUP BY 1, 2)
           |SELECT b1, CAST(sum(n) AS BIGINT) AS n_users,
           |  CAST(count(*) AS BIGINT) AS n_b2_spread,
           |  CAST(max(n) AS BIGINT) AS max_cell,
           |  CAST(min(n) AS BIGINT) AS min_cell,
           |  CAST(sum(n * n) AS BIGINT) AS collision_stat
           |FROM c GROUP BY b1
           |ORDER BY b1 ASC NULLS FIRST""".stripMargin))

  /** Balanced range-split boundaries (round 8, batch 99): the artifact
    * a range partitioner / TeraSort job computes before it can shuffle —
    * cut the corpus's total (l_partkey, l_orderkey, l_linenumber) order
    * into 16 EXACTLY balanced splits and publish each split's row
    * count and inclusive key range. Sampled-boundary partitioners
    * (RangePartitioner, TeraSort's sampler) approximate this; the
    * exact version is the ground truth they are judged against, and
    * writing it IS a distributed job (the sort the splits describe).
    *
    * Scale: the cut is `Dsl.globalNtile` — a range-partitioned
    * two-pass assignment with no single-partition window — followed by
    * a 16-group aggregate; nothing corpus-sized crosses a boundary
    * twice. Boundary monotonicity (split i's hi ≤ split i+1's lo on
    * the full sort key) is implied by the exact tile assignment and
    * hash-graded via the per-split min/max.
    *
    * Determinism (D1): the sort key is a superkey of lineitem's PK, so
    * the total order is unique; counts/min/max are order-free.
    */
  private val shardRangeSplits = QueryDef(
    "q_shard_range_splits",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_partkey").cast("long").as("pk"),
        col("l_orderkey"), col("l_linenumber"))
      globalNtile(li, 16, "split_id",
          Seq(ascf("pk"), ascf("l_orderkey"), ascf("l_linenumber")))
        .groupBy(col("split_id").cast("long").as("split_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("pk")).as("key_lo"), max(col("pk")).as("key_hi"))
        .orderBy(ascf("split_id"))
    },
    Some("""WITH t AS (SELECT CAST(l_partkey AS BIGINT) AS pk,
           |    ntile(16) OVER (ORDER BY CAST(l_partkey AS BIGINT) ASC,
           |      l_orderkey ASC, l_linenumber ASC) AS split_id
           |  FROM lineitem)
           |SELECT CAST(split_id AS BIGINT) AS split_id,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(min(pk) AS BIGINT) AS key_lo,
           |  CAST(max(pk) AS BIGINT) AS key_hi
           |FROM t GROUP BY 1
           |ORDER BY split_id ASC NULLS FIRST""".stripMargin))

  /** Neyman (optimal) stratified allocation (round 10): given a total
    * sample budget of 10,000 rows, allocate per stratum proportionally
    * to N_h·σ_h — the allocation that minimizes the estimator variance,
    * vs q_sample_stratified's equal/proportional take. Strata are the
    * return-flag segments; σ is the within-stratum standard deviation
    * of the price in cents. The allocation integerizes by the same
    * largest-remainder (Hamilton) rule as q_win_alloc, so the seats sum
    * EXACTLY to the budget.
    *
    * Determinism (D2/D12): per-stratum moments are exact (decimal-
    * staged c·Σx² − (Σx)², then one exact decimal floor division by c²
    * → an int64 variance in cents² that stays < 2^53), so
    * floor(sqrt(var)) is one correctly-rounded IEEE op on an EXACTLY
    * representable integer input on both engines (the
    * q_mix_temperature discipline); everything after is integer.
    *
    * Scale: one fact scan → 3-stratum moment census with map-side
    * partials; the allocation runs on 3 rows.
    */
  private val sampleNeyman = QueryDef(
    "q_sample_neyman",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_returnflag").as("stratum"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("x"))
      val mo = li.groupBy(col("stratum"))
        .agg(count(lit(1)).as("n_rows"), sum(col("x")).as("sx"),
          sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"))
        .withColumn("var_cents2",
          expr("""cast((cast(n_rows as decimal(38,0)) * sxx
                 |  - cast(sx as decimal(38,0)) * sx)
                 |  div (cast(n_rows as decimal(38,0)) * n_rows) as bigint)"""
            .stripMargin))
        .withColumn("sigma_cents",
          floor(sqrt(col("var_cents2").cast("double"))).cast("long"))
        .withColumn("w", col("n_rows") * col("sigma_cents"))
      val t = mo.agg(sum(col("w")).as("t"))
      val q = mo.join(broadcast(t))
        .select(col("stratum"), col("n_rows"), col("sigma_cents"),
          expr("(10000 * w) div t").as("base_alloc"),
          expr("(10000 * w) % t").as("rem"))
      val left = q.agg((lit(10000L) - sum(col("base_alloc"))).as("r"))
      q.withColumn("rk",
          row_number().over(Window.orderBy(descl("rem"), ascf("stratum"))))
        .join(broadcast(left))
        .select(col("stratum"), col("n_rows"), col("sigma_cents"),
          col("base_alloc"),
          (col("base_alloc") + when(col("rk") <= col("r"), 1L)
            .otherwise(0L)).as("alloc"))
        .orderBy(ascf("stratum"))
    },
    Some("""WITH li AS (SELECT l_returnflag AS stratum,
           |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS x
           |  FROM lineitem),
           |mo AS (SELECT stratum, count(*) AS n_rows,
           |    CAST(sum(x) AS BIGINT) AS sx,
           |    sum(CAST(x AS HUGEINT) * x) AS sxx
           |  FROM li GROUP BY stratum),
           |v AS (SELECT stratum, n_rows,
           |    CAST((CAST(n_rows AS HUGEINT) * sxx
           |      - CAST(sx AS HUGEINT) * sx)
           |      // (CAST(n_rows AS HUGEINT) * n_rows) AS BIGINT)
           |      AS var_cents2
           |  FROM mo),
           |sg AS (SELECT stratum, n_rows,
           |    CAST(floor(sqrt(CAST(var_cents2 AS DOUBLE))) AS BIGINT)
           |      AS sigma_cents
           |  FROM v),
           |w AS (SELECT stratum, n_rows, sigma_cents,
           |    n_rows * sigma_cents AS w FROM sg),
           |t AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM w),
           |q AS (SELECT stratum, n_rows, sigma_cents,
           |    CAST((10000 * w) // t.t AS BIGINT) AS base_alloc,
           |    CAST((10000 * w) % t.t AS BIGINT) AS rem
           |  FROM w CROSS JOIN t),
           |lft AS (SELECT 10000 - sum(base_alloc) AS r FROM q),
           |rk AS (SELECT stratum, n_rows, sigma_cents, base_alloc,
           |    row_number() OVER (ORDER BY rem DESC, stratum ASC) AS rk
           |  FROM q)
           |SELECT stratum, CAST(n_rows AS BIGINT) AS n_rows, sigma_cents,
           |  base_alloc,
           |  CAST(base_alloc + CASE WHEN rk <= lft.r THEN 1 ELSE 0 END
           |    AS BIGINT) AS alloc
           |FROM rk CROSS JOIN lft
           |ORDER BY stratum ASC NULLS FIRST""".stripMargin))

  def defs: Seq[QueryDef] = Seq(sampleHash, sampleStratified, splitTrainVal,
    sampleBootstrap, sampleBalanced, shardRendezvous, sampleSystematic,
    shardConsistent, sampleWeighted, sampleLayers, shardRangeSplits,
    sampleNeyman)
}
