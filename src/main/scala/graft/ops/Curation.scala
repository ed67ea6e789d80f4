package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators (round 5): the two training-data steps
  * between "dedup/quality" and "train" that the inventory still lacked —
  * sequence PACKING (fill fixed token budgets for batch construction)
  * and benchmark DECONTAMINATION (drop documents that collide with an
  * eval set).
  */
object Curation {

  /** Deterministic sequence packing: documents are laid out per lang in
    * doc_id order, and each doc is assigned to the token-budget bin its
    * START offset falls in — bin = (cumsum − ntok) div B with a running
    * window sum. This is the distributed form of fixed-order greedy
    * packing: one window pass, no sequential state, bit-reproducible —
    * the properties that matter when building training batches over
    * 100 TB (a true first-fit packer is inherently sequential; fixed-
    * order bin-by-offset is the standard parallel approximation, and
    * its fill efficiency is what the output measures). Budget B = 1024
    * tokens. Output: per-lang bin census + fill efficiency (double out,
    * D9/D10 pinned).
    */
  private val packSequences = QueryDef(
    "q_pack_sequences",
    (s, d) => {
      val budget = 1024L
      val w = Window.partitionBy(col("lang")).orderBy(ascf("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val binned = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
        .withColumn("cum", sum(col("ntok")).over(w))
        // budget is 2^10, so the bin index is a shift — exact int64
        // (Spark's `/` on longs would be double division)
        .withColumn("bin", shiftright(col("cum") - col("ntok"), 10))
      val fills = binned.groupBy(col("lang"), col("bin"))
        .agg(sum(col("ntok")).as("fill"), count(lit(1)).as("nd"))
      fills.groupBy(col("lang"))
        .agg(sum(col("nd")).as("n_docs"),
          sum(col("fill")).as("total_tok"),
          count(lit(1)).as("n_bins"),
          max(col("fill")).as("max_fill"),
          (round(sum(col("fill")).cast("double") /
            (count(lit(1)) * budget).cast("double"), 4) + lit(0.0))
            .as("fill_ratio"))
        .orderBy(ascf("lang"))
    },
    Some("""WITH t AS (SELECT lang, doc_id,
           |    CAST(length(string_split(text, ' ')) AS BIGINT) AS ntok
           |  FROM documents),
           |c AS (SELECT lang, doc_id, ntok,
           |    sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id ASC
           |      ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM t),
           |b AS (SELECT lang, ntok, (cum - ntok) // 1024 AS bin FROM c),
           |f AS (SELECT lang, bin, CAST(sum(ntok) AS BIGINT) AS fill,
           |    count(*) AS nd FROM b GROUP BY lang, bin)
           |SELECT lang, CAST(sum(nd) AS BIGINT) AS n_docs,
           |  CAST(sum(fill) AS BIGINT) AS total_tok,
           |  count(*) AS n_bins,
           |  CAST(max(fill) AS BIGINT) AS max_fill,
           |  round(CAST(CAST(sum(fill) AS DOUBLE) /
           |    CAST(count(*) * 1024 AS DOUBLE) AS DECIMAL(18,12)), 4) + 0.0
           |    AS fill_ratio
           |FROM f GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Benchmark decontamination: a corpus document is CONTAMINATED if it
    * shares any exact 3-token shingle with the eval set (doc_id < 20 —
    * the fixture stand-in for a held-out benchmark; production uses
    * 8–13-token shingles on real text, but the fixture docs are short
    * synthetic word sequences and trigrams play that role — 5-token
    * shingles collide on ~nothing here, which would make the key
    * vacuous). Shape at 100 TB: distinct shingles on both sides (the
    * eval side is tiny and stays broadcast), one semi join on the
    * shingle STRING — exact, so the whole check is oracle-able (hashed
    * shingles would be engine-specific), then a distinct-doc rollup.
    * Short docs (< 3 tokens) have no shingle and cannot collide — both
    * engines produce an empty shingle set for them by construction (the
    * sequence guard keeps Spark's descending-sequence quirk out:
    * sequence(1, n) runs DESCENDING for n < 1, so the bound is
    * greatest(n−2, 1) with an explicit index filter).
    */
  private val contamination = QueryDef(
    "q_text_contamination",
    (s, d) => {
      val shingled = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        .select(col("lang"), col("doc_id"), explode(expr(
          """filter(transform(sequence(1, greatest(int(n) - 2, 1)),
            |  i -> IF(i <= int(n) - 2,
            |          array_join(slice(toks, i, 3), ' '), NULL)),
            |  x -> x IS NOT NULL)""".stripMargin)).as("sh"))
      val evalSide = shingled.filter(col("doc_id") < 20)
        .select(col("lang"), col("sh")).distinct()
      val corpus = shingled.filter(col("doc_id") >= 20)
      val contaminated = corpus
        .join(broadcast(evalSide), Seq("lang", "sh"), "left_semi")
        .select(col("lang"), col("doc_id")).distinct()
      val base = Tables.documents(s, d).filter(col("doc_id") >= 20)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_corpus"))
      val hit = contaminated.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_contaminated"),
          sum(col("doc_id")).as("id_checksum"))
      base.join(hit, Seq("lang"), "left")
        .select(col("lang"), col("n_corpus"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
          coalesce(col("id_checksum"), lit(0L)).as("id_checksum"))
        .orderBy(ascf("lang"))
    },
    Some("""WITH t AS (SELECT lang, doc_id, string_split(text, ' ') AS toks,
           |    CAST(length(string_split(text, ' ')) AS BIGINT) AS n
           |  FROM documents),
           |sh AS (SELECT lang, doc_id, unnest(
           |    [array_to_string(toks[i:i+2], ' ')
           |     for i in range(1, CAST(greatest(n - 1, 1) AS BIGINT))]) AS sh
           |  FROM t),
           |ev AS (SELECT DISTINCT lang, sh FROM sh WHERE doc_id < 20),
           |hitdocs AS (SELECT DISTINCT s.lang AS lang, s.doc_id AS doc_id
           |  FROM sh s JOIN ev ON s.lang = ev.lang AND s.sh = ev.sh
           |  WHERE s.doc_id >= 20),
           |base AS (SELECT lang, count(*) AS n_corpus FROM documents
           |  WHERE doc_id >= 20 GROUP BY lang),
           |hit AS (SELECT lang, count(*) AS n_contaminated,
           |    CAST(sum(doc_id) AS BIGINT) AS id_checksum
           |  FROM hitdocs GROUP BY lang)
           |SELECT base.lang AS lang, base.n_corpus,
           |  CAST(coalesce(hit.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           |  CAST(coalesce(hit.id_checksum, 0) AS BIGINT) AS id_checksum
           |FROM base LEFT JOIN hit ON base.lang = hit.lang
           |ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Repetition / lexical-diversity filter (r5): the quality gate that
    * catches boilerplate and generator loops — per doc, the distinct-
    * token ratio and the count of ADJACENT duplicate tokens (the
    * stutter signature). Flags at two thresholds (ratio < 0.5 and
    * < 0.3) so the censored mass is visible, with an id checksum
    * pinning exactly WHICH docs each threshold drops. All ratios are
    * exact integer cross-multiplications (u·2 < n, u·10 < n·3) — no
    * division, no rounding, no D11 exposure. Scale: a pure per-row
    * projection + one partial agg, no shuffle before the 5-group
    * rollup.
    */
  private val repetition = QueryDef(
    "q_text_repetition",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n_tok", size(col("toks")).cast("long"))
        .withColumn("n_uniq", size(array_distinct(col("toks"))).cast("long"))
        // adjacent-duplicate positions: pair each token with its successor
        // via two slices (empty for 1-token docs — no sequence() call, so
        // Spark's descending-sequence-for-empty-ranges quirk never bites)
        .withColumn("n_adj", expr(
          """aggregate(zip_with(slice(toks, 1, int(n_tok) - 1),
            |  slice(toks, 2, int(n_tok) - 1),
            |  (a, b) -> IF(a = b, 1L, 0L)), 0L, (acc, x) -> acc + x)"""
            .stripMargin))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"),
          sum(col("n_uniq")).as("sum_uniq"),
          sum(col("n_adj")).as("sum_adj_dups"),
          count(when(col("n_uniq") * 2 < col("n_tok"), lit(1))).as("n_flag50"),
          sum(when(col("n_uniq") * 2 < col("n_tok"), col("doc_id"))
            .otherwise(lit(0L))).as("flag50_id_checksum"),
          count(when(col("n_uniq") * 10 < col("n_tok") * 3, lit(1))).as("n_flag30"),
          sum(when(col("n_uniq") * 10 < col("n_tok") * 3, col("doc_id"))
            .otherwise(lit(0L))).as("flag30_id_checksum"))
        .orderBy(ascf("lang")),
    Some("""WITH t AS (SELECT lang, doc_id, string_split(text, ' ') AS toks
           |  FROM documents),
           |m AS (SELECT lang, doc_id,
           |    CAST(length(toks) AS BIGINT) AS n_tok,
           |    CAST(length(list_distinct(toks)) AS BIGINT) AS n_uniq,
           |    CAST(length([i FOR i IN range(1, CAST(length(toks) AS BIGINT))
           |      IF toks[i] = toks[i + 1]]) AS BIGINT) AS n_adj
           |  FROM t)
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
           |  CAST(sum(n_uniq) AS BIGINT) AS sum_uniq,
           |  CAST(sum(n_adj) AS BIGINT) AS sum_adj_dups,
           |  count(*) FILTER (WHERE n_uniq * 2 < n_tok) AS n_flag50,
           |  CAST(coalesce(sum(doc_id) FILTER (WHERE n_uniq * 2 < n_tok), 0)
           |    AS BIGINT) AS flag50_id_checksum,
           |  count(*) FILTER (WHERE n_uniq * 10 < n_tok * 3) AS n_flag30,
           |  CAST(coalesce(sum(doc_id) FILTER (WHERE n_uniq * 10 < n_tok * 3), 0)
           |    AS BIGINT) AS flag30_id_checksum
           |FROM m GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Incremental (new-batch-vs-corpus) dedup (r5): the production shape
    * of exact dedup — a 10% "incoming" slice (the SAME deterministic
    * hash bucket that drives q_sample_hash / q_split_train_val, so
    * batch membership is reproducible and composes with sampling
    * decisions) is deduped against the resident 90% on the normalized
    * key q_dedup_exact uses (lower/trim, first-5-token prefix). Census:
    * per-lang incoming count, how many collide with the corpus, how
    * many are genuinely new, with id checksums pinning the exact
    * partition. Scale: one hash shuffle on the key; the incoming side
    * is small by construction, the corpus side streams through — the
    * same cost as one exact-dedup pass regardless of history size.
    */
  private val dedupIncremental = QueryDef(
    "q_dedup_incremental",
    (s, d) => {
      val keyed = Tables.documents(s, d)
        .withColumn("nk",
          array_join(slice(split(lower(trim(col("text"))), " "), 1, 5), " "))
        .withColumn("b", Sampling.bucket(col("doc_id")))
      val incoming = keyed.filter(col("b") >= 90)
        .select(col("lang"), col("doc_id"), col("nk"))
      val existing = keyed.filter(col("b") < 90).select(col("nk")).distinct()
      val dup = incoming.join(existing, Seq("nk"), "left_semi")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_dup"), sum(col("doc_id")).as("dup_id_checksum"))
      incoming.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_incoming"),
          sum(col("doc_id")).as("incoming_id_checksum"))
        .join(dup, Seq("lang"), "left")
        .select(col("lang"), col("n_incoming"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          (col("n_incoming") - coalesce(col("n_dup"), lit(0L))).as("n_new"),
          col("incoming_id_checksum"),
          coalesce(col("dup_id_checksum"), lit(0L)).as("dup_id_checksum"))
        .orderBy(ascf("lang"))
    },
    Some(s"""WITH k AS (SELECT lang, doc_id,
            |    array_to_string(string_split(lower(trim(text)), ' ')[1:5], ' ')
            |      AS nk,
            |    ${Sampling.bucketSql("doc_id")} AS b
            |  FROM documents),
            |inc AS (SELECT lang, doc_id, nk FROM k WHERE b >= 90),
            |ex AS (SELECT DISTINCT nk FROM k WHERE b < 90),
            |dup AS (SELECT lang, count(*) AS n_dup,
            |    CAST(sum(doc_id) AS BIGINT) AS dup_id_checksum
            |  FROM inc WHERE nk IN (SELECT nk FROM ex) GROUP BY lang),
            |base AS (SELECT lang, count(*) AS n_incoming,
            |    CAST(sum(doc_id) AS BIGINT) AS incoming_id_checksum
            |  FROM inc GROUP BY lang)
            |SELECT base.lang AS lang, base.n_incoming,
            |  CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup,
            |  CAST(base.n_incoming - coalesce(dup.n_dup, 0) AS BIGINT) AS n_new,
            |  base.incoming_id_checksum,
            |  CAST(coalesce(dup.dup_id_checksum, 0) AS BIGINT) AS dup_id_checksum
            |FROM base LEFT JOIN dup ON base.lang = dup.lang
            |ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Weighted corpus mixing (r5): every training run re-weights its
    * sources (upsample quality, downsample boilerplate); this key keeps
    * a per-lang fraction via the SAME deterministic bucket — en 100%,
    * zh 50%, de 40%, es 25%, fr 10% — so the mixture is reproducible
    * doc-by-doc, composes with the split/sample keys, and is exactly
    * checkable (kept-id checksums, not just counts). Scale: a codegen'd
    * projection + filter, no shuffle before the 5-group rollup.
    */
  private val mixWeighted = QueryDef(
    "q_mix_weighted",
    (s, d) => {
      val weight = when(col("lang") === "en", lit(100L))
        .when(col("lang") === "zh", lit(50L))
        .when(col("lang") === "de", lit(40L))
        .when(col("lang") === "es", lit(25L))
        .otherwise(lit(10L))
      Tables.documents(s, d)
        .withColumn("w", weight)
        .withColumn("kept",
          (Sampling.bucket(col("doc_id")) < col("w")).cast("long"))
        .groupBy(col("lang"))
        .agg(max(col("w")).as("weight_pct"),
          count(lit(1)).as("n_total"),
          sum(col("kept")).as("n_kept"),
          sum(col("kept") * col("n_chars")).as("kept_chars"),
          sum(col("kept") * col("doc_id")).as("kept_id_checksum"))
        .orderBy(ascf("lang"))
    },
    Some(s"""WITH t AS (SELECT lang, doc_id, n_chars,
            |    CASE lang WHEN 'en' THEN 100 WHEN 'zh' THEN 50
            |      WHEN 'de' THEN 40 WHEN 'es' THEN 25 ELSE 10 END AS w,
            |    CASE WHEN ${Sampling.bucketSql("doc_id")} <
            |      CASE lang WHEN 'en' THEN 100 WHEN 'zh' THEN 50
            |        WHEN 'de' THEN 40 WHEN 'es' THEN 25 ELSE 10 END
            |      THEN 1 ELSE 0 END AS kept
            |  FROM documents)
            |SELECT lang, CAST(max(w) AS BIGINT) AS weight_pct,
            |  count(*) AS n_total,
            |  CAST(sum(kept) AS BIGINT) AS n_kept,
            |  CAST(sum(kept * n_chars) AS BIGINT) AS kept_chars,
            |  CAST(sum(kept * doc_id) AS BIGINT) AS kept_id_checksum
            |FROM t GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Corpus profiling histogram (r5): fixed-width length histogram over
    * documents (bucket = n_chars div 64 — a shift, exact int64), the
    * data-profiling pass every ingestion pipeline runs first. Output is
    * one row per occupied bucket with a doc-id checksum. Scale: partial
    * agg straight on the scan, ~max(n_chars)/64 groups regardless of
    * corpus size.
    */
  private val lengthHist = QueryDef(
    "q_profile_hist",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("bucket_lo", shiftleft(shiftright(col("n_chars"), 6), 6))
        .groupBy(col("bucket_lo"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy(ascf("bucket_lo")),
    Some("""SELECT (n_chars // 64) * 64 AS bucket_lo, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
           |FROM documents GROUP BY 1 ORDER BY bucket_lo ASC NULLS FIRST"""
      .stripMargin))

  /** Temperature-balanced language mixing (round 5): the multilingual
    * upsampling rule p_l ∝ n_l^(1/T) at T = 2 — low-resource languages
    * get a repeat factor sqrt(n_max / n_l) ≥ 1, the standard fix for
    * high-resource languages drowning out the tail. T = 2 is chosen
    * deliberately: the factor needs only sqrt, which IEEE 754 requires
    * correctly rounded (D12's one exempt transcendental), so the e6-
    * quantized factor is bit-identical cross-engine with NO libm risk —
    * a general T would need pow and violate D12.
    *
    * Determinism bound: the scaled ratio (n_max·10¹² // n_l) must stay
    * below 2^53 for the int→double conversion to be exact — true while
    * the max/min language imbalance is under ~9000× (it is ~3× here);
    * beyond that, rescale the quantization.
    *
    * Scale: one lang-grain agg; everything after runs on 5 rows.
    */
  private val mixTemperature = QueryDef(
    "q_mix_temperature",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.documents(s, d)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .withColumn("n_max", max(col("n_docs")).over(Window.partitionBy()))
      counts
        .withColumn("x", expr("(n_max * 1000000000000) div n_docs"))
        .withColumn("rep_e6",
          floor(sqrt(col("x").cast("double"))).cast("long"))
        .select(col("lang"), col("n_docs"),
          col("rep_e6"),
          expr("(n_docs * rep_e6) div 1000000").as("target_docs"))
        .orderBy(ascf("lang"))
    },
    Some("""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
           |  GROUP BY lang),
           |m AS (SELECT lang, n_docs,
           |    (SELECT max(n_docs) FROM c) AS n_max FROM c),
           |r AS (SELECT lang, n_docs,
           |    CAST(floor(sqrt(CAST((n_max * 1000000000000) // n_docs
           |      AS DOUBLE))) AS BIGINT) AS rep_e6
           |  FROM m)
           |SELECT lang, n_docs, rep_e6,
           |  CAST((n_docs * rep_e6) // 1000000 AS BIGINT) AS target_docs
           |FROM r ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Gopher/C4-style multi-rule quality gate (round 5): the standard
    * pre-training filter battery as ONE pass — word-count bounds,
    * mean-word-length bounds, stopword presence, lexical diversity —
    * with a per-language census of each rule's pass count, the
    * all-rules yield, and a surviving-id checksum. Differs from
    * q_text_quality (a continuous score) by being the hard gate with
    * per-rule attribution, which is what you actually tune.
    *
    * Determinism: every rule is an integer cross-multiplication — mean
    * word length in [3,10] is 3·n_toks ≤ n_alpha ≤ 10·n_toks with
    * n_alpha = n_chars − (n_toks − 1) separator spaces; diversity
    * ≥ 0.3 is 10·distinct ≥ 3·total. No division anywhere.
    *
    * Scale: pure projection + partial agg on the scan; no shuffle
    * before the 5-group rollup.
    */
  private val qualityGopher = QueryDef(
    "q_quality_gopher",
    (s, d) => {
      val t = split(col("text"), " ")
      val nToks = size(t).cast("long")
      val nDist = size(array_distinct(t)).cast("long")
      val nStop = size(filter(t, w => w === "a" || w === "the" ||
        w === "of" || w === "to" || w === "and")).cast("long")
      val nAlpha = col("n_chars") - (nToks - lit(1L))
      val r1 = (nToks >= 5 && nToks <= 1000).cast("long")
      val r2 = (nAlpha >= nToks * 3 && nAlpha <= nToks * 10).cast("long")
      val r3 = (nStop >= 2L).cast("long")
      val r4 = (nDist * 10 >= nToks * 3).cast("long")
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          r1.as("r1"), r2.as("r2"), r3.as("r3"), r4.as("r4"),
          (r1 * r2 * r3 * r4).as("all_pass"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("r1")).as("pass_wordcount"),
          sum(col("r2")).as("pass_wordlen"),
          sum(col("r3")).as("pass_stopword"),
          sum(col("r4")).as("pass_diversity"),
          sum(col("all_pass")).as("n_pass_all"),
          sum(col("all_pass") * col("doc_id")).as("pass_id_checksum"))
        .orderBy(ascf("lang"))
    },
    Some("""WITH q AS (SELECT lang, doc_id,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
           |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           |      AS n_dist,
           |    CAST(len(list_filter(string_split(text, ' '),
           |      w -> w = 'a' OR w = 'the' OR w = 'of' OR w = 'to'
           |        OR w = 'and')) AS BIGINT) AS n_stop,
           |    n_chars FROM documents),
           |r AS (SELECT lang, doc_id,
           |    CASE WHEN n_toks >= 5 AND n_toks <= 1000 THEN 1 ELSE 0 END AS r1,
           |    CASE WHEN n_chars - (n_toks - 1) >= n_toks * 3
           |          AND n_chars - (n_toks - 1) <= n_toks * 10
           |         THEN 1 ELSE 0 END AS r2,
           |    CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r3,
           |    CASE WHEN n_dist * 10 >= n_toks * 3 THEN 1 ELSE 0 END AS r4
           |  FROM q)
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(r1) AS BIGINT) AS pass_wordcount,
           |  CAST(sum(r2) AS BIGINT) AS pass_wordlen,
           |  CAST(sum(r3) AS BIGINT) AS pass_stopword,
           |  CAST(sum(r4) AS BIGINT) AS pass_diversity,
           |  CAST(sum(r1 * r2 * r3 * r4) AS BIGINT) AS n_pass_all,
           |  CAST(sum(r1 * r2 * r3 * r4 * doc_id) AS BIGINT)
           |    AS pass_id_checksum
           |FROM r GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Materialized temperature upsampling (round 5): q_mix_temperature
    * COMPUTES per-lang repeat factors; this key actually EMITS the
    * upsampled corpus — every doc repeated `rep_e6 div 1e6` times plus
    * one fractional extra decided by the shared deterministic mix hash
    * (frac(doc) = mix(doc_id)·1e6 >> 32 < rep_e6 mod 1e6), then proves
    * the materialization with a per-lang census: copy counts and both
    * id- and copy-index checksums pin EXACTLY which rows were emitted,
    * not just how many. E[n_out] = n_docs·rep_e6/1e6 with zero variance
    * across runs/engines/partitionings — what a `rand()`-gated repeat
    * cannot give a training pipeline.
    *
    * Scale: the explode IS the op (the upsampled corpus a trainer
    * reads); the census is projection + partial agg after it. Factors
    * come from a 5-row broadcast; nothing shuffles except the 5-group
    * rollup. Copies are bounded by the documented ~9000× imbalance
    * bound of the factor construction, ~2 here.
    */
  private val mixUpsample = QueryDef(
    "q_mix_upsample",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val factors = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("n_max",
          max(col("n_docs")).over(Window.partitionBy()))
        .withColumn("rep_e6", floor(sqrt(
          expr("(n_max * 1000000000000) div n_docs").cast("double")))
          .cast("long"))
        .select(col("lang"), col("n_docs"), col("rep_e6"))
      val census = docs.select(col("lang"), col("doc_id"))
        .join(broadcast(factors), "lang")
        .withColumn("frac",
          shiftright(Sampling.mix(col("doc_id")) * lit(1000000L), 32))
        .withColumn("copies", expr("rep_e6 div 1000000") +
          when(col("frac") < expr("rep_e6 % 1000000"), lit(1L))
            .otherwise(lit(0L)))
        .select(col("lang"), col("doc_id"),
          explode(sequence(lit(1L), col("copies"))).as("copy_idx"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_out"),
          sum(col("doc_id")).as("out_id_checksum"),
          sum(col("copy_idx")).as("copy_checksum"))
      census.join(broadcast(factors), "lang")
        .select(col("lang"), col("n_docs").as("n_in"), col("rep_e6"),
          col("n_out"), col("out_id_checksum"), col("copy_checksum"))
        .orderBy(ascf("lang"))
    },
    Some(s"""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
           |  GROUP BY lang),
           |m AS (SELECT lang, n_docs,
           |    (SELECT max(n_docs) FROM c) AS n_max FROM c),
           |r AS (SELECT lang, n_docs,
           |    CAST(floor(sqrt(CAST((n_max * 1000000000000) // n_docs
           |      AS DOUBLE))) AS BIGINT) AS rep_e6 FROM m),
           |k AS (SELECT d.lang, d.doc_id, r.rep_e6,
           |    rep_e6 // 1000000 + CASE WHEN
           |      (${Sampling.mixSql("d.doc_id")} * 1000000) // 4294967296
           |        < rep_e6 % 1000000 THEN 1 ELSE 0 END AS copies
           |  FROM documents d JOIN r ON d.lang = r.lang),
           |e AS (SELECT lang, doc_id,
           |    unnest(range(1, copies + 1)) AS copy_idx FROM k),
           |a AS (SELECT lang, count(*) AS n_out,
           |    CAST(sum(doc_id) AS BIGINT) AS out_id_checksum,
           |    CAST(sum(copy_idx) AS BIGINT) AS copy_checksum
           |  FROM e GROUP BY lang)
           |SELECT r.lang, r.n_docs AS n_in, r.rep_e6,
           |  a.n_out, a.out_id_checksum, a.copy_checksum
           |FROM r JOIN a ON r.lang = a.lang
           |ORDER BY r.lang ASC NULLS FIRST""".stripMargin))

  /** Per-column data profiling (round 5): the null/distinct/min/max
    * census over every column of `documents` — the first pass every
    * ingestion pipeline runs on a new source (schema drift, null
    * floods, and truncated exports all show up here before anything
    * downstream breaks). min/max are emitted as strings so one output
    * schema covers heterogeneous column types; integer renderings are
    * digit-exact on both engines, and the synthetic corpus is ASCII so
    * binary string ordering agrees (both engines compare codepoints).
    *
    * Scale: ONE scan — the five count(DISTINCT) aggregates plan as a
    * single expand (×5 map-side rows, no extra pass), which is the
    * standard multi-distinct shape; the result is one row unpivoted to
    * five. At 100 TB distinct-counting `text` is the dominant shuffle;
    * where an estimate suffices q_agg_approx_distinct's HLL is the
    * drop-in (this key grades the EXACT profile).
    */
  private val profileCols = QueryDef(
    "q_profile_cols",
    (s, d) => {
      def stats(c: String) = Seq(
        sum(isnull(col(c)).cast("long")).as(s"nu_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
      val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
      val aggs = cols.flatMap(stats)
      Tables.documents(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(
          s"""stack(${cols.length},
             |${cols.map(c => s"'$c', nu_$c, nd_$c, mn_$c, mx_$c")
                  .mkString(",\n")})
             |AS (column_name, n_nulls, n_distinct, min_s, max_s)"""
            .stripMargin)
        .orderBy(ascf("column_name"))
    },
    Some {
      val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
      cols.map { c =>
        s"""SELECT '$c' AS column_name,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_s,
           |  CAST(max($c) AS VARCHAR) AS max_s FROM documents"""
          .stripMargin
      }.mkString("", "\nUNION ALL\n",
        "\nORDER BY column_name ASC NULLS FIRST")
    })

  /** Join-key skew profile (round 5): per-key-column cardinality and
    * heavy-hitter census over lineitem's three join keys — the
    * statistic that DECIDES the physical join strategy the rest of the
    * surface exhibits (broadcast vs shuffle vs `plans.SaltedJoin` vs
    * AQE skew split). top1_share_e6 = heaviest key's row share;
    * skew_e6 = max/avg group size in 1e-6 units (1e6 = perfectly
    * uniform) — the salting trigger. Emitting it as a graded key makes
    * the planning input itself reproducible.
    *
    * Scale: stack(3) multiplies the scan ×3 ONCE, then two-level agg —
    * (key, value)-grain partial agg absorbs the volume map-side; the
    * second agg is key-cardinality-sized. max_cnt·1e6 < 2⁶³ to ~10¹²
    * rows per key value; max_cnt·n_keys·1e6 runs in DECIMAL(38,0)/
    * HUGEINT (overflows int64 exactly in the high-cardinality regime
    * the profile exists for).
    */
  private val profileSkew = QueryDef(
    "q_profile_skew",
    (s, d) => {
      Tables.lineitem(s, d)
        .selectExpr("""stack(3,
          |  'l_orderkey', l_orderkey,
          |  'l_partkey', l_partkey,
          |  'l_suppkey', l_suppkey) AS (key_name, k)""".stripMargin)
        .groupBy(col("key_name"), col("k"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("key_name"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("c")).as("n_rows"),
          max(col("c")).as("max_cnt"))
        .withColumn("top1_share_e6", expr("max_cnt * 1000000 div n_rows"))
        .withColumn("skew_e6", expr(
          "CAST(max_cnt AS DECIMAL(38,0)) * n_keys * 1000000 div n_rows"))
        .select(col("key_name"), col("n_rows"), col("n_keys"),
          col("max_cnt"), col("top1_share_e6"), col("skew_e6"))
        .orderBy(ascf("key_name"))
    },
    Some("""WITH s AS (
           |    SELECT 'l_orderkey' AS key_name, l_orderkey AS k FROM lineitem
           |  UNION ALL
           |    SELECT 'l_partkey', l_partkey FROM lineitem
           |  UNION ALL
           |    SELECT 'l_suppkey', l_suppkey FROM lineitem),
           |g AS (SELECT key_name, k, count(*) AS c FROM s GROUP BY 1, 2),
           |a AS (SELECT key_name, count(*) AS n_keys,
           |    CAST(sum(c) AS BIGINT) AS n_rows,
           |    CAST(max(c) AS BIGINT) AS max_cnt FROM g GROUP BY 1)
           |SELECT key_name, n_rows, n_keys, max_cnt,
           |  CAST(max_cnt * 1000000 // n_rows AS BIGINT) AS top1_share_e6,
           |  CAST(CAST(max_cnt AS HUGEINT) * n_keys * 1000000 // n_rows
           |    AS BIGINT) AS skew_e6
           |FROM a ORDER BY key_name ASC NULLS FIRST""".stripMargin))

  /** Equi-depth decile boundaries (round 5): the optimizer-statistics /
    * feature-binning histogram q_profile_hist's fixed-WIDTH buckets
    * can't give — boundary_k = min{v : F(v) ≥ ⌈k·N/10⌉} over the
    * doc-length distribution (the discrete lower-quantile; k = 10 is
    * the max). Defined on the VALUE grain, so ties are unambiguous
    * cross-engine (ntile would split equal values by row order — D1
    * territory); targets ⌈kN/10⌉ stay pure integer: (k·N + 9) div 10.
    *
    * Scale: this is deliberately NOT a global-sort ntile — the
    * cumulative distribution is computed on the value-grain relation
    * (distinct doc lengths ≪ corpus; partial agg on the scan), the
    * unpartitioned cumsum window runs on THAT tiny relation, and the
    * 10-target probe is a broadcast-sized join. The same plan at
    * 100 TB sorts thousands of rows, not 10¹².
    */
  private val profileDepth = QueryDef(
    "q_profile_depth",
    (s, d) => {
      val hist = Tables.documents(s, d)
        .groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
      val wCum = Window.orderBy(ascf("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
      cum.crossJoin(s.range(1, 11).toDF("k"))
        .filter(col("cum") >= expr("(k * total + 9) div 10"))
        .groupBy(col("k"))
        .agg(min(col("n_chars")).as("boundary"))
        .join(cum.select(col("n_chars").as("boundary"), col("cum")),
          "boundary")
        .select(col("k"), col("boundary").cast("long").as("boundary"),
          col("cum").as("cum_cnt"))
        .orderBy(ascf("k"))
    },
    Some("""WITH h AS (SELECT n_chars, count(*) AS cnt FROM documents
           |  GROUP BY n_chars),
           |c AS (SELECT n_chars, cnt,
           |    CAST(sum(cnt) OVER (ORDER BY n_chars ASC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS cum,
           |    CAST(sum(cnt) OVER () AS BIGINT) AS total FROM h),
           |b AS (SELECT k.range AS k, min(c.n_chars) AS boundary
           |  FROM c CROSS JOIN range(1, 11) k
           |  WHERE c.cum >= (k.range * c.total + 9) // 10
           |  GROUP BY 1)
           |SELECT b.k, CAST(b.boundary AS BIGINT) AS boundary,
           |  c.cum AS cum_cnt
           |FROM b JOIN c ON b.boundary = c.n_chars
           |ORDER BY k ASC NULLS FIRST""".stripMargin))

  /** Cross-document boilerplate removal (round 6): the CCNet/RefinedWeb
    * bulk line-dedup pass — drop every "line" that repeats across the
    * corpus (nav bars, cookie banners, footers), then re-census what
    * survives. The fixture corpus has no newlines, so a "line" is the
    * deterministic fixed-grid stand-in: consecutive 10-word chunks
    * (chunk i = words 10i+1..10i+10), the same grid a real pipeline
    * applies to unstructured text. A chunk STRING seen in ≥ 2 distinct
    * documents of the same lang is boilerplate; every instance of it is
    * dropped (including from the first document — bulk dedup, not
    * keep-first).
    *
    * Shape at 100 TB: one corpus explode (×n_words/10), one partial-agg
    * shuffle on (lang, chunk) for the distinct-doc census, and the
    * boilerplate set joins back as a broadcast/semi join (repeated
    * chunks are a vanishing fraction of chunk TYPES). No all-pairs
    * anything: cost is linear in corpus size — the property that lets
    * CCNet run this over a crawl snapshot. Grading is exact string
    * equality, so no hash family has to be spelled cross-engine.
    */
  private val dedupLines = QueryDef(
    "q_dedup_lines",
    (s, d) => {
      val chunks = graft.Caches.scoped(
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
          .select(col("doc_id"), col("lang"),
            explode(expr("transform(sequence(0, (size(ws) - 1) div 10), " +
              "i -> array_join(slice(ws, i * 10 + 1, 10), ' '))")).as("chunk"))
          .withColumn("cw", size(split(col("chunk"), " ")).cast("long")))
      val boiler = chunks.select(col("lang"), col("chunk"), col("doc_id"))
        .distinct()
        .groupBy(col("lang"), col("chunk"))
        .agg(count(lit(1)).as("ndocs"))
        .filter(col("ndocs") >= 2)
      val marked = chunks.join(boiler.select(col("lang"), col("chunk"),
          lit(1L).as("isb")), Seq("lang", "chunk"), "left")
        .withColumn("isb", coalesce(col("isb"), lit(0L)))
      marked.groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("isb")).as("n_dropped"),
          sum(col("cw")).as("words_total"),
          sum(when(col("isb") === 0L, col("cw")).otherwise(0L))
            .as("words_kept"))
        .orderBy(ascf("lang"))
    },
    Some("""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
           |  FROM documents),
           |c AS MATERIALIZED (SELECT doc_id, lang,
           |    unnest(list_transform(range(0, ((len(ws) - 1) // 10) + 1),
           |      i -> array_to_string(list_slice(ws, i * 10 + 1, i * 10 + 10),
           |        ' '))) AS chunk
           |  FROM w),
           |cc AS MATERIALIZED (SELECT doc_id, lang, chunk,
           |    CAST(len(string_split(chunk, ' ')) AS BIGINT) AS cw FROM c),
           |b AS (SELECT lang, chunk FROM
           |    (SELECT lang, chunk, count(DISTINCT doc_id) AS ndocs
           |     FROM cc GROUP BY 1, 2)
           |  WHERE ndocs >= 2),
           |m AS (SELECT cc.lang AS lang, cc.doc_id AS doc_id, cc.cw AS cw,
           |    CASE WHEN b.chunk IS NULL THEN 0 ELSE 1 END AS isb
           |  FROM cc LEFT JOIN b ON cc.lang = b.lang AND cc.chunk = b.chunk)
           |SELECT lang,
           |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           |  CAST(count(*) AS BIGINT) AS n_chunks,
           |  CAST(sum(isb) AS BIGINT) AS n_dropped,
           |  CAST(sum(cw) AS BIGINT) AS words_total,
           |  CAST(sum(CASE WHEN isb = 0 THEN cw ELSE 0 END) AS BIGINT)
           |    AS words_kept
           |FROM m GROUP BY lang
           |ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** PII detection + redaction census (round 7) — the scrub pass every
    * LLM training corpus runs before anything else: find emails, phone
    * numbers, SSN-shaped ids, and IPv4 addresses, replace each with a
    * typed placeholder, and account for what was removed. The fixture
    * text carries no PII, so the input is synthesized deterministically
    * from doc columns (the q_fn_url pattern): a subset of docs gets an
    * email (doc_id≡0 mod 3), phone (mod 4), SSN (mod 5), and/or IP
    * (mod 6) spliced between text fragments — overlapping subsets, so
    * docs carry 0–4 PII kinds and every count column varies.
    *
    * Detection/redaction use ONLY the D6 regex subset (char classes +
    * bounded repeats — valid and identically-greedy in Java regex and
    * RE2): the SSN shape [0-9]{3}-[0-9]{2}-[0-9]{4} and phone shape
    * [0-9]{3}-[0-9]{3}-[0-9]{4} cannot match inside each other (fixed
    * repeat counts, no backtracking alternatives), and replacement
    * order is pinned email→phone→ssn→ip on both engines anyway.
    * Output is per-lang integer censuses only (doc/hit counts, raw vs
    * redacted char sums) — no synthesized string crosses the engine
    * boundary.
    *
    * 100 TB shape: embarrassingly-parallel per-row regex work (codegen'd
    * regexp_extract_all/regexp_replace, no UDF) feeding one
    * lang-cardinality-bounded partial agg — the cheapest possible
    * full-corpus pass, which is why scrubbing runs first in real
    * pipelines.
    */
  private val textPii = QueryDef(
    "q_text_pii",
    (s, d) => {
      val emailPat = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
      val phonePat = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
      val ssnPat = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
      val ipPat = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      val id = col("doc_id")
      def str(c: Column): Column = c.cast("string")
      val email = concat(lit("user"), str(id), lit("@mail"),
        str(pmod(id, lit(7))), lit(".com"))
      val phone = concat(str(pmod(id, lit(900)) + 100), lit("-"),
        lpad(str(pmod(id, lit(1000))), 3, "0"), lit("-"),
        lpad(str(pmod(id, lit(10000))), 4, "0"))
      val ssn = concat(str(pmod(id, lit(900)) + 100), lit("-"),
        lpad(str(pmod(id, lit(100))), 2, "0"), lit("-"),
        lpad(str(pmod(id, lit(10000))), 4, "0"))
      val ip = concat(lit("10."), str(pmod(id, lit(256))), lit("."),
        str(pmod(id * 7, lit(256))), lit("."), str(pmod(id, lit(254)) + 1))
      def maybe(m: Int, piece: Column) =
        when(pmod(id, lit(m)) === 0, concat(lit(" "), piece))
          .otherwise(lit(""))
      val raw = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        concat(substring(col("text"), 1, 48),
          maybe(3, email), maybe(4, phone), maybe(5, ssn), maybe(6, ip),
          lit(" "), substring(col("text"), 49, 32)).as("raw"))
      val red = raw
        .withColumn("n_email",
          size(regexp_extract_all(col("raw"), lit(emailPat), lit(0)))
            .cast("long"))
        .withColumn("n_phone",
          size(regexp_extract_all(col("raw"), lit(phonePat), lit(0)))
            .cast("long"))
        .withColumn("r1", regexp_replace(col("raw"), emailPat, "<EMAIL>"))
        .withColumn("r2", regexp_replace(col("r1"), phonePat, "<PHONE>"))
        .withColumn("n_ssn",
          size(regexp_extract_all(col("r2"), lit(ssnPat), lit(0)))
            .cast("long"))
        .withColumn("r3", regexp_replace(col("r2"), ssnPat, "<SSN>"))
        .withColumn("n_ip",
          size(regexp_extract_all(col("r3"), lit(ipPat), lit(0)))
            .cast("long"))
        .withColumn("clean", regexp_replace(col("r3"), ipPat, "<IP>"))
      red.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_email")).as("n_emails"),
          sum(col("n_phone")).as("n_phones"),
          sum(col("n_ssn")).as("n_ssns"),
          sum(col("n_ip")).as("n_ips"),
          sum(when(col("n_email") + col("n_phone") + col("n_ssn")
            + col("n_ip") > 0, 1L).otherwise(0L)).as("n_docs_with_pii"),
          sum(length(col("raw"))).as("sum_chars_raw"),
          sum(length(col("clean"))).as("sum_chars_clean"))
        .orderBy(ascf("lang"))
    },
    Some("""WITH raw AS (SELECT doc_id, lang,
           |    substring(text, 1, 48)
           |    || (CASE WHEN doc_id % 3 = 0 THEN ' user' || doc_id
           |        || '@mail' || (doc_id % 7) || '.com' ELSE '' END)
           |    || (CASE WHEN doc_id % 4 = 0 THEN ' ' || (doc_id % 900 + 100)
           |        || '-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
           |        || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           |        ELSE '' END)
           |    || (CASE WHEN doc_id % 5 = 0 THEN ' ' || (doc_id % 900 + 100)
           |        || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
           |        || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           |        ELSE '' END)
           |    || (CASE WHEN doc_id % 6 = 0 THEN ' 10.' || (doc_id % 256)
           |        || '.' || ((doc_id * 7) % 256) || '.' || (doc_id % 254 + 1)
           |        ELSE '' END)
           |    || ' ' || substring(text, 49, 32) AS raw
           |  FROM documents),
           |red AS (SELECT lang, raw,
           |    CAST(len(regexp_extract_all(raw,
           |      '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS BIGINT) AS n_email,
           |    CAST(len(regexp_extract_all(raw,
           |      '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
           |    regexp_replace(regexp_replace(raw,
           |      '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
           |      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS r2
           |  FROM raw),
           |red2 AS (SELECT lang, raw, n_email, n_phone,
           |    CAST(len(regexp_extract_all(r2,
           |      '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_ssn,
           |    regexp_replace(r2, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g')
           |      AS r3
           |  FROM red),
           |red3 AS (SELECT lang, raw, n_email, n_phone, n_ssn,
           |    CAST(len(regexp_extract_all(r3,
           |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
           |      AS BIGINT) AS n_ip,
           |    regexp_replace(r3,
           |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
           |      '<IP>', 'g') AS clean
           |  FROM red2)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_email) AS BIGINT) AS n_emails,
           |  CAST(sum(n_phone) AS BIGINT) AS n_phones,
           |  CAST(sum(n_ssn) AS BIGINT) AS n_ssns,
           |  CAST(sum(n_ip) AS BIGINT) AS n_ips,
           |  CAST(sum(CASE WHEN n_email + n_phone + n_ssn + n_ip > 0
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
           |  CAST(sum(length(raw)) AS BIGINT) AS sum_chars_raw,
           |  CAST(sum(length(clean)) AS BIGINT) AS sum_chars_clean
           |FROM red3 GROUP BY lang
           |ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Sliding-window document chunking (round 7): split each document
    * into fixed token windows (W=32, stride S=24, right-aligned tail) —
    * the preprocessing step that turns long documents into
    * context-window-sized training/RAG segments, the other half of
    * batch construction next to q_pack_sequences (chunking SPLITS long
    * docs; packing FILLS budgets with short ones). Chunk count
    * m = 1 if n ≤ W else ⌈(n−W)/S⌉+1, starts k·S for k < m−1 and n−W
    * for the last (every chunk full-width unless the doc itself is
    * short) — the stride rule production tokenizer pipelines use.
    *
    * Scale: one corpus pass, per-row integer arithmetic + a bounded
    * explode (≤ n/S chunks per doc), embarrassingly parallel until the
    * lang-grain partial agg — no shuffle carries row data. The boundary
    * checksum reads the token at each chunk start via element_at on the
    * split array (codegen'd, no UDF), so a off-by-one in either
    * engine's start arithmetic breaks the hash.
    *
    * Determinism: pure integer chunk geometry; ⌈x⌉ spelled as
    * (x + S − 1) div S on both engines (all operands non-negative).
    */
  private val textChunking = QueryDef(
    "q_text_chunking",
    (s, d) => {
      val W = 32
      val S = 24
      // exact integer ceil-div: (n - W + S - 1) div S + 1
      val withM = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("m",
          when(col("n") <= W, lit(1L))
            .otherwise(expr(s"(n - $W + ${S - 1}) div $S + 1")))
      val chunks = withM
        .select(col("lang"), col("doc_id"), col("toks"), col("n"), col("m"),
          explode(sequence(lit(0L), col("m") - 1)).as("k"))
        .withColumn("start",
          when(col("k") === col("m") - 1 && col("n") > W, col("n") - W)
            .otherwise(col("k") * S))
        .withColumn("clen", least(lit(W.toLong), col("n")))
        .withColumn("btok_len",
          length(element_at(col("toks"), (col("start") + 1).cast("int"))))
      chunks.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("clen")).as("sum_chunk_tokens"),
          sum(col("btok_len").cast("long")).as("boundary_char_sum"),
          max(col("m")).as("max_chunks_per_doc"))
        .orderBy(ascf("lang"))
    },
    Some(s"""WITH t AS (SELECT lang, doc_id, string_split(text, ' ') AS toks,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           |  FROM documents),
           |tm AS (SELECT lang, doc_id, toks, n,
           |    CASE WHEN n <= 32 THEN 1
           |         ELSE (n - 32 + 23) // 24 + 1 END AS m
           |  FROM t),
           |ch AS (SELECT lang, doc_id, toks, n, m,
           |    unnest(generate_series(0, m - 1)) AS k
           |  FROM tm),
           |cc AS (SELECT lang, m,
           |    CASE WHEN k = m - 1 AND n > 32 THEN n - 32 ELSE k * 24 END
           |      AS start,
           |    least(32, n) AS clen, toks
           |  FROM ch)
           |SELECT lang,
           |  count(*) AS n_chunks,
           |  CAST(sum(clen) AS BIGINT) AS sum_chunk_tokens,
           |  CAST(sum(len(toks[CAST(start + 1 AS INT)])) AS BIGINT)
           |    AS boundary_char_sum,
           |  CAST(max(m) AS BIGINT) AS max_chunks_per_doc
           |FROM cc GROUP BY lang
           |ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Pairwise Pearson correlation profile (round 7): the feature-
    * redundancy screen a profiling pass runs before model work —
    * corr(quantity, discount), corr(quantity, tax), corr(discount, tax)
    * over lineitem, computed from EXACT integer moment sums.
    *
    * Scale: ONE fused aggregation pass produces all 10 moments
    * (n, Σx, Σx², Σxy for every pair) with map-side partials — adding
    * feature pairs widens the 1-row aggregate, never adds a pass (the
    * q_audit_expectations fused-analyzer shape); the 3 verdict rows fan
    * out of the 1-row aggregate via a literal-struct explode, no
    * collect.
    *
    * Determinism: all moments are exact int64 (qty ≤ 50, cents ≤ 10 ⇒
    * every moment < 2^53 at any plausible SF, and int64→double is
    * correctly rounded in both engines beyond that); the final
    * r = num / (sqrt(va)·sqrt(vb)) divides the SAME exact operands
    * through IEEE-754 sqrt/mul/div (each correctly rounded in both
    * engines → bit-identical). The variances multiply AFTER their
    * sqrts — va·vb as integers would cross 2^63 at sf0.1.
    */
  private val profileCorr = QueryDef(
    "q_profile_corr",
    (s, d) => {
      val b = Tables.lineitem(s, d).select(
        col("l_quantity").cast("long").as("q"),
        (pct(col("l_discount")) * 100).cast("long").as("dc"),
        (pct(col("l_tax")) * 100).cast("long").as("tc"))
      val m = b.agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sq"), sum(col("dc")).as("sd"),
        sum(col("tc")).as("st"),
        sum(col("q") * col("q")).as("sqq"),
        sum(col("dc") * col("dc")).as("sdd"),
        sum(col("tc") * col("tc")).as("stt"),
        sum(col("q") * col("dc")).as("sqd"),
        sum(col("q") * col("tc")).as("sqt"),
        sum(col("dc") * col("tc")).as("sdt"))
      m.select(explode(expr(
        """array(
          |  struct('qty_disc' AS pair, n * sqd - sq * sd AS num,
          |    n * sqq - sq * sq AS va, n * sdd - sd * sd AS vb),
          |  struct('qty_tax' AS pair, n * sqt - sq * st AS num,
          |    n * sqq - sq * sq AS va, n * stt - st * st AS vb),
          |  struct('disc_tax' AS pair, n * sdt - sd * st AS num,
          |    n * sdd - sd * sd AS va, n * stt - st * st AS vb))""".stripMargin))
        .as("r"), col("n"))
        .select(col("r.pair").as("pair"), col("n"),
          col("r.num").as("cov_num"),
          (col("r.num").cast("double") /
            (sqrt(col("r.va").cast("double")) *
              sqrt(col("r.vb").cast("double")))).as("corr"))
        .orderBy(ascf("pair"))
    },
    Some("""WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS q,
           |    CAST(CAST(l_discount AS DECIMAL(3,2)) * 100 AS BIGINT) AS dc,
           |    CAST(CAST(l_tax AS DECIMAL(3,2)) * 100 AS BIGINT) AS tc
           |  FROM lineitem),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(q) AS BIGINT) AS sq, CAST(sum(dc) AS BIGINT) AS sd,
           |    CAST(sum(tc) AS BIGINT) AS st,
           |    CAST(sum(q * q) AS BIGINT) AS sqq,
           |    CAST(sum(dc * dc) AS BIGINT) AS sdd,
           |    CAST(sum(tc * tc) AS BIGINT) AS stt,
           |    CAST(sum(q * dc) AS BIGINT) AS sqd,
           |    CAST(sum(q * tc) AS BIGINT) AS sqt,
           |    CAST(sum(dc * tc) AS BIGINT) AS sdt
           |  FROM b),
           |rows_ AS (
           |  SELECT 'qty_disc' AS pair, n, n * sqd - sq * sd AS num,
           |    n * sqq - sq * sq AS va, n * sdd - sd * sd AS vb FROM m
           |  UNION ALL SELECT 'qty_tax', n, n * sqt - sq * st,
           |    n * sqq - sq * sq, n * stt - st * st FROM m
           |  UNION ALL SELECT 'disc_tax', n, n * sdt - sd * st,
           |    n * sdd - sd * sd, n * stt - st * st FROM m)
           |SELECT pair, n, CAST(num AS BIGINT) AS cov_num,
           |  CAST(num AS DOUBLE)
           |    / (sqrt(CAST(va AS DOUBLE)) * sqrt(CAST(vb AS DOUBLE)))
           |    AS corr
           |FROM rows_ ORDER BY pair ASC NULLS FIRST""".stripMargin))

  /** Robust dispersion + Tukey-fence outlier census per metric
    * (round 7): quartiles of the value distribution, IQR, and the count
    * of points beyond the 1.5·IQR fences — the outlier screen run
    * before any mean/variance statistic is trusted (q_profile_skew's
    * moments are exactly what one fat-tailed metric corrupts).
    *
    * Two scans by necessity: exact quantiles first, then the fence
    * comparison (the fences aren't known until the quantile pass ends).
    * The second scan joins the 5-row fence relation by broadcast and
    * partial-aggregates on the scan — at 100 TB production swaps pass 1
    * for the mergeable quantile sketch (q_sketch_quantile) and keeps
    * pass 2 unchanged.
    *
    * Determinism: values are DOUBLED cents (even int64s), so the
    * quartile interpolation lands on exact binary fractions (quarters
    * of ints ≪ 2⁵³ — both engines' interpolation formulas evaluate them
    * exactly), 1.5·IQR is an exact eighth, and the fence comparisons
    * compare exactly-represented doubles. round(4) is the
    * q_agg_percentile belt-and-suspenders.
    */
  private val profileIqr = QueryDef(
    "q_profile_iqr",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        (dec(col("value")) * 200).cast("long").as("d2"))
      val qs = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        round(expr("percentile(d2, 0.25)"), 4).as("q1"),
        round(expr("percentile(d2, 0.5)"), 4).as("med"),
        round(expr("percentile(d2, 0.75)"), 4).as("q3"))
      val fences = qs
        .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
        .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
      ev.join(broadcast(fences), "event_type")
        .groupBy(col("event_type"), col("n"), col("q1"), col("med"),
          col("q3"))
        .agg(sum(when(col("d2") < col("lo") || col("d2") > col("hi"),
          lit(1L)).otherwise(lit(0L))).as("n_outliers"))
        .orderBy(ascf("event_type"))
    },
    Some("""WITH ev AS (SELECT event_type,
           |    CAST(CAST(value AS DECIMAL(18,2)) * 200 AS BIGINT) AS d2
           |  FROM events),
           |qs AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |    round(quantile_cont(d2, 0.25), 4) AS q1,
           |    round(quantile_cont(d2, 0.5), 4) AS med,
           |    round(quantile_cont(d2, 0.75), 4) AS q3
           |  FROM ev GROUP BY 1),
           |f AS (SELECT event_type, n, q1, med, q3,
           |    q1 - CAST(1.5 AS DOUBLE) * (q3 - q1) AS lo,
           |    q3 + CAST(1.5 AS DOUBLE) * (q3 - q1) AS hi
           |  FROM qs)
           |SELECT ev.event_type, n, q1, med, q3,
           |  CAST(sum(CASE WHEN d2 < lo OR d2 > hi THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_outliers
           |FROM ev JOIN f ON ev.event_type = f.event_type
           |GROUP BY ev.event_type, n, q1, med, q3
           |ORDER BY ev.event_type ASC NULLS FIRST""".stripMargin))

  /** Benford first-digit audit (round 7): the leading-significant-digit
    * distribution of line revenues against Benford's law — the
    * fraud/synthetic-data screen auditors run on financial columns
    * (fabricated values over-represent mid digits; natural multi-scale
    * data follows log10(1+1/d)).
    *
    * Scale: digit extraction is a per-row codegen'd string projection;
    * the census is a 9-group aggregate with map-side partials — the
    * cheapest possible audit pass, shareable with any other fused
    * full-scan check (the q_audit_expectations shape).
    *
    * Determinism: the leading digit comes from the DECIMAL STRING
    * rendering of the integer dollar value (both engines render int64
    * identically — no log10 at runtime); the Benford expectations are
    * PRECOMPUTED e6 literals spliced identically into both engines, so
    * no transcendental function executes anywhere.
    */
  private val benfordE6: Map[Int, Long] = (1 to 9).map(dd =>
    dd -> math.floor(1e6 * math.log10(1.0 + 1.0 / dd)).toLong).toMap

  private val benfordSqlCase: String = (1 to 9).map { dd =>
    s"WHEN '$dd' THEN ${benfordE6(dd)}"
  }.mkString("CASE digit ", " ", " END")

  private val profileBenford = QueryDef(
    "q_profile_benford",
    (s, d) => {
      val sparkCase = (1 to 9).map { dd =>
        s"WHEN '$dd' THEN ${benfordE6(dd)}L"
      }.mkString("CASE digit ", " ", " END")
      val v = Tables.lineitem(s, d)
        .select(floor(col("l_extendedprice")).cast("long").as("v"))
        .filter(col("v") >= 1)
        .select(substring(col("v").cast("string"), 1, 1).as("digit"))
      // scoped persist: the total re-aggregates c — unpersisted, both
      // sides of the cross re-ran the corpus scan (r7 plan dump)
      val c = graft.Caches.scoped(
        v.groupBy(col("digit")).agg(count(lit(1)).as("n")))
      c.crossJoin(broadcast(c.agg(sum(col("n")).as("total"))))
        .select(col("digit"), col("n"),
          expr("(n * 1000000L) div total").as("share_e6"),
          expr(sparkCase).as("benford_e6"))
        .withColumn("dev_e6", col("share_e6") - col("benford_e6"))
        .orderBy(ascf("digit"))
    },
    Some(s"""WITH v AS (SELECT CAST(floor(l_extendedprice) AS BIGINT)
            |      AS v
            |    FROM lineitem WHERE l_extendedprice >= 1),
            |dg AS (SELECT substring(CAST(v AS VARCHAR), 1, 1) AS digit
            |  FROM v),
            |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
            |  FROM dg GROUP BY digit),
            |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
            |SELECT digit, n,
            |  CAST((n * 1000000) // total AS BIGINT) AS share_e6,
            |  CAST($benfordSqlCase AS BIGINT) AS benford_e6,
            |  CAST((n * 1000000) // total - ($benfordSqlCase) AS BIGINT)
            |    AS dev_e6
            |FROM c, t
            |ORDER BY digit ASC NULLS FIRST""".stripMargin))

  /** Robust dispersion via median absolute deviation (round 7): per
    * nation, the exact lower median of customer balances and the MAD
    * around it — the outlier-immune location/scale pair (a single
    * corrupted balance moves mean/stddev arbitrarily but shifts
    * median/MAD by at most one rank). Complements [[profileIqr]]
    * (interpolated quartiles + Tukey fences) with the EXACT discrete
    * statistic: the value AT rank (n+1) div 2, not an interpolation, so
    * it is hash-graded with no rounding rule at all.
    *
    * Scale: per-group exact medians are two rank passes partitioned by
    * the group key — groups sort in parallel and nothing crosses groups.
    * This is the many-groups shape; ONE giant group needs a global sort
    * (the q_lake_zorder note) or the q_sketch_quantile approximation.
    *
    * Determinism (D1/D2): values are exact int64 cents; row_number ties
    * on equal cents are order-ambiguous but the value at a fixed rank is
    * tie-invariant, so both engines agree without a key tiebreak.
    */
  private val profileMad = QueryDef(
    "q_profile_mad",
    (s, d) => {
      val cents = graft.Caches.scoped(Tables.customer(s, d)
        .select(col("c_nationkey"),
          (dec(col("c_acctbal")) * 100).cast("long").as("cents")))
      val wv = Window.partitionBy(col("c_nationkey")).orderBy(ascf("cents"))
      val wn = Window.partitionBy(col("c_nationkey"))
      val med = cents
        .withColumn("rn", row_number().over(wv))
        .withColumn("n", count(lit(1)).over(wn))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("c_nationkey"), col("n"), col("cents").as("med"))
      val dev = cents.join(broadcast(med), "c_nationkey")
        .select(col("c_nationkey"), col("n"), col("med"),
          abs(col("cents") - col("med")).as("ad"))
      val wd = Window.partitionBy(col("c_nationkey")).orderBy(ascf("ad"))
      val mad = dev
        .withColumn("rn", row_number().over(wd))
        .filter(col("rn") === expr("(n + 1) div 2"))
      mad.join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("n"),
          col("med").as("med_cents"), col("ad").as("mad_cents"))
        .orderBy(ascf("n_name"))
    },
    Some("""WITH c AS (SELECT c_nationkey,
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           |  FROM customer),
           |r AS (SELECT c_nationkey, cents,
           |    row_number() OVER (PARTITION BY c_nationkey
           |      ORDER BY cents ASC) AS rn,
           |    count(*) OVER (PARTITION BY c_nationkey) AS n
           |  FROM c),
           |med AS (SELECT c_nationkey, n, cents AS med
           |  FROM r WHERE rn = (n + 1) // 2),
           |dev AS (SELECT c.c_nationkey, m.n, m.med,
           |    abs(c.cents - m.med) AS ad
           |  FROM c JOIN med m ON c.c_nationkey = m.c_nationkey),
           |r2 AS (SELECT c_nationkey, n, med, ad,
           |    row_number() OVER (PARTITION BY c_nationkey
           |      ORDER BY ad ASC) AS rn
           |  FROM dev),
           |mad AS (SELECT c_nationkey, n, med, ad
           |  FROM r2 WHERE rn = (n + 1) // 2)
           |SELECT nn.n_name, mad.n, mad.med AS med_cents,
           |  mad.ad AS mad_cents
           |FROM mad JOIN nation nn ON mad.c_nationkey = nn.n_nationkey
           |ORDER BY n_name ASC NULLS FIRST""".stripMargin))

  /** Exact trimmed mean (round 7): per nation, the 10%-trimmed mean of
    * account balances — drop the floor(n/10) smallest and largest by
    * rank, average the middle — the robust location estimate between
    * the mean (drags on outliers) and the median (ignores everything
    * but one rank); reported next to the plain mean so the trim's
    * effect is itself graded.
    *
    * Scale: one rank pass partitioned by the group key (parallel
    * per-group sorts, the q_profile_mad shape); the trimmed aggregate
    * is a conditional sum over the same ranked relation — no second
    * pass.
    *
    * Determinism (D1/D2): rank ties at equal cents are value-invariant
    * for a rank-RANGE trim (the kept multiset is the same regardless of
    * tie order); means are exact int64 floor divisions of non-negative
    * counts (cents can be negative — the subtract-pmod signed floor,
    * D12).
    */
  private val profileTrimmed = QueryDef(
    "q_profile_trimmed",
    (s, d) => {
      val cents = Tables.customer(s, d)
        .select(col("c_nationkey"),
          (dec(col("c_acctbal")) * 100).cast("long").as("cents"))
      val wv = Window.partitionBy(col("c_nationkey")).orderBy(ascf("cents"))
      val wn = Window.partitionBy(col("c_nationkey"))
      val ranked = cents
        .withColumn("rn", row_number().over(wv))
        .withColumn("n", count(lit(1)).over(wn))
        .withColumn("cut", expr("n div 10"))
      ranked.groupBy(col("c_nationkey"))
        .agg(max(col("n")).as("n"),
          sum(when(col("rn") > col("cut") && col("rn") <= col("n") - col("cut"),
            1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rn") > col("cut") && col("rn") <= col("n") - col("cut"),
            col("cents")).otherwise(0L)).as("kept_sum"),
          sum(col("cents")).as("all_sum"))
        .select(col("c_nationkey").cast("long").as("nationkey"), col("n"),
          col("n_kept"),
          expr("(kept_sum - ((kept_sum % n_kept + n_kept) % n_kept))" +
            " div n_kept").as("trimmed_mean_cents"),
          expr("(all_sum - ((all_sum % n + n) % n)) div n")
            .as("mean_cents"))
        .orderBy(ascf("nationkey"))
    },
    Some("""WITH c AS (SELECT c_nationkey,
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents
           |  FROM customer),
           |r AS (SELECT c_nationkey, cents,
           |    row_number() OVER (PARTITION BY c_nationkey
           |      ORDER BY cents ASC) AS rn,
           |    count(*) OVER (PARTITION BY c_nationkey) AS n
           |  FROM c),
           |g AS (SELECT c_nationkey, max(n) AS n,
           |    sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
           |      THEN 1 ELSE 0 END) AS n_kept,
           |    sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
           |      THEN cents ELSE 0 END) AS kept_sum,
           |    sum(cents) AS all_sum
           |  FROM r GROUP BY c_nationkey)
           |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           |  CAST(n AS BIGINT) AS n, CAST(n_kept AS BIGINT) AS n_kept,
           |  CAST((kept_sum - ((kept_sum % n_kept + n_kept) % n_kept))
           |    // n_kept AS BIGINT) AS trimmed_mean_cents,
           |  CAST((all_sum - ((all_sum % n + n) % n)) // n AS BIGINT)
           |    AS mean_cents
           |FROM g
           |ORDER BY nationkey ASC NULLS FIRST""".stripMargin))

  /** Exact two-sample Kolmogorov–Smirnov statistic (round 7): the max
    * ECDF gap between the BUILDING segment's balance distribution and
    * everyone else's — the standard "did the distribution drift"
    * two-sample test (train-vs-serve feature drift, cohort A/B shape
    * comparison), computed EXACTLY: at every distinct value the gap
    * |F1−F2| = |c1·n2 − c2·n1| / (n1·n2), so the max is an integer
    * argmax with no floating point until the final e6 quantization.
    * The value AT the max gap is reported too (tie → smallest value) —
    * where the distributions diverge is usually the actionable part.
    *
    * Scale: one group-by collapses the corpus to the distinct-value
    * relation carrying both samples' per-value counts; the cumulative
    * window and argmax run value-distinct, never table-sized (the
    * q_agg_skyline reduce-then-rank layout; a fleet range-partitions
    * the prefix sum).
    *
    * Determinism (D1/D2): the gap algebra (c·n products, n1·n2) runs
    * in DECIMAL(38,0)/HUGEINT — bare int64 crosses 2⁶³ near 3e9 rows,
    * far below corpus scale; ks_num pins to DOUBLE (D9), ks_e6 is an
    * exact BIGINT ≤ 1e6; argmax order (gap DESC, cents ASC) is total.
    */
  private val profileKs = QueryDef(
    "q_profile_ks",
    (s, d) => {
      val base = Tables.customer(s, d).select(
        (dec(col("c_acctbal")) * 100).cast("long").as("cents"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("g1"))
      val perVal = base.groupBy(col("cents"))
        .agg(sum(col("g1")).as("a"),
          sum(lit(1L) - col("g1")).as("b"))
      val w = Window.orderBy(ascf("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = base.agg(sum(col("g1")).as("n1"),
        sum(lit(1L) - col("g1")).as("n2"))
      perVal
        .withColumn("c1", sum(col("a")).over(w))
        .withColumn("c2", sum(col("b")).over(w))
        .join(broadcast(tot))
        // c·n products and n1·n2 cross int64 near 3e9 rows — the whole
        // gap algebra (argmax comparison included) stages through
        // DECIMAL(38,0); ks_num pins to DOUBLE (D9 — both engines
        // round the same exact decimal) so the output stays gradeable
        // and scale-safe, while ks_e6 stays an exact BIGINT ≤ 1e6
        .select(col("cents"), col("n1"), col("n2"),
          abs(col("c1").cast(org.apache.spark.sql.types.DecimalType(38, 0))
              * col("n2")
            - col("c2").cast(org.apache.spark.sql.types.DecimalType(38, 0))
              * col("n1")).as("gap"))
        .orderBy(descl("gap"), ascf("cents"))
        .limit(1)
        .select(col("n1"), col("n2"),
          col("gap").cast("double").as("ks_num"),
          expr("cast(gap * 1000000 div (cast(n1 as decimal(38,0)) * n2)" +
            " as bigint)").as("ks_e6"),
          col("cents").as("ks_at_cents"))
        .orderBy(ascf("n1"))
    },
    Some("""WITH base AS (SELECT
           |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS cents,
           |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
           |  FROM customer),
           |pv AS (SELECT cents, CAST(sum(g1) AS BIGINT) AS a,
           |    CAST(sum(1 - g1) AS BIGINT) AS b
           |  FROM base GROUP BY cents),
           |cum AS (SELECT cents,
           |    CAST(sum(a) OVER (ORDER BY cents ASC ROWS BETWEEN
           |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
           |    CAST(sum(b) OVER (ORDER BY cents ASC ROWS BETWEEN
           |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2
           |  FROM pv),
           |t AS (SELECT CAST(sum(g1) AS BIGINT) AS n1,
           |    CAST(sum(1 - g1) AS BIGINT) AS n2 FROM base),
           |g AS (SELECT cents, t.n1, t.n2,
           |    abs(CAST(c1 AS HUGEINT) * t.n2
           |      - CAST(c2 AS HUGEINT) * t.n1) AS gap
           |  FROM cum CROSS JOIN t
           |  ORDER BY gap DESC NULLS LAST, cents ASC NULLS FIRST
           |  LIMIT 1)
           |SELECT n1, n2, CAST(gap AS DOUBLE) AS ks_num,
           |  CAST((gap * 1000000) // (CAST(n1 AS HUGEINT) * n2)
           |    AS BIGINT) AS ks_e6,
           |  cents AS ks_at_cents
           |FROM g
           |ORDER BY n1 ASC NULLS FIRST""".stripMargin))

  /** Source-priority canonical selection (round 7): when the same
    * document arrives from several sources, keep ONE canonical copy by
    * source-tier preference — curated > mirror > archive — the
    * provenance rule every multi-source corpus merge applies after
    * exact dedup finds the groups (CommonCrawl-vs-curated, multi-dump
    * unions, vendor re-deliveries). Duplication is SYNTHESIZED
    * deterministically (the q_fn_url pattern): every doc_id ≡ 0 (mod 3)
    * gains a `mirror_*` copy, ≡ 0 (mod 6) also an `arch_*` copy, and
    * originals with doc_id ≡ 0 (mod 15) are withheld — so groups of
    * size 1–3 exist, the primary usually wins, and mirrors MUST win
    * exactly where the primary is absent (n_kept_mirror counts those;
    * a broken tiebreak or group key shifts every census column).
    *
    * Scale: one shuffle on the text group key (the exact-dedup shape —
    * production pre-hashes text to a 128-bit key so the exchange
    * carries a fixed-width key, same plan); the per-group argmin is a
    * window by (tier, doc_id) — a total order. Census is lang-sized.
    *
    * Determinism (D1/D2): integer tiers; (tier, doc_id) unique within
    * a group; census columns are order-free sums.
    */
  private val dedupPriority = QueryDef(
    "q_dedup_priority",
    (s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
      val primary = base.filter(pmod(col("doc_id"), lit(15)) =!= 0)
      val mirror = base.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          concat(lit("mirror_"), col("source")).as("source"), col("text"))
      val arch = base.filter(pmod(col("doc_id"), lit(6)) === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("lang"),
          concat(lit("arch_"), col("source")).as("source"), col("text"))
      val all = primary.unionByName(mirror).unionByName(arch)
        .withColumn("tier",
          when(col("source").startsWith("arch_"), lit(2L))
            .when(col("source").startsWith("mirror_"), lit(1L))
            .otherwise(lit(0L)))
      val w = Window.partitionBy(col("lang"), col("text"))
        .orderBy(ascf("tier"), ascf("doc_id"))
      val ranked = all.withColumn("rn", row_number().over(w))
      ranked.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs_in"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_groups"),
          sum(when(col("rn") === 1 && col("tier") === 0, 1L).otherwise(0L))
            .as("n_kept_primary"),
          sum(when(col("rn") === 1 && col("tier") === 1, 1L).otherwise(0L))
            .as("n_kept_mirror"),
          sum(when(col("rn") === 1 && col("tier") === 2, 1L).otherwise(0L))
            .as("n_kept_arch"),
          sum(when(col("rn") === 1, col("doc_id")).otherwise(0L))
            .as("kept_id_checksum"))
        .orderBy(ascf("lang"))
    },
    Some("""WITH base AS (SELECT doc_id, lang, source, text FROM documents),
           |written AS (
           |  SELECT doc_id, lang, source, text FROM base
           |    WHERE doc_id % 15 <> 0
           |  UNION ALL SELECT doc_id + 1000000, lang,
           |    'mirror_' || source, text FROM base WHERE doc_id % 3 = 0
           |  UNION ALL SELECT doc_id + 2000000, lang,
           |    'arch_' || source, text FROM base WHERE doc_id % 6 = 0),
           |tiered AS (SELECT *, CASE
           |    WHEN source LIKE 'arch_%' THEN 2
           |    WHEN source LIKE 'mirror_%' THEN 1 ELSE 0 END AS tier
           |  FROM written),
           |ranked AS (SELECT lang, doc_id, tier, row_number() OVER (
           |    PARTITION BY lang, text ORDER BY tier ASC, doc_id ASC)
           |    AS rn
           |  FROM tiered)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs_in,
           |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_groups,
           |  CAST(sum(CASE WHEN rn = 1 AND tier = 0 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_kept_primary,
           |  CAST(sum(CASE WHEN rn = 1 AND tier = 1 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_kept_mirror,
           |  CAST(sum(CASE WHEN rn = 1 AND tier = 2 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_kept_arch,
           |  CAST(sum(CASE WHEN rn = 1 THEN doc_id ELSE 0 END) AS BIGINT)
           |    AS kept_id_checksum
           |FROM ranked GROUP BY lang
           |ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Population stability index drift monitor (round 7): per event
    * type, PSI = Σ_bins (p−q)·ln(p/q) between the FIRST and SECOND
    * half of the time range (split at the epoch-µs midpoint), bins =
    * hour-of-day — the production "did this feature's distribution
    * move between training and serving" check every ML monitoring
    * stack runs nightly (industry thresholds: 0.1 warn / 0.25 act,
    * i.e. psi_e6 100000/250000). q_profile_ks grades a two-SAMPLE gap
    * on a value column; PSI grades a two-PERIOD gap on a binned shape,
    * plus WHICH bin moved most (worst_hod) — the actionable readout.
    *
    * Laplace +1 smoothing on the observed-cell relation keeps every
    * log finite when a bin empties in one half (the standard PSI
    * guard, made part of the CONTRACT: totals are smoothed sums, so
    * both engines agree exactly). p/q never materialize as doubles:
    * the sign mass (p−q) = (a'·B − b'·A)/(A·B) stays integer (a'·B ≤
    * 10¹⁴ at the 10× probe; widen to DECIMAL first beyond that), and
    * ln(p/q) = lnInt(a'·B) − lnInt(b'·A) through the staged-ln ladder
    * (D12), floor-quantized to e6 per bin; term numerators widen to
    * DECIMAL(38,0)/HUGEINT and divide ONCE per type by A·B (both
    * engines truncate toward zero — Spark `div` ≡ DuckDB `//`).
    *
    * Scale: the corpus collapses to ≤ types·24 cells in one
    * conditional-aggregate pass (a/b via CASE sums — no second scan
    * per half); the midpoint is a 1-row bounds sketch cross-joined in
    * (the q_lake_zorder pattern); everything downstream is cell-grain.
    *
    * Determinism: all-integer except the pinned lnInt doubles; the
    * worst-bin argmax breaks ties to the SMALLEST hour via a
    * conditional MIN against the per-type max |term| (D1).
    */
  private val profilePsi = QueryDef(
    "q_profile_psi",
    (s, d) => {
      import graft.functions.DetMath
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val ev = Tables.events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
      val bounds = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      val cells = ev.crossJoin(broadcast(bounds))
        .withColumn("mid", expr("lo + (hi - lo) div 2"))
        .withColumn("hod", floorDiv(col("us"), 3600000000L) % lit(24L))
        .groupBy(col("event_type"), col("hod"))
        .agg(sum(when(col("us") <= col("mid"), 1L).otherwise(0L)).as("a"),
          sum(when(col("us") > col("mid"), 1L).otherwise(0L)).as("b"))
        .withColumn("sa", col("a") + lit(1L))
        .withColumn("sb", col("b") + lit(1L))
      val tots = cells.groupBy(col("event_type").as("et2"))
        .agg(sum(col("sa")).as("at2"), sum(col("sb")).as("bt2"),
          sum(col("a")).as("rawa"), sum(col("b")).as("rawb"),
          count(lit(1)).as("nb"))
      val tb = cells
        .join(broadcast(tots), col("event_type") === col("et2"))
        .withColumn("xa", col("sa") * col("bt2"))
        .withColumn("xb", col("sb") * col("at2"))
        .withColumn("dln", floor(
          (DetMath.lnInt(col("xa")) - DetMath.lnInt(col("xb")))
            * lit(1000000.0)).cast("long"))
        .withColumn("tnum", (col("xa") - col("xb")).cast(dec38) * col("dln"))
        .withColumn("tb_e6", expr(
          "cast(tnum div (cast(at2 as decimal(38,0)) * bt2) as bigint)"))
      val w = Window.partitionBy(col("event_type"))
      tb.withColumn("wabs", max(abs(col("tb_e6"))).over(w))
        .groupBy(col("event_type"))
        .agg(min(col("nb")).as("n_bins"),
          min(col("rawa")).as("n_first"), min(col("rawb")).as("n_second"),
          expr("""cast(sum(tnum) div
                 |  (cast(min(at2) as decimal(38,0)) * min(bt2)) as bigint)"""
            .stripMargin).as("psi_e6"),
          min(col("wabs")).as("worst_abs_e6"),
          min(when(abs(col("tb_e6")) === col("wabs"), col("hod")))
            .as("worst_hod"))
        .orderBy(ascf("event_type"))
    },
    Some {
      import graft.functions.DetMath._
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
         |bd AS (SELECT min(us) AS lo, max(us) AS hi FROM ev),
         |cell AS (SELECT event_type, (us // 3600000000) % 24 AS hod,
         |    CAST(sum(CASE WHEN us <= lo + (hi - lo) // 2
         |      THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    CAST(sum(CASE WHEN us > lo + (hi - lo) // 2
         |      THEN 1 ELSE 0 END) AS BIGINT) AS b
         |  FROM ev CROSS JOIN bd GROUP BY 1, 2),
         |sm AS (SELECT event_type, hod, a, b,
         |    a + 1 AS sa, b + 1 AS sb FROM cell),
         |tt AS (SELECT event_type AS et2, CAST(sum(sa) AS BIGINT) AS at2,
         |    CAST(sum(sb) AS BIGINT) AS bt2, CAST(sum(a) AS BIGINT) AS rawa,
         |    CAST(sum(b) AS BIGINT) AS rawb, CAST(count(*) AS BIGINT) AS nb
         |  FROM sm GROUP BY 1),
         |j AS (SELECT sm.event_type, sm.hod, sm.sa * tt.bt2 AS xa,
         |    sm.sb * tt.at2 AS xb, tt.at2, tt.bt2, tt.rawa, tt.rawb, tt.nb
         |  FROM sm JOIN tt ON sm.event_type = tt.et2),
         |r1 AS (SELECT *, ${kSql("xa")} AS ka, ${kSql("xb")} AS kb FROM j),
         |r2 AS (SELECT *, ${mSql("xa", "ka")} AS ma,
         |    ${mSql("xb", "kb")} AS mb FROM r1),
         |r3 AS (SELECT *, ${zSql("ma")} AS za, ${zSql("mb")} AS zb FROM r2),
         |r4 AS (SELECT *, za * za AS z2a, zb * zb AS z2b FROM r3),
         |r5 AS (SELECT *, ${hornerSql("z2a")} AS ha,
         |    ${hornerSql("z2b")} AS hb FROM r4),
         |tm AS (SELECT event_type, hod, xa, xb, at2, bt2, rawa, rawb, nb,
         |    CAST(floor((${lnSql("ka", "za", "ha")}
         |      - ${lnSql("kb", "zb", "hb")})
         |      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS dln
         |  FROM r5),
         |tb AS (SELECT *, CAST(xa - xb AS HUGEINT) * dln AS tnum,
         |    CAST((CAST(xa - xb AS HUGEINT) * dln)
         |      // (CAST(at2 AS HUGEINT) * bt2) AS BIGINT) AS tb_e6
         |  FROM tm),
         |ww AS (SELECT *, max(abs(tb_e6))
         |    OVER (PARTITION BY event_type) AS wabs FROM tb)
         |SELECT event_type, min(nb) AS n_bins, min(rawa) AS n_first,
         |  min(rawb) AS n_second,
         |  CAST(sum(tnum) // (CAST(min(at2) AS HUGEINT) * min(bt2))
         |    AS BIGINT) AS psi_e6,
         |  CAST(min(wabs) AS BIGINT) AS worst_abs_e6,
         |  CAST(min(CASE WHEN abs(tb_e6) = wabs THEN hod END)
         |    AS BIGINT) AS worst_hod
         |FROM ww GROUP BY event_type
         |ORDER BY event_type ASC NULLS FIRST""".stripMargin
    })

  /** Entity-resolution blocking (round 8, batch 100): the record-linkage
    * shape the dedup family's text/vector keys do not cover — match the
    * SAME real-world entity across two source systems whose records
    * disagree (typos, renames, moved phone numbers). Two deterministic
    * record feeds are synthesized per customer (system "a" verbatim;
    * system "b" with key-dependent perturbations: a one-char name typo,
    * an appended suffix, a full rename, a moved phone), then:
    *
    *   1. BLOCKING, multi-key: candidates = UNION of pairs sharing the
    *      phone-prefix block OR the name-suffix block — the union is
    *      why multi-key blocking beats any single key's recall (each
    *      perturbation defeats exactly one key), and candidates stay
    *      block-bounded, never all-pairs.
    *   2. VERIFY: levenshtein(nameA, nameB) ≤ 2 on the candidate set
    *      only.
    *
    * Graded per nation against the construction's ground truth (same
    * customer key): candidate/verified/correct counts + precision and
    * recall (e6). The rename variant is caught by blocking but
    * correctly REJECTED by verify (recall < 1, measured); phone-block
    * collisions between near-key customers create lev ≤ 2 FALSE
    * matches (precision < 1, measured) — both failure modes are part
    * of the graded surface, not noise.
    *
    * Scale: blocking is two equi-joins on block keys (bucket-bounded:
    * ~n/10⁴ per phone block); verify runs per candidate, never per
    * pair of records; the census is a 25-group aggregate. This is the
    * Fellegi–Sunter blocking architecture every production linkage
    * system runs.
    *
    * Determinism: perturbations and phone are pure key arithmetic;
    * levenshtein is exact on both engines (the q_text_levenshtein
    * precedent); D1 on nation.
    */
  private val erBlocking = QueryDef(
    "q_er_blocking",
    (s, d) => {
      val c = Tables.customer(s, d).select(
        col("c_custkey").cast("long").as("k"), col("c_name").as("name"),
        col("c_nationkey").cast("long").as("nation"))
      val phone = pmod(col("k") * 7919L + 13L, lit(100000L))
      def blocked(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("b1", expr("phone div 10"))
        .withColumn("b2", expr("right(name, 6)"))
      val a = blocked(c.select(col("k"), col("name"), col("nation"),
        phone.as("phone")))
      val bName = when(pmod(col("k"), lit(10)) === 0,
          concat(lit("Custmer#"), substring(col("name"), 10, 9)))
        .when(pmod(col("k"), lit(10)) === 1, concat(col("name"), lit("X")))
        .when(pmod(col("k"), lit(10)) === 2,
          concat(lit("Client#"), substring(col("name"), 10, 9)))
        .otherwise(col("name"))
      val bPhone = when(pmod(col("k"), lit(20)) === 3,
        pmod(phone + 50000L, lit(100000L))).otherwise(phone)
      val b = blocked(c.select(col("k"), bName.as("name"), col("nation"),
        bPhone.as("phone")))
      def pairs(key: String) = a.alias("x").join(b.alias("y"),
          col(s"x.$key") === col(s"y.$key"))
        .select(col("x.k").as("ka"), col("y.k").as("kb"),
          col("x.name").as("na"), col("y.name").as("nb"),
          col("x.nation").as("nation"))
      val cand = pairs("b1").unionByName(pairs("b2")).distinct()
      val ver = cand.withColumn("lev",
        levenshtein(col("na"), col("nb")).cast("long"))
      val byNation = ver.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("lev") <= 2, 1L).otherwise(0L)).as("n_verified"),
          sum(when(col("lev") <= 2 && col("ka") === col("kb"), 1L)
            .otherwise(0L)).as("n_correct"))
      a.groupBy(col("nation")).agg(count(lit(1)).as("n_true"))
        .join(byNation, Seq("nation"), "left")
        .select(col("nation"), col("n_true"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          coalesce(col("n_verified"), lit(0L)).as("n_verified"),
          coalesce(col("n_correct"), lit(0L)).as("n_correct"))
        .withColumn("precision_e6", expr(
          "case when n_verified > 0 then n_correct * 1000000 div n_verified else 0 end"))
        .withColumn("recall_e6", expr("n_correct * 1000000 div n_true"))
        .orderBy(ascf("nation"))
    },
    Some("""WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k,
           |    c_name AS name, CAST(c_nationkey AS BIGINT) AS nation,
           |    (CAST(c_custkey AS BIGINT) * 7919 + 13) % 100000 AS phone
           |  FROM customer),
           |a AS (SELECT k, name, nation, phone, phone // 10 AS b1,
           |    right(name, 6) AS b2 FROM c),
           |b0 AS (SELECT k,
           |    CASE WHEN k % 10 = 0 THEN 'Custmer#' || substring(name, 10, 9)
           |      WHEN k % 10 = 1 THEN name || 'X'
           |      WHEN k % 10 = 2 THEN 'Client#' || substring(name, 10, 9)
           |      ELSE name END AS name,
           |    nation,
           |    CASE WHEN k % 20 = 3 THEN (phone + 50000) % 100000
           |      ELSE phone END AS phone
           |  FROM c),
           |b AS (SELECT k, name, nation, phone, phone // 10 AS b1,
           |    right(name, 6) AS b2 FROM b0),
           |cand AS (
           |  SELECT DISTINCT ka, kb, na, nb, nation FROM (
           |    SELECT x.k AS ka, y.k AS kb, x.name AS na, y.name AS nb,
           |      x.nation AS nation
           |    FROM a x JOIN b y ON x.b1 = y.b1
           |    UNION ALL
           |    SELECT x.k AS ka, y.k AS kb, x.name AS na, y.name AS nb,
           |      x.nation AS nation
           |    FROM a x JOIN b y ON x.b2 = y.b2)),
           |v AS (SELECT nation, count(*) AS n_candidates,
           |    sum(CASE WHEN levenshtein(na, nb) <= 2 THEN 1 ELSE 0 END)
           |      AS n_verified,
           |    sum(CASE WHEN levenshtein(na, nb) <= 2 AND ka = kb
           |      THEN 1 ELSE 0 END) AS n_correct
           |  FROM cand GROUP BY 1),
           |t AS (SELECT nation, count(*) AS n_true FROM a GROUP BY 1)
           |SELECT t.nation AS nation, CAST(t.n_true AS BIGINT) AS n_true,
           |  CAST(coalesce(v.n_candidates, 0) AS BIGINT) AS n_candidates,
           |  CAST(coalesce(v.n_verified, 0) AS BIGINT) AS n_verified,
           |  CAST(coalesce(v.n_correct, 0) AS BIGINT) AS n_correct,
           |  CAST(CASE WHEN coalesce(v.n_verified, 0) > 0
           |    THEN coalesce(v.n_correct, 0) * 1000000 // v.n_verified
           |    ELSE 0 END AS BIGINT) AS precision_e6,
           |  CAST(coalesce(v.n_correct, 0) * 1000000 // t.n_true AS BIGINT)
           |    AS recall_e6
           |FROM t LEFT JOIN v ON t.nation = v.nation
           |ORDER BY nation ASC NULLS FIRST""".stripMargin))

  /** Corpus mixing PLAN with cap-and-redistribute (round 8, batch 106):
    * q_mix_weighted/q_mix_temperature EXECUTE a mix; this key computes
    * the plan document a training run publishes first — weighted
    * target shares (weight = source id mod 4 + 1, the fixture stand-in
    * for per-domain quality weights) over an 80%-of-corpus budget make
    * the naive quota OVERSHOOT the heavy sources' availability, so the
    * plan caps those at availability and redistributes their surplus
    * to the uncapped sources proportionally to remaining capacity (one
    * deterministic water-filling round; the remainder a truncating
    * proportional split cannot place is stated, not hidden). Graded
    * per source: available docs, naive target, planned count, sampling
    * rate (e6), capped flag.
    *
    * Scale: ONE corpus pass to the source census; every plan
    * computation is arithmetic on that census crossed with two 1-row
    * aggregates — the cost profile of a plan, not a mix.
    *
    * Determinism: all-integer quotas and truncating proportional
    * splits; D1 on source.
    */
  private val mixPlan = QueryDef(
    "q_mix_plan",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("w",
          expr("cast(substring(source, 4) as bigint) % 4 + 1"))
      val tot = counts.agg(sum(col("n_docs")).as("total"),
        sum(col("w")).as("sw"))
      val base = counts.crossJoin(broadcast(tot))
        .withColumn("target", expr("(total * 4 div 5) * w div sw"))
        .withColumn("capped",
          when(col("n_docs") < col("target"), 1L).otherwise(0L))
      val pools = base.agg(
        sum(when(col("capped") === 1L, col("target") - col("n_docs"))
          .otherwise(0L)).as("surplus"),
        sum(when(col("capped") === 0L, col("n_docs") - col("target"))
          .otherwise(0L)).as("capacity"))
      base.crossJoin(broadcast(pools))
        .withColumn("planned",
          when(col("capped") === 1L, col("n_docs"))
            .otherwise(col("target") + when(col("capacity") > 0,
              expr("surplus * (n_docs - target) div capacity"))
              .otherwise(lit(0L))))
        .select(col("source"), col("n_docs"), col("target"),
          col("planned"),
          expr("planned * 1000000 div n_docs").as("rate_e6"),
          col("capped"))
        .orderBy(ascf("source"))
    },
    Some("""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(substring(source, 4) AS BIGINT) % 4 + 1 AS w
           |  FROM documents GROUP BY 1),
           |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
           |    CAST(sum(w) AS BIGINT) AS sw FROM c),
           |b AS (SELECT c.source, c.n_docs,
           |    (t.total * 4 // 5) * c.w // t.sw AS target,
           |    CASE WHEN c.n_docs < (t.total * 4 // 5) * c.w // t.sw
           |      THEN 1 ELSE 0 END AS capped
           |  FROM c CROSS JOIN t),
           |p AS (SELECT
           |    CAST(sum(CASE WHEN capped = 1 THEN target - n_docs
           |      ELSE 0 END) AS BIGINT) AS surplus,
           |    CAST(sum(CASE WHEN capped = 0 THEN n_docs - target
           |      ELSE 0 END) AS BIGINT) AS capacity
           |  FROM b)
           |SELECT b.source AS source, b.n_docs AS n_docs,
           |  CAST(b.target AS BIGINT) AS target,
           |  CAST(CASE WHEN b.capped = 1 THEN b.n_docs
           |    ELSE b.target + CASE WHEN p.capacity > 0
           |      THEN p.surplus * (b.n_docs - b.target) // p.capacity
           |      ELSE 0 END END AS BIGINT) AS planned,
           |  CAST((CASE WHEN b.capped = 1 THEN b.n_docs
           |    ELSE b.target + CASE WHEN p.capacity > 0
           |      THEN p.surplus * (b.n_docs - b.target) // p.capacity
           |      ELSE 0 END END) * 1000000 // b.n_docs AS BIGINT)
           |    AS rate_e6,
           |  CAST(b.capped AS BIGINT) AS capped
           |FROM b CROSS JOIN p
           |ORDER BY source ASC NULLS FIRST""".stripMargin))

  /** Token-budget curation (round 10): the "fill the training budget
    * with the best documents" op — rank the corpus by a deterministic
    * quality score (e6 type-token ratio, the q_text_quality diversity
    * axis) with doc_id as the total-order tie-break, then greedily take
    * documents while the running token total stays within the budget
    * (half the corpus's tokens, computed from the data so the key is
    * scale-factor-free). Output is the per-language census of what the
    * selection kept — the number every mixing plan negotiation starts
    * from.
    *
    * Scale: the global running sum uses Dsl.globalCumSum (range
    * exchange + broadcast prefix offsets), NOT a partitionBy-less
    * window — no single-task corpus stage at any size; the budget is a
    * broadcast 1-row cross join; the census is a 5-group rollup.
    *
    * Determinism (D1/D2/D12): score = (distinct_tokens·1e6) div tokens,
    * exact int64; the selection threshold is cumulative-INCLUSIVE ≤
    * budget with budget = total div 2, so membership is a pure integer
    * predicate over an exactly-ordered prefix sum.
    */
  private val mixTokenBudget = QueryDef(
    "q_mix_token_budget",
    (s, d) => {
      val t = split(col("text"), " ")
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          size(t).cast("long").as("toks"),
          (size(array_distinct(t)).cast("long") * 1000000L).as("dist6"))
        .withColumn("qscore", expr("dist6 div toks"))
        .select(col("lang"), col("doc_id"), col("toks"), col("qscore"))
      val withCum = graft.Dsl.globalCumSum(docs, "toks", "cum_toks",
        Seq(descl("qscore"), ascf("doc_id")))
      val budget = docs.agg(sum(col("toks")).as("total_toks"))
        .withColumn("budget", expr("total_toks div 2"))
      withCum.crossJoin(broadcast(budget))
        .withColumn("sel", (col("cum_toks") <= col("budget")).cast("long"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("tokens_total"),
          sum(col("sel")).as("n_selected"),
          sum(col("sel") * col("toks")).as("tokens_selected"),
          sum(col("sel") * col("doc_id")).as("sel_id_checksum"))
        .orderBy(ascf("lang"))
    },
    Some("""WITH t AS (SELECT lang, doc_id,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
           |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           |      * 1000000 AS dist6
           |  FROM documents),
           |q AS (SELECT lang, doc_id, toks, dist6 // toks AS qscore FROM t),
           |c AS (SELECT lang, doc_id, toks,
           |    sum(toks) OVER (ORDER BY qscore DESC NULLS LAST,
           |      doc_id ASC NULLS FIRST
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS cum_toks
           |  FROM q),
           |b AS (SELECT sum(toks) // 2 AS budget FROM t),
           |s AS (SELECT lang, doc_id, toks,
           |    CASE WHEN cum_toks <= b.budget THEN 1 ELSE 0 END AS sel
           |  FROM c CROSS JOIN b)
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(toks) AS BIGINT) AS tokens_total,
           |  CAST(sum(sel) AS BIGINT) AS n_selected,
           |  CAST(sum(sel * toks) AS BIGINT) AS tokens_selected,
           |  CAST(sum(sel * doc_id) AS BIGINT) AS sel_id_checksum
           |FROM s GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Duplicate-cluster-downweighted corpus mass (round 10): the mixing
    * correction every dedup-aware sampler applies — each document's
    * weight is 1/|its exact-duplicate cluster| so a 1000-copy boilerplate
    * page contributes ONE document of probability mass instead of 1000.
    * Emits the per-language raw vs effective (weighted) doc and token
    * masses; effective/raw is exactly the language's duplication factor,
    * which is what decides whether to dedup before or after mixing.
    *
    * Scale: cluster size is a count over a window PARTITIONED BY the
    * text key — one shuffle on the dedup grain (the q_dedup_exact
    * exchange), then projection + a 5-group rollup. No driver state.
    * At 100 TB the exchange key would be a 128-bit content fingerprint
    * (xxhash128/sha of the text) rather than the text itself — same
    * plan, ~100× less shuffle payload; the text key is used here only
    * because the DuckDB oracle must compute the IDENTICAL clustering
    * and the engines share no hash function (rule D12's cross-engine
    * constraint, stated rather than hidden).
    *
    * Determinism (D2/D12): weights are e6 floor divisions of exact
    * counts; per-row weighted tokens floor independently on both
    * engines in the same order.
    */
  /** Curriculum staging (round 11): order the corpus by a difficulty
    * score — mean word length in e6 (alpha chars per token, the
    * q_quality_gopher r2 quantity: longer words ≈ harder text) with
    * doc_id as the total-order tiebreak — and cut it into 5 equal
    * curriculum stages. Curriculum learning feeds a model easy→hard;
    * the cut must be an EXACT global quantile assignment that is
    * bit-stable across runs and engines or stage boundaries drift
    * between training jobs. The per-stage census (doc/token volume,
    * score range, id-checksum) pins exactly WHICH docs land in each
    * stage, not just how many.
    *
    * Scale: the global cut is `Dsl.globalNtile` (range exchange +
    * broadcast prefix offsets — no single-partition window over the
    * corpus); the census is a 5-group rollup with partials. The score
    * is per-doc bounded int64 (chars per doc ≪ 2⁵³/1e6).
    *
    * Determinism (D1/D2/D12): integer score; ntile over the total
    * (score, doc_id) order — exactly DuckDB's `ntile(5)`.
    */
  private val mixCurriculum = QueryDef(
    "q_mix_curriculum",
    (s, d) => {
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
        .withColumn("score_e6",
          expr("((n_chars - (n_toks - 1)) * 1000000) div n_toks"))
      val staged = graft.Dsl.globalNtile(scored, 5, "stage",
          Seq(ascf("score_e6"), ascf("doc_id")))
        .withColumn("stage", col("stage").cast("long"))
      staged.groupBy(col("stage"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          min(col("score_e6")).as("min_score_e6"),
          max(col("score_e6")).as("max_score_e6"),
          // mod-sum checksum (see q_priv_kanon): a raw doc_id sum
          // crosses int64 at corpus scale with divergent wrap/widen
          expr("cast(sum(cast(doc_id as decimal(38,0))) % 1000000007" +
            " as bigint)").as("id_checksum"))
        .orderBy(ascf("stage"))
    },
    Some("""WITH sc AS (SELECT doc_id, n_chars,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
           |  FROM documents),
           |st AS (SELECT doc_id, n_toks,
           |    ((n_chars - (n_toks - 1)) * 1000000) // n_toks AS score_e6
           |  FROM sc),
           |nt AS (SELECT doc_id, n_toks, score_e6,
           |    CAST(ntile(5) OVER (ORDER BY score_e6 ASC, doc_id ASC)
           |      AS BIGINT) AS stage
           |  FROM st)
           |SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           |  CAST(min(score_e6) AS BIGINT) AS min_score_e6,
           |  CAST(max(score_e6) AS BIGINT) AS max_score_e6,
           |  CAST(sum(CAST(doc_id AS HUGEINT)) % 1000000007 AS BIGINT)
           |    AS id_checksum
           |FROM nt GROUP BY stage
           |ORDER BY stage ASC NULLS FIRST""".stripMargin))

  private val mixDedupWeight = QueryDef(
    "q_mix_dedup_weight",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), col("text"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .withColumn("c", count(lit(1)).over(Window.partitionBy(col("text"))))
        .withColumn("w_e6", expr("1000000 div c"))
      docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_unique"),
          sum(col("toks")).as("raw_tokens"),
          sum(col("w_e6")).as("eff_docs_e6"),
          sum(expr("(toks * w_e6) div 1000000")).as("eff_tokens"))
        // eff_docs_e6 = 0 pins to 0 (ADVICE r10, convention D2): w_e6
        // floors to 0 for clusters larger than 1e6 docs, so a language
        // made entirely of such mega-clusters has a zero denominator —
        // without the pin Spark returned NULL while DuckDB errored.
        .withColumn("dup_factor_e6",
          expr("""CASE WHEN eff_docs_e6 = 0 THEN 0
                 | ELSE cast((cast(n_docs as decimal(38,0)) * 1000000000000)
                 |  div eff_docs_e6 as bigint) END""".stripMargin))
        .orderBy(ascf("lang"))
    },
    Some("""WITH t AS (SELECT lang, doc_id, text,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
           |    count(*) OVER (PARTITION BY text) AS c
           |  FROM documents),
           |w AS (SELECT lang, doc_id, toks, c,
           |    CAST(1000000 // c AS BIGINT) AS w_e6 FROM t),
           |g AS (SELECT lang, count(*) AS n_docs,
           |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_unique,
           |    CAST(sum(toks) AS BIGINT) AS raw_tokens,
           |    CAST(sum(w_e6) AS BIGINT) AS eff_docs_e6,
           |    CAST(sum((toks * w_e6) // 1000000) AS BIGINT) AS eff_tokens
           |  FROM w GROUP BY lang)
           |SELECT lang, n_docs, n_unique, raw_tokens, eff_docs_e6,
           |  eff_tokens,
           |  CAST(CASE WHEN eff_docs_e6 = 0 THEN 0
           |    ELSE (CAST(n_docs AS HUGEINT) * 1000000000000)
           |      // eff_docs_e6 END AS BIGINT) AS dup_factor_e6
           |FROM g ORDER BY lang ASC NULLS FIRST""".stripMargin))

  def defs: Seq[QueryDef] = Seq(packSequences, contamination, repetition,
    dedupIncremental, mixWeighted, lengthHist, mixTemperature, qualityGopher,
    mixUpsample, profileCols, profileSkew, profileDepth, dedupLines, textPii,
    textChunking, profileCorr, profileIqr, profileBenford, profileMad, dedupPriority,
    profileTrimmed, profileKs, profilePsi, erBlocking, mixPlan,
    mixTokenBudget, mixDedupWeight, mixCurriculum)
}
