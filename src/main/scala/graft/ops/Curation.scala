package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
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

  def defs: Seq[QueryDef] = Seq(packSequences, contamination)
}
