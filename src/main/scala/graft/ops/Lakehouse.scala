package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lakehouse maintenance operators (round 5): MERGE-style upsert and a
  * bucketed co-located join — the two table-management shapes a resident
  * analytics engine needs beyond plain scans (SURVEY.md §2.2 forward
  * plan; `sources/Lake.scala` covers the partition-layout third).
  */
object Lakehouse {

  /** MERGE INTO (upsert) semantics, expressed as the scale-shape Spark
    * equivalent: resident corpus UNION batch, one hash shuffle on the
    * merge key, window keep-highest-version per key. The batch carries
    * UPDATES (the 10% deterministic hash-bucket slice re-shipped with
    * n_chars + 7 — the fixture stand-in for re-crawled documents; same
    * bucket fn as q_sample_hash/q_split_train_val, so batch membership
    * composes with the sampling keys) and INSERTS (buckets 10–11
    * re-keyed past 10⁷ — ids no resident row occupies). Census output
    * proves exactly which rows survived: updated rows carry version 2
    * under the resident id space, inserts sit above it, and unchanged
    * residents make up the rest.
    *
    * At 100 TB: identical plan — the window dedup touches only keys the
    * batch collides with after AQE; with a date-partitioned lake layout
    * the shuffle narrows further to overlapping partitions
    * (sources/Lake.scala). Unrolled-iteration determinism is not needed;
    * the only tie (resident v1 vs batch v2 on one key) is broken by the
    * total (version DESC) order.
    */
  private val lakeMerge = QueryDef(
    "q_lake_merge",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val resident = docs.select(col("doc_id"), col("lang"),
        col("n_chars"), lit(1L).as("version"))
      val updates = docs.filter(Sampling.bucket(col("doc_id")) < 10)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") + lit(7L)).as("n_chars"), lit(2L).as("version"))
      val inserts = docs
        .filter(Sampling.bucket(col("doc_id")) >= 10 &&
          Sampling.bucket(col("doc_id")) < 12)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("lang"),
          col("n_chars"), lit(2L).as("version"))
      val merged = resident.union(updates).union(inserts)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(descl(col("version")))))
        .filter(col("rn") === 1)
      merged.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("version") === 2 && col("doc_id") < 10000000L, 1L)
            .otherwise(0L)).as("n_updated"),
          sum(when(col("doc_id") >= 10000000L, 1L).otherwise(0L))
            .as("n_inserted"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy(ascf("lang"))
    },
    Some(s"""WITH resident AS (SELECT doc_id, lang, n_chars, 1 AS version
            |  FROM documents),
            |ups AS (SELECT doc_id, lang, n_chars + 7 AS n_chars, 2 AS version
            |  FROM documents WHERE ${Sampling.bucketSql("doc_id")} < 10),
            |ins AS (SELECT doc_id + 10000000 AS doc_id, lang, n_chars,
            |    2 AS version
            |  FROM documents WHERE ${Sampling.bucketSql("doc_id")} >= 10
            |    AND ${Sampling.bucketSql("doc_id")} < 12),
            |u AS (SELECT * FROM resident UNION ALL
            |  SELECT * FROM ups UNION ALL SELECT * FROM ins),
            |m AS (SELECT *, row_number() OVER (PARTITION BY doc_id
            |    ORDER BY version DESC NULLS LAST) AS rn FROM u)
            |SELECT lang, count(*) AS n_rows,
            |  CAST(sum(CASE WHEN version = 2 AND doc_id < 10000000
            |    THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
            |  CAST(sum(CASE WHEN doc_id >= 10000000 THEN 1 ELSE 0 END)
            |    AS BIGINT) AS n_inserted,
            |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
            |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
            |FROM m WHERE rn = 1
            |GROUP BY lang ORDER BY lang ASC NULLS FIRST""".stripMargin))

  /** Bucketed co-located join: both sides are written `bucketBy(8, key)`
    * + `sortBy(key)` into catalog-backed parquet tables, then joined on
    * the bucket key. With matching bucket counts Spark's scan exposes
    * the bucketing as an output partitioning and the sort-merge join
    * runs with NO shuffle exchange on either side (LakehouseSpec pins
    * exactly that on the physical plan, broadcast disabled) — the
    * pre-partitioning answer to "this join shuffles 100 TB every night".
    * The write is part of the measured query on purpose: bucketing buys
    * its keep only because the layout cost is paid ONCE while the
    * nightly join is free, and the key shows both halves. Staged tables
    * are named per (input dir, builder thread) — unique across
    * JobServer's concurrent submissions, stable (overwritten in place)
    * across repeated runs so a resident catalog stays bounded — and
    * graded against the UNTOUCHED parquet via a plain join oracle, so a
    * bucket-routing bug (row lost to the wrong bucket file) breaks the
    * hash, not just performance.
    */
  private val joinBucketed = QueryDef(
    "q_join_bucketed",
    (s, d) => {
      // table names keyed by (input dir, builder thread): stable across
      // repeated runs — mode("overwrite") re-stages in place, so a
      // resident server's catalog holds at most (dirs × pool threads)
      // entries instead of growing per submission (review r5) — while
      // staying unique across JobServer's concurrent builder threads
      // [^A-Za-z0-9_] — a DOT in the name (sf0.1) would parse as a
      // schema qualifier in saveAsTable
      val sfx = s"${d.replaceAll("[^A-Za-z0-9_]", "_")}_t${Thread.currentThread().getId}"
        .toLowerCase
      val base = s"/tmp/graft_bucketed/$sfx"
      val tO = s"graft_b_orders_$sfx"
      val tC = s"graft_b_cust_$sfx"
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$base/orders").saveAsTable(tO)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/customer").saveAsTable(tC)
      s.table(tO).join(s.table(tC), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          pin2(sum(dec(col("o_totalprice")))).as("total_revenue"))
        .orderBy(ascf("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS total_revenue
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment
           |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin))

  def defs: Seq[QueryDef] = Seq(lakeMerge, joinBucketed)
}
