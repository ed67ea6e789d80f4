package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` payloads with typed
  * metadata, processed in distributed per-partition batches.
  *
  * The fixtures ship no real image/audio bytes, so the payload is the
  * document's UTF-8 bytes and the DECODER IS A STUB — `fakeDecode` below
  * stands in for an image/audio codec (the real one would live behind
  * the same signature). Everything around it is the real Spark plumbing
  * this pipeline needs at 100 TB: a fixed media schema (id, kind, binary
  * payload, metadata), `mapPartitions` batch iteration over the binary
  * column (the JVM analogue of the Arrow-batched mapInPandas path — one
  * decoder instance per partition, streaming through rows, never
  * collecting to the driver), and scalar feature outputs that aggregate
  * exactly. q_mm_binary proves binary round-tripping against the oracle
  * byte-for-byte via md5; q_mm_features runs the decode stub end-to-end
  * (oracle recomputes the same bytes with SQL ascii sums — the payload
  * is pure ASCII by construction, FIXTURES.md).
  */
object Multimodal {

  /** One media item: opaque payload + typed metadata (SURVEY-style
    * multimodal record; width/height are synthetic metadata here).
    */
  final case class MediaRecord(media_id: Long, kind: String,
      payload: Array[Byte], width: Int, height: Int)

  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Long, byte_sum: Long, n_dark: Long)

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec: real implementation would decode `payload` and emit pixel/
    * sample statistics; the fake emits byte statistics with the same
    * shape (count, sum, thresholded count) so the distributed plumbing
    * and the aggregation semantics are fully exercised and testable.
    */
  private def fakeDecode(m: MediaRecord): MediaFeatures = {
    var sum = 0L; var dark = 0L
    var i = 0
    while (i < m.payload.length) {
      val b = m.payload(i) & 0xFF
      sum += b
      if (b < 100) dark += 1
      i += 1
    }
    MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, sum, dark)
  }

  /** documents re-framed as a media table: binary payload + metadata. */
  private def media(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"))

  /** Binary column round-trip: octet length + md5 digest of the payload,
    * hash-checked against DuckDB byte-for-byte.
    */
  private val mmBinary = QueryDef(
    "q_mm_binary",
    (s, d) =>
      media(s, d)
        .select(col("media_id"), col("kind"),
          length(col("payload")).cast("bigint").as("n_bytes"),
          md5(col("payload")).as("digest"))
        .orderBy(ascf("media_id")),
    Some("""SELECT doc_id AS media_id,
           |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
           |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |  md5(text) AS digest
           |FROM documents ORDER BY media_id ASC NULLS FIRST""".stripMargin))

  /** The decode-stub pipeline: typed Dataset → mapPartitions batch decode
    * → exact per-kind aggregation. The oracle recomputes the identical
    * byte statistics in SQL (ascii sums over the ASCII payload), so the
    * whole binary → decode → aggregate path is hash-checked.
    */
  private val mmFeatures = QueryDef(
    "q_mm_features",
    (s, d) => {
      import s.implicits._
      val feats = media(s, d).as[MediaRecord]
        .mapPartitions(_.map(fakeDecode))
      feats.groupBy(col("kind"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(col("byte_sum")).as("byte_checksum"),
          sum(col("n_dark")).as("n_dark_total"))
        .orderBy(ascf("kind"))
    },
    Some("""WITH f AS (SELECT
           |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
           |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           |    CAST(coalesce(list_sum(list_transform(range(1, len(text) + 1),
           |      i -> ascii(substring(text, i, 1)))), 0) AS BIGINT) AS byte_sum,
           |    CAST(len(list_filter(list_transform(range(1, len(text) + 1),
           |      i -> ascii(substring(text, i, 1))), x -> x < 100)) AS BIGINT)
           |      AS n_dark
           |  FROM documents)
           |SELECT kind, count(*) AS n_media,
           |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           |  CAST(sum(byte_sum) AS BIGINT) AS byte_checksum,
           |  CAST(sum(n_dark) AS BIGINT) AS n_dark_total
           |FROM f GROUP BY kind ORDER BY kind ASC NULLS FIRST""".stripMargin))

  def defs: Seq[QueryDef] = Seq(mmBinary, mmFeatures)
}
