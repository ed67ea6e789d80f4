package graft.ops

import graft.{QueryDef, Tables}
import graft.Dsl._
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` payloads with typed
  * metadata, processed in distributed per-partition batches.
  *
  * Two tiers of decoder (round 4):
  *  - REAL decoders for the codec-free formats — RIFF/PCM16 WAV audio
  *    (q_mm_audio_pcm) and raw grayscale rasters (q_mm_image_gray),
  *    implemented as full header writer/parsers in
  *    `graft.functions.Codecs` with structural validation; the oracle
  *    recomputes expected sample/pixel stats from the source characters,
  *    so a parse bug breaks the hash match.
  *  - A REAL compressed codec (round 6): GZC1 = DEFLATE via the JDK's
  *    `java.util.zip.Deflater`/`Inflater` (`Codecs.Flate`), with magic/
  *    length/Adler-32 validation — the compressed-format decode path
  *    (q_mm_features) no longer stubs anything. Formats needing
  *    external libraries (JPEG/MP3/H.264) would slot behind the same
  *    decode signature.
  * Everything around them is the real Spark plumbing this pipeline needs
  * at 100 TB: a fixed media schema (id, kind, binary payload, metadata),
  * `mapPartitions` batch iteration over the binary column (the JVM
  * analogue of the Arrow-batched mapInPandas path — one decoder instance
  * per partition, streaming through rows, never collecting to the
  * driver), and scalar feature outputs that aggregate exactly.
  * q_mm_binary proves binary round-tripping against the oracle
  * byte-for-byte via md5; q_mm_features runs compress → inflate →
  * aggregate end-to-end (oracle recomputes the same bytes with SQL
  * ascii sums). Every synthesized pixel/sample byte is a char code
  * masked to 7 bits on BOTH engines (`ascii7` here, `& 127` in the
  * oracles) — the round-7 family-wide enforcement of the ADVICE-r6
  * finding that parity previously ASSUMED pure-ASCII fixtures.
  */
object Multimodal {

  /** Pixel/sample bytes from text chars, masked to 7 bits — the
    * ENFORCED-on-both-engines spelling of "the source is ASCII"
    * (ADVICE r6, applied family-wide in round 7): Spark masks the char
    * code, every oracle masks the same index with `& 127`, so a future
    * non-ASCII fixture changes both engines identically instead of
    * silently diverging (getBytes("US-ASCII") mapped non-ASCII to '?'
    * 0x3F while ascii() returned the full code point).
    */
  private def ascii7(text: String, from: Int, until: Int): Array[Byte] = {
    val a = new Array[Byte](until - from)
    var i = from
    while (i < until) { a(i - from) = (text.charAt(i) & 0x7F).toByte; i += 1 }
    a
  }

  /** One media item: opaque payload + typed metadata (SURVEY-style
    * multimodal record; width/height are synthetic metadata here).
    */
  final case class MediaRecord(media_id: Long, kind: String,
      payload: Array[Byte], width: Int, height: Int)

  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Long, byte_sum: Long, n_dark: Long)

  /** REAL compressed-codec decoder (round 6, replacing the r4 stub):
    * inflates a GZC1 payload (JDK DEFLATE, `Codecs.Flate`) with magic/
    * length/Adler-32 validation, then emits byte statistics over the
    * DECODED bytes. The oracle recomputes the same statistics from the
    * uncompressed source characters, so a header or inflate bug breaks
    * the hash match — the decode kernel is load-bearing, not plumbing.
    */
  private def inflateDecode(m: MediaRecord): MediaFeatures = {
    val raw = graft.functions.Codecs.Flate.decode(m.payload)
    var sum = 0L; var dark = 0L
    var i = 0
    while (i < raw.length) {
      val b = raw(i) & 0xFF
      sum += b
      if (b < 100) dark += 1
      i += 1
    }
    MediaFeatures(m.media_id, m.kind, raw.length.toLong, sum, dark)
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

  /** The compressed-media pipeline: typed Dataset → per-partition
    * DEFLATE compression of the payload (so the binary column genuinely
    * holds a compressed stream) → mapPartitions batch INFLATE decode →
    * exact per-kind aggregation. The oracle recomputes the identical
    * byte statistics in SQL (ascii sums over the ASCII source), so the
    * whole compress → binary → inflate → aggregate path is hash-checked:
    * if the Inflater round-trip corrupts one byte, the hash breaks.
    */
  private val mmFeatures = QueryDef(
    "q_mm_features",
    (s, d) => {
      import s.implicits._
      // payload re-synthesized as 7-bit-masked char bytes (1 byte per
      // char on ANY input) rather than media()'s raw UTF-8: the oracle
      // counts and sums PER CHARACTER, and only the mask makes
      // byte-grain == char-grain by construction. q_mm_binary keeps the
      // raw UTF-8 payload because its md5 grade must hash the identical
      // bytes DuckDB's md5(text) sees.
      val feats = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          MediaRecord(id,
            Seq("image", "audio", "video")((id % 3).toInt),
            ascii7(text, 0, text.length),
            (text.length % 640).toInt, (text.length % 480).toInt)
        })
        .mapPartitions(_.map(m =>
          m.copy(payload = graft.functions.Codecs.Flate.encode(m.payload))))
        .mapPartitions(_.map(inflateDecode))
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
           |    CAST(len(text) AS BIGINT) AS n_bytes,
           |    CAST(coalesce(list_sum(list_transform(range(1, len(text) + 1),
           |      i -> ascii(substring(text, i, 1)) & 127)), 0) AS BIGINT) AS byte_sum,
           |    CAST(len(list_filter(list_transform(range(1, len(text) + 1),
           |      i -> ascii(substring(text, i, 1)) & 127), x -> x < 100)) AS BIGINT)
           |      AS n_dark
           |  FROM documents)
           |SELECT kind, count(*) AS n_media,
           |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           |  CAST(sum(byte_sum) AS BIGINT) AS byte_checksum,
           |  CAST(sum(n_dark) AS BIGINT) AS n_dark_total
           |FROM f GROUP BY kind ORDER BY kind ASC NULLS FIRST""".stripMargin))

  // ---- REAL decoders (round 4): WAV/PCM16 audio and raw grayscale
  // images are codec-free formats, so their decode paths are genuinely
  // implemented (graft.functions.Codecs — full header parse +
  // validation), not stubbed. The payloads are synthesized
  // deterministically from document text, so the DuckDB oracle can
  // recompute the expected sample/pixel statistics straight from the
  // characters: any header/endianness/offset bug in the parser breaks
  // the hash match. The compressed path is real too as of round 6
  // (GZC1/DEFLATE above); only external-library formats (JPEG/MP3/…)
  // are out of scope.

  final case class AudioClip(media_id: Long, payload: Array[Byte])
  final case class AudioFeatures(media_id: Long, sample_rate: Int,
      n_samples: Long, sum_abs: Long, peak: Long)

  /** PCM16 audio pipeline: synth WAV bytes (sample i = (ascii(char_i) −
    * 78)·256, rate = 8000 + (id%8)·1000 Hz) → a real binary column →
    * mapPartitions RIFF/PCM parse → exact per-rate aggregation.
    */
  /** Shared WAV synth stage: one clip per document, sample i =
    * (ascii(char_i) − 78)·256, rate = 8000 + (id%8)·1000 Hz. Both audio
    * keys start from this Dataset (same construction, so the oracles
    * share the char-index arithmetic).
    */
  private def wavClips(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val samples = new Array[Short](text.length)
        var i = 0
        while (i < text.length) {
          samples(i) = (((text.charAt(i) & 0x7F) - 78) * 256).toShort
          i += 1
        }
        AudioClip(id, graft.functions.Codecs.Wav.encode(
          8000 + (id % 8).toInt * 1000, samples))
      })
  }

  /** Decoded-clip amplitude stats, shared by both audio keys. */
  private def wavFeatures(clips: org.apache.spark.sql.Dataset[AudioClip]) =
    clips.mapPartitions(_.map { c =>
      val (sr, samples) = graft.functions.Codecs.Wav.decode(c.payload)
      var sumAbs = 0L; var peak = 0L; var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toLong)
        sumAbs += a; if (a > peak) peak = a; i += 1
      }
      AudioFeatures(c.media_id, sr, samples.length.toLong, sumAbs, peak)
    })(org.apache.spark.sql.Encoders.product[AudioFeatures])

  private val mmAudioPcm = QueryDef(
    "q_mm_audio_pcm",
    (s, d) => {
      val feats = wavFeatures(wavClips(s, d))
      feats.groupBy(col("sample_rate"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("n_samples")).as("total_samples"),
          sum(col("sum_abs")).as("amp_checksum"),
          max(col("peak")).as("max_peak"))
        .orderBy(ascf("sample_rate"))
    },
    Some("""WITH f AS (SELECT
           |    8000 + CAST(doc_id % 8 AS INTEGER) * 1000 AS sample_rate,
           |    CAST(len(text) AS BIGINT) AS n_samples,
           |    CAST(coalesce(list_sum(list_transform(range(1, len(text) + 1),
           |      i -> abs(((ascii(substring(text, i, 1)) & 127) - 78) * 256))), 0)
           |      AS BIGINT) AS sum_abs,
           |    CAST(coalesce(list_max(list_transform(range(1, len(text) + 1),
           |      i -> abs(((ascii(substring(text, i, 1)) & 127) - 78) * 256))), 0)
           |      AS BIGINT) AS peak
           |  FROM documents)
           |SELECT sample_rate, count(*) AS n_clips,
           |  CAST(sum(n_samples) AS BIGINT) AS total_samples,
           |  CAST(sum(sum_abs) AS BIGINT) AS amp_checksum,
           |  CAST(max(peak) AS BIGINT) AS max_peak
           |FROM f GROUP BY sample_rate
           |ORDER BY sample_rate ASC NULLS FIRST""".stripMargin))

  final case class ImageRec(media_id: Long, payload: Array[Byte])
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
      pixel_sum: Long, n_dark: Long)

  /** Raw-grayscale image pipeline: synth a GIM8 raster (width = 8 +
    * id%9, height = ⌊len/width⌋, pixels = leading text bytes) → binary
    * column → mapPartitions header parse → per-width brightness stats.
    */
  private val mmImageGray = QueryDef(
    "q_mm_image_gray",
    (s, d) => {
      import s.implicits._
      val imgs = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val w = 8 + (id % 9).toInt
          val h = text.length / w
          val px = ascii7(text, 0, w * h)
          ImageRec(id, graft.functions.Codecs.GrayImage.encode(w, h, px))
        })
      val feats = imgs.mapPartitions(_.map { r =>
        val (w, h, px) = graft.functions.Codecs.GrayImage.decode(r.payload)
        var sum = 0L; var dark = 0L; var i = 0
        while (i < px.length) {
          val b = px(i) & 0xFF
          sum += b; if (b < 100) dark += 1; i += 1
        }
        ImageFeatures(r.media_id, w, h, sum, dark)
      })
      feats.groupBy(col("width"))
        .agg(count(lit(1)).as("n_images"),
          sum(col("height")).as("total_rows"),
          sum(col("pixel_sum")).as("brightness_checksum"),
          sum(col("n_dark")).as("dark_total"))
        .orderBy(ascf("width"))
    },
    Some("""WITH d0 AS (SELECT doc_id, text,
           |    8 + CAST(doc_id % 9 AS INTEGER) AS width FROM documents),
           |d1 AS (SELECT doc_id, text, width,
           |    CAST(len(text) // width AS INTEGER) AS height FROM d0),
           |f AS (SELECT width, height,
           |    CAST(coalesce(list_sum(list_transform(range(1, width * height + 1),
           |      i -> ascii(substring(text, i, 1)) & 127)), 0) AS BIGINT) AS pixel_sum,
           |    CAST(coalesce(len(list_filter(list_transform(range(1, width * height + 1),
           |      i -> ascii(substring(text, i, 1)) & 127), x -> x < 100)), 0) AS BIGINT)
           |      AS n_dark
           |  FROM d1)
           |SELECT width, count(*) AS n_images,
           |  CAST(sum(height) AS BIGINT) AS total_rows,
           |  CAST(sum(pixel_sum) AS BIGINT) AS brightness_checksum,
           |  CAST(sum(n_dark) AS BIGINT) AS dark_total
           |FROM f GROUP BY width ORDER BY width ASC NULLS FIRST""".stripMargin))

  final case class VideoRec(media_id: Long, payload: Array[Byte])
  final case class VideoFeatures(media_id: Long, n_frames: Long,
      n_sampled: Long, sampled_sum: Long)

  /** Video frame-sampling pipeline (round 5 — the builder prompt's
    * "frame-sample" multimodal op): synth a GVF1 clip per doc (8×4
    * frames, pixels = leading text bytes, n_frames = ⌊len/32⌋) → binary
    * column → full container parse (`Codecs.Video`, validated) → keep
    * every 3rd frame (the decode-cost-bounding step every video
    * pipeline runs before feature extraction) → per-clip-length stats.
    * The oracle recomputes the sampled-frame brightness from the source
    * chars via index arithmetic, so a frame-boundary or stride bug
    * breaks the hash. Docs shorter than one frame yield a valid
    * zero-frame clip (encode/decode round-trip it; they land in the
    * n_frames = 0 census row).
    */
  private val mmVideoFrames = QueryDef(
    "q_mm_video_frames",
    (s, d) => {
      import s.implicits._
      val W = 8; val H = 4; val Fpx = W * H; val Stride = 3
      val clips = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val nf = text.length / Fpx
          val frames = Array.tabulate(nf)(f =>
            ascii7(text, f * Fpx, (f + 1) * Fpx))
          VideoRec(id, graft.functions.Codecs.Video.encode(W, H, frames))
        })
      val feats = clips.mapPartitions(_.map { r =>
        val (_, _, frames) = graft.functions.Codecs.Video.decode(r.payload)
        var sum = 0L; var sampled = 0L
        var f = 0
        while (f < frames.length) {
          if (f % Stride == 0) {
            sampled += 1
            val fr = frames(f); var i = 0
            while (i < fr.length) { sum += fr(i) & 0xFF; i += 1 }
          }
          f += 1
        }
        VideoFeatures(r.media_id, frames.length.toLong, sampled, sum)
      })
      feats.groupBy(col("n_frames"))
        .agg(count(lit(1)).as("n_videos"),
          sum(col("n_sampled")).as("total_sampled"),
          sum(col("sampled_sum")).as("brightness_checksum"))
        .orderBy(ascf("n_frames"))
    },
    Some("""WITH v AS (SELECT doc_id,
           |    CAST(len(text) // 32 AS BIGINT) AS n_frames,
           |    CAST((len(text) // 32 + 2) // 3 AS BIGINT) AS n_sampled,
           |    CAST(coalesce(list_sum(
           |      list_transform(range(1, (len(text) // 32) * 32 + 1),
           |        i -> CASE WHEN ((i - 1) // 32) % 3 = 0
           |          THEN ascii(substring(text, i, 1)) & 127 ELSE 0 END)), 0)
           |      AS BIGINT) AS sampled_sum
           |  FROM documents)
           |SELECT n_frames, count(*) AS n_videos,
           |  CAST(sum(n_sampled) AS BIGINT) AS total_sampled,
           |  CAST(sum(sampled_sum) AS BIGINT) AS brightness_checksum
           |FROM v GROUP BY n_frames
           |ORDER BY n_frames ASC NULLS FIRST""".stripMargin))

  final case class ResizeFeatures(media_id: Long, width: Int,
      out_w: Long, out_h: Long, out_sum: Long)

  /** Image RESIZE (round 5 — completing the builder prompt's named
    * multimodal quartet: decode ✓ / feature-extract ✓ / frame-sample ✓ /
    * RESIZE): the same GIM8 rasters as q_mm_image_gray, decoded then
    * nearest-neighbor 2× downsampled (out(r,c) = in(2r, 2c) — the
    * deterministic kernel; bilinear would put engine-varying float
    * arithmetic in the hash path for no verification gain) → per-width
    * census of the resized brightness. The oracle recomputes every
    * resized pixel from the source chars via pure index arithmetic
    * (src = 2r·W + 2c + 1), so an off-by-one in either the raster
    * stride or the sampling grid breaks the hash. Images narrower or
    * shorter than 2 px resize to empty (0×0) and contribute zero rows
    * of brightness — both engines by the same floor division.
    */
  private val mmImageResize = QueryDef(
    "q_mm_image_resize",
    (s, d) => {
      import s.implicits._
      val imgs = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val w = 8 + (id % 9).toInt
          val h = text.length / w
          val px = ascii7(text, 0, w * h)
          ImageRec(id, graft.functions.Codecs.GrayImage.encode(w, h, px))
        })
      val feats = imgs.mapPartitions(_.map { r =>
        val (w, h, px) = graft.functions.Codecs.GrayImage.decode(r.payload)
        val w2 = w / 2; val h2 = h / 2
        var sum = 0L; var rr = 0
        while (rr < h2) {
          var cc = 0
          while (cc < w2) {
            sum += px(2 * rr * w + 2 * cc) & 0xFF
            cc += 1
          }
          rr += 1
        }
        ResizeFeatures(r.media_id, w, w2.toLong, h2.toLong, sum)
      })
      feats.groupBy(col("width"))
        .agg(count(lit(1)).as("n_images"),
          sum(col("out_w") * col("out_h")).as("total_out_px"),
          sum(col("out_sum")).as("resized_checksum"))
        .orderBy(ascf("width"))
    },
    Some("""WITH d0 AS (SELECT doc_id, text,
           |    8 + CAST(doc_id % 9 AS INTEGER) AS width FROM documents),
           |d1 AS (SELECT doc_id, text, width,
           |    CAST(len(text) // width AS BIGINT) AS height FROM d0),
           |d2 AS (SELECT doc_id, text, width, width // 2 AS w2,
           |    height // 2 AS h2 FROM d1),
           |f AS (SELECT width, w2, h2,
           |    CAST(coalesce(list_sum(list_transform(range(0, w2 * h2),
           |      j -> ascii(substring(text,
           |        CAST(2 * (j // w2) * width + 2 * (j % w2) + 1 AS INTEGER),
           |        1)) & 127)), 0) AS BIGINT) AS out_sum
           |  FROM d2)
           |SELECT width, count(*) AS n_images,
           |  CAST(sum(w2 * h2) AS BIGINT) AS total_out_px,
           |  CAST(sum(out_sum) AS BIGINT) AS resized_checksum
           |FROM f GROUP BY width ORDER BY width ASC NULLS FIRST""".stripMargin))

  /** Audio DOWNSAMPLE (round 5 — the temporal twin of
    * q_mm_image_resize's spatial 2×): decode each WAV, keep every 2nd
    * sample (kept(i) = src(2i) — pure decimation, the deterministic
    * kernel; a low-pass prefilter would put engine-varying float math
    * in the hash path exactly like bilinear resize would), RE-ENCODE at
    * half the rate, decode again, and census per OUTPUT rate. The
    * double encode/decode round-trip means the oracle — which
    * recomputes kept-sample amplitude from source chars via index
    * arithmetic (1-based odd positions = 0-based even samples) — breaks
    * on a header-rewrite, stride, or boundary bug in EITHER pass.
    *
    * Scale: typed Dataset + mapPartitions like the other codec paths —
    * per-byte work, no shuffle before the 8-group census; halving
    * sample volume before storage/feature-extraction is the standard
    * audio-pipeline cost bound (16 kHz mono is the ASR-canonical rate).
    *
    * Rates stay exact: 8000 + k·1000 are all even, so sr div 2 =
    * 4000 + k·500 Hz with no truncation ambiguity. Empty docs
    * round-trip as valid zero-sample clips ((0+1) div 2 = 0 on both
    * engines).
    */
  private val mmAudioDownsample = QueryDef(
    "q_mm_audio_downsample",
    (s, d) => {
      import s.implicits._
      val down = wavClips(s, d).mapPartitions(_.map { c =>
        val (sr, samples) = graft.functions.Codecs.Wav.decode(c.payload)
        val kept = new Array[Short]((samples.length + 1) / 2)
        var i = 0
        while (i < kept.length) { kept(i) = samples(i * 2); i += 1 }
        AudioClip(c.media_id, graft.functions.Codecs.Wav.encode(sr / 2, kept))
      })
      wavFeatures(down).groupBy(col("sample_rate"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("n_samples")).as("kept_samples"),
          sum(col("sum_abs")).as("amp_checksum"),
          max(col("peak")).as("max_peak"))
        .orderBy(ascf("sample_rate"))
    },
    Some("""WITH f AS (SELECT
           |    4000 + CAST(doc_id % 8 AS INTEGER) * 500 AS sample_rate,
           |    CAST((len(text) + 1) // 2 AS BIGINT) AS n_samples,
           |    CAST(coalesce(list_sum(list_transform(range(1, len(text) + 1, 2),
           |      i -> abs(((ascii(substring(text, i, 1)) & 127) - 78) * 256))), 0)
           |      AS BIGINT) AS sum_abs,
           |    CAST(coalesce(list_max(list_transform(range(1, len(text) + 1, 2),
           |      i -> abs(((ascii(substring(text, i, 1)) & 127) - 78) * 256))), 0)
           |      AS BIGINT) AS peak
           |  FROM documents)
           |SELECT sample_rate, count(*) AS n_clips,
           |  CAST(sum(n_samples) AS BIGINT) AS kept_samples,
           |  CAST(sum(sum_abs) AS BIGINT) AS amp_checksum,
           |  CAST(max(peak) AS BIGINT) AS max_peak
           |FROM f GROUP BY sample_rate
           |ORDER BY sample_rate ASC NULLS FIRST""".stripMargin))

  final case class PhashSig(doc_id: Long, lang: String,
      b0: Long, b1: Long, b2: Long, b3: Long)

  /** Perceptual-hash image near-dup (round 6): the multimodal dedup
    * bridge — the average-hash (aHash) pipeline every image-dedup system
    * runs, end to end on the REAL raster codec: synth a 16×16 GIM8
    * image per doc (pixels = first 256 chars, space-padded) → encode →
    * DECODE via `Codecs.GrayImage` → 8×8 block-average downsample →
    * threshold at the global pixel mean → 64-bit signature as four
    * 16-bit bands → banded candidate join (pigeonhole: Hamming ≤ 3 with
    * 4 bands guarantees ≥ 1 identical band — lossless) → exact
    * bit_count Hamming verify → per-lang near-dup census with an id
    * checksum. The oracle recomputes the signature from the SOURCE
    * chars by index arithmetic, so a decode, block-index or threshold
    * bug anywhere in the codec path breaks the hash.
    *
    * All-integer: block avg and mean use truncating div on non-negative
    * ints; signatures stay in 16-bit bands (never bit 63 — no sign/
    * overflow edge); Hamming is bit_count over xor in both engines.
    * Shape at 100 TB: signatures are 32 bytes/image computed in one
    * mapPartitions decode pass; candidates are keyed on (lang, band_ix,
    * band_value) — expected bucket n/2¹⁶ per band — and only ids travel
    * until the 4-long signature rejoin.
    */
  private val mmPhash = QueryDef(
    "q_mm_phash",
    (s, d) => {
      import s.implicits._
      val sigs = graft.Caches.scoped(Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), rpad(col("text"), 256, " ").as("t"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, lang, t) =>
          // pixel = char code masked to 7 bits, ENFORCED identically on
          // both engines (ADVICE r6, now the family-wide ascii7 helper):
          // getBytes("US-ASCII") mapped non-ASCII chars to '?' (0x3F)
          // while the oracle's ascii() kept the full code point —
          // parity held only because the fixtures happen to be pure
          // ASCII. The explicit mask makes the invariant a definition,
          // not an assumption.
          val payload = graft.functions.Codecs.GrayImage
            .encode(16, 16, ascii7(t, 0, t.length))
          val (_, _, px) = graft.functions.Codecs.GrayImage.decode(payload)
          val blocks = new Array[Int](64)
          var bi = 0
          while (bi < 64) {
            val base = (bi / 8) * 32 + (bi % 8) * 2
            blocks(bi) = ((px(base) & 0xFF) + (px(base + 1) & 0xFF) +
              (px(base + 16) & 0xFF) + (px(base + 17) & 0xFF)) / 4
            bi += 1
          }
          var sum = 0L
          blocks.foreach(sum += _)
          val mean = (sum / 64L).toInt
          def band(b: Int): Long = {
            var v = 0L; var j = 0
            while (j < 16) {
              if (blocks(b * 16 + j) >= mean) v |= (1L << j); j += 1
            }
            v
          }
          PhashSig(id, lang, band(0), band(1), band(2), band(3))
        }).toDF())
      val bands = sigs.select(col("doc_id"), col("lang"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("bix", "bv")))
      val cand = bands.alias("x").join(bands.alias("y"),
          col("x.lang") === col("y.lang") && col("x.bix") === col("y.bix") &&
            col("x.bv") === col("y.bv") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.lang").as("lang"), col("x.doc_id").as("d1"),
          col("y.doc_id").as("d2"))
        .distinct()
      val left = sigs.select(col("doc_id").as("d1"), col("b0").as("xb0"),
        col("b1").as("xb1"), col("b2").as("xb2"), col("b3").as("xb3"))
      val right = sigs.select(col("doc_id").as("d2"), col("b0").as("yb0"),
        col("b1").as("yb1"), col("b2").as("yb2"), col("b3").as("yb3"))
      val pairs = cand.join(left, "d1").join(right, "d2")
        .withColumn("ham",
          expr("bit_count(xb0 ^ yb0) + bit_count(xb1 ^ yb1) + " +
            "bit_count(xb2 ^ yb2) + bit_count(xb3 ^ yb3)").cast("long"))
        .filter(col("ham") <= 3)
      val ag = pairs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("ham") === 0L, 1L).otherwise(0L)).as("n_exact"),
          sum(col("ham")).as("ham_sum"),
          sum(col("d1") + col("d2")).as("id_checksum"))
      Tables.documents(s, d).select(col("lang")).distinct()
        .join(ag, Seq("lang"), "left")
        .select(col("lang"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          coalesce(col("ham_sum"), lit(0L)).as("ham_sum"),
          coalesce(col("id_checksum"), lit(0L)).as("id_checksum"))
        .orderBy(ascf("lang"))
    },
    Some {
      def bandSql(b: Int): String =
        s"CAST(list_sum(list_transform(range(0, 16), j -> CASE WHEN " +
          s"blocks[${b * 16} + j + 1] >= mean THEN (CAST(1 AS BIGINT) << j) " +
          s"ELSE 0 END)) AS BIGINT) AS b$b"
      s"""WITH d0 AS (SELECT doc_id, lang, rpad(text, 256, ' ') AS t
         |  FROM documents),
         |bl AS (SELECT doc_id, lang, list_transform(range(0, 64), bi ->
         |    ((ascii(substring(t, (bi // 8) * 32 + (bi % 8) * 2 + 1, 1)) & 127)
         |     + (ascii(substring(t, (bi // 8) * 32 + (bi % 8) * 2 + 2, 1)) & 127)
         |     + (ascii(substring(t, (bi // 8) * 32 + 16 + (bi % 8) * 2 + 1, 1)) & 127)
         |     + (ascii(substring(t, (bi // 8) * 32 + 16 + (bi % 8) * 2 + 2, 1)) & 127))
         |    // 4) AS blocks
         |  FROM d0),
         |mn AS (SELECT doc_id, lang, blocks,
         |    list_sum(blocks) // 64 AS mean FROM bl),
         |sg AS MATERIALIZED (SELECT doc_id, lang,
         |    ${bandSql(0)}, ${bandSql(1)}, ${bandSql(2)}, ${bandSql(3)}
         |  FROM mn),
         |bands AS (SELECT doc_id, lang, u.range AS bix,
         |    CASE u.range WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2
         |      ELSE b3 END AS bv
         |  FROM sg CROSS JOIN range(0, 4) u),
         |cand AS (SELECT DISTINCT x.lang AS lang, x.doc_id AS d1,
         |    y.doc_id AS d2
         |  FROM bands x JOIN bands y ON x.lang = y.lang AND x.bix = y.bix
         |    AND x.bv = y.bv AND x.doc_id < y.doc_id),
         |pr AS (SELECT c.lang AS lang, c.d1 AS d1, c.d2 AS d2,
         |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
         |      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
         |      AS BIGINT) AS ham
         |  FROM cand c JOIN sg a ON c.d1 = a.doc_id
         |    JOIN sg b ON c.d2 = b.doc_id),
         |ag AS (SELECT lang, count(*) AS n_pairs,
         |    count(*) FILTER (WHERE ham = 0) AS n_exact,
         |    sum(ham) AS ham_sum, sum(d1 + d2) AS id_checksum
         |  FROM pr WHERE ham <= 3 GROUP BY 1),
         |base AS (SELECT DISTINCT lang FROM documents)
         |SELECT base.lang AS lang,
         |  CAST(coalesce(ag.n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(coalesce(ag.n_exact, 0) AS BIGINT) AS n_exact,
         |  CAST(coalesce(ag.ham_sum, 0) AS BIGINT) AS ham_sum,
         |  CAST(coalesce(ag.id_checksum, 0) AS BIGINT) AS id_checksum
         |FROM base LEFT JOIN ag ON base.lang = ag.lang
         |ORDER BY lang ASC NULLS FIRST""".stripMargin
    })

  final case class SceneFeatures(media_id: Long, lang: String,
      n_frames: Long, n_cuts: Long, diff_sum: Long, diff_max: Long)

  /** Scene-change detection (round 7): the shot-boundary census every
    * video-curation pipeline runs before frame sampling — adjacent-frame
    * L1 pixel difference through the REAL container codec (synth 8×4
    * frame sequence per doc → `Codecs.Video.encode` → DECODE → per-pair
    * Σ|a−b| → cut ⇔ diff > 400), rolled up per lang. The oracle
    * recomputes every frame diff from the SOURCE chars by index
    * arithmetic, so a frame-boundary, stride or sign bug anywhere in
    * the codec path breaks the hash. Pixels are char codes masked to
    * 7 bits on BOTH engines (the q_mm_phash ADVICE-r6 discipline —
    * enforced, not assumed-ASCII).
    *
    * Shape at 100 TB: one mapPartitions decode pass emitting 4 ints per
    * clip (diffs never leave the partition), then a lang-grain partial
    * agg — the cheapest possible shuffle. Clips shorter than 2 frames
    * drop identically on both engines.
    */
  private val mmSceneChange = QueryDef(
    "q_mm_scene_change",
    (s, d) => {
      import s.implicits._
      val W = 8; val H = 4; val Fpx = W * H; val T = 400L
      val clips = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, lang, text) =>
          val nf = text.length / Fpx
          val frames = Array.tabulate(nf)(f =>
            ascii7(text, f * Fpx, (f + 1) * Fpx))
          (id, lang, graft.functions.Codecs.Video.encode(W, H, frames))
        }).toDF("media_id", "lang", "payload")
      val feats = clips.as[(Long, String, Array[Byte])]
        .mapPartitions(_.map { case (id, lang, payload) =>
          val (_, _, frames) = graft.functions.Codecs.Video.decode(payload)
          var cuts = 0L; var dsum = 0L; var dmax = 0L
          var f = 1
          while (f < frames.length) {
            var diff = 0L; var i = 0
            while (i < Fpx) {
              diff += math.abs((frames(f)(i) & 0xFF) - (frames(f - 1)(i) & 0xFF))
              i += 1
            }
            if (diff > T) cuts += 1
            dsum += diff; if (diff > dmax) dmax = diff
            f += 1
          }
          SceneFeatures(id, lang, frames.length.toLong, cuts, dsum, dmax)
        })
      feats.filter(col("n_frames") >= 2)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_videos"),
          sum(col("n_cuts")).as("total_cuts"),
          sum(col("diff_sum")).as("diff_checksum"),
          max(col("diff_max")).as("max_diff"))
        .orderBy(ascf("lang"))
    },
    Some("""WITH v AS (SELECT doc_id, lang,
           |    CAST(len(text) // 32 AS BIGINT) AS n_frames,
           |    list_transform(range(1, len(text) // 32),
           |      f -> list_sum(list_transform(range(1, 33),
           |        i -> abs((ascii(substring(text, CAST(f * 32 + i AS INT), 1)) & 127)
           |           - (ascii(substring(text, CAST((f - 1) * 32 + i AS INT), 1)) & 127)))))
           |      AS diffs
           |  FROM documents),
           |f AS (SELECT lang, n_frames,
           |    CAST(coalesce(list_sum(list_transform(diffs,
           |      x -> CASE WHEN x > 400 THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n_cuts,
           |    CAST(coalesce(list_sum(diffs), 0) AS BIGINT) AS diff_sum,
           |    CAST(coalesce(list_max(diffs), 0) AS BIGINT) AS diff_max
           |  FROM v WHERE n_frames >= 2)
           |SELECT lang, count(*) AS n_videos,
           |  CAST(sum(n_cuts) AS BIGINT) AS total_cuts,
           |  CAST(sum(diff_sum) AS BIGINT) AS diff_checksum,
           |  CAST(max(diff_max) AS BIGINT) AS max_diff
           |FROM f GROUP BY lang
           |ORDER BY lang ASC NULLS FIRST""".stripMargin))

  final case class AugmentFeatures(media_id: Long, width: Int,
      aug_w: Long, aug_h: Long, aug_sum: Long, edge_sum: Long)

  /** Training AUGMENTATION through the raster codec (round 7): the two
    * canonical label-preserving image augmentations a vision training
    * pipeline applies on the fly — horizontal FLIP then center CROP
    * (rows lose a 1-px margin, cols a 2-px margin) — run over the real
    * encode→decode path, with a per-width census of the augmented
    * brightness plus the augmented first-column checksum (`edge_sum`):
    * a flip bug that reverses nothing, or a crop bug that slides the
    * window, moves different source pixels into column 0, so the edge
    * checksum pins ORIENTATION, which total brightness alone cannot
    * (flip is a permutation — Σpx is flip-invariant by construction).
    *
    * aug(r, c) = in(r + 1, w − 3 − c), all index arithmetic, no
    * interpolation (the q_mm_image_resize rule: a bilinear/rotation
    * kernel would put engine-varying float math in the hash path). The
    * oracle recomputes every augmented pixel from SOURCE chars by the
    * same index map. Per-partition decode + augment, 4 ints out per
    * image — the mapPartitions shape of the whole multimodal family;
    * at 100 TB augmentation fuses into the decode pass exactly like
    * this, which is why it is compute-, not shuffle-, bound.
    */
  private val mmAugment = QueryDef(
    "q_mm_augment",
    (s, d) => {
      import s.implicits._
      val imgs = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val w = 8 + (id % 9).toInt
          val h = text.length / w
          val px = ascii7(text, 0, w * h)
          ImageRec(id, graft.functions.Codecs.GrayImage.encode(w, h, px))
        })
      val feats = imgs.mapPartitions(_.map { r =>
        val (w, h, px) = graft.functions.Codecs.GrayImage.decode(r.payload)
        val w2 = math.max(w - 4, 0); val h2 = math.max(h - 2, 0)
        var sum = 0L; var edge = 0L; var rr = 0
        while (rr < h2) {
          var cc = 0
          while (cc < w2) {
            val v = px((rr + 1) * w + (w - 3 - cc)) & 0xFF
            sum += v
            if (cc == 0) edge += v
            cc += 1
          }
          rr += 1
        }
        AugmentFeatures(r.media_id, w, w2.toLong, h2.toLong, sum, edge)
      })
      feats.groupBy(col("width"))
        .agg(count(lit(1)).as("n_images"),
          sum(col("aug_w") * col("aug_h")).as("total_aug_px"),
          sum(col("aug_sum")).as("aug_checksum"),
          sum(col("edge_sum")).as("edge_checksum"))
        .orderBy(ascf("width"))
    },
    Some("""WITH d0 AS (SELECT doc_id, text,
           |    8 + CAST(doc_id % 9 AS INTEGER) AS width FROM documents),
           |d1 AS (SELECT doc_id, text, width,
           |    CAST(len(text) // width AS BIGINT) AS height FROM d0),
           |d2 AS (SELECT doc_id, text, width,
           |    greatest(width - 4, 0) AS w2, greatest(height - 2, 0) AS h2
           |  FROM d1),
           |f AS (SELECT width, w2, h2,
           |    CAST(coalesce(list_sum(list_transform(range(0, w2 * h2),
           |      j -> ascii(substring(text,
           |        CAST((j // w2 + 1) * width + (width - 3 - j % w2) + 1
           |          AS INTEGER), 1)) & 127)), 0) AS BIGINT) AS aug_sum,
           |    CAST(coalesce(list_sum(list_transform(range(0, h2),
           |      r -> ascii(substring(text,
           |        CAST((r + 1) * width + (width - 3) + 1 AS INTEGER), 1))
           |        & 127)), 0) AS BIGINT) AS edge_sum
           |  FROM d2)
           |SELECT width, count(*) AS n_images,
           |  CAST(sum(w2 * h2) AS BIGINT) AS total_aug_px,
           |  CAST(sum(aug_sum) AS BIGINT) AS aug_checksum,
           |  CAST(sum(edge_sum) AS BIGINT) AS edge_checksum
           |FROM f GROUP BY width ORDER BY width ASC NULLS FIRST"""
      .stripMargin))

  final case class WhtFeatures(media_id: Long, sample_rate: Int,
      n_samples: Long, c0: Long, ac_abs: Long, max_ac: Long)

  /** Spectral-ish feature extraction via the 8-point Walsh–Hadamard
    * transform (round 7): decode each clip through the REAL RIFF/WAV
    * codec, take the first 8 PCM samples as a frame, and compute all 8
    * WHT coefficients c_k = Σ_j s_j·(−1)^popcount(j∧k) — the
    * INTEGER-EXACT orthogonal transform (the ±1 cousin of the DFT that
    * codecs and hashing pipelines use precisely because it needs no
    * trigonometry), censused per sample rate as DC checksum, total AC
    * magnitude, and peak AC coefficient. A codec bug, frame-offset bug,
    * or a single wrong sign in the 8×8 Hadamard matrix breaks the hash.
    *
    * Scale: the transform fuses into the per-partition decode pass
    * (zero extra shuffle — the multimodal mapPartitions shape); frames
    * per clip and transform length are knobs (longer frames = the same
    * fold, radix-2 fast WHT when it matters).
    *
    * Determinism (D2): samples are exact int16-in-int64; coefficients
    * bounded by 8·2¹⁵; clips shorter than one frame are counted, not
    * transformed.
    */
  private val mmWht = QueryDef(
    "q_mm_wht",
    (s, d) => {
      import s.implicits._
      val feats = wavClips(s, d).mapPartitions(_.map { c =>
        val (sr, samples) = graft.functions.Codecs.Wav.decode(c.payload)
        if (samples.length < 8) WhtFeatures(c.media_id, sr,
          samples.length.toLong, 0L, 0L, 0L)
        else {
          val cs = Array.tabulate(8) { k =>
            var acc = 0L; var j = 0
            while (j < 8) {
              val sign = if (java.lang.Integer.bitCount(j & k) % 2 == 0) 1L
                         else -1L
              acc += sign * samples(j); j += 1
            }
            acc
          }
          var acAbs = 0L; var maxAc = 0L; var k = 1
          while (k < 8) {
            val a = math.abs(cs(k))
            acAbs += a; if (a > maxAc) maxAc = a; k += 1
          }
          WhtFeatures(c.media_id, sr, samples.length.toLong, cs(0), acAbs,
            maxAc)
        }
      })(org.apache.spark.sql.Encoders.product[WhtFeatures])
      feats.groupBy(col("sample_rate").cast("long").as("sample_rate"))
        .agg(sum(when(col("n_samples") >= 8, 1L).otherwise(0L))
            .as("n_clips"),
          sum(when(col("n_samples") < 8, 1L).otherwise(0L)).as("n_short"),
          sum(when(col("n_samples") >= 8, col("c0")).otherwise(0L))
            .as("dc_checksum"),
          sum(when(col("n_samples") >= 8, col("ac_abs")).otherwise(0L))
            .as("ac_abs_checksum"),
          max(when(col("n_samples") >= 8, col("max_ac")).otherwise(0L))
            .as("max_ac"))
        .orderBy(ascf("sample_rate"))
    },
    Some {
      def sample(j: Int) =
        s"(((ascii(substring(text, ${j + 1}, 1)) & 127) - 78) * 256)"
      def coef(k: Int) = (0 until 8).map { j =>
        val sign = if (java.lang.Integer.bitCount(j & k) % 2 == 0) "+" else "-"
        s"$sign ${sample(j)}"
      }.mkString(" ").stripPrefix("+ ")
      val acAbs = (1 to 7).map(k => s"abs(c$k)").mkString(" + ")
      val acMax = "greatest(" + (1 to 7).map(k => s"abs(c$k)")
        .mkString(", ") + ")"
      s"""WITH base AS (SELECT doc_id, text,
         |    8000 + CAST(doc_id % 8 AS BIGINT) * 1000 AS sample_rate,
         |    CAST(len(text) AS BIGINT) AS n FROM documents),
         |co AS (SELECT doc_id, sample_rate, n,
         |    ${(0 to 7).map(k => s"CAST(${coef(k)} AS BIGINT) AS c$k")
                .mkString(",\n|    ")}
         |  FROM base WHERE n >= 8)
         |SELECT b.sample_rate AS sample_rate,
         |  CAST(count(co.doc_id) AS BIGINT) AS n_clips,
         |  CAST(sum(CASE WHEN b.n < 8 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_short,
         |  CAST(coalesce(sum(co.c0), 0) AS BIGINT) AS dc_checksum,
         |  CAST(coalesce(sum($acAbs), 0) AS BIGINT) AS ac_abs_checksum,
         |  CAST(coalesce(max($acMax), 0) AS BIGINT) AS max_ac
         |FROM base b LEFT JOIN co ON b.doc_id = co.doc_id
         |GROUP BY b.sample_rate
         |ORDER BY b.sample_rate ASC NULLS FIRST""".stripMargin
    })

  final case class HistEqFeatures(media_id: Long, width: Int,
      orig_sum: Long, eq_sum: Long, eq_max: Long)

  /** Histogram equalization through the raster codec (round 7): decode
    * each GIM8 image, build its 128-bin pixel histogram, and remap
    * every pixel by the classic CDF rule v' = (cdf(v) − cdf_min)·127
    * div (n − cdf_min) — the contrast normalization a vision pipeline
    * runs before feature extraction, where the REMAP TABLE is
    * image-specific state derived from the image itself (vs
    * q_mm_augment's fixed index arithmetic). Constant images (n =
    * cdf_min) map to 0 by pinned CASE. Census per width: original
    * brightness, equalized brightness, peak equalized value.
    *
    * Scale: decode + histogram + remap fuse into one mapPartitions
    * pass (O(pixels + 128) per image, zero extra shuffle); the census
    * is width-sized.
    *
    * Determinism (D2): all-integer CDF arithmetic; the oracle
    * recomputes every remapped pixel from SOURCE chars (cdf(v) as a
    * per-element ≤-count — O(n²) in SQL, O(n) in the engine; the
    * asymmetry is the harness's, not the operator's).
    */
  private val mmHisteq = QueryDef(
    "q_mm_histeq",
    (s, d) => {
      import s.implicits._
      val imgs = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val w = 8 + (id % 9).toInt
          val h = text.length / w
          val px = ascii7(text, 0, w * h)
          ImageRec(id, graft.functions.Codecs.GrayImage.encode(w, h, px))
        })
      val feats = imgs.mapPartitions(_.map { r =>
        val (w, _, px) = graft.functions.Codecs.GrayImage.decode(r.payload)
        val n = px.length.toLong
        val hist = new Array[Long](128)
        var i = 0; var origSum = 0L
        while (i < px.length) {
          val v = px(i) & 0x7F; hist(v) += 1; origSum += v; i += 1
        }
        val cdf = new Array[Long](128)
        var acc = 0L; var v = 0
        while (v < 128) { acc += hist(v); cdf(v) = acc; v += 1 }
        var cdfMin = 0L; v = 0
        while (v < 128 && cdfMin == 0L) { cdfMin = cdf(v); v += 1 }
        var eqSum = 0L; var eqMax = 0L; i = 0
        while (i < px.length) {
          val p = px(i) & 0x7F
          val e = if (n > cdfMin) (cdf(p) - cdfMin) * 127L / (n - cdfMin)
                  else 0L
          eqSum += e; if (e > eqMax) eqMax = e; i += 1
        }
        HistEqFeatures(r.media_id, w, origSum, eqSum, eqMax)
      })(org.apache.spark.sql.Encoders.product[HistEqFeatures])
      feats.groupBy(col("width").cast("long").as("width"))
        .agg(count(lit(1)).as("n_images"),
          sum(col("orig_sum")).as("orig_checksum"),
          sum(col("eq_sum")).as("eq_checksum"),
          max(col("eq_max")).as("max_eq"))
        .orderBy(ascf("width"))
    },
    Some("""WITH d0 AS (SELECT doc_id, text,
           |    8 + CAST(doc_id % 9 AS INTEGER) AS width FROM documents),
           |d1 AS (SELECT doc_id, width,
           |    list_transform(range(1,
           |        width * CAST(len(text) // width AS INTEGER) + 1),
           |      i -> ascii(substring(text, i, 1)) & 127) AS px
           |  FROM d0),
           |f AS (SELECT width,
           |    CAST(len(px) AS BIGINT) AS n,
           |    CAST(coalesce(list_sum(px), 0) AS BIGINT) AS orig_sum,
           |    CAST(coalesce(len(list_filter(px,
           |      y -> y = list_min(px))), 0) AS BIGINT) AS cdfmin,
           |    px
           |  FROM d1),
           |e AS (SELECT width, orig_sum,
           |    CAST(CASE WHEN n > cdfmin THEN coalesce(list_sum(
           |      list_transform(px, x ->
           |        (len(list_filter(px, y -> y <= x)) - cdfmin) * 127
           |          // (n - cdfmin))), 0) ELSE 0 END AS BIGINT) AS eq_sum,
           |    CAST(CASE WHEN n > cdfmin THEN coalesce(list_max(
           |      list_transform(px, x ->
           |        (len(list_filter(px, y -> y <= x)) - cdfmin) * 127
           |          // (n - cdfmin))), 0) ELSE 0 END AS BIGINT) AS eq_max
           |  FROM f)
           |SELECT CAST(width AS BIGINT) AS width,
           |  CAST(count(*) AS BIGINT) AS n_images,
           |  CAST(sum(orig_sum) AS BIGINT) AS orig_checksum,
           |  CAST(sum(eq_sum) AS BIGINT) AS eq_checksum,
           |  CAST(max(eq_max) AS BIGINT) AS max_eq
           |FROM e GROUP BY width
           |ORDER BY width ASC NULLS FIRST""".stripMargin))

  final case class RleFeatures(media_id: Long, width: Int, orig_bytes: Long,
      n_runs: Long, comp_bytes: Long, decoded_checksum: Long)

  /** Run-length compression census (round 7): each document rendered
    * as the standard raster (width 8+(id%9), pixels = 7-bit leading
    * chars), RLE-encoded through `Codecs.Rle` (value + 32-bit run
    * pairs), decoded BACK, and profiled — runs, coded size, and a
    * checksum over the round-tripped pixels. The "is this shard
    * compressible" screen every storage/transport layer runs, and on
    * text-derived rasters an indirect repetition detector (the
    * byte-level cousin of q_text_repetition).
    *
    * The oracle recomputes run boundaries from SOURCE characters
    * (adjacent-difference census over the same 7-bit projection) and
    * the checksum from raw chars — so a bug in either direction of the
    * codec (wrong run split, wrong fill on decode) breaks the hash.
    * 32-bit run lengths mean pair count = true boundary count (no
    * cap-splitting for SQL to mirror); see `Codecs.Rle`.
    *
    * Scale: embarrassingly parallel per-partition codec work (the
    * Multimodal family contract) + one width-grain census.
    */
  private val mmRle = QueryDef(
    "q_mm_rle",
    (s, d) => {
      import s.implicits._
      val feats = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val w = 8 + (id % 9).toInt
          val h = text.length / w
          val px = ascii7(text, 0, w * h)
          val img = graft.functions.Codecs.GrayImage.encode(w, h, px)
          val (_, _, raw) = graft.functions.Codecs.GrayImage.decode(img)
          val coded = graft.functions.Codecs.Rle.encode(raw)
          val back = graft.functions.Codecs.Rle.decode(coded)
          var ck = 0L; var i = 0
          while (i < back.length) { ck += (back(i) & 0xFF).toLong * (i + 1); i += 1 }
          RleFeatures(id, w, raw.length.toLong,
            (coded.length - 8L) / 5L, coded.length.toLong, ck)
        })
      feats.groupBy(col("width"))
        .agg(count(lit(1)).as("n_images"),
          sum(col("orig_bytes")).as("orig_total"),
          sum(col("n_runs")).as("runs_total"),
          sum(col("comp_bytes")).as("comp_total"),
          sum(col("decoded_checksum")).as("pixels_checksum"))
        // byte totals are corpus-scale at 100 TB binary — stage the e6
        .withColumn("ratio_e6", expr(
          "cast(cast(orig_total as decimal(38,0)) * 1000000 " +
            "div comp_total as bigint)"))
        .orderBy(ascf("width"))
    },
    Some("""WITH d0 AS (SELECT doc_id, text,
           |    8 + CAST(doc_id % 9 AS INTEGER) AS width FROM documents),
           |d1 AS (SELECT doc_id, text, width,
           |    width * CAST(len(text) // width AS INTEGER) AS n FROM d0),
           |f AS (SELECT width, CAST(n AS BIGINT) AS orig_bytes,
           |    CAST(CASE WHEN n = 0 THEN 0 ELSE 1 +
           |      coalesce(len(list_filter(range(2, n + 1), i ->
           |        (ascii(substring(text, i, 1)) & 127)
           |          <> (ascii(substring(text, i - 1, 1)) & 127))), 0)
           |      END AS BIGINT) AS n_runs,
           |    CAST(coalesce(list_sum(list_transform(range(1, n + 1), i ->
           |      (ascii(substring(text, i, 1)) & 127) * i)), 0) AS BIGINT)
           |      AS ck
           |  FROM d1)
           |SELECT width, count(*) AS n_images,
           |  CAST(sum(orig_bytes) AS BIGINT) AS orig_total,
           |  CAST(sum(n_runs) AS BIGINT) AS runs_total,
           |  CAST(sum(8 + 5 * n_runs) AS BIGINT) AS comp_total,
           |  CAST(sum(ck) AS BIGINT) AS pixels_checksum,
           |  CAST((CAST(sum(orig_bytes) AS HUGEINT) * 1000000)
           |    // sum(8 + 5 * n_runs)
           |    AS BIGINT) AS ratio_e6
           |FROM f GROUP BY width ORDER BY width ASC NULLS FIRST""".stripMargin))

  final case class DeltaFeatures(media_id: Long, sample_rate: Int,
      n_samples: Long, coded_bytes: Long, sample_checksum: Long)

  /** Delta+zigzag+varint compression census (round 7): every clip's
    * PCM16 stream through `Codecs.DeltaVarint` (per-sample delta →
    * zigzag → base-128 varint — the Gorilla/Parquet-DELTA/protobuf
    * integer codec family) and BACK, profiled per sample rate against
    * the 2-bytes/sample raw size. The time-series compression twin of
    * q_mm_rle's byte-level runs: smooth signals (small deltas) code
    * near 1 byte/sample, noisy ones inflate past raw — the
    * storage-planning signal for telemetry lakes.
    *
    * The oracle recomputes the per-sample varint WIDTH from source
    * characters (char-delta dc ⇒ zigzag 512·dc / −512·dc−1 ⇒ 1/2/3
    * bytes) and the round-trip checksum from raw chars — so both the
    * encoder's width arithmetic and the decoder's reconstruction are
    * pinned cell-exactly.
    *
    * Scale: per-partition codec map + one rate-grain census (the
    * Multimodal family contract).
    */
  private val mmDelta = QueryDef(
    "q_mm_delta",
    (s, d) => {
      val feats = wavClips(s, d).mapPartitions(_.map { c =>
        val (sr, samples) = graft.functions.Codecs.Wav.decode(c.payload)
        val enc = graft.functions.Codecs.DeltaVarint.encode(samples)
        val back = graft.functions.Codecs.DeltaVarint.decode(enc)
        var ck = 0L; var i = 0
        while (i < back.length) { ck += back(i).toLong * (i + 1); i += 1 }
        DeltaFeatures(c.media_id, sr, back.length.toLong,
          enc.length.toLong, ck)
      })(org.apache.spark.sql.Encoders.product[DeltaFeatures])
      feats.groupBy(col("sample_rate"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("n_samples")).as("total_samples"),
          sum(col("coded_bytes")).as("coded_total"),
          sum(col("sample_checksum")).as("samples_checksum"))
        .withColumn("raw_total", col("total_samples") * 2L)
        // sample totals are corpus-scale at 100 TB audio — stage the e6
        .withColumn("ratio_e6", expr(
          "cast(cast(raw_total as decimal(38,0)) * 1000000 " +
            "div coded_total as bigint)"))
        .select(col("sample_rate"), col("n_clips"), col("total_samples"),
          col("raw_total"), col("coded_total"), col("ratio_e6"),
          col("samples_checksum"))
        .orderBy(ascf("sample_rate"))
    },
    Some("""WITH f AS (SELECT
           |    8000 + CAST(doc_id % 8 AS INTEGER) * 1000 AS sample_rate,
           |    CAST(len(text) AS BIGINT) AS n,
           |    CAST(8 + coalesce(list_sum(list_transform(
           |      range(1, len(text) + 1), i ->
           |      CASE WHEN (CASE WHEN i = 1
           |          THEN (ascii(substring(text, 1, 1)) & 127) - 78
           |          ELSE (ascii(substring(text, i, 1)) & 127)
           |            - (ascii(substring(text, i - 1, 1)) & 127) END)
           |          >= 0
           |        THEN (CASE WHEN 512 * (CASE WHEN i = 1
           |            THEN (ascii(substring(text, 1, 1)) & 127) - 78
           |            ELSE (ascii(substring(text, i, 1)) & 127)
           |              - (ascii(substring(text, i - 1, 1)) & 127) END)
           |            < 128 THEN 1
           |          WHEN 512 * (CASE WHEN i = 1
           |            THEN (ascii(substring(text, 1, 1)) & 127) - 78
           |            ELSE (ascii(substring(text, i, 1)) & 127)
           |              - (ascii(substring(text, i - 1, 1)) & 127) END)
           |            < 16384 THEN 2 ELSE 3 END)
           |        ELSE (CASE WHEN -512 * (CASE WHEN i = 1
           |            THEN (ascii(substring(text, 1, 1)) & 127) - 78
           |            ELSE (ascii(substring(text, i, 1)) & 127)
           |              - (ascii(substring(text, i - 1, 1)) & 127) END)
           |            - 1 < 128 THEN 1
           |          WHEN -512 * (CASE WHEN i = 1
           |            THEN (ascii(substring(text, 1, 1)) & 127) - 78
           |            ELSE (ascii(substring(text, i, 1)) & 127)
           |              - (ascii(substring(text, i - 1, 1)) & 127) END)
           |            - 1 < 16384 THEN 2 ELSE 3 END)
           |      END)), 0) AS BIGINT) AS coded,
           |    CAST(256 * coalesce(list_sum(list_transform(
           |      range(1, len(text) + 1), i ->
           |      ((ascii(substring(text, i, 1)) & 127) - 78) * i)), 0)
           |      AS BIGINT) AS ck
           |  FROM documents)
           |SELECT sample_rate, count(*) AS n_clips,
           |  CAST(sum(n) AS BIGINT) AS total_samples,
           |  CAST(sum(n) * 2 AS BIGINT) AS raw_total,
           |  CAST(sum(coded) AS BIGINT) AS coded_total,
           |  CAST((CAST(sum(n) AS HUGEINT) * 2 * 1000000) // sum(coded)
           |    AS BIGINT)
           |    AS ratio_e6,
           |  CAST(sum(ck) AS BIGINT) AS samples_checksum
           |FROM f GROUP BY sample_rate
           |ORDER BY sample_rate ASC NULLS FIRST""".stripMargin))

  final case class SpecFeatures(media_id: Long, sample_rate: Int,
      n_frames: Long, band: Long, energy: Long, even_energy: Long,
      max_abs: Long)

  /** Time–frequency spectrogram features through the WAV codec (round
    * 7): decode each clip, frame into NON-overlapping 8-sample windows,
    * compute all 8 WHT coefficients PER FRAME, and census per
    * (sample_rate, band) the total |coefficient| mass, the mass on
    * EVEN frame indices only, and the peak coefficient — the
    * featurization an audio model actually trains on (q_mm_wht grades
    * one frame's transform; a spectrogram is the transform × TIME, and
    * the even-frame split makes frame INDEXING gradeable: a stride or
    * boundary bug that preserves totals still flips even/odd mass).
    *
    * Scale: decode + framing + 8×8 transform fuse into the one
    * mapPartitions pass (the multimodal shape — zero shuffle before
    * the 64-group census); 8 rows leave per clip, never per frame.
    *
    * Determinism (D2): exact int16-in-int64 samples; per-frame |c_k| ≤
    * 8·2¹⁵, per-clip band mass ≤ frames·1.6e5 — int64 at any corpus
    * size since the census sums are per-band. The oracle recomputes
    * every frame coefficient from SOURCE chars by index arithmetic
    * (f·8+j), so a codec, framing, or Hadamard-sign bug breaks the
    * hash. Clips shorter than one frame emit no rows (min fixture doc
    * is 47 chars ⇒ ≥ 5 frames — none in practice, stated).
    */
  private val mmSpectrogram = QueryDef(
    "q_mm_spectrogram",
    (s, d) => {
      import s.implicits._
      val feats = wavClips(s, d).flatMap { c =>
        val (sr, samples) = graft.functions.Codecs.Wav.decode(c.payload)
        val nf = samples.length / 8
        if (nf == 0) Iterator.empty
        else (0 until 8).iterator.map { k =>
          var e = 0L; var ev = 0L; var mx = 0L
          var f = 0
          while (f < nf) {
            var acc = 0L; var j = 0
            while (j < 8) {
              val sign =
                if (java.lang.Integer.bitCount(j & k) % 2 == 0) 1L else -1L
              acc += sign * samples(f * 8 + j); j += 1
            }
            val a = math.abs(acc)
            e += a; if (f % 2 == 0) ev += a; if (a > mx) mx = a
            f += 1
          }
          SpecFeatures(c.media_id, sr, nf.toLong, k.toLong, e, ev, mx)
        }
      }(org.apache.spark.sql.Encoders.product[SpecFeatures])
      feats.groupBy(col("sample_rate").cast("long").as("sample_rate"),
          col("band"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("n_frames")).as("total_frames"),
          sum(col("energy")).as("energy_checksum"),
          sum(col("even_energy")).as("even_checksum"),
          max(col("max_abs")).as("max_coef"))
        .orderBy(ascf("sample_rate"), ascf("band"))
    },
    Some {
      def sample(idx: String) =
        s"(((ascii(substring(text, CAST($idx AS INTEGER), 1)) & 127) - 78)" +
          " * 256)"
      def coef(k: Int) = (0 until 8).map { j =>
        val sign = if (java.lang.Integer.bitCount(j & k) % 2 == 0) "+" else "-"
        s"$sign ${sample(s"f * 8 + ${j + 1}")}"
      }.mkString(" ").stripPrefix("+ ")
      def bandExprs(k: Int) =
        s"""CAST(coalesce(list_sum(list_transform(range(0, nf),
           |      f -> abs(${coef(k)}))), 0) AS BIGINT) AS e$k,
           |    CAST(coalesce(list_sum(list_transform(range(0, nf),
           |      f -> CASE WHEN f % 2 = 0 THEN abs(${coef(k)})
           |        ELSE 0 END)), 0) AS BIGINT) AS ev$k,
           |    CAST(coalesce(list_max(list_transform(range(0, nf),
           |      f -> abs(${coef(k)}))), 0) AS BIGINT) AS mx$k""".stripMargin
      val arms = (0 to 7).map(k =>
        s"SELECT sample_rate, CAST($k AS BIGINT) AS band, nf, e$k AS e, " +
          s"ev$k AS ev, mx$k AS mx FROM co").mkString("\n|  UNION ALL ")
      s"""WITH base AS (SELECT doc_id, text,
         |    8000 + CAST(doc_id % 8 AS BIGINT) * 1000 AS sample_rate,
         |    CAST(len(text) // 8 AS BIGINT) AS nf FROM documents),
         |co AS (SELECT sample_rate, nf,
         |    ${(0 to 7).map(bandExprs).mkString(",\n|    ")}
         |  FROM base WHERE nf >= 1),
         |u AS (
         |  $arms)
         |SELECT sample_rate, band, CAST(count(*) AS BIGINT) AS n_clips,
         |  CAST(sum(nf) AS BIGINT) AS total_frames,
         |  CAST(sum(e) AS BIGINT) AS energy_checksum,
         |  CAST(sum(ev) AS BIGINT) AS even_checksum,
         |  CAST(max(mx) AS BIGINT) AS max_coef
         |FROM u GROUP BY 1, 2
         |ORDER BY sample_rate ASC NULLS FIRST, band ASC NULLS FIRST"""
        .stripMargin
    })

  final case class BlockWhtFeatures(media_id: Long, width: Int,
      n_blocks: Long, dc_sum: Long, ac_abs: Long, u_band: Long,
      v_band: Long, max_ac: Long)

  /** 8×8 block 2-D Walsh–Hadamard features through the raster codec
    * (round 7): the JPEG-shaped block transform — tile each decoded
    * GIM8 image into 8×8 pixel blocks, apply the separable 2-D WHT
    * (coefficient (u,v) = Σ_{r,c} px(r,c)·(−1)^(popcount(u∧r)+popcount(v∧c)),
    * the integer stand-in for block DCT), and census per width: blocks,
    * DC mass, AC magnitude mass, peak AC — plus the u-band (v=0, u>0,
    * vertical structure) and v-band (u=0, v>0, horizontal structure)
    * split, which makes the 2-D INDEXING itself gradeable: a
    * transposed-block bug preserves every total but swaps the two
    * bands (the q_mm_spectrogram even/odd-frame trick in two
    * dimensions). q_mm_wht is one 1-D frame transform; this is
    * transform × SPACE.
    *
    * Scale: decode + tiling + 64 coefficients/block fuse into the one
    * mapPartitions pass (≤ 4096 multiply-adds per block, zero extra
    * shuffle); census output is width-sized. Images shorter than one
    * block row land in the zero-block census path (LEFT-JOIN grade).
    *
    * Determinism (D2): all-integer signs and sums (|coef| ≤ 64·127);
    * the oracle recomputes every coefficient of every block from
    * SOURCE chars by (block, row, col) index arithmetic, so codec,
    * tiling, and sign bugs all break the hash.
    */
  private val mmBlockWht = QueryDef(
    "q_mm_blockwht",
    (s, d) => {
      import s.implicits._
      val imgs = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val w = 8 + (id % 9).toInt
          val h = text.length / w
          val px = ascii7(text, 0, w * h)
          ImageRec(id, graft.functions.Codecs.GrayImage.encode(w, h, px))
        })
      val feats = imgs.mapPartitions(_.map { r =>
        val (w, h, px) = graft.functions.Codecs.GrayImage.decode(r.payload)
        val bw = w / 8; val bh = h / 8
        var nb = 0L; var dc = 0L; var acAbs = 0L
        var uBand = 0L; var vBand = 0L; var maxAc = 0L
        var bj = 0
        while (bj < bh) {
          var bi = 0
          while (bi < bw) {
            nb += 1
            var u = 0
            while (u < 8) {
              var v = 0
              while (v < 8) {
                var acc = 0L
                var rr = 0
                while (rr < 8) {
                  var cc = 0
                  while (cc < 8) {
                    val sign = if ((java.lang.Integer.bitCount(u & rr) +
                        java.lang.Integer.bitCount(v & cc)) % 2 == 0) 1L
                      else -1L
                    acc += sign *
                      (px((bj * 8 + rr) * w + bi * 8 + cc) & 0xFF)
                    cc += 1
                  }
                  rr += 1
                }
                if (u == 0 && v == 0) dc += acc
                else {
                  val a = math.abs(acc)
                  acAbs += a
                  if (a > maxAc) maxAc = a
                  if (v == 0) uBand += a
                  else if (u == 0) vBand += a
                }
                v += 1
              }
              u += 1
            }
            bi += 1
          }
          bj += 1
        }
        BlockWhtFeatures(r.media_id, w, nb, dc, acAbs, uBand, vBand, maxAc)
      })(org.apache.spark.sql.Encoders.product[BlockWhtFeatures])
      feats.groupBy(col("width").cast("long").as("width"))
        .agg(count(lit(1)).as("n_images"),
          sum(when(col("n_blocks") === 0, 1L).otherwise(0L))
            .as("n_blockless"),
          sum(col("n_blocks")).as("total_blocks"),
          sum(col("dc_sum")).as("dc_checksum"),
          sum(col("ac_abs")).as("ac_abs_checksum"),
          sum(col("u_band")).as("u_band_checksum"),
          sum(col("v_band")).as("v_band_checksum"),
          max(col("max_ac")).as("max_ac"))
        .orderBy(ascf("width"))
    },
    Some("""WITH base AS (SELECT doc_id, text,
           |    8 + CAST(doc_id % 9 AS BIGINT) AS w,
           |    len(text) // (8 + CAST(doc_id % 9 AS BIGINT)) AS h
           |  FROM documents),
           |blocks AS (SELECT doc_id, text, w, bi.x AS bi, bj.x AS bj
           |  FROM base
           |  CROSS JOIN LATERAL unnest(range(0, w // 8)) bi(x)
           |  CROSS JOIN LATERAL unnest(range(0, h // 8)) bj(x)),
           |co AS (SELECT doc_id, w, u.x AS u, v.x AS v,
           |    CAST(list_sum(list_transform(range(0, 64), i ->
           |      (ascii(substring(text,
           |         CAST((bj * 8 + i // 8) * w + bi * 8 + (i % 8) + 1
           |           AS INTEGER), 1)) & 127)
           |      * (1 - 2 * ((bit_count(u.x & (i // 8))
           |                   + bit_count(v.x & (i % 8))) % 2))))
           |      AS BIGINT) AS c
           |  FROM blocks
           |  CROSS JOIN LATERAL unnest(range(0, 8)) u(x)
           |  CROSS JOIN LATERAL unnest(range(0, 8)) v(x)),
           |img AS (SELECT doc_id, w,
           |    CAST(count(*) // 64 AS BIGINT) AS n_blocks,
           |    CAST(sum(CASE WHEN u = 0 AND v = 0 THEN c ELSE 0 END)
           |      AS BIGINT) AS dc_sum,
           |    CAST(sum(CASE WHEN u = 0 AND v = 0 THEN 0 ELSE abs(c) END)
           |      AS BIGINT) AS ac_abs,
           |    CAST(sum(CASE WHEN v = 0 AND u > 0 THEN abs(c) ELSE 0 END)
           |      AS BIGINT) AS u_band,
           |    CAST(sum(CASE WHEN u = 0 AND v > 0 THEN abs(c) ELSE 0 END)
           |      AS BIGINT) AS v_band,
           |    CAST(max(CASE WHEN u = 0 AND v = 0 THEN 0 ELSE abs(c) END)
           |      AS BIGINT) AS max_ac
           |  FROM co GROUP BY 1, 2)
           |SELECT b.w AS width, CAST(count(*) AS BIGINT) AS n_images,
           |  CAST(sum(CASE WHEN img.doc_id IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_blockless,
           |  CAST(coalesce(sum(img.n_blocks), 0) AS BIGINT) AS total_blocks,
           |  CAST(coalesce(sum(img.dc_sum), 0) AS BIGINT) AS dc_checksum,
           |  CAST(coalesce(sum(img.ac_abs), 0) AS BIGINT) AS ac_abs_checksum,
           |  CAST(coalesce(sum(img.u_band), 0) AS BIGINT) AS u_band_checksum,
           |  CAST(coalesce(sum(img.v_band), 0) AS BIGINT) AS v_band_checksum,
           |  CAST(coalesce(max(img.max_ac), 0) AS BIGINT) AS max_ac
           |FROM base b LEFT JOIN img ON b.doc_id = img.doc_id
           |GROUP BY b.w
           |ORDER BY width ASC NULLS FIRST""".stripMargin))

  def defs: Seq[QueryDef] = Seq(mmBinary, mmFeatures, mmAudioPcm, mmImageGray,
    mmVideoFrames, mmImageResize, mmAudioDownsample, mmPhash, mmSceneChange,
    mmAugment, mmWht, mmHisteq, mmRle, mmDelta, mmSpectrogram, mmBlockWht)
}
