package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** REAL (pure-JVM) binary media codecs for the codec-free formats — the
  * multimodal decode paths that need no external libraries:
  *
  *  - `Wav`: RIFF/WAVE container with 16-bit little-endian PCM mono
  *    audio — a full header writer/parser (RIFF size, fmt chunk with
  *    audio-format/channels/rates, data chunk), not a stub.
  *  - `GrayImage`: raw 8-bit grayscale raster with a fixed 12-byte
  *    header (magic + little-endian width/height).
  *
  *  - `Flate`: a genuinely COMPRESSED container (GZC1) over the JDK's
  *    DEFLATE (`java.util.zip.Deflater`/`Inflater`) with declared-length
  *    and Adler-32 validation — no external library needed.
  *
  * Formats that do require external codec libraries (JPEG/MP3/H.264)
  * would slot behind the same decode signatures. Decoders here VALIDATE
  * structure and throw on malformed input: a parsing bug cannot
  * silently pass the oracle.
  */
object Codecs {

  object Wav {
    /** 44-byte canonical PCM WAV header + LE16 samples, mono. */
    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Parse the RIFF container back: returns (sampleRate, samples).
      * Validates every magic and the fixed PCM16-mono layout.
      */
    def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
      // guard BEFORE any ByteBuffer read: a truncated header must raise
      // the documented IllegalArgumentException, not leak a raw
      // BufferUnderflowException (ADVICE r4)
      require(bytes.length >= 44, s"truncated WAV header: ${bytes.length} bytes")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def tag(expect: String): Unit = {
        val t = new Array[Byte](4); bb.get(t)
        require(new String(t, "US-ASCII") == expect, s"bad chunk: want $expect")
      }
      tag("RIFF")
      val riffLen = bb.getInt
      require(riffLen == bytes.length - 8, s"RIFF length $riffLen mismatch")
      tag("WAVE"); tag("fmt ")
      require(bb.getInt == 16, "unexpected fmt chunk size")
      require(bb.getShort == 1, "not PCM")
      require(bb.getShort == 1, "not mono")
      val sampleRate = bb.getInt
      require(bb.getInt == sampleRate * 2, "byte rate mismatch")
      require(bb.getShort == 2, "block align mismatch")
      require(bb.getShort == 16, "not 16-bit")
      tag("data")
      val dataLen = bb.getInt
      require(dataLen == bytes.length - 44 && dataLen % 2 == 0, "data length")
      val out = new Array[Short](dataLen / 2)
      var i = 0
      while (i < out.length) { out(i) = bb.getShort; i += 1 }
      (sampleRate, out)
    }
  }

  object GrayImage {
    val Magic = "GIM8"

    /** 12-byte header (magic, LE width, LE height) + row-major pixels. */
    def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
      // Long math mirrors decode: w*h in Int overflows for dimensions
      // like 65536x65536 and would let encode emit bytes its own
      // decoder rejects (review r4)
      require(width >= 0 && height >= 0 &&
        pixels.length.toLong == width.toLong * height.toLong,
        "pixel count != w*h")
      val bb = ByteBuffer.allocate(12 + pixels.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(Magic.getBytes("US-ASCII")).putInt(width).putInt(height)
        .put(pixels)
      bb.array()
    }

    /** Returns (width, height, pixels); validates magic + dimensions. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      // same truncated-header contract as Wav.decode (ADVICE r4)
      require(bytes.length >= 12, s"truncated image header: ${bytes.length} bytes")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val t = new Array[Byte](4); bb.get(t)
      require(new String(t, "US-ASCII") == Magic, "bad image magic")
      val w = bb.getInt; val h = bb.getInt
      // Long math: w*h in Int can overflow to a small value and let a
      // crafted header pass the length check (review r4)
      require(w >= 0 && h >= 0 &&
        bytes.length.toLong == 12L + w.toLong * h.toLong,
        s"dimension/payload mismatch: ${w}x$h vs ${bytes.length - 12} bytes")
      val px = new Array[Byte](w * h); bb.get(px)
      (w, h, px)
    }
  }

  /** Delta + zigzag + varint coding for PCM16 sample streams: magic
    * "DZV1" + LE sample count, then per sample the zigzag-mapped delta
    * against the previous sample (first sample deltas against 0) as a
    * little-endian base-128 varint (7 payload bits per byte, high bit
    * = continuation) — the standard time-series/column-store integer
    * codec (Gorilla/Parquet DELTA_BINARY_PACKED family, varint as in
    * protobuf). decode validates magic, exact sample count, varint
    * termination, and the int16 range of every reconstructed sample.
    */
  object DeltaVarint {
    val Magic = "DZV1"

    def encode(samples: Array[Short]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(8 + samples.length * 2)
      out.write(Magic.getBytes("US-ASCII"))
      val hdr = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(samples.length).array()
      out.write(hdr)
      var prev = 0
      var i = 0
      while (i < samples.length) {
        val d = samples(i) - prev
        var z = (d << 1) ^ (d >> 31) // zigzag: non-neg, small |d| small
        while ((z & ~0x7F) != 0) { out.write((z & 0x7F) | 0x80); z >>>= 7 }
        out.write(z)
        prev = samples(i); i += 1
      }
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): Array[Short] = {
      require(bytes.length >= 8, s"truncated DZV header: ${bytes.length}")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val t = new Array[Byte](4); bb.get(t)
      require(new String(t, "US-ASCII") == Magic, "bad DZV magic")
      val n = bb.getInt
      require(n >= 0, s"negative sample count $n")
      val out = new Array[Short](n)
      var prev = 0
      var i = 0
      while (i < n) {
        var z = 0; var shift = 0; var more = true
        while (more) {
          require(bb.hasRemaining, s"truncated varint at sample $i")
          require(shift <= 28, s"varint overflow at sample $i")
          val b = bb.get() & 0xFF
          z |= (b & 0x7F) << shift; shift += 7; more = (b & 0x80) != 0
        }
        val d = (z >>> 1) ^ -(z & 1) // un-zigzag
        val v = prev + d
        require(v >= Short.MinValue && v <= Short.MaxValue,
          s"sample $i out of int16 range: $v")
        out(i) = v.toShort; prev = v; i += 1
      }
      require(!bb.hasRemaining, s"${bb.remaining()} trailing bytes")
      out
    }
  }

  /** Run-length coding: magic "RLE1" + LE raw length + (value byte,
    * LE int32 run length) pairs. The run length is 32-bit rather than
    * the classic one byte so a run NEVER splits — pair count therefore
    * equals the true boundary-change count, which is what the oracle
    * recomputes from source characters (a capped-length format would
    * make pair count depend on cap-splitting arithmetic the SQL side
    * can't cheaply mirror). decode validates magic, exact decoded
    * length, and positive run lengths, so a broken encode cannot
    * round-trip.
    */
  object Rle {
    val Magic = "RLE1"

    /** Returns the encoded bytes; n_runs = (length − 8) / 5. */
    def encode(raw: Array[Byte]): Array[Byte] = {
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Byte, Int)]
      var i = 0
      while (i < raw.length) {
        var j = i + 1
        while (j < raw.length && raw(j) == raw(i)) j += 1
        runs += ((raw(i), j - i)); i = j
      }
      val bb = ByteBuffer.allocate(8 + 5 * runs.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(Magic.getBytes("US-ASCII")).putInt(raw.length)
      runs.foreach { case (v, n) => bb.put(v).putInt(n) }
      bb.array()
    }

    /** Returns the decoded bytes; validates magic/length/run shape. */
    def decode(bytes: Array[Byte]): Array[Byte] = {
      require(bytes.length >= 8 && (bytes.length - 8) % 5 == 0,
        s"bad RLE container: ${bytes.length} bytes")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val t = new Array[Byte](4); bb.get(t)
      require(new String(t, "US-ASCII") == Magic, "bad RLE magic")
      val rawLen = bb.getInt
      require(rawLen >= 0, s"negative raw length $rawLen")
      val out = new Array[Byte](rawLen)
      var pos = 0
      while (bb.remaining() >= 5) {
        val v = bb.get(); val n = bb.getInt
        require(n > 0 && pos + n <= rawLen, s"bad run length $n at $pos")
        java.util.Arrays.fill(out, pos, pos + n, v); pos += n
      }
      require(pos == rawLen, s"decoded $pos of $rawLen bytes")
      out
    }
  }

  /** GENUINELY COMPRESSED container: magic "GZC1" + LE raw length +
    * LE Adler-32 of the raw bytes + a raw DEFLATE stream
    * (`java.util.zip.Deflater`/`Inflater`, nowrap) — the JDK ships the
    * codec, so unlike JPEG/MP3 no external library is needed. decode
    * inflates and VALIDATES: magic, exact inflated length, checksum,
    * and full stream consumption all reject on mismatch, so a broken
    * inflate path cannot silently pass the oracle (which recomputes
    * the expected statistics from the uncompressed source).
    */
  object Flate {
    val Magic = "GZC1"

    def encode(raw: Array[Byte]): Array[Byte] = {
      val adler = new java.util.zip.Adler32
      adler.update(raw, 0, raw.length)
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.BEST_SPEED, /* nowrap = */ true)
      try {
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](math.max(64, raw.length + (raw.length >> 1)))
        val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
        while (!d.finished()) {
          val n = d.deflate(buf)
          out.write(buf, 0, n)
        }
        val comp = out.toByteArray
        val bb = ByteBuffer.allocate(12 + comp.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        bb.put(Magic.getBytes("US-ASCII"))
          .putInt(raw.length).putInt(adler.getValue.toInt)
          .put(comp)
        bb.array()
      } finally d.end()
    }

    /** Inflate back to the raw bytes; validates magic, length, Adler-32
      * and that the deflate stream ends exactly at the declared length.
      */
    def decode(bytes: Array[Byte]): Array[Byte] = {
      require(bytes.length >= 12, s"truncated GZC1 header: ${bytes.length} bytes")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val t = new Array[Byte](4); bb.get(t)
      require(new String(t, "US-ASCII") == Magic, "bad GZC1 magic")
      val rawLen = bb.getInt
      require(rawLen >= 0, s"negative raw length $rawLen")
      val declaredAdler = bb.getInt
      val inf = new java.util.zip.Inflater(/* nowrap = */ true)
      try {
        inf.setInput(bytes, 12, bytes.length - 12)
        val raw = new Array[Byte](rawLen)
        var off = 0
        while (off < rawLen && !inf.finished()) {
          val n = inf.inflate(raw, off, rawLen - off)
          require(n > 0 || !inf.needsInput(), "truncated deflate stream")
          off += n
        }
        require(off == rawLen, s"inflated $off bytes, declared $rawLen")
        // the stream must END here: trailing compressed data means the
        // declared length lies about the payload
        require(inf.finished() ||
          inf.inflate(new Array[Byte](1)) == 0 && inf.finished(),
          "deflate stream longer than declared length")
        val adler = new java.util.zip.Adler32
        adler.update(raw, 0, raw.length)
        require(adler.getValue.toInt == declaredAdler,
          "Adler-32 checksum mismatch")
        raw
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(s"corrupt deflate data: ${e.getMessage}")
      } finally inf.end()
    }
  }

  /** Raw grayscale VIDEO container: fixed-dimension frame sequence.
    * 16-byte header (magic "GVF1", LE width, LE height, LE n_frames) +
    * n_frames row-major rasters back to back. Same validate-and-throw
    * contract as Wav/GrayImage: truncated header, bad magic,
    * dimension/payload mismatch, and Int-overflow dimension attacks all
    * reject (FunctionsSpec).
    */
  object Video {
    val Magic = "GVF1"

    def encode(width: Int, height: Int,
        frames: Array[Array[Byte]]): Array[Byte] = {
      val fpx = width.toLong * height.toLong
      require(width >= 0 && height >= 0 &&
        frames.forall(_.length.toLong == fpx), "frame size != w*h")
      val total = 16L + fpx * frames.length
      require(total <= Int.MaxValue, "video too large to encode")
      val bb = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(Magic.getBytes("US-ASCII"))
        .putInt(width).putInt(height).putInt(frames.length)
      frames.foreach(bb.put)
      bb.array()
    }

    /** Returns (width, height, frames); validates magic + dimensions. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
      require(bytes.length >= 16, s"truncated video header: ${bytes.length} bytes")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val t = new Array[Byte](4); bb.get(t)
      require(new String(t, "US-ASCII") == Magic, "bad video magic")
      val w = bb.getInt; val h = bb.getInt; val nf = bb.getInt
      // Long math: w*h*nf in Int can overflow past the length check
      require(w >= 0 && h >= 0 && nf >= 0 &&
        bytes.length.toLong == 16L + w.toLong * h.toLong * nf.toLong,
        s"dimension/payload mismatch: ${w}x${h}x$nf vs ${bytes.length - 16} bytes")
      val frames = Array.fill(nf) {
        val f = new Array[Byte](w * h); bb.get(f); f
      }
      (w, h, frames)
    }
  }
}
