package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns decoded to typed rows (SURVEY.md §2.9).
  *
  * The decoders are REAL pure-JVM codecs for three self-describing
  * formats — PPM P6/P5 (text header with whitespace/comment skipping),
  * BMP 24-bit uncompressed BI_RGB (little-endian headers, 4-byte row
  * padding, bottom-up vs top-down orientation) and WAV RIFF PCM
  * (chunk-walk that must skip unknown chunks) — chosen because between
  * them they exercise the quirks a production codec integration hits,
  * and the container ships no external codec libraries. A JPEG/PNG
  * decoder drops into [[decodeImages]]'s dispatch the same way: the
  * mapPartitions batch shape, schema, and partitioning don't change.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata alongside. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  case class DecodedImage(media_id: Long, format: String, width: Int, height: Int,
                          channels: Int, n_bytes: Long, mean_px: Double)

  case class DecodedAudio(media_id: Long, sample_rate: Int, channels: Int,
                          n_samples: Long, duration_s: Double, rms: Double)

  case class ResizedImage(media_id: Long, format: String, width: Int,
                          height: Int, payload: Array[Byte])

  /** PPM/PGM: `P6`(RGB)/`P5`(gray), then w, h, maxval as ASCII tokens
    * separated by whitespace, `#` comments legal between tokens, ONE
    * whitespace byte, then the raster.
    */
  private[graft] object Ppm {
    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, "P6 raster must be w*h*3 bytes")
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
    }

    def encodeGray(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
      require(gray.length == w * h, "P5 raster must be w*h bytes")
      s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ gray
    }

    /** @return (width, height, channels, rasterOffset) */
    def header(b: Array[Byte]): (Int, Int, Int, Int) = {
      require(b.length >= 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6'),
        "not a P5/P6 netpbm payload")
      val channels = if (b(1) == '6') 3 else 1
      var i = 2
      def token(): Int = {
        // skip whitespace and #-to-end-of-line comments between tokens
        var going = true
        while (going) {
          while (i < b.length && Character.isWhitespace(b(i))) i += 1
          if (i < b.length && b(i) == '#') while (i < b.length && b(i) != '\n') i += 1
          else going = false
        }
        var v = 0
        while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
        v
      }
      val (w, h, maxval) = (token(), token(), token())
      require(maxval > 0 && maxval < 256, s"unsupported maxval $maxval")
      i += 1 // exactly one whitespace byte before the raster
      (w, h, channels, i)
    }
  }

  /** BMP: 14-byte file header (`BM`, file size, raster offset at byte
    * 10) + BITMAPINFOHEADER (width at 18, SIGNED height at 22 — negative
    * means top-down, 24bpp at 28, BI_RGB at 30). Rows are BGR, each
    * padded to a 4-byte boundary, stored bottom-up unless height < 0.
    */
  private[graft] object Bmp {
    private def le32(b: Array[Byte], at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
        ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)

    def encode(w: Int, h: Int, rgb: Array[Byte], topDown: Boolean = false): Array[Byte] = {
      require(rgb.length == w * h * 3, "raster must be w*h*3 bytes")
      val rowBytes = w * 3
      val stride = (rowBytes + 3) & ~3
      val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
        .putInt(0).putInt(54) // reserved, raster offset
      bb.putInt(40).putInt(w).putInt(if (topDown) -h else h)
        .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
        .putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
      for (row <- 0 until h) {
        val srcRow = if (topDown) row else h - 1 - row
        for (x <- 0 until w) {
          val p = (srcRow * w + x) * 3
          bb.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR on disk
        }
        for (_ <- rowBytes until stride) bb.put(0.toByte)
      }
      bb.array()
    }

    /** @return (width, height, rasterOffset, stride, topDown) */
    def header(b: Array[Byte]): (Int, Int, Int, Int, Boolean) = {
      require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP payload")
      val (offset, w, rawH) = (le32(b, 10), le32(b, 18), le32(b, 22))
      require(le16(b, 28) == 24 && le32(b, 30) == 0,
        "only 24bpp uncompressed BI_RGB supported")
      require(w >= 0 && offset >= 0, s"corrupt BMP geometry: w=$w offset=$offset")
      val (h, stride) = (math.abs(rawH), (w * 3 + 3) & ~3)
      // a header may declare more raster than the payload carries —
      // fail the row loudly instead of reading past the array
      require(h == 0 || offset.toLong + (h - 1).toLong * stride + w * 3 <= b.length,
        s"truncated BMP raster: ${b.length} bytes for ${w}x$h @ offset $offset")
      (w, h, offset, stride, rawH < 0)
    }

    /** Decoded RGB raster in top-down row order, padding stripped. */
    def pixels(b: Array[Byte]): (Int, Int, Array[Byte]) = {
      val (w, h, offset, stride, topDown) = header(b)
      val out = new Array[Byte](w * h * 3)
      for (row <- 0 until h) {
        val srcRow = if (topDown) row else h - 1 - row
        var x = 0
        while (x < w) {
          val src = offset + srcRow * stride + x * 3
          val dst = (row * w + x) * 3
          out(dst) = b(src + 2); out(dst + 1) = b(src + 1); out(dst + 2) = b(src)
          x += 1
        }
      }
      (w, h, out)
    }
  }

  /** WAV: `RIFF` size `WAVE`, then chunks; a correct parser walks chunk
    * headers and SKIPS unknown chunks (real encoders emit LIST/fact/cue
    * chunks between fmt and data).
    */
  private[graft] object Wav {
    private def le32(b: Array[Byte], at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
        ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], at: Int): String =
      new String(b, at, 4, "US-ASCII")

    def encodePcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
        .putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** @return (sampleRate, channels, bitsPerSample, dataOffset, dataLen) */
    def header(b: Array[Byte]): (Int, Int, Int, Int, Int) = {
      require(b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
        "not a RIFF/WAVE payload")
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None
      var data: Option[(Int, Int)] = None
      while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
        val (id, len) = (tag(b, i), le32(b, i + 4))
        require(len >= 0 && i + 8 + len <= b.length,
          s"corrupt WAV chunk '$id': length $len at offset $i of ${b.length}")
        if (id == "fmt ") {
          require(le16(b, i + 8) == 1, "only PCM WAV supported")
          fmt = Some((le32(b, i + 12), le16(b, i + 10), le16(b, i + 22)))
        } else if (id == "data") data = Some((i + 8, len))
        i += 8 + len + (len & 1) // chunks are word-aligned
      }
      val (rate, ch, bits) = fmt.getOrElse(sys.error("missing fmt chunk"))
      val (off, dlen) = data.getOrElse(sys.error("missing data chunk"))
      (rate, ch, bits, off, dlen)
    }
  }

  /** Byte offset where a payload's raster/sample data begins — the
    * header is format-metadata, not content; frame sampling and
    * content-chunking both start here. Sniffs the magic bytes.
    */
  def rasterOffset(payload: Array[Byte]): Int =
    if (payload.length >= 2 && payload(0) == 'P' && (payload(1) == '5' || payload(1) == '6'))
      Ppm.header(payload)._4
    else if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      Bmp.header(payload)._3
    else if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I')
      Wav.header(payload)._4
    else 0

  private def decodePayload(id: Long, payload: Array[Byte]): DecodedImage = {
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') {
      val (w, h, px) = Bmp.pixels(payload)
      var sum = 0L; var i = 0
      while (i < px.length) { sum += px(i) & 0xff; i += 1 }
      DecodedImage(id, "bmp", w, h, 3, payload.length.toLong,
        if (px.length > 0) sum.toDouble / px.length else 0.0)
    } else {
      val (w, h, c, off) = Ppm.header(payload)
      var sum = 0L; var i = off
      val end = math.min(payload.length, off + w * h * c)
      while (i < end) { sum += payload(i) & 0xff; i += 1 }
      DecodedImage(id, if (c == 3) "ppm" else "pgm", w, h, c, payload.length.toLong,
        if (end > off) sum.toDouble / (end - off) else 0.0)
    }
  }

  /** Batch decode: mapPartitions so per-partition decoder state (codec
    * contexts, model sessions) is initialised once per task, not per row
    * — the shape that matters when each partition holds thousands of
    * multi-MB payloads. Dispatches on magic bytes (PPM/PGM/BMP).
    */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec context, arena buffer)
      rows.filter(_.kind == "image").map(r => decodePayload(r.media_id, r.payload))
    }
  }

  /** Decoded raster of an image payload: (w, h, channels, pixels) for
    * PPM/PGM directly and BMP via its row-unpadded pixel walk.
    */
  private def rasterOf(payload: Array[Byte]): (Int, Int, Int, Array[Byte]) =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') {
      val (w, h, px) = Bmp.pixels(payload)
      (w, h, 3, px)
    } else {
      val (w, h, c, off) = Ppm.header(payload)
      (w, h, c, payload.slice(off, off + w * h * c))
    }

  /** NEAREST-NEIGHBOR resize of the decoded raster, re-encoded as
    * PPM/PGM (the normalization step before a vision model's fixed
    * input size). Source index per output pixel is the floor mapping
    * `src = dst * srcDim / outDim` — pure integer math, so the result
    * is deterministic across engines/partitionings, and resizing to the
    * source size is the IDENTITY on the raster (golden-spec'd). Same
    * mapPartitions one-init-per-partition batch shape as decode; output
    * payload size is exactly outW·outH·channels + header, independent
    * of input size — the property that bounds shuffle width when a
    * 100 TB image corpus normalizes to a model's input resolution.
    */
  def resizeImages(media: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[ResizedImage] = {
    require(outW > 0 && outH > 0, "output dims must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "image").map { r =>
        val (w, h, c, px) = rasterOf(r.payload)
        val out = new Array[Byte](outW * outH * c)
        var y = 0
        while (y < outH) {
          val sy = y * h / outH
          var x = 0
          while (x < outW) {
            val sx = x * w / outW
            var ch = 0
            while (ch < c) {
              out((y * outW + x) * c + ch) = px((sy * w + sx) * c + ch)
              ch += 1
            }
            x += 1
          }
          y += 1
        }
        ResizedImage(r.media_id, if (c == 3) "ppm" else "pgm", outW, outH,
          if (c == 3) Ppm.encode(outW, outH, out)
          else Ppm.encodeGray(outW, outH, out))
      }
    }
  }

  /** Batch audio decode: RIFF PCM header + RMS amplitude over the
    * normalized samples (the feature-extraction stand-in).
    */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "audio").map { r =>
        val (rate, ch, bits, off, dlen) = Wav.header(r.payload)
        // the RMS loop below reads 16-bit LE words; any other depth
        // would pair bytes into garbage while n_frames looked right
        require(bits == 16, s"only 16-bit PCM decode supported, got $bits-bit")
        val bytesPerSample = bits / 8
        val nFrames = dlen / (ch * bytesPerSample)
        var sumSq = 0.0
        var i = off
        while (i + 1 < off + dlen) {
          val s = ((r.payload(i) & 0xff) | (r.payload(i + 1) << 8)).toShort / 32768.0
          sumSq += s * s
          i += 2
        }
        val n = dlen / 2
        DecodedAudio(r.media_id, rate, ch, nFrames.toLong,
          nFrames.toDouble / rate, if (n > 0) math.sqrt(sumSq / n) else 0.0)
      }
    }
  }

  /** Frame sampling for video-shaped payloads: every nth chunk of
    * `frameBytes` of the RASTER (the sniffed header is metadata, not
    * frames) as its own row — the explode-without-decode pattern.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int, everyNth: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val off = rasterOffset(r.payload)
      val nFrames = math.max(0, (r.payload.length - off) / frameBytes)
      (0 until nFrames by everyNth).map { f =>
        val from = off + f * frameBytes
        (r.media_id, f, r.payload.slice(from, from + frameBytes))
      }
    }.toDF("media_id", "frame_no", "frame")
  }

  /** 64-bit average-hash (aHash) of an image payload — the perceptual
    * fingerprint that joins the MULTIMODAL surface to the DEDUP family:
    * re-encodes (PPM↔BMP) and integer-factor nearest-neighbor rescales
    * of the same picture collide, so grouping by the hash finds image
    * duplicates without comparing pixels pairwise. All-integer
    * pipeline: sample an 8×8 grid (floor mapping, the resize kernel),
    * integer luma (77r+150g+29b)>>8, threshold at the integer mean,
    * pack 64 bits row-major. Determinism notes: the nested floor
    * identity ⌊⌊a/k⌋/m⌋=⌊a/km⌋ makes the hash EXACTLY invariant under
    * integer-factor NN rescale (spec-pinned), and a uniform brightness
    * shift moves pixels and mean together, flipping no bit.
    */
  def aHash64(payload: Array[Byte]): Long = aHashWithMean(payload)._1

  /** (aHash, quantized luma mean): the mean bucket (mean >> 4, 16
    * levels) is what [[dedupImages]] groups by NEXT TO the hash —
    * thresholding strictly above the mean sends every ZERO-CONTRAST
    * image (solid black, solid white, any flat gray) to aHash 0, so
    * hash-only grouping would merge visually different flat images
    * under one wrong survivor (round-9 advice). The bucket separates
    * flat images by brightness while keeping every spec-pinned aHash
    * invariance intact: re-encode and integer rescale preserve pixel
    * values exactly (same mean, same bucket), and aHash64 itself stays
    * brightness-shift-invariant — only dedup GROUPING becomes
    * brightness-sensitive, with a bucket-boundary crossing on a shifted
    * copy the documented residual.
    */
  def aHashWithMean(payload: Array[Byte]): (Long, Long) = {
    val (w, h, c, px) = rasterOf(payload)
    val g = new Array[Long](64)
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      while (x < 8) {
        val sx = x * w / 8
        val at = (sy * w + sx) * c
        g(y * 8 + x) =
          if (c == 1) (px(at) & 0xff).toLong
          else ((px(at) & 0xff) * 77L + (px(at + 1) & 0xff) * 150L +
            (px(at + 2) & 0xff) * 29L) >> 8
        x += 1
      }
      y += 1
    }
    val mean = g.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (g(i) > mean) bits |= 1L << i
      i += 1
    }
    (bits, mean >> 4)
  }

  case class ImageHash(media_id: Long, ahash: Long, mean_q: Long)

  /** Per-image perceptual hashes — same one-init-per-partition batch
    * shape as decode; the shuffle after this carries (id, 8-byte hash),
    * never pixels, which is the whole point at 100 TB.
    */
  def imageHashes(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.kind == "image").map { r =>
        val (h, m) = aHashWithMean(r.payload)
        ImageHash(r.media_id, h, m)
      }
    }
  }

  /** Image dedup by perceptual hash: one row per DUPLICATED fingerprint
    * with the deterministic survivor (min id) and the sorted member
    * list. Grouped by (ahash, mean bucket) — see [[aHashWithMean]]: the
    * bucket keeps zero-contrast images of different brightness apart.
    * One hash aggregate over ≤16-byte keys — the dedup_exact plan shape
    * applied to pictures.
    */
  def dedupImages(media: Dataset[MediaRecord]): DataFrame = {
    import org.apache.spark.sql.functions._
    imageHashes(media).toDF()
      .groupBy(col("ahash"), col("mean_q"))
      .agg(min(col("media_id")).as("survivor_id"),
        count(lit(1)).as("n_copies"),
        sort_array(collect_list(col("media_id"))).as("member_ids"))
      .filter(col("n_copies") > 1)
      .drop("mean_q")
  }

  /** Deterministic pseudo-random bytes seeded by media_id (LCG) — the
    * pixel/sample content of the synthetic corpus.
    */
  private def fakeBytes(mediaId: Long, n: Int): Array[Byte] = {
    val body = new Array[Byte](n)
    var seed = mediaId * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < n) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      body(i) = (seed >>> 56).toByte
      i += 1
    }
    body
  }

  /** Synthesize a media table of REAL blobs (the container ships no
    * binary fixtures): PPM and BMP images alternating, plus PCM WAV
    * audio — all decodable by [[decodeImages]]/[[decodeAudio]].
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { i =>
      val (w, h) = (8 + (i % 5).toInt, 6 + (i % 3).toInt)
      if (i % 4 == 3) {
        val samples = fakeBytes(i, 2 * 800).grouped(2)
          .map(p => (((p(0) & 0xff) | (p(1) << 8))).toShort).toArray
        MediaRecord(i, "audio", Wav.encodePcm16(8000, 1, samples))
      } else {
        val rgb = fakeBytes(i, w * h * 3)
        val payload =
          if (i % 2 == 0) Ppm.encode(w, h, rgb)
          else Bmp.encode(w, h, rgb, topDown = i % 8 == 1)
        MediaRecord(i, "image", payload)
      }
    }
  }
}
