package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalQueries

/** Pins for the oracle-checked multimodal metadata key: its byte/frame
  * arithmetic must agree with the binary plumbing in
  * graft.pipeline.Multimodal (same ceil-div chunking a payload pipeline
  * uses), and the content address must be the md5 of the exact payload
  * bytes.
  */
class MultimodalQueriesSpec extends SparkSpec {

  test("mm_binary_meta: byte counts, frame counts, and digests are consistent") {
    val rows = MultimodalQueries.queries("mm_binary_meta")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bytes = texts(id).getBytes("UTF-8")
      assert(r.getAs[Long]("n_bytes") == bytes.length)
      assert(r.getAs[Long]("n_frames") == (bytes.length + 255) / 256)
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("content_md5") == md)
      val head = texts(id).substring(0, math.min(12, texts(id).length))
      assert(r.getAs[String]("b64_head") ==
        java.util.Base64.getEncoder.encodeToString(head.getBytes("UTF-8")))
    }
  }

  test("multimodal decode plumbing and metadata key agree on chunk math") {
    val media = graft.pipeline.Multimodal.syntheticMedia(spark, 32)
    val frames = graft.pipeline.Multimodal.sampleFrames(media, 16, 1)
      .groupBy("media_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    media.collect().foreach { m =>
      // sampleFrames floors (full frames only); the metadata key ceils
      // (every byte belongs to a frame) — both derive from the raster
      // length past the sniffed format header
      val body = m.payload.length - graft.pipeline.Multimodal.rasterOffset(m.payload)
      assert(frames.getOrElse(m.media_id, 0L) == body / 16)
    }
  }

  test("image decode is a real codec: PPM and BMP of one raster agree exactly") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    import graft.pipeline.Multimodal.MediaRecord
    // known raster: 3x2 RGB ramp — W*3=9 bytes/row forces BMP to pad
    // rows to 12, and the three encodings (PPM, bottom-up BMP, top-down
    // BMP) must all decode to the same dimensions and pixel mean; a
    // padding or row-flip bug breaks the equality
    val rgb = (0 until 3 * 2 * 3).map(i => (i * 7).toByte).toArray
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "image", graft.pipeline.Multimodal.Ppm.encode(3, 2, rgb)),
      MediaRecord(2L, "image", graft.pipeline.Multimodal.Bmp.encode(3, 2, rgb)),
      MediaRecord(3L, "image", graft.pipeline.Multimodal.Bmp.encode(3, 2, rgb, topDown = true))))
    val out = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(out.map(_.format).toSeq == Seq("ppm", "bmp", "bmp"))
    val expectedMean = rgb.map(_ & 0xff).sum.toDouble / rgb.length
    out.foreach { d =>
      assert(d.width == 3 && d.height == 2 && d.channels == 3)
      assert(math.abs(d.mean_px - expectedMean) < 1e-12)
    }
    // the BMP raster must round-trip pixel-exact through padding + flip
    val (_, _, decoded) = Multimodal.Bmp.pixels(Multimodal.Bmp.encode(3, 2, rgb))
    assert(decoded.toSeq == rgb.toSeq)
    val (_, _, decodedTd) = Multimodal.Bmp.pixels(Multimodal.Bmp.encode(3, 2, rgb, topDown = true))
    assert(decodedTd.toSeq == rgb.toSeq)
  }

  test("ppm header parse handles comments and multi-digit dims") {
    val raster = Array.fill(12 * 34 * 3)(65.toByte)
    val withComment = ("P6\n# a comment line\n12 34\n# another\n255\n")
      .getBytes("US-ASCII") ++ raster
    val (w, h, c, off) = graft.pipeline.Multimodal.Ppm.header(withComment)
    assert(w == 12 && h == 34 && c == 3)
    assert(withComment.length - off == 12 * 34 * 3)
  }

  test("wav decode walks RIFF chunks and computes duration and rms") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    import graft.pipeline.Multimodal.MediaRecord
    // constant-amplitude signal: rms is known in closed form
    val samples = Array.fill(4000)(16384.toShort) // 0.5 amplitude, 0.5 s @ 8kHz
    val media = spark.createDataset(Seq(
      MediaRecord(7L, "audio", Multimodal.Wav.encodePcm16(8000, 1, samples))))
    val d = Multimodal.decodeAudio(media).collect().head
    assert(d.sample_rate == 8000 && d.channels == 1 && d.n_samples == 4000L)
    assert(math.abs(d.duration_s - 0.5) < 1e-12)
    assert(math.abs(d.rms - 0.5) < 1e-6)
  }

  test("corrupt payloads fail loudly instead of hanging or reading garbage") {
    import graft.pipeline.Multimodal
    // negative RIFF chunk length: the chunk walk once stepped 0 bytes
    // and spun forever — must now throw with the offset in the message
    val wav = Multimodal.Wav.encodePcm16(8000, 1, Array.fill(100)(1000.toShort))
    val badLen = wav.clone()
    badLen(16) = 0xF8.toByte; badLen(17) = 0xFF.toByte
    badLen(18) = 0xFF.toByte; badLen(19) = 0xFF.toByte
    val e1 = intercept[IllegalArgumentException](Multimodal.Wav.header(badLen))
    assert(e1.getMessage.contains("corrupt WAV chunk"))
    // truncated BMP raster: header declares more rows than the payload
    val bmp = Multimodal.Bmp.encode(3, 2, Array.fill(18)(7.toByte))
    val truncated = bmp.take(bmp.length - 5)
    val e2 = intercept[IllegalArgumentException](Multimodal.Bmp.pixels(truncated))
    assert(e2.getMessage.contains("truncated BMP raster"))
  }

  test("non-16-bit PCM is refused, not decoded into garbage rms") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    import graft.pipeline.Multimodal.MediaRecord
    // hand-build an 8-bit PCM header (encodePcm16 can't): patch bits=8
    val wav = Multimodal.Wav.encodePcm16(8000, 1, Array.fill(100)(1000.toShort))
    val eightBit = wav.clone()
    eightBit(34) = 8.toByte // fmt chunk bitsPerSample
    val media = spark.createDataset(Seq(MediaRecord(9L, "audio", eightBit)))
    val err = intercept[org.apache.spark.SparkException](
      Multimodal.decodeAudio(media).collect())
    assert(err.getCause.getMessage.contains("16-bit"),
      s"expected the bit-depth refusal: ${err.getCause.getMessage}")
  }

  test("synthetic corpus round-trips through the real decoders") {
    val media = graft.pipeline.Multimodal.syntheticMedia(spark, 32)
    val images = graft.pipeline.Multimodal.decodeImages(media).collect()
    val audio = graft.pipeline.Multimodal.decodeAudio(media).collect()
    assert(images.length == 24 && audio.length == 8)
    assert(images.map(_.format).toSet == Set("ppm", "bmp"))
    images.foreach { d =>
      assert(d.width >= 8 && d.height >= 6 && d.channels == 3)
      assert(d.mean_px > 64 && d.mean_px < 192) // uniform-ish LCG bytes
    }
    audio.foreach { d =>
      assert(d.sample_rate == 8000 && d.n_samples == 800L)
      assert(d.rms > 0.0)
    }
  }

  test("resize to the source size is the identity on the raster") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    import graft.pipeline.Multimodal.MediaRecord
    val rgb = Array.tabulate(4 * 3 * 3)(i => (i * 7 % 251).toByte)
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "image", Multimodal.Ppm.encode(4, 3, rgb)),
      MediaRecord(2L, "image", Multimodal.Bmp.encode(4, 3, rgb))))
    val out = Multimodal.resizeImages(media, 4, 3).collect().sortBy(_.media_id)
    assert(out.length == 2 && out.forall(r => r.width == 4 && r.height == 3))
    // both re-encode as P6 of the SAME raster — BMP's padding gone
    val expect = Multimodal.Ppm.encode(4, 3, rgb)
    out.foreach(r => assert(r.payload.sameElements(expect),
      s"media ${r.media_id} raster changed under identity resize"))
  }

  test("2x nearest-neighbor downscale picks exactly the floor-mapped source pixels") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    import graft.pipeline.Multimodal.MediaRecord
    // gradient raster: pixel (x, y) has value (10x, 20y, x+y) — closed form
    val w = 8; val h = 6
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      rgb((y * w + x) * 3) = (10 * x).toByte
      rgb((y * w + x) * 3 + 1) = (20 * y).toByte
      rgb((y * w + x) * 3 + 2) = (x + y).toByte
    }
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "image", Multimodal.Ppm.encode(w, h, rgb))))
    val r = Multimodal.resizeImages(media, 4, 3).collect().head
    val (rw, rh, _, off) = Multimodal.Ppm.header(r.payload)
    assert(rw == 4 && rh == 3)
    for (y <- 0 until 3; x <- 0 until 4) {
      // src = dst * srcDim / outDim = exactly (2x, 2y) here
      assert(r.payload(off + (y * 4 + x) * 3) == (10 * 2 * x).toByte)
      assert(r.payload(off + (y * 4 + x) * 3 + 1) == (20 * 2 * y).toByte)
      assert(r.payload(off + (y * 4 + x) * 3 + 2) == (2 * x + 2 * y).toByte)
    }
  }

  test("upscale duplicates source pixels; output size is outW*outH regardless of input") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    import graft.pipeline.Multimodal.MediaRecord
    val rgb = Array.tabulate(2 * 2 * 3)(i => (40 * i).toByte)
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "image", Multimodal.Ppm.encode(2, 2, rgb))))
    val r = Multimodal.resizeImages(media, 4, 4).collect().head
    val (rw, rh, c, off) = Multimodal.Ppm.header(r.payload)
    assert(rw == 4 && rh == 4 && c == 3)
    assert(r.payload.length == off + 4 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4; ch <- 0 until 3) {
      val expect = rgb(((y / 2) * 2 + (x / 2)) * 3 + ch)
      assert(r.payload(off + (y * 4 + x) * 3 + ch) == expect,
        s"pixel ($x,$y) ch $ch must copy source (${x / 2},${y / 2})")
    }
  }
}
