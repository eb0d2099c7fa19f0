package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps
import graft.sources.Tables

/** Module F spec — the plumbing is real (schema, payload bytes,
  * partition-wise decode, determinism); only the decoder is fake.
  */
class MultimodalOpsSpec extends SparkSpec {

  test("f1 schema is the typed metadata contract") {
    val got = MultimodalOps.multimodalMeta(spark, sf)
    assert(got.schema.fieldNames.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "width", "height",
          "channels", "duration_ms", "checksum"))
  }

  test("f1 covers every document, n_bytes = utf8 length, deterministic") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = MultimodalOps.multimodalMeta(spark, sf).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bytes") == t.getBytes("UTF-8").length)
    }
    // determinism across runs (and across the repartitioned plan —
    // decode output must not depend on partitioning)
    val again = MultimodalOps.mediaTable(spark, sf).repartition(7)
    val sp = spark; import sp.implicits._
    val reGot = again.as[MultimodalOps.MediaRecord]
      .mapPartitions(_.map(identity))
    assert(reGot.count() == texts.size)
    val checksums1 = got.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("checksum")).toMap
    val got2 = MultimodalOps.multimodalMeta(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("checksum")).toMap
    assert(checksums1 == got2)
  }

  test("f2 frame sampling: counts bounded, covers every doc, deterministic") {
    val got = MultimodalOps.frameSample(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(got.length == nDocs)
    got.foreach { r =>
      val n = r.getAs[Long]("n_frames")
      assert(n >= 1 && n <= 16)
      assert(r.getAs[Long]("last_frame_ms") == (n - 1) * 1000L)
    }
    val again = MultimodalOps.frameSample(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_feat0")).toMap
    got.foreach(r =>
      assert(again(r.getAs[Long]("doc_id")) == r.getAs[Double]("avg_feat0")))
  }

  test("f3 metadata-document join: groups cover the corpus, byte totals match") {
    val got = MultimodalOps.mediaByLang(spark, sf).collect()
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // every document lands in exactly one (lang, media_type) group
    assert(got.map(_.getAs[Long]("n_media")).sum == docs.length)
    // per-lang byte totals equal utf8 text lengths (decode preserves
    // the payload byte count)
    val gotBytesByLang = got.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(_.getAs[Long]("total_bytes")).sum).toMap
    val expBytesByLang = docs.groupBy(_._2)
      .view.mapValues(_.map(_._3.getBytes("UTF-8").length.toLong).sum).toMap
    assert(gotBytesByLang == expBytesByLang)
  }

  test("f4 audio windows: only audio docs, bounded overlapping grid, deterministic") {
    val got = MultimodalOps.audioWindows(spark, sf).collect()
    val audioIds = MultimodalOps.mediaTable(spark, sf)
      .filter(col("media_type") === "audio")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exactly the audio subset crosses the decode boundary
    assert(got.map(_.getAs[Long]("doc_id")).toSet == audioIds)
    assert(got.nonEmpty)
    // duration→window-count arithmetic: n = min((dur-win)/hop+1, cap)
    val durs = MultimodalOps.multimodalMeta(spark, sf)
      .filter(col("media_type") === "audio")
      .select("doc_id", "duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expN = math.min((math.max(durs(id), 1000L) - 1000L) / 500L + 1L, 32L)
      assert(r.getAs[Long]("n_windows") == expN, s"doc $id window count")
      assert(r.getAs[Double]("peak_rms") >= r.getAs[Double]("avg_rms"))
      assert(r.getAs[Int]("peak_window") < expN)
    }
    // deterministic across runs and partitionings
    val again = MultimodalOps.audioWindows(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("peak_rms")).toMap
    got.foreach(r =>
      assert(again(r.getAs[Long]("doc_id")) == r.getAs[Double]("peak_rms")))
  }

  test("f5 resize: aspect preserved, fits inside the box, never upscales") {
    val got = MultimodalOps.resizeImages(spark, sf).collect()
    val imageIds = MultimodalOps.mediaTable(spark, sf)
      .filter(col("media_type") === "image")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_.getAs[Long]("doc_id")).toSet == imageIds)
    assert(got.nonEmpty)
    got.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(ow <= 256 && oh <= 256, s"doc ${r.getAs[Long]("doc_id")} overflows box")
      assert(ow <= w && oh <= h, "must never upscale")
      // aspect preserved to within the floor rounding of one pixel
      assert(math.abs(ow.toDouble / w - oh.toDouble / h) <=
        1.0 / math.min(w, h) + 1e-9, s"aspect drift on ${r}")
      assert(r.getAs[Long]("est_bytes") == ow.toLong * oh.toLong * 3L)
      // an image already inside the box is untouched
      if (w <= 256 && h <= 256) assert(ow == w && oh == h)
    }
  }

  test("f1 modality tags partition the corpus into the three media types") {
    val types = MultimodalOps.multimodalMeta(spark, sf)
      .groupBy("media_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types.keySet.subsetOf(Set("image", "audio", "video")))
    assert(types.values.sum == Tables.documents(spark, sf).count())
    // image records carry dimensions, audio carries duration
    val img = MultimodalOps.multimodalMeta(spark, sf)
      .filter(col("media_type") === "image")
    if (img.count() > 0) {
      assert(img.filter(col("width") < 16 || col("height") < 16).count() == 0)
    }
  }

  /** Minimal PCM WAV: 44-byte canonical header + silence. */
  private def wavBytes(sampleRate: Int, channels: Int, bits: Int,
                       nSamples: Int): Array[Byte] = {
    val bytesPerFrame = channels * bits / 8
    val dataLen = nSamples * bytesPerFrame
    val byteRate = sampleRate * bytesPerFrame
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(byteRate)
      .putShort(bytesPerFrame.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    b.array()
  }

  test("real WAV payloads decode through the header parser, not the stub") {
    import graft.operators.MultimodalOps.{MediaRecord, decode, decodeWav}
    // 1 s of 8 kHz mono 16-bit: duration must be EXACT, not hash-fake
    val oneSec = wavBytes(8000, 1, 16, 8000)
    val m = decode(MediaRecord(1L, "audio", oneSec))
    assert(m.media_type == "audio" && m.channels == 1 &&
      m.duration_ms == 1000L && m.n_bytes == oneSec.length)
    // stereo half-second at 44.1 kHz
    val half = decode(MediaRecord(2L, "video", wavBytes(44100, 2, 16, 22050)))
    assert(half.channels == 2 && half.duration_ms == 500L &&
      half.media_type == "audio")   // sniffing overrides the wrong tag
    // malformed inputs fall back to the stub, never throw
    assert(decodeWav(3L, oneSec.take(20)).isEmpty)        // truncated header
    assert(decodeWav(4L, "RIFFxxxxJUNK".getBytes ++ new Array[Byte](40)).isEmpty)
    val garbled = oneSec.clone(); garbled(38) = 'X'.toByte // breaks "data" tag
    assert(decodeWav(5L, garbled).isEmpty)
    // the dispatch on a garbled WAV falls to the stub (hash-derived
    // duration floor is 1000) without throwing
    assert(decode(MediaRecord(6L, "audio", garbled)).checksum != 0L)

    // UNTRUSTED chunk lengths (round-12 advice): a corrupt 32-bit
    // length must route to None — not stall the walk (0xFFFFFFF8 →
    // len.toInt = -8 kept `off` from advancing: infinite executor
    // loop pre-fix) and not throw out of tag() on a negative offset
    import graft.operators.MultimodalOps.wavPcm16
    def corrupt(len: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put("WAVE".getBytes("US-ASCII"))
        .put("junk".getBytes("US-ASCII")).putInt(len)
      b.array()
    }
    for (len <- Seq(0xFFFFFFF8, -1, Int.MinValue, Int.MaxValue, 1 << 20)) {
      assert(decodeWav(7L, corrupt(len)).isEmpty, s"decodeWav len=$len")
      assert(wavPcm16(corrupt(len)).isEmpty, s"wavPcm16 len=$len")
    }
    // a zero-length foreign chunk still advances past (walk continues
    // to the real fmt/data) — the guard must not over-reject
    val padded = {
      val real = wavBytes(8000, 1, 16, 100)
      val b = java.nio.ByteBuffer.allocate(real.length + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(real, 0, 12)                                  // RIFF..WAVE
        .put("pad ".getBytes("US-ASCII")).putInt(0)       // empty chunk
        .put(real, 12, real.length - 12)
      b.array()
    }
    assert(decodeWav(8L, padded).exists(_.duration_ms > 0))
    assert(wavPcm16(padded).isDefined)

    // BMP arm: exact dimensions, top-down (negative height) normalized,
    // malformed rejected
    import graft.operators.MultimodalOps.decodeBmp
    def bmpBytes(w: Int, h: Int, bpp: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(54)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54).putShort(0).putShort(0)
        .putInt(54)                       // pixel data offset
        .putInt(40)                       // BITMAPINFOHEADER size
        .putInt(w).putInt(h)
        .putShort(1.toShort).putShort(bpp.toShort)
      b.array()
    }
    val bmp = decode(MediaRecord(20L, "video", bmpBytes(640, 480, 24)))
    assert(bmp.media_type == "image" && bmp.width == 640 &&
      bmp.height == 480 && bmp.channels == 3 && bmp.duration_ms == 0L)
    val topDown = decode(MediaRecord(21L, "image", bmpBytes(100, -200, 32)))
    assert(topDown.width == 100 && topDown.height == 200 && topDown.channels == 4)
    assert(decodeBmp(22L, bmpBytes(640, 480, 24).take(40)).isEmpty)
    assert(decodeBmp(23L, "BMnotreally".getBytes ++ new Array[Byte](60)).isEmpty)

    // PNG arm: big-endian IHDR dimensions, channel count from the
    // color type, malformed rejected
    import graft.operators.MultimodalOps.decodePng
    def pngBytes(w: Int, h: Int, colorType: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(33)   // sig + IHDR chunk
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
        .putInt(13).put("IHDR".getBytes("US-ASCII"))
        .putInt(w).putInt(h)
        .put(8.toByte).put(colorType.toByte)     // bit depth, color type
        .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
        .putInt(0)                               // CRC (not validated)
      b.array()
    }
    val png = decode(MediaRecord(30L, "video", pngBytes(1920, 1080, 6)))
    assert(png.media_type == "image" && png.width == 1920 &&
      png.height == 1080 && png.channels == 4 && png.duration_ms == 0L)
    assert(decode(MediaRecord(31L, "image", pngBytes(16, 32, 0))).channels == 1)
    assert(decodePng(32L, pngBytes(16, 32, 2).take(20)).isEmpty)   // truncated
    assert(decodePng(33L, pngBytes(0, 32, 2)).isEmpty)             // zero width
    val badType = pngBytes(16, 32, 2); badType(25) = 7.toByte
    assert(decodePng(34L, badType).isEmpty)                        // bad color type
    val badDepth = pngBytes(16, 32, 2); badDepth(24) = 3.toByte
    assert(decodePng(35L, badDepth).isEmpty)          // 3 is never PNG-legal
    val badCombo = pngBytes(16, 32, 2); badCombo(24) = 4.toByte
    assert(decodePng(36L, badCombo).isEmpty)          // truecolor@4 illegal
    assert(decodePng(37L, pngBytes(16, 32, 0)).nonEmpty)  // gray@8 legal

    // and through the FULL mapPartitions pipeline shape, mixed with a
    // stub-decoded payload — the seam a real codec swap exercises
    val spark2 = spark; import spark2.implicits._
    val mixed = Seq(
      MediaRecord(10L, "audio", oneSec),
      MediaRecord(11L, "audio", "not a wav at all".getBytes("UTF-8")))
      .toDS()
      .mapPartitions(_.map(decode))
      .collect().map(r => r.doc_id -> r).toMap
    assert(mixed(10L).duration_ms == 1000L && mixed(10L).channels == 1)
    assert(mixed(11L).duration_ms >= 1000L)   // stub's hash-derived arm
  }

  test("jpeg arm: SOF marker parse on real encoder output") {
    import graft.operators.MultimodalOps.{MediaRecord, decode, decodeJpeg}
    def encodeJpg(w: Int, h: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        im.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "jpg", bos), "no jpg writer")
      bos.toByteArray
    }
    // a real JFIF stream (APP0 + quant/huffman tables before the SOF):
    // the marker walk must skip the length-prefixed segments and read
    // exact dimensions from the frame header
    val jb = encodeJpg(512, 384)
    assert(jb(0) == 0xFF.toByte && jb(1) == 0xD8.toByte)
    val meta = decode(MediaRecord(40L, "video", jb))
    assert(meta.media_type == "image" && meta.width == 512 &&
      meta.height == 384 && meta.channels == 3 && meta.duration_ms == 0L)
    // truncation BEFORE the SOF marker (keep only SOI + APP0 prefix)
    assert(decodeJpeg(41L, jb.take(8)).isEmpty)
    // EOI immediately after SOI: syntactically a JPEG, but no frame
    assert(decodeJpeg(42L, Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
    // text bytes are not a JPEG
    assert(decodeJpeg(43L, "just text".getBytes("UTF-8")).isEmpty)
    // a hand-built minimal stream: SOI, one RST (standalone, no
    // length), a COM segment, then SOF0 — exercises every walk arm
    val sof = Array[Int](0xFF, 0xD8, 0xFF, 0xD0, 0xFF, 0xFE, 0x00, 0x04,
      0x61, 0x62, 0xFF, 0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x01, 0x00, 0x02,
      0x00, 0x01, 0x11, 0x00).map(_.toByte)
    val hand = decodeJpeg(44L, sof).get
    assert(hand.width == 512 && hand.height == 256 && hand.channels == 1)
  }

  test("f6 aHash real arm: stable under mild noise, far under inversion, declines non-images") {
    import graft.operators.MultimodalOps.aHash64
    // bimodal test image: left half dark, right half bright — every
    // 8x8 cell sits far from the global mean, so the hash is robust
    def encodePng(perturb: Boolean, invert: Boolean): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) {
        val bright0 = x >= 32
        val bright = if (invert) !bright0 else bright0
        val base = if (bright) 220 else 30
        val v = if (perturb) math.min(255, base + ((x * 7 + y * 3) % 5))
                else base
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "png", bos))
      bos.toByteArray
    }
    val a  = encodePng(perturb = false, invert = false)
    val a2 = encodePng(perturb = true,  invert = false)
    val b  = encodePng(perturb = false, invert = true)
    assert(!java.util.Arrays.equals(a, a2), "perturbed copy must differ in bytes")
    val (ha, ha2, hb) = (aHash64(a).get, aHash64(a2).get, aHash64(b).get)
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(aHash64(a).get == ha, "deterministic")
    assert(hamming(ha, ha2) <= 3, s"noised copy too far: ${hamming(ha, ha2)}")
    assert(hamming(ha, hb) > 3, s"inverted image too close: ${hamming(ha, hb)}")
    // non-image payloads decline (sniff) and malformed sniffed bytes decline (reader)
    assert(aHash64("just text".getBytes("UTF-8")).isEmpty)
    assert(aHash64(a.take(20)).isEmpty)
  }

  test("f6 end-to-end: real near-dup PNGs pair up, the stub arm carries text payloads") {
    import graft.operators.MultimodalOps.{MediaRecord, imageNearDupFrom, aHash64}
    def encodePng(seed: Int, perturb: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) {
        val bright = (if (seed == 0) x >= 32 else x < 32)
        val base = if (bright) 220 else 30
        val v = math.min(255, base + (if (perturb > 0) (x * 7 + y * 3) % perturb else 0))
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "png", bos))
      bos.toByteArray
    }
    val spark2 = spark; import spark2.implicits._
    val media = Seq(
      MediaRecord(1L, "image", encodePng(0, 0)),
      MediaRecord(2L, "image", encodePng(0, 5)),          // near-dup of 1
      MediaRecord(3L, "image", encodePng(1, 0)),          // inverted: far
      MediaRecord(4L, "image", "alpha beta gamma".getBytes("UTF-8")),
      MediaRecord(5L, "image", "totally unrelated words here".getBytes("UTF-8")))
      .toDS().toDF()
    val rows = imageNearDupFrom(media, bucketCap = 64, maxHamming = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 5)
    assert(rows(1L).getAs[Boolean]("is_neardup") &&
           rows(1L).getAs[Long]("dup_of") == 2L)
    assert(rows(2L).getAs[Boolean]("is_neardup") &&
           rows(2L).getAs[Long]("dup_of") == 1L)
    assert(!rows(3L).getAs[Boolean]("is_neardup"))
    // the real arm produced doc 1's hash; the stub carried doc 4
    assert(rows(1L).getAs[Long]("phash") == aHash64(encodePng(0, 0)).get)
    assert(!rows(4L).getAs[Boolean]("is_neardup"))
  }

  test("f5 real-pixel arm: ImageIO PNG/BMP decode + resize end-to-end") {
    import graft.operators.MultimodalOps.{MediaRecord, resizePixels, resizedFrom}
    // real encoded images, produced by the same public JVM API the
    // decode arm uses (deterministic synthetic pixels)
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        im.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    // direct arm: geometry computed from TRUE decoded dimensions and
    // applied to real pixels (640x400 fits 256 at scale 0.4 -> 256x160)
    val big = encode("png", 640, 400)
    val r = resizePixels(1L, big, 256, 256).get
    assert(r.width == 640 && r.height == 400)
    assert(r.out_w == 256 && r.out_h == 160)
    assert(r.est_bytes == 256L * 160L * 3L)
    // a recognized image already inside the box is untouched
    val small = resizePixels(2L, encode("bmp", 100, 50), 256, 256).get
    assert(small.out_w == 100 && small.out_h == 50 && small.scale == 1.0)
    // JPEG through the same ImageIO arm: true decoded dimensions
    // (lossy pixels, exact geometry), real bilinear rescale
    val jpg = resizePixels(4L, encode("jpg", 512, 384), 256, 256).get
    assert(jpg.width == 512 && jpg.height == 384)
    assert(jpg.out_w == 256 && jpg.out_h == 192)
    assert(jpg.est_bytes == 256L * 192L * 3L)
    // a sniffed-but-truncated JPEG must fall to the stub arm, not throw
    assert(resizePixels(5L, encode("jpg", 64, 64).take(20), 256, 256).isEmpty)
    // text bytes are not an image: the real arm must decline
    assert(resizePixels(3L, "just text".getBytes("UTF-8"), 256, 256).isEmpty)
    // end-to-end through the Spark mapPartitions resize stage, real
    // PNG + real BMP + real JPEG + stub-decoded text in one Dataset
    val spark2 = spark; import spark2.implicits._
    val rows = resizedFrom(Seq(
        MediaRecord(1L, "image", big),
        MediaRecord(2L, "image", encode("bmp", 100, 50)),
        MediaRecord(3L, "image", "just text".getBytes("UTF-8")),
        MediaRecord(4L, "image", encode("jpg", 512, 384))).toDS(),
        256, 256)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Int]("out_w") == 256 &&
           rows(1L).getAs[Int]("out_h") == 160)
    assert(rows(2L).getAs[Int]("out_w") == 100 &&
           rows(2L).getAs[Int]("out_h") == 50)
    assert(rows(3L).getAs[Int]("width") > 0)   // stub arm took the text
    assert(rows(4L).getAs[Int]("out_w") == 256 &&
           rows(4L).getAs[Int]("out_h") == 192)
  }

  test("f8 real arm: delta-sign fingerprint — noised copy within radius, different profile far") {
    import graft.operators.MultimodalOps.{MediaRecord, audioFingerprint, wavPcm16}
    // 1000 Hz mono 16-bit PCM, amplitude constant per 500 ms block
    // (500 samples), alternating-sign samples so block rms == A/32768.
    // Window i spans blocks (i, i+1); rms delta sign = sign of
    // B(i+2)² − B(i)², so a known amp sequence pins known bits.
    def toneWav(blockAmps: Array[Int], jitter: Int, seed: Long): Array[Byte] = {
      val nSamples = blockAmps.length * 500
      val dataLen = nSamples * 2
      val b = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort).putShort(1.toShort)
        .putInt(1000).putInt(2000).putShort(2.toShort).putShort(16.toShort)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var st = seed
      blockAmps.foreach { a =>
        (0 until 500).foreach { k =>
          st = st * 6364136223846793005L + 1442695040888963407L
          val j = if (jitter == 0) 0 else ((st >>> 33) % (2 * jitter + 1)).toInt - jitter
          val amp = math.max(0, math.min(32767, a + j))
          b.putShort((if (k % 2 == 0) amp else -amp).toShort)
        }
      }
      b.array()
    }
    // 73 blocks → 36.5 s → the full 65-window grid; amps well-separated
    // (≥500 apart) so ±100 jitter can never flip a delta sign
    val rnd = new scala.util.Random(42)
    val amps = rnd.shuffle((0 until 73).map(i => 2000 + i * 400).toVector).toArray
    val base = toneWav(amps, 0, 1L)
    val noisy = toneWav(amps, 100, 99L)
    val other = toneWav(amps.reverse, 0, 1L)
    assert(wavPcm16(base).isDefined, "real PCM16 arm must engage")
    val fb = audioFingerprint(MediaRecord(1L, "audio", base), 1000L, 500L, 65)
    val fn = audioFingerprint(MediaRecord(2L, "audio", noisy), 1000L, 500L, 65)
    val fo = audioFingerprint(MediaRecord(3L, "audio", other), 1000L, 500L, 65)
    assert(fb.n_windows == 65 && fn.n_windows == 65)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fb.afp, fn.afp) <= 3,
      s"noised copy drifted to hamming ${ham(fb.afp, fn.afp)}")
    assert(ham(fb.afp, fo.afp) > 3,
      "a reversed energy profile must land outside the near-dup radius")
    // amplitude scaling (volume change) preserves every delta sign —
    // 1.05× keeps the loudest block under 16-bit full scale (clipping
    // would saturate distinct blocks to equal amplitude and genuinely
    // erase their delta, which is signal loss, not fingerprint error)
    val loud = toneWav(amps.map(a => (a * 1.05).toInt), 0, 1L)
    val fl = audioFingerprint(MediaRecord(4L, "audio", loud), 1000L, 500L, 65)
    assert(ham(fb.afp, fl.afp) <= 3, "volume scaling broke the fingerprint")
  }

  test("f8 query invariants on the corpus: verdicts, eligibility gate, symmetry") {
    import graft.operators.MultimodalOps
    val out = MultimodalOps.audioNearDup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_neardup") == !r.isNullAt(r.fieldIndex("dup_of")))
      // short docs carry too few delta bits — never labeled near-dup
      if (r.getAs[Int]("n_windows") < 33)
        assert(!r.getAs[Boolean]("is_neardup"),
          s"sub-threshold doc ${r.getAs[Long]("doc_id")} got a verdict")
    }
    // every dup_of partner is itself a near-dup row (bidirectional)
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    out.filter(_.getAs[Boolean]("is_neardup")).foreach { r =>
      val p = byId(r.getAs[Long]("dup_of"))
      assert(p.getAs[Boolean]("is_neardup"),
        s"partner ${p.getAs[Long]("doc_id")} not marked near-dup")
    }
  }
}
