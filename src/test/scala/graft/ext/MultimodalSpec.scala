package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary plumbing: features are deterministic functions of payload") {
    val docs = Seq((1L, "aaaa"), (2L, "abcd"), (3L, "")).toDF("doc_id", "text")
    val assets = Multimodal.assetsFromBinary(docs, "doc_id", "text", "image")
    assert(assets.schema("payload").dataType.typeName == "binary")
    val f = Multimodal.extractFeatures(assets, parallelism = 2)
      .collect().map(m => m.asset_id -> m).toMap
    assert(f(1L).n_bytes == 4 && f(1L).byte_entropy == 0.0) // single symbol
    assert(f(2L).n_bytes == 4 && math.abs(f(2L).byte_entropy - 2.0) < 1e-12) // 4 distinct
    assert(f(1L).mean_byte == 'a'.toInt.toDouble)
    assert(f(3L).n_bytes == 0 && f(3L).frame_count == 0)
  }

  test("frame sampling stride depends on media type") {
    val payload = Array.fill(10000)('x'.toByte)
    val video = Multimodal.extractFeatures(
      Multimodal.assetsFromBinary(
        Seq((1L, new String(payload))).toDF("doc_id", "text"), "doc_id", "text", "video"))
      .collect().head
    assert(video.frame_count == 3) // ceil(10000 / 4096)
    val audio = Multimodal.extractFeatures(
      Multimodal.assetsFromBinary(
        Seq((1L, new String(payload))).toDF("doc_id", "text"), "doc_id", "text", "audio"))
      .collect().head
    assert(audio.frame_count == 10) // ceil(10000 / 1024)
  }

  test("decode runs distributed over repartitioned assets") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val assets = Multimodal.assetsFromBinary(docs, "doc_id", "text", "image")
    val out = Multimodal.extractFeatures(assets, parallelism = 4)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.count() == docs.count())
  }

  test("codec lifecycle: open per partition, bounded batches, close always runs") {
    CountingCodec.reset()
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val assets = Multimodal.assetsFromBinary(docs, "doc_id", "text", "image")
    val viaTrait = Multimodal.extractFeatures(assets, () => CountingCodec,
        parallelism = 4, batchSize = 8)
      .collect().map(m => m.asset_id -> m.byte_entropy).toMap
    assert(CountingCodec.opens.get() == 4, "one open per partition")
    assert(CountingCodec.closes.get() == 4, "close must run for every task")
    assert(CountingCodec.maxBatch.get() <= 8, "batches bounded by batchSize")
    assert(CountingCodec.batches.get() >= (docs.count() / 8).toInt, "work arrived in batches")
    // decoding through the trait produces the stub path's features
    val direct = Multimodal.extractFeatures(assets, parallelism = 4)
      .collect().map(m => m.asset_id -> m.byte_entropy).toMap
    assert(viaTrait == direct)
    // close still runs when the consumer stops early (limit)
    CountingCodec.reset()
    Multimodal.extractFeatures(assets, () => CountingCodec, parallelism = 2).limit(3).collect()
    assert(CountingCodec.closes.get() == CountingCodec.opens.get(),
      "early termination must still close every opened codec")
  }
  // --- real WAV codec -------------------------------------------------

  test("WAV round-trip: encode → decode reproduces rate, channels, samples exactly") {
    val samples = Array.tabulate(100)(i => ((i * 997) % 65536 - 32768).toShort)
    val bytes = Multimodal.encodeWavPcm16(samples, 44100)
    val (rate, ch, out) = Multimodal.decodeWavPcm16(bytes)
    assert(rate == 44100 && ch == 1)
    assert(out.toSeq == samples.toSeq)
    // stereo: interleaved samples survive, channel count parsed
    val st = Multimodal.encodeWavPcm16(samples, 8000, channels = 2)
    val (r2, c2, o2) = Multimodal.decodeWavPcm16(st)
    assert(r2 == 8000 && c2 == 2 && o2.toSeq == samples.toSeq)
  }

  test("WAV decode: skips unknown chunks (LIST before data), rejects non-PCM and truncation") {
    val samples = Array[Short](1, -1, 32767, -32768)
    val plain = Multimodal.encodeWavPcm16(samples, 16000)
    // splice a LIST chunk (odd size → padded) between WAVE and fmt
    val extra = {
      val info = "LIST".getBytes("US-ASCII") ++
        Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
      val bb = java.nio.ByteBuffer.allocate(plain.length + info.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(plain, 0, 12)      // RIFF + size + WAVE
      bb.put(info)
      bb.put(plain, 12, plain.length - 12)
      bb.array()
    }
    val (rate, ch, out) = Multimodal.decodeWavPcm16(extra)
    assert(rate == 16000 && ch == 1 && out.toSeq == samples.toSeq)
    // non-PCM format code rejected
    val nonPcm = plain.clone()
    nonPcm(20) = 3 // format tag offset in canonical layout: IEEE float
    intercept[IllegalArgumentException] { Multimodal.decodeWavPcm16(nonPcm) }
    // truncation rejected
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16(java.util.Arrays.copyOfRange(plain, 0, 50))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16("not a wav at all, just some text padding".getBytes)
    }
  }

  test("WAV decode: fmt after data is accepted; odd data length fails loud") {
    val samples = Array[Short](5, -5, 100, -100)
    val plain = Multimodal.encodeWavPcm16(samples, 22050)
    // canonical layout is RIFF(12) fmt(8+16) data(8+n) — rebuild with
    // the chunks swapped: RIFF, data, fmt (legal RIFF, non-canonical)
    val fmtChunk = java.util.Arrays.copyOfRange(plain, 12, 12 + 24)
    val dataChunk = java.util.Arrays.copyOfRange(plain, 36, plain.length)
    val swapped = java.util.Arrays.copyOfRange(plain, 0, 12) ++ dataChunk ++ fmtChunk
    val (rate, ch, out) = Multimodal.decodeWavPcm16(swapped)
    assert(rate == 22050 && ch == 1 && out.toSeq == samples.toSeq)
    // odd data-chunk length: malformed for PCM16 — must raise, not
    // silently truncate the trailing byte
    val odd = plain.clone()
    val dataLenOff = 40 // RIFF(12) + fmt(24) + "data" tag(4)
    odd(dataLenOff) = (samples.length * 2 - 1).toByte
    val e = intercept[IllegalArgumentException] { Multimodal.decodeWavPcm16(odd) }
    assert(e.getMessage.contains("odd"))
  }

  test("extractAudioFeatures: decoded features match a driver-side reference") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val docs = (0L until 40L).map { id =>
      val n = 1 + rng.nextInt(50)
      id -> Array.fill(n)((rng.nextInt(65536) - 32768).toShort)
    }
    val assets = docs.map { case (id, s) =>
      (id, Multimodal.encodeWavPcm16(s, 8000))
    }.toDF("asset_id", "payload")
    val got = Multimodal.extractAudioFeatures(assets, batchSize = 7)
      .collect().map(f => f.asset_id -> f).toMap
    docs.foreach { case (id, s) =>
      val f = got(id)
      assert(f.sample_rate == 8000 && f.n_channels == 1)
      assert(f.n_samples == s.length.toLong, s"asset $id")
      assert(f.peak_abs == s.map(v => math.abs(v.toLong)).max, s"asset $id")
      assert(f.sum_sq == s.map(v => v.toLong * v.toLong).sum, s"asset $id")
    }
  }

  // --- unified real-first decode ---------------------------------------

  test("extractDecoded: real audio + real image decode, stub only for undecodable types") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val audio = (0L until 10L).map { id =>
      val s = Array.fill(5 + rng.nextInt(20))((rng.nextInt(65536) - 32768).toShort)
      (id, "audio", Multimodal.encodeWavPcm16(s, 8000), s)
    }
    val images = (100L until 110L).map { id =>
      val (w, h) = (1 + rng.nextInt(4), 1 + rng.nextInt(4))
      val px = Array.fill(3 * w * h)(rng.nextInt(256).toByte)
      (id, "image", Multimodal.encodePpm(w, h, px), (w, h, px))
    }
    val vids = (200L until 205L).map { id =>
      val b = Array.fill(1 + rng.nextInt(30))(rng.nextInt(256).toByte)
      (id, "video", b)
    }
    val assets = (audio.map(a => (a._1, a._2, a._3)) ++
      images.map(i => (i._1, i._2, i._3)) ++ vids)
      .toDF("asset_id", "media_type", "payload")
    val got = Multimodal.extractDecoded(assets, batchSize = 7)
      .collect().map(f => f.asset_id -> f).toMap
    audio.foreach { case (id, _, bytes, s) =>
      val f = got(id)
      assert(f.media_type == "audio" && f.n_bytes == bytes.length.toLong)
      assert(f.n_units == s.length.toLong && f.dim_a == 8000L && f.dim_b == 1L)
      assert(f.feat_a == s.map(v => math.abs(v.toLong)).max)
      assert(f.feat_b == s.map(v => v.toLong * v.toLong).sum)
      assert(f.feat_c == s.map(_.toLong).sum)
    }
    images.foreach { case (id, _, bytes, (w, h, px)) =>
      val f = got(id)
      assert(f.media_type == "image" && f.n_bytes == bytes.length.toLong)
      assert(f.n_units == (w * h).toLong && f.dim_a == w.toLong && f.dim_b == h.toLong)
      def chan(o: Int) = px.indices.filter(_ % 3 == o).map(i => (px(i) & 0xff).toLong).sum
      assert((f.feat_a, f.feat_b, f.feat_c) == ((chan(0), chan(1), chan(2))))
    }
    vids.foreach { case (id, _, b) =>
      val f = got(id)
      assert(f.media_type == "video" && f.n_units == b.length.toLong)
      assert(f.feat_a == b.map(x => (x & 0xff).toLong).max)
      assert(f.feat_b == b.map(x => (x & 0xff).toLong).sum && f.feat_c == 0L)
    }
    // the audio/image lanes REALLY parse: malformed payloads fail loud
    // instead of degrading to byte features
    intercept[Exception] {
      Seq((1L, "audio", "not a wav".getBytes)).toDF("asset_id", "media_type", "payload")
        .transform(df => Multimodal.extractDecoded(df)).collect()
    }
    intercept[Exception] {
      Seq((1L, "image", "not a ppm".getBytes)).toDF("asset_id", "media_type", "payload")
        .transform(df => Multimodal.extractDecoded(df)).collect()
    }
  }

  // --- real PPM codec -------------------------------------------------

  test("PPM round-trip: header comments parsed, pixel sums exact, rejects handled") {
    val (w, h) = (5, 3)
    val px = Array.tabulate(w * h * 3)(i => ((i * 31) % 256).toByte)
    val bytes = Multimodal.encodePpm(w, h, px)
    val (dw, dh, dp) = Multimodal.decodePpm(bytes)
    assert(dw == w && dh == h && dp.toSeq == px.toSeq)
    val f = Multimodal.ppmFeatures(9L, bytes)
    val idx = px.indices
    assert(f.width == w && f.height == h)
    assert(f.sum_r == idx.filter(_ % 3 == 0).map(i => (px(i) & 0xff).toLong).sum)
    assert(f.sum_g == idx.filter(_ % 3 == 1).map(i => (px(i) & 0xff).toLong).sum)
    assert(f.sum_b == idx.filter(_ % 3 == 2).map(i => (px(i) & 0xff).toLong).sum)
    // netpbm comments inside the header
    val commented = ("P6\n# a comment line\n5 # trailing\n3\n255\n".getBytes("US-ASCII")) ++ px
    val (cw, chh, cp) = Multimodal.decodePpm(commented)
    assert(cw == 5 && chh == 3 && cp.toSeq == px.toSeq)
    intercept[IllegalArgumentException] { Multimodal.decodePpm("P5\n1 1\n255\n".getBytes ++ Array[Byte](0)) }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 1))
    }
    // a CRLF after maxval would shift every pixel by one — fail loud
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P6\n5 3\n255\r\n".getBytes("US-ASCII") ++ px)
    }
  }

  test("BMP round-trip: row padding, BGR order, bottom-up and top-down, rejects") {
    // width 3 → rowBytes 9 → 3 padding bytes per row: the padded-stride
    // path is exercised, not just the aligned one
    val (w, h) = (3, 2)
    val px = Array.tabulate(w * h * 3)(i => ((i * 47 + 5) % 256).toByte)
    val bytes = Multimodal.encodeBmp24(w, h, px)
    val (dw, dh, dp) = Multimodal.decodeBmp24(bytes)
    assert(dw == w && dh == h && dp.toSeq == px.toSeq,
      "bottom-up padded round-trip must be exact")
    val f = Multimodal.bmpFeatures(3L, bytes)
    val idx = px.indices
    assert(f.sum_r == idx.filter(_ % 3 == 0).map(i => (px(i) & 0xff).toLong).sum)
    assert(f.sum_b == idx.filter(_ % 3 == 2).map(i => (px(i) & 0xff).toLong).sum)
    // top-down variant: negate the height field in place — rows must
    // then read in file order
    val td = bytes.clone()
    val negH = -h
    td(22) = negH.toByte; td(23) = (negH >> 8).toByte
    td(24) = (negH >> 16).toByte; td(25) = (negH >> 24).toByte
    val (_, tdh, tdp) = Multimodal.decodeBmp24(td)
    assert(tdh == h && tdp.toSeq != px.toSeq && tdp.toSeq == {
      // reversing row order of the expected image reproduces it
      val rb = w * 3
      (h - 1 to 0 by -1).flatMap(r => px.slice(r * rb, r * rb + rb)).toSeq
    })
    // rejects: wrong magic, unsupported bpp, truncation — all loud
    intercept[IllegalArgumentException] { Multimodal.decodeBmp24("notabmp".getBytes) }
    val bad = bytes.clone(); bad(28) = 8
    intercept[IllegalArgumentException] { Multimodal.decodeBmp24(bad) }
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp24(java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 1))
    }
    // malformed headers must raise IAE, never decode garbage or crash
    // uncontrolled: offset inside the header region (would read header
    // bytes as pixels), negative offset, and an Int-overflowing width
    def putLe32At(buf: Array[Byte], off: Int, v: Int): Unit = {
      buf(off) = v.toByte; buf(off + 1) = (v >> 8).toByte
      buf(off + 2) = (v >> 16).toByte; buf(off + 3) = (v >> 24).toByte
    }
    val offsetInHeader = bytes.clone(); putLe32At(offsetInHeader, 10, 0)
    intercept[IllegalArgumentException] { Multimodal.decodeBmp24(offsetInHeader) }
    val negOffset = bytes.clone(); putLe32At(negOffset, 10, -1000)
    intercept[IllegalArgumentException] { Multimodal.decodeBmp24(negOffset) }
    val hugeWidth = bytes.clone(); putLe32At(hugeWidth, 18, 0x55555557)
    intercept[IllegalArgumentException] { Multimodal.decodeBmp24(hugeWidth) }
  }

  test("AU round-trip: big-endian PCM16 exact; unknown size; rejects loud") {
    val samples = Array.tabulate(11)(i => ((i * 977 - 4000) % 32768).toShort)
    val bytes = Multimodal.encodeAuPcm16(samples, 16000)
    val (rate, ch, got) = Multimodal.decodeAuPcm16(bytes)
    assert(rate == 16000 && ch == 1 && got.toSeq == samples.toSeq)
    // dataSize 0xFFFFFFFF (unknown) must read to end of payload
    val unk = bytes.clone()
    unk(8) = -1; unk(9) = -1; unk(10) = -1; unk(11) = -1
    assert(Multimodal.decodeAuPcm16(unk)._3.toSeq == samples.toSeq)
    intercept[IllegalArgumentException] { Multimodal.decodeAuPcm16("RIFF".getBytes ++ bytes) }
    val mulaw = bytes.clone(); mulaw(15) = 1 // encoding 1 = 8-bit mu-law
    intercept[IllegalArgumentException] { Multimodal.decodeAuPcm16(mulaw) }
    // dataSize is UNSIGNED: 0x80000000 is a legal huge size that must
    // clamp to the payload, not become a negative array length
    val hugeSize = bytes.clone()
    hugeSize(8) = 0x80.toByte; hugeSize(9) = 0; hugeSize(10) = 0; hugeSize(11) = 0
    assert(Multimodal.decodeAuPcm16(hugeSize)._3.toSeq == samples.toSeq)
  }

  test("RealFirstCodec sniffs the audio container: WAV and AU give the same features") {
    val samples = Array.tabulate(9)(i => ((i * 1213 - 5000) % 32768).toShort)
    val wav = Multimodal.RealFirstCodec.decode(1L, "audio",
      Multimodal.encodeWavPcm16(samples, 8000))
    val au = Multimodal.RealFirstCodec.decode(1L, "audio",
      Multimodal.encodeAuPcm16(samples, 8000))
    assert(wav.n_units == au.n_units && wav.feat_a == au.feat_a &&
      wav.feat_b == au.feat_b && wav.feat_c == au.feat_c &&
      wav.dim_a == au.dim_a && wav.dim_b == au.dim_b,
      "identical samples must decode identically from either container")
    assert(wav.n_bytes == 44 + 2 * samples.length && au.n_bytes == 24 + 2 * samples.length)
  }

  test("RealFirstCodec sniffs the image container: BMP, PPM and PNG through one type") {
    val (w, h) = (4, 2)
    val px = Array.tabulate(w * h * 3)(i => ((i * 13) % 256).toByte)
    val expected = Multimodal.ppmFeatures(0L, Multimodal.encodePpm(w, h, px))
    for (payload <- Seq(Multimodal.encodePpm(w, h, px), Multimodal.encodeBmp24(w, h, px),
        Multimodal.encodePng(w, h, px))) {
      val d = Multimodal.RealFirstCodec.decode(1L, "image", payload)
      assert(d.dim_a == w && d.dim_b == h && d.n_units == w.toLong * h)
      assert(d.feat_a == expected.sum_r && d.feat_b == expected.sum_g &&
        d.feat_c == expected.sum_b,
        "all containers must decode to the SAME pixel features")
    }
  }

  // --- JDK ImageIO codecs (PNG exact, JPEG lossy) ---------------------

  test("PNG round-trip: stored-deflate encode, JDK ImageIO decode, bit-exact; size arithmetic") {
    val (w, h) = (5, 4)
    val px = Array.tabulate(w * h * 3)(i => ((i * 89 + 17) % 256).toByte)
    val bytes = Multimodal.encodePng(w, h, px)
    // the size formula the q36 oracle mirrors: 63 + 5·nblocks + raw
    val raw = h * (1 + 3 * w)
    assert(bytes.length == 63 + 5 * ((raw + 65534) / 65535) + raw,
      "PNG byte length must be the documented arithmetic function of (w, h)")
    assert(Multimodal.isPng(bytes) && !Multimodal.isJpeg(bytes) && !Multimodal.isBmp(bytes))
    // decode through the REAL JDK ImageIO PNG reader — lossless, so the
    // round trip is bit-exact, like PPM/BMP
    val (dw, dh, dp) = Multimodal.decodeImageIo(bytes)
    assert(dw == w && dh == h && dp.toSeq == px.toSeq,
      "PNG round-trip through ImageIO must be exact")
    // multi-block path: raw > 65535 forces >1 stored deflate block
    val (bw, bh) = (200, 120) // raw = 120·601 = 72120 → 2 blocks
    val bpx = Array.tabulate(bw * bh * 3)(i => ((i * 31 + 7) % 256).toByte)
    val big = Multimodal.encodePng(bw, bh, bpx)
    val bigRaw = bh * (1 + 3 * bw)
    assert(big.length == 63 + 5 * ((bigRaw + 65534) / 65535) + bigRaw)
    val (gw, gh, gp) = Multimodal.decodeImageIo(big)
    assert(gw == bw && gh == bh && gp.toSeq == bpx.toSeq,
      "multi-block PNG must round-trip exactly")
    // fail-loud: PNG magic with garbage body raises, never garbage pixels
    intercept[IllegalArgumentException] {
      Multimodal.decodeImageIo(bytes.take(8) ++ Array.fill[Byte](20)(42))
    }
    intercept[IllegalArgumentException] { Multimodal.decodeImageIo(Array[Byte](1, 2, 3)) }
    // a crafted IHDR declaring ~2^30 × 2^30 pixels (valid CRC) must be
    // rejected from the HEADER check, before the decoder can attempt
    // pixel-buffer allocations
    val huge = bytes.clone()
    def putBe32(off: Int, v: Int): Unit = {
      huge(off) = (v >> 24).toByte; huge(off + 1) = (v >> 16).toByte
      huge(off + 2) = (v >> 8).toByte; huge(off + 3) = v.toByte
    }
    putBe32(16, 0x40000000); putBe32(20, 0x40000000) // IHDR width/height
    val crc = new java.util.zip.CRC32
    crc.update(huge, 12, 4 + 13) // chunk type + IHDR data
    putBe32(8 + 4 + 4 + 13, crc.getValue.toInt)
    val t0 = System.nanoTime()
    intercept[IllegalArgumentException] { Multimodal.decodeImageIo(huge) }
    assert((System.nanoTime() - t0) / 1e9 < 2.0,
      "huge-dimension rejection must come from the header parse, not an allocation attempt")
  }

  test("GIF: real ImageIO decode, lossless round-trip for palette-sized color sets") {
    // GIF is palette-indexed: for an image with <= 256 distinct colors
    // the ImageIO round trip is exact, like PNG
    val (w, h) = (6, 5)
    val palette = Array(0x102030, 0x405060, 0x708090, 0xa0b0c0)
    val px = new Array[Byte](w * h * 3)
    for (p <- 0 until w * h) {
      val c = palette(p % palette.length)
      px(p * 3) = ((c >> 16) & 0xff).toByte
      px(p * 3 + 1) = ((c >> 8) & 0xff).toByte
      px(p * 3 + 2) = (c & 0xff).toByte
    }
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (p <- 0 until w * h)
      img.setRGB(p % w, p / w,
        ((px(p * 3) & 0xff) << 16) | ((px(p * 3 + 1) & 0xff) << 8) | (px(p * 3 + 2) & 0xff))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos), "no GIF ImageIO writer")
    val bytes = bos.toByteArray
    assert(Multimodal.isGif(bytes) && !Multimodal.isPng(bytes))
    val (dw, dh, dp) = Multimodal.decodeImageIo(bytes)
    assert(dw == w && dh == h && dp.toSeq == px.toSeq,
      "palette-sized GIF round-trip through ImageIO must be exact")
    // the unified codec sniffs GIF into the ImageIO lane (a GIF payload
    // must never fall through to the netpbm parser)
    val d = Multimodal.RealFirstCodec.decode(3L, "image", bytes)
    assert(d.dim_a == w && d.dim_b == h && d.n_units == w.toLong * h)
  }

  test("JPEG: real ImageIO decode — exact dimensions, bounded pixel error (lossy codec)") {
    val (w, h) = (16, 12)
    // a smooth gradient (JPEG handles it well; hard edges would ring)
    val px = Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      (((p % w) * 8 + (p / w) * 4) % 256).toByte
    }
    val bytes = Multimodal.encodeJpeg(w, h, px)
    assert(Multimodal.isJpeg(bytes), "ImageIO must emit a JFIF/JPEG payload")
    val (dw, dh, dp) = Multimodal.decodeImageIo(bytes)
    assert(dw == w && dh == h, "JPEG dimensions are lossless")
    // lossy: per-pixel error bounded, mean error small
    val errs = px.indices.map(i => math.abs((dp(i) & 0xff) - (px(i) & 0xff)))
    assert(errs.max <= 48, s"per-channel JPEG error too large: ${errs.max}")
    assert(errs.sum.toDouble / errs.size <= 8.0,
      s"mean JPEG error too large: ${errs.sum.toDouble / errs.size}")
    // the unified codec routes JPEG through the real ImageIO lane:
    // dims/pixel-sum features, not stub byte features
    val d = Multimodal.RealFirstCodec.decode(2L, "image", bytes)
    assert(d.dim_a == w && d.dim_b == h && d.n_units == w.toLong * h)
    val sumR = px.indices.filter(_ % 3 == 0).map(i => (dp(i) & 0xff).toLong).sum
    assert(d.feat_a == sumR, "features must come from DECODED pixels")
  }
}

/** Spec fake: counts lifecycle calls through static (JVM-singleton)
  * state — local mode shares the JVM, so executor-side increments are
  * visible to the driver assertions. */
object CountingCodec extends Multimodal.MediaCodec {
  import java.util.concurrent.atomic.AtomicInteger
  val opens = new AtomicInteger
  val closes = new AtomicInteger
  val batches = new AtomicInteger
  val maxBatch = new AtomicInteger
  def reset(): Unit = Seq(opens, closes, batches, maxBatch).foreach(_.set(0))
  override def open(): Unit = opens.incrementAndGet()
  override def close(): Unit = closes.incrementAndGet()
  override def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[Multimodal.MediaFeatures] = {
    batches.incrementAndGet()
    maxBatch.updateAndGet(m => math.max(m, batch.size))
    super.decodeBatch(batch)
  }
  override def decode(assetId: Long, mediaType: String, payload: Array[Byte]): Multimodal.MediaFeatures =
    Multimodal.StubCodec.decode(assetId, mediaType, payload)
}
