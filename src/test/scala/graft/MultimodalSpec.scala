package graft

import graft.sources.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a" * 200), (1L, "b" * 130), (2L, "mixed content 123")
  ).toDF("doc_id", "text")

  test("fixture PNGs decode back to the md5-derived pixels") {
    val media = Multimodal.fromDocuments(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq === f2.toSeq) // decode is deterministic
    val texts = Map(0L -> "a" * 200, 1L -> "b" * 130, 2L -> "mixed content 123")
    f1.foreach { f =>
      val (w, h) = (Multimodal.mediaWidth(f.media_id), Multimodal.mediaHeight(f.media_id))
      assert(f.width === w)
      assert(f.height === h)
      assert(f.format === "png")
      assert(f.n_bytes > 0)
      // decoded brightness must equal the mean of the source pixel bytes —
      // i.e. the PNG round-trip is lossless
      val px = Multimodal.pixelBytes(texts(f.media_id), w * h)
      val expected = BigDecimal(px.map(_ & 0xff).map(_.toLong).sum.toDouble / (w * h * 255.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(f.brightness === expected)
    }
  }

  test("ImageCodec decodes a hand-built image; rejects non-image bytes") {
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, 2, 1, Array[Byte](0, -1)) // black, white
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, brightness)) = Multimodal.ImageCodec.decode(bos.toByteArray)
    assert((w, h) === (2, 1))
    assert(brightness === 0.5)
    assert(Multimodal.ImageCodec.decode("not a png".getBytes).isEmpty)
  }

  test("undecodable payloads fall back to declared metadata") {
    val media = Seq(Multimodal.MediaRow(7L, "wav", Array[Byte](10, 20, 30), 3, 4))
      .toDF()
    val f = Multimodal.extractFeatures(media).collect().head
    assert((f.width, f.height) === (3, 4))
    assert(f.n_bytes === 3L)
    assert(f.brightness === BigDecimal(60.0 / (3 * 255.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("resize caps the longest edge, preserves aspect, passes non-images through") {
    // a 16x8 gradient PNG → maxDim 8 should give 8x4
    val img = new java.awt.image.BufferedImage(16, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, 16, 8,
      Array.tabulate[Byte](16 * 8)(i => (i * 2).toByte))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      Multimodal.MediaRow(1L, "png", bos.toByteArray, 16, 8),
      Multimodal.MediaRow(2L, "wav", Array[Byte](1, 2, 3), 0, 0)).toDF()
    val out = Multimodal.resizeImages(media, maxDim = 8).collect().sortBy(_.media_id)
    val r1 = out(0)
    assert(r1.resized)
    assert((r1.width, r1.height) === (8, 4))
    // the resized payload is a real decodable PNG of the new dims with a
    // brightness close to the source's (bilinear downscale preserves mean)
    val Some((w2, h2, b2)) = Multimodal.ImageCodec.decode(r1.payload)
    assert((w2, h2) === (8, 4))
    val Some((_, _, b1)) = Multimodal.ImageCodec.decode(bos.toByteArray)
    assert(math.abs(b1 - b2) < 0.05)
    // non-image passes through untouched
    val r2 = out(1)
    assert(!r2.resized && r2.format === "wav" && r2.payload.length === 3)
    // already-small images are not upscaled, and report their DECODED dims
    // even when the declared metadata lies
    val small = Multimodal.resizeImages(
      Seq(Multimodal.MediaRow(1L, "png", bos.toByteArray, 0, 0)).toDF(),
      maxDim = 64).collect().head
    assert(!small.resized && small.payload.sameElements(bos.toByteArray))
    assert((small.width, small.height) === (16, 8))
  }

  test("resize preserves color: an RGB source does not come back grayscale") {
    val img = new java.awt.image.BufferedImage(16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(x => (0 until 8).foreach(y => img.setRGB(x, y, 0xFF0000))) // pure red
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val out = Multimodal.resizeImages(
      Seq(Multimodal.MediaRow(1L, "png", bos.toByteArray, 16, 8)).toDF(),
      maxDim = 8).collect().head
    assert(out.resized && (out.width, out.height) === (8, 4))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.payload))
    assert(back.getColorModel.getNumColorComponents === 3)
    val rgb = back.getRGB(4, 2)
    assert(((rgb >> 16) & 0xff) > 200 && ((rgb >> 8) & 0xff) < 50) // still red
  }

  test("resize preserves alpha: transparent pixels do not composite onto black") {
    val img = new java.awt.image.BufferedImage(16, 8, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    // left half opaque white, right half fully transparent
    (0 until 16).foreach(x => (0 until 8).foreach(y =>
      img.setRGB(x, y, if (x < 8) 0xFFFFFFFF else 0x00000000)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val out = Multimodal.resizeImages(
      Seq(Multimodal.MediaRow(1L, "png", bos.toByteArray, 16, 8)).toDF(),
      maxDim = 8).collect().head
    assert(out.resized)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.payload))
    assert(back.getColorModel.hasAlpha)
    // a pixel in the transparent half is still transparent, not opaque black
    assert(((back.getRGB(6, 2) >> 24) & 0xff) < 50)
    // and the opaque half is still white
    val w = back.getRGB(1, 2)
    assert(((w >> 24) & 0xff) > 200 && ((w >> 16) & 0xff) > 200)
  }

  test("fixture WAVs decode back to the md5-derived PCM stats") {
    val media = Multimodal.audioFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val feats = Multimodal.extractAudioFeatures(media).collect().sortBy(_.media_id)
    val texts = Map(0L -> "a" * 200, 1L -> "b" * 130, 2L -> "mixed content 123")
    assert(feats.length === 3)
    feats.foreach { f =>
      val id = f.media_id
      val (rate, ch, frames) =
        (Multimodal.audioRate(id), Multimodal.audioChannels(id), Multimodal.audioFrames(id))
      assert(f.format === "wav")
      // header fields survive the real RIFF/WAVE round-trip
      assert(f.sample_rate === rate)
      assert(f.channels === ch)
      assert(f.frames === frames.toLong)
      assert(f.n_bytes > (frames * ch * 2).toLong) // container header on top of PCM
      assert(f.duration_sec === BigDecimal(frames.toDouble / rate)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // PCM stats recomputed independently from the same md5 bytes, as
      // signed 16-bit little-endian samples — proves the body is lossless
      val pcm = Multimodal.pixelBytes(texts(id), frames * ch * 2)
      val samples = pcm.grouped(2).map { p =>
        ((p(1) << 8) | (p(0) & 0xff)).toShort.toInt
      }.toSeq
      val expMean = BigDecimal(samples.map(s => math.abs(s.toLong)).sum.toDouble /
          (samples.size.toDouble * 32768.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expPeak = BigDecimal(samples.map(s => math.abs(s.toLong)).max.toDouble / 32768.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(f.mean_abs === expMean)
      assert(f.peak_abs === expPeak)
    }
  }

  test("AudioCodec parses a hand-built WAV; rejects non-audio bytes; fallback keeps totality") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 4 frames of stereo 16-bit LE: L/R pairs (100,-100), (32767,-32768), ...
    val samples = Array[Short](100, -100, 32767, -32768, 0, 1000, -2000, 5)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(16000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 4L),
      AudioFileFormat.Type.WAVE, bos)
    val Some((rate, ch, frames, dur, meanAbs, peakAbs)) =
      Multimodal.AudioCodec.decode(bos.toByteArray)
    assert((rate, ch, frames) === (16000, 2, 4L))
    assert(dur === BigDecimal(4.0 / 16000.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(peakAbs === 1.0) // |-32768| / 32768
    val expMean = BigDecimal(samples.map(s => math.abs(s.toLong)).sum.toDouble /
        (8 * 32768.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(meanAbs === expMean)
    assert(Multimodal.AudioCodec.decode("not a wav".getBytes).isEmpty)
    // unparseable payload: declared metadata + raw-bytes-as-PCM fallback
    val f = Multimodal.extractAudioFeatures(
      Seq(Multimodal.AudioRow(7L, "mp3", Array[Byte](1, 2, 3, 4), 8000, 2)).toDF())
      .collect().head
    assert((f.sample_rate, f.channels, f.frames) === (8000, 2, 1L))
    assert(f.n_bytes === 4L)
  }

  test("fixture Y4M videos decode back to the md5-derived luma stats") {
    val media = Multimodal.videoY4mFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val texts = Map(0L -> "a" * 200, 1L -> "b" * 130, 2L -> "mixed content 123")
    val feats = Multimodal.extractVideoFrameFeatures(media).collect()
      .sortBy(f => (f.media_id, f.frame_index))
    feats.groupBy(_.media_id).foreach { case (id, rows) =>
      val (w, h) = (Multimodal.mediaWidth(id), Multimodal.mediaHeight(id))
      val n = Multimodal.videoFrameCount(id)
      // header fields survive the real Y4M round-trip
      assert(rows.forall(r => r.width == w && r.height == h &&
        r.fps == Multimodal.videoFps(id).toDouble && r.n_frames == n.toLong))
      // stride-2 sampling: frames 0, 2, (4)
      assert(rows.map(_.frame_index).toSeq === (0 until n by 2).map(_.toLong))
      // luma stats recomputed independently from the same md5 bytes
      val frameSize = w * h * 3 / 2
      val pix = Multimodal.pixelBytes(texts(id), n * frameSize)
      rows.foreach { r =>
        val y = pix.slice(r.frame_index.toInt * frameSize,
          r.frame_index.toInt * frameSize + w * h).map(_ & 0xff)
        assert(r.luma_mean === BigDecimal(y.sum.toDouble / (y.length * 255.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        assert(r.luma_peak === BigDecimal(y.max.toDouble / 255.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  test("VideoCodec parses hand-built Y4M variants; rejects malformed; fallback keeps totality") {
    // FRAME parameter strings and the C420mpeg2 colorspace tag are legal
    def y4m(header: String, frames: Seq[Array[Byte]], marker: String = "FRAME"): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write((header + "\n").getBytes("US-ASCII"))
      frames.foreach { f =>
        bos.write((marker + "\n").getBytes("US-ASCII")); bos.write(f)
      }
      bos.toByteArray
    }
    val frame = Array.tabulate[Byte](2 * 2 * 3 / 2)(i => (i * 40).toByte)
    val Some((w, h, fn, fd, fs)) = Multimodal.VideoCodec.decode(
      y4m("YUV4MPEG2 W2 H2 F30000:1001 Ip A1:1 C420mpeg2 XYSCSS=420MPEG2",
        Seq(frame, frame), marker = "FRAME Itop"))
    assert((w, h, fn, fd, fs.length) === (2, 2, 30000L, 1001L, 2))
    assert(fs.head.toSeq === frame.toSeq)
    // malformed: wrong magic, truncated frame body, 4:4:4 colorspace
    assert(Multimodal.VideoCodec.decode("AVI nope".getBytes).isEmpty)
    assert(Multimodal.VideoCodec.decode(
      y4m("YUV4MPEG2 W2 H2 F24:1", Seq(frame.take(3)))).isEmpty)
    assert(Multimodal.VideoCodec.decode(
      y4m("YUV4MPEG2 W2 H2 F24:1 C444", Seq(frame))).isEmpty)
    // unparseable payload: declared metadata + raw-slice fallback
    val f = Multimodal.extractVideoFrameFeatures(
      Seq(Multimodal.VideoRow(9L, "mp4", Array.fill[Byte](12)(6), 2, 2, 24L, 2L)).toDF(),
      stride = 1).collect()
    assert(f.map(_.frame_index).toSeq === Seq(0L, 1L))
    assert(f.forall(r => r.width == 2 && r.fps == 24.0))
  }

  test("frame sampling emits every stride-th fixed-size chunk") {
    val media = Multimodal.fromDocuments(docs)
    val payloadLen = media.where($"media_id" === 0L)
      .select("payload").collect().head.getAs[Array[Byte]](0).length
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
      .where($"media_id" === 0L).collect()
    val expected = (0 until payloadLen / 16 by 2).map(_.toLong)
    assert(frames.map(_.getLong(1)).sorted.toSeq === expected)
    assert(frames.forall(_.getAs[Array[Byte]]("frame_payload").length === 16))
  }

  test("frame-sample plan: integer ceil, cap, and per-fps frame numbers") {
    val meta = Seq(
      (1L, 2000L, 24L),  // ceil(2000/700)=3 samples, under the cap
      (2L, 11500L, 30L), // ceil=17 -> capped at 8
      (3L, 700L, 36L),   // exactly one interval -> 1 sample
      (4L, 0L, 24L)      // zero duration -> no rows
    ).toDF("media_id", "duration_ms", "fps")
    val got = Multimodal.frameSamplePlan(meta, intervalMs = 700, maxFrames = 8)
      .orderBy("media_id", "sample_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def want(id: Long, n: Int, fps: Long) = (0 until n).map { k =>
      (id, k.toLong, k * 700L, k * 700L * fps / 1000L)
    }
    assert(got.toSeq === want(1L, 3, 24) ++ want(2L, 8, 30) ++ want(3L, 1, 36))
    // frame numbers really advance by the fps-dependent integer step
    assert(want(1L, 3, 24).map(_._4) === Seq(0L, 16L, 33L))
  }

  test("perceptual hash: byte-identical images collapse, others split, junk drops") {
    // ids 35 apart share (w, h); same text → byte-identical PNG → same hash
    val docs = Seq((1L, "same picture text"), (36L, "same picture text"),
      (2L, "a completely different image")).toDF("doc_id", "text")
    val media = Multimodal.fromDocuments(docs)
    val got = Multimodal.perceptualHashes(media).collect()
      .map(p => p.media_id -> (p.phash_lo, p.phash_hi)).toMap
    assert(got(1L) === got(36L))
    assert(got(1L) !== got(2L))
    // an undecodable payload is dropped, not crashed on
    val junk = media.limit(0).unionByName(
      Seq(Multimodal.MediaRow(99L, "png", Array[Byte](1, 2, 3), 4, 4)).toDF())
    assert(Multimodal.perceptualHashes(junk).count() === 0L)
  }

  test("phash near-dup pairs: complete vs brute Hamming <= 3, twins at distance 0") {
    // ids 35 apart share (w, h) so same-text twins are byte-identical
    val docs = Seq(
      (1L, "same picture text"), (36L, "same picture text"),
      (71L, "same picture text"),
      (2L, "a completely different image"), (5L, "yet another frame")
    ).toDF("doc_id", "text")
    val media = Multimodal.fromDocuments(docs)
    val got = Multimodal.phashNearDupPairs(media)
      .orderBy("media_a", "media_b")
      .as[(Long, Long, Long)].collect().toSeq
    // independent brute force over the hashes the operator itself rides
    val ph = Multimodal.perceptualHashes(media).collect()
      .map(p => p.media_id -> (p.phash_lo, p.phash_hi)).toMap
    val brute = (for {
      a <- ph.keys.toSeq; b <- ph.keys.toSeq if a < b
      d = java.lang.Long.bitCount(ph(a)._1 ^ ph(b)._1) +
        java.lang.Long.bitCount(ph(a)._2 ^ ph(b)._2)
      if d <= 3
    } yield (a, b, d.toLong)).sortBy(p => (p._1, p._2))
    assert(got === brute)
    // the three byte-identical twins pair pairwise at distance 0
    assert(got.filter(_._3 == 0L).map(p => (p._1, p._2))
      .containsSlice(Seq((1L, 36L), (1L, 71L), (36L, 71L))))
  }

  test("phash near-dup pairs at Hamming <= 6 route through multi-probe, complete vs brute") {
    // wider corpus so the 4-6 radius genuinely has members the 3-band
    // radius misses (distinct md5 pixel fields scatter hashes broadly;
    // the brute compare is the completeness proof either way)
    val docs = ((1L to 40L) :+ 36L).distinct
      .map(i => (i, s"frame number ${i % 7} of the same scene"))
      .toDF("doc_id", "text")
    val media = Multimodal.fromDocuments(docs)
    val got = Multimodal.phashNearDupPairs(media, maxHamming = 6)
      .orderBy("media_a", "media_b")
      .as[(Long, Long, Long)].collect().toSeq
    val ph = Multimodal.perceptualHashes(media).collect()
      .map(p => p.media_id -> (p.phash_lo, p.phash_hi)).toMap
    val brute = (for {
      a <- ph.keys.toSeq; b <- ph.keys.toSeq if a < b
      d = java.lang.Long.bitCount(ph(a)._1 ^ ph(b)._1) +
        java.lang.Long.bitCount(ph(a)._2 ^ ph(b)._2)
      if d <= 6
    } yield (a, b, d.toLong)).sortBy(p => (p._1, p._2))
    assert(got === brute)
    // the radius-3 set is a strict subset of what the probe join surfaces
    val r3 = Multimodal.phashNearDupPairs(media, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(r3.subsetOf(got.toSet))
  }

  test("audio contour: positional bits, identical audio collapses, junk drops") {
    // ids 20 apart share (rate, channels, frames) = id % lcm(4,2,10);
    // same text → byte-identical WAV → same contour
    val docs = Seq((1L, "same sound"), (21L, "same sound"), (2L, "other sound"))
      .toDF("doc_id", "text")
    val audio = Multimodal.audioFromDocuments(docs)
    val got = Multimodal.audioContours(audio).collect()
      .map(c => c.media_id -> (c.n_samples, c.contour)).toMap
    assert(got(1L) === got(21L))
    assert(got(1L)._2 !== got(2L)._2)
    // sample counts decode from the real header: frames × channels
    assert(got(1L)._1 ===
      Multimodal.audioFrames(1L).toLong * Multimodal.audioChannels(1L))
    val junk = audio.limit(0).unionByName(
      Seq(Multimodal.AudioRow(99L, "wav", Array[Byte](1, 2, 3), 8000, 1)).toDF())
    assert(Multimodal.audioContours(junk).count() === 0L)
  }
}
