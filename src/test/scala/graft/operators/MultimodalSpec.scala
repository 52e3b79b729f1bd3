package graft.operators

import graft.SparkTestBase
import graft.operators.Multimodal._

class MultimodalSpec extends SparkTestBase {

  import spark.implicits._

  test("fromText + featurize: byte histogram matches the bytes, end to end") {
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val feats = Multimodal.featurize(Multimodal.fromText(df, "doc_id", "text"))
      .collect().map(f => f.id -> f).toMap
    assert(feats(1L).nBytes == 3)
    // 'a'=0x61,'b'=0x62,'c'=0x63 -> all in bucket 6
    assert(feats(1L).byteHist(6) == 3 && feats(1L).byteHist.sum == 3)
    assert(feats(2L).nBytes == 0 && feats(2L).byteHist.sum == 0)
    assert(feats(1L).modality == "text")
  }

  test("fromText drops null-id/null-text rows instead of failing downstream") {
    val df = Seq(
      (Some(1L), Some("ok")),
      (None, Some("no id")),
      (Some(3L), None)
    ).toDF("doc_id", "text")
    val items = Multimodal.fromText(df, "doc_id", "text").collect()
    assert(items.map(_.id).toSeq == Seq(1L))
  }

  test("custom decoder plugs in per partition") {
    val df = Seq((1L, "xyz")).toDF("doc_id", "text")
    val constDecoder = new MediaDecoder {
      def features(item: MediaItem) =
        MediaFeatures(item.id, "fake", 42, Array.fill(16)(1L))
    }
    val f = Multimodal.featurize(Multimodal.fromText(df, "doc_id", "text"), constDecoder).head()
    assert(f.nBytes == 42 && f.modality == "fake")
  }

  test("resize transform rewrites payload size and metadata, one pass") {
    val df = Seq((1L, "abcdef"), (2L, "")).toDF("doc_id", "text")
    val resized = Multimodal.transform(
        Multimodal.fromText(df, "doc_id", "text"), StubResize(4, 2))
      .collect().map(i => i.id -> i).toMap
    assert(resized(1L).content.length == 8)
    assert(resized(1L).meta.width == 4 && resized(1L).meta.height == 2)
    // deterministic cycled payload: "abcdefab"
    assert(new String(resized(1L).content, "UTF-8") == "abcdefab")
    assert(resized(2L).content.length == 8) // empty source still yields w*h
  }

  test("frame sampling explodes one item into bounded frame items") {
    val df = Seq((3L, "0123456789")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
        Multimodal.fromText(df, "doc_id", "text"), frameBytes = 4, maxFrames = 2)
      .collect().sortBy(_.id)
    assert(frames.length == 2) // 3 chunks capped at 2
    assert(frames.map(_.id).toSeq == Seq((3L << 20) + 0, (3L << 20) + 1))
    assert(new String(frames(0).content, "UTF-8") == "0123")
    assert(new String(frames(1).content, "UTF-8") == "4567")
    assert(frames.forall(_.meta.modality == "image"))
  }

  test("image and audio decode are real; junk payloads are refused, not misread") {
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeWavPcm("not audio".getBytes).isEmpty)
  }

  test("encodeWavPcm16/decodeWavPcm round-trips PCM16 losslessly") {
    val samples = Array.tabulate[Short](480)(i =>
      (math.sin(i * 0.1) * 12000).toShort)
    val wav = Multimodal.encodeWavPcm16(samples, sampleRate = 8000)
    val (decoded, rate, channels) = Multimodal.decodeWavPcm(wav).get
    assert(rate == 8000 && channels == 1)
    assert(decoded.length == samples.length)
    samples.indices.foreach(i =>
      assert(decoded(i) == samples(i) / 32768f, s"sample $i"))
    // stereo: interleaved frames survive
    val st = Multimodal.encodeWavPcm16(Array[Short](100, -100, 200, -200),
      sampleRate = 16000, channels = 2)
    val (d2, _, ch2) = Multimodal.decodeWavPcm(st).get
    assert(ch2 == 2 && d2.length == 4)
  }

  test("featurizeAudio: distributed decode with closed-form frame count and RMS") {
    import spark.implicits._
    val items = spark.range(20).as[Long].map { id =>
      val n = 400 + (id % 3).toInt * 80
      val amp = (500 + (id % 4) * 250).toShort
      val samples = Array.tabulate[Short](n)(i =>
        if (i % 2 == 0) amp else (-amp).toShort)
      Multimodal.MediaItem(id, Multimodal.encodeWavPcm16(samples, 16000),
        Multimodal.MediaMeta("audio", 0, 0, 16000, 0L))
    }.repartition(4)
    val got = Multimodal.featurizeAudio(items).collect().sortBy(_.id)
    got.foreach { f =>
      assert(f.sampleRate == 16000 && f.channels == 1)
      assert(f.nFrames == 400 + (f.id % 3) * 80)
      val want = (500 + (f.id % 4) * 250) / 32768.0
      assert(math.abs(f.rms - want) < 1e-12, s"id ${f.id}: rms ${f.rms} want $want")
    }
  }

  test("featurizeAudio fails loudly on an undecodable payload, naming the item") {
    import spark.implicits._
    val items = Seq(
      Multimodal.MediaItem(7L, "definitely not a wav".getBytes,
        Multimodal.MediaMeta("audio", 0, 0, 0, 0L))).toDS()
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.featurizeAudio(items).collect())
    assert(e.getMessage.contains("item 7") ||
      Option(e.getCause).exists(_.getMessage.contains("item 7")))
  }

  private def testImage(fmt: String): Array[Byte] = {
    // 3x2 with known pixels: black, white, pure red / green, blue, gray
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xFFFFFF); img.setRGB(2, 0, 0xFF0000)
    img.setRGB(0, 1, 0x00FF00); img.setRGB(1, 1, 0x0000FF); img.setRGB(2, 1, 0x808080)
    if (fmt == "png") Multimodal.encodePng(img)
    else {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
  }

  test("featurizeImages decodes real PNG and BMP payloads to pixel features") {
    // integer Rec.601 lumas: 0, 255, 76, 149, 29, 128 -> bins 0,15,4,9,1,8
    val expectHist = Array.fill(16)(0L)
    Seq(0, 15, 4, 9, 1, 8).foreach(b => expectHist(b) += 1)
    for (fmt <- Seq("png", "bmp")) {
      val bytes = testImage(fmt)
      val items = Seq(Multimodal.MediaItem(7L, bytes,
        Multimodal.MediaMeta("image", 0, 0, 0, 0L))).toDS()
      val f = Multimodal.featurizeImages(items).collect()
      assert(f.length == 1)
      assert(f(0).id == 7L && f(0).width == 3 && f(0).height == 2 &&
        f(0).nPixels == 6L, s"$fmt: ${f(0)}")
      assert(f(0).lumaHist.toSeq == expectHist.toSeq,
        s"$fmt hist: ${f(0).lumaHist.toSeq}")
    }
  }

  test("featurizeImages fails loudly on an undecodable payload, naming the item") {
    val items = Seq(Multimodal.MediaItem(42L, "garbage bytes".getBytes,
      Multimodal.MediaMeta("image", 0, 0, 0, 0L))).toDS()
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.featurizeImages(items).collect())
    val root = Option(e.getCause).getOrElse(e)
    assert(root.getMessage.contains("42"), root.getMessage)
    assert(root.getMessage.contains("MediaDecoder"), root.getMessage)
  }

  test("encodePng/decodeImage round-trips 8-bit RGB losslessly") {
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 4)
      img.setRGB(x, y, ((x * 61 + y * 97) * 2654435) & 0xFFFFFF)
    val back = Multimodal.decodeImage(Multimodal.encodePng(img)).get
    for (y <- 0 until 3; x <- 0 until 4)
      assert((back.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF))
  }

  test("decoder close() fires at task completion — every open gets a release") {
    // local mode shares the JVM, so static counters observe executor tasks
    val df = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    MultimodalSpec.opens.set(0); MultimodalSpec.closes.set(0)
    val trackingDecoder = new MediaDecoder {
      override def open(): Unit = MultimodalSpec.opens.incrementAndGet()
      override def close(): Unit = MultimodalSpec.closes.incrementAndGet()
      def features(item: MediaItem) =
        MediaFeatures(item.id, "t", 0, Array.fill(16)(0L))
    }
    Multimodal.featurize(
      Multimodal.fromText(df, "doc_id", "text").repartition(4), trackingDecoder)
      .collect()
    assert(MultimodalSpec.opens.get() > 0)
    assert(MultimodalSpec.closes.get() == MultimodalSpec.opens.get(),
      s"opens=${MultimodalSpec.opens.get()} closes=${MultimodalSpec.closes.get()}")
  }

  import MultimodalSpec.grayFrame

  test("encodeMjpegAvi/decodeMjpegAvi: real RIFF + ImageIO JPEG round trip") {
    // gray levels at bucket centers (8 + 16k): JPEG's quantization error
    // (a few levels on solid frames) must not cross a 16-wide bucket
    val grays = Seq(8, 72, 136, 248)
    val avi = Multimodal.encodeMjpegAvi(grays.map(grayFrame(16, 8, _)), fps = 12)
    // container sanity: RIFF/AVI magic where a real player expects it
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val (frames, fps) = Multimodal.decodeMjpegAvi(avi).get
    assert(fps == 12)
    assert(frames.size == 4)
    frames.zip(grays).zipWithIndex.foreach { case ((img, g), i) =>
      assert(img.getWidth == 16 && img.getHeight == 8)
      val luma = (img.getRGB(3, 3) >> 8) & 0xFF // gray: r=g=b
      assert(math.abs(luma - g) <= 7, s"frame $i: luma $luma vs gray $g")
      assert(luma >> 4 == g >> 4, s"frame $i: bucket ${luma >> 4} vs ${g >> 4}")
    }
    // junk and truncated payloads: None, never a crash or misread
    assert(Multimodal.decodeMjpegAvi("not an avi at all".getBytes).isEmpty)
    assert(Multimodal.decodeMjpegAvi(avi.take(40)).isEmpty)
    assert(Multimodal.decodeMjpegAvi(Array.emptyByteArray).isEmpty)
    // a crafted near-Int.MaxValue chunk size must hit the bounds check,
    // not overflow it into a ~2GB allocation (OutOfMemoryError is fatal)
    val crafted = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    crafted.put("RIFF".getBytes("US-ASCII")).putInt(12)
      .put("AVI ".getBytes("US-ASCII"))
      .put("00dc".getBytes("US-ASCII")).putInt(0x7FFFFFF0)
    assert(Multimodal.decodeMjpegAvi(crafted.array()).isEmpty)
    // sub-1fps container (µs/frame > 1e6): fps clamps to 1, never 0 —
    // patch the avih µs/frame field in place (RIFF 12 + LIST hdr 8 +
    // 'hdrl' 4 + avih hdr 8 = offset 32)
    val slow = avi.clone()
    java.nio.ByteBuffer.wrap(slow, 32, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(5000000)
    assert(Multimodal.decodeMjpegAvi(slow).get._2 == 1)
    // a frame that STARTS like a JPEG (SOI intact) but has corrupted
    // scan data makes the claimed JPEG reader THROW, not return null —
    // that must still surface as the documented None, never an escaped
    // IIOException (r7 review)
    val corrupt = avi.clone()
    val dc = {
      val pat = "00dc".getBytes("US-ASCII")
      corrupt.indices.indexWhere(i => i + 4 <= corrupt.length &&
        corrupt.slice(i, i + 4).sameElements(pat))
    }
    assert(dc > 0, "fixture: no 00dc chunk found")
    java.util.Arrays.fill(corrupt, dc + 12, dc + 40, 0.toByte) // keep SOI, wreck the rest
    assert(Multimodal.decodeMjpegAvi(corrupt).isEmpty)
  }

  test("featurizeVideo: distributed per-frame features with closed-form oracle") {
    import spark.implicits._
    val items = spark.range(12).as[Long].map { id =>
      val nFrames = (2 + id % 3).toInt
      val fps = (10 + id % 5).toInt
      val frames = (0 until nFrames).map(i =>
        grayFrame(16, 8, (8 + 16 * ((id * 5 + i) % 16)).toInt))
      Multimodal.MediaItem(id, Multimodal.encodeMjpegAvi(frames, fps),
        Multimodal.MediaMeta("video", 16, 8, 0, nFrames * 1000L / fps))
    }.repartition(4)
    val feats = Multimodal.featurizeVideo(items).collect()
    assert(feats.length == (0 until 12).map(id => 2 + id % 3).sum)
    feats.foreach { f =>
      assert(f.width == 16 && f.height == 8)
      assert(f.fps == 10 + f.id % 5, s"id ${f.id}: fps ${f.fps}")
      val wantBucket = (f.id * 5 + f.frameIdx) % 16
      assert(math.floor(f.meanLuma / 16).toLong == wantBucket,
        s"id ${f.id} frame ${f.frameIdx}: meanLuma ${f.meanLuma} bucket $wantBucket")
    }
  }

  test("featurizeVideo fails loudly on a non-MJPEG payload, naming the item") {
    import spark.implicits._
    val items = Seq(
      Multimodal.MediaItem(9L, "definitely not an avi".getBytes,
        Multimodal.MediaMeta("video", 0, 0, 0, 0L))).toDS()
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.featurizeVideo(items).collect())
    assert(e.getMessage.contains("item 9") ||
      Option(e.getCause).exists(_.getMessage.contains("item 9")))
  }

  test("VideoDecoder plug-in: a fake raw codec routes through featurizeVideo unchanged") {
    // the codec no JDK reader knows (RAWV container), integrated with
    // ZERO engine changes: one trait implementation handed to
    // featurizeVideo — the claim the MediaDecoder/VideoDecoder plug-in
    // point makes for H.264/VP9 (r7 verdict #5)
    MultimodalSpec.rawOpens.set(0); MultimodalSpec.rawCloses.set(0)
    val items = spark.range(6).as[Long].map { id =>
      val nFrames = (1 + id % 3).toInt
      val frames = (0 until nFrames).map(i =>
        Array.fill(8 * 4)(((id * 37 + i * 11) % 256).toByte))
      Multimodal.MediaItem(id,
        MultimodalSpec.encodeRawGray(8, 4, 24, frames),
        Multimodal.MediaMeta("video", 8, 4, 0, nFrames * 1000L / 24))
    }.repartition(3)
    val feats =
      Multimodal.featurizeVideo(items, MultimodalSpec.RawGrayDecoder).collect()
    assert(feats.length == (0 until 6).map(id => 1 + id % 3).sum)
    feats.foreach { f =>
      assert(f.width == 8 && f.height == 4 && f.fps == 24, f.toString)
      // solid gray g: integer Rec.601 luma is exactly g, so meanLuma == g
      val g = ((f.id * 37 + f.frameIdx * 11) % 256).toInt
      assert(f.meanLuma == g.toDouble,
        s"id ${f.id} frame ${f.frameIdx}: meanLuma ${f.meanLuma} vs gray $g")
    }
    // the per-partition open/close lifecycle holds for plugged codecs too
    assert(MultimodalSpec.rawOpens.get() > 0)
    assert(MultimodalSpec.rawCloses.get() == MultimodalSpec.rawOpens.get(),
      s"opens=${MultimodalSpec.rawOpens.get()} closes=${MultimodalSpec.rawCloses.get()}")
  }

  test("a foreign container under the DEFAULT decoder fails loudly naming the plug-in point") {
    val items = Seq(Multimodal.MediaItem(5L,
      MultimodalSpec.encodeRawGray(2, 2, 10, Seq(Array.fill(4)(9.toByte))),
      Multimodal.MediaMeta("video", 2, 2, 0, 100L))).toDS()
    val e = intercept[org.apache.spark.SparkException](
      Multimodal.featurizeVideo(items).collect())
    val root = Option(e.getCause).getOrElse(e)
    assert(root.getMessage.contains("item 5"), root.getMessage)
    assert(root.getMessage.contains("VideoDecoder"), root.getMessage)
  }

  test("aviFrameIndex takes stream-0 chunks only — a second stream never interleaves") {
    // splice a 01dc chunk (stream 1) between two 00dc frames: frame count,
    // order and decode must be exactly the stream-0 sequence (ADVICE r7)
    val grays = Seq(40, 200)
    val avi = Multimodal.encodeMjpegAvi(grays.map(grayFrame(8, 8, _)), fps = 10)
    val pat = "00dc".getBytes("US-ASCII")
    val first = avi.indices.indexWhere(i => i + 4 <= avi.length &&
      avi.slice(i, i + 4).sameElements(pat))
    assert(first > 0, "fixture: no 00dc chunk found")
    val alien = "01dc".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4)
    // insert before the first 00dc (inside LIST movi), growing the RIFF
    // and movi LIST sizes so the container stays well-formed
    val out = avi.take(first) ++ alien ++ avi.drop(first)
    def patchLe(arr: Array[Byte], off: Int, delta: Int): Unit = {
      val bb = java.nio.ByteBuffer.wrap(arr)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(off, bb.getInt(off) + delta)
    }
    patchLe(out, 4, alien.length) // RIFF size
    // movi LIST layout: "LIST"(4) size(4) "movi"(4) then chunks, so the
    // size field sits 8 bytes before the first 00dc header
    patchLe(out, first - 8, alien.length) // movi LIST size
    val (frames, fps) = Multimodal.decodeMjpegAvi(out).get
    assert(fps == 10 && frames.size == 2, s"fps=$fps n=${frames.size}")
    frames.zip(grays).foreach { case (img, g) =>
      val luma = (img.getRGB(2, 2) >> 8) & 0xFF
      assert(math.abs(luma - g) <= 7, s"luma $luma vs gray $g")
    }
  }
}

object MultimodalSpec {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  val rawOpens = new java.util.concurrent.atomic.AtomicInteger(0)
  val rawCloses = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Fake "RAWV" video container for the VideoDecoder plug-in spec:
    * "RAWV" magic, then w, h, fps, nFrames as LE ints, then w·h gray
    * bytes per frame — a format no JDK reader knows, exactly the shape
    * of a foreign codec (H.264, VP9, …). */
  def encodeRawGray(w: Int, h: Int, fps: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.forall(_.length == w * h), "frame bytes must be w*h")
    val bb = java.nio.ByteBuffer.allocate(20 + frames.map(_.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RAWV".getBytes("US-ASCII")).putInt(w).putInt(h).putInt(fps)
      .putInt(frames.length)
    frames.foreach(bb.put)
    bb.array()
  }

  /** The test-registered fake codec: one [[Multimodal.VideoDecoder]]
    * implementation for the RAWV container — no engine code touched. */
  object RawGrayDecoder extends Multimodal.VideoDecoder {
    override def open(): Unit = { rawOpens.incrementAndGet(); () }
    override def close(): Unit = { rawCloses.incrementAndGet(); () }
    override def frames(item: Multimodal.MediaItem)
        : Option[(Iterator[java.awt.image.BufferedImage], Int)] = {
      val bytes = item.content
      if (bytes.length < 20 ||
          new String(bytes.take(4), "US-ASCII") != "RAWV") None
      else {
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val w = bb.getInt(4); val h = bb.getInt(8)
        val fps = bb.getInt(12); val n = bb.getInt(16)
        if (w <= 0 || h <= 0 || n <= 0 ||
            bytes.length < 20 + w.toLong * h * n) None
        else Some(((0 until n).iterator.map { f =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = bytes(20 + f * w * h + y * w + x) & 0xFF
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          img
        }, fps))
      }
    }
  }

  def grayFrame(w: Int, h: Int, g: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    img
  }
}
