package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "image", "fake-jpeg-bytes".getBytes("UTF-8")),
    (2L, "audio", "fake-wav-bytes".getBytes("UTF-8")),
    (3L, "video", "fake-mp4-bytes-longer-payload".getBytes("UTF-8")))
    .toDF("media_id", "kind", "payload")

  test("decodeAndFeaturize: exact stub metadata, normalized features") {
    val out = Multimodal.decodeAndFeaturize(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val img = out(1L)
    val (w, h, _) = Multimodal.decodeStub("image",
      "fake-jpeg-bytes".getBytes("UTF-8"))
    assert(img.getInt(3) == w && img.getInt(4) == h)
    assert(img.getInt(2) == "fake-jpeg-bytes".length)
    val feat = img.getSeq[Float](6)
    assert(feat.length == 8)
    assert(math.abs(feat.sum - 1.0f) < 1e-5) // histogram normalized
    assert(out(2L).getInt(5) > 0) // audio has duration
  }

  test("sampleFrames explodes one row per sampled timestamp") {
    val frames = Multimodal.sampleFrames(media, everyMs = 60000)
    val n = frames.count()
    val (_, _, dur) = Multimodal.decodeStub("video",
      "fake-mp4-bytes-longer-payload".getBytes("UTF-8"))
    assert(n == dur / 60000 + 1)
    assert(frames.select("media_id").distinct().as[Long].head() == 3L)
  }

  test("resize bounds dimensions while preserving aspect ratio") {
    val out = Multimodal.resize(media, maxW = 100, maxH = 100)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getAs[Array[Byte]](4).length))).toMap
    val (w1, h1, _) = Multimodal.decodeStub("image",
      "fake-jpeg-bytes".getBytes("UTF-8"))
    val (nw, nh, _) = out(1L)
    assert(nw <= 100 && nh <= 100)
    // aspect preserved within integer truncation
    assert(math.abs(nw.toDouble / nh - w1.toDouble / h1) < 0.1)
    // shrunken payload is smaller than a full-size stub frame
    assert(out(1L)._3 <= 100 * 100 / 64)
  }

  test("payload survives a parquet round-trip as binary") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val p = back.filter(col("media_id") === 1L)
      .select("payload").as[Array[Byte]].head()
    assert(new String(p, "UTF-8") == "fake-jpeg-bytes")
  }

  // ---- real-codec path: tiny PNGs generated in-test ----

  private def pngBytes(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, px(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", baos)
    baos.toByteArray
  }

  test("decodeAndFeaturize reads true dimensions from a real PNG") {
    // left half black, right half white -> luminance mass in bins 0 and 7
    val png = pngBytes(12, 7)((x, _) => if (x < 6) 0x000000 else 0xffffff)
    val df = Seq((9L, "image", png)).toDF("media_id", "kind", "payload")
    val r = Multimodal.decodeAndFeaturize(df).collect().head
    assert(r.getInt(3) == 12 && r.getInt(4) == 7) // true, not stub, dims
    val feat = r.getSeq[Float](6)
    assert(math.abs(feat(0) - 0.5f) < 1e-5)
    assert(math.abs(feat(7) - 0.5f) < 1e-5)
    assert(math.abs(feat.sum - 1.0f) < 1e-5)
  }

  test("resize really rescales a decodable PNG and re-encodes it") {
    val png = pngBytes(40, 20)((_, _) => 0x336699)
    val df = Seq((9L, "image", png)).toDF("media_id", "kind", "payload")
    val r = Multimodal.resize(df, maxW = 10, maxH = 10).collect().head
    assert(r.getInt(2) == 10 && r.getInt(3) == 5) // aspect preserved
    // output payload is itself a valid image with the reported dims
    val back = Multimodal.readImage(r.getAs[Array[Byte]](4))
    assert(back.isDefined)
    assert(back.get.getWidth == 10 && back.get.getHeight == 5)
    // solid-color input stays solid through bilinear rescale
    assert((back.get.getRGB(4, 2) & 0xffffff) == 0x336699)
  }

  test("non-image payloads still take the deterministic stub path") {
    val out = Multimodal.decodeAndFeaturize(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    val (w, h, _) = Multimodal.decodeStub("image",
      "fake-jpeg-bytes".getBytes("UTF-8"))
    assert(out(1L).getInt(3) == w && out(1L).getInt(4) == h)
  }

  /** 500 ms of 8 kHz mono 16-bit PCM: a loud square wave, WAV-encoded
    * in-memory — a REAL audio fixture with a known duration. */
  private def wavBytes(): Array[Byte] = {
    import javax.sound.sampled._
    val frames = 4000 // 500 ms at 8 kHz
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s: Short = if ((i / 20) % 2 == 0) 20000 else -20000
      pcm(2 * i) = (s & 0xff).toByte         // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("decodeAndFeaturize reads true duration and amplitudes from a real WAV") {
    import spark.implicits._
    val audio = Seq((10L, "audio", wavBytes()))
      .toDF("media_id", "kind", "payload")
    val r = Multimodal.decodeAndFeaturize(audio).collect().head
    assert(r.getInt(5) === 500, "duration_ms from the real WAV header")
    val hist = r.getSeq[Float](6)
    // |20000| / 4096 = bin 4 — every sample lands there
    assert(math.abs(hist(4) - 1.0f) < 1e-6, hist.mkString(","))
    // and the samples round-trip through readPcm16
    val samples = Multimodal.readPcm16(wavBytes())
    assert(samples.length === 4000)
    assert(samples.forall(s => s == 20000 || s == -20000))
  }

  test("undecodable audio still takes the deterministic stub duration") {
    import spark.implicits._
    val fake = "not-audio-at-all".getBytes("UTF-8")
    val audio = Seq((11L, "audio", fake)).toDF("media_id", "kind", "payload")
    val r = Multimodal.decodeAndFeaturize(audio).collect().head
    val (_, _, d) = Multimodal.decodeStub("audio", fake)
    assert(r.getInt(5) === d)
  }

  // ----------------------------------------------------------- real MP4

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(payload.length + 8)
    bb.putInt(payload.length + 8)
      .put(typ.getBytes("ISO-8859-1")).put(payload)
    bb.array()
  }

  /** Minimal well-formed MP4: ftyp + moov{mvhd(v0) + trak{tkhd(v0)}} +
    * mdat — timescale 1000, duration 5500 ticks (= 5500 ms), track
    * presentation size 640×360 in 16.16 fixed point. */
  private def mp4Bytes(): Array[Byte] = {
    val mvhd = java.nio.ByteBuffer.allocate(100)
    mvhd.putInt(0)         // version 0 + flags
      .putInt(0).putInt(0) // ctime, mtime
      .putInt(1000)        // timescale
      .putInt(5500)        // duration (ticks)
    val tkhd = java.nio.ByteBuffer.allocate(84)
    tkhd.position(76)
    tkhd.putInt(640 << 16).putInt(360 << 16)
    val moov = box("moov",
      box("mvhd", mvhd.array()) ++ box("trak", box("tkhd", tkhd.array())))
    box("ftyp", "isom0000isom".getBytes("ISO-8859-1")) ++ moov ++
      box("mdat", Array.fill[Byte](32)(7))
  }

  test("decodeAndFeaturize parses real MP4 duration and track size") {
    import spark.implicits._
    val video = Seq((20L, "video", mp4Bytes()))
      .toDF("media_id", "kind", "payload")
    val r = Multimodal.decodeAndFeaturize(video).collect().head
    assert(r.getInt(3) === 640)
    assert(r.getInt(4) === 360)
    assert(r.getInt(5) === 5500)
    assert(Multimodal.decode("video", mp4Bytes()) === ((640, 360, 5500)))
  }

  test("mvhd version-1 (64-bit times) layout parses too") {
    val mvhd = java.nio.ByteBuffer.allocate(112)
    mvhd.putInt(0x01000000)        // version 1 + flags
      .putLong(0L).putLong(0L)     // ctime, mtime (64-bit)
      .putInt(90000)               // timescale
      .putLong(90000L * 7)         // duration → 7000 ms
    val m = box("moov", box("mvhd", mvhd.array()))
    assert(Multimodal.readVideoMeta(m) === Some((0, 0, 7000)))
  }

  test("non-MP4 video payloads keep the deterministic stub path") {
    val fake = "definitely not an mp4 container".getBytes("UTF-8")
    assert(Multimodal.readVideoMeta(fake) === None)
    assert(Multimodal.decode("video", fake) ===
      Multimodal.decodeStub("video", fake))
  }
}
