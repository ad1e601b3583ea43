package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.{AvProbe, HeaderProbe}

class MultimodalSpec extends SparkSpec {

  /** Encode a solid-color wxh image with the JDK's own writers — the probe
   * is then tested against REAL container bytes, not hand-built ones. */
  private def encoded(fmt: String, w: Int, h: Int,
      rgb: Int = 0xff0000): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val baos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, baos), s"no JDK writer for $fmt")
    baos.toByteArray
  }

  private def mediaDf = {
    val sparkS = spark
    import sparkS.implicits._
    Seq(
      (1L, "img-a".getBytes("UTF-8")),
      (2L, Array.fill(1000)(7.toByte)),
      (3L, Array.empty[Byte]),
      (4L, null.asInstanceOf[Array[Byte]]),
      (5L, encoded("png", 123, 45)))
      .toDF("media_id", "payload")
  }

  test("header probe reads true dims from JDK-encoded png/jpg/gif bytes") {
    for (fmt <- Seq("png", "jpg", "gif")) {
      val p = HeaderProbe.probe(encoded(fmt, 123, 45))
      val want = if (fmt == "jpg") "jpeg" else fmt
      assert(p.format === want, fmt)
      assert(p.width === 123, fmt)
      assert(p.height === 45, fmt)
    }
    // non-image bytes → all null, no crash (including empty)
    assert(HeaderProbe.probe("not an image".getBytes) === HeaderProbe.unknown)
    assert(HeaderProbe.probe(Array.empty[Byte]) === HeaderProbe.unknown)
    // truncated PNG signature → unknown, truncated JPEG → format only
    assert(HeaderProbe.probe(Array(0x89.toByte, 'P'.toByte)) === HeaderProbe.unknown)
    val trunc = HeaderProbe.probe(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte))
    assert(trunc.format === "jpeg" && trunc.width === null)
  }

  test("media metadata struct: real probe dims, typed, deterministic, null-safe") {
    val df = Multimodal.withMediaMeta(mediaDf, kind = "image")
    val rows = df.orderBy("media_id").collect()
    def meta(i: Int) = rows(i).getStruct(rows(i).fieldIndex("media_meta"))
    val m1 = meta(0)
    assert(m1.getAs[String]("kind") == "image")
    assert(m1.getAs[Long]("n_bytes") == 5L)
    // text bytes are NOT an image: dims must be null, not fabricated
    assert(m1.isNullAt(m1.fieldIndex("format")))
    assert(m1.isNullAt(m1.fieldIndex("width")))
    // the real PNG reports its true dimensions
    val m5 = meta(4)
    assert(m5.getAs[String]("format") == "png")
    assert(m5.getAs[Int]("width") == 123 && m5.getAs[Int]("height") == 45)
    // determinism
    val again = Multimodal.withMediaMeta(mediaDf, kind = "image")
      .orderBy("media_id").collect()(0)
    assert(again.getStruct(again.fieldIndex("media_meta")) == m1)
    // null payload -> empty-payload meta, no crash
    val m4 = meta(3)
    assert(m4.getAs[Long]("n_bytes") == 0L)
    assert(m4.isNullAt(m4.fieldIndex("width")))
  }

  test("feature extraction really decodes JDK-readable images") {
    val df = Multimodal.extractFeatures(mediaDf, batchSize = 2)
    val rows = df.orderBy("media_id").collect()
    assert(df.schema.fieldNames.toSeq ==
      Seq("media_id", "payload", "media_features"))
    val f2 = rows(1).getSeq[Float](2)
    assert(f2.length == 8 && f2.forall(_ >= 0f))
    assert(rows(2).getSeq[Float](2).forall(_ == 0f), "empty payload -> zero features")
    assert(rows(3).getSeq[Float](2).forall(_ == 0f), "null payload -> zero features")
    // the solid-red PNG decodes for real: meanR=1, meanG=meanB=0,
    // luma=0.299, no bright pixels, dims normalized
    val f5 = rows(4).getSeq[Float](2)
    assert(math.abs(f5(0) - 1.0f) < 1e-3, s"meanR: $f5")
    assert(f5(1) === 0.0f && f5(2) === 0.0f)
    assert(math.abs(f5(3) - 0.299f) < 1e-2, s"meanLuma: $f5")
    assert(f5(4) === 0.0f)
    assert(math.abs(f5(5) - 123f / 4096f) < 1e-4)
    assert(math.abs(f5(6) - 45f / 4096f) < 1e-4)
  }

  /** Encode real WAV bytes with the JDK's own writer — the AV probe is
   * tested against a genuine RIFF container, not hand-built hex. */
  private def encodedWav(rateHz: Int, channels: Int, seconds: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rateHz.toFloat, 16, channels, true, false)
    val nFrames = rateHz.toLong * seconds
    val pcm = new Array[Byte](nFrames.toInt * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Minimal hand-built ISO-BMFF: ftyp + moov{mvhd v0, trak{tkhd v0}}. */
  private def builtMp4(w: Int, h: Int, scale: Int, dur: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 216)
    bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
    bb.putInt(216).put("moov".getBytes)
    bb.putInt(108).put("mvhd".getBytes).putInt(0) // v0 + flags
      .putInt(0).putInt(0).putInt(scale).putInt(dur)
    bb.position(bb.position() + 80) // rate..next_track_id zeros
    bb.putInt(100).put("trak".getBytes)
    bb.putInt(92).put("tkhd".getBytes).putInt(0x0000000f)
      .putInt(0).putInt(0).putInt(1)
    bb.position(bb.position() + 60) // reserved..matrix zeros
    bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed point
    bb.array()
  }

  test("AV probe reads true rate/channels/duration from JDK-written WAV") {
    val p = AvProbe.probe(encodedWav(rateHz = 8000, channels = 2, seconds = 3))
    assert(p.format === "wav")
    assert(p.sampleRate === 8000 && p.channels === 2)
    assert(p.durationMs === 3000L)
    assert(p.width === null && p.height === null)
    val mono = AvProbe.probe(encodedWav(rateHz = 44100, channels = 1, seconds = 1))
    assert(mono.sampleRate === 44100 && mono.channels === 1)
    assert(mono.durationMs === 1000L)
  }

  test("AV probe walks ISO-BMFF boxes to mvhd duration and tkhd dims") {
    val p = AvProbe.probe(builtMp4(w = 640, h = 360, scale = 1000, dur = 2500))
    assert(p.format === "mp4")
    assert(p.width === 640 && p.height === 360)
    assert(p.durationMs === 2500L)
    assert(p.sampleRate === null && p.channels === null)
    // non-millisecond timescale rescales: 90kHz ticks -> ms
    val ticks = AvProbe.probe(builtMp4(320, 240, scale = 90000, dur = 450000))
    assert(ticks.durationMs === 5000L)
  }

  test("AV probe is null-safe on junk, truncation, and corrupt sizes") {
    assert(AvProbe.probe("plain text, nothing binary".getBytes) === AvProbe.unknown)
    assert(AvProbe.probe(Array.empty[Byte]) === AvProbe.unknown)
    // truncated mid-header: format recognized, fields null, no crash
    val truncWav = AvProbe.probe(
      encodedWav(8000, 1, 1).take(16))
    assert(truncWav.format === "wav" && truncWav.durationMs === null)
    val truncMp4 = AvProbe.probe(builtMp4(640, 360, 1000, 2500).take(20))
    assert(truncMp4.format === "mp4" && truncMp4.durationMs === null)
    // corrupt declared box size (smaller than its header) stops the walk
    val corrupt = builtMp4(640, 360, 1000, 2500)
    corrupt(19) = 2 // moov size -> 2
    val c = AvProbe.probe(corrupt)
    assert(c.format === "mp4" && c.durationMs === null && c.width === null)
  }

  test("withMediaMeta carries real AV metadata; images keep null duration") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      (1L, encodedWav(8000, 2, 2)),
      (2L, builtMp4(320, 240, 1000, 1500)),
      (3L, encoded("png", 12, 34)),
      (4L, "just some text".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val rows = Multimodal.withMediaMeta(df, kind = "video")
      .orderBy("media_id").collect()
    def meta(i: Int) = rows(i).getStruct(rows(i).fieldIndex("media_meta"))
    val wav = meta(0)
    assert(wav.getAs[String]("format") == "wav")
    assert(wav.getAs[Int]("sample_rate") == 8000 && wav.getAs[Int]("channels") == 2)
    assert(wav.getAs[Long]("duration_ms") == 2000L)
    val mp4 = meta(1)
    assert(mp4.getAs[String]("format") == "mp4")
    assert(mp4.getAs[Int]("width") == 320 && mp4.getAs[Int]("height") == 240)
    assert(mp4.getAs[Long]("duration_ms") == 1500L)
    assert(mp4.isNullAt(mp4.fieldIndex("sample_rate")))
    // a recognized image has no duration: null, not a fabricated number
    val png = meta(2)
    assert(png.getAs[String]("format") == "png")
    assert(png.isNullAt(png.fieldIndex("duration_ms")))
    // unrecognized payloads keep the documented byte-length stand-in
    val txt = meta(3)
    assert(txt.isNullAt(txt.fieldIndex("format")))
    assert(txt.getAs[Long]("duration_ms") == 14L * 10)
  }

  test("frame sampling explodes by stub duration; resize scales real dims") {
    val df = Multimodal.withMediaMeta(mediaDf.where(col("media_id") === 2), kind = "video")
    val frames = Multimodal.sampleFrames(df, everyMs = 2000)
    // duration = 1000 bytes * 10ms = 10000ms -> frames at 0,2000,...,10000
    assert(frames.count() == 6)
    assert(frames.select("frame_id").distinct().count() == 6)
    // resize against the real 123x45 PNG: 123 -> 64, 45 -> floor(45*64/123)
    val png = Multimodal.withMediaMeta(mediaDf.where(col("media_id") === 5))
    val resized = Multimodal.resizeMeta(png, maxDim = 64).collect()(0)
    assert(resized.getAs[Int]("resized_width") === 64)
    assert(resized.getAs[Int]("resized_height") === 45 * 64 / 123)
    // unparseable header -> null resized dims, not garbage
    val txt = Multimodal.resizeMeta(
      Multimodal.withMediaMeta(mediaDf.where(col("media_id") === 1)), 64)
      .collect()(0)
    assert(txt.isNullAt(txt.fieldIndex("resized_width")))
  }

  test("patch embedding is the exact closed form of a two-color image") {
    // left half pure red, right half pure green, 32x32, grid 4
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0xff0000 else 0x00ff00)
    val e = Multimodal.patchEmbedding(img, grid = 4)
    assert(e.length === 7 + 16)
    assert(e(0) === ((255.0 * 512 / 1024) / 255.0).toFloat)       // meanR = .5
    assert(e(1) === ((255.0 * 512 / 1024) / 255.0).toFloat)       // meanG = .5
    assert(e(2) === 0.0f)                                          // meanB
    val lA = 299 * 255; val lB = 587 * 255
    assert(e(3) === (((lA + lB) * 512L).toDouble / 1024 / 255000.0).toFloat)
    assert(e(4) === 0.5f)                                          // only green half is bright
    assert(e(5) === (32 / 4096.0).toFloat && e(6) === e(5))
    // patch columns 0-1 are the red half, 2-3 the green half, every row
    for (q <- 0 until 16) {
      val want = if (q % 4 <= 1) lA / 255000.0 else lB / 255000.0
      assert(e(7 + q) === want.toFloat, s"patch $q")
    }
    // embedding survives a PNG encode/decode round trip bit-for-bit
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(baos.toByteArray))
    assert(Multimodal.patchEmbedding(back, 4).toSeq === e.toSeq)
    // undecodable payloads pad the byte-fold stub to the embedding width
    val sparkS = spark
    import sparkS.implicits._
    val df = Multimodal.extractEmbedding(
      Seq((1L, "junk".getBytes("UTF-8"))).toDF("media_id", "payload"), grid = 4)
    assert(df.collect()(0).getSeq[Float](2).length === 23)
  }
}
