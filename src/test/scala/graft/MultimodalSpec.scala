package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.HeaderProbe

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
}
