package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  private def mediaDf = {
    val sparkS = spark
    import sparkS.implicits._
    Seq(
      (1L, "img-a".getBytes("UTF-8")),
      (2L, Array.fill(1000)(7.toByte)),
      (3L, Array.empty[Byte]),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
  }

  test("media metadata struct: typed, deterministic, null-safe") {
    val df = Multimodal.withMediaMeta(mediaDf, kind = "video")
    val rows = df.orderBy("media_id").collect()
    val m1 = rows(0).getStruct(rows(0).fieldIndex("media_meta"))
    assert(m1.getAs[String]("kind") == "video")
    assert(m1.getAs[Long]("n_bytes") == 5L)
    assert(m1.getAs[Int]("width") >= 16 && m1.getAs[Int]("height") >= 16)
    // determinism
    val again = Multimodal.withMediaMeta(mediaDf, kind = "video")
      .orderBy("media_id").collect()(0)
    assert(again.getStruct(again.fieldIndex("media_meta")) == m1)
    // null payload -> null meta fields where derived, no crash
    val m4 = rows(3).getStruct(rows(3).fieldIndex("media_meta"))
    assert(m4.isNullAt(m4.fieldIndex("n_bytes")) || m4.getAs[Long]("n_bytes") == 0L)
  }

  test("batched feature extraction preserves schema and handles nulls") {
    val df = Multimodal.extractFeatures(mediaDf, batchSize = 2)
    val rows = df.orderBy("media_id").collect()
    assert(df.schema.fieldNames.toSeq ==
      Seq("media_id", "payload", "media_features"))
    val f2 = rows(1).getSeq[Float](2)
    assert(f2.length == 8 && f2.forall(_ >= 0f))
    assert(rows(2).getSeq[Float](2).forall(_ == 0f), "empty payload -> zero features")
    assert(rows(3).getSeq[Float](2).forall(_ == 0f), "null payload -> zero features")
  }

  test("frame sampling explodes by stub duration; resize scales metadata") {
    val df = Multimodal.withMediaMeta(mediaDf.where(col("media_id") === 2), kind = "video")
    val frames = Multimodal.sampleFrames(df, everyMs = 2000)
    // duration = 1000 bytes * 10ms = 10000ms -> frames at 0,2000,...,10000
    assert(frames.count() == 6)
    assert(frames.select("frame_id").distinct().count() == 6)
    val resized = Multimodal.resizeMeta(df, maxDim = 64).collect()(0)
    val rw = resized.getAs[Int]("resized_width")
    val rh = resized.getAs[Int]("resized_height")
    assert(math.max(rw, rh) <= 64 && math.min(rw, rh) >= 1)
  }
}
