package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns for a training-data pipeline: image/audio/video
 * payloads ride as opaque `binary` columns with a typed metadata struct;
 * decode / feature-extract / resize / frame-sample run as BATCHED
 * per-partition passes (the JVM analog of `mapInPandas`: one buffer of rows
 * per call, not row-at-a-time UDFs), so a real codec drops in without
 * touching the plan shape.
 *
 * The actual codecs are STUBBED (this container ships no image/audio
 * libraries): [[StubCodec]] is a deterministic fake — md5-seeded pixels,
 * byte-length-derived durations — clearly marked and swappable. Everything
 * Spark-side (schema, partitioning, batch shape, null handling, metadata
 * propagation) is real and tested.
 */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("sha1", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach a media payload column (binary) + derived typed metadata.
   * Width/height/duration come from the (stub) header probe. */
  def withMediaMeta(df: DataFrame, payload: String = "payload",
      kind: String = "image"): DataFrame = {
    val p = col(payload)
    df.withColumn("media_meta", struct(
      lit(kind).as("kind"),
      lit("stub").as("format"),
      StubCodec.probeWidth(p).as("width"),
      StubCodec.probeHeight(p).as("height"),
      (length(p).cast("long") * 10).as("duration_ms"),
      sha1(p).as("sha1"),
      length(p).cast("long").as("n_bytes")))
  }

  /**
   * Deterministic stand-in for a real decoder. A production build replaces
   * this object with JNI/javacv bindings; the pipeline code does not change.
   */
  object StubCodec {
    // ??? in spirit: header probes derived from payload bytes so tests are
    // deterministic without a codec library
    def probeWidth(payload: Column): Column =
      (abs(xxhash64(payload)) % 1920 + 16).cast("int")
    def probeHeight(payload: Column): Column =
      (abs(xxhash64(payload, lit(1))) % 1080 + 16).cast("int")

    /** Fake per-image feature vector: 8 floats folded from the bytes.
     * Replace with a real embedding model at deployment. */
    def features(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        out(i % 8) = out(i % 8) + (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out.map(v => v / math.max(1, payload.length / 8).toFloat)
    }
  }

  private val featSchema = ArrayType(FloatType, containsNull = false)

  /**
   * Batched feature extraction: one pass per partition, rows buffered and
   * processed in fixed-size batches (the mapInPandas batch shape) — a real
   * codec amortizes model/codec init per batch, not per row.
   */
  def extractFeatures(df: DataFrame, payload: String = "payload",
      batchSize: Int = 256): DataFrame = {
    val schema = df.schema.add("media_features", featSchema)
    val idx = df.schema.fieldIndex(payload)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch "codec init" happens here in a real implementation
        batch.iterator.map { r =>
          val bytes = if (r.isNullAt(idx)) Array.empty[Byte]
            else r.getAs[Array[Byte]](idx)
          Row.fromSeq(r.toSeq :+ StubCodec.features(bytes))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Frame sampling for video payloads: every `everyMs` ms of (stub)
   * duration yields one frame row — pure Catalyst explode, no UDF. */
  def sampleFrames(df: DataFrame, everyMs: Long = 1000): DataFrame =
    df.withColumn("frame_ts_ms",
      explode(sequence(lit(0L), col("media_meta.duration_ms"), lit(everyMs))))
      .withColumn("frame_id",
        concat(col("media_meta.sha1"), lit("#"), col("frame_ts_ms")))

  /** "Resize": metadata-level transform (target dims recorded; payload
   * untouched until a real codec is plugged in). */
  def resizeMeta(df: DataFrame, maxDim: Int): DataFrame = {
    val w = col("media_meta.width"); val h = col("media_meta.height")
    val scale = least(lit(1.0), lit(maxDim) / greatest(w, h).cast("double"))
    df.withColumn("resized_width", floor(w * scale).cast("int"))
      .withColumn("resized_height", floor(h * scale).cast("int"))
  }
}
