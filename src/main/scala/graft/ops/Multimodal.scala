package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns for a training-data pipeline: image/audio/video
 * payloads ride as opaque `binary` columns with a typed metadata struct;
 * decode / feature-extract / resize / frame-sample run as BATCHED
 * per-partition passes (the JVM analog of `mapInPandas`: one buffer of rows
 * per call, not row-at-a-time UDFs), so a heavier codec drops in without
 * touching the plan shape.
 *
 * Since round 4 the header probe is REAL: [[HeaderProbe]] parses PNG IHDR,
 * JPEG SOF and GIF logical-screen-descriptor dimensions straight from
 * payload bytes (no codec library needed), and [[extractFeatures]] attempts
 * a full `javax.imageio` decode (PNG/JPEG/GIF/BMP ship with the JDK) before
 * falling back to the deterministic byte-fold stub for payloads no JDK
 * reader accepts. Only the embedding model itself remains a stand-in.
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

  /**
   * Pure-JVM container-header parser: true (format, width, height) from
   * payload bytes for PNG / JPEG / GIF, (null, null, null) for anything
   * unrecognized. Reads only the header region — O(header) per payload, no
   * decode, no external library.
   */
  object HeaderProbe {
    /** Boxed so unknowns surface as SQL NULLs, not 0s. */
    final case class Probe(format: String, width: Integer, height: Integer)
    val unknown: Probe = Probe(null, null, null)

    def probe(b: Array[Byte]): Probe = {
      @inline def u8(i: Int): Int = b(i) & 0xff
      @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      @inline def be32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)

      // PNG: 8-byte signature, IHDR is always the first chunk — width and
      // height are the big-endian 32-bit words at offsets 16 and 20.
      if (b.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
          u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
          u8(7) == 0x0a && u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' &&
          u8(15) == 'R') {
        Probe("png", be32(16), be32(20))
      }
      // JPEG: SOI then a marker-segment walk to the first SOF (C0-CF minus
      // DHT C4 / JPG C8 / DAC CC), whose payload is precision(1) height(2)
      // width(2).
      else if (b.length >= 2 && u8(0) == 0xff && u8(1) == 0xd8) {
        @inline def isSof(m: Int): Boolean =
          m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        var i = 2
        while (i + 3 < b.length) {
          if (u8(i) != 0xff) return Probe("jpeg", null, null)
          val m = u8(i + 1)
          if (m == 0xff) { i += 1 } // fill byte
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) { i += 2 } // bare
          else {
            if (isSof(m)) {
              return if (i + 8 < b.length)
                Probe("jpeg", be16(i + 7), be16(i + 5))
              else Probe("jpeg", null, null)
            }
            i += 2 + be16(i + 2) // skip marker + length-prefixed payload
          }
        }
        Probe("jpeg", null, null)
      }
      // GIF: "GIF87a"/"GIF89a" then the logical screen descriptor's
      // little-endian 16-bit width and height.
      else if (b.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
          u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
        Probe("gif", le16(6), le16(8))
      }
      else unknown
    }
  }

  /** Attach derived typed metadata for a media payload column (binary).
   * Width/height/format come from the REAL header parse ([[HeaderProbe]]);
   * duration stays a byte-length-derived stand-in (no container/av codec
   * in this build). One batched per-partition pass, digest reused across
   * the partition. */
  def withMediaMeta(df: DataFrame, payload: String = "payload",
      kind: String = "image"): DataFrame = {
    val schema = df.schema.add("media_meta", mediaMetaType, nullable = false)
    val idx = df.schema.fieldIndex(payload)
    df.mapPartitions { it =>
      val sha = java.security.MessageDigest.getInstance("SHA-1")
      it.map { r =>
        val bytes =
          if (r.isNullAt(idx)) Array.empty[Byte] else r.getAs[Array[Byte]](idx)
        val p = HeaderProbe.probe(bytes)
        sha.reset()
        val shaHex = sha.digest(bytes).map("%02x".format(_)).mkString
        Row.fromSeq(r.toSeq :+ Row(kind, p.format, p.width, p.height,
          bytes.length.toLong * 10, shaHex, bytes.length.toLong))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /**
   * Image feature extraction. The decode is REAL where the JDK can read
   * the container (`javax.imageio`: PNG/JPEG/GIF/BMP/WBMP): 8 deterministic
   * image statistics — mean R/G/B, mean luma, bright-pixel fraction,
   * normalized width/height, log-scaled pixel count. Payloads no reader
   * accepts fall back to [[StubCodec.features]] (deterministic byte fold),
   * so the column is total either way. A learned embedding model would
   * replace [[imageStats]]; the plumbing would not change.
   */
  def imageStats(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    var r = 0.0; var g = 0.0; var b = 0.0; var luma = 0.0; var bright = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        val pr = (px >> 16) & 0xff; val pg = (px >> 8) & 0xff; val pb = px & 0xff
        r += pr; g += pg; b += pb
        val l = 0.299 * pr + 0.587 * pg + 0.114 * pb
        luma += l
        if (l > 128.0) bright += 1
        x += 1
      }
      y += 1
    }
    val n = math.max(1L, w.toLong * h)
    Array(
      (r / n / 255.0).toFloat, (g / n / 255.0).toFloat, (b / n / 255.0).toFloat,
      (luma / n / 255.0).toFloat, (bright.toDouble / n).toFloat,
      (w / 4096.0).toFloat, (h / 4096.0).toFloat,
      (math.log1p(n.toDouble) / math.log1p(4096.0 * 4096.0)).toFloat)
  }

  /** Deterministic stand-in features for payloads the JDK cannot decode. */
  object StubCodec {
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
   * processed in fixed-size batches (the mapInPandas batch shape) — codec
   * and model state amortize per batch, not per row. Real `ImageIO` decode
   * first; byte-fold stub only when no JDK reader accepts the payload.
   */
  def extractFeatures(df: DataFrame, payload: String = "payload",
      batchSize: Int = 256): DataFrame = {
    val schema = df.schema.add("media_features", featSchema)
    val idx = df.schema.fieldIndex(payload)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec/model init would happen here
        batch.iterator.map { r =>
          val bytes = if (r.isNullAt(idx)) Array.empty[Byte]
            else r.getAs[Array[Byte]](idx)
          val feats =
            try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              if (img != null) imageStats(img) else StubCodec.features(bytes)
            } catch { case _: java.io.IOException => StubCodec.features(bytes) }
          Row.fromSeq(r.toSeq :+ feats)
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
   * untouched — a real resample plugs into [[extractFeatures]]' batch
   * pass). Null dims (unparseable header) stay null. */
  def resizeMeta(df: DataFrame, maxDim: Int): DataFrame = {
    val w = col("media_meta.width"); val h = col("media_meta.height")
    val scale = least(lit(1.0), lit(maxDim) / greatest(w, h).cast("double"))
    df.withColumn("resized_width", floor(w * scale).cast("int"))
      .withColumn("resized_height", floor(h * scale).cast("int"))
  }
}
