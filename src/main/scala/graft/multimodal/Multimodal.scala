package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches. The Spark-side contract — schema, partitioning, batch
  * shape — is real and tested; the actual media decode is STUBBED
  * (`decodeStub`) because no image/audio codec ships in this
  * environment: swap `decodeStub` for a real decoder without touching
  * the plumbing.
  *
  * At scale the payload column stays columnar in parquet (binary),
  * `spark.sql.files.maxPartitionBytes` bounds task memory, and the
  * decode runs once per partition batch — the same shape a Pandas-UDF
  * `mapInPandas` pipeline has in PySpark.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta_width", IntegerType),
    StructField("meta_height", IntegerType),
    StructField("meta_duration_ms", IntegerType)))

  /** STUB decode: a real implementation would parse the codec header.
    * This deterministic fake derives pseudo-dimensions from payload
    * bytes so tests can assert exact values end-to-end. */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    val h = payload.foldLeft(17)((a, b) => a * 31 + b) & 0x7fffffff
    kind match {
      case "image" => (64 + h % 1024, 64 + (h / 1024) % 1024, 0)
      case "audio" => (0, 0, 1000 + h % 600000)
      case "video" => (64 + h % 1920, 64 + (h / 1920) % 1080,
        1000 + (h / 7) % 600000)
      case _ => (0, 0, 0)
    }
  }

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** Batch decode + feature extraction over (media_id, kind, payload)
    * rows: one pass per partition, no driver collection. The "feature"
    * is a stub 8-dim byte-histogram embedding. */
  def decodeAndFeaturize(media: DataFrame): DataFrame = {
    val idI = media.columns.indexOf("media_id")
    val kindI = media.columns.indexOf("kind")
    val payI = media.columns.indexOf("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payI)
        val kind = r.getString(kindI)
        val (w, h, d) = decodeStub(kind, payload)
        val hist = new Array[Float](8)
        payload.foreach(b => hist((b & 0xff) / 32) += 1f)
        val n = math.max(payload.length, 1).toFloat
        Row(r.getLong(idI), kind, payload.length, w, h, d,
          hist.map(_ / n).toSeq)
      }
    }(RowEncoder.encoderFor(featSchema))
  }

  /** Frame sampling stub for video payloads: every `everyMs` ms up to
    * the stub duration — the explode shape (1 video → N frame rows) a
    * real sampler has. */
  def sampleFrames(media: DataFrame, everyMs: Int): DataFrame =
    decodeAndFeaturize(media)
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("duration_ms"), lit(everyMs)))
          .as("frame_ts_ms"))

  private val resizedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Resize stub: a real implementation decodes + rescales pixels; the
    * stub emits a deterministic payload whose SIZE scales with the
    * target box (so tests can assert the contract) while the batch
    * shape — per-partition pass, binary in/binary out, bounded output
    * size — is exactly what a real resizer has. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val idI = media.columns.indexOf("media_id")
    val kindI = media.columns.indexOf("kind")
    val payI = media.columns.indexOf("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payI)
        val kind = r.getString(kindI)
        val (w, h, _) = decodeStub(kind, payload)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / math.max(w, 1),
            maxH.toDouble / math.max(h, 1)))
        val (nw, nh) = (math.max(1, (w * scale).toInt),
          math.max(1, (h * scale).toInt))
        // stub "pixels": payload cycled to the new byte budget (an
        // empty payload yields zero-filled output — no modulo indexing
        // into a zero-length array)
        val out = new Array[Byte](math.max(1, nw * nh / 64))
        if (payload.length > 0) {
          var i = 0
          while (i < out.length) {
            out(i) = payload(i % payload.length); i += 1
          }
        }
        Row(r.getLong(idI), kind, nw, nh, out)
      }
    }(RowEncoder.encoderFor(resizedSchema))
  }
}
