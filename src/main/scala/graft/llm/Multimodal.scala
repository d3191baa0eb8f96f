package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract operators.
  *
  * The Spark-side plumbing (schema, partition-preserving batch transform,
  * row shape) is real and tested; the actual codec step is STUBBED with a
  * deterministic fake (this container ships no image/audio libraries) —
  * see [[decodeStub]]. Swapping in a real decoder changes only that one
  * function: the operator shape — `mapPartitions` over an iterator so a
  * partition's worth of blobs streams through a reusable decoder context
  * without per-row setup cost — is exactly how a JNI/FFI decoder would be
  * mounted at 100 TB (decoder init amortized per partition, not per row).
  */
object Multimodal {

  /** Typed metadata carried alongside every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
  ))

  final case class MediaRecord(id: Long, payload: Array[Byte], kind: String)
  final case class DecodedFeatures(id: Long, kind: String, n_bytes: Long,
                                   checksum: Long, features: Array[Float])

  /** Wrap any string column as a media payload table: (id, payload binary,
    * kind, meta struct). Stands in for reading real blobs; the schema and
    * downstream operators are the real deliverable. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   kind: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("id"),
      col(payloadCol).cast(BinaryType).as("payload"),
      lit(kind).as("kind"),
      struct(
        lit(kind).as("kind"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        length(col(payloadCol).cast(BinaryType)).cast(LongType).as("n_bytes"),
      ).as("meta"))

  /** STUB decode: deterministic fake "decoder" — checksum + an 8-float
    * feature vector derived from the first bytes. A real implementation
    * replaces only this function body with the codec call. */
  private[llm] def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
    val feats = Array.tabulate(8) { j =>
      if (j < payload.length) (payload(j) & 0xff) / 255.0f else 0.0f
    }
    (sum, feats)
  }

  /** Decode + feature-extract over a media table. `mapPartitions`, not a
    * per-row UDF: the iterator shape lets a real decoder hold one native
    * context per partition (the batch shape Pandas-UDF users get in
    * PySpark). Stays fully distributed; output keeps the input
    * partitioning. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("payload"), col("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition decoder init would go here (amortized)
        it.map { case (id, payload, kind) =>
          val (checksum, feats) = decodeStub(payload)
          DecodedFeatures(id, kind, payload.length.toLong, checksum, feats)
        }
      }
  }

  /** Resize for image-kind payloads. The pixel resample is STUBBED (a
    * deterministic byte decimation to the target w×h byte budget); the
    * real deliverable is the operator shape — per-partition batch
    * transform that rewrites payload AND its typed metadata together, so
    * schema consumers downstream see consistent (payload, meta.width,
    * meta.height). */
  def resize(spark: SparkSession, media: DataFrame,
             width: Int, height: Int): DataFrame = {
    import spark.implicits._
    val resized = media.select(col("id"), col("payload"), col("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition image-library context would init here
        it.map { case (id, payload, kind) =>
          val target = math.max(1, math.min(payload.length, width * height))
          // ceil division: floor would keep payloads under 2x the budget
          // entirely unresized and overshoot the target by up to 2x
          val stride = math.max(1, (payload.length + target - 1) / target)
          val out = new Array[Byte]((payload.length + stride - 1) / stride)
          var i = 0
          while (i < out.length) { out(i) = payload(i * stride); i += 1 }
          (id, out, kind)
        }
      }.toDF("id", "payload", "kind")
    resized.select(col("id"), col("payload"), col("kind"),
      struct(
        col("kind"),
        lit(width).as("width"),
        lit(height).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        length(col("payload")).cast(LongType).as("n_bytes"),
      ).as("meta"))
  }

  /** Frame-sampling stub for video-kind payloads: emits every `stride`-th
    * 16-byte window as one "frame" row — the explode shape (one blob → N
    * frame rows) that a real frame sampler produces. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0L),
          greatest((length(col("payload")).cast(LongType).divide(16L * stride))
            .cast(LongType) - 1L, lit(0L)))))
      .select(col("id"), col("frame_idx"),
        col("payload").substr((col("frame_idx") * 16 * stride + 1).cast(IntegerType), lit(16))
          .as("frame_bytes"))
}
