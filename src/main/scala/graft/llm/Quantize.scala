package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the standard memory-compression step for
  * ANN serving at scale: a float32 corpus quantized symmetrically per
  * vector (`q_i = round(v_i / scale)`, `scale = max|v_i| / 127`) shrinks
  * 4× on disk and in executor memory, which at 100 TB of embeddings is
  * the difference between a cache-resident index and one that thrashes.
  *
  * COSINE over quantized vectors needs NO dequantization and no scale:
  * `cos(q, query)` equals the approximate `cos(v, query)` directly,
  * because the per-vector scale cancels in the cosine ratio. The probe
  * path therefore runs the SAME native codegen'd
  * [[graft.functions.VectorDot]] loop as the float path (extended to read
  * `array<tinyint>` elements), so a quantized corpus drops into
  * [[Similarity.bruteForceTopK]]/[[Similarity.bruteForceTopKBatch]]
  * unchanged — one operator family, two storage precisions.
  *
  * The quantize pass itself is a one-time row-local projection (higher-
  * order `transform`, interpreted — acceptable off the probe path; the
  * HOT path, scoring, is the native loop). Zero vectors quantize to all
  * zeros (their cosine is NULL-excluded by the probe guards, matching the
  * float path's zero-norm handling).
  *
  * INDEX CHOICE over quantized codes (spec-pinned in LlmSpec): hyperplane
  * LSH is the natural fit — sign bits are invariant to the positive
  * per-vector scale, so a quantized LSH index probes exactly like the
  * float one at 1/4 the size. IVF still works mechanically, but the
  * per-vector rescaling distorts the EUCLIDEAN list geometry kmeans
  * partitions (every code vector is stretched to max|q| = 127), so
  * list-probing recall at a float-tuned nprobe degrades — widen nprobe
  * (~3x) or index floats and quantize only the serving copy.
  */
object Quantize {

  /** Per-vector symmetric int8 scale: `max|v_i| / 127`, 0 for a zero or
    * empty vector. */
  def int8Scale(vec: Column): Column =
    coalesce(
      array_max(org.apache.spark.sql.functions.transform(vec, x => abs(x))),
      lit(0.0)).cast("double") / 127.0

  /** Quantize `vec` to `array<tinyint>` with the given per-row scale.
    * A zero scale yields all-zero codes (no NaN/cast traps). */
  def int8Codes(vec: Column, scale: Column): Column =
    org.apache.spark.sql.functions.transform(vec,
      x => when(scale === 0.0, lit(0.toByte))
        .otherwise(round(x.cast("double") / scale).cast("tinyint")))

  /** Add `<prefix>scale` (double) and `<prefix>codes` (array<tinyint>)
    * columns quantizing `vecCol`. */
  def quantizeInt8(df: DataFrame, vecCol: String,
                   prefix: String = "q_"): DataFrame = {
    val s = int8Scale(col(vecCol))
    df.withColumn(s"${prefix}scale", s)
      .withColumn(s"${prefix}codes", int8Codes(col(vecCol), col(s"${prefix}scale")))
  }

  /** Reconstruct the approximate float vector: `q_i * scale`. */
  def dequantize(codes: Column, scale: Column): Column =
    org.apache.spark.sql.functions.transform(codes,
      q => q.cast("double") * scale)

  /** Worst-case per-element reconstruction error of a row's quantization:
    * `scale / 2` (round-to-nearest over step `scale`). A monitoring
    * column, not a probe-path op. */
  def maxAbsError(scale: Column): Column = scale / 2.0
}
