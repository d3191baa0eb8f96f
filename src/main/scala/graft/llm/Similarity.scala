package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — one scan, one
  *    `TakeOrderedAndProject`; the correctness baseline and fine whenever
  *    k·queries is small relative to the corpus.
  *  - [[lshTopK]]: random-hyperplane LSH — a deterministic 16-bit signature
  *    per vector (fixed seed), candidates restricted to the query's bucket
  *    and all buckets at Hamming distance ≤ 1. At 100 TB the signature is
  *    computed once at ingest and the bucket id becomes a partition
  *    column, so a query touches ~17/65536 of the data via partition
  *    pruning instead of a full scan.
  *
  * All math goes through [[graft.functions.VectorDot]], a native Catalyst
  * expression with codegen — Spark's higher-order array functions are
  * interpreted (CodegenFallback) and were ~50× slower on the hot paths.
  */
object Similarity {

  /** dot(a, b) over array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorF.dot(a, b)

  def norm(a: Column): Column = graft.functions.VectorF.norm(a)

  def cosine(a: Column, b: Column): Column = graft.functions.VectorF.cosine(a, b)

  /** Exact cosine top-k for one query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol).as("id"),
        round(cosine(col(vecCol), q), 6).as("cos"))
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)
  }

  // Deterministic hyperplanes (fixed seed): nBits × dim sign projections.
  private[llm] def hyperplanes(nBits: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(1234)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane signature: bit i = sign(v · plane_i). */
  def signature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, array(p.map(lit): _*)) > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Assign each vector its LSH bucket (materialize this at ingest and
    * `partitionBy` on it for pruned reads at scale). */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
                 nBits: Int = 16, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", signature(col("v"), planes))
  }

  /** ANN top-k via adaptive multi-probe LSH: start at the query's bucket
    * and expand the probe Hamming radius until at least `minCandidates`
    * vectors are in scope, then rerank by exact cosine. Each radius ring
    * is an enumerable set of bucket ids, so at scale every probe step is
    * a partition-PRUNED read (bucket = partition column), not a scan —
    * the radius only grows when the data is genuinely spread out. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, nBits: Int = 16,
              minCandidates: Int = 100): DataFrame = {
    val planes = hyperplanes(nBits, query.size)
    val qSig = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d > 0) 1L << i else 0L
    }.reduce(_ | _)
    val q = array(query.map(lit): _*)
    val bucketed = lshBuckets(df, idCol, vecCol, nBits, query.size)
    val hamming = bit_count(col("bucket").bitwiseXOR(lit(qSig)))
    // exponential radius expansion: each probe is one job, so doubling
    // reaches a populated ring in O(log nBits) jobs instead of O(nBits)
    var radius = 1
    var cands = bucketed.filter(hamming <= radius)
    while (radius < nBits && cands.limit(minCandidates).count() < minCandidates) {
      radius = math.min(radius * 2, nBits)
      cands = bucketed.filter(hamming <= radius)
    }
    cands
      .select(col("id"), round(cosine(col("v"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col("id").asc)
      .limit(k)
  }
}
