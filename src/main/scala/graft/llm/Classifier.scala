package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality/domain classification — the fastText-style
  * filter every modern pretraining pipeline runs (CCNet, LLaMA,
  * RedPajama all gate documents on a small linear classifier's score):
  * logistic regression over a vector column, trained DISTRIBUTED with
  * full-batch gradient descent.
  *
  * Text corpora route through [[TextAnalysis.hashEmbed]] (hashed
  * token-count features) to get the vector column; embedding corpora
  * train directly. Inference is one codegen'd
  * [[graft.functions.VectorDot]] against the literal weight vector —
  * a map-only projection, no shuffle, the right 100 TB shape.
  *
  * Training scale shape: each GD iteration is ONE aggregation — the
  * per-row error `σ(w·x+b) − y` fans out over `posexplode` of the
  * bias-augmented feature vector and sums per dimension with map-side
  * combine, so the shuffle carries `dim+1` partial rows per task, and
  * only `dim+1` totals reach the driver. Features cache once; `iters`
  * passes over the cached columnar batch. No per-row driver state, no
  * parameter server — the model is dim+1 doubles.
  *
  * Determinism: weights are deterministic up to float summation order
  * (the gradient sum is a parallel reduction). Planted-margin data
  * yields identical PREDICTIONS at any parallelism — pinned by spec. */
object Classifier {

  final case class LrModel(weights: Array[Double], bias: Double) {
    def dim: Int = weights.length
  }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Full-batch GD logistic regression on (vecCol, 0/1 labelCol). */
  def lrTrain(df: DataFrame, vecCol: String, labelCol: String,
              iters: Int = 50, lr: Double = 2.0): LrModel = {
    require(iters > 0, s"lrTrain: iters must be positive, got $iters")
    require(lr > 0, s"lrTrain: lr must be positive, got $lr")
    // bias folds in as a constant 1.0 feature, so each iteration is ONE
    // exploded aggregation (dim+1 gradient components, bias included)
    val data = df.select(
      concat(col(vecCol).cast("array<double>"), array(lit(1.0))).as("x"),
      col(labelCol).cast("double").as("y")).cache()
    try {
      // One dimension-audit pass BEFORE anything reads a row: an empty
      // frame fails with the intended message (not head()'s bare
      // NoSuchElementException), and a corpus mixing vector lengths (or
      // carrying null vectors/labels) fails loudly here instead of its
      // rows silently dropping out of the gradient as null terms.
      val dims = data
        .select(size(col("x")).as("d"), col("y"))
        .groupBy("d").agg(count(lit(1)).as("c"), count(col("y")).as("cy"))
        .collect()
      require(dims.nonEmpty, "lrTrain: empty training set")
      require(dims.length == 1,
        s"lrTrain: inconsistent vector dimensions: ${
          dims.map(r => s"size=${r.get(0)}×${r.getLong(1)}").sorted.mkString(", ")}")
      require(dims.head.get(0) != null && dims.head.getInt(0) >= 2,
        "lrTrain: null or empty feature vectors in training set")
      require(dims.head.getLong(1) == dims.head.getLong(2),
        s"lrTrain: ${dims.head.getLong(1) - dims.head.getLong(2)} rows have null labels")
      val dim = dims.head.getInt(0) - 1
      val n = dims.head.getLong(1).toDouble
      var w = new Array[Double](dim + 1)
      var it = 0
      while (it < iters) {
        val err = sigmoid(graft.functions.VectorF.dot(col("x"),
          typedLit(w.toSeq))) - col("y")
        // the whole gradient as ONE array-buffered aggregation
        // (VecSumAgg: Σ err·x with map-side partials) — the r12 shape
        // exploded dim+1 rows per record and shuffled per-dimension keys
        val grad = data.agg(graft.functions.VecAggF.vecSum(col("x"), err))
          .head().getSeq[Double](0)
        w = w.zipWithIndex.map { case (wi, d) => wi - lr / n * grad(d) }
        it += 1
      }
      LrModel(w.init, w.last)
    } finally { data.unpersist(); () }
  }

  /** `(id, score)` — σ(w·x + b) rounded to 6, one map-only projection. */
  def lrScore(df: DataFrame, idCol: String, vecCol: String,
              model: LrModel): DataFrame =
    df.select(col(idCol).as("id"),
      round(sigmoid(graft.functions.VectorF.dot(col(vecCol),
        typedLit(model.weights.toSeq)) + lit(model.bias)), 6).as("score"))

  /** `(id, label)` — score ≥ 0.5. */
  def lrPredict(df: DataFrame, idCol: String, vecCol: String,
                model: LrModel): DataFrame =
    lrScore(df, idCol, vecCol, model)
      .select(col("id"), (col("score") >= 0.5).as("label"))

  /** Fraction of rows whose prediction matches the 0/1 label. */
  def accuracy(df: DataFrame, idCol: String, vecCol: String,
               labelCol: String, model: LrModel): Double = {
    val joined = lrPredict(df, idCol, vecCol, model)
      .join(df.select(col(idCol).as("id"),
        (col(labelCol).cast("double") >= 0.5).as("truth")), "id")
    joined.agg(avg(when(col("label") === col("truth"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
  }
}
