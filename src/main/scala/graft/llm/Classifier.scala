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
    // data is deliberately NOT cached: only the primitive RDD below is
    // (one full training-set copy in executor storage, not two — the
    // DataFrame is consumed exactly twice, once by the dims audit and
    // once by the RDD build, and each is a single cheap source pass)
    val data = df.select(
      concat(col(vecCol).cast("array<double>"), array(lit(1.0))).as("x"),
      col(labelCol).cast("double").as("y"))
    locally {
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
      // the GD loop runs treeAggregate over a cached primitive RDD —
      // the MLlib training shape. The former per-iteration DataFrame
      // aggregate embedded the weights as plan literals, so every one
      // of the `iters` passes re-ran Catalyst optimize + whole-stage
      // codegen compile on a fresh plan (~2 scheduler jobs each; the
      // profile read 69 jobs for 0.18 s of task work). A closure over
      // cached double arrays is the documented training-boundary
      // exception to the no-closures rule (the mapPartitions-at-codec/
      // training-boundaries convention) — per-partition partials, one
      // job per iteration, no per-iteration planning. Weights remain
      // deterministic up to float summation order, as before.
      val rdd = data.select(col("x"), col("y"))
        .rdd.map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        var w = new Array[Double](dim + 1)
        var it = 0
        while (it < iters) {
          val wB = w
          val grad = rdd.treeAggregate(new Array[Double](dim + 1))(
            seqOp = { (acc, xy) =>
              val (x, y) = xy
              var z = 0.0
              var i = 0
              while (i < x.length) { z += wB(i) * x(i); i += 1 }
              val err = 1.0 / (1.0 + math.exp(-z)) - y
              i = 0
              while (i < x.length) { acc(i) += err * x(i); i += 1 }
              acc
            },
            combOp = { (a, b) =>
              var i = 0
              while (i < a.length) { a(i) += b(i); i += 1 }
              a
            })
          w = w.zipWithIndex.map { case (wi, d) => wi - lr / n * grad(d) }
          it += 1
        }
        LrModel(w.init, w.last)
      } finally { rdd.unpersist(); () }
    }
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

  /** Fraction of rows whose prediction matches the 0/1 label. One
    * map-only projection + scalar aggregate: prediction and truth come
    * off the SAME row, so the former self-join (a full id-keyed
    * shuffle of the corpus to re-attach a column the row already had)
    * is dropped — same value, zero exchanges (guide §2.4). The
    * prediction replicates [[lrScore]] exactly: round to 6 THEN
    * threshold. */
  def accuracy(df: DataFrame, idCol: String, vecCol: String,
               labelCol: String, model: LrModel): Double = {
    val pred = round(sigmoid(graft.functions.VectorF.dot(col(vecCol),
      typedLit(model.weights.toSeq)) + lit(model.bias)), 6) >= 0.5
    val truth = col(labelCol).cast("double") >= 0.5
    df.agg(avg(when(pred === truth, 1.0).otherwise(0.0)))
      .head().getDouble(0)
  }
}
