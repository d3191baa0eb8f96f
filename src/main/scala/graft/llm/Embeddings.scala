package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding preprocessing: PCA fit/project and whitening — the step
  * SemDeDup-style pipelines run before clustering or cosine thresholds
  * (decorrelated, variance-equalized embeddings make cosine thresholds
  * meaningful across dimensions, and a top-k projection shrinks the ANN
  * index payload 2-8× at negligible recall cost).
  *
  * Posture mirrors the IVF coarse quantizer ([[Similarity.trainCentroids]]):
  * the FIT runs on a deterministic bounded sample (`orderBy(id).limit(n)`,
  * collected — ≤ a few MB by construction) so the model is reproducible at
  * any parallelism; the PROJECTION is distributed and codegen-friendly —
  * the basis rides as array literals and each output component is one
  * [[graft.functions.VectorF.dot]] native loop. Eigen-decomposition is
  * cyclic Jacobi on the d×d covariance (d = embedding dim, driver-side,
  * microseconds at d = 64), eigenvalues descending, each eigenvector
  * sign-fixed (largest-|component| positive) so the basis is unique.
  */
object Embeddings {

  /** Mean-pool embeddings per group — the chunk→document step: long
    * documents embed as chunks ([[TextAnalysis.chunkTokens]]), retrieval
    * wants one vector per document, and the per-dimension mean is the
    * standard pooling. ONE hash aggregation on group via the native
    * array-buffered [[graft.functions.VecSumAgg]] — no explode, no
    * dimension-multiplied shuffle, no reassembly pass. Components round
    * to 6 for cross-engine compare (float summation order sits far
    * below that at corpus scale).
    * Returns (groupCol, pooled array<double>, n_chunks). */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    // ONE aggregation buffered as a single array per group (the native
    // VecSumAgg): map-side partials fold each partition to one array, so
    // the shuffle carries |groups| arrays instead of |groups|·dim rows —
    // the r13 replacement for the posexplode → (group, dim) → group
    // two-aggregation chain, value-identical at the rounded-6 rendering.
    // Empty/null vectors don't contribute (explode parity), and a group
    // with no contributing rows disappears like its exploded-form self.
    df.filter(size(col(vecCol)) > 0)
      .groupBy(groupCol)
      .agg(graft.functions.VecAggF.vecMean(col(vecCol), 6).as("pooled"),
        count(lit(1)).as("n_chunks"))

  /** PCA model: per-dimension mean, row-major basis (k × d, rows =
    * components, descending eigenvalue), eigenvalues (sample variances
    * along each component). */
  final case class PcaModel(mean: Array[Double], basis: Array[Array[Double]],
                            eigenvalues: Array[Double])

  /** Fit a k-component PCA on a deterministic bounded sample. */
  def pcaFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
             sampleN: Int = 4096): PcaModel = {
    require(k > 0, s"pcaFit: k must be positive, got $k")
    val rows = df.select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .limit(sampleN).select(col(vecCol)).collect()
      .map(_.getSeq[Any](0).map(x => x.asInstanceOf[Number].doubleValue()).toArray)
    require(rows.nonEmpty, "pcaFit: empty sample")
    val d = rows.head.length
    require(k <= d, s"pcaFit: k=$k exceeds dim $d")
    val n = rows.length
    val mean = new Array[Double](d)
    rows.foreach { r => var i = 0; while (i < d) { mean(i) += r(i); i += 1 } }
    var i = 0; while (i < d) { mean(i) /= n; i += 1 }
    // covariance (population, /n — the convention only scales eigenvalues)
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      var a = 0
      while (a < d) {
        val xa = r(a) - mean(a); var b = a
        while (b < d) { cov(a)(b) += xa * (r(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < d) {
      var b = a
      while (b < d) { cov(a)(b) /= n; cov(b)(a) = cov(a)(b); b += 1 }
      a += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // order components by descending eigenvalue, deterministic tie-break
    // on the original index; fix each vector's sign
    val order = values.indices.sortBy(i => (-values(i), i))
    val basis = order.take(k).map { ci =>
      val v = Array.tabulate(d)(r => vectors(r)(ci))
      val m = v.indices.maxBy(j => (math.abs(v(j)), -j))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, basis, order.take(k).map(values).toArray)
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). Deterministic sweep order;
    * converges quadratically (30 sweeps is far beyond need at d ≤ 1024). */
  private[llm] def jacobiEigen(mIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = mIn.length
    val m = mIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 30 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val mip = m(i)(p); val miq = m(i)(q)
              m(i)(p) = c * mip - s * miq
              m(i)(q) = s * mip + c * miq
              i += 1
            }
            i = 0
            while (i < d) {
              val mpi = m(p)(i); val mqi = m(q)(i)
              m(p)(i) = c * mpi - s * mqi
              m(q)(i) = s * mpi + c * mqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var a = 0
      while (a < d - 1) {
        var b = a + 1
        while (b < d) { off += m(a)(b) * m(a)(b); b += 1 }
        a += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => m(i)(i)), v)
  }

  private def centered(vecCol: String, mean: Array[Double]): Column = {
    val meanLit = array(mean.map(lit).toIndexedSeq: _*)
    zip_with(col(vecCol).cast("array<double>"), meanLit, (x, mu) => x - mu)
  }

  /** Distributed projection onto the fitted basis: `(id, proj)` with
    * `proj[j] = basis_j · (x - mean)` — k native dot loops per row, no
    * shuffle, no UDF. */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
                 model: PcaModel): DataFrame = {
    val c = centered(vecCol, model.mean)
    val comps = model.basis.map { b =>
      graft.functions.VectorF.dot(c, array(b.map(lit).toIndexedSeq: _*))
    }
    df.select(col(idCol).as("id"), array(comps.toIndexedSeq: _*).as("proj"))
  }

  /** PCA-whitening: each projected component scaled to unit sample
    * variance (`proj[j] / sqrt(eig_j + eps)`). */
  def whiten(df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
             eps: Double = 1e-9): DataFrame = {
    val scales = model.eigenvalues.map(e => 1.0 / math.sqrt(e + eps))
    val projected = pcaProject(df, idCol, vecCol, model)
    val scaleLit = array(scales.map(lit).toIndexedSeq: _*)
    projected.select(col("id"),
      zip_with(col("proj"), scaleLit, (p, s) => p * s).as("white"))
  }
}
