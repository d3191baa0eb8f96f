package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., PAMI'11 — the FAISS-standard
  * ANN memory shape): split each vector into `m` subvectors, k-means
  * each subspace to `k` codewords, store one byte per subvector. A
  * 64-dim float vector becomes `m` bytes — 32× smaller at m=8 — and
  * query scoring never decodes: ADC (asymmetric distance computation)
  * precomputes the query's dot product against every codeword
  * (an m×k table, driver-side, microseconds) and scores a row as `m`
  * table lookups.
  *
  * Everything is built from the existing primitives — no new
  * expression: encoding is per-subspace `argmin` over codeword
  * distances (`slice` + native [[graft.functions.VectorF.dot]] against
  * codeword literals, `array_min` over (dist, k) structs — all
  * codegen'd), and ADC scoring is a sum of `element_at` lookups into
  * the flattened table literal. Training mirrors the
  * [[Embeddings.pcaFit]] posture: deterministic bounded sample,
  * seeded driver k-means per subspace, so the codebook is reproducible
  * at any parallelism.
  *
  * Accuracy contract: ADC is an approximation (quantization error per
  * subspace); the spec pins recall vs exact top-k on natural queries
  * and exactness on planted duplicate cliques (identical vectors share
  * codes, so their ADC scores tie at the top by construction). */
object Pq {

  /** codebooks(m)(k) = the k-th codeword of subspace m (subDim doubles). */
  final case class PqModel(m: Int, k: Int, subDim: Int,
                           codebooks: Array[Array[Array[Double]]]) {
    def compression(bytesPerFloat: Int = 4): Double =
      (subDim.toLong * m * bytesPerFloat).toDouble / m
  }

  /** Train an (m × k) codebook on a deterministic bounded sample. */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
              m: Int, k: Int, trainSample: Int = 4096): PqModel = {
    require(m > 0 && k > 1 && k <= 256, "pqTrain: need m > 0, 1 < k <= 256")
    val sample = df.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(trainSample)
      .collect().map(_.getSeq[Any](1).map {
        case f: Float => f.toDouble; case d: Double => d
        case n: Number => n.doubleValue()
      }.toArray)
    require(sample.nonEmpty, "pqTrain: empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"pqTrain: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val books = Array.tabulate(m) { mi =>
      val subs = sample.map(v => v.slice(mi * subDim, (mi + 1) * subDim))
      kmeansLocal(subs, k, seed = 42L + mi)
    }
    PqModel(m, k, subDim, books)
  }

  /** Seeded Lloyd k-means on driver-resident subvectors (≤ trainSample ×
    * subDim doubles — bytes, not gigabytes). Empty clusters re-seed from
    * the farthest point, so exactly `k` codewords always come back. */
  private def kmeansLocal(xs: Array[Array[Double]], k: Int,
                          seed: Long, iters: Int = 20): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val n = xs.length
    var centers = Array.tabulate(k)(i => xs(
      if (n >= k) (i.toLong * n / k).toInt else rnd.nextInt(n)).clone())
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    var it = 0
    while (it < iters) {
      val assign = xs.map { x =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < k) { val dd = d2(x, centers(c)); if (dd < bd) { bd = dd; best = c }; c += 1 }
        best
      }
      centers = Array.tabulate(k) { c =>
        val members = xs.indices.filter(assign(_) == c)
        if (members.isEmpty) {
          // re-seed from the point farthest from its center
          val far = xs.indices.maxBy(i => d2(xs(i), centers(assign(i))))
          xs(far).clone()
        } else {
          val acc = new Array[Double](xs.head.length)
          members.foreach { i =>
            var j = 0; while (j < acc.length) { acc(j) += xs(i)(j); j += 1 }
          }
          acc.map(_ / members.size)
        }
      }
      it += 1
    }
    centers
  }

  /** (id, codes array<tinyint>): per-subspace nearest codeword. One
    * row-local projection — m·k native dot loops per row, no shuffle. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               model: PqModel): DataFrame = {
    val codeCols: Seq[Column] = (0 until model.m).map { mi =>
      val sub = slice(col(vecCol), mi * model.subDim + 1, model.subDim)
      val cands = array((0 until model.k).map { ki =>
        val cw = model.codebooks(mi)(ki)
        val cwNorm2 = cw.map(x => x * x).sum
        // argmin ||x - c||² ⇔ argmin (-2·x·c + ||c||²); ties break to
        // the smaller k through the (dist, k) struct order
        struct(
          (lit(-2.0) * graft.functions.VectorF.dot(sub, typedLit(cw.toSeq))
            + lit(cwNorm2)).as("d"),
          lit(ki).as("k"))
      }: _*)
      array_min(cands).getField("k").cast("byte")
    }
    df.select(col(idCol).as("id"), array(codeCols: _*).as("codes"))
  }

  /** ADC top-k: score = Σ_m table[m][codes[m]] where table[m][k] =
    * query_m · codeword_{m,k} (computed once, driver-side). The scan is
    * a map-only projection of m `element_at` lookups into the flattened
    * table literal + the bounded-heap top-k aggregate — no decode, no
    * shuffle beyond the k-row result. */
  def pqTopK(codesDf: DataFrame, model: PqModel, query: Seq[Double],
             k: Int): DataFrame = {
    require(query.size == model.m * model.subDim,
      s"pqTopK: query dim ${query.size} != ${model.m * model.subDim}")
    val flat: Seq[Double] = for {
      mi <- 0 until model.m
      ki <- 0 until model.k
    } yield {
      val q = query.slice(mi * model.subDim, (mi + 1) * model.subDim)
      val cw = model.codebooks(mi)(ki)
      q.zip(cw).map { case (a, b) => a * b }.sum
    }
    val table = typedLit(flat)
    val score = (0 until model.m).map { mi =>
      element_at(table,
        element_at(col("codes"), mi + 1).cast("int") + mi * model.k + 1)
    }.reduce(_ + _)
    codesDf
      .select(graft.functions.TopKF.topKByScore(
        round(score, 6), col("id"), k).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.id").as("id"), col("e.score").as("adc"))
  }
}
