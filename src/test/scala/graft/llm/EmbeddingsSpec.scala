package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")

  private lazy val model = Embeddings.pcaFit(emb, "vec_id", "embedding", k = 64)
  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("pcaFit basis is orthonormal with descending eigenvalues") {
    for (i <- model.basis.indices; j <- i until model.basis.length) {
      val d = dot(model.basis(i), model.basis(j))
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"basis($i)·basis($j) = $d")
    }
    model.eigenvalues.sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-12)
      case _ =>
    }
    assert(model.eigenvalues.head > 0)
  }

  test("projected component variances equal the eigenvalues") {
    val proj = Embeddings.pcaProject(emb, "vec_id", "embedding", model)
      .select("proj").collect().map(_.getSeq[Double](0).toArray)
    val n = proj.length
    model.eigenvalues.zipWithIndex.foreach { case (eig, j) =>
      val mean = proj.map(_(j)).sum / n
      val v = proj.map(p => (p(j) - mean) * (p(j) - mean)).sum / n
      assert(math.abs(v - eig) <= 1e-6 * math.max(1.0, eig),
        s"component $j variance $v != eigenvalue $eig")
      // components are centered by construction (mean from the same rows)
      assert(math.abs(mean) < 1e-9)
    }
  }

  test("whitening yields unit variance per retained component") {
    val m8 = Embeddings.pcaFit(emb, "vec_id", "embedding", k = 8)
    val white = Embeddings.whiten(emb, "vec_id", "embedding", m8)
      .select("white").collect().map(_.getSeq[Double](0).toArray)
    val n = white.length
    (0 until 8).foreach { j =>
      val v = white.map(w => w(j) * w(j)).sum / n
      assert(math.abs(v - 1.0) < 1e-6, s"whitened component $j variance $v")
    }
  }

  test("full-basis projection reconstructs the centered vectors") {
    val orig = emb.orderBy("vec_id").limit(3).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val proj = Embeddings.pcaProject(emb.filter(col("vec_id") < 3),
        "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    proj.foreach { case (id, p) =>
      val rec = model.mean.indices.map(d =>
        model.mean(d) + p.indices.map(j => p(j) * model.basis(j)(d)).sum)
      rec.zip(orig(id)).foreach { case (r, o) =>
        assert(math.abs(r - o) < 1e-8, s"vec $id reconstruction")
      }
    }
  }

  test("fit is deterministic at any input partitioning") {
    val m1 = Embeddings.pcaFit(emb.repartition(13), "vec_id", "embedding", 4)
    val m2 = Embeddings.pcaFit(emb.repartition(1), "vec_id", "embedding", 4)
    assert(m1.mean.toSeq == m2.mean.toSeq)
    assert(m1.basis.map(_.toSeq).toSeq == m2.basis.map(_.toSeq).toSeq)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
  }

  test("config errors are loud") {
    intercept[IllegalArgumentException](
      Embeddings.pcaFit(emb, "vec_id", "embedding", k = 0))
    intercept[IllegalArgumentException](
      Embeddings.pcaFit(emb, "vec_id", "embedding", k = 65))
  }
}
