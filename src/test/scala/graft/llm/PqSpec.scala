package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")

  test("identical vectors share codes; planted clique ties at the ADC top") {
    val planted = emb.filter($"vec_id" === 0)
      .select(explode(sequence(lit(1L), lit(5L))).as("r"), $"embedding")
      .select(($"r" + 100000L).as("vec_id"), $"embedding")
    val corpus = emb.unionByName(planted)
    val model = Pq.pqTrain(corpus, "vec_id", "embedding", m = 8, k = 16)
    val codes = Pq.pqEncode(corpus, "vec_id", "embedding", model)
    val cliqueCodes = codes.filter($"id" === 0L || $"id" > 100000L)
      .select("codes").collect().map(_.getSeq[Byte](0))
    assert(cliqueCodes.length == 6)
    assert(cliqueCodes.distinct.length == 1, "identical vectors must share codes")
    // every code addresses a real codeword
    codes.select(explode($"codes")).as[Byte].collect()
      .foreach(c => assert(c >= 0 && c < 16))
    // ADC for vec 0's own query: the 6 clique members tie at the top
    val q = emb.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val top = Pq.pqTopK(codes, model, q, 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(top.map(_._1).toSet == (Set(0L) ++ (1 to 5).map(_ + 100000L)))
    assert(top.map(_._2).distinct.length == 1, "clique ADC scores must tie")
  }

  test("ADC recall vs exact top-k on natural queries; deterministic at any parallelism") {
    // k=64 codewords/subspace (6 bits) — the usual accuracy knob; these
    // synthetic embeddings have weakly-separated neighbors, so recall
    // here is a conservative floor for real embedding geometry
    val model = Pq.pqTrain(emb, "vec_id", "embedding", m = 8, k = 64)
    val codes = Pq.pqEncode(emb, "vec_id", "embedding", model)
    val recalls = (1 to 5).map { qid =>
      val q = emb.filter($"vec_id" === qid).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val pq = Pq.pqTopK(codes, model, q, 10).collect().map(_.getLong(0)).toSet
      (exact & pq).size / 10.0
    }
    assert(recalls.sum / recalls.size >= 0.5,
      s"mean ADC recall@10 too low: $recalls")
    // codes and scores are identical at any input partitioning
    val q0 = emb.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val a = Pq.pqTopK(Pq.pqEncode(emb.repartition(1), "vec_id", "embedding", model),
      model, q0, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Pq.pqTopK(Pq.pqEncode(emb.repartition(7), "vec_id", "embedding", model),
      model, q0, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
    // memory shape: 8 bytes/vector vs 64 floats = 32x
    assert(model.compression() == 32.0)
    // dimension guards
    intercept[IllegalArgumentException] { Pq.pqTopK(codes, model, q0.take(3), 5) }
    intercept[IllegalArgumentException] {
      Pq.pqTrain(emb, "vec_id", "embedding", m = 7, k = 16) // 64 % 7 != 0
    }
  }

  test("IVF+PQ: planted clique served from pruned lists; probe prunes partitions") {
    val planted = emb.filter($"vec_id" === 0)
      .select(explode(sequence(lit(1L), lit(5L))).as("r"), $"embedding")
      .select(($"r" + 100000L).as("vec_id"), $"embedding")
    val corpus = emb.unionByName(planted)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Pq.ivfPqBuild(corpus, "vec_id", "embedding", dir, kLists = 8, m = 8, k = 16)
    val q = emb.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    // identical vectors co-assign (same nearest centroid) and share
    // codes, so nprobe=1 already covers the whole clique
    val top = Pq.ivfPqQuery(spark, dir, q, 6, nprobe = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(top.map(_._1).toSet == (Set(0L) ++ (1 to 5).map(_ + 100000L)))
    assert(top.map(_._2).distinct.length == 1)
    // the probe read is partition-pruned to the probed lists
    val probe = Pq.ivfPqQuery(spark, dir, q, 6, nprobe = 1)
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("list"),
      s"probe must prune list partitions:\n$scan")
    // a wider probe still serves the clique; results identical
    val wide = Pq.ivfPqQuery(spark, dir, q, 6, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(wide == top.map(_._1).toSet)
  }

  test("IVF+PQ filtered: predicate pushes into the pruned ADC read, widens until k eligible, append carries metadata") {
    val planted = emb.filter($"vec_id" === 0)
      .select(explode(sequence(lit(1L), lit(10L))).as("r"), $"embedding")
      .select(($"r" + 100000L).as("vec_id"), $"embedding")
    val corpus = emb.unionByName(planted)
      .withColumn("flag", (col("vec_id") % 2).cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpqf").toString
    Pq.ivfPqBuild(corpus.filter($"vec_id" =!= 100010L), "vec_id", "embedding",
      dir, kLists = 8, m = 8, k = 16, metaCols = Seq("flag"))
    val q = emb.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    // append the last clique copy WITH its metadata (re-derived from the
    // live index) — it must serve through the filtered probe
    Pq.ivfPqAppend(corpus.filter($"vec_id" === 100010L),
      "vec_id", "embedding", dir)
    val probe = Pq.ivfPqQueryFiltered(spark, dir, q, 6,
      col("flag") === 0, nprobe = 1)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(flag,0\\).*"),
      plan.take(3000))
    assert(plan.contains("PartitionFilters") && plan.contains("list"),
      s"filtered probe must stay list-pruned:\n$plan")
    val top = probe.collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(top.map(_._1).toSet ==
      (Set(0L) ++ (1 to 5).map(r => 100000L + 2L * r)), top.mkString(","))
    assert(top.map(_._2).distinct.length == 1, "even clique ADC must tie")
    // a selective predicate widens to the full probe and still answers:
    // the only eligible rows are served even though list 0's slice is dry
    val selective = Pq.ivfPqQueryFiltered(spark, dir, q, 3,
      col("id") % 100 === 37L, nprobe = 1)
      .collect().map(_.getLong(0))
    assert(selective.length == 3 && selective.forall(_ % 100 == 37L))
    // reserved-name guard
    intercept[IllegalArgumentException](Pq.ivfPqBuild(corpus, "vec_id",
      "embedding", s"$dir-bad", metaCols = Seq("codes")))
  }

  test("codeword ids >= 128 store as negative bytes and decode unsigned in ADC") {
    // synthetic codebook where codeword ki of each 1-dim subspace IS the
    // value ki — encoding picks the id equal to the (integer) input, so
    // ids above 127 are forced and wrap negative in the byte storage
    val books = Array.tabulate(2, 256)((_, ki) => Array(ki.toDouble))
    val model = Pq.PqModel(m = 2, k = 256, subDim = 1, codebooks = books)
    val df = Seq((1L, Seq(200.0, 37.0)), (2L, Seq(129.0, 255.0))).toDF("id", "v")
    val codes = Pq.pqEncode(df, "id", "v", model)
    val stored = codes.orderBy("id").collect().map(_.getSeq[Byte](1))
    assert(stored(0) == Seq((-56).toByte, 37.toByte), "200 must wrap negative")
    assert(stored(1) == Seq((-127).toByte, (-1).toByte), "129/255 must wrap")
    // ADC must decode the wrapped bytes unsigned: a signed read would
    // index the table from the END and score silently wrong
    val got = Pq.pqTopK(codes, model, Seq(2.0, 3.0), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 2.0 * 200 + 3.0 * 37)
    assert(got(2L) == 2.0 * 129 + 3.0 * 255)
  }

  test("duplicated training data still yields k distinct codewords") {
    val base = Seq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(5.0, 5.0))
    val rows = (0 until 200).map(i => (i.toLong, base(i % 4))).toDF("id", "v")
    val model = Pq.pqTrain(rows, "id", "v", m = 1, k = 4)
    val words = model.codebooks(0).map(_.toSeq)
    assert(words.distinct.length == 4,
      s"50x-duplicated 4-value data must not collapse codewords: ${words.toSeq}")
    assert(words.toSet == base.toSet, "perfectly clusterable data recovers the values")
  }

  test("ADC score equals the hand-computed query·reconstruction dot") {
    val model = Pq.pqTrain(emb, "vec_id", "embedding", m = 4, k = 8)
    val codes = Pq.pqEncode(emb, "vec_id", "embedding", model)
    val q = emb.filter($"vec_id" === 3).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val row = codes.filter($"id" === 5L).select("codes")
      .head().getSeq[Byte](0)
    val recon = row.zipWithIndex.flatMap { case (c, mi) =>
      model.codebooks(mi)(c.toInt)
    }
    val expect = math.rint(q.zip(recon).map { case (a, b) => a * b }.sum * 1e6) / 1e6
    val got = Pq.pqTopK(codes, model, q, 10000)
      .filter($"id" === 5L).select("adc").head().getDouble(0)
    assert(math.abs(got - expect) < 1e-9)
  }
}
