package graft.cli

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CorpusIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeSnap(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft-ci").toString
    df.write.mode("overwrite").parquet(s"$dir/snap.parquet")
    s"$dir/snap.parquet"
  }

  test("ingest-corpus pipeline equals the hand-composed operators; counts decrease") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val oldSnap = docs.filter($"doc_id" % 5 =!= 1)
    val newSnap = docs.filter($"doc_id" % 5 =!= 2)
      .withColumn("text", when($"doc_id" % 7 === 0,
        concat($"text", lit(" v2"))).otherwise($"text"))
    val bench = docs.filter($"doc_id" % 23 === 0).select("doc_id", "text")
    val c = CorpusIngestCli.Config(
      newUri = writeSnap(newSnap), oldUri = writeSnap(oldSnap),
      benchUri = writeSnap(bench), outUri = "unused")
    val (sharded, report) = CorpusIngestCli.run(spark, c)
    val got = sharded.select("doc_id").as[Long].collect().toSet

    // hand-compose the same stages with the library operators
    val d = graft.util.Snapshot.diff(oldSnap, newSnap, "doc_id", Seq("text"))
      .filter($"change" =!= "removed").select("doc_id")
    val fresh = newSnap.join(d, Seq("doc_id"))
    val selfClean = graft.llm.Dedup.survivors(fresh, "doc_id",
      graft.llm.Dedup.minhashPairs(fresh, "doc_id", "text", 0.8))
    val crossClean = graft.llm.Dedup.survivorsAgainst(selfClean, "doc_id",
      graft.llm.Dedup.minhashPairsAgainst(selfClean, oldSnap, "doc_id", "text", 0.8))
    val expected = graft.llm.TextAnalysis.decontaminate(
        crossClean, "doc_id", "text", bench, "text", 8)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)

    // the report is the execution order with monotonically shrinking counts
    assert(report.map(_._1) ==
      Seq("new", "fresh", "self_dedup", "cross_dedup", "decontam"))
    val counts = report.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })

    // shards are contiguous from 0
    val shards = sharded.select("shard").as[Long].collect().toSet
    assert(shards == (0L to shards.max).toSet)
  }

  test("no old snapshot = full ingest; flags validate") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val c = CorpusIngestCli.Config(newUri = writeSnap(docs), outUri = "u",
      selfDedup = false)
    val (sharded, report) = CorpusIngestCli.run(spark, c)
    assert(sharded.count() == 50)
    assert(report.toMap.apply("fresh") == 50)
    intercept[IllegalArgumentException] {
      CorpusIngestCli.parseArgs(Array("--out-uri", "x"))
    }
    intercept[IllegalArgumentException] {
      CorpusIngestCli.parseArgs(Array("--new-uri", "x", "--out-uri", "y", "--bogus"))
    }
  }
}
