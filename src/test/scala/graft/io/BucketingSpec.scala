package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("co-bucketed tables join and aggregate with zero exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    Bucketing.writeBucketed(docs, "b_docs", "doc_id", 4)
    Bucketing.writeBucketed(emb, "b_emb", "doc_id", 4)
    assert(Bucketing.coBucketed(spark, "b_docs", "b_emb", "doc_id"))

    // the sort-merge join on the bucket key plans with NO shuffle on
    // either side (force SMJ — at bench size AQE would broadcast, which
    // hides the property this layout exists for)
    val joined = Bucketing.readTable(spark, "b_docs").hint("merge")
      .join(Bucketing.readTable(spark, "b_emb"), "doc_id")
    val joinPlan = joined.queryExecution.executedPlan.toString
    assert(joinPlan.contains("SortMergeJoin"))
    assert(!joinPlan.contains("ShuffleExchange") &&
      !joinPlan.contains("Exchange hashpartitioning"),
      s"bucketed join should be shuffle-free:\n$joinPlan")
    // and returns the same rows as the plain path
    val plain = docs.join(emb, "doc_id").count()
    assert(joined.count() == plain)

    // aggregation on the bucket key also skips its shuffle
    val aggPlan = Bucketing.readTable(spark, "b_docs")
      .groupBy("doc_id").agg(sum("n_chars"))
      .queryExecution.executedPlan.toString
    assert(!aggPlan.contains("ShuffleExchange") &&
      !aggPlan.contains("Exchange hashpartitioning"), aggPlan)

    // a mismatched bucket count is NOT co-bucketed (degrades to a
    // one-side shuffle — the diagnostic catches the misconfiguration)
    Bucketing.writeBucketed(emb, "b_emb8", "doc_id", 8)
    assert(!Bucketing.coBucketed(spark, "b_docs", "b_emb8", "doc_id"))

    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_emb")
    spark.sql("DROP TABLE IF EXISTS b_emb8")
  }
}
