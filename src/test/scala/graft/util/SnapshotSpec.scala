package graft.util

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diff classifies added/removed/changed and drops identical rows") {
    val oldSnap = Seq(
      (1L, "same text", "en"),
      (2L, "will change", "en"),
      (3L, "will be removed", "de"),
      (4L, null.asInstanceOf[String], "en"),    // NULL → NULL: unchanged
      (5L, "goes null", "en")).toDF("doc_id", "text", "lang")
    val newSnap = Seq(
      (1L, "same text", "en"),
      (2L, "did change", "en"),
      (4L, null.asInstanceOf[String], "en"),
      (5L, null.asInstanceOf[String], "en"),    // 'x' → NULL: a change
      (6L, "brand new", "fr")).toDF("doc_id", "text", "lang")
    val out = Snapshot.diff(oldSnap, newSnap, "doc_id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed",
                      5L -> "changed", 6L -> "added"))
    // 1 (identical) and 4 (NULL on both sides) never surface
  }

  test("diff compares only the requested columns; lang-only edits count") {
    val oldSnap = Seq((1L, "t", "en"), (2L, "t", "en")).toDF("doc_id", "text", "lang")
    val newSnap = Seq((1L, "t", "de"), (2L, "t", "en")).toDF("doc_id", "text", "lang")
    val textOnly = Snapshot.diff(oldSnap, newSnap, "doc_id", Seq("text"))
    assert(textOnly.count() == 0)
    val both = Snapshot.diff(oldSnap, newSnap, "doc_id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(both == Map(1L -> "changed"))
  }

  test("diffStats aggregates the per-status counts") {
    val oldSnap = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "c"), (3L, "d"), (4L, "e")).toDF("doc_id", "text")
    val stats = Snapshot.diffStats(oldSnap, newSnap, "doc_id", Seq("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("added" -> 2L, "removed" -> 1L, "changed" -> 1L))
  }

  test("diff rejects missing columns") {
    val a = Seq((1L, "x")).toDF("doc_id", "text")
    val b = Seq((1L, "x")).toDF("doc_id", "other")
    intercept[IllegalArgumentException] {
      Snapshot.diff(a, b, "doc_id", Seq("text"))
    }
    intercept[IllegalArgumentException] {
      Snapshot.diff(a, a, "doc_id", Seq.empty)
    }
  }

  test("diff plan is one join, no cartesian") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Snapshot.diff(
      docs.filter(col("doc_id") % 5 =!= 1),
      docs.filter(col("doc_id") % 5 =!= 2), "doc_id", Seq("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"))
    assert(plan.contains("FullOuter"))
  }
}
