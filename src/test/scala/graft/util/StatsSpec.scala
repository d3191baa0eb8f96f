package graft.util

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vals = Seq(1L, 2L, 3L, 4L, 100L) // 100 is the outlier

  test("winsorize clamps into the exact interpolated percentile band") {
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Stats.winsorize(df, "v", 0.25, 0.75)
      .select("v", "v_w").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // quantile_cont on (1,2,3,4,100): p25 = 2.0, p75 = 4.0
    assert(out == Map(1L -> 2.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0, 100L -> 4.0))
    intercept[IllegalArgumentException] { Stats.winsorize(df, "v", 0.9, 0.1) }
  }

  test("zscore standardizes with population stddev; constant column yields NULL") {
    val df = Seq(2.0, 4.0, 6.0).toDF("v")
    val z = Stats.zscore(df, "v").select("v_z")
      .collect().map(_.getDouble(0)).sorted.toSeq
    // mean 4, stddev_pop sqrt(8/3): z = ±1.224745, 0
    assert(z == Seq(-1.224745, 0.0, 1.224745))
    val const = Stats.zscore(Seq(5.0, 5.0).toDF("v"), "v")
    assert(const.select("v_z").collect().forall(_.isNullAt(0)))
  }

  test("minmax maps to [0,1]; constant column yields NULL") {
    val mm = Stats.minmax(Seq(10L, 20L, 15L).toDF("v"), "v")
      .select("v", "v_mm").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mm == Map(10L -> 0.0, 20L -> 1.0, 15L -> 0.5))
    assert(Stats.minmax(Seq(5L, 5L).toDF("v"), "v")
      .select("v_mm").collect().forall(_.isNullAt(0)))
  }

  test("stats joins broadcast one row — no full-size shuffle join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Stats.winsorize(docs, "n_chars", 0.05, 0.95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
