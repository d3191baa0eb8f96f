package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class VecSumAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weighted vector sum and mean, partition-invariant, explode parity") {
    val df = Seq(
      (1L, Seq(1.0, 2.0), 2.0), (1L, Seq(3.0, 4.0), 1.0),
      (2L, Seq(10.0, 20.0), 0.5)).toDF("g", "v", "w")
    for (parts <- Seq(1, 7)) {
      val sums = df.repartition(parts).groupBy("g")
        .agg(VecAggF.vecSum(col("v"), col("w")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(sums(1L) == Seq(5.0, 8.0) && sums(2L) == Seq(5.0, 10.0))
      val means = df.repartition(parts).groupBy("g")
        .agg(VecAggF.vecMean(col("v"), 6).as("m"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(means(1L) == Seq(2.0, 3.0) && means(2L) == Seq(10.0, 20.0))
    }
    // null vectors / null weights / empty vectors don't contribute;
    // all-null groups eval to NULL (SQL aggregate convention)
    val withNulls = Seq(
      (1L, Some(Seq(2.0, 4.0)), Some(1.0)),
      (1L, None, Some(9.0)),
      (1L, Some(Seq.empty[Double]), Some(9.0)),
      (1L, Some(Seq(8.0, 6.0)), None),
      (3L, None, Some(1.0))).toDF("g", "v", "w")
    val r = withNulls.groupBy("g")
      .agg(VecAggF.vecSum(col("v"), col("w")).as("m")).collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getSeq[Double](1)))).toMap
    assert(r(1L).contains(Seq(2.0, 4.0)))
    assert(r(3L).isEmpty)
    // float input arrays read exactly
    val f = Seq((1L, Seq(1.5f, 2.5f))).toDF("g", "v")
      .groupBy("g").agg(VecAggF.vecSum(col("v"), lit(1.0)).as("s"))
      .head().getSeq[Double](1)
    assert(f == Seq(1.5, 2.5))
    // ragged dimensions fail LOUDLY instead of silently mis-averaging
    val ragged = Seq((1L, Seq(1.0)), (1L, Seq(1.0, 2.0))).toDF("g", "v")
    val e = intercept[Exception] {
      ragged.groupBy("g").agg(VecAggF.vecSum(col("v"), lit(1.0))).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }
}
