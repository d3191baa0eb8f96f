package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class FreqAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def summary(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(FreqF.freqItems(col("w"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact in the no-decrement regime, at any parallelism") {
    val words = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")
    for (parts <- Seq(1, 7, 32)) {
      val df = words.toDF("w").repartition(parts)
      assert(summary(df, 8) == Map("a" -> 50L, "b" -> 30L, "c" -> 20L))
    }
  }

  test("Misra–Gries guarantee on planted skew at tiny capacity") {
    // 1000 rows, heavy hitter 40% + 200 singletons: with capacity 7 the
    // guarantee is every item with freq > N/8 = 125 survives with
    // undercount ≤ 125
    val n = 1000
    val heavy = Seq.fill(400)("HH")
    val mid = Seq.fill(200)("mid")
    val noise = (0 until 400).map(i => s"x$i")
    val df = scala.util.Random.shuffle(heavy ++ mid ++ noise).toDF("w")
      .repartition(16)
    val out = summary(df, 7)
    val bound = n / (7 + 1)
    assert(out.contains("HH"), "heavy hitter must survive")
    assert(out("HH") <= 400 && out("HH") >= 400 - bound,
      s"HH count ${out("HH")} outside [${400 - bound}, 400]")
    assert(out.getOrElse("mid", 0L) <= 200, "counts are lower bounds")
    assert(out.size <= 7)
  }

  test("grouped heavy hitters: one summary per group, map-side combinable") {
    val df = (Seq.fill(10)(("g1", "a")) ++ Seq.fill(5)(("g1", "b")) ++
      Seq.fill(7)(("g2", "z"))).toDF("g", "w").repartition(8)
    val out = df.groupBy("g")
      .agg(FreqF.freqItems(col("w"), 4).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.item"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("g1", "a") -> 10L, ("g1", "b") -> 5L, ("g2", "z") -> 7L))
    // the plan runs partial aggregation (ObjectHashAggregate partial +
    // final), so the shuffle carries summaries, not rows
    val plan = df.groupBy("g").agg(FreqF.freqItems(col("w"), 4))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
  }

  test("freq_items registers as a SQL aggregate") {
    GraftExtensions.install(spark)
    Seq("a", "b", "a").toDF("w").createOrReplaceTempView("fi_docs")
    val rows = spark.sql(
      "SELECT inline(freq_items(w, 8)) FROM fi_docs")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(rows == Seq("a" -> 2L, "b" -> 1L))
    // grouped form too
    Seq(("g1", "a"), ("g1", "a"), ("g2", "z")).toDF("g", "w")
      .createOrReplaceTempView("fi_g")
    val g = spark.sql(
      "SELECT g, inline(freq_items(w, 4)) FROM fi_g GROUP BY g")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(g == Set(("g1", "a", 2L), ("g2", "z", 1L)))
  }

  test("nulls ignored; output order is (cnt desc, item asc)") {
    val df = Seq(Some("b"), Some("a"), None, Some("a"), Some("c"), Some("b"))
      .toDF("w")
    val rows = df.agg(FreqF.freqItems(col("w"), 8).as("hh"))
      .select(posexplode(col("hh")).as(Seq("pos", "e")))
      .select(col("e.item")).collect().map(_.getString(0)).toSeq
    assert(rows == Seq("a", "b", "c")) // a=2, b=2 tie → item asc; c=1
  }
}
