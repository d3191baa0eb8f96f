package graft.util

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def data = (0 until 3000).map { i =>
    (s"g${i % 3}", s"user${i % (100 * (i % 3 + 1))}")
  }.toDF("g", "item")

  test("per-group sketches estimate within the HLL band; rollup matches a direct global sketch's band") {
    val sk = Sketches.hllBuild(data, "g", "item")
    val est = sk.select(col("g"), Sketches.hllEstimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = data.groupBy("g").agg(countDistinct(col("item")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) <= math.max(2L, n * 3 / 100),
        s"group $g: est ${est(g)} vs exact $n")
    }
    val merged = Sketches.hllRollup(sk, lit("all"))
      .select(Sketches.hllEstimate(col("sketch"))).head().getLong(0)
    val exactAll = data.agg(countDistinct(col("item"))).head().getLong(0)
    assert(math.abs(merged - exactAll) <= math.max(2L, exactAll * 3 / 100))
  }

  test("rollup is order-insensitive and idempotent (register-max merge)") {
    val sk = Sketches.hllBuild(data, "g", "item")
    def roll(df: org.apache.spark.sql.DataFrame): Long =
      Sketches.hllRollup(df, lit("all"))
        .select(Sketches.hllEstimate(col("sketch"))).head().getLong(0)
    // any input order → same union result
    assert(roll(sk.orderBy(col("g").desc)) == roll(sk.orderBy(col("g").asc)))
    // merging a sketch with itself changes nothing
    assert(roll(sk.unionByName(sk)) == roll(sk))
    // partial tables built from disjoint halves combine to the same
    // estimate as one table over everything
    val h1 = Sketches.hllBuild(data.filter(hash(col("item")) % 2 === 0), "g", "item")
    val h2 = Sketches.hllBuild(data.filter(hash(col("item")) % 2 =!= 0), "g", "item")
    assert(roll(h1.unionByName(h2)) == roll(sk.unionByName(sk)))
  }

  test("guards") {
    intercept[IllegalArgumentException](Sketches.hllBuild(data, "g", "item", lgK = 2))
  }

  test("bloom table: no false negatives per group or through the union; incompatible sizes throw") {
    val hashed = data.select(col("g"), xxhash64(col("item")).as("h"))
    val per = Sketches.bloomBuild(hashed, "g", "h",
      estItems = 2000L, numBits = 1L << 15)
    // per-group: every real hash probes true against its own bloom
    per.collect().foreach { r =>
      val bf = graft.functions.BloomFns.broadcastBloom(spark,
        r.getAs[Array[Byte]](1))
      val miss = hashed.filter(col("g") === r.getString(0))
        .filter(!graft.functions.BloomFns.bloomMightContain(bf, col("h")))
        .count()
      assert(miss == 0, s"group ${r.getString(0)}")
    }
    // union: the rolled-up bloom still sees every hash of every group
    val all = Sketches.bloomRollup(per, lit("all"))
      .select("bloom").head().getAs[Array[Byte]](0)
    val bfAll = graft.functions.BloomFns.broadcastBloom(spark, all)
    assert(hashed.filter(!graft.functions.BloomFns
      .bloomMightContain(bfAll, col("h"))).count() == 0)
    // a differently-sized shard must be rejected, never silently OR'd
    val bad = Sketches.bloomBuild(hashed, "g", "h",
      estItems = 10L, numBits = 1L << 8)
    assertThrows[Exception] {
      Sketches.bloomRollup(per.unionByName(bad), lit("x")).collect()
    }
    // all-null relation rolls up to NULL, not an empty filter
    val empty = per.filter(col("g") === "nope")
    assert(Sketches.bloomRollup(empty, lit("none")).count() == 0)
  }
}
