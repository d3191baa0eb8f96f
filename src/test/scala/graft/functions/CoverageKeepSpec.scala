package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

class CoverageKeepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference implementation: the old higher-order predicate, literally. */
  private def naiveKeep(toks: Seq[String], starts: Seq[Int], w: Int): Seq[String] =
    toks.zipWithIndex.collect {
      case (t, i) if !starts.exists(s => i >= s && i < s + w) => t
    }

  private def run(toks: Seq[String], starts: Seq[Int], w: Int): Seq[String] =
    Seq((toks, starts)).toDF("toks", "starts")
      .select(CoverageF.coverageKeep($"toks", $"starts", w).as("kept"))
      .head().getSeq[String](0)

  test("matches the higher-order coverage predicate on edge shapes") {
    val toks = (0 until 12).map(i => s"t$i")
    // empty starts; single span; overlapping spans; adjacent spans;
    // span past the end; unsorted + duplicated starts; full coverage
    val cases = Seq(
      (Seq.empty[Int], 3),
      (Seq(0), 3),
      (Seq(2, 4), 4),
      (Seq(0, 3), 3),
      (Seq(10), 5),
      (Seq(7, 1, 7, 3), 2),
      ((0 until 12).toSeq, 1),
    )
    cases.foreach { case (starts, w) =>
      assert(run(toks, starts, w) == naiveKeep(toks, starts, w),
        s"starts=$starts w=$w")
    }
  }

  test("null starts propagate (callers' when-isNull branch handles them)") {
    val out = Seq((Seq("a", "b"), Option.empty[Seq[Int]]))
      .toDF("toks", "starts")
      .select(CoverageF.coverageKeep($"toks", $"starts", 2).as("kept"))
      .head()
    assert(out.isNullAt(0))
  }

  test("pathological fully-covered long row is linear, not quadratic") {
    // 100k tokens, 100k-ish starts: the replaced O(tokens × starts)
    // rescan would be ~10^10 comparisons; the sweep must finish fast
    val n = 100000
    val toks = Vector.fill(n)("x")
    val starts = (0 until n).toVector
    val t0 = System.nanoTime()
    assert(run(toks, starts, 16).isEmpty)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30.0, s"coverage sweep took $sec s")
  }
}
