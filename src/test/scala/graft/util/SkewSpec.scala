package graft.util

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join is row-identical to the plain join on skewed data") {
    // 90% of the big side is ONE hot key
    val big = ((1 to 900).map(i => (7L, s"hot$i")) ++
      (1 to 100).map(i => (i.toLong % 5, s"cold$i"))).toDF("k", "payload")
    val small = Seq((7L, "seven"), (0L, "zero"), (1L, "one"), (99L, "unmatched"))
      .toDF("k", "name")
    for (jt <- Seq("inner", "left"); salt <- Seq(1, 4, 16)) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "payload", "name").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
        .groupBy(identity).view.mapValues(_.size).toMap
      val salted = Skew.saltedJoin(big, small, "k", salt, jt)
        .select("k", "payload", "name").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(salted == plain, s"jt=$jt salt=$salt")
    }
    // the hot key's rows actually spread across salts
    val spread = big.withColumn("s",
        pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .filter($"k" === 7L).select("s").distinct().count()
    assert(spread >= 6, s"hot key should span most salt buckets, got $spread")
    // determinism: two runs produce identical salted assignments
    val a = Skew.saltedJoin(big, small, "k", 8).collect().length
    val b = Skew.saltedJoin(big, small, "k", 8).collect().length
    assert(a == b)
    intercept[IllegalArgumentException] { Skew.saltedJoin(big, small, "k", 0) }
    intercept[IllegalArgumentException] { Skew.saltedJoin(big, small, "k", 2, "full") }
  }

  test("saltOn spreads rows whose payload columns are identical") {
    // identical (k, payload) repeated 300x — the whole-row default hashes
    // them all into ONE salt bucket; the caller's unique id spreads them
    val big = (1 to 300).map(i => (7L, "identical", i.toLong))
      .toDF("k", "payload", "rid")
    val small = Seq((7L, "seven"), (1L, "one")).toDF("k", "name")
    val whole = big.select(pmod(xxhash64(col("k"), col("payload")), lit(8)).as("s"))
      .distinct().count()
    assert(whole == 1, "identical payload rows share one whole-payload salt")
    val idSpread = big.select(pmod(xxhash64(col("rid")), lit(8)).as("s"))
      .distinct().count()
    assert(idSpread >= 6, s"id salt must span most buckets, got $idSpread")
    // results stay row-identical to the plain join under saltOn
    val plain = big.join(small, Seq("k"), "left").collect().length
    val salted = Skew.saltedJoin(big, small, "k", 8, "left", saltOn = Seq("rid"))
      .collect().length
    assert(salted == plain)
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "k", 8, "inner", saltOn = Seq("nope"))
    }
  }
}
