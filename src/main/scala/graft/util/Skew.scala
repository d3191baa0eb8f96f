package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key salting for joins AQE can't rescue. AQE's skew-join
  * split handles a skewed PARTITION of a sort-merge join, but not a
  * single mega-hot KEY on a join AQE won't touch (stream-static joins,
  * broadcast-disabled deployments, non-SMJ shapes): every row of that
  * key still lands on one task. Salting splits the hot key `salt` ways
  * on the big side and replicates only the small side's matching rows
  * `salt` times — the standard trade (small-side duplication ∝ salt,
  * bounded and chosen by the caller) for an even task histogram.
  *
  * The salt is DETERMINISTIC (hash of the big side's whole row, not
  * `rand()`): task retries and speculative attempts recompute the same
  * salt, so the join never produces duplicate or dropped rows under
  * replay — the correctness trap `rand()`-salted joins hit. Inner and
  * left joins supported (the salted-right row multiset is exactly the
  * original's per key, so results are row-identical to the plain join).
  *
  * LIMITATION of the whole-row default: fully IDENTICAL duplicate rows
  * (a common cause of hot keys in raw crawl corpora) hash to the same
  * salt and still pile onto one task. When the big side carries a
  * unique id (or any near-unique columns), pass it via `saltOn` — the
  * salt then hashes only those columns, spreading identical payloads. */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int, joinType: String = "inner",
                 saltOn: Seq[String] = Nil): DataFrame = {
    require(salt > 0, s"saltedJoin: salt must be positive, got $salt")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin: inner|left only, got $joinType")
    val bigCols = big.columns
    require(!bigCols.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin: __salt column name is reserved")
    require(saltOn.forall(bigCols.contains),
      s"saltedJoin: saltOn columns ${saltOn.filterNot(bigCols.contains)} not in big side")
    // deterministic per-row salt — from the caller's unique-id columns if
    // given (spreads identical duplicate rows), else from every big-side
    // column: uniform across a hot key's rows, stable under task replay
    val hashCols = if (saltOn.nonEmpty) saltOn else bigCols.toSeq
    val saltCol: Column = pmod(xxhash64(hashCols.map(col): _*), lit(salt))
    val b = big.withColumn("__salt", saltCol)
    val s = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salt - 1L))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
