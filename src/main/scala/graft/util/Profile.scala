package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the "what am I about to train on" summary every
  * ingest pipeline runs before committing compute: one row per column
  * with null count, EXACT distinct count, and min/max (rendered as
  * strings so heterogeneous columns share one output schema).
  *
  * Shape: ONE aggregation pass computes all measures for all columns
  * (Spark plans the multi-distinct via Expand — n_cols passes over the
  * shuffle input, not over storage), then a row-local `stack` unpivots
  * the single result row into per-column rows. No collect; the unpivot
  * is driver-free. For 100 TB profiling swap `countDistinct` for
  * `approx_count_distinct` — exact distinct is the right default at
  * audit time because the oracle can check it; the sketch variant's
  * contract-boolean pattern is established elsewhere (within5pct).
  *
  * Min/max on strings use binary ordering (Spark UTF8String ≡ DuckDB
  * default collation for ASCII); double columns should be avoided or
  * pre-rounded by the caller since engines render doubles-as-strings
  * differently. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: at least one column")
    cols.foreach(c => require(df.columns.contains(c),
      s"profile: no such column $c"))
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__null_$c`, `__dist_$c`, `__min_$c`, `__max_$c`").mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col, n_null, n_distinct, min_str, max_str)"))
  }
}
