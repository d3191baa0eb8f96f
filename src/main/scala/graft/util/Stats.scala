package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust feature scaling for training pipelines — the numeric siblings
  * of the text-quality gates: outlier documents (mega-pages, empty
  * stubs) distort length/score features, and models want bounded,
  * comparable inputs.
  *
  * Both operators follow the established scalar-broadcast shape (the
  * quantile_filter pattern): ONE small aggregation computes the
  * statistics, a `crossJoin(broadcast(...))` of the single stats row
  * feeds a row-local codegen'd projection — no collect, no second scan
  * of the data per statistic, and the plan stays fully declarative for
  * Catalyst. Outputs are rounded to 6 decimals so the DuckDB oracle
  * compares value-for-value (float summation-order noise sits far below
  * that). */
object Stats {

  /** Winsorize: clamp `valueCol` into its own [pLow, pHigh] exact
    * interpolated percentiles (the `percentile` contract DuckDB's
    * quantile_cont shares), as `<valueCol>_w`. Exact percentiles are the
    * auditable default; at extreme key cardinality swap for
    * `percentile_approx` (the documented sketch trade, as elsewhere). */
  def winsorize(df: DataFrame, valueCol: String,
                pLow: Double, pHigh: Double): DataFrame = {
    require(0 <= pLow && pLow < pHigh && pHigh <= 1,
      s"winsorize: need 0 <= pLow < pHigh <= 1, got ($pLow, $pHigh)")
    val v = col(valueCol).cast("double")
    val stats = df.agg(
      percentile(v, lit(pLow)).as("__lo"),
      percentile(v, lit(pHigh)).as("__hi"))
    df.crossJoin(broadcast(stats))
      .withColumn(s"${valueCol}_w",
        round(least(greatest(v, col("__lo")), col("__hi")), 6))
      .drop("__lo", "__hi")
  }

  /** Z-score standardization: `(v - mean) / stddev_pop` as
    * `<valueCol>_z` (population stddev — the feature-scaling convention;
    * NULL when the column is constant rather than ±Infinity). */
  def zscore(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats = df.agg(
      avg(v).as("__mu"),
      stddev_pop(v).as("__sd"))
    df.crossJoin(broadcast(stats))
      .withColumn(s"${valueCol}_z",
        round(when(col("__sd") > 0, (v - col("__mu")) / col("__sd")), 6))
      .drop("__mu", "__sd")
  }

  /** Min-max scaling to [0, 1] as `<valueCol>_mm` (NULL for a constant
    * column). Integer inputs make the bounds engine-exact. */
  def minmax(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats = df.agg(min(v).as("__mn"), max(v).as("__mx"))
    df.crossJoin(broadcast(stats))
      .withColumn(s"${valueCol}_mm",
        round(when(col("__mx") > col("__mn"),
          (v - col("__mn")) / (col("__mx") - col("__mn"))), 6))
      .drop("__mn", "__mx")
  }
}
