package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis harness for the time_window_hist warm cost: times
  * windowing variants over the events table so plan-level deltas (cast
  * chains, timestamp decode, div strategies) are attributable. Kept in
  * tools/ because the answer ("which expression shape wins on a
  * timestamp[us] scan") is a reusable measurement, not a guess.
  *
  * MEASURED (sf0.1, local[32], 100k rows, timestamp[us] generation):
  * a windowless `groupBy(event_type).count()` floors at ~0.29 s and the
  * production `unix_micros(...) div` variant lands ~0.05 s above it —
  * i.e. the windowing expression is ~free and the residual vs the
  * r9-era 0.06 s number is the scan+shuffle floor of the CURRENT
  * timestamp-typed events file (r9 measured a raw epoch-long file),
  * not a fixable cast chain. */
object TimeHist {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    println(s"rows=${ev.count()} tsType=${ev.schema("ts").dataType}")
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = try {
      mk.count() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[hist] $name%-24s min=${times.min}%6.3f s  (${times.map(t => f"$t%.3f").mkString(", ")})")
    } catch { case e: Exception => println(s"[hist] $name FAILED: ${e.getMessage.take(120)}") }
    time("baseline_count_only")(ev.groupBy(col("event_type")).count())
    time("unix_micros_div")(ev.groupBy(
      expr("unix_micros(cast(ts as timestamp)) div 60000000").as("w"),
      col("event_type").as("key")).agg(count(lit(1)).as("n")))
    time("unix_micros_raw_ntz")(ev.groupBy(
      expr("unix_micros(ts) div 60000000").as("w"),
      col("event_type").as("key")).agg(count(lit(1)).as("n")))
    time("date_trunc_minute")(ev.groupBy(
      date_trunc("minute", col("ts")).as("w"),
      col("event_type").as("key")).agg(count(lit(1)).as("n")))
    time("cast_long_div")(ev.groupBy(
      expr("cast(cast(ts as timestamp) as long) div 60").as("w"),
      col("event_type").as("key")).agg(count(lit(1)).as("n")))
    spark.stop()
  }
}
