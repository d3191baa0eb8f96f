package graft.io

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions.col

/** File-layout clustering for data skipping — the read-side twin of
  * [[Bucketing]]: range-partition + sort the data on its hot filter
  * columns BEFORE writing, so every parquet file (and row group inside
  * it) covers a narrow value range and the reader's min/max pushdown
  * skips everything outside the predicate. On an unclustered 100 TB
  * corpus a `ts BETWEEN …` or `lang = …` scan touches every file; on a
  * clustered one it touches the files whose stats overlap — often a
  * few hundredths of the data. (Same idea as Delta/Iceberg OPTIMIZE
  * ZORDER for the single-column and prefix cases; true multi-column
  * Z-curves only pay off past 2-3 independently-filtered columns.)
  *
  * `clusterBy` returns the re-laid-out DataFrame — compose with any
  * writer (`.write.parquet`, [[DynamicSink]]); `files` is the
  * parallelism/file-count knob. */
object Layout {

  def clusterBy(df: DataFrame, cols: Seq[String], files: Int): DataFrame = {
    require(cols.nonEmpty, "clusterBy: at least one column")
    require(files > 0, "clusterBy: files must be positive")
    df.repartitionByRange(files, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
  }

  /** Per-file min/max of `c` in a written parquet directory — the
    * audit view of what the reader's file/row-group skipping will see.
    * One row per file: (file, min, max). */
  def fileStats(spark: org.apache.spark.sql.SparkSession, path: String,
                c: String): Array[Row] = {
    import org.apache.spark.sql.functions.{input_file_name, max, min}
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c)).as("min"), max(col(c)).as("max"))
      .collect()
  }
}
