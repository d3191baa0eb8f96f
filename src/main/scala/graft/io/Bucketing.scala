package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the shuffle-elimination lever for repeated
  * big–big joins: two tables bucketed (and sorted) on the same key with
  * the same bucket count join with ZERO exchange on either side — at
  * 100 TB that turns every recurring fact⋈fact join (events⋈events
  * attribution, corpus⋈pair-set dedup passes, snapshot⋈snapshot diffs)
  * from the dominant shuffle into a local merge per bucket. Bucket
  * pruning additionally turns a point lookup on the bucket key into a
  * 1-in-n-buckets file read.
  *
  * Spark only honors bucket metadata through the session catalog
  * (`saveAsTable` — a path-written parquet dir has nowhere to record
  * the hash), so this helper is deliberately catalog-shaped. Pick the
  * bucket count like shuffle partitions: data / (128-256 MB), and keep
  * it IDENTICAL across tables meant to co-join (mismatched counts
  * degrade to one-side re-shuffles). */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (overwrite). A
    * stranded managed-table location (a crashed prior writer) is swept
    * first — Spark refuses to create a managed table over an existing
    * directory, so without the sweep one failed run wedges the name. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    require(numBuckets > 0, s"writeBucketed: numBuckets must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val sorts = if (sortCols.isEmpty) Seq(bucketCol) else sortCols
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a catalog table (bucket metadata rides along, so joins and
    * aggregations on the bucket key skip their exchange). */
  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True when a join of `a` and `b` on their shared bucket key would
    * run exchange-free: both bucketed on that key with equal counts.
    * (Diagnostic: reads catalog metadata only.) */
  def coBucketed(spark: SparkSession, tableA: String, tableB: String,
                 key: String): Boolean = {
    def spec(t: String): Option[(Seq[String], Int)] = {
      val td = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t))
      td.bucketSpec.map(bs => (bs.bucketColumnNames, bs.numBuckets))
    }
    (spec(tableA), spec(tableB)) match {
      case (Some((ca, na)), Some((cb, nb))) =>
        na == nb && ca == Seq(key) && cb == Seq(key)
      case _ => false
    }
  }
}
