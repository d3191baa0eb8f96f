package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the data-versioning primitive of an
  * iterated ingest: "what changed between last month's crawl and this
  * one" drives incremental dedup, re-tokenization, and audit reports.
  * (The reference engine has no snapshot tooling; this is part of the
  * brief-mandated training-data-pipeline extension surface.)
  *
  * Shape: ONE full-outer shuffle join on the id — the only exchange; the
  * change classification is a row-local projection over the joined row.
  * Rows identical in every compared column are dropped IN the same
  * stage, so the diff's output is proportional to the CHANGE volume, not
  * the corpus (at 100 TB the typical diff is orders of magnitude smaller
  * than either snapshot; nothing materializes the unchanged mass).
  * Comparison is null-safe per column (`<=>`): a column going NULL → 'x'
  * or 'x' → NULL is a change, NULL → NULL is not.
  *
  * Duplicate ids within one snapshot are the caller's bug, not silently
  * absorbed: the join would fan out and misreport — run [[graft.llm.Dedup.exact]]
  * first if ids may repeat. */
object Snapshot {

  /** (id, change ∈ added|removed|changed): rows of `newDf` absent from
    * `oldDf` are `added`, rows of `oldDf` absent from `newDf` are
    * `removed`, rows present in both whose `compareCols` differ
    * (null-safe, any column) are `changed`; identical rows are dropped. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "diff: at least one compare column")
    (compareCols :+ idCol).foreach { c =>
      require(oldDf.columns.contains(c), s"diff: old snapshot lacks column $c")
      require(newDf.columns.contains(c), s"diff: new snapshot lacks column $c")
    }
    val o = oldDf.select(col(idCol).as("__oid"),
      struct(compareCols.map(col): _*).as("__ov"))
    val n = newDf.select(col(idCol).as("__nid"),
      struct(compareCols.map(col): _*).as("__nv"))
    o.join(n, col("__oid") === col("__nid"), "full_outer")
      .withColumn("change",
        when(col("__oid").isNull, lit("added"))
          .when(col("__nid").isNull, lit("removed"))
          // struct <=> struct is field-wise null-safe equality
          .when(!(col("__ov") <=> col("__nv")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(coalesce(col("__nid"), col("__oid")).as(idCol), col("change"))
  }

  /** Per-status diff counts (added/removed/changed rows): the one-line
    * audit summary. Same single-join plan; the count is a 3-group
    * aggregation over the (small) diff. */
  def diffStats(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                compareCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, idCol, compareCols)
      .groupBy("change").agg(count(lit(1)).as("n"))
}
