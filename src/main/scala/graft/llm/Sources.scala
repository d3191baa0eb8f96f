package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-level curation — the per-domain axis of web-corpus cleaning
  * (the UT1-blocklist / C4-domain-filter family, derived from the
  * corpus itself instead of an external list): aggregate per-source
  * health signals, then drop every document of a source whose signals
  * cross the block thresholds. Catching spam at the SOURCE granularity
  * is cheaper and higher-recall than per-document rules — a content
  * farm's individually-plausible pages share a domain whose duplicate
  * rate and quality distribution give it away.
  *
  * Scale shape: one exact-dedup-style fingerprint `groupBy` (the id+fp
  * shuffle [[Dedup.exact]] already pays), one per-source aggregation
  * (map-side combined; source cardinality ≪ corpus), and the filter is
  * a BROADCAST anti-join of the (small) blocked-source list against
  * the corpus scan — no corpus-sized shuffle anywhere. */
object Sources {

  /** Per-source health: `(source, n_docs, n_dup_docs, dup_rate,
    * mean_quality)` where a doc is "dup" when its normalized exact
    * fingerprint occurs more than once CORPUS-wide (cross-source
    * duplication counts against both sources — spam syndication
    * usually spans domains), and `quality` is any row-local scoring
    * column over the input (e.g. [[TextAnalysis.qualityScore]]).
    * Rates rounded to 6 for oracle parity. */
  def sourceStats(df: DataFrame, idCol: String, textCol: String,
                  srcCol: String, quality: Column): DataFrame =
    rawStats(df, idCol, textCol, srcCol, quality)
      .withColumn("dup_rate", round(col("dup_rate"), 6))
      .withColumn("mean_quality", round(col("mean_quality"), 6))

  /** Unrounded per-source stats — thresholds must compare against the
    * EXACT averages (the oracle SQL thresholds unrounded avg(q); a mean
    * within 5e-7 of the cut would otherwise classify differently). */
  private def rawStats(df: DataFrame, idCol: String, textCol: String,
                       srcCol: String, quality: Column): DataFrame = {
    val rows = df.select(col(idCol).as("id"), col(srcCol).as("source"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"), quality.as("q"))
    val dupFp = rows.groupBy("fp").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("fp", "c")
    rows.join(dupFp, Seq("fp"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n_dup_docs"),
        (sum(when(col("c").isNotNull, 1.0).otherwise(0.0)) /
          count(lit(1))).as("dup_rate"),
        avg(col("q")).as("mean_quality"))
  }

  /** The blocked-source list: sources whose duplicate rate exceeds
    * `maxDupRate` OR whose mean quality falls below `minQuality` —
    * both compared UNROUNDED (rounding is display-only). */
  def blockedSources(df: DataFrame, idCol: String, textCol: String,
                     srcCol: String, quality: Column, maxDupRate: Double,
                     minQuality: Double): DataFrame =
    rawStats(df, idCol, textCol, srcCol, quality)
      .filter(col("dup_rate") > maxDupRate ||
        col("mean_quality") < minQuality)
      .select("source")

  /** Corpus minus every document of a blocked source: `(id, source)`.
    * The block list is source-cardinality-sized — broadcast anti-join,
    * so the corpus pass stays map-only. */
  def sourceSurvivors(df: DataFrame, idCol: String, textCol: String,
                      srcCol: String, quality: Column,
                      maxDupRate: Double = 0.5,
                      minQuality: Double = 0.2): DataFrame =
    df.join(broadcast(blockedSources(df, idCol, textCol, srcCol, quality,
        maxDupRate, minQuality).withColumnRenamed("source", "__blocked")),
        col(srcCol) === col("__blocked"), "left_anti")
      .select(col(idCol).as("id"), col(srcCol).as("source"))
}
