package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL-level dedup for web corpora — the cheapest dedup a crawl
  * pipeline runs, BEFORE any content fetch or text comparison: two
  * spellings of one page URL (case, `www.`, default port, fragment,
  * tracking params, param order, trailing slash) must collapse to one
  * canonical key ([[graft.functions.CanonUrl]]) so recrawls and shared
  * links don't multiply the corpus. Same operator shape as
  * [[Dedup.exact]]: one fixed-width-keyed aggregation — the 100 TB
  * shape (the canonical string is the shuffle key; no content moves). */
object Urls {

  /** `(id, url, canon)` — canonical key per row; rows whose url does
    * not parse (no valid `scheme://`) get NULL canon. */
  def canonicalize(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col(urlCol).as("url"),
      graft.functions.UrlF.canonUrl(col(urlCol)).as("canon"))

  /** Exact URL dedup: `(canon, keep_id, n_dups)` — smallest id per
    * canonical key, [[Dedup.exact]]'s contract. Unparseable urls
    * (NULL canon) are excluded — a null key would fuse every junk row
    * into one group. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    canonicalize(df, idCol, urlCol)
      .filter(col("canon").isNotNull)
      .groupBy(col("canon"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Survivor rows: the original frame filtered to the kept id per
    * canonical key (plus rows with unparseable urls, which have no key
    * to collide on). Broadcast-joins the (tiny relative to corpus)
    * keep-set only when it actually is small — the join is keyed,
    * Spark/AQE picks the strategy. */
  def urlSurvivors(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val keep = urlDedup(df, idCol, urlCol)
      .select(col("keep_id").as("__keep"))
    df.join(keep, col(idCol).cast("long") === col("__keep"), "left_semi")
      .unionByName(
        df.filter(graft.functions.UrlF.canonUrl(col(urlCol)).isNull))
  }
}
