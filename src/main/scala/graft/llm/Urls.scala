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
    * canonical key, with unparseable rows (no key to collide on) kept.
    * Canonicalization runs ONCE: an unparseable row's key falls back to
    * a per-row sentinel: NUL + `raw:<id>` — the U+0000 prefix cannot
    * collide with any canonical URL, whose first byte is a scheme
    * letter — making it its own singleton group, so one aggregation +
    * one keyed semi-join covers both cases. The join is keyed —
    * Spark/AQE picks the strategy. */
  def urlSurvivors(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val keep = df.select(col(idCol).cast("long").as("id"),
        coalesce(graft.functions.UrlF.canonUrl(col(urlCol)),
          concat(lit("\u0000raw:"), col(idCol).cast("string"))).as("key"))
      .groupBy(col("key")).agg(min(col("id")).as("__keep"))
      .select(col("__keep"))
    df.join(keep, col(idCol).cast("long") === col("__keep"), "left_semi")
  }
}
