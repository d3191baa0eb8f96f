package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking dedup — the edit-robust member of the
  * dedup family. The fixed-window fingerprint operators
  * ([[TextAnalysis.removeDupSpans]], [[TextAnalysis.windowDupStats]])
  * catch VERBATIM repeated spans but lose alignment under insertion: a
  * 3-word prefix shifts every window hash. CDC (Muthitacharoen et al.,
  * LBFS SOSP'01, applied token-granular) cuts chunk boundaries where
  * the ROLLING k-gram's content hash hits `0 mod d`, so boundaries —
  * and therefore chunk fingerprints — re-align one cut past any edit,
  * and a prefixed/edited near-copy still shares almost all chunks with
  * its original.
  *
  * Scale shape: chunking is one row-local native expression
  * ([[graft.functions.CdcChunks]] — no shuffle); duplicate detection is
  * one fingerprint `groupBy` (id-and-fp-only rows move); pair listing
  * is the banded-bucket idiom — join by fingerprint with a
  * document-frequency cap so a boilerplate chunk shared by half the
  * corpus can never go quadratic (same df-cap design as the PPJoin
  * prefix filter in [[Dedup.jaccardPairs]]). */
object Cdc {

  /** One row per chunk: `(id, chunk_idx, n_toks, fp)`. `chunk_idx` is
    * the 0-based position of the chunk in its document; `fp` is the md5
    * of the chunk's normalized text. One map-only projection. */
  def chunks(df: DataFrame, idCol: String, textCol: String, k: Int = 3,
             d: Int = 8, seed: Long = 7L): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(graft.functions.CdcF.cdcChunks(
          TextAnalysis.wsTokens(TextAnalysis.normText(col(textCol))),
          k, d, seed)).as(Seq("chunk_idx", "c")))
      .select(col("id"), col("chunk_idx"),
        col("c.n_toks").cast("long").as("n_toks"), col("c.fp"))

  /** Chunk fingerprints repeated ACROSS documents:
    * `(fp, n_docs, n_occ)` for every chunk seen in ≥ 2 distinct
    * documents. One groupBy over (fp, id) pre-aggregated counts —
    * map-side combine keeps the shuffle id-and-fp-only. */
  def dupChunks(df: DataFrame, idCol: String, textCol: String, k: Int = 3,
                d: Int = 8, seed: Long = 7L): DataFrame =
    chunks(df, idCol, textCol, k, d, seed)
      .groupBy("fp", "id").agg(count(lit(1)).as("occ"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), sum(col("occ")).as("n_occ"))
      .filter(col("n_docs") >= 2)

  /** Remove every CORPUS-DUPLICATED chunk from every document — the
    * edit-robust sibling of [[TextAnalysis.removeDupSpans]] (whose
    * fixed windows lose alignment under insertion): a chunk drops when
    * its fingerprint occurs more than once corpus-wide (within- or
    * cross-document). Returns `(id, clean_text, n_kept)` with the kept
    * chunks re-joined in document order.
    *
    * Scale shape: the decision shuffle carries only (id, chunk_idx)
    * pairs — chunk TEXT never moves; the rebuild is the row-local
    * native [[graft.functions.CdcScrub]] at the final scan. */
  def scrubDupChunks(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, d: Int = 8, seed: Long = 7L): DataFrame = {
    val ch = chunks(df, idCol, textCol, k, d, seed)
    val dup = ch.groupBy("fp").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("fp")
    val drops = ch.join(dup, Seq("fp"), "left_semi")
      .groupBy("id")
      .agg(sort_array(collect_list(col("chunk_idx").cast("long")))
        .as("__drops"))
    val toks = TextAnalysis.wsTokens(TextAnalysis.normText(col(textCol)))
    df.select(col(idCol).as("id"), toks.as("__toks"))
      .join(drops, Seq("id"), "left")
      .select(col("id"),
        graft.functions.CdcF.cdcScrub(col("__toks"),
          coalesce(col("__drops"), array().cast("array<bigint>")),
          k, d, seed).as("s"))
      .select(col("id"), col("s.clean_text"), col("s.n_kept"))
  }

  /** Document pairs sharing ≥ `minShared` distinct chunk fingerprints:
    * `(id_a, id_b, n_shared)`, `id_a < id_b`. Fingerprints carried by
    * more than `maxDf` documents are EXCLUDED before the self-join (the
    * quadratic-blowup guard: a corpus-wide boilerplate chunk pairs
    * everything with everything; dropping it loses only pairs whose
    * entire overlap is that boilerplate — the PPJoin-style trade,
    * documented in the oracle too). */
  def sharedPairs(df: DataFrame, idCol: String, textCol: String,
                  minShared: Int = 1, maxDf: Int = 64, k: Int = 3,
                  d: Int = 8, seed: Long = 7L): DataFrame = {
    require(minShared >= 1, s"sharedPairs: minShared must be >= 1, got $minShared")
    require(maxDf >= 2, s"sharedPairs: maxDf must be >= 2, got $maxDf")
    val ch = chunks(df, idCol, textCol, k, d, seed)
      .select("id", "fp").distinct()
    val rare = ch.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("fp")
    val keyed = ch.join(rare, "fp")
    keyed.as("a").join(keyed.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
