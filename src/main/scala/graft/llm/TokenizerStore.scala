package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for trained tokenizer artifacts — the "train once, serve
  * everywhere" lifecycle the index family already has: a tokenizer is a
  * MODEL (a BPE merge table, a WordPiece vocabulary, a unigram piece
  * table) that one batch job learns and every later batch, stream, and
  * serving job must load bit-identically, so its directory gets the
  * same crash-safety the ANN indexes get ([[Similarity.stagedCommit]]:
  * rename-aside atomic swap — a crashed save can never leave a
  * half-written artifact a reader would trust, and a reader always
  * sees the previous complete version during a re-save).
  *
  * Layout under `dir`: `table/` (the parquet rows) + `meta/` (one row:
  * kind, row count) — the kind check makes "loaded the wrong
  * tokenizer's directory" a loud error instead of garbage tokens.
  * Artifacts are vocabulary-sized, so load cost is a driver-bounded
  * collect — the same residency the DFL `$vocab`/`$merges` dataset
  * vars already accept (a catalog datastore can point at `table/`
  * directly; this store adds atomicity and typed round-trips). */
object TokenizerStore {

  private def save(spark: SparkSession, dir: String, kind: String,
                   rows: DataFrame, maxPieceLen: Int = 0): Unit =
    Similarity.stagedCommit(spark, dir) { staging =>
      rows.write.mode("overwrite").parquet(s"$staging/table")
      val n = rows.count()
      // max_piece_len is a SERVING hyperparameter for the unigram kind
      // (Viterbi scan bound — a vocab trained with longer pieces served
      // with a shorter bound silently never matches them); 0 = not
      // applicable. Persisted so apply can never substitute a default.
      spark.range(1).select(lit(kind).as("kind"), lit(n).as("n"),
          lit(maxPieceLen).as("max_piece_len"))
        .coalesce(1).write.mode("overwrite").parquet(s"$staging/meta")
    }

  private def checkKind(spark: SparkSession, dir: String,
                        want: String): Unit = {
    val meta = spark.read.parquet(s"$dir/meta").head()
    val kind = meta.getString(0)
    require(kind == want,
      s"tokenizer load: $dir holds a '$kind' artifact, expected '$want'")
  }

  /** Persist a learned BPE merge table (rank order = replay order). */
  def saveBpe(spark: SparkSession, merges: Seq[Bpe.Merge],
              dir: String): Unit =
    save(spark, dir, "bpe", Bpe.mergesDf(spark, merges))

  private def loadMerges(spark: SparkSession, dir: String,
                         kind: String): Seq[Bpe.Merge] = {
    checkKind(spark, dir, kind)
    spark.read.parquet(s"$dir/table")
      .select(col("rank").cast("int"), col("left"), col("right"),
        col("freq").cast("long"))
      .collect().sortBy(_.getInt(0))
      .map(r => Bpe.Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
  }

  /** Load a BPE merge table saved by [[saveBpe]]. */
  def loadBpe(spark: SparkSession, dir: String): Seq[Bpe.Merge] =
    loadMerges(spark, dir, "bpe")

  /** The artifact kind stored at `dir` — the dispatch key the CLI's
    * `apply` uses (no --method flag: the artifact knows what it is). */
  def kindOf(spark: SparkSession, dir: String): String =
    spark.read.parquet(s"$dir/meta").head().getString(0)

  /** Persist a BYTE-level BPE merge table — a dedicated kind, so a
    * byte-alphabet table can never serve through the char path (the
    * alphabets don't mix; a silent mismatch would emit garbage). */
  def saveByteBpe(spark: SparkSession, merges: Seq[Bpe.Merge],
                  dir: String): Unit =
    save(spark, dir, "byte-bpe", Bpe.mergesDf(spark, merges))

  /** Load a byte-level BPE merge table saved by [[saveByteBpe]]. */
  def loadByteBpe(spark: SparkSession, dir: String): Seq[Bpe.Merge] =
    loadMerges(spark, dir, "byte-bpe")

  /** Persist a WordPiece serving vocabulary. */
  def saveWordPiece(spark: SparkSession, vocab: Seq[String],
                    dir: String): Unit = {
    import spark.implicits._
    save(spark, dir, "wordpiece", vocab.toDF("piece"))
  }

  /** Load a WordPiece vocabulary saved by [[saveWordPiece]] (sorted —
    * the set is order-free, sorting makes the round trip canonical). */
  def loadWordPiece(spark: SparkSession, dir: String): Seq[String] = {
    checkKind(spark, dir, "wordpiece")
    spark.read.parquet(s"$dir/table")
      .select(col("piece").cast("string"))
      .collect().map(_.getString(0)).sorted.toSeq
  }

  /** Persist a unigram-LM piece table WITH its serving bound: the
    * Viterbi `maxPieceLen` the vocab was trained under travels in the
    * meta sidecar, so serving can never silently scan with a shorter
    * bound than the longest trained piece. */
  def saveUnigram(spark: SparkSession, vocab: Seq[Unigram.Piece],
                  dir: String, maxPieceLen: Int = 8): Unit = {
    import spark.implicits._
    require(maxPieceLen >= 1,
      s"saveUnigram: maxPieceLen must be >= 1, got $maxPieceLen")
    save(spark, dir, "unigram",
      vocab.map(p => (p.piece, p.logp)).toDF("piece", "logp"), maxPieceLen)
  }

  /** The serving `maxPieceLen` recorded with a unigram artifact. */
  def unigramMaxPieceLen(spark: SparkSession, dir: String): Int = {
    checkKind(spark, dir, "unigram")
    spark.read.parquet(s"$dir/meta").select(col("max_piece_len"))
      .head().getInt(0)
  }

  /** Load a unigram piece table saved by [[saveUnigram]]. */
  def loadUnigram(spark: SparkSession, dir: String): Seq[Unigram.Piece] = {
    checkKind(spark, dir, "unigram")
    spark.read.parquet(s"$dir/table")
      .select(col("piece").cast("string"), col("logp").cast("double"))
      .collect().map(r => Unigram.Piece(r.getString(0), r.getDouble(1)))
      .sortBy(_.piece).toSeq
  }
}
