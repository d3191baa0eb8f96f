package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer induction (Wu et al., arXiv 1609.08144 §4.1 —
  * the BERT tokenizer family; the third production tokenizer beside
  * [[Bpe]] and [[Unigram]]): symbols merge like BPE, but ranked by the
  * LIKELIHOOD gain `score = freq(l,r) / (freq(l) · freq(r))` — the
  * pair whose merge most increases a unigram LM's corpus likelihood —
  * instead of raw pair frequency. Continuation symbols carry the `##`
  * prefix (identity includes position class: `e` and `##e` are
  * different symbols with different statistics), and merging
  * `(l, ##r)` yields `l + r` — the prefix belongs to the position.
  *
  * Distributed exactly like [[Bpe.learnMerges]]: ONE corpus
  * aggregation builds the word-frequency table; per merge, the pair
  * counts AND the unary symbol counts are each one vocabulary-sized
  * aggregation off the cached symbol state, joined vocabulary-to-
  * vocabulary for the score, and the argmax is taken with a total
  * order (score desc, pair freq desc, (l, r) asc). Counts are exact
  * integers; the score division is the same double on every run, so
  * the learned table is deterministic at any parallelism.
  *
  * Serving is GREEDY LONGEST-MATCH-FIRST against the frozen vocabulary
  * — one row-local native [[graft.functions.WordPieceSegmentAll]]
  * projection (streamable, expression tree O(1) in vocab size). A word
  * with an unmatchable position serves as the single `[UNK]` piece —
  * but a vocabulary whose base layer covers the training corpus's
  * characters (what [[learnVocab]] returns) never UNKs on that corpus,
  * which is what makes `decode ∘ segment = normText` a corpus-wide law
  * the oracle can hold value-for-value. */
object WordPiece {

  final case class WpMerge(rank: Int, left: String, right: String,
                           merged: String, score: Double, freq: Long)

  private def stripCont(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** Initial symbols of `word`: first code point plain, the rest
    * `##`-prefixed. (split(word, '') is per code point.) */
  private def initSyms(word: Column): Column = {
    val chars = split(word, "")
    concat(
      slice(chars, lit(1), lit(1)),
      transform(slice(chars, lit(2), greatest(size(chars) - 1, lit(0))),
        c => concat(lit("##"), c)))
  }

  /** Learn `numMerges` likelihood-ranked merges plus the serving
    * vocabulary (base symbols of the corpus ∪ merge outputs). Stops
    * early when no pair reaches `minCount`. */
  def learnVocab(df: DataFrame, textCol: String, numMerges: Int,
                 minCount: Long = 2L): (Seq[WpMerge], Seq[String]) = {
    require(numMerges > 0,
      s"learnVocab: numMerges must be positive, got $numMerges")
    require(minCount >= 1,
      s"learnVocab: minCount must be >= 1, got $minCount")
    var state = Bpe.wordCounts(df, textCol)
      .select(initSyms(col("word")).as("syms"), col("n")).persist()
    // base vocabulary: every symbol the corpus actually contains, in
    // both position classes — vocabulary-sized driver residency (the
    // model), same as BPE's merge table
    val base = state.select(explode(col("syms")).as("sym"))
      .distinct().collect().map(_.getString(0))
    // reject marker-colliding corpora LOUDLY at train time: a
    // normalized word containing a literal "##" would corrupt
    // [[decodeCol]] later (its documented caveat — real tokenizers
    // escape markers). One word-table-sized pass over the
    // already-cached state: reconstruct each word (strip the "##"
    // continuation prefix per symbol) and look for the marker.
    val colliding = state.select(concat_ws("",
        transform(col("syms"), s => regexp_replace(s, "^##", ""))).as("w"))
      .filter(col("w").contains("##")).limit(1).collect()
    require(colliding.isEmpty,
      s"learnVocab: corpus word '${colliding.headOption.map(_.getString(0))
        .getOrElse("")}' contains the reserved '##' marker — WordPiece " +
        "decode would corrupt; escape or filter such words before training")
    // unpersist one round LATE, as in Bpe.learnMerges: each round's
    // argmax job materializes the current state's cache, possibly
    // reading the parent's cached blocks
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[WpMerge]
    try {
      var rank = 0
      var done = false
      while (rank < numMerges && !done) {
        // pair counts AND unary symbol counts from ONE aggregation over
        // ONE pass of the cached state (unary keys ride as r = null):
        // the former two-aggregation form consumed the state THREE
        // times per round (pairs + the two symCnt join branches), and
        // AQE declines to reuse those stages — ~10 stage-jobs per merge
        // where 3 suffice (guide §2.4). Frequencies are identical
        // integer sums — the learned table is bit-for-bit the
        // two-aggregation one's.
        //
        // The unary counts then ATTACH AS WINDOWS over the stats table
        // itself instead of two joins against a filtered copy (round-21
        // shape: lazy checkpoint + 2 broadcast joins — a checkpoint
        // boundary plus two broadcast-build jobs per merge round, pure
        // scheduler latency for a vocabulary-sized table). The l-keyed
        // window sees symbol l's unary row (l, null) in its partition;
        // keying the second window by coalesce(r, l) puts symbol s's
        // unary row (r IS null, so the key falls back to l = s) in the
        // same partition as every pair with r = s. One linear plan per
        // round — agg → window → window → TakeOrdered — no boundary, no
        // broadcasts (guide §2.4: two operations keyed the same way
        // share the exchange chain). Same integer freqs, same double
        // division, same total tie order.
        val wl = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l"))
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy(coalesce(col("r"), col("l")))
        val unary = when(col("r").isNull, col("freq"))
        val top = state
          .select(explode(concat(
            arrays_zip(
              slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
              slice(col("syms"), lit(2), size(col("syms")) - 1).as("r")),
            arrays_zip(col("syms").as("l"),
              array_repeat(lit(null).cast("string"), size(col("syms")))
                .as("r")))).as("p"),
            col("n"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("n")).as("freq"))
          .withColumn("lcnt", sum(unary).over(wl))
          .withColumn("rcnt", sum(unary).over(wr))
          .filter(col("r").isNotNull && col("freq") >= minCount)
          .select(col("l"), col("r"), col("freq"),
            (col("freq").cast("double") /
              (col("lcnt").cast("double") * col("rcnt").cast("double")))
              .as("score"))
          .orderBy(col("score").desc, col("freq").desc, col("l").asc,
            col("r").asc)
          .limit(1).collect()
        prev.foreach(_.unpersist())
        prev = None
        if (top.isEmpty) done = true
        else {
          val row = top.head
          val (l, r) = (row.getString(0), row.getString(1))
          val (f, sc) = (row.getLong(2), row.getDouble(3))
          val merged = l + stripCont(r)
          merges += WpMerge(rank, l, r, merged, sc, f)
          val next = state.select(
            graft.functions.MergeF.mergeAdjacentAs(col("syms"), l, r, merged)
              .as("syms"),
            col("n")).persist()
          prev = Some(state)
          state = next
          rank += 1
        }
      }
      (merges.toSeq, (base ++ merges.map(_.merged)).distinct.sorted)
    } finally { prev.foreach(_.unpersist()); state.unpersist(); () }
  }

  /** The merge table as a DataFrame (rank, left, right, merged, score,
    * freq). */
  def mergesDf(spark: SparkSession, merges: Seq[WpMerge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.merged, m.score, m.freq))
      .toDF("rank", "left", "right", "merged", "score", "freq")
  }

  /** ROW-LOCAL segmentation column over the frozen vocabulary: greedy
    * longest-match per word of the normalized text, `##` continuation
    * prefixes, `[UNK]` on unmatchable words. One native expression —
    * no shuffle, streamable. */
  def segmentCol(textCol: Column, vocab: Seq[String],
                 unk: String = "[UNK]"): Column =
    graft.functions.WpF.wordPieceSegmentAll(
      TextAnalysis.wsTokens(TextAnalysis.normText(textCol)), vocab, unk)

  /** Segment documents with a frozen vocabulary. Returns
    * (id, n_pieces, pieces) with pieces space-joined and `##` markers
    * kept (the round-trippable rendering). One map-only projection. */
  def segment(df: DataFrame, idCol: String, textCol: String,
              vocab: Seq[String], unk: String = "[UNK]"): DataFrame = {
    val pieces = segmentCol(col(textCol), vocab, unk)
    df.select(col(idCol).as("id"),
      size(pieces).cast("long").as("n_pieces"),
      array_join(pieces, " ").as("pieces"))
  }

  /** Decode a space-joined [[segment]] rendering back to text: a
    * continuation break (` ##`) glues, any other break is a word
    * boundary. VOCABULARY-INDEPENDENT on UNK-free renderings — pieces
    * only ever concatenate — so `decode(segment(text, v)) ==
    * normText(text)` for every vocabulary whose base layer covers the
    * text (the round-trip law the oracle row checks corpus-wide).
    * Caveat: a corpus whose normalized words contain a literal `##`
    * would corrupt, the [[Bpe.decodeCol]] `</w>` caveat — real
    * tokenizers escape markers, documented out of scope. */
  def decodeCol(piecesCol: Column): Column = {
    import org.apache.spark.sql.functions.{replace => strReplace}
    strReplace(piecesCol, lit(" ##"), lit(""))
  }

  /** `(id, decoded)` — [[decodeCol]] over a segmented frame. */
  def decode(df: DataFrame, idCol: String, piecesCol: String): DataFrame =
    df.select(col(idCol).as("id"), decodeCol(col(piecesCol)).as("decoded"))
}
