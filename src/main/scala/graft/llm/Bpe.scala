package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer induction (Sennrich et al., ACL'16) — the
  * learn-the-tokenizer-from-the-corpus step of a pretraining pipeline,
  * distributed: train on the WORD-FREQUENCY table (vocabulary-sized —
  * corpus scale only touches the one aggregation that builds it), apply
  * merges with the native [[graft.functions.MergeAdjacent]] pass.
  *
  * Training loop, per merge: adjacent symbol pairs explode off the
  * word table weighted by word count (two codegen'd slices +
  * arrays_zip, the bigram shape), one map-side-combined sum per pair,
  * and the argmax pair is taken deterministically (count desc, then
  * (left, right) asc — ties never reorder between runs). The chosen
  * merge applies as one native row-local pass and the state persists
  * for the next round (previous round unpersisted — bounded lineage).
  * The classic algorithm is driver-resident over the vocab; here the
  * vocab never leaves the cluster, so a 100 M-type web vocabulary
  * trains the same way.
  *
  * Word symbols initialize as characters with the `</w>` end-of-word
  * marker fused onto the final character (the Sennrich variant that
  * distinguishes "st" in "star" from "st</w>" in "west"). Merges are
  * exact integer counts + a total tie order → the learned merge table
  * is deterministic at any parallelism. */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** (word, n) over normalized whitespace tokens — the classic BPE
    * training input; one corpus aggregation, then everything below is
    * vocabulary-sized. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.wsTokens(
        TextAnalysis.normText(col(textCol)))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** BYTE-LEVEL pre-tokenization: the RAW text partitions into maximal
    * same-class runs (letters | digits | whitespace | other — every
    * code point falls in exactly one class, so the matches COVER the
    * string and concatenating them back reproduces it exactly; the
    * losslessness [[decodeByte]] relies on). A simplified stand-in for
    * the GPT-2 release's pre-tokenizer regex — same full-cover
    * property, same "merges never cross a class boundary" effect. */
  def coverTokens(text: Column): Column =
    regexp_extract_all(text,
      lit("""(\p{L}+|\p{N}+|\s+|[^\p{L}\p{N}\s]+)"""), lit(1))

  /** (word, n) over byte-level cover tokens of the RAW text — no
    * normalization, whitespace runs are vocabulary words too (they
    * carry byte content that must survive the round trip). */
  def wordCountsByte(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(coverTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Characters of `word` with `</w>` fused onto the last one. */
  private def initSyms(word: Column): Column = {
    val chars = split(word, "")
    concat(
      slice(chars, lit(1), greatest(size(chars) - 1, lit(0))),
      array(concat(element_at(chars, -1), lit("</w>"))))
  }

  /** Learn `numMerges` merges; stops early when no pair reaches
    * `minCount`. Returns the ranked merge table.
    *
    * `byteLevel = true` trains over the GPT-2 alphabet instead: words
    * are [[coverTokens]] of the raw text, initial symbols the mapped
    * UTF-8 bytes ([[graft.functions.ByteCodec]]), no `</w>` marker.
    * The distributed loop — vocabulary-sized state, exploded bigram
    * counts, deterministic argmax, native merge pass — is identical. */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
                  minCount: Long = 2L, byteLevel: Boolean = false): Seq[Merge] = {
    require(numMerges > 0, s"learnMerges: numMerges must be positive, got $numMerges")
    require(minCount >= 1, s"learnMerges: minCount must be >= 1, got $minCount")
    var state = (if (byteLevel)
        wordCountsByte(df, textCol).select(
          split(graft.functions.ByteBpeF.byteMap(col("word")), "").as("syms"),
          col("n"))
      else wordCounts(df, textCol)
        .select(initSyms(col("word")).as("syms"), col("n"))).persist()
    if (!byteLevel) {
      // reject marker-colliding corpora LOUDLY at train time: a
      // normalized word containing a literal "</w>" would corrupt
      // [[decodeCol]] later (its documented caveat). One word-table
      // pass over the cached state — reconstruct the word (drop the
      // sentinel appended to the final symbol) and look for the marker.
      // The byte-level alphabet has no marker and decodes losslessly.
      val colliding = state
        .select(concat_ws("", col("syms")).as("w"))
        .select(col("w").substr(lit(1), length(col("w")) - 4).as("w"))
        .filter(col("w").contains("</w>")).limit(1).collect()
      require(colliding.isEmpty,
        s"learnMerges: corpus word '${colliding.headOption
          .map(_.getString(0)).getOrElse("")}' contains the reserved " +
          "'</w>' marker — char-level BPE decode would corrupt; train " +
          "with byteLevel = true or escape such words")
    }
    // the PREVIOUS round's state, unpersisted one round LATE: each
    // round's argmax job is what first materializes the current state's
    // cache, and that computation may read the parent's cached blocks —
    // dropping the parent only after the child has materialized keeps
    // lineage recompute bounded WITHOUT a per-round count() job (the
    // eager-materialize-then-unpersist form cost one extra job per merge)
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      var rank = 0
      var done = false
      while (rank < numMerges && !done) {
        val top = state.filter(size(col("syms")) >= 2)
          .select(explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
            slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"),
            col("n"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("n")).as("freq"))
          .filter(col("freq") >= minCount)
          .orderBy(col("freq").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        prev.foreach(_.unpersist()) // state materialized just now — safe
        prev = None
        if (top.isEmpty) done = true
        else {
          val row = top.head
          val (l, r, f) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += Merge(rank, l, r, f)
          val next = state.select(
            graft.functions.MergeF.mergeAdjacent(col("syms"), l, r).as("syms"),
            col("n")).persist()
          prev = Some(state)
          state = next
          rank += 1
        }
      }
      merges.toSeq
    } finally { prev.foreach(_.unpersist()); state.unpersist(); () }
  }

  /** The merge table as a DataFrame (rank, left, right, freq). */
  def mergesDf(spark: org.apache.spark.sql.SparkSession,
               merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.freq))
      .toDF("rank", "left", "right", "freq")
  }

  /** ROW-LOCAL segmentation column: every word of the normalized text
    * re-splits to characters and replays `merges` IN LEARNED ORDER (the
    * BPE inference rule); the document's subword pieces come back as one
    * ordered array. The whole replay is ONE native
    * [[graft.functions.BpeSegmentAll]] expression carrying the frozen
    * merge table as a codegen reference object — no explode, no
    * aggregation, no shuffle, and (unlike the pre-r13 per-merge
    * MergeAdjacent chain inside a `transform`) no expression tree that
    * grows with tokenizer size, so a production 32 k-merge table serves
    * the same as the 4-merge textbook one. Row-local is what makes
    * frozen-tokenizer serving STREAMABLE (the classify pattern: train
    * batch-side, apply anywhere). */
  def segmentCol(textCol: Column, merges: Seq[Merge]): Column =
    graft.functions.MergeF.bpeSegmentAll(
      TextAnalysis.wsTokens(TextAnalysis.normText(textCol)),
      merges.map(m => (m.left, m.right)))

  /** Decode a space-joined pieces rendering (the [[segment]] output)
    * back to text: `</w>` marks a word end, all other piece breaks are
    * intra-word. MERGE-INDEPENDENT — BPE merges only ever concatenate,
    * so `decode(segment(text, anyMerges)) == normText(text)` for every
    * merge table (the round-trip law the oracle row checks corpus-wide).
    * Caveat: a corpus whose words contain the literal `</w>` marker or
    * `\u0001` would corrupt (normText keeps both); real tokenizers
    * escape markers — out of scope here, documented. */
  def decodeCol(piecesCol: Column): Column = {
    import org.apache.spark.sql.functions.{replace => strReplace}
    // word breaks -> \u0001, drop intra-word breaks, restore spaces,
    // strip the final word's trailing marker
    strReplace(
      strReplace(
        strReplace(
          strReplace(piecesCol, lit("</w> "), lit("\u0001")),
          lit(" "), lit("")),
        lit("\u0001"), lit(" ")),
      lit("</w>"), lit(""))
  }

  /** `(id, decoded)` — [[decodeCol]] over a segmented frame. */
  def decode(df: DataFrame, idCol: String, piecesCol: String): DataFrame =
    df.select(col(idCol).as("id"), decodeCol(col(piecesCol)).as("decoded"))

  /** Segment documents with a learned merge list. Returns
    * (id, n_pieces, pieces) with pieces space-joined and `</w>` markers
    * kept (the round-trippable rendering); documents with no tokens
    * emit n_pieces = 0. One map-only projection over [[segmentCol]]. */
  def segment(df: DataFrame, idCol: String, textCol: String,
              merges: Seq[Merge]): DataFrame = {
    val pieces = segmentCol(col(textCol), merges)
    df.select(col(idCol).as("id"),
      size(pieces).cast("long").as("n_pieces"),
      array_join(pieces, " ").as("pieces"))
  }

  /** BYTE-LEVEL segmentation column: [[coverTokens]] of the RAW text,
    * each run segmented over the mapped-byte alphabet by the same ONE
    * native [[graft.functions.BpeSegmentAll]] expression (byteLevel
    * mode). Row-local → streamable, exactly like the character path. */
  def segmentByteCol(textCol: Column, merges: Seq[Merge]): Column =
    graft.functions.MergeF.bpeSegmentAll(coverTokens(textCol),
      merges.map(m => (m.left, m.right)), byteLevel = true)

  /** Byte-level [[segment]]: (id, n_pieces, pieces), pieces
    * space-joined — unambiguous because the space byte maps AWAY from
    * ' ' (to 'Ġ'), so no piece ever contains a literal space. */
  def segmentByte(df: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val pieces = segmentByteCol(col(textCol), merges)
    df.select(col(idCol).as("id"),
      size(pieces).cast("long").as("n_pieces"),
      array_join(pieces, " ").as("pieces"))
  }

  /** Byte-level decode of a space-joined [[segmentByte]] rendering:
    * drop the joiners (never payload — see [[segmentByte]]), unmap the
    * byte characters, UTF-8-decode. LOSSLESS on any valid-Unicode
    * input, merge-table-independent: `decodeByte ∘ segmentByte =
    * identity` (the RAW text, not a normalization — cover tokens
    * partition the string and merges only concatenate). */
  def decodeByteCol(piecesCol: Column): Column = {
    import org.apache.spark.sql.functions.{replace => strReplace}
    graft.functions.ByteBpeF.byteUnmap(
      strReplace(piecesCol, lit(" "), lit("")))
  }

  /** `(id, decoded)` — [[decodeByteCol]] over a segmented frame. */
  def decodeByte(df: DataFrame, idCol: String, piecesCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      decodeByteCol(col(piecesCol)).as("decoded"))
}
