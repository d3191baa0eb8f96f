package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer induction (Kudo, ACL'18 — the SentencePiece
  * model family; the other production tokenizer besides [[Bpe]]): a
  * piece vocabulary with probabilities, trained by EM over segmentation
  * lattices, served by Viterbi.
  *
  * Distributed the same way BPE is: ONE corpus aggregation builds the
  * word-frequency table, and everything after — seeding, every E-step,
  * every prune — is vocabulary-sized. The E-step is one row-local native
  * [[graft.functions.UnigramExpected]] pass over the word table
  * (forward-backward per word, log-domain) followed by a (pid, count)
  * aggregation of at most |vocab| rows; the M-step renormalizes on the
  * driver (the model is vocabulary-bounded by definition, the same
  * driver residency as BPE's merge table). Serving is the row-local
  * [[graft.functions.UnigramSegmentAll]] projection — streamable, no
  * shuffle, expression tree independent of vocabulary size.
  *
  * Determinism note: seeding is exact integer counts with a total tie
  * order (engine-replayable — the unigram_seed oracle row), and Viterbi
  * under a FIXED vocabulary is row-local deterministic (the
  * unigram_segment_scores oracle row replays it by full enumeration).
  * EM expected counts are float sums whose low bits depend on partition
  * order, so the TRAINED probabilities carry contract guarantees
  * (likelihood monotone, probabilities normalized, corpus coverage)
  * rather than bit-exact oracle values — the lr_train posture. */
object Unigram {

  final case class Piece(piece: String, logp: Double)

  /** Substring candidate counts `(piece, cnt)` over the word table:
    * every code-point substring of length ≤ `maxPieceLen`, weighted by
    * word frequency. Input is vocabulary-sized; the explode is bounded
    * by len·maxPieceLen per word. Exact integer counts. */
  def seedCounts(df: DataFrame, textCol: String,
                 maxPieceLen: Int = 8): DataFrame =
    seedCountsFromWords(Bpe.wordCounts(df, textCol), maxPieceLen)

  /** [[seedCounts]] over an explicit (word, n) table — the byte-level
    * path feeds mapped cover tokens through here. */
  def seedCountsFromWords(words: DataFrame,
                          maxPieceLen: Int = 8): DataFrame = {
    require(maxPieceLen >= 1,
      s"seedCounts: maxPieceLen must be >= 1, got $maxPieceLen")
    words
      .select(col("word"), col("n"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("n"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("i") + 1))).as("l"))
      .select(col("word").substr(col("i"), col("l")).as("piece"), col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
  }

  /** Top-`k` seed candidates `(piece, cnt, rnk)`, rank total-ordered
    * (cnt desc, piece asc) — the oracle-row shape. */
  def seedTop(df: DataFrame, textCol: String, maxPieceLen: Int,
              k: Int): DataFrame = {
    require(k > 0, s"seedTop: k must be positive, got $k")
    seedCounts(df, textCol, maxPieceLen)
      .orderBy(col("cnt").desc, col("piece").asc).limit(k)
      // limit(k)-bounded frame under a non-foldable constant key (the
      // shardAssign idiom) — single partition by construction, no
      // WindowExec warning in gate logs
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("cnt"), lit(1)))
          .orderBy(col("cnt").desc, col("piece").asc)).cast("long"))
  }

  /** The FIXED rank-derived vocabulary both engines can construct
    * bit-identically: every single corpus character at logp −4.0, plus
    * the top `topMulti` multi-character candidates at a DYADIC logp from
    * the integer rank (−1.0 − ((rnk−1) mod 8)·0.25 ∈ [−2.75, −1.0]) —
    * dyadic values make every lattice score an EXACT double sum, so the
    * Viterbi maximum is engine-identical regardless of addition order
    * (what lets unigram_segment_scores be a full value oracle). Driver
    * collect is vocabulary-bounded (topMulti + alphabet), the BPE merge
    * table posture. */
  def rankVocab(df: DataFrame, textCol: String, maxPieceLen: Int = 8,
                topMulti: Int = 64): Seq[Piece] = {
    require(topMulti > 0, s"rankVocab: topMulti must be positive, got $topMulti")
    // two collects off one substring-explode aggregate. NOTE (round 22):
    // lazily localCheckpointing this was tried in round 21 and REVERTED
    // after a same-window A/B — the two consumers are small driver
    // collects whose jobs overlap on idle cores, the losing shape of
    // the checkpoint-placement rule (the driver's round-21 board showed
    // unigram_seed/unigram_train regressing 0.78/0.82 load-adjusted;
    // the revert measured unigram_train 1.89 -> 1.47 s warm-min in a
    // both-orders same-window A/B here).
    val seeds = seedCounts(df, textCol, maxPieceLen)
    val multi = seeds.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(topMulti)
      .collect().zipWithIndex.map { case (r, i) =>
        Piece(r.getString(0), -1.0 - (i % 8) * 0.25)
      }
    val chars = seeds.filter(length(col("piece")) === 1)
      .select(col("piece")).collect().map(r => Piece(r.getString(0), -4.0))
    (multi ++ chars).toSeq
  }

  /** One EM step over the word table: E = the native forward-backward
    * expression (one occurrence each, weighted by word frequency), M =
    * driver-side renormalization of the vocabulary-sized count vector.
    * Returns (updated vocab, corpus log-likelihood under the INPUT
    * vocab). Pieces whose expected count hits exactly zero keep a floor
    * share (they stay addressable — pruning is a separate, explicit
    * policy in [[train]]). */
  def emStep(words: DataFrame, vocab: Seq[Piece],
             maxPieceLen: Int): (Seq[Piece], Double) = {
    val pieces = vocab.map(_.piece)
    val logps = vocab.map(_.logp)
    val rows = words.select(
        explode(graft.functions.UnigramF.expected(col("word"), pieces, logps,
          maxPieceLen)).as("e"), col("n"))
      .select(col("e.pid").as("pid"), (col("e.c") * col("n")).as("c"))
      .groupBy(col("pid")).agg(sum(col("c")).as("c"))
      .collect()
    val counts = new Array[Double](vocab.size)
    var ll = 0.0
    rows.foreach { r =>
      val pid = r.getInt(0)
      if (pid == -1) ll = r.getDouble(1) else counts(pid) = r.getDouble(1)
    }
    val floor = 1e-12
    val total = counts.map(c => math.max(c, floor)).sum
    val next = vocab.indices.map { i =>
      Piece(vocab(i).piece, math.log(math.max(counts(i), floor) / total))
    }
    (next, ll)
  }

  /** Train a unigram tokenizer: seed (top `seedSize` candidates + the
    * full alphabet, probabilities ∝ seed counts), run `iters` EM steps,
    * prune to `vocabSize` keeping every single character (the
    * SentencePiece keep-the-alphabet rule — segmentation stays total on
    * the training corpus), renormalize. Returns the vocab and the
    * per-iteration corpus log-likelihoods (non-decreasing — the EM
    * guarantee the contract row checks). */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 8, seedSize: Int = 512,
            iters: Int = 3): (Seq[Piece], Seq[Double]) =
    trainWords(Bpe.wordCounts(df, textCol), vocabSize, maxPieceLen,
      seedSize, iters)

  /** BYTE-LEVEL training: the word table is [[Bpe.wordCountsByte]]'s
    * cover tokens mapped through the GPT-2 byte alphabet — pieces are
    * mapped-byte strings, so segmentation is lossless on ANY input (the
    * Bpe byteLevel posture; serving via [[segmentByte]]). The seed / EM
    * / prune machinery is shared verbatim. */
  def trainByte(df: DataFrame, textCol: String, vocabSize: Int,
                maxPieceLen: Int = 8, seedSize: Int = 512,
                iters: Int = 3): (Seq[Piece], Seq[Double]) =
    trainWords(
      Bpe.wordCountsByte(df, textCol).select(
        graft.functions.ByteBpeF.byteMap(col("word")).as("word"), col("n")),
      vocabSize, maxPieceLen, seedSize, iters)

  private def trainWords(wordsIn: DataFrame, vocabSize: Int,
                         maxPieceLen: Int, seedSize: Int,
                         iters: Int): (Seq[Piece], Seq[Double]) = {
    require(vocabSize > 0, s"train: vocabSize must be positive, got $vocabSize")
    require(iters >= 1, s"train: iters must be >= 1, got $iters")
    val words = wordsIn.persist()
    try {
      // the seed-candidate table feeds TWO collects (multi + chars);
      // the substring explode+aggregate runs once per collect, BUT the
      // round-21 lazy localCheckpoint here was REVERTED in round 22: the
      // consumers are small driver collects whose jobs overlap on idle
      // cores — the losing checkpoint-placement shape (see rankVocab).
      val seeds = seedCountsFromWords(words, maxPieceLen)
      val multi = seeds.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece").asc).limit(seedSize)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val chars = seeds.filter(length(col("piece")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val all = multi ++ chars
      val total = all.map(_._2).sum.toDouble
      var vocab: Seq[Piece] =
        all.map { case (p, c) => Piece(p, math.log(c / total)) }.toSeq
      val lls = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 0 until iters) {
        val (next, ll) = emStep(words, vocab, maxPieceLen)
        lls += ll
        vocab = next
      }
      // prune: keep all single-CODE-POINT pieces + the best multi pieces
      val (charPieces, multiPieces) =
        vocab.partition(p => p.piece.codePointCount(0, p.piece.length) == 1)
      val kept = charPieces ++ multiPieces
        .sortBy(p => (-p.logp, p.piece))
        .take(math.max(vocabSize - charPieces.size, 0))
      val norm = math.log(kept.map(p => math.exp(p.logp)).sum)
      (kept.map(p => Piece(p.piece, p.logp - norm)).sortBy(_.piece), lls.toSeq)
    } finally { words.unpersist(); () }
  }

  /** Segment documents with a frozen vocab: `(id, n_pieces, pieces)`,
    * pieces space-joined with `</w>` word markers — the [[Bpe.segment]]
    * rendering, so [[Bpe.decodeCol]] decodes BOTH tokenizer families
    * (decode∘segment = normText, the round-trip oracle law). One
    * map-only row-local projection. */
  def segment(df: DataFrame, idCol: String, textCol: String,
              vocab: Seq[Piece], maxPieceLen: Int = 8): DataFrame = {
    val pieces = graft.functions.UnigramF.segmentAll(
      TextAnalysis.wsTokens(TextAnalysis.normText(col(textCol))),
      vocab.map(_.piece), vocab.map(_.logp), maxPieceLen)
    df.select(col(idCol).as("id"),
      size(pieces).cast("long").as("n_pieces"),
      array_join(pieces, " ").as("pieces"))
  }

  /** BYTE-LEVEL [[segment]]: cover tokens of the RAW text, each mapped
    * to the byte alphabet and Viterbi-segmented (no `</w>` — boundaries
    * are implicit; the space byte maps to 'Ġ', so the space-joined
    * rendering is unambiguous and [[Bpe.decodeByteCol]] recovers the
    * raw text LOSSLESSLY for any vocab — the identity round-trip law,
    * strictly harder than the char path's normText law). Row-local →
    * streamable. */
  def segmentByte(df: DataFrame, idCol: String, textCol: String,
                  vocab: Seq[Piece], maxPieceLen: Int = 8): DataFrame = {
    val pieces = graft.functions.UnigramF.segmentAll(
      Bpe.coverTokens(col(textCol)),
      vocab.map(_.piece), vocab.map(_.logp), maxPieceLen, byteLevel = true)
    df.select(col(idCol).as("id"),
      size(pieces).cast("long").as("n_pieces"),
      array_join(pieces, " ").as("pieces"))
  }

  /** Best-segmentation score per distinct corpus word under a fixed
    * vocab: `(word, score)` (rounded 6; words with out-of-vocabulary
    * characters drop — matching the enumeration oracle's in-vocab
    * universe). */
  def wordScores(df: DataFrame, textCol: String, vocab: Seq[Piece],
                 maxPieceLen: Int = 8, maxWordLen: Int = 12): DataFrame =
    Bpe.wordCounts(df, textCol)
      .filter(length(col("word")) <= maxWordLen)
      .select(col("word"),
        round(graft.functions.UnigramF.score(col("word"), vocab.map(_.piece),
          vocab.map(_.logp), maxPieceLen), 6).as("score"))
      .filter(col("score").isNotNull)

  /** The vocab as a DataFrame (piece, logp) — the dataset-var serving
    * shape for the DFL front door. */
  def vocabDf(spark: org.apache.spark.sql.SparkSession,
              vocab: Seq[Piece]): DataFrame = {
    import spark.implicits._
    vocab.map(p => (p.piece, p.logp)).toDF("piece", "logp")
  }

  /** DuckDB rendering of [[seedTop]]. */
  def seedSql(table: String, textCol: String, maxPieceLen: Int,
              k: Int): String =
    s"""WITH w AS (
       |  SELECT word, count(*) AS n FROM (
       |    SELECT unnest(string_split(
       |      lower(trim(regexp_replace($textCol, '\\s+', ' ', 'g'))), ' ')) AS word
       |      FROM $table) t
       |   WHERE word <> '' GROUP BY 1),
       |sub AS (
       |  SELECT substring(word, i, l) AS piece, n
       |    FROM w,
       |    LATERAL (SELECT unnest(generate_series(1, len(word))) AS i) s1,
       |    LATERAL (SELECT unnest(generate_series(1, least($maxPieceLen, len(word) - i + 1))) AS l) s2),
       |c AS (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM sub GROUP BY 1)
       |SELECT piece, cnt,
       |       CAST(row_number() OVER (ORDER BY cnt DESC, piece ASC) AS BIGINT) AS rnk
       |  FROM c
       |QUALIFY row_number() OVER (ORDER BY cnt DESC, piece ASC) <= $k""".stripMargin

  /** DuckDB rendering of [[wordScores]] under [[rankVocab]]: the vocab
    * rebuilds from the same integer seed statistics (rank-derived DYADIC
    * logps → exact double sums), and the Viterbi maximum replays by FULL
    * ENUMERATION — every cut mask of every word (≤ 2^(maxWordLen−1)
    * segmentations), scored where all pieces are in-vocab, max per word.
    * Value-identical to the DP by exactness of the arithmetic. */
  def wordScoresSql(table: String, textCol: String, maxPieceLen: Int,
                    topMulti: Int, maxWordLen: Int): String =
    s"""WITH w AS (
       |  SELECT word, count(*) AS n FROM (
       |    SELECT unnest(string_split(
       |      lower(trim(regexp_replace($textCol, '\\s+', ' ', 'g'))), ' ')) AS word
       |      FROM $table) t
       |   WHERE word <> '' GROUP BY 1),
       |sub AS (
       |  SELECT substring(word, i, l) AS piece, n
       |    FROM w,
       |    LATERAL (SELECT unnest(generate_series(1, len(word))) AS i) s1,
       |    LATERAL (SELECT unnest(generate_series(1, least($maxPieceLen, len(word) - i + 1))) AS l) s2),
       |c AS (SELECT piece, sum(n) AS cnt FROM sub GROUP BY 1),
       |multi AS (
       |  SELECT piece,
       |         CAST(-1.0 - ((row_number() OVER (ORDER BY cnt DESC, piece ASC) - 1) % 8) * 0.25
       |              AS DOUBLE) AS logp
       |    FROM c WHERE len(piece) >= 2
       |  QUALIFY row_number() OVER (ORDER BY cnt DESC, piece ASC) <= $topMulti),
       |chars AS (SELECT piece, CAST(-4.0 AS DOUBLE) AS logp FROM c WHERE len(piece) = 1),
       |vocab AS (SELECT * FROM multi UNION ALL SELECT * FROM chars),
       |words AS (SELECT word FROM w WHERE len(word) <= $maxWordLen),
       |pm AS (
       |  SELECT word, mask,
       |         list_concat(list_concat(
       |           [CAST(0 AS BIGINT)],
       |           [CAST(i AS BIGINT) FOR i IN generate_series(1, len(word) - 1)
       |            IF (mask >> (i - 1)) & 1 = 1]),
       |           [CAST(len(word) AS BIGINT)]) AS cuts
       |    FROM words,
       |    LATERAL (SELECT unnest(generate_series(0,
       |      CAST(pow(2, len(word) - 1) AS BIGINT) - 1)) AS mask) s),
       |seg AS (
       |  SELECT word, mask,
       |         unnest([substring(word, CAST(cuts[k] + 1 AS INTEGER),
       |                           CAST(cuts[k + 1] - cuts[k] AS INTEGER))
       |                 FOR k IN generate_series(1, len(cuts) - 1)]) AS piece
       |    FROM pm),
       |sc AS (SELECT word, mask, sum(v.logp) AS score,
       |              count(*) AS np, count(v.logp) AS nv
       |         FROM seg LEFT JOIN vocab v ON v.piece = seg.piece
       |        GROUP BY 1, 2)
       |SELECT word, round(max(score), 6) AS score
       |  FROM sc WHERE np = nv GROUP BY 1""".stripMargin
}
