package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.UnigramF

class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private def seg(text: String, vocab: Seq[(String, Double)],
                  maxLen: Int = 8): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(UnigramF.segmentAll(split(col("t"), " "),
        vocab.map(_._1), vocab.map(_._2), maxLen))
      .head().getSeq[String](0).toSeq

  test("Viterbi picks the max-probability segmentation; </w> marks word ends") {
    val vocab = Seq("a" -> -1.0, "b" -> -1.0, "ab" -> -0.5)
    assert(seg("ab", vocab) == Seq("ab</w>"))          // -0.5 beats -2.0
    assert(seg("aba", vocab) == Seq("ab", "a</w>"))    // -1.5 beats -3.0
    assert(seg("ab ab", vocab) == Seq("ab</w>", "ab</w>"))
    // when the multi piece is the EXPENSIVE one, chars win
    val charCheap = Seq("a" -> -0.1, "b" -> -0.1, "ab" -> -0.5)
    assert(seg("ab", charCheap) == Seq("a", "b</w>"))  // -0.2 beats -0.5
  }

  test("a longer piece can span an unreachable position") {
    // no single 'a'/'b' in vocab: position 1 of "ab" is unreachable but
    // the word still segments through the spanning piece
    val vocab = Seq("ab" -> -0.5, "c" -> -1.0)
    assert(seg("ab", vocab) == Seq("ab</w>"))
    val scored = Seq(Tuple1("ab")).toDF("w")
      .select(UnigramF.score(col("w"), vocab.map(_._1), vocab.map(_._2), 8))
      .head()
    assert(scored.getDouble(0) == -0.5)
  }

  test("OOV characters pass through at the floor (segmentation is total); score is NULL") {
    val vocab = Seq("a" -> -1.0, "b" -> -1.0)
    assert(seg("axb", vocab) == Seq("a", "x", "b</w>"))
    val s = Seq(Tuple1("axb")).toDF("w")
      .select(UnigramF.score(col("w"), vocab.map(_._1), vocab.map(_._2), 8))
      .head()
    assert(s.isNullAt(0), "score has no OOV floor — must be NULL")
  }

  test("expected counts match the hand-computed two-path lattice") {
    // vocab {a: 1/2, aa: 1/2}; word "aa": [aa] p=1/2, [a,a] p=1/4
    // Z = 3/4; E[aa] = (1/2)/(3/4) = 2/3; E[a] = 2·(1/4)/(3/4) = 2/3
    val pieces = Seq("a", "aa")
    val logps = Seq(math.log(0.5), math.log(0.5))
    val rows = Seq(Tuple1("aa")).toDF("w")
      .select(explode(UnigramF.expected(col("w"), pieces, logps, 8)).as("e"))
      .select(col("e.pid"), col("e.c")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows(-1) - math.log(0.75)) < 1e-12, s"logZ: $rows")
    assert(math.abs(rows(0) - 2.0 / 3.0) < 1e-12, s"E[a]: $rows")
    assert(math.abs(rows(1) - 2.0 / 3.0) < 1e-12, s"E[aa]: $rows")
  }

  test("expected counts: unsegmentable word yields NULL (no silent zero)") {
    val out = Seq(Tuple1("xyz")).toDF("w")
      .select(UnigramF.expected(col("w"), Seq("a"), Seq(-1.0), 8).as("e"))
      .head()
    assert(out.isNullAt(0))
  }

  test("one EM step shifts mass toward the dominant path and reports the exact likelihood") {
    // corpus: "aa" ×3 — EM must grow p(aa) (it explains the word in one
    // piece) and the reported ll must equal 3·logZ under the INPUT vocab
    val words = Seq(("aa", 3L)).toDF("word", "n")
    val v0 = Seq(Unigram.Piece("a", math.log(0.5)),
      Unigram.Piece("aa", math.log(0.5)))
    val (v1, ll) = Unigram.emStep(words, v0, maxPieceLen = 8)
    assert(math.abs(ll - 3 * math.log(0.75)) < 1e-9)
    val p1 = v1.map(p => p.piece -> math.exp(p.logp)).toMap
    // expected counts: aa 2/3, a 2/3 → renormalized to 1/2 each? No:
    // counts are per-OCCURRENCE sums — both 2; normalized p = 1/2. One
    // step from symmetric init stays symmetric; run a second step from an
    // asymmetric start to see the pull
    assert(math.abs(p1("aa") - 0.5) < 1e-9 && math.abs(p1("a") - 0.5) < 1e-9)
    val vAsym = Seq(Unigram.Piece("a", math.log(0.2)),
      Unigram.Piece("aa", math.log(0.8)))
    val (v2, _) = Unigram.emStep(words, vAsym, maxPieceLen = 8)
    val p2 = v2.map(p => p.piece -> math.exp(p.logp)).toMap
    assert(p2("aa") > 0.8, s"dominant path must gain mass: $p2")
  }

  test("train: EM likelihood non-decreasing, probs normalized, corpus compresses") {
    val (vocab, lls) = Unigram.train(docs, "text", vocabSize = 96,
      maxPieceLen = 8, seedSize = 128, iters = 3)
    assert(lls.size == 3)
    lls.zip(lls.tail).foreach { case (a, b) =>
      assert(b >= a - 1e-6 * math.abs(a), s"EM must not decrease: $lls") }
    assert(math.abs(vocab.map(p => math.exp(p.logp)).sum - 1.0) < 1e-9)
    assert(vocab.exists(_.piece.length >= 2), "multi-char pieces survive pruning")
  }

  test("segmentation with a frozen vocab is invariant to input partitioning") {
    val (vocab, _) = Unigram.train(docs, "text", vocabSize = 64,
      maxPieceLen = 8, seedSize = 96, iters = 1)
    def run(df: org.apache.spark.sql.DataFrame) =
      Unigram.segment(df, "doc_id", "text", vocab)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(17)))
  }

  test("round trip: decode∘segment = normText for arbitrary vocab, nasty inputs included") {
    val df = Seq(
      (1L, "Hello  World"), (2L, ""), (3L, "  padded  "),
      (4L, "café naïve"), (5L, "emoji 😀 tail"),
    ).toDF("doc_id", "text")
    val vocab = Seq(Unigram.Piece("ll", -1.0), Unigram.Piece("hello", -1.25))
    val got = graft.llm.Bpe.decode(
      Unigram.segment(df, "doc_id", "text", vocab), "id", "pieces")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = df.select(col("doc_id"),
        TextAnalysis.normText(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
  }

  test("rankVocab scores replay the enumeration argmax on a hand case") {
    // dyadic-vocab determinism at the unit level: vocab {t:-4, h:-4,
    // e:-4, th:-1.0, he:-1.25, the:-1.5}; "the" best = th+e = -5? no:
    // the=-1.5, th+e=-5.0, t+he=-5.25, t+h+e=-12 → -1.5
    val vocab = Seq("t" -> -4.0, "h" -> -4.0, "e" -> -4.0,
      "th" -> -1.0, "he" -> -1.25, "the" -> -1.5)
    val s = Seq(Tuple1("the")).toDF("w")
      .select(UnigramF.score(col("w"), vocab.map(_._1), vocab.map(_._2), 8))
      .head().getDouble(0)
    assert(s == -1.5)
  }

  test("byte-level round trip is the RAW-text identity on nasty inputs, any vocab") {
    val df = Seq(
      (1L, "Hello  World"), (2L, ""), (3L, "  padded  "),
      (4L, "café naïve"), (5L, "emoji 😀 tail"), (6L, "tab\tand\nnewline"),
    ).toDF("doc_id", "text")
    // arbitrary vocab — the law is vocab-independent (pieces partition
    // the mapped bytes, decode unmaps the concatenation)
    val vocab = Seq(Unigram.Piece("He", -1.0), Unigram.Piece("ll", -1.25),
      Unigram.Piece("Ġ", -0.5))
    val got = Bpe.decodeByte(
      Unigram.segmentByte(df, "doc_id", "text", vocab), "id", "pieces")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
    // and a TRAINED byte vocab serves the same law corpus-wide
    val (tv, _) = Unigram.trainByte(docs.limit(50), "text", vocabSize = 64,
      seedSize = 96, iters = 1)
    val sample = docs.limit(50)
    val got2 = Bpe.decodeByte(
      Unigram.segmentByte(sample, "doc_id", "text", tv), "id", "pieces")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want2 = sample.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 == want2)
  }

  test("guards are loud") {
    intercept[IllegalArgumentException](Unigram.seedCounts(docs, "text", 0))
    intercept[IllegalArgumentException](
      Unigram.train(docs, "text", vocabSize = 0))
    intercept[IllegalArgumentException](
      new graft.functions.UnigramLattice(Array("a"), Array(-1.0, -2.0), 8))
  }
}
