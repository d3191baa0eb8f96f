package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.WpF

class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private def seg(text: String, vocab: Seq[String]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(WpF.wordPieceSegmentAll(split(col("t"), " "), vocab))
      .head().getSeq[String](0).toSeq

  test("trainers reject marker-colliding corpora loudly; byte level stays lossless") {
    // a normalized word containing the literal reserved marker would
    // silently corrupt decode later — the trainer must fail at train
    // time instead (round-trip laws on clean corpora are pinned by the
    // existing roundtrip specs)
    val wpBad = Seq((1L, "contains a lit##eral marker word")).toDF("id", "text")
    val e1 = intercept[IllegalArgumentException](
      WordPiece.learnVocab(wpBad, "text", numMerges = 2, minCount = 1))
    assert(e1.getMessage.contains("##") && e1.getMessage.contains("lit##eral"))
    val bpeBad = Seq((1L, "contains a lit</w>eral marker word")).toDF("id", "text")
    val e2 = intercept[IllegalArgumentException](
      Bpe.learnMerges(bpeBad, "text", numMerges = 2, minCount = 1))
    assert(e2.getMessage.contains("</w>"))
    // the byte-level alphabet has no marker: the same corpus trains and
    // round-trips losslessly
    val m = Bpe.learnMerges(bpeBad, "text", numMerges = 2, minCount = 1,
      byteLevel = true)
    val rt = Bpe.decodeByte(
      Bpe.segmentByte(bpeBad, "id", "text", m), "id", "pieces")
      .head().getString(1)
    assert(rt == "contains a lit</w>eral marker word")
    // a clean corpus still trains after the guard
    val ok = Seq((1L, "plain words train fine")).toDF("id", "text")
    assert(WordPiece.learnVocab(ok, "text", numMerges = 1, minCount = 1)
      ._2.nonEmpty)
  }

  test("greedy longest-match-first with ## continuations") {
    val vocab = Seq("un", "##aff", "##able", "##ffa", "##b", "##l", "##e",
      "u", "##n", "##a", "##f")
    // longest first piece "un", then longest continuation at each step
    assert(seg("unaffable", vocab) ==
      Seq("un", "##aff", "##able"))
  }

  test("greedy is the spec: a long first match can force UNK where a shorter one would segment") {
    // "abc": greedy takes "ab", then needs "##c" — absent → whole word
    // UNK, even though "a"+"##bc" would have worked
    val vocab = Seq("ab", "a", "##bc")
    assert(seg("abc", vocab) == Seq("[UNK]"))
    // with the continuation present, greedy succeeds
    assert(seg("abc", vocab :+ "##c") == Seq("ab", "##c"))
  }

  test("unmatchable first position → UNK; empty words skipped; multi-word flattens in order") {
    val vocab = Seq("a", "##b")
    assert(seg("zb", vocab) == Seq("[UNK]"))
    assert(seg("ab ab", vocab) == Seq("a", "##b", "a", "##b"))
    // split on double space yields an empty word — skipped
    assert(seg("ab  ab", vocab) == Seq("a", "##b", "a", "##b"))
  }

  test("null word element propagates to SQL NULL (codegen and interpreted agree)") {
    val df = Seq(Tuple1(Seq[String]("ab", null))).toDF("w")
    val out = df.select(WpF.wordPieceSegmentAll(col("w"), Seq("a", "##b")))
    assert(out.head().isNullAt(0))
  }

  test("planted corpus learns the hand-computed likelihood-ranked merges") {
    // low:5 lower:2 newest:6 widest:3 — the Sennrich textbook corpus,
    // re-scored by likelihood. Unary counts: l:7 ##o:7 ##w:13 ##e:17
    // ##r:2 n:6 ##s:9 ##t:9 w:3 ##i:3 ##d:3. Hand-ranked by
    // freq/(l·r): (##i,##d) 1/3 (ties (w,##i) 1/3, lex order wins) →
    // (w,##id) 1/3 → (l,##o) 1/7 → (##s,##t) 1/9.
    val planted = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val (merges, vocab) = WordPiece.learnVocab(planted, "text", 4)
    assert(merges.map(m => (m.left, m.right, m.merged, m.freq)) == Seq(
      ("##i", "##d", "##id", 3L),
      ("w", "##id", "wid", 3L),
      ("l", "##o", "lo", 7L),
      ("##s", "##t", "##st", 9L)))
    // base symbols + merge outputs, deduped
    assert(Seq("l", "##o", "##w", "##e", "##r", "n", "##s", "##t", "w",
      "##i", "##d", "##id", "wid", "lo", "##st").forall(vocab.contains))
    // the learned vocab segments a held-out inflection greedily
    assert(seg("lowest", vocab) == Seq("lo", "##w", "##e", "##st"))
    // and decode round-trips it
    val rt = WordPiece.decode(
      WordPiece.segment(Seq((1L, "Lowest  Widest")).toDF("doc_id", "text"),
        "doc_id", "text", vocab), "id", "pieces")
      .head().getString(1)
    assert(rt == "lowest widest")
  }

  test("minCount prunes: no pair reaching it stops learning early") {
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val (merges, vocab) = WordPiece.learnVocab(tiny, "text", 5, minCount = 2)
    assert(merges.isEmpty)
    assert(vocab.sorted == Seq("##b", "a"))
  }

  test("corpus round-trip law: decode ∘ segment = normText for a corpus-covering vocab") {
    val (_, vocab) = WordPiece.learnVocab(docs, "text", 8)
    val segd = WordPiece.segment(docs, "doc_id", "text", vocab)
    // full base coverage of the training corpus → zero UNKs
    assert(segd.filter(col("pieces").contains("[UNK]")).count() == 0)
    val joined = WordPiece.decode(segd, "id", "pieces")
      .join(docs.select(col("doc_id").as("id"),
        TextAnalysis.normText(col("text")).as("want")), Seq("id"))
    assert(joined.filter(col("decoded") =!= col("want")).count() == 0)
  }

  test("property: non-UNK pieces re-concatenate to the word exactly (strip ##, join)") {
    // the local law behind the corpus round trip: greedy segmentation
    // never alters content — pieces partition the word
    val rnd = new scala.util.Random(5)
    val alpha = "abcde"
    def randWord(): String =
      (1 to (1 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // random vocab with full char coverage (so no UNKs) + random multis
    val base = alpha.flatMap(c => Seq(c.toString, "##" + c))
    val multis = (1 to 20).map(_ => randWord()).flatMap(w => Seq(w, "##" + w))
    val vocab = (base ++ multis).distinct
    for (_ <- 1 to 100) {
      val w = randWord()
      val pieces = seg(w, vocab)
      assert(pieces.nonEmpty && !pieces.contains("[UNK]"))
      assert(pieces.head + pieces.tail.map(_.stripPrefix("##")).mkString == w,
        s"word $w pieces $pieces")
      assert(pieces.tail.forall(_.startsWith("##")), s"word $w pieces $pieces")
    }
  }

  test("wordpiece_segment_all compiles under CODEGEN_ONLY (no silent fallback)") {
    val factory = "spark.sql.codegen.factoryMode"
    val prevF = spark.conf.getOption(factory)
    val cg = "spark.sql.codegen.wholeStage"
    val prevC = spark.conf.getOption(cg)
    try {
      spark.conf.set(factory, "CODEGEN_ONLY")
      spark.conf.set(cg, "true")
      assert(seg("ab", Seq("a", "##b")) == Seq("a", "##b"))
    } finally {
      prevF.fold(spark.conf.unset(factory))(spark.conf.set(factory, _))
      prevC.fold(spark.conf.unset(cg))(spark.conf.set(cg, _))
    }
  }
}
