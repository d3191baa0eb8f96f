package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("packSequential matches a single-threaded reference per bucket") {
    val out = Packing.packSequential(docs, "doc_id", "text", seqLen = 128,
      buckets = 8, seed = 3)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // reference: per bucket in id order, running token sum cut every 128
    val ref = docs.select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n"),
        Sampling.hashBucket(col("doc_id"), 3, 8).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._3)
    ref.foreach { case (bucket, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, n, _) =>
        val (gotBucket, gotN, seqIx, offset) = out(id)
        assert(gotBucket == bucket && gotN == n)
        assert(seqIx == cum / 128, s"doc $id seq_ix")
        assert(offset == cum % 128, s"doc $id offset")
        cum += n
      }
    }
    assert(out.size == docs.count())
  }

  test("packGreedy: capacity, completeness, reset-per-bucket, determinism") {
    val cap = 128
    val out = Packing.packGreedy(docs, "doc_id", "text", cap = cap,
      buckets = 8, seed = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // every doc assigned exactly once
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.length == docs.count())
    // no pack exceeds cap unless it holds a single oversized doc
    out.groupBy(t => (t._2, t._4)).foreach { case ((b, p), members) =>
      val total = members.map(_._3).sum
      assert(total <= cap || members.length == 1,
        s"bucket $b pack $p holds $total tokens across ${members.length} docs")
      // offsets tile the pack contiguously from 0 in id order
      val sorted = members.sortBy(_._1)
      var used = 0L
      sorted.foreach { case (id, _, n, _, off) =>
        assert(off == used, s"doc $id offset $off != running fill $used")
        used += n
      }
    }
    // next-fit invariant: a doc opens a new pack ONLY if it did not fit —
    // reconstruct the scan per bucket and compare assignments exactly
    out.groupBy(_._2).foreach { case (_, members) =>
      var packIx = -1L; var used = 0L
      members.sortBy(_._1).foreach { case (id, _, n, gotPack, gotOff) =>
        if (packIx < 0 || used + n > cap) { packIx += 1; used = 0L }
        assert(gotPack == packIx && gotOff == used, s"doc $id greedy replay")
        used += n
      }
    }
    // determinism across parallelism: same assignment at 1 partition
    val again = Packing.packGreedy(docs.repartition(1), "doc_id", "text",
      cap = cap, buckets = 8, seed = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("packGreedy gives an oversized doc a pack of its own") {
    val df = Seq(
      (1L, Seq.fill(10)("w").mkString(" ")),   // 10 tokens
      (2L, Seq.fill(50)("x").mkString(" ")),   // oversized vs cap=16
      (3L, Seq.fill(6)("y").mkString(" ")),
    ).toDF("doc_id", "text")
    val out = Packing.packGreedy(df, "doc_id", "text", cap = 16, buckets = 1)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // doc 2 cannot share with doc 1 (10+50>16) and doc 3 cannot share
    // with doc 2's full pack
    assert(out(1L) != out(2L) && out(2L) != out(3L))
  }

  test("lmUnigramScore: rare-token docs score higher; formula matches by hand") {
    val df = Seq(
      (1L, "a a a a"), (2L, "a a a b"), (3L, "c d e f"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmUnigramScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // corpus counts: a=7 b=1 c=1 d=1 e=1 f=1; N=12 V=6; p(w)=(c+1)/18
    def p(c: Long) = (c + 1.0) / 18.0
    def round6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1L) == round6(-math.log(p(7))))
    assert(out(2L) == round6(-(3 * math.log(p(7)) + math.log(p(1))) / 4))
    assert(out(3L) == round6(-math.log(p(1))))
    assert(out(3L) > out(1L), "all-rare doc must out-score all-common doc")
  }

  test("lmBigramScore: interpolated formula matches by hand; short docs emit no row") {
    val df = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "x"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmBigramScore(df, "doc_id", "text", lambda = 0.7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // unigram counts: a=3 b=2 c=1 x=1; N=7 V=4; bigrams: (a,b)=2 (a,c)=1
    def round6(x: Double) = math.rint(x * 1e6) / 1e6
    val lam = 0.7
    def pInterp(cb: Long, cp: Long, cw: Long) =
      lam * cb.toDouble / cp + (1.0 - lam) * (cw + 1.0) / (7 + 4)
    assert(out(1L) == round6(-math.log(pInterp(2, 3, 2))))
    assert(out(1L) == out(2L))
    assert(out(3L) == round6(-math.log(pInterp(1, 3, 1))))
    // a single-token doc has no bigram positions: no output row, but its
    // token still entered the unigram model above (N=7 includes x)
    assert(!out.contains(4L))
    // the rarer continuation scores strictly higher
    assert(out(3L) > out(1L))
    // config errors are loud
    intercept[IllegalArgumentException](
      TextAnalysis.lmBigramScore(df, "doc_id", "text", lambda = 1.0))
  }

  test("lmKneserNeyScore: continuation-count formula matches by hand") {
    val df = Seq(
      (1L, "a b a b"), (2L, "b a"), (3L, "x"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmKneserNeyScore(df, "doc_id", "text", discount = 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // unigrams: a=3 b=3 x=1; bigram tokens: doc1 (a,b)(b,a)(a,b), doc2 (b,a)
    // cb: (a,b)=2 (b,a)=2; types: n1p(a)=1 n1p(b)=1, n1w(a)=1 n1w(b)=1, nbt=2
    def round6(x: Double) = math.rint(x * 1e6) / 1e6
    def pKn(cb: Long, cp: Long, n1p: Double, n1w: Double, nbt: Double) =
      math.max(cb - 0.75, 0.0) / cp + 0.75 * n1p / cp * (n1w / nbt)
    val pBA = pKn(2, 3, 1, 1, 2) // P(b|a) — and P(a|b) is symmetric here
    assert(out(1L) == round6(-(2 * math.log(pBA) + math.log(pBA)) / 3))
    assert(out(2L) == round6(-math.log(pBA)))
    // single-token doc: no bigram positions, no row
    assert(!out.contains(3L))
    intercept[IllegalArgumentException](
      TextAnalysis.lmKneserNeyScore(df, "doc_id", "text", discount = 1.0))
  }

  test("lmKneserNey3Score: trigram backoff chain matches by hand; short docs emit no row") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b d"), (4L, "a b"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmKneserNey3Score(df, "doc_id", "text",
      discount = 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // trigram counts: c3(a,b,c)=2 c3(a,b,d)=1; bigram tokens:
    // c(a,b)=4 (doc4 adds one) c(b,c)=2 c(b,d)=1
    // types: n1p(a,b)=2; nmid(b,c)=1 nmid(b,d)=1 nmid_v(b)=2;
    // n1after(b)=2; n1w(b)=1 n1w(c)=1 n1w(d)=1; nbt=3
    def round6(x: Double) = math.rint(x * 1e6) / 1e6
    def p2(nmidVw: Double, nmidV: Double, n1after: Double, n1w: Double,
           nbt: Double) =
      math.max(nmidVw - 0.75, 0.0) / nmidV + 0.75 * n1after / nmidV * (n1w / nbt)
    def p3(c3: Long, cuv: Long, n1pUv: Double, lower: Double) =
      math.max(c3 - 0.75, 0.0) / cuv + 0.75 * n1pUv / cuv * lower
    val pC = p3(2, 4, 2, p2(1, 2, 2, 1, 3))
    val pD = p3(1, 4, 2, p2(1, 2, 2, 1, 3))
    assert(out(1L) == round6(-math.log(pC)) && out(2L) == out(1L))
    assert(out(3L) == round6(-math.log(pD)))
    // the seen-twice continuation must be cheaper than the seen-once one
    assert(out(1L) < out(3L))
    // 2-token doc: no trigram positions, no row
    assert(!out.contains(4L))
    intercept[IllegalArgumentException](
      TextAnalysis.lmKneserNey3Score(df, "doc_id", "text", discount = 0.0))
  }

  test("lmKneserNeyScore: collocation-locked word soaks less unigram mass than KN's continuation view") {
    // "francisco" appears 3 times but ONLY after "san": raw-frequency
    // interpolation inflates P(francisco) anywhere; KN's continuation
    // count (1 distinct context) keeps its backoff share at the minimum.
    // "york" appears 3 times across 3 distinct contexts.
    val df = Seq(
      (1L, "san francisco san francisco san francisco"),
      (2L, "new york old york big york"),
      (3L, "q francisco"), (4L, "q york"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmKneserNeyScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // both probe docs see the unseen bigram (q, ·): only the continuation
    // term differs — francisco (1 context) must score WORSE than york (4)
    assert(out(3L) > out(4L),
      s"one-context word must keep less backoff mass: $out")
  }

  test("windowDupStats flags exactly the planted repeated window") {
    val shared = (1 to 8).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, shared + " tail one"),    // shares the 8-token window with doc 2
      (2L, shared + " other end"),
      (3L, (20 to 30).map(i => s"uniq$i").mkString(" ")),
      (4L, "too short"),             // < 8 tokens → no output row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.windowDupStats(df, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!out.contains(4L))
    // docs 1 and 2: 10 tokens → 3 windows each; only the pure-shared
    // window (positions 1) repeats across docs
    assert(out(1L) == ((3L, 1L)))
    assert(out(2L) == ((3L, 1L)))
    assert(out(3L) == ((4L, 0L)))
  }

  test("windowDupStats counts in-document repetition with multiplicity") {
    val loop = Seq.fill(3)((1 to 4).map(i => s"w$i").mkString(" ")).mkString(" ")
    // 12 tokens cycling w1..w4: every 4-token window repeats (9 windows,
    // all in equality classes of size >= 2)
    val df = Seq((1L, loop)).toDF("doc_id", "text")
    val out = TextAnalysis.windowDupStats(df, "doc_id", "text", w = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).head
    assert(out._1 == 9L && out._2 == 9L && out._3 == 1.0)
  }

  test("shingleHashesAll keeps duplicates and position count") {
    val df = Seq((1L, Seq("a", "b", "a", "b", "a"))).toDF("id", "toks")
    val all = df.select(graft.functions.ShingleF.shingleHashesAll(col("toks"), 2))
      .head.getSeq[Long](0)
    val dist = df.select(graft.functions.ShingleF.shingleHashes(col("toks"), 2))
      .head.getSeq[Long](0)
    assert(all.length == 4)          // a·b, b·a, a·b, b·a
    assert(dist.length == 2)
    assert(all.toSet == dist.toSet)  // same equality classes
  }
}
