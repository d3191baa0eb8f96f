package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class WebTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(TextAnalysis.extractHtmlText(col("h"))).head().getString(0)

  test("extractHtmlText strips elements, decodes entities, collapses whitespace") {
    assert(extract("<p>hello <b>world</b></p>") == "hello world")
    // script/style content is NOT content — dropped with the element,
    // even when it contains comparison operators or braces
    assert(extract("<script>if (a<b) { x(); }</script>text") == "text")
    assert(extract("<style>p > span { color: red }</style>text") == "text")
    assert(extract("before<!-- secret -->after") == "before after")
    // entity set, &amp; decoded LAST: double-encoded resolves ONE level
    assert(extract("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end")
      == "a & b <tag> \"q\" 's' end")
    assert(extract("&amp;lt;") == "&lt;")
    // multiline documents and attribute-heavy tags
    assert(extract("<div class=\"a\" data-x='1'>\n  two\n  lines\n</div>")
      == "two lines")
    assert(extract("") == "")
  }

  test("extractHtmlBlocks keeps paragraph boundaries as lines") {
    def blocks(html: String): String =
      Seq(Tuple1(html)).toDF("h")
        .select(TextAnalysis.extractHtmlBlocks(col("h"))).head().getString(0)
    assert(blocks("<p>one</p><p>two</p>") == "one\ntwo")
    assert(blocks("<div>a<br>b</div><ul><li>x</li><li>y</li></ul>")
      == "a\nb\nx\ny")
    // inline tags do NOT break blocks; blank blocks fold away
    assert(blocks("<p>a <b>bold</b> word</p><p>  </p><p>tail</p>")
      == "a bold word\ntail")
    // script/style/comment content never becomes a line
    assert(blocks("<p>keep</p><script>drop();</script><p>also</p>")
      == "keep\nalso")
    assert(blocks("") == "")
  }

  test("dedupLines: first occurrence survives, docs reassemble in order, empties exempt") {
    val df = Seq(
      (1L, "alpha line\nshared footer\nbeta line"),
      (2L, "gamma line\nshared footer\n\ndelta line"),
      (3L, "shared footer\nalpha line"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 holds the first occurrence of both duplicated lines
    assert(out(1L) == ((3L, 3L, "alpha line\nshared footer\nbeta line")))
    // doc 2 loses the footer copy; its EMPTY line is exempt and survives
    assert(out(2L) == ((4L, 3L, "gamma line\n\ndelta line")))
    // doc 3 loses both copies → empty document, not a missing row
    assert(out(3L) == ((2L, 0L, "")))
  }

  test("dedupLines normalizes before matching and respects a custom separator") {
    val df = Seq(
      (1L, "Shared  Footer|unique a"),
      (2L, "shared footer|unique b"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(df, "doc_id", "text", sep = "|")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // case/whitespace variants are ONE equality class; raw text survives
    assert(out(1L) == "Shared  Footer|unique a")
    assert(out(2L) == "unique b")
    intercept[IllegalArgumentException](
      TextAnalysis.dedupLines(df, "doc_id", "text", sep = ""))
  }

  test("scrubCc redacts only Luhn-valid card shapes") {
    def scrub(s: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(graft.functions.ScrubCcF.scrubCc(col("t"))).head().getString(0)
    // valid PANs in the common formats
    assert(scrub("pay 4111111111111111 now") == "pay <CC> now")
    assert(scrub("pay 4111 1111 1111 1111 now") == "pay <CC> now")
    assert(scrub("pay 4111-1111-1111-1111 now") == "pay <CC> now")
    // checksum failure → untouched (the regex-only false positive)
    assert(scrub("id 4111111111111112 x") == "id 4111111111111112 x")
    // wrong lengths → untouched
    assert(scrub("z 411111111111 z") == "z 411111111111 z")          // 12
    assert(scrub("z 41111111111111111111 z") == "z 41111111111111111111 z") // 20
    // a double separator breaks the run before it
    assert(scrub("4111111111111111  2") == "<CC>  2")
    assert(scrub("4111 1111  1111 1111") == "4111 1111  1111 1111")
    // trailing separator is not part of the run
    assert(scrub("4111111111111111-") == "<CC>-")
    // two cards in one line; text around digits preserved exactly
    assert(scrub("a 4111111111111111 b 5500005555555559 c")
      == "a <CC> b <CC> c")
    // Luhn reference cross-check on random digit strings
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val n = 13 + rnd.nextInt(7)
      val ds = Array.fill(n)(rnd.nextInt(10))
      val sum = ds.reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      val s = ds.mkString
      val expected = if (sum % 10 == 0) "<CC>" else s
      assert(scrub(s"q $s q") == s"q $expected q", s"n=$n s=$s")
    }
  }

  test("dedupLines is invariant to input partitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lined = docs.select(col("doc_id"),
      regexp_replace(col("text"), " (\\w+ \\w+ \\w+) ", " $1\n").as("text"))
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.dedupLines(df, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sortBy(_._1).toSeq
    assert(run(lined) == run(lined.repartition(13)))
  }
}
