package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native expressions register as SQL functions") {
    GraftExtensions.install(spark)
    Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val dot = spark.sql("SELECT vector_dot(a, b) AS d FROM vecs").head().getDouble(0)
    assert(dot == 32.0)

    Seq("the quick brown fox the quick brown")
      .toDF("text").createOrReplaceTempView("docs_ext")
    val hs = spark.sql(
      "SELECT shingle_hash(split(text, ' '), 3) AS hs FROM docs_ext")
      .head().getSeq[Long](0)
    // 5 trigram positions, 4 distinct ("the quick brown" repeats)
    assert(hs.size == 4)
    assert(hs.distinct.size == hs.size)
  }

  test("scrub_pii registers as a SQL function and matches the column form") {
    GraftExtensions.install(spark)
    Seq("mail bob@x.io or 10.1.2.3 or 555-123-4567 or +12345678901 end")
      .toDF("text").createOrReplaceTempView("pii_docs")
    val viaSql = spark.sql("SELECT scrub_pii(text) AS s FROM pii_docs")
      .head().getString(0)
    assert(viaSql == "mail <EMAIL> or <IP> or <PHONE> or <PHONE> end")
    // the SQL builder folds the same piiPatterns as the Column API
    val viaCol = spark.table("pii_docs")
      .select(graft.llm.TextAnalysis.scrubPii($"text")).head().getString(0)
    assert(viaSql == viaCol)
  }

  test("unicode_norm: forms, accent strip, ASCII fast path, SQL registration") {
    GraftExtensions.install(spark)
    // decomposed é (e + U+0301) composes under NFC; the ligature is a
    // compatibility char: untouched by NFC, folded by NFKC
    val decomposed = "café ﬁn"
    val df = Seq(decomposed).toDF("t")
    val nfc = df.select(UnicodeNormF.unicodeNorm($"t")).head().getString(0)
    assert(nfc == "café ﬁn")
    val nfkc = df.select(UnicodeNormF.unicodeNorm($"t", "NFKC")).head().getString(0)
    assert(nfkc == "café fin")
    // accent strip removes combining marks whether pre- or de-composed,
    // and leaves non-mark letters (œ) alone
    val strip = Seq("café naïve mühle œuf").toDF("t")
      .select(UnicodeNormF.unicodeNorm($"t", "NFC", stripAccents = true))
      .head().getString(0)
    assert(strip == "cafe naive muhle œuf")
    // pure-ASCII input is returned verbatim (fast path) under any form
    val ascii = "plain ascii text 123"
    assert(Seq(ascii).toDF("t")
      .select(UnicodeNormF.unicodeNorm($"t", "NFKD", stripAccents = true))
      .head().getString(0) == ascii)
    // SQL surface: default form, explicit form, strip flag
    Seq(decomposed).toDF("t").createOrReplaceTempView("un_docs")
    assert(spark.sql("SELECT unicode_norm(t) FROM un_docs")
      .head().getString(0) == "café ﬁn")
    assert(spark.sql("SELECT unicode_norm(t, 'NFKC', true) FROM un_docs")
      .head().getString(0) == "cafe fin")
    // a bad form name fails at analysis, not at execution
    intercept[Exception] {
      spark.sql("SELECT unicode_norm(t, 'BOGUS') FROM un_docs").collect()
    }
    // null propagates
    assert(Seq(Option.empty[String]).toDF("t")
      .select(UnicodeNormF.unicodeNorm($"t")).head().isNullAt(0))
  }

  test("vector_dot is null on dimension mismatch, not truncated") {
    GraftExtensions.install(spark)
    spark.range(2).selectExpr(
      "array(1.0d, 2.0d) AS a",
      "CASE WHEN id = 0 THEN array(3.0d, 4.0d) ELSE array(5.0d) END AS b")
      .createOrReplaceTempView("vecs3")
    val rows = spark.sql("SELECT vector_dot(a, b) AS d FROM vecs3").collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("vector_dot is null on a null element, in both eval paths") {
    GraftExtensions.install(spark)
    // non-foldable source → codegen path; literal view → interpreted path
    spark.range(2).selectExpr(
      "array(cast(id AS double), 2.0d) AS a",
      "CASE WHEN id = 0 THEN array(3.0d, NULL) ELSE array(3.0d, 4.0d) END AS b")
      .createOrReplaceTempView("vecs_null")
    val gen = spark.sql("SELECT vector_dot(a, b) AS d FROM vecs_null ORDER BY d NULLS FIRST").collect()
    assert(gen(0).isNullAt(0))        // null element poisons the product
    assert(gen(1).getDouble(0) == 11.0)
    val interp = graft.functions.VectorDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0, null),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = true)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(2.0, 3.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)))
      .eval(null)
    assert(interp == null)
  }

  test("collapse_ws matches regexp_replace(\\s+) exactly, incl. unicode") {
    import org.apache.spark.sql.functions._
    val inputs = Seq(
      "a  b\t\tc", " lead", "trail  ", "\r\n\f mix \t", "", "   ",
      "nowhitespace", "unié  cшde 世  界", "a\nb\r\nc",
    )
    val df = inputs.toDF("s")
    val out = df.select(
      graft.functions.CollapseWsF.collapseWs(col("s")).as("fast"),
      regexp_replace(col("s"), "\\s+", " ").as("regex")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"mismatch on ${r.getString(1)}"))
  }

  test("sql plan with vector_dot stays in whole-stage codegen") {
    GraftExtensions.install(spark)
    // non-foldable source so the projection actually runs (a literal table
    // constant-folds through the interpreted eval path instead)
    spark.range(8).selectExpr(
      "array(cast(id AS double), 1.0d) AS a",
      "array(2.0d, cast(id AS double)) AS b")
      .createOrReplaceTempView("vecs2")
    val q = spark.sql("SELECT vector_dot(a, b) AS d FROM vecs2")
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    assert(q.queryExecution.executedPlan.toString.startsWith("*(1) Project [vector_dot"))
    // dot([id, 1], [2, id]) = 3·id → Σ over 0..7 = 84
    assert(q.collect().map(_.getDouble(0)).sum == 84.0)
  }
}
