package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-session extension installing graft's native expressions as SQL
  * functions, so `spark.sql("SELECT vector_dot(a, b) …")` and DFL both run
  * the same codegen'd expressions.
  *
  * Two ways in:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *  - code:   `GraftExtensions.install(spark)` on a live session
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private[functions] val registrations
      : Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vector_dot",
      info("vector_dot", "vector_dot(a, b) - dot product of two numeric arrays"),
      { args =>
        require(args.size == 2, "vector_dot takes 2 arguments")
        VectorDot(args(0), args(1))
      }),
    ("shingle_hash",
      info("shingle_hash",
        "shingle_hash(tokens, n) - distinct xxhash64 values of word n-grams"),
      { args =>
        require(args.size == 2, "shingle_hash takes 2 arguments")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"shingle_hash: n must be an integer literal, got $other")
        }
        ShingleHash(args(0), n)
      }),
    ("scrub_pii",
      info("scrub_pii",
        "scrub_pii(s) - redact emails, IPv4 addresses, and phone numbers " +
          "with typed placeholders (<EMAIL>, <IP>, <PHONE>)"),
      { args =>
        require(args.size == 1, "scrub_pii takes 1 argument")
        graft.llm.TextAnalysis.piiPatterns.foldLeft(args(0)) {
          case (acc, (pat, repl)) =>
            org.apache.spark.sql.catalyst.expressions.RegExpReplace(acc,
              org.apache.spark.sql.catalyst.expressions.Literal(pat),
              org.apache.spark.sql.catalyst.expressions.Literal(repl))
        }
      }),
    ("freq_items",
      info("freq_items",
        "freq_items(item, capacity) - Misra-Gries heavy-hitter summary: " +
          "array<struct<item,cnt>> (cnt desc), counts are lower bounds, " +
          "every item with freq > N/(capacity+1) survives"),
      { args =>
        require(args.size == 2, "freq_items takes (item, capacity)")
        import org.apache.spark.sql.catalyst.expressions.Literal
        val cap = args(1) match {
          case Literal(v: Int, _)  => v
          case Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"freq_items: capacity must be an integer literal, got $other")
        }
        // an AggregateFunction registers like any expression; the
        // analyzer wraps it in an AggregateExpression (as for built-ins)
        FreqItemsAgg(args(0), cap)
      }),
    ("unicode_norm",
      info("unicode_norm",
        "unicode_norm(s[, form[, strip_accents]]) - Unicode-normalize a " +
          "string (form: NFC default, NFD/NFKC/NFKD; strip_accents " +
          "removes combining marks)"),
      { args =>
        require(args.nonEmpty && args.size <= 3,
          "unicode_norm takes (s[, form[, strip_accents]])")
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.StringType
        import org.apache.spark.unsafe.types.UTF8String
        val form = if (args.size > 1) args(1) match {
          case Literal(v: UTF8String, StringType) => v.toString
          case other => throw new IllegalArgumentException(
            s"unicode_norm: form must be a string literal, got $other")
        } else "NFC"
        val strip = args.size > 2 && (args(2) match {
          case Literal(b: Boolean, _) => b
          case other => throw new IllegalArgumentException(
            s"unicode_norm: strip_accents must be a boolean literal, got $other")
        })
        UnicodeNorm(args(0), form, strip)
      }),
  )

  /** Register on an already-running session (idempotent). */
  def install(spark: SparkSession): Unit =
    registrations.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
