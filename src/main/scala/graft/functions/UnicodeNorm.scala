package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for corpus cleaning — the "same text, different
  * bytes" problem exact dedup and n-gram matching hit on real web data:
  * `café` appears both precomposed (U+00E9) and decomposed (e + U+0301),
  * and compatibility characters (ﬁ ligature, full-width digits) split
  * token statistics. `form` is any [[java.text.Normalizer.Form]] (NFC
  * the default for byte canonicalization, NFKC for compatibility
  * folding); `stripAccents` additionally removes combining marks (NFD →
  * drop Mn category → recompose), the DuckDB-`strip_accents`-compatible
  * treatment for accent-insensitive matching.
  *
  * A native codegen expression (not a UDF): normalization sits on the
  * same hot path as fingerprinting/shingling, and the fast path below
  * skips the Normalizer entirely for pure-ASCII input — the overwhelming
  * majority of rows in practice pay one byte scan. */
case class UnicodeNorm(child: Expression, form: String,
                       stripAccents: Boolean) extends UnaryExpression {

  // validate eagerly: a bad form name is a query-authoring error
  Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unicode_norm"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_norm needs a string input, got ${other.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    UnicodeNormOps.norm(s.asInstanceOf[UTF8String], form, stripAccents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UnicodeNormOps.norm($c, "$form", $stripAccents);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormOps {

  /** Pure-ASCII bytes are fixed points of every normalization form and
    * carry no combining marks — skip the (allocating) Normalizer. */
  private def isAscii(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < bytes.length) { if (bytes(i) < 0) return false; i += 1 }
    true
  }

  def norm(s: UTF8String, form: String, stripAccents: Boolean): UTF8String = {
    val bytes = s.getBytes
    if (isAscii(bytes)) return s
    val str = s.toString
    val out = if (stripAccents) {
      // decompose, drop combining marks, then bring the survivors to the
      // requested form (NFC recomposes what's left)
      val decomposed = Normalizer.normalize(str, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(decomposed.length)
      var i = 0
      while (i < decomposed.length) {
        val c = decomposed.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        i += 1
      }
      Normalizer.normalize(sb, Normalizer.Form.valueOf(form))
    } else Normalizer.normalize(str, Normalizer.Form.valueOf(form))
    UTF8String.fromString(out)
  }
}

object UnicodeNormF {
  def unicodeNorm(c: Column, form: String = "NFC",
                  stripAccents: Boolean = false): Column =
    Bridge.column(UnicodeNorm(Bridge.expression(c), form, stripAccents))
}
