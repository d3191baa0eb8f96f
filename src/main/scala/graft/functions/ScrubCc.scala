package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `scrub_cc(text)` — replace Luhn-VALID card-number runs with `<CC>`.
  * A pure regex pass can only match "13–19 digits", which false-
  * positives on order ids, timestamps, and phone numbers; the Luhn
  * checksum is what separates a real PAN (issuers guarantee it) from
  * arbitrary digits, and a checksum is not expressible in a regex — so
  * this lives as a native expression beside the regex-shaped
  * [[graft.llm.TextAnalysis.scrubPii]] patterns.
  *
  * Candidate = a maximal run of digits optionally separated by single
  * spaces/dashes (the common 4-4-4-4 formatting), starting and ending
  * with a digit. A candidate with 13–19 digits that passes Luhn is
  * replaced whole (separators included); anything else — wrong length,
  * checksum failure, double separators — passes through verbatim.
  * Conservative by construction: a valid PAN embedded in a LONGER digit
  * run is not recognized (documented; such runs are not card shapes).
  * Row-local, codegen'd, zero shuffle. */
case class ScrubCcLuhn(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "scrub_cc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"scrub_cc needs a string input, got ${other.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    ScrubCcOps.scrub(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ScrubCcOps.scrub($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScrubCcOps {
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isSep(c: Char): Boolean = c == ' ' || c == '-'

  /** Luhn checksum over the digits (most-significant first). */
  private def luhn(digits: java.lang.StringBuilder): Boolean = {
    var sum = 0
    var dbl = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (dbl) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      dbl = !dbl
      i -= 1
    }
    sum % 10 == 0
  }

  def scrub(s: UTF8String): UTF8String = {
    val in = s.toString
    val out = new java.lang.StringBuilder(in.length)
    val digits = new java.lang.StringBuilder(19)
    var i = 0
    while (i < in.length) {
      if (!isDigit(in.charAt(i))) { out.append(in.charAt(i)); i += 1 }
      else {
        // scan one candidate run: digits, with SINGLE separators allowed
        // only between digits; the run ends at the last digit
        digits.setLength(0)
        var j = i
        var end = i // exclusive end of the last digit seen
        var stop = false
        while (j < in.length && !stop) {
          val ch = in.charAt(j)
          if (isDigit(ch)) {
            if (digits.length < 20) digits.append(ch)
            j += 1; end = j
          } else if (isSep(ch) && end == j && j + 1 < in.length &&
              isDigit(in.charAt(j + 1))) {
            j += 1 // single separator directly between digits
          } else stop = true
        }
        val n = digits.length
        if (n >= 13 && n <= 19 && luhn(digits)) out.append("<CC>")
        else out.append(in, i, end)
        i = end
      }
    }
    UTF8String.fromString(out.toString)
  }
}

object ScrubCcF {
  def scrubCc(c: Column): Column =
    Bridge.column(ScrubCcLuhn(Bridge.expression(c)))
}
