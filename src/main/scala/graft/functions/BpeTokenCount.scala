package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of BPE-ish subword tokens — the number of matches of
  * `[a-z]{1,4}|[A-Z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\s]` — as one code-point
  * scan instead of `size(regexp_extract_all(...))`, which materializes an
  * array of every match just to take its length. Leftmost-first greedy
  * matching of that alternation is exactly: runs of lowercase consume 4
  * at a time, uppercase 4, digits 3, ASCII whitespace is skipped, and any
  * other code point is one token. Parity with the regex is pinned by a
  * generated-input property test. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count needs a string input, got ${other.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    BpeTokenCountOps.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeTokenCountOps.count($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCountOps {
  private def isWs(cp: Int): Boolean = // Java regex \s: ASCII only
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  def count(s: UTF8String): Int = {
    val str = s.toString
    val n = str.length
    var i = 0
    var tokens = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c >= 'a' && c <= 'z') {
        var k = 0
        while (k < 4 && i < n && str.charAt(i) >= 'a' && str.charAt(i) <= 'z') { i += 1; k += 1 }
        tokens += 1
      } else if (c >= 'A' && c <= 'Z') {
        var k = 0
        while (k < 4 && i < n && str.charAt(i) >= 'A' && str.charAt(i) <= 'Z') { i += 1; k += 1 }
        tokens += 1
      } else if (c >= '0' && c <= '9') {
        var k = 0
        while (k < 3 && i < n && str.charAt(i) >= '0' && str.charAt(i) <= '9') { i += 1; k += 1 }
        tokens += 1
      } else if (isWs(c)) {
        i += 1
      } else {
        // one token per code point (surrogate pairs are one match for `.`-class)
        i += Character.charCount(str.codePointAt(i))
        tokens += 1
      }
    }
    tokens
  }
}

object BpeF {
  def bpeTokenCount(c: Column): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(c)))
}
