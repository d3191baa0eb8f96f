package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Collapse whitespace runs to single spaces in one byte-level pass —
  * exact replacement for `regexp_replace(c, "\\s+", " ")` (Java's `\s`
  * is ASCII-only: space, \t, \n, \x0B, \f, \r), which profiled ~2× the
  * cost of the md5 itself on the exact-dedup normalization path. Byte
  * scanning is UTF-8-safe: multibyte sequences never contain ASCII
  * bytes. */
case class CollapseWs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "collapse_ws"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"collapse_ws needs a string input, got ${other.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    CollapseWsOps.collapse(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CollapseWsOps.collapse($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CollapseWsOps {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def collapse(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new Array[Byte](in.length)
    var i = 0; var j = 0
    var inRun = false
    while (i < in.length) {
      val b = in(i)
      if (isWs(b)) {
        if (!inRun) { out(j) = ' '; j += 1; inRun = true }
      } else {
        out(j) = b; j += 1; inRun = false
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, j))
  }
}

object CollapseWsF {
  def collapseWs(c: Column): Column =
    Bridge.column(CollapseWs(Bridge.expression(c)))
}
