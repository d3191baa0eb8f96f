package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tokens NOT covered by any width-`w` span from a start-position list —
  * the span-scrub rebuild (`removeDupSpans` / `scrubContamSpans`) as ONE
  * native row-local pass.
  *
  * Replaces the higher-order `filter(toks, (t,i) => !exists(starts, ...))`
  * chain, which rescans the start list per token: O(tokens × starts) per
  * row, ~10¹⁰ comparisons for a pathological fully-duplicated 10⁵-token
  * document. Here the starts sort once (O(m log m)) and a single
  * two-pointer sweep tests every token in O(tokens + starts): the sweep
  * keeps `j` at the first start whose span could still cover `i`
  * (`ss(j) + w > i`); token `i` is covered iff that start has begun
  * (`ss(j) <= i`). Same answer as the nested-lambda form for every input
  * (the coverage predicate is identical), so the DuckDB oracles are
  * unchanged. Per-row, no shuffle, stays inside WholeStageCodegen via a
  * static helper call.
  */
case class CoverageKeep(left: Expression, right: Expression, w: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "coverage_keep"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) if w >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"coverage_keep needs (array<string>, array<int>) and w >= 1, " +
          s"got (${l.sql}, ${r.sql}), w=$w")
    }

  override def nullSafeEval(toks: Any, starts: Any): Any =
    CoverageKeepOps.keep(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.functions.CoverageKeepOps.keep($t, $s, $w);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CoverageKeepOps {
  /** Tokens whose index is covered by no `[s, s+w)` span, original order.
    * O(tokens + starts) after an O(m log m) sort of the start list. */
  def keep(toks: ArrayData, starts: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    val m = starts.numElements()
    val ss = new Array[Int](m)
    var i = 0
    while (i < m) { ss(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(ss)
    val out = new Array[UTF8String](n)
    var k = 0
    var j = 0 // first start whose span could still cover i: ss(j) + w > i
    i = 0
    while (i < n) {
      while (j < m && ss(j) + w <= i) j += 1
      if (!(j < m && ss(j) <= i)) { out(k) = toks.getUTF8String(i); k += 1 }
      i += 1
    }
    new GenericArrayData(if (k == n) out else java.util.Arrays.copyOf(out, k))
  }
}

object CoverageF {
  /** Column wrapper: tokens not covered by any width-`w` dup span. */
  def coverageKeep(toks: Column, starts: Column, w: Int): Column =
    Bridge.column(CoverageKeep(Bridge.expression(toks),
      Bridge.expression(starts), w))
}
