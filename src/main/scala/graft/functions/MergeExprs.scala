package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `merge_adjacent(syms)` — one left-to-right pass over a symbol array
  * replacing every non-overlapping adjacent (left, right) occurrence
  * with the concatenated symbol: the BPE merge application (Sennrich et
  * al., ACL'16 — leftmost-first greedy, so "a a a" under merge (a,a)
  * becomes ["aa", "a"], never ["a", "aa"]).
  *
  * A native expression because the merge loop is inherently stateful
  * (the cursor advances by 2 on a match) — no composition of built-in
  * array functions expresses it, and a UDF would break codegen. Runs
  * over the word-frequency table during training (vocabulary-sized) and
  * over exploded words at segmentation time. */
case class MergeAdjacent(child: Expression, left: String, right: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "merge_adjacent"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"merge_adjacent needs array<string>, got ${other.sql}")
  }

  @transient private lazy val leftU = UTF8String.fromString(left)
  @transient private lazy val rightU = UTF8String.fromString(right)
  @transient private lazy val mergedU = UTF8String.fromString(left + right)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && !arr.isNullAt(i) && !arr.isNullAt(i + 1) &&
          arr.getUTF8String(i) == leftU && arr.getUTF8String(i + 1) == rightU) {
        out.add(mergedU); i += 2
      } else {
        if (arr.isNullAt(i)) return null
        out.add(arr.getUTF8String(i)); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("mergeLeft", leftU,
      classOf[UTF8String].getName)
    val rRef = ctx.addReferenceObj("mergeRight", rightU,
      classOf[UTF8String].getName)
    val mRef = ctx.addReferenceObj("mergeJoined", mergedU,
      classOf[UTF8String].getName)
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |java.util.ArrayList<$utf8> $out = new java.util.ArrayList<$utf8>($n);
         |boolean $bad = false;
         |int $i = 0;
         |while ($i < $n && !$bad) {
         |  if ($i < $n - 1 && !$a.isNullAt($i) && !$a.isNullAt($i + 1) &&
         |      $a.getUTF8String($i).equals($lRef) &&
         |      $a.getUTF8String($i + 1).equals($rRef)) {
         |    $out.add($mRef); $i += 2;
         |  } else if ($a.isNullAt($i)) {
         |    $bad = true;
         |  } else {
         |    $out.add($a.getUTF8String($i)); $i += 1;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    $out.toArray()); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MergeF {
  def mergeAdjacent(syms: Column, left: String, right: String): Column =
    Bridge.column(MergeAdjacent(Bridge.expression(syms), left, right))
}
