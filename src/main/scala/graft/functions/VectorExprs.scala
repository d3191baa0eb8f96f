package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** `dot(a, b)` over two `array<numeric>` columns as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0d, _+_)`: Spark's higher-order
  * array functions are `CodegenFallback` — every element round-trips
  * through boxed lambda evaluation, which made the all-pairs cosine and
  * ANN queries ~50× slower than a primitive loop. This expression reads
  * `ArrayData` elements directly (float or double, each side independent),
  * accumulates in double, and generates a tight Java loop, so the dot
  * product fuses into the surrounding WholeStageCodegen stage.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                     ByteType | ShortType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot needs array<numeric> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def read(ad: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => ad.getFloat(i).toDouble
    case DoubleType  => ad.getDouble(i)
    case IntegerType => ad.getInt(i).toDouble
    case LongType    => ad.getLong(i).toDouble
    case ByteType    => ad.getByte(i).toDouble
    case ShortType   => ad.getShort(i).toDouble
    case other       => throw new IllegalStateException(s"vector_dot: $other")
  }

  // dimension mismatch → null (matches the replaced zip_with/aggregate
  // semantics, where the padded nulls poisoned the sum) rather than a
  // silently-truncated, plausible-looking dot product
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lt = elemType(left); val rt = elemType(right)
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      // a null element poisons the whole product → null result, matching
      // the zip_with/aggregate semantics this expression replaces
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += read(x, i, lt) * read(y, i, rt); i += 1
    }
    s
  }

  private def accessor(t: DataType): String = t match {
    case FloatType   => "getFloat"
    case DoubleType  => "getDouble"
    case IntegerType => "getInt"
    case LongType    => "getLong"
    case ByteType    => "getByte"
    case ShortType   => "getShort"
    case other       => throw new IllegalStateException(s"vector_dot: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val la = accessor(elemType(left))
      val ra = accessor(elemType(right))
      // null element → null result, mirroring nullSafeEval
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ((double) $a.$la($i)) * ((double) $b.$ra($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level vector math over the native [[VectorDot]] expression. */
object VectorF {
  def dot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(a), Bridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
