package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Dot products of one vector column against a whole QUERY MATRIX in one
  * pass: returns `array<double>` with one dot per matrix row. The matrix
  * rides along as a flat `double[]` reference object — composing Q
  * [[VectorDot]]s against array literals costs Q·dim literal nodes in the
  * plan (the [[HyperplaneBands]] lesson), and re-reads the vector column
  * Q times; here the vector is copied to a local double[] once and the
  * generated code is two primitive loops. This is the batched-ANN scoring
  * shape: one corpus scan serves every query in the batch. */
case class MatVecDots(child: Expression, matrix: Array[Double], dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "mat_vec_dots"

  require(matrix.length % dim == 0 && matrix.nonEmpty,
    s"mat_vec_dots: ${matrix.length} matrix values not a multiple of dim $dim")
  private def numRows: Int = matrix.length / dim

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                   ByteType | ShortType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec_dots needs array<numeric>, got ${other.sql}")
  }

  private def read(ad: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => ad.getFloat(i).toDouble
    case DoubleType  => ad.getDouble(i)
    case IntegerType => ad.getInt(i).toDouble
    case LongType    => ad.getLong(i).toDouble
    case ByteType    => ad.getByte(i).toDouble
    case ShortType   => ad.getShort(i).toDouble
    case other       => throw new IllegalStateException(s"mat_vec_dots: $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val t = elemType
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      x(j) = read(v, j, t); j += 1
    }
    val out = new Array[Double](numRows)
    var r = 0
    while (r < numRows) {
      var s = 0.0
      val off = r * dim
      var i = 0
      while (i < dim) { s += matrix(off + i) * x(i); i += 1 }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }

  private def accessor(t: DataType): String = t match {
    case FloatType   => "getFloat"
    case DoubleType  => "getDouble"
    case IntegerType => "getInt"
    case LongType    => "getLong"
    case ByteType    => "getByte"
    case ShortType   => "getShort"
    case other       => throw new IllegalStateException(s"mat_vec_dots: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("matrix", matrix, "double[]")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = accessor(elemType)
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $x = new double[$dim];
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($v.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    $x[$j] = (double) $v.$acc($j);
         |  }
         |  if (!${ev.isNull}) {
         |    double[] $out = new double[$numRows];
         |    for (int $r = 0; $r < $numRows; $r++) {
         |      double $s = 0.0;
         |      int $off = $r * $dim;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $s += $m[$off + $i] * $x[$i];
         |      }
         |      $out[$r] = $s;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVecF {
  /** One dot per query row of `queries` against the vector column. */
  def dots(vec: Column, queries: Seq[Seq[Double]]): Column = {
    require(queries.nonEmpty, "mat_vec_dots: empty query batch")
    val dim = queries.head.size
    // a ragged batch would flatten into a plausible-looking matrix with
    // the wrong row boundaries — phantom queries scoring against halves
    // of real ones, with no error anywhere downstream
    queries.zipWithIndex.foreach { case (q, i) =>
      require(q.size == dim,
        s"mat_vec_dots: query $i has dim ${q.size}, expected $dim")
    }
    Bridge.column(MatVecDots(Bridge.expression(vec), queries.flatten.toArray, dim))
  }
}
