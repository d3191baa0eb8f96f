package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** All random-hyperplane LSH sign bits of a vector in ONE expression:
  * returns `array<bigint>` of `numBands` band signatures, where bit r of
  * band b is `sign(v · plane[b·bitsPerBand + r])`.
  *
  * Why not compose `numBands × bitsPerBand` [[VectorDot]]s against array
  * literals (the previous formulation): at 16 bands × 8 bits × 64 dims
  * that is ~10,000 expression nodes — Catalyst optimization and codegen
  * of that tree dominated the whole bucketed-dedup query (the actual row
  * work is trivial). Here the plane matrix rides along as one flat
  * `double[]` reference object and the generated code is three nested
  * primitive loops; bit values are identical to the composed form (same
  * plane order, same ascending-index accumulation).
  */
case class HyperplaneBands(child: Expression, numBands: Int, bitsPerBand: Int,
                           planes: Array[Double], dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_bands"

  require(planes.length == numBands * bitsPerBand * dim,
    s"hyperplane_bands: ${planes.length} plane values != $numBands*$bitsPerBand*$dim")
  require(bitsPerBand <= 64, "hyperplane_bands: bitsPerBand > 64")

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                   ByteType | ShortType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands needs array<numeric>, got ${other.sql}")
  }

  private def read(ad: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => ad.getFloat(i).toDouble
    case DoubleType  => ad.getDouble(i)
    case IntegerType => ad.getInt(i).toDouble
    case LongType    => ad.getLong(i).toDouble
    case other       => throw new IllegalStateException(s"hyperplane_bands: $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val t = elemType
    // copy once: the band loops read every element numBands·bitsPerBand
    // times, and the ArrayData accessor + type dispatch per read would
    // dominate this hot path
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      x(j) = read(v, j, t); j += 1
    }
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var sig = 0L
      var r = 0
      while (r < bitsPerBand) {
        var s = 0.0
        val off = (b * bitsPerBand + r) * dim
        var i = 0
        while (i < dim) { s += planes(off + i) * x(i); i += 1 }
        if (s > 0) sig |= (1L << r)
        r += 1
      }
      out(b) = sig
      b += 1
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
    case other       => throw new IllegalStateException(s"hyperplane_bands: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("planes", planes, "double[]")
      val out = ctx.freshName("out")
      val sig = ctx.freshName("sig")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val x = ctx.freshName("x")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = accessor(elemType)
      // elements copied to a local double[] once — the band loops read
      // each one numBands·bitsPerBand times
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
         |    long[] $out = new long[$numBands];
         |    for (int $b = 0; $b < $numBands; $b++) {
         |      long $sig = 0L;
         |      for (int $r = 0; $r < $bitsPerBand; $r++) {
         |        double $s = 0.0;
         |        int $off = ($b * $bitsPerBand + $r) * $dim;
         |        for (int $i = 0; $i < $dim; $i++) {
         |          $s += $p[$off + $i] * $x[$i];
         |        }
         |        if ($s > 0) $sig |= (1L << $r);
         |      }
         |      $out[$b] = $sig;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneF {
  /** `array<bigint>` of per-band sign signatures for `vec`. `planes` is
    * indexed `planes(b*bitsPerBand + r)(j)` exactly like the composed
    * per-plane form it replaces. */
  def bands(vec: Column, numBands: Int, bitsPerBand: Int,
            planes: Seq[Seq[Double]]): Column = {
    val dim = planes.head.size
    Bridge.column(HyperplaneBands(Bridge.expression(vec), numBands, bitsPerBand,
      planes.flatten.toArray, dim))
  }
}
