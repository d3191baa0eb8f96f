package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** `pq_encode(vec)` — per-subspace nearest-codeword ids as one native
  * Catalyst expression with whole-stage codegen.
  *
  * Why not compose it from `slice` + [[VectorDot]] + `array_min` over
  * (dist, k) structs: that plan materializes m·k struct rows and an
  * m·k-element array PER INPUT ROW just to take a min — at the default
  * m=8, k=64 that is 512 `InternalRow` allocations per vector, and the
  * 512-node expression tree bloats the generated method past what JIT
  * inlines. This expression runs the whole m×k×subDim argmin as one
  * tight primitive loop over a flat codebook array (referenced from the
  * generated code via `addReferenceObj` — shipped once per task binary,
  * m·k·subDim doubles ≈ 32 KB at defaults, not a per-row cost).
  *
  * Semantics are identical to the composed form: argmin over
  * `-2·x·c + ||c||²` (equivalent to argmin ‖x−c‖², query norm constant),
  * ties break to the SMALLER codeword id, codes store as signed bytes
  * (ids ≥ 128 wrap; [[graft.llm.Pq.pqTopK]] decodes unsigned). A null
  * element or a dimension mismatch yields null, as [[VectorDot]] does. */
case class PqEncode(child: Expression, codebook: Array[Double],
                    cwNorm2: Array[Double], m: Int, k: Int, subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double>, got ${other.sql}")
  }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != m * subDim) return null
    val isFloat = elemType == FloatType
    val codes = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      var best = Double.MaxValue; var bestK = 0; var ki = 0
      while (ki < k) {
        var s = 0.0; var j = 0
        val base = (mi * k + ki) * subDim
        while (j < subDim) {
          val xi = mi * subDim + j
          if (x.isNullAt(xi)) return null
          val v = if (isFloat) x.getFloat(xi).toDouble else x.getDouble(xi)
          s += v * codebook(base + j); j += 1
        }
        val d = -2.0 * s + cwNorm2(mi * k + ki)
        if (d < best) { best = d; bestK = ki }
        ki += 1
      }
      codes(mi) = bestK.toByte
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    val nmRef = ctx.addReferenceObj("pqCwNorm2", cwNorm2, "double[]")
    val acc = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi"); val ki = ctx.freshName("ki")
      val j = ctx.freshName("j"); val s = ctx.freshName("s")
      val best = ctx.freshName("best"); val bestK = ctx.freshName("bestK")
      val base = ctx.freshName("base"); val xi = ctx.freshName("xi")
      val bad = ctx.freshName("bad"); val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $codes = new byte[$m];
         |  boolean $bad = false;
         |  for (int $mi = 0; $mi < $m && !$bad; $mi++) {
         |    double $best = Double.MAX_VALUE; int $bestK = 0;
         |    for (int $ki = 0; $ki < $k && !$bad; $ki++) {
         |      double $s = 0.0;
         |      int $base = ($mi * $k + $ki) * $subDim;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        int $xi = $mi * $subDim + $j;
         |        if ($a.isNullAt($xi)) { $bad = true; break; }
         |        $s += ((double) $a.$acc($xi)) * $cbRef[$base + $j];
         |      }
         |      double $d = -2.0 * $s + $nmRef[$mi * $k + $ki];
         |      if (!$bad && $d < $best) { $best = $d; $bestK = $ki; }
         |    }
         |    $codes[$mi] = (byte) $bestK;
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else { ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |      .fromPrimitiveArray($codes); }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqF {
  /** Column form over a flat row-major codebook: entry (mi, ki, j) at
    * `(mi·k + ki)·subDim + j`. */
  def pqEncode(vec: Column, codebook: Array[Double], m: Int, k: Int,
               subDim: Int): Column = {
    require(codebook.length == m * k * subDim,
      s"pq_encode: codebook length ${codebook.length} != m*k*subDim ${m * k * subDim}")
    val norms = Array.tabulate(m * k) { i =>
      var s = 0.0; var j = 0
      while (j < subDim) { val v = codebook(i * subDim + j); s += v * v; j += 1 }
      s
    }
    Bridge.column(PqEncode(Bridge.expression(vec), codebook, norms, m, k, subDim))
  }
}
