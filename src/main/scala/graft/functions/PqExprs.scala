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
    case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                   ByteType | ShortType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<numeric>, got ${other.sql}")
  }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != m * subDim) return null
    val et = elemType
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
          val v = PqExprs.read(x, xi, et)
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
    val acc = PqExprs.accessor(elemType)
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

/** `nearest_centroid(vec)` — the index of the nearest of `k` centroids
  * (argmin ‖x−c‖², ties to the smaller index) as one native codegen'd
  * loop. Same rationale as [[PqEncode]]: the composed form (array_min
  * over k (dist, i) structs, each with its own dot product) allocates k
  * struct rows per input row; this is the IVF list-assignment hot path,
  * run over every vector of the corpus at index build and inside every
  * k-means-based operator. */
case class NearestCentroid(child: Expression, centroids: Array[Double],
                           cNorm2: Array[Double], k: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                   ByteType | ShortType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid needs array<numeric>, got ${other.sql}")
  }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    val et = elemType
    var best = Double.MaxValue; var bestK = 0; var ki = 0
    while (ki < k) {
      var s = 0.0; var j = 0
      while (j < dim) {
        if (x.isNullAt(j)) return null
        val v = PqExprs.read(x, j, et)
        s += v * centroids(ki * dim + j); j += 1
      }
      val d = -2.0 * s + cNorm2(ki)
      if (d < best) { best = d; bestK = ki }
      ki += 1
    }
    bestK
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    val nRef = ctx.addReferenceObj("cNorm2", cNorm2, "double[]")
    val acc = PqExprs.accessor(elemType)
    nullSafeCodeGen(ctx, ev, a => {
      val ki = ctx.freshName("ki"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestK = ctx.freshName("bestK")
      val bad = ctx.freshName("bad")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = Double.MAX_VALUE; int $bestK = 0;
         |  boolean $bad = false;
         |  for (int $ki = 0; $ki < $k && !$bad; $ki++) {
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      if ($a.isNullAt($j)) { $bad = true; break; }
         |      $s += ((double) $a.$acc($j)) * $cRef[$ki * $dim + $j];
         |    }
         |    double $d = -2.0 * $s + $nRef[$ki];
         |    if (!$bad && $d < $best) { $best = $d; $bestK = $ki; }
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $bestK; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pq_adc_dots(codes)` — ADC table-lookup sums for `g` groups in ONE
  * native loop: out[gi] = Σ_mi tables[(gi·m + mi)·k + code_mi], codes
  * decoded UNSIGNED (ids ≥ 128 store as negative bytes). The batched
  * ADC analogue of [[MatVecDots]]: one expression scores a PQ code row
  * against EVERY query of a micro-batch (tables = per-query ADC
  * tables), or against per-list reconstruction-norm tables (tables =
  * per-list codeword cross terms) — the flat table array ships once per
  * task via `addReferenceObj` (Q·m·k doubles ≈ 1 MB at a 256-query
  * chunk), never per row.
  *
  * Null on a code-length mismatch or an unsigned code ≥ k (a corrupted
  * index must not silently read a neighboring group's table). */
case class PqAdcDots(child: Expression, tables: Array[Double],
                     g: Int, m: Int, k: Int)
    extends UnaryExpression {

  require(tables.length == g * m * k,
    s"pq_adc_dots: tables length ${tables.length} != g*m*k ${g * m * k}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_dots"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dots needs array<tinyint> codes, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() != m) return null
    val out = new Array[Double](g)
    var mi = 0
    while (mi < m) {
      if (codes.isNullAt(mi)) return null
      val c = codes.getByte(mi) & 0xFF
      if (c >= k) return null
      var gi = 0
      while (gi < g) { out(gi) += tables((gi * m + mi) * k + c); gi += 1 }
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("adcTables", tables, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi"); val gi = ctx.freshName("gi")
      val c = ctx.freshName("c"); val bad = ctx.freshName("bad")
      s"""
         |if ($a.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$g];
         |  boolean $bad = false;
         |  for (int $mi = 0; $mi < $m && !$bad; $mi++) {
         |    if ($a.isNullAt($mi)) { $bad = true; break; }
         |    int $c = $a.getByte($mi) & 0xFF;
         |    if ($c >= $k) { $bad = true; break; }
         |    for (int $gi = 0; $gi < $g; $gi++) {
         |      $out[$gi] += $tRef[($gi * $m + $mi) * $k + $c];
         |    }
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else { ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |      .fromPrimitiveArray($out); }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[functions] object PqExprs {
  def read(ad: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => ad.getFloat(i).toDouble
    case DoubleType  => ad.getDouble(i)
    case IntegerType => ad.getInt(i).toDouble
    case LongType    => ad.getLong(i).toDouble
    case ByteType    => ad.getByte(i).toDouble
    case ShortType   => ad.getShort(i).toDouble
    case other       => throw new IllegalStateException(s"pq exprs: $other")
  }
  def accessor(t: DataType): String = t match {
    case FloatType   => "getFloat"
    case DoubleType  => "getDouble"
    case IntegerType => "getInt"
    case LongType    => "getLong"
    case ByteType    => "getByte"
    case ShortType   => "getShort"
    case other       => throw new IllegalStateException(s"pq exprs: $other")
  }
}

object PqF {
  /** Column form: nearest centroid index over a flat row-major centroid
    * array (centroid ki at `[ki·dim, (ki+1)·dim)`). */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column = {
    require(centroids.nonEmpty, "nearest_centroid: no centroids")
    val dim = centroids.head.length
    require(centroids.forall(_.length == dim),
      "nearest_centroid: ragged centroid dims")
    val flat = new Array[Double](centroids.length * dim)
    centroids.zipWithIndex.foreach { case (c, i) =>
      System.arraycopy(c, 0, flat, i * dim, dim)
    }
    val norms = centroids.map(c => c.map(x => x * x).sum)
    Bridge.column(NearestCentroid(Bridge.expression(vec), flat, norms,
      centroids.length, dim))
  }
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
  /** Column form: per-group ADC table-lookup sums over a flat row-major
    * table array (entry (gi, mi, ki) at `(gi·m + mi)·k + ki`) — returns
    * array<double> of length g. */
  def adcDots(codes: Column, tables: Array[Double], g: Int, m: Int,
              k: Int): Column =
    Bridge.column(PqAdcDots(Bridge.expression(codes), tables, g, m, k))
}
