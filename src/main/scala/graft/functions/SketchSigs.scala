package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch signatures as per-row projections over the already-materialized
  * shingle/token arrays.
  *
  * The previous formulations exploded the array and aggregated 64 columns
  * per id — correct, but it pays a full corpus shuffle (one signature row
  * per document) for what is a row-local computation. At 100 TB that
  * shuffle is the dominant cost of signature building; these expressions
  * remove it entirely, leaving banding/chunking as the only shuffle in the
  * near-dup pipelines.
  */

/** MinHash signature: `array<bigint>` of `min((a_k·h + b_k) pmod p)` over
  * the hashed-shingle array, for each of the k fixed-seed affine hash
  * functions. Arithmetic wraps exactly like Spark's non-ANSI `pmod(h*a+b,
  * p)` on longs (Java wrap-around multiply), so the signatures are
  * bit-identical to the aggregated form they replace. */
case class MinHashSigs(child: Expression, as: Array[Long], bs: Array[Long],
                       prime: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  require(as.length == bs.length && as.nonEmpty)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs needs array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val k = as.length
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val x = (h * as(j) + bs(j)) % prime // Java wrap == Spark non-ANSI
        val v = if (x < 0) x + prime else x
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val aRef = ctx.addReferenceObj("as", as, "long[]")
      val bRef = ctx.addReferenceObj("bs", bs, "long[]")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $aRef.length;
         |  long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($hs.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $h = $hs.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $x = ($h * $aRef[$j] + $bRef[$j]) % ${prime}L;
         |      if ($x < 0) $x += ${prime}L;
         |      if ($x < $out[$j]) $out[$j] = $x;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per token, bit i of
  * `xxhash64(token)` (seed 42 — identical to SQL `xxhash64`) votes ±1;
  * signature bit i is set when the vote sum is positive. Bit-identical to
  * the explode + 64-`sum` aggregation it replaces. */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val h = XxHash64Function.hash(toks.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      // the mirror class's STATIC FORWARDER — `XxHash64Function.MODULE$`
      // does not exist on the mirror class and fails Janino compilation,
      // which would silently drop the whole stage to interpreted mode
      val hashFn = "org.apache.spark.sql.catalyst.expressions.XxHash64Function"
      s"""
         |int $n = $toks.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $votes = new int[64];
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($toks.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $h = $hashFn.hash($toks.getUTF8String($i),
         |      org.apache.spark.sql.types.DataTypes.StringType, 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    long $sig = 0L;
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ($votes[$b] > 0) $sig |= (1L << $b);
         |    }
         |    ${ev.value} = $sig;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchF {
  def minhashSigs(hs: Column, as: Seq[Long], bs: Seq[Long], prime: Long): Column =
    Bridge.column(MinHashSigs(Bridge.expression(hs), as.toArray, bs.toArray, prime))

  def simhashSig(tokens: Column): Column =
    Bridge.column(SimHashSig(Bridge.expression(tokens)))
}
