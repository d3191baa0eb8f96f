package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word n-gram shingles of a token array, as one native
  * expression: `array<string>` tokens → `array<long>` of
  * xxhash64("tok_i tok_i+1 … tok_i+n-1") with duplicates removed.
  *
  * This replaces a `transform(sequence(...), slice+concat_ws)` +
  * `array_distinct` chain: those are interpreted (CodegenFallback) and the
  * dedup DAGs evaluate the shingling several times (signature build,
  * candidate verify, per-doc counts), which dominated the near-dup bench.
  * The computation is per-row with no shuffle — the 100 TB-safe shape —
  * and the generated code calls one static helper, so it stays inside the
  * surrounding WholeStageCodegen stage.
  *
  * Fewer than `n` tokens → empty array (callers drop those docs, matching
  * the previous `filter(size > 0)` semantics).
  */
case class ShingleHash(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash needs array<string> and n >= 1, got ${other.sql}, n=$n")
  }

  override def nullSafeEval(tokens: Any): Any =
    if (distinct) ShingleHashOps.compute(tokens.asInstanceOf[ArrayData], n)
    else ShingleHashOps.computeAll(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashOps." +
        s"${if (distinct) "compute" else "computeAll"}($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashOps {
  private val Space = UTF8String.fromString(" ")

  /** Distinct xxhash64 values of all n-token shingles, first-seen order. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var k = 0
      while (k < n) { window(k) = tokens.getUTF8String(i + k); k += 1 }
      val g = UTF8String.concatWs(Space, window: _*)
      seen.add(XxHash64Function.hash(g, StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Every n-token shingle hash IN POSITION ORDER, duplicates kept —
    * the multiset the substring-duplication signal needs (a window
    * repeated inside one document must count every occurrence). */
  def computeAll(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var k = 0
      while (k < n) { window(k) = tokens.getUTF8String(i + k); k += 1 }
      val g = UTF8String.concatWs(Space, window: _*)
      out(i) = XxHash64Function.hash(g, StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object ShingleF {
  /** Column wrapper: distinct hashed n-gram shingles of a token array. */
  def shingleHashes(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHash(Bridge.expression(tokens), n))

  /** Column wrapper: ALL n-gram shingle hashes, position order,
    * duplicates kept. */
  def shingleHashesAll(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHash(Bridge.expression(tokens), n, distinct = false))
}
