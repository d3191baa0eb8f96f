package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `dsir_score(tokens)` — the per-row DSIR log-importance sum in ONE
  * native expression: unigrams then adjacent-bigram grams of the token
  * array each hash to a bucket (the exact
  * [[graft.llm.Sampling.hashBucketStr]] formula — first 15 hex chars of
  * `md5(gram || "|" || seed)` as a 60-bit integer, mod `buckets`) and
  * the frozen ≤`buckets`-double log-ratio table, shipped as a codegen
  * reference object, accumulates in gram order; the result rounds to 6
  * like the batch scorer.
  *
  * Replaces the r12 `aggregate(concat(toks, zip_with(...)), ...)`
  * composition on the STREAMING filter's hot per-row path: Spark's
  * higher-order functions are CodegenFallback (one boxed lambda call
  * per gram) and the zip_with also materialized the bigram array; here
  * the whole score is a single generated-code method call with no
  * intermediate arrays. Same fold order, same hash, same rounding —
  * parity with the column composition is spec-pinned. */
case class DsirScore(child: Expression, lr: Seq[Double], seed: Long,
                     buckets: Int) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dsir_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_score needs array<string> tokens, got ${other.sql}")
  }

  @transient private lazy val table =
    new DsirScoreTable(lr.toArray, seed, buckets)

  override def nullSafeEval(input: Any): Any =
    table.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("dsirScoreTable", table,
      classOf[DsirScoreTable].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $tbl.score($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The frozen scoring state: dense per-bucket log-ratios + the seeded
  * md5 bucket hash. One instance per expression, referenced from
  * generated code; MessageDigest is per-thread (not thread-safe). */
final class DsirScoreTable(val lr: Array[Double], val seed: Long,
                           val buckets: Int) extends Serializable {
  require(buckets > 0 && lr.length == buckets,
    s"dsir_score: log-ratio table has ${lr.length} entries for $buckets buckets")
  private val seedSuffix = "|" + seed

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** hashBucketStr: first 15 hex chars of md5(gram || "|seed") — the
    * top 60 bits of the digest — mod buckets. */
  private def bucket(gram: String): Int = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest((gram + seedSuffix)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v = (v << 4) | ((bytes(7) & 0xffL) >>> 4)
    (v % buckets).toInt
  }

  def score(tokens: ArrayData): Double = {
    val n = tokens.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) { // unigrams first — the batch composition's gram order
      sum += lr(bucket(tokens.getUTF8String(i).toString)); i += 1
    }
    i = 0
    while (i < n - 1) {
      sum += lr(bucket(tokens.getUTF8String(i).toString + " " +
        tokens.getUTF8String(i + 1).toString))
      i += 1
    }
    java.math.BigDecimal.valueOf(sum)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

object DsirF {
  /** Native row-local DSIR score of a token array against a dense
    * per-bucket log-ratio table (see [[DsirScore]]). */
  def dsirScore(tokens: Column, lr: Array[Double], seed: Long,
                buckets: Int): Column =
    Bridge.column(DsirScore(Bridge.expression(tokens),
      lr.toIndexedSeq, seed, buckets))
}
