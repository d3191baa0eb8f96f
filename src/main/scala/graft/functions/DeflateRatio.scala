package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_ratio(text)` — compressed/uncompressed size of the UTF-8
  * bytes under DEFLATE (level 6, raw stream), rounded to 6. The
  * compression-ratio quality signal of web-corpus curation (used by
  * Gopher/MassiveText-style rule stacks alongside repetition counts):
  * boilerplate, templated, and self-repeating documents compress far
  * below prose; high-entropy garbage compresses above it. Cheap (one
  * row-local pass, no shuffle), deterministic for a fixed zlib level —
  * java.util.zip.Deflater wraps the same zlib the reference stacks use.
  *
  * Empty text → ratio over the 2-byte empty DEFLATE stream (> 1); NULL
  * → NULL. Not SQL-expressible, so oracle rows for it are planted
  * contracts (repetitive ≪ prose < random) rather than value replays —
  * the exact values are spec-pinned instead. */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio needs a string input, got ${other.sql}")
  }

  override def nullSafeEval(s: Any): Any =
    DeflateRatioOps.ratio(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateRatioOps.ratio($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatioOps {
  // Deflater is stateful and allocation-heavy — one per thread, reset
  // per row. Level 6 = zlib default; nowrap (raw deflate) keeps the
  // 2-byte zlib header/4-byte adler out of the short-text numerator.
  // The instances are deliberately never end()ed: each holds a small
  // fixed native zlib buffer for the life of its executor thread
  // (bounded by pool size, ~256 KiB each) — cheaper than a native
  // alloc/free per row, and finalization reclaims it at thread death.
  @transient private lazy val deflater =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(6, true)
    }

  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](math.max(64, bytes.length / 2 + 32))
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    val raw = math.max(bytes.length, 1).toDouble
    java.math.BigDecimal.valueOf(compressed / raw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

object DeflateF {
  def deflateRatio(c: Column): Column =
    Bridge.column(DeflateRatio(Bridge.expression(c)))
}
