package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bloom_scrub_lines(text)` — remove every line whose NORMALIZED form
  * probes TRUE against a broadcast bloom of a reference corpus's line
  * identities, and re-join the survivors: the row-local streaming
  * analogue of [[graft.llm.TextAnalysis.dedupLines]]'s corpus decision
  * (the C4 boilerplate scrub applied to a live ingest against a
  * RETAINED corpus). One native pass per row — split, normalize
  * (collapse/trim/lower, byte-identical to TextAnalysis.normText), the
  * 60-bit md5-prefix line identity (the `conv(substring(md5(nrm),1,15),
  * 16,10)` rendering the batch side builds the bloom with), probe,
  * re-join — no interpreted higher-order functions on the hot path.
  *
  * Conservative like every bloom ingest filter here: a boilerplate line
  * NEVER slips through (no false negatives); a false positive over-drops
  * a line at the configured rate — the offline exact operator restores
  * it. Whitespace-only lines are exempt (dedupLines parity). A null
  * broadcast value (empty reference) probes false → everything kept.
  *
  * Returns `struct(clean_text string, n_lines long, n_kept long)`. */
case class BloomScrubLines(child: Expression, sep: String,
                           bf: Broadcast[Array[Byte]])
    extends UnaryExpression {

  require(sep.nonEmpty, "bloom_scrub_lines: separator must be non-empty")

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_scrub_lines"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_scrub_lines needs a string input, got ${other.sql}")
  }

  @transient private lazy val scrubber = new LineScrubber(sep)

  override def nullSafeEval(input: Any): Any =
    scrubber.scrub(input.asInstanceOf[UTF8String], bf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("lineScrubber", scrubber,
      classOf[LineScrubber].getName)
    val b = ctx.addReferenceObj("bloomBcast", bf,
      classOf[Broadcast[Array[Byte]]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $s.scrub($c, $b);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The per-expression scrub state (sep + per-thread MessageDigest). */
final class LineScrubber(val sep: String) extends Serializable {
  @transient private lazy val splitter =
    java.util.regex.Pattern.compile(java.util.regex.Pattern.quote(sep))

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** The 60-bit md5-prefix identity of the normalized line — bit-equal
    * to `conv(substring(md5(nrm), 1, 15), 16, 10)` (the CdcChunker.h60
    * construction, one hash family repo-wide). */
  private def h60(nrm: String): Long = {
    val m = md5.get(); m.reset()
    val b = m.digest(nrm.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L; var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xffL) >>> 4)
  }

  /** TextAnalysis.normText, JVM-side: lower(trim(collapseWs(s))). */
  private def norm(line: String): String =
    CollapseWsOps.collapse(UTF8String.fromString(line))
      .trim().toLowerCase.toString

  def scrub(text: UTF8String, bf: Broadcast[Array[Byte]]): InternalRow = {
    // limit -1: keep trailing empty lines, matching Spark's split()
    val lines = splitter.split(text.toString, -1)
    val kept = new java.lang.StringBuilder
    var nKept = 0L
    var i = 0
    var first = true
    while (i < lines.length) {
      val nrm = norm(lines(i))
      val keep = nrm.isEmpty || !BloomProbeOps.mightContain(bf, h60(nrm))
      if (keep) {
        if (!first) kept.append(sep)
        kept.append(lines(i))
        nKept += 1
        first = false
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(kept.toString), lines.length.toLong, nKept))
  }
}

object LineScrubF {
  /** Row-local reference-bloom line scrub (see [[BloomScrubLines]]). */
  def bloomScrubLines(text: Column, sep: String,
                      bf: Broadcast[Array[Byte]]): Column =
    Bridge.column(BloomScrubLines(Bridge.expression(text), sep, bf))
}
