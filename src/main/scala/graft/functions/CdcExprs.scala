package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_chunks(tokens)` — content-defined chunking of a token array
  * (the storage-dedup technique, token-granular): a boundary falls
  * AFTER position i (1-based, i ≥ k) whenever the rolling k-token gram
  * ending at i hashes to `0 mod d` — the same seeded
  * md5-hex-prefix value as [[graft.llm.Sampling.hashBucketStr]], so the
  * boundary rule replays in ANSI SQL for the oracle. Each chunk emits
  * `(fp, n_toks)` where `fp = md5(chunk text)`.
  *
  * Why CDC and not fixed windows: a fixed-window fingerprint family
  * (removeDupSpans / windowDupStats) breaks under INSERTION — a 3-word
  * prefix shifts every window, so a near-copy shares ~zero window
  * hashes. CDC boundaries depend only on local content, so chunks
  * re-align one boundary past any edit; prefix-shifted copies share all
  * chunks after the first cut (Muthitacharoen et al., LBFS SOSP'01 —
  * here over tokens, with the repo's one md5 hash family, no Rabin
  * fingerprints needed since the gram re-hashes whole each step).
  * Expected chunk length is d tokens; no max-length forced cut (that
  * would make the boundary stateful and the oracle non-SQL), so a
  * pathological run without boundary hits stays one chunk — at d = 8
  * the probability a 100-token doc never cuts is (7/8)^97 ≈ 2e-6.
  * Row-local: the corpus-scale cost is one projection, no shuffle. */
case class CdcChunks(child: Expression, k: Int, d: Int, seed: Long)
    extends UnaryExpression {

  require(k >= 1, s"cdc_chunks: k must be >= 1, got $k")
  require(d >= 1, s"cdc_chunks: d must be >= 1, got $d")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("fp", StringType, nullable = false),
      StructField("n_toks", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks needs array<string> tokens, got ${other.sql}")
  }

  @transient private lazy val chunker = new CdcChunker(k, d, seed)

  override def nullSafeEval(input: Any): Any =
    chunker.chunk(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("cdcChunker", chunker,
      classOf[CdcChunker].getName)
    // chunk() returns null on a null token element — mirror BpeSegmentAll:
    // propagate that as SQL NULL so codegen matches interpreted eval.
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("chunked")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $c.chunk($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The per-expression chunking state (one instance, codegen-referenced;
  * MessageDigest is per-thread). */
final class CdcChunker(val k: Int, val d: Int, val seed: Long)
    extends Serializable {
  private val seedSuffix = "|" + seed
  private val hexDigits = "0123456789abcdef".toCharArray

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def digest(s: String): Array[Byte] = {
    val m = md5.get(); m.reset()
    m.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** hashBucketStr's 60-bit value: first 15 hex chars of the digest. */
  private def h60(bytes: Array[Byte]): Long = {
    var v = 0L; var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xffL) >>> 4)
  }

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) & 0xf0) >>> 4)
      out(2 * i + 1) = hexDigits(bytes(i) & 0x0f)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  def chunk(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return null
      toks(i) = tokens.getUTF8String(i).toString
      i += 1
    }
    val out = new java.util.ArrayList[InternalRow](math.max(2 * n / math.max(d, 1), 4))
    val sb = new java.lang.StringBuilder
    var chunkStart = 0
    i = 0
    while (i < n) {
      // boundary AFTER token i (0-based here; the 1-based rule i+1 >= k)
      val isBoundary = i + 1 >= k && {
        sb.setLength(0)
        var j = i + 1 - k
        while (j <= i) {
          if (j > i + 1 - k) sb.append(' ')
          sb.append(toks(j)); j += 1
        }
        sb.append(seedSuffix)
        h60(digest(sb.toString)) % d == 0
      }
      if (isBoundary || i == n - 1) {
        sb.setLength(0)
        var j = chunkStart
        while (j <= i) {
          if (j > chunkStart) sb.append(' ')
          sb.append(toks(j)); j += 1
        }
        out.add(new GenericInternalRow(Array[Any](
          hex(digest(sb.toString)), i - chunkStart + 1)))
        chunkStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size)))
  }

  /** The 60-bit md5-prefix value of each chunk's text, in document
    * order — the long-typed chunk identity for bloom probes. Batch-side
    * equivalent of `conv(substring(fp, 1, 15), 16, 10)` over [[chunk]]'s
    * string fingerprints (same digest, same prefix bits). */
  def chunkHashes(tokens: ArrayData): ArrayData = {
    val full = chunk(tokens)
    if (full == null) return null
    val n = full.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val fpHex = full.getStruct(i, 2).getUTF8String(0).toString
      out(i) = java.lang.Long.parseLong(fpHex.substring(0, 15), 16)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Re-chunk and re-join, skipping chunks whose 0-based index is in
    * `drops`: `struct(clean_text, n_kept)`. Same boundary walk as
    * [[chunk]]. */
  def scrub(tokens: ArrayData, drops: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return null
      toks(i) = tokens.getUTF8String(i).toString
      i += 1
    }
    val dropSet = new java.util.HashSet[Long]()
    i = 0
    while (i < drops.numElements()) {
      if (!drops.isNullAt(i)) dropSet.add(drops.getLong(i))
      i += 1
    }
    val kept = new java.lang.StringBuilder
    var nKept = 0L
    val sb = new java.lang.StringBuilder
    var chunkStart = 0
    var chunkIdx = 0L
    i = 0
    while (i < n) {
      val isBoundary = i + 1 >= k && {
        sb.setLength(0)
        var j = i + 1 - k
        while (j <= i) {
          if (j > i + 1 - k) sb.append(' ')
          sb.append(toks(j)); j += 1
        }
        sb.append(seedSuffix)
        h60(digest(sb.toString)) % d == 0
      }
      if (isBoundary || i == n - 1) {
        if (!dropSet.contains(chunkIdx)) {
          var j = chunkStart
          while (j <= i) {
            if (kept.length() > 0) kept.append(' ')
            kept.append(toks(j)); j += 1
          }
          nKept += i - chunkStart + 1
        }
        chunkStart = i + 1
        chunkIdx += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(kept.toString), nKept))
  }
}

/** `cdc_scrub(tokens, dropIdx)` — re-chunk the token array with the
  * SAME boundary rule as [[CdcChunks]] and drop every chunk whose
  * 0-based index appears in `dropIdx`; returns
  * `struct(clean_text, n_kept)` (kept chunks re-joined in order, kept
  * token count). The rebuild stays ROW-LOCAL: the corpus-level shuffle
  * that decides WHICH chunks drop carries only (id, chunk_idx) pairs —
  * never chunk text — and this expression does the text surgery at the
  * scan. Null tokens array or null index list → null. */
case class CdcScrub(left: Expression, right: Expression, k: Int, d: Int,
                    seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(k >= 1, s"cdc_scrub: k must be >= 1, got $k")
  require(d >= 1, s"cdc_scrub: d must be >= 1, got $d")

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_scrub"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cdc_scrub needs (array<string>, array<bigint>), got (${l.sql}, ${r.sql})")
    }

  @transient private lazy val chunker = new CdcChunker(k, d, seed)

  override def nullSafeEval(toks: Any, drops: Any): Any =
    chunker.scrub(toks.asInstanceOf[ArrayData], drops.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("cdcChunker", chunker,
      classOf[CdcChunker].getName)
    // scrub() returns null on a null token element — propagate as SQL NULL.
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("scrubbed")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r = $c.scrub($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `cdc_chunk_hashes(tokens)` — the long-typed chunk identities (60-bit
  * md5-prefix of each chunk's text) as `array<bigint>`, for bloom-probe
  * filters; see [[CdcChunker.chunkHashes]]. */
case class CdcChunkHashes(child: Expression, k: Int, d: Int, seed: Long)
    extends UnaryExpression {

  require(k >= 1, s"cdc_chunk_hashes: k must be >= 1, got $k")
  require(d >= 1, s"cdc_chunk_hashes: d must be >= 1, got $d")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_chunk_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunk_hashes needs array<string> tokens, got ${other.sql}")
  }

  @transient private lazy val chunker = new CdcChunker(k, d, seed)

  override def nullSafeEval(input: Any): Any =
    chunker.chunkHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("cdcChunker", chunker,
      classOf[CdcChunker].getName)
    // chunkHashes() returns null on a null token element — propagate.
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("hashes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $c.chunkHashes($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcF {
  /** Content-defined chunks `(fp, n_toks)*` of a token array (see
    * [[CdcChunks]]). */
  def cdcChunks(tokens: Column, k: Int, d: Int, seed: Long): Column =
    Bridge.column(CdcChunks(Bridge.expression(tokens), k, d, seed))

  /** Long chunk identities for bloom probes (see [[CdcChunkHashes]]). */
  def cdcChunkHashes(tokens: Column, k: Int, d: Int, seed: Long): Column =
    Bridge.column(CdcChunkHashes(Bridge.expression(tokens), k, d, seed))

  /** Row-local duplicated-chunk removal (see [[CdcScrub]]). */
  def cdcScrub(tokens: Column, dropIdx: Column, k: Int, d: Int,
               seed: Long): Column =
    Bridge.column(CdcScrub(Bridge.expression(tokens),
      Bridge.expression(dropIdx), k, d, seed))
}
