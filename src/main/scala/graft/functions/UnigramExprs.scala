package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The unigram-LM tokenizer lattice (Kudo, ACL'18 — the SentencePiece
  * model family): a frozen piece vocabulary with log-probabilities,
  * shared by three row-local native expressions —
  *
  *   - [[UnigramSegmentAll]]: Viterbi best segmentation of every word of
  *     a token array (inference / frozen-model serving),
  *   - [[UnigramScore]]: the best segmentation's total log-probability of
  *     ONE word (the value the full-enumeration SQL oracle replays),
  *   - [[UnigramExpected]]: forward-backward expected piece counts + the
  *     word's log-partition (one EM E-step contribution).
  *
  * All three carry the vocabulary as ONE codegen reference object (the
  * BpeSegmentAll posture: expression tree size independent of vocabulary
  * size) and are row-local projections — corpus scale never shuffles for
  * segmentation, and the E-step's only shuffle is the (pid, count)
  * aggregation over the vocabulary-sized word table.
  *
  * Positions are CODE POINTS (matching Spark's `length`/`substring` and
  * DuckDB's `len`/`substring`), so a piece can never split a surrogate
  * pair and the SQL oracles index identically. */
final class UnigramLattice(val pieces: Array[String], val logps: Array[Double],
                           val maxLen: Int) extends Serializable {
  require(pieces.length == logps.length,
    s"unigram lattice: ${pieces.length} pieces vs ${logps.length} logps")
  require(maxLen >= 1, s"unigram lattice: maxLen must be >= 1, got $maxLen")

  /** Unknown single code points segment as themselves at this floor —
    * the byte-fallback analogue that keeps segmentation TOTAL (and the
    * decode∘segment round-trip unconditional) on text whose alphabet the
    * training corpus never saw. [[score]] does NOT use the floor: the
    * enumeration oracle sees only in-vocabulary pieces. */
  val oovLogp: Double = -100.0

  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), i); i += 1 }
    m
  }

  private def cps(word: String): Array[Int] = word.codePoints().toArray

  /** Viterbi DP over one word's code points. Returns `bestLen(i)` = the
    * length (in code points) of the final piece of the best segmentation
    * of the prefix ending at i, or null if `useOovFloor = false` and some
    * prefix is unreachable. Exact ties resolve to the LONGEST final piece
    * (candidates scan long-to-short and replace only on strictly
    * greater) — implementation-defined; oracle rows compare scores only. */
  private def viterbi(cp: Array[Int], word: String, useOovFloor: Boolean,
                      best: Array[Double], bestLen: Array[Int]): Boolean = {
    val n = cp.length
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      bestLen(i) = 0
      var l = math.min(maxLen, i)
      while (l >= 1) {
        val from = i - l
        if (best(from) > Double.NegativeInfinity) {
          val piece = new String(cp, from, l)
          val id = index.get(piece)
          val lp =
            if (id != null) logps(id)
            else if (l == 1 && useOovFloor) oovLogp
            else Double.NaN
          if (!lp.isNaN) {
            val cand = best(from) + lp
            if (cand > best(i)) { best(i) = cand; bestLen(i) = l }
          }
        }
        l -= 1
      }
      // an unreachable position is NOT fatal — a longer piece may span it
      i += 1
    }
    best(n) > Double.NegativeInfinity
  }

  /** Best-segmentation total log-probability; NaN when some character is
    * out of vocabulary (no OOV floor here — see [[oovLogp]]). */
  def score(word: String): Double = {
    if (word.isEmpty) return 0.0
    val cp = cps(word)
    val best = new Array[Double](cp.length + 1)
    val bestLen = new Array[Int](cp.length + 1)
    if (!viterbi(cp, word, useOovFloor = false, best, bestLen)) Double.NaN
    else best(cp.length)
  }

  /** Append the best segmentation's pieces to `out`; with `marker` the
    * word-final piece is suffixed `</w>` (the Bpe.decodeCol rendering,
    * so the two tokenizer families share one decoder — byte-level mode
    * passes false: boundaries are implicit in the mapped alphabet).
    * Total: unknown single code points pass through at the OOV floor. */
  def segmentWord(word: String, out: java.util.ArrayList[UTF8String],
                  marker: Boolean = true): Unit = {
    if (word.isEmpty) return
    val cp = cps(word)
    val n = cp.length
    val best = new Array[Double](n + 1)
    val bestLen = new Array[Int](n + 1)
    viterbi(cp, word, useOovFloor = true, best, bestLen)
    // backtrack, then reverse in place
    val lens = new Array[Int](n)
    var k = 0
    var i = n
    while (i > 0) { lens(k) = bestLen(i); i -= bestLen(i); k += 1 }
    var from = 0
    var j = k - 1
    while (j >= 0) {
      val piece = new String(cp, from, lens(j))
      out.add(UTF8String.fromString(
        if (j == 0 && marker) piece + "</w>" else piece))
      from += lens(j)
      j -= 1
    }
  }

  /** Forward-backward expected piece counts of one word (ONE occurrence —
    * callers weight by word frequency), plus the log-partition. Appends
    * `c` per piece id into `acc`; returns logZ, or NaN when the word has
    * no in-vocabulary segmentation (no OOV floor — EM trains on the same
    * corpus the alphabet came from). Log-domain throughout, so long words
    * cannot underflow. */
  def expected(word: String,
               acc: java.util.HashMap[Integer, java.lang.Double]): Double = {
    if (word.isEmpty) return 0.0
    val cp = cps(word)
    val n = cp.length
    val NEG = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NEG) b else if (b == NEG) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    // arcs(i) = in-vocab pieces ending at position i (id, from)
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    java.util.Arrays.fill(alpha, NEG); java.util.Arrays.fill(beta, NEG)
    alpha(0) = 0.0; beta(n) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(maxLen, i)) {
        val id = index.get(new String(cp, i - l, l))
        if (id != null && alpha(i - l) != NEG)
          alpha(i) = lse(alpha(i), alpha(i - l) + logps(id))
        l += 1
      }
      i += 1
    }
    if (alpha(n) == NEG) return Double.NaN
    i = n - 1
    while (i >= 0) {
      var l = 1
      while (l <= math.min(maxLen, n - i)) {
        val id = index.get(new String(cp, i, l))
        if (id != null && beta(i + l) != NEG)
          beta(i) = lse(beta(i), logps(id) + beta(i + l))
        l += 1
      }
      i -= 1
    }
    val logZ = alpha(n)
    i = 0
    while (i < n) {
      var l = 1
      while (l <= math.min(maxLen, n - i)) {
        val id = index.get(new String(cp, i, l))
        if (id != null && alpha(i) != NEG && beta(i + l) != NEG) {
          val c = math.exp(alpha(i) + logps(id) + beta(i + l) - logZ)
          val prev = acc.get(id)
          acc.put(id, if (prev == null) c else prev + c)
        }
        l += 1
      }
      i += 1
    }
    logZ
  }
}

object UnigramOps {
  /** Segment every word of a token array; null element → null (the
    * BpeSegmentOps contract). `byteLevel` maps each word through the
    * GPT-2 byte alphabet first and emits no `</w>` marker (the
    * BpeSegmentAll byte posture — decodeByteCol recovers raw bytes). */
  def segmentAll(words: ArrayData, lat: UnigramLattice,
                 byteLevel: Boolean): ArrayData = {
    val nw = words.numElements()
    val out = new java.util.ArrayList[UTF8String](nw * 4)
    var wi = 0
    while (wi < nw) {
      if (words.isNullAt(wi)) return null
      val raw = words.getUTF8String(wi).toString
      if (byteLevel) lat.segmentWord(ByteCodec.map(raw), out, marker = false)
      else lat.segmentWord(raw, out)
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Expected counts of ONE word as array<struct<pid,c>>, with the
    * log-partition smuggled as the pid = -1 entry (one expression, one
    * pass — the caller splits likelihood from counts). Null when the
    * word has no in-vocabulary segmentation. */
  def expectedRow(word: UTF8String, lat: UnigramLattice): ArrayData = {
    val acc = new java.util.HashMap[Integer, java.lang.Double]()
    val logZ = lat.expected(word.toString, acc)
    if (logZ.isNaN) return null
    val it = acc.entrySet().iterator()
    val rows = new java.util.ArrayList[AnyRef](acc.size() + 1)
    rows.add(new GenericInternalRow(Array[Any](-1, logZ)))
    while (it.hasNext) {
      val e = it.next()
      rows.add(new GenericInternalRow(Array[Any](e.getKey.intValue(),
        e.getValue.doubleValue())))
    }
    new GenericArrayData(rows.toArray)
  }
}

/** `unigram_segment_all(tokens)` — Viterbi pieces of every word, in
  * order, word-final piece `</w>`-suffixed. Row-local → streamable
  * frozen-model serving, the BpeSegmentAll posture. */
case class UnigramSegmentAll(child: Expression, pieces: Seq[String],
                             logps: Seq[Double], maxLen: Int,
                             byteLevel: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_segment_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment_all needs array<string> words, got ${other.sql}")
  }

  @transient private lazy val lat =
    new UnigramLattice(pieces.toArray, logps.toArray, maxLen)

  override def nullSafeEval(input: Any): Any =
    UnigramOps.segmentAll(input.asInstanceOf[ArrayData], lat, byteLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("unigramLattice", lat,
      classOf[UnigramLattice].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("segmented")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.UnigramOps.segmentAll($a, $l, $byteLevel);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `unigram_score(word)` — the best segmentation's total log-probability
  * (NULL when a character is out of vocabulary; no OOV floor, matching
  * the enumeration oracle). */
case class UnigramScore(child: Expression, pieces: Seq[String],
                        logps: Seq[Double], maxLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_score needs a string word, got ${other.sql}")
  }

  @transient private lazy val lat =
    new UnigramLattice(pieces.toArray, logps.toArray, maxLen)

  override def nullSafeEval(input: Any): Any = {
    val s = lat.score(input.asInstanceOf[UTF8String].toString)
    if (s.isNaN) null else java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("unigramLattice", lat,
      classOf[UnigramLattice].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("score")
      s"""
         |double $r = $l.score($a.toString());
         |if (Double.isNaN($r)) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `unigram_expected(word)` — forward-backward expected piece counts of
  * ONE occurrence as `array<struct<pid int, c double>>`; the pid = -1
  * entry carries the word's log-partition (per-occurrence likelihood).
  * NULL when the word has no in-vocabulary segmentation. */
case class UnigramExpected(child: Expression, pieces: Seq[String],
                           logps: Seq[Double], maxLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pid", IntegerType, nullable = false),
      StructField("c", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_expected"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_expected needs a string word, got ${other.sql}")
  }

  @transient private lazy val lat =
    new UnigramLattice(pieces.toArray, logps.toArray, maxLen)

  override def nullSafeEval(input: Any): Any =
    UnigramOps.expectedRow(input.asInstanceOf[UTF8String], lat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("unigramLattice", lat,
      classOf[UnigramLattice].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("expected")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.UnigramOps.expectedRow($a, $l);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramF {
  def segmentAll(tokens: Column, pieces: Seq[String], logps: Seq[Double],
                 maxLen: Int, byteLevel: Boolean = false): Column =
    Bridge.column(UnigramSegmentAll(Bridge.expression(tokens), pieces, logps,
      maxLen, byteLevel))

  def score(word: Column, pieces: Seq[String], logps: Seq[Double],
            maxLen: Int): Column =
    Bridge.column(UnigramScore(Bridge.expression(word), pieces, logps, maxLen))

  def expected(word: Column, pieces: Seq[String], logps: Seq[Double],
               maxLen: Int): Column =
    Bridge.column(UnigramExpected(Bridge.expression(word), pieces, logps,
      maxLen))
}
