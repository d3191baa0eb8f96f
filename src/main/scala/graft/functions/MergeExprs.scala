package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `merge_adjacent(syms)` — one left-to-right pass over a symbol array
  * replacing every non-overlapping adjacent (left, right) occurrence
  * with the concatenated symbol: the BPE merge application (Sennrich et
  * al., ACL'16 — leftmost-first greedy, so "a a a" under merge (a,a)
  * becomes ["aa", "a"], never ["a", "aa"]).
  *
  * A native expression because the merge loop is inherently stateful
  * (the cursor advances by 2 on a match) — no composition of built-in
  * array functions expresses it, and a UDF would break codegen. Runs
  * over the word-frequency table during training (vocabulary-sized) and
  * over exploded words at segmentation time. */
case class MergeAdjacent(child: Expression, left: String, right: String,
                         mergedAs: Option[String] = None)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "merge_adjacent"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"merge_adjacent needs array<string>, got ${other.sql}")
  }

  @transient private lazy val leftU = UTF8String.fromString(left)
  @transient private lazy val rightU = UTF8String.fromString(right)
  // WordPiece merges replace (l, ##r) with l+r — the continuation
  // prefix belongs to the POSITION, not the symbol — so the merged
  // symbol is overridable; BPE's default stays plain concatenation.
  @transient private lazy val mergedU =
    UTF8String.fromString(mergedAs.getOrElse(left + right))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && !arr.isNullAt(i) && !arr.isNullAt(i + 1) &&
          arr.getUTF8String(i) == leftU && arr.getUTF8String(i + 1) == rightU) {
        out.add(mergedU); i += 2
      } else {
        if (arr.isNullAt(i)) return null
        out.add(arr.getUTF8String(i)); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("mergeLeft", leftU,
      classOf[UTF8String].getName)
    val rRef = ctx.addReferenceObj("mergeRight", rightU,
      classOf[UTF8String].getName)
    val mRef = ctx.addReferenceObj("mergeJoined", mergedU,
      classOf[UTF8String].getName)
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |java.util.ArrayList<$utf8> $out = new java.util.ArrayList<$utf8>($n);
         |boolean $bad = false;
         |int $i = 0;
         |while ($i < $n && !$bad) {
         |  if ($i < $n - 1 && !$a.isNullAt($i) && !$a.isNullAt($i + 1) &&
         |      $a.getUTF8String($i).equals($lRef) &&
         |      $a.getUTF8String($i + 1).equals($rRef)) {
         |    $out.add($mRef); $i += 2;
         |  } else if ($a.isNullAt($i)) {
         |    $bad = true;
         |  } else {
         |    $out.add($a.getUTF8String($i)); $i += 1;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    $out.toArray()); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Frozen BPE merge table, shipped into generated code as ONE reference
  * object (`addReferenceObj`) instead of one nested expression per merge.
  * `ranksFor` maps a symbol pair to its SORTED rank list — normally one
  * rank, but a pair can legitimately recur in a learned table (a later
  * merge can re-create a symbol pair an earlier pass consumed, e.g.
  * (ab,c) at rank 3, (a,b) at rank 5, (ab,c) again at rank 9), and
  * replay must honor every occurrence in order. */
final class BpeMergeTable(val left: Array[String], val right: Array[String])
    extends Serializable {
  require(left.length == right.length)
  def numMerges: Int = left.length
  @transient lazy val joined: Array[String] =
    Array.tabulate(left.length)(i => left(i) + right(i))
  @transient private lazy val ranks
      : java.util.HashMap[String, java.util.HashMap[String, Array[Int]]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Array[Int]]]()
    var i = 0
    while (i < left.length) {
      val inner = m.computeIfAbsent(left(i),
        _ => new java.util.HashMap[String, Array[Int]]())
      val prev = inner.get(right(i))
      inner.put(right(i),
        if (prev == null) Array(i) else prev :+ i) // ascending by construction
      i += 1
    }
    m
  }
  /** Smallest rank >= k at which (l, r) merges, or -1. */
  def nextRank(l: String, r: String, k: Int): Int = {
    val inner = ranks.get(l)
    if (inner == null) return -1
    val rs = inner.get(r)
    if (rs == null) return -1
    var i = 0
    while (i < rs.length) { if (rs(i) >= k) return rs(i); i += 1 }
    -1
  }
}

/** `bpe_segment_all(words)` — full BPE inference over a document's word
  * array in ONE native expression: each word re-splits to code-point
  * symbols with `</w>` fused onto the last, the learned merge table
  * replays IN RANK ORDER (each rank one leftmost-first greedy
  * [[MergeAdjacent]] pass), and all words' pieces flatten into one
  * ordered array. Semantically identical to folding a MergeAdjacent
  * chain inside a `transform` (the r12 shape), but the expression tree
  * is O(1) in merge count — a 32 k-merge production tokenizer neither
  * blows the 64 KB codegen method limit nor the analyzer's recursion
  * depth — and the replay skips straight from one APPLICABLE rank to
  * the next (pair-presence lookup), so a word of n symbols costs
  * O(n² + n·lookup) regardless of table size instead of O(n·merges).
  * Empty words are skipped (the old `filter(length > 0)` fold-in).
  *
  * `byteLevel = true` switches to the GPT-2-family alphabet: each
  * word's initial symbols are its UTF-8 bytes mapped through
  * [[ByteCodec]] (256 base symbols) and NO `</w>` marker is fused —
  * byte-level boundaries are implicit in the pre-tokenization cover,
  * so decode is plain concatenate-and-unmap and is lossless on ANY
  * input. The replay machinery is identical. */
case class BpeSegmentAll(child: Expression, leftSyms: Seq[String],
                         rightSyms: Seq[String],
                         byteLevel: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_segment_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_segment_all needs array<string> words, got ${other.sql}")
  }

  @transient private lazy val table =
    new BpeMergeTable(leftSyms.toArray, rightSyms.toArray)

  override def nullSafeEval(input: Any): Any =
    BpeSegmentOps.segment(input.asInstanceOf[ArrayData], table, byteLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeMergeTable", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("segmented")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.BpeSegmentOps.segment($a, $tbl, $byteLevel);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegmentOps {
  /** Segment every word; null in → null out (matching the old
    * flatten-over-transform null contract). */
  def segment(words: ArrayData, table: BpeMergeTable,
              byteLevel: Boolean): ArrayData = {
    val nw = words.numElements()
    val out = new java.util.ArrayList[UTF8String](nw * 4)
    var wi = 0
    while (wi < nw) {
      if (words.isNullAt(wi)) return null
      val word = words.getUTF8String(wi).toString
      if (word.nonEmpty) segmentWord(word, table, byteLevel, out)
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def segmentWord(word: String, table: BpeMergeTable,
                          byteLevel: Boolean,
                          out: java.util.ArrayList[UTF8String]): Unit = {
    var syms = new java.util.ArrayList[String](word.length + 1)
    if (byteLevel) {
      // UTF-8 bytes mapped through the GPT-2 table; boundaries are
      // implicit — no end-of-word marker
      val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < bytes.length) {
        syms.add(ByteCodec.byteToStr(bytes(i) & 0xff))
        i += 1
      }
    } else {
      // code-point symbols, `</w>` fused onto the final one (Spark's
      // split(word, '') semantics: per code point, no trailing empty)
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val w = Character.charCount(cp)
        syms.add(word.substring(i, i + w))
        i += w
      }
      val last = syms.size - 1
      syms.set(last, syms.get(last) + "</w>")
    }
    // replay: jump to the smallest APPLICABLE rank >= cursor, run that
    // rank's leftmost-first pass, advance the cursor past it
    var k = 0
    while (syms.size >= 2 && k < table.numMerges) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val r = table.nextRank(syms.get(j), syms.get(j + 1), k)
        if (r >= 0 && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) k = table.numMerges
      else {
        val l = table.left(best); val rr = table.right(best)
        val m = table.joined(best)
        val next = new java.util.ArrayList[String](syms.size)
        var p = 0
        while (p < syms.size) {
          if (p < syms.size - 1 && syms.get(p) == l && syms.get(p + 1) == rr) {
            next.add(m); p += 2
          } else { next.add(syms.get(p)); p += 1 }
        }
        syms = next
        k = best + 1
      }
    }
    var o = 0
    while (o < syms.size) { out.add(UTF8String.fromString(syms.get(o))); o += 1 }
  }
}

object MergeF {
  def mergeAdjacent(syms: Column, left: String, right: String): Column =
    Bridge.column(MergeAdjacent(Bridge.expression(syms), left, right))

  /** [[mergeAdjacent]] with an explicit merged symbol — the WordPiece
    * training pass, where merging (l, ##r) yields l+r. */
  def mergeAdjacentAs(syms: Column, left: String, right: String,
                      merged: String): Column =
    Bridge.column(MergeAdjacent(Bridge.expression(syms), left, right,
      Some(merged)))

  /** Full-table BPE segmentation of a word array (see [[BpeSegmentAll]]). */
  def bpeSegmentAll(words: Column, merges: Seq[(String, String)],
                    byteLevel: Boolean = false): Column =
    Bridge.column(BpeSegmentAll(Bridge.expression(words),
      merges.map(_._1), merges.map(_._2), byteLevel))
}
