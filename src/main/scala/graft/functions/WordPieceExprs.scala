package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frozen WordPiece vocabulary, shipped into generated code as ONE
  * reference object (the [[BpeMergeTable]] posture): a hash set of
  * pieces — word-initial pieces stored plain, continuation pieces
  * stored WITH their `##` prefix, exactly as they serve — plus the max
  * code-point length per class so the greedy scan is bounded by the
  * longest real piece, not the word. */
final class WordPieceVocab(val pieces: Array[String]) extends Serializable {
  @transient lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(s.add)
    s
  }
  /** Longest word-initial piece, in code points. */
  @transient lazy val maxInitLen: Int = {
    var m = 0
    pieces.foreach { p =>
      if (!p.startsWith("##")) m = math.max(m, p.codePointCount(0, p.length))
    }
    m
  }
  /** Longest continuation piece PAYLOAD (after `##`), in code points. */
  @transient lazy val maxContLen: Int = {
    var m = 0
    pieces.foreach { p =>
      if (p.startsWith("##"))
        m = math.max(m, p.codePointCount(2, p.length))
    }
    m
  }
}

/** `wordpiece_segment_all(words)` — WordPiece inference (Wu et al.,
  * arXiv 1609.08144 §4.1; the BERT tokenizer family) over a document's
  * word array in ONE native expression: each word segments by GREEDY
  * LONGEST-MATCH-FIRST against a frozen vocabulary — the longest
  * vocabulary piece that prefixes the remaining suffix is taken, with
  * continuation pieces carrying the `##` prefix — and a word with an
  * unmatchable position emits the single `unk` piece (the whole word,
  * per the reference algorithm). All words' pieces flatten into one
  * ordered array; empty words are skipped; a null word element → null
  * (the [[BpeSegmentAll]] contract).
  *
  * Row-local with the vocabulary as a codegen reference object, so the
  * expression tree is O(1) in vocab size and serving is STREAMABLE —
  * the frozen-tokenizer posture shared with [[BpeSegmentAll]] and
  * UnigramSegmentAll. Cost per word is O(len · maxPieceLen) substring
  * probes against one hash set. Greedy is the spec, not a shortcut:
  * production WordPiece serves greedy longest-match even where a
  * shorter first piece would have avoided an UNK. */
case class WordPieceSegmentAll(child: Expression, vocab: Seq[String],
                               unk: String) extends UnaryExpression {

  require(vocab.nonEmpty, "wordpiece_segment_all: empty vocabulary")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wordpiece_segment_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_segment_all needs array<string> words, got ${other.sql}")
  }

  @transient private lazy val table = new WordPieceVocab(vocab.toArray)
  @transient private lazy val unkU = UTF8String.fromString(unk)

  override def nullSafeEval(input: Any): Any =
    WordPieceOps.segment(input.asInstanceOf[ArrayData], table, unkU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("wpVocab", table,
      classOf[WordPieceVocab].getName)
    val u = ctx.addReferenceObj("wpUnk", unkU, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("wpSegmented")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.WordPieceOps.segment($a, $tbl, $u);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceOps {
  /** Segment every word; null element in → null out. */
  def segment(words: ArrayData, table: WordPieceVocab,
              unk: UTF8String): ArrayData = {
    val nw = words.numElements()
    val out = new java.util.ArrayList[UTF8String](nw * 4)
    var wi = 0
    while (wi < nw) {
      if (words.isNullAt(wi)) return null
      val word = words.getUTF8String(wi).toString
      if (word.nonEmpty) segmentWord(word, table, unk, out)
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def segmentWord(word: String, table: WordPieceVocab,
                          unk: UTF8String,
                          out: java.util.ArrayList[UTF8String]): Unit = {
    val set = table.set
    val n = word.length
    val pieces = new java.util.ArrayList[UTF8String](4)
    var pos = 0 // char index; piece boundaries always land on code points
    while (pos < n) {
      val initial = pos == 0
      val maxCp = if (initial) table.maxInitLen else table.maxContLen
      // longest candidate end (char index) within maxCp code points
      var end = pos
      var cps = 0
      while (end < n && cps < maxCp) {
        end += Character.charCount(word.codePointAt(end))
        cps += 1
      }
      // shrink by whole code points until a vocab hit
      var hit: String = null
      while (hit == null && end > pos) {
        val cand =
          if (initial) word.substring(pos, end)
          else "##" + word.substring(pos, end)
        if (set.contains(cand)) hit = cand
        else end -= Character.charCount(word.codePointBefore(end))
      }
      if (hit == null) {
        // unmatchable position: the WHOLE word becomes one unk piece
        out.add(unk)
        return
      }
      pieces.add(UTF8String.fromString(hit))
      pos = end
    }
    var i = 0
    while (i < pieces.size) { out.add(pieces.get(i)); i += 1 }
  }
}

object WpF {
  /** WordPiece greedy segmentation of a word array with a frozen
    * vocabulary (see [[WordPieceSegmentAll]]). */
  def wordPieceSegmentAll(words: Column, vocab: Seq[String],
                          unk: String = "[UNK]"): Column =
    Bridge.column(WordPieceSegmentAll(Bridge.expression(words), vocab, unk))
}
