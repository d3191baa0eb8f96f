package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters as a real aggregate: a bounded `capacity`-
  * counter summary whose output provably contains EVERY item with true
  * frequency > N/(capacity+1), with per-item undercount ≤ N/(capacity+1)
  * (N = rows aggregated). The constant-memory answer to "which domains /
  * languages / templates dominate this corpus" when the key cardinality
  * is too large for an exact `groupBy` — the exact top-V path
  * ([[graft.llm.TextAnalysis.vocabulary]]) shuffles every distinct key;
  * this shuffles ≤ capacity counters per partition.
  *
  * Merge is the Agarwal et al. (Mergeable Summaries, PODS'12) rule:
  * union-sum the counters, and past capacity subtract the (capacity+1)-th
  * largest count from all and drop non-positives — the error bound
  * composes, so map-side partials combine correctly under any partition
  * order.
  *
  * DETERMINISM contract: counts are arrival-order-dependent in general
  * (any decrement depends on interleaving), BUT when the group's distinct
  * item count never exceeds `capacity` no decrement ever fires and the
  * result is EXACT and order-independent — that regime is what the
  * oracle row checks; the guarantee (not the exact counts) is what the
  * skew spec checks. Reported counts are lower bounds.
  *
  * Output: `array<struct<item string, cnt long>>`, (cnt DESC, item ASC).
  */
case class FreqItemsAgg(itemExpr: Expression, capacity: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSummary] {

  require(capacity > 0, "freq_items: capacity must be positive")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = itemExpr.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_items needs a string item, got ${other.sql}")
  }

  override def createAggregationBuffer(): FreqSummary = new FreqSummary(capacity)

  override def update(buf: FreqSummary, input: InternalRow): FreqSummary = {
    val v = itemExpr.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: FreqSummary, other: FreqSummary): FreqSummary =
    buf.mergeWith(other)

  override def eval(buf: FreqSummary): Any =
    new GenericArrayData(buf.sorted.map { case (item, cnt) =>
      InternalRow(UTF8String.fromString(item), cnt)
    }.toArray[Any])

  override def serialize(buf: FreqSummary): Array[Byte] = {
    val entries = buf.counts.toSeq
    val byteEntries = entries.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = java.nio.ByteBuffer.allocate(
      8 + byteEntries.map(e => 12 + e._1.length).sum)
    bb.putInt(capacity); bb.putInt(byteEntries.size)
    byteEntries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSummary = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val cap = bb.getInt; val n = bb.getInt
    val s = new FreqSummary(cap)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len); bb.get(arr)
      s.counts.put(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
}

/** Mutable Misra–Gries counter table, ≤ capacity entries. */
final class FreqSummary(val capacity: Int) {
  val counts = scala.collection.mutable.HashMap.empty[String, Long]

  def offer(item: String): Unit = counts.get(item) match {
    case Some(c) => counts.update(item, c + 1)
    case None if counts.size < capacity => counts.update(item, 1L)
    case None =>
      // classic MG decrement: every counter pays 1, zeros evict. O(cap)
      // here, amortized O(1) per arrival (each decrement is funded by a
      // prior increment).
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      counts.keysIterator.foreach { k =>
        val c = counts(k) - 1
        if (c == 0) dead += k else counts.update(k, c)
      }
      dead.foreach(counts.remove)
  }

  /** Agarwal et al. merge: union-sum, then subtract the (capacity+1)-th
    * largest count and drop non-positives. */
  def mergeWith(other: FreqSummary): FreqSummary = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > capacity) {
      val cs = counts.values.toArray
      java.util.Arrays.sort(cs)
      // (capacity+1)-th largest = index size-capacity-1 ascending
      val sub = cs(counts.size - capacity - 1)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      counts.keysIterator.foreach { k =>
        val c = counts(k) - sub
        if (c <= 0) dead += k else counts.update(k, c)
      }
      dead.foreach(counts.remove)
    }
    this
  }

  /** (cnt DESC, item ASC) — deterministic given the counter table. */
  def sorted: Seq[(String, Long)] =
    counts.toSeq.sortBy { case (item, cnt) => (-cnt, item) }
}

object FreqF {
  /** Aggregate column: Misra–Gries heavy-hitter summary of `item`. */
  def freqItems(item: Column, capacity: Int): Column =
    Bridge.column(FreqItemsAgg(Bridge.expression(item), capacity)
      .toAggregateExpression())
}
