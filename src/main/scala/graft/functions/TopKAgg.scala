package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as a real aggregate: keeps the best `k` (score, id)
  * pairs by (score DESC, id ASC) in a fixed-size binary min-heap.
  *
  * This is the grouped-top-k shape that scales: map-side partial
  * aggregation holds at most k pairs per group per partition and the
  * shuffle carries only those — versus a window `row_number() <= k`,
  * which shuffles and SORTS every row of every group (N·Q rows for a
  * Q-query ANN batch over an N-row corpus). Total order (score desc,
  * id asc) makes ties deterministic, so results are comparable to a SQL
  * `QUALIFY row_number() OVER (ORDER BY score DESC, id ASC) <= k`.
  *
  * Output: `array<struct<score double, id bigint>>`, best first.
  */
case class TopKByScore(scoreExpr: Expression, idExpr: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, "topk_by_score: k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score needs (double, bigint), got (${s.sql}, ${i.sql})")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    // null score/id rows simply don't compete (mirrors SQL aggregates
    // ignoring nulls)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) {
      buf.offer(other.scores(i), other.ids(i)); i += 1
    }
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(s, id)
    }.toArray[Any])
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = new TopKHeap(k)
    var i = 0
    while (i < n) { heap.offer(bb.getDouble, bb.getLong); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

/** Fixed-capacity binary min-heap ordered by (score ASC, id DESC) — the
  * root is the WORST retained pair, so `offer` is O(log k) and the heap
  * never exceeds k entries. */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // a is worse than b under (score DESC, id ASC) ranking. Double.compare
  // gives a TOTAL order with NaN above every value — matching Spark's
  // nanSafeCompareDoubles / descending-sort semantics, where a naive
  // `<`/`==` pair is incoherent on NaN (never worse, never better: a NaN
  // entry could lodge in the heap forever and block real candidates).
  // `+ 0.0` canonicalizes -0.0 to 0.0 for the COMPARISON only (Spark
  // treats them equal; Double.compare does not) — stored scores stay raw.
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa + 0.0, sb + 0.0)
    c < 0 || (c == 0 && ia > ib)
  }

  def offer(s: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      // sift up
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  /** Retained pairs, best (score desc, id asc) first — same total order
    * as [[worse]], so NaN ranks first like a descending Spark sort. */
  def sortedDesc: Seq[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i)))
      .sortWith { case ((sa, ia), (sb, ib)) => worse(sb, ib, sa, ia) }
}

object TopKF {
  /** Aggregate column: best-k (score, id) pairs per group, best first. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())
}
