package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable quantile sketch (the Manku–Rajagopalan–Lindsay SIGMOD'98
  * multi-level buffer family, with the KLL/Agarwal-et-al PODS'12
  * mergeable-summaries compaction rule): a bounded set of level
  * buffers where an item at level `l` stands for `2^l` original rows.
  * When a buffer fills to `k`, it sorts and promotes alternate items
  * to the next level — total weight is preserved exactly, so the
  * sketch always knows the TRUE row count, and rank queries answer
  * within O(levels/k) of the true rank.
  *
  * This is the quantile member of the repo's pre-aggregated sketch-
  * table pattern ([[graft.util.Sketches]]): build one sketch per
  * fine-grained group in a single pass over 100 TB, persist the
  * (group, sketch) table, and answer any later rollup (per-source →
  * per-language → global percentiles) by MERGING sketches — no
  * re-scan of the corpus, the property exact percentiles can never
  * have. Spark's own `percentile_approx` answers one query in one
  * pass but its sketch is not a first-class mergeable column.
  *
  * DETERMINISM contract (the [[FreqItemsAgg]] posture): while a
  * group's row count stays under `k` no compaction fires and the
  * sketch IS the sorted data — quantiles are exactly the
  * `ceil(q·n)`-th order statistic, order-independent, which is the
  * regime the value-oracle row checks. Past `k`, the alternate-item
  * coin is a deterministic per-sketch compaction counter (replayable
  * given one arrival order, error-bounded under any), checked by the
  * bounded-rank-error contract row. Nulls and NaNs are skipped. */
final class QSketch(val k: Int) extends Serializable {
  require(k >= 8, s"quantile sketch: k must be >= 8, got $k")

  val levels = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.ArrayBuffer.empty[Double])
  var compactions: Long = 0L

  def n: Long = {
    var total = 0L
    var l = 0
    while (l < levels.length) { total += levels(l).length.toLong << l; l += 1 }
    total
  }

  def update(x: Double): Unit = {
    if (!java.lang.Double.isNaN(x)) {
      levels(0) += x
      if (levels(0).length >= k) compact(0)
    }
  }

  /** Sort level `l`, keep alternate items of the even prefix one level
    * up (a possible odd item stays put — weight is preserved exactly),
    * cascade if the next level fills. */
  private def compact(l: Int): Unit = {
    val buf = levels(l)
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val pairs = arr.length / 2
    val offset = (compactions & 1L).toInt
    compactions += 1
    if (levels.length == l + 1)
      levels += scala.collection.mutable.ArrayBuffer.empty[Double]
    val up = levels(l + 1)
    var i = 0
    while (i < pairs) { up += arr(2 * i + offset); i += 1 }
    buf.clear()
    if (arr.length % 2 == 1) buf += arr(arr.length - 1)
    if (up.length >= k) compact(l + 1)
  }

  def mergeWith(other: QSketch): QSketch = {
    require(other.k == k,
      s"quantile sketch merge: k mismatch ($k vs ${other.k})")
    var l = 0
    while (l < other.levels.length) {
      while (levels.length <= l)
        levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      levels(l) ++= other.levels(l)
      l += 1
    }
    compactions += other.compactions
    l = 0
    while (l < levels.length) {
      while (levels(l).length >= k) compact(l)
      l += 1
    }
    this
  }

  /** The `ceil(q·n)`-th order statistic under the sketch's weights
    * (percentile-disc "lower" semantics: the smallest value whose
    * cumulative weight reaches the target rank); NaN on an empty
    * sketch. Exact while no compaction has fired. */
  def quantile(q: Double): Double = {
    val total = n
    if (total == 0L) return Double.NaN
    val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach(v => items += ((v, w)))
      l += 1
    }
    val sorted = items.sortBy(_._1)
    val target = math.max(1L, math.ceil(q * total).toLong).min(total)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  def serialized: Array[Byte] = {
    var bytes = 4 + 8 + 4
    levels.foreach(b => bytes += 4 + 8 * b.length)
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(k); bb.putLong(compactions); bb.putInt(levels.length)
    levels.foreach { b =>
      bb.putInt(b.length)
      b.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object QSketchOps {
  def deserialize(bytes: Array[Byte]): QSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new QSketch(bb.getInt)
    s.compactions = bb.getLong
    val nl = bb.getInt
    s.levels.clear()
    var l = 0
    while (l < nl) {
      val size = bb.getInt
      val buf = new scala.collection.mutable.ArrayBuffer[Double](size)
      var i = 0
      while (i < size) { buf += bb.getDouble; i += 1 }
      s.levels += buf
      l += 1
    }
    if (s.levels.isEmpty)
      s.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
    s
  }

  /** Scalar helpers the quantile/count expressions call (shared by
    * interpreted eval and generated code). */
  def quantile(bytes: Array[Byte], q: Double): java.lang.Double = {
    val v = deserialize(bytes).quantile(q)
    if (java.lang.Double.isNaN(v)) null else java.lang.Double.valueOf(v)
  }
  def count(bytes: Array[Byte]): Long = deserialize(bytes).n

  /** ONE deserialize + ONE sort answering the count and a whole list of
    * quantiles — the serving projection (n, p25, p50, p90, …) without
    * re-decoding the sketch per output column. Returns null on an empty
    * sketch (no quantiles to answer). */
  def stats(bytes: Array[Byte], qs: Array[Double]): InternalRow = {
    val sk = deserialize(bytes)
    val total = sk.n
    if (total == 0L) return null
    val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < sk.levels.length) {
      val w = 1L << l
      sk.levels(l).foreach(v => items += ((v, w)))
      l += 1
    }
    val sorted = items.sortBy(_._1)
    val out = new Array[Double](qs.length)
    var qi = 0
    while (qi < qs.length) {
      val target = math.max(1L, math.ceil(qs(qi) * total).toLong).min(total)
      var cum = 0L
      var i = 0
      var hit = sorted.last._1
      var done = false
      while (i < sorted.length && !done) {
        cum += sorted(i)._2
        if (cum >= target) { hit = sorted(i)._1; done = true }
        i += 1
      }
      out(qi) = hit
      qi += 1
    }
    InternalRow(total, new GenericArrayData(out))
  }
}

/** `quantile_sketch_agg(x, k)` — build a mergeable quantile sketch of a
  * double column; output is the serialized sketch (binary), the
  * [[graft.util.Sketches]] table value. */
case class QuantileSketchAgg(child: Expression, k: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QSketch] {

  require(k >= 8, s"quantile_sketch_agg: k must be >= 8, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantile_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch_agg needs a double value, got ${other.sql}")
  }

  override def createAggregationBuffer(): QSketch = new QSketch(k)

  override def update(buf: QSketch, input: InternalRow): QSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QSketch, other: QSketch): QSketch =
    buf.mergeWith(other)

  override def eval(buf: QSketch): Any = buf.serialized
  override def serialize(buf: QSketch): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): QSketch =
    QSketchOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `quantile_sketch_merge_agg(sketch)` — union previously built
  * sketches (the rollup aggregate, [[graft.util.Sketches.hllRollup]]'s
  * quantile twin). */
case class QuantileSketchMergeAgg(child: Expression,
                                  mutableAggBufferOffset: Int = 0,
                                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[QSketch]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantile_sketch_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch_merge_agg needs a sketch (binary), got ${other.sql}")
  }

  override def createAggregationBuffer(): Option[QSketch] = None

  override def update(buf: Option[QSketch],
                      input: InternalRow): Option[QSketch] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val s = QSketchOps.deserialize(v.asInstanceOf[Array[Byte]])
      buf match {
        case Some(acc) => Some(acc.mergeWith(s))
        case None => Some(s)
      }
    }
  }

  override def merge(buf: Option[QSketch],
                     other: Option[QSketch]): Option[QSketch] =
    (buf, other) match {
      case (Some(a), Some(b)) => Some(a.mergeWith(b))
      case (a, None) => a
      case (None, b) => b
    }

  override def eval(buf: Option[QSketch]): Any =
    buf.map(_.serialized).orNull

  override def serialize(buf: Option[QSketch]): Array[Byte] =
    buf.map(_.serialized).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[QSketch] =
    if (bytes.isEmpty) None else Some(QSketchOps.deserialize(bytes))

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `qsketch_quantile(sketch, q)` — the q-quantile a serialized sketch
  * holds (percentile-disc lower semantics; exact in the uncompacted
  * regime). NULL on an empty sketch. */
case class QSketchQuantile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "qsketch_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"qsketch_quantile needs (binary, double), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(sketch: Any, q: Any): Any =
    QSketchOps.quantile(sketch.asInstanceOf[Array[Byte]],
      q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("qv")
      s"""
         |java.lang.Double $r = graft.functions.QSketchOps.quantile($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `qsketch_n(sketch)` — the EXACT row count a sketch stands for
  * (compaction preserves total weight). */
case class QSketchN(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "qsketch_n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qsketch_n needs a sketch (binary), got ${other.sql}")
  }

  override def nullSafeEval(sketch: Any): Any =
    QSketchOps.count(sketch.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.QSketchOps.count($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `qsketch_stats(sketch)` — the exact count AND a fixed list of
  * quantiles in ONE sketch decode (`struct<n bigint, q array<double>>`):
  * the serving projection `(n, p25, p50, p90)` would otherwise
  * deserialize and re-sort the sketch once PER output column. NULL on
  * an empty or null sketch. */
case class QSketchStats(child: Expression, qs: Seq[Double])
    extends UnaryExpression {

  require(qs.nonEmpty, "qsketch_stats: need at least one quantile")
  require(qs.forall(q => q >= 0.0 && q <= 1.0),
    s"qsketch_stats: quantiles must be in [0,1], got $qs")

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("q", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "qsketch_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qsketch_stats needs a sketch (binary), got ${other.sql}")
  }

  @transient private lazy val qsArr = qs.toArray

  override def nullSafeEval(sketch: Any): Any =
    QSketchOps.stats(sketch.asInstanceOf[Array[Byte]], qsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qsketchQs", qsArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("qstats")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r =
         |  graft.functions.QSketchOps.stats($a, $ref);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QSketchF {
  /** Aggregate column: build a mergeable quantile sketch of `x`. */
  def quantileSketch(x: Column, k: Int): Column =
    Bridge.column(QuantileSketchAgg(Bridge.expression(x), k)
      .toAggregateExpression())

  /** Aggregate column: union serialized sketches. */
  def quantileSketchMerge(sketch: Column): Column =
    Bridge.column(QuantileSketchMergeAgg(Bridge.expression(sketch))
      .toAggregateExpression())

  /** Scalar: the q-quantile of a serialized sketch. */
  def qsketchQuantile(sketch: Column, q: Double): Column =
    Bridge.column(QSketchQuantile(Bridge.expression(sketch),
      Bridge.expression(org.apache.spark.sql.functions.lit(q))))

  /** Scalar: exact total row count of a serialized sketch. */
  def qsketchN(sketch: Column): Column =
    Bridge.column(QSketchN(Bridge.expression(sketch)))

  /** Scalar: count + quantile list in one decode (see [[QSketchStats]]). */
  def qsketchStats(sketch: Column, qs: Seq[Double]): Column =
    Bridge.column(QSketchStats(Bridge.expression(sketch), qs))
}
