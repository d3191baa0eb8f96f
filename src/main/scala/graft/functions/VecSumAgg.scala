package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Element-wise weighted vector sum/mean as ONE real aggregate:
  * `Σ w·v` (or its mean over contributing rows) per group, buffered as
  * a single double array.
  *
  * This is the per-dimension aggregation shape that scales: the
  * posexplode → groupBy(group, dim) form multiplies the shuffle by the
  * vector dimension (a 64-dim corpus moves 64 rows per group per
  * partition); here map-side partial aggregation folds every partition
  * down to ONE array per group, the shuffle carries arrays, and no
  * second reassembly aggregation is needed. Gradient sums
  * ([[graft.llm.Classifier]]) and chunk pooling
  * ([[graft.llm.Embeddings]]) are the same aggregate with different
  * weights.
  *
  * NULL vector or NULL weight rows don't contribute (SQL aggregate
  * convention). Vectors must share one dimension — a ragged corpus
  * fails LOUDLY (the exploded form silently averaged ragged dims over
  * different counts; that is a data bug, not a semantics choice).
  * `roundTo >= 0` rounds each output component (HALF_UP, the engine
  * parity rendering); mean of zero contributing rows is NULL. */
case class VecSumAgg(vecExpr: Expression, weightExpr: Expression,
                     mean: Boolean, roundTo: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumBuf] {

  override def children: Seq[Expression] = Seq(vecExpr, weightExpr)
  override def nullable: Boolean = true
  override def prettyName: String = if (mean) "vec_mean" else "vec_sum"

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemType: DataType = vecExpr.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType, weightExpr.dataType) match {
      case (DoubleType | FloatType | IntegerType | LongType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, w) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<numeric>, double weight), got " +
          s"(${vecExpr.dataType.sql}, ${w.sql})")
    }

  @transient private lazy val et = elemType

  private def read(a: ArrayData, i: Int): Double = et match {
    case DoubleType  => a.getDouble(i)
    case FloatType   => a.getFloat(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case other => throw new IllegalStateException(s"vec_sum: $other")
  }

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf

  override def update(buf: VecSumBuf, input: InternalRow): VecSumBuf = {
    val v = vecExpr.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (d == 0) return buf // empty vectors don't contribute (explode parity)
      if (buf.sums == null) buf.sums = new Array[Double](d)
      else require(buf.sums.length == d,
        s"$prettyName: ragged vector dimensions (${buf.sums.length} vs $d)")
      val wd = w.asInstanceOf[Double]
      var i = 0
      while (i < d) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"$prettyName: null vector element at $i")
        buf.sums(i) += wd * read(arr, i)
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: VecSumBuf, other: VecSumBuf): VecSumBuf = {
    if (other.sums != null) {
      if (buf.sums == null) { buf.sums = other.sums.clone(); buf.n = other.n }
      else {
        require(buf.sums.length == other.sums.length,
          s"$prettyName: ragged vector dimensions in merge")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
        buf.n += other.n
      }
    }
    buf
  }

  override def eval(buf: VecSumBuf): Any = {
    if (buf.sums == null) return null
    val out = new Array[Double](buf.sums.length)
    var i = 0
    while (i < out.length) {
      var x = buf.sums(i)
      if (mean) x /= buf.n
      out(i) =
        if (roundTo >= 0)
          java.math.BigDecimal.valueOf(x)
            .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
        else x
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: VecSumBuf): Array[Byte] = {
    val d = if (buf.sums == null) -1 else buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + math.max(d, 0) * 8)
    bb.putInt(d); bb.putLong(buf.n)
    var i = 0
    while (i < d) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val buf = new VecSumBuf
    buf.n = bb.getLong
    if (d >= 0) {
      buf.sums = new Array[Double](d)
      var i = 0
      while (i < d) { buf.sums(i) = bb.getDouble; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vecExpr = newChildren(0), weightExpr = newChildren(1))
}

final class VecSumBuf {
  var sums: Array[Double] = null
  var n: Long = 0L
}

object VecAggF {
  /** `Σ weight·vec` per group as one array-buffered aggregate. */
  def vecSum(vec: Column, weight: Column): Column =
    Bridge.column(VecSumAgg(Bridge.expression(vec),
      Bridge.expression(weight), mean = false, roundTo = -1)
      .toAggregateExpression())

  /** Per-dimension mean over non-null rows, each component rounded to
    * `roundTo` (pass -1 for raw). */
  def vecMean(vec: Column, roundTo: Int = -1): Column =
    Bridge.column(VecSumAgg(Bridge.expression(vec),
      org.apache.spark.sql.catalyst.expressions.Literal(1.0),
      mean = true, roundTo = roundTo).toAggregateExpression())
}
