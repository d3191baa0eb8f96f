package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** `mmr_select(id, score, vec)` — Maximal Marginal Relevance re-ranking
  * (Carbonell & Goldstein, SIGIR'98) as a bounded aggregate: buffer the
  * candidate set (already ≤ a first-stage top-k; hard-capped at
  * `maxCandidates` by (score desc, id asc) so a malformed caller cannot
  * blow the heap), then greedily select `k` results where each pick
  * maximizes `λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s)` — relevance
  * traded against redundancy with what is already shown, the standard
  * diversified-serving pass after BM25/ANN retrieval.
  *
  * An AGGREGATE rather than a driver loop so the batch path distributes:
  * `groupBy(qid).agg(mmr_select(...))` runs every query's greedy pass
  * executor-side in parallel, map-side partials merge by candidate-list
  * union (re-capped), and the shuffle carries ≤ maxCandidates rows per
  * query — never the corpus. The greedy scan itself is O(k·n·dim) over
  * n ≤ maxCandidates rows, serving-sized by construction.
  *
  * ENGINE-PARITY contract (the [[graft.llm.Retrieval]] posture): every
  * cosine rounds to 6 BEFORE the max-penalty, every marginal score
  * rounds to 6 before comparison, and ties break by id asc — the same
  * arithmetic an unrolled SQL greedy replays value-for-value.
  *
  * Output: `array<struct<id long, score double, mmr double>>` in pick
  * order (posexplode for 1-based ranks). Null id/score/vec rows and
  * null vector ELEMENTS are skipped (a candidate without an embedding
  * cannot be diversity-scored). Zero-norm vectors get cosine 0 against
  * everything (they carry no direction to be redundant in). */
case class MmrSelectAgg(idExpr: Expression, scoreExpr: Expression,
                        vecExpr: Expression, k: Int, lambda: Double,
                        maxCandidates: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MmrBuffer] {

  require(k > 0, s"mmr_select: k must be positive, got $k")
  require(lambda >= 0.0 && lambda <= 1.0,
    s"mmr_select: lambda must be in [0,1], got $lambda")
  require(maxCandidates >= k,
    s"mmr_select: maxCandidates ($maxCandidates) must be >= k ($k)")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr, vecExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "mmr_select"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))), containsNull = false)

  private lazy val vecElem: Option[DataType] = vecExpr.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (idExpr.dataType, scoreExpr.dataType, vecElem) match {
      case (LongType, DoubleType, Some(_)) => TypeCheckResult.TypeCheckSuccess
      case (i, s, _) => TypeCheckResult.TypeCheckFailure(
        "mmr_select needs (bigint id, double score, array<float|double> vec), " +
          s"got (${i.sql}, ${s.sql}, ${vecExpr.dataType.sql})")
    }

  override def createAggregationBuffer(): MmrBuffer =
    new MmrBuffer(maxCandidates)

  override def update(buf: MmrBuffer, input: InternalRow): MmrBuffer = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    val vec = vecExpr.eval(input)
    if (id != null && score != null && vec != null) {
      val arr = vec.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val v = new Array[Double](n)
      var i = 0
      var ok = true
      val isFloat = vecElem.contains(FloatType)
      while (i < n && ok) {
        if (arr.isNullAt(i)) ok = false
        else {
          v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          i += 1
        }
      }
      if (ok) buf.offer(id.asInstanceOf[Long], score.asInstanceOf[Double], v)
    }
    buf
  }

  override def merge(buf: MmrBuffer, other: MmrBuffer): MmrBuffer =
    buf.mergeWith(other)

  override def eval(buf: MmrBuffer): Any = {
    val picks = buf.select(k, lambda)
    new GenericArrayData(picks.map { case (id, score, mmr) =>
      InternalRow(id, score, mmr)
    }.toArray[Any])
  }

  override def serialize(buf: MmrBuffer): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): MmrBuffer =
    MmrBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MmrSelectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MmrSelectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1),
      vecExpr = newChildren(2))
}

/** Bounded candidate buffer: ≤ cap entries by (score desc, id asc). */
final class MmrBuffer(val cap: Int) {
  var items = scala.collection.mutable.ArrayBuffer
    .empty[(Long, Double, Array[Double])]

  private def trim(): Unit =
    if (items.length > cap) {
      items = items.sortBy { case (id, s, _) => (-s, id) }.take(cap)
    }

  def offer(id: Long, score: Double, vec: Array[Double]): Unit = {
    items += ((id, score, vec))
    // amortize: only re-sort when 2x over cap
    if (items.length > 2 * cap) trim()
  }

  def mergeWith(other: MmrBuffer): MmrBuffer = {
    items ++= other.items
    trim()
    this
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Greedy MMR over the buffered candidates — see [[MmrSelectAgg]]. */
  def select(k: Int, lambda: Double): Seq[(Long, Double, Double)] = {
    trim()
    val cands = items.sortBy { case (id, s, _) => (-s, id) }.toArray
    val n = cands.length
    val norms = cands.map { case (_, _, v) =>
      math.sqrt(v.map(x => x * x).sum)
    }
    val taken = new Array[Boolean](n)
    // running max-similarity-to-selected per candidate: each pick updates
    // it in one pass, so the whole greedy is O(k·n·dim), not O(k·n²·dim)
    val maxSim = new Array[Double](n)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    var picks = 0
    while (picks < k && picks < n) {
      var best = -1
      var bestMmr = 0.0
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val penalty = if (picks == 0) 0.0 else maxSim(i)
          val mmr = round6(lambda * cands(i)._2 - (1.0 - lambda) * penalty)
          if (best < 0 || mmr > bestMmr ||
              (mmr == bestMmr && cands(i)._1 < cands(best)._1)) {
            best = i; bestMmr = mmr
          }
        }
        i += 1
      }
      taken(best) = true
      out += ((cands(best)._1, cands(best)._2, bestMmr))
      // fold the new pick into every remaining candidate's penalty
      val pv = cands(best)._3
      val pn = norms(best)
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val v = cands(i)._3
          val vn = norms(i)
          val cos =
            if (pn == 0.0 || vn == 0.0 || pv.length != v.length) 0.0
            else {
              var dot = 0.0
              var j = 0
              while (j < v.length) { dot += pv(j) * v(j); j += 1 }
              round6(dot / (pn * vn))
            }
          if (cos > maxSim(i)) maxSim(i) = cos
        }
        i += 1
      }
      picks += 1
    }
    out.toSeq
  }

  def serialized: Array[Byte] = {
    // trim before shipping a partial so the shuffle carries ≤ cap
    // candidates per group, matching the documented hard bound (the
    // in-memory buffer amortizes to 2*cap between trims, but that slack
    // never leaves the task)
    trim()
    var bytes = 4 + 4
    items.foreach { case (_, _, v) => bytes += 8 + 8 + 4 + 8 * v.length }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(cap); bb.putInt(items.length)
    items.foreach { case (id, s, v) =>
      bb.putLong(id); bb.putDouble(s); bb.putInt(v.length)
      v.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object MmrBuffer {
  def deserialize(bytes: Array[Byte]): MmrBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new MmrBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val id = bb.getLong; val s = bb.getDouble
      val len = bb.getInt
      val v = new Array[Double](len)
      var j = 0
      while (j < len) { v(j) = bb.getDouble; j += 1 }
      buf.items += ((id, s, v))
      i += 1
    }
    buf
  }
}

object MmrF {
  /** Aggregate column: greedy MMR selection over buffered candidates. */
  def mmrSelect(id: Column, score: Column, vec: Column, k: Int,
                lambda: Double, maxCandidates: Int = 1024): Column =
    Bridge.column(MmrSelectAgg(Bridge.expression(id),
      Bridge.expression(score), Bridge.expression(vec), k, lambda,
      maxCandidates).toAggregateExpression())
}
