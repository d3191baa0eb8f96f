package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Column wrappers over Spark's OWN Bloom-filter expressions — the pair
  * Catalyst itself uses for runtime join filters (`BloomFilterAggregate`
  * builds the serialized filter as an aggregate; `BloomFilterMightContain`
  * probes it codegen'd on the scan side). Re-exposed here as library
  * functions so graft operators can build an EXPLICIT semantic bloom
  * prefilter (e.g. benchmark-gram membership in decontamination) rather
  * than relying on the optimizer to inject one.
  *
  * The probe is approximate (false positives, never false negatives), so
  * every graft use pairs it with an exact verify join over the surviving
  * candidates — the bloom only shrinks what reaches the shuffle.
  */
object BloomFns {

  /** Aggregate a LONG column into a serialized bloom filter (binary).
    * `numBits` is the filter size in bits (~8 bits/item ≈ 2% fpp);
    * returns NULL for an empty input relation. Spark caps the size at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default 2²⁶ =
    * 8 MB) — size requests past it fail analysis, so raise the conf
    * alongside `estItems` for 100M+-item benchmark sets. */
  def bloomAgg(h: Column, estItems: Long, numBits: Long): Column = {
    require(estItems > 0 && numBits > 0,
      s"bloomAgg: estItems and numBits must be positive, got $estItems/$numBits")
    Bridge.column(new BloomFilterAggregate(Bridge.expression(h),
      Literal(estItems), Literal(numBits)).toAggregateExpression())
  }

  /** Membership probe of a LONG column against a serialized filter built
    * by [[bloomAgg]]. The filter bytes ride the task binary as a literal
    * (size them accordingly: numBits/8 bytes). A NULL filter (empty
    * build side) yields NULL, which `filter(...)` drops — the correct
    * "nothing can match" answer.
    *
    * SIZE WARNING: prefer the `Broadcast` overload for anything past a
    * few hundred KB — a plan-literal filter is re-serialized into EVERY
    * task binary, while a broadcast ships once per executor via torrent
    * blocks. This literal form stays for tiny filters and tests. */
  def bloomMightContain(bloomBytes: Array[Byte], h: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), Bridge.expression(h)))

  /** Membership probe against a BROADCAST serialized filter — the
    * 100 TB-safe form: the expression tree carries only the (tiny)
    * broadcast handle, the filter bytes move once per executor over
    * torrent broadcast, and each executor deserializes the probe
    * structure exactly once (keyed by broadcast id). A NULL broadcast
    * value (empty build side) probes to false — under `filter(...)`
    * identical to the literal form's NULL result. */
  def bloomMightContain(bf: Broadcast[Array[Byte]], h: Column): Column =
    Bridge.column(BloomBroadcastProbe(Bridge.expression(h), bf))

  /** Count of a long-array column's elements probing TRUE against a
    * broadcast filter — one native call, no per-element lambda (see
    * [[BloomBroadcastProbeCount]]). */
  def bloomProbeCount(bf: Broadcast[Array[Byte]], hashes: Column): Column =
    Bridge.column(BloomBroadcastProbeCount(Bridge.expression(hashes), bf))

  /** Aggregate column: union serialized blooms (see [[BloomUnionAgg]]) —
    * the rollup of a per-group bloom TABLE. */
  def bloomUnion(bloom: Column): Column =
    Bridge.column(BloomUnionAgg(Bridge.expression(bloom))
      .toAggregateExpression())

  /** Broadcast the filter bytes built by [[bloomAgg]] for use with the
    * broadcast [[bloomMightContain]] overload. NULL bytes broadcast fine
    * (probes are then constant-false). */
  def broadcastBloom(spark: org.apache.spark.sql.SparkSession,
                     bloomBytes: Array[Byte]): Broadcast[Array[Byte]] =
    spark.sparkContext.broadcast(bloomBytes)
}

/** `mightContainLong` over a broadcast serialized bloom filter. Unlike
  * Spark's own [[BloomFilterMightContain]] — which requires the filter as
  * a foldable literal and therefore embeds the full byte array in every
  * serialized task plan — this expression holds only the `Broadcast`
  * handle. Deserialization happens lazily per executor JVM via
  * [[BloomProbeOps]] and the generated code is a single static call, so
  * the probe stays inside WholeStageCodegen exactly like the literal
  * form. */
case class BloomBroadcastProbe(child: Expression, bf: Broadcast[Array[Byte]])
    extends UnaryExpression with Predicate {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_bcast_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bcast_probe needs a bigint probe value, got ${other.sql}")
  }

  override def nullSafeEval(h: Any): Any =
    BloomProbeOps.mightContain(bf, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBcast", bf,
      classOf[Broadcast[Array[Byte]]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomProbeOps.mightContain($ref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bloom_bcast_probe_count(hashes)` — how many elements of a
  * `array<bigint>` column probe TRUE against a broadcast serialized
  * bloom filter, in one generated-code call. Replaces the
  * `size(filter(arr, h -> mightContain(h)))` composition on streaming
  * hot paths: Spark's array `filter` is CodegenFallback (a boxed lambda
  * call per element) and materializes the surviving array just to take
  * its length. NULL array → NULL; NULL elements are skipped; an empty
  * broadcast (null bytes) counts zero — all matching the composed
  * form's behavior under `filter(...)`. */
case class BloomBroadcastProbeCount(child: Expression,
                                    bf: Broadcast[Array[Byte]])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_bcast_probe_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bcast_probe_count needs array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(arr: Any): Any =
    BloomProbeOps.countContained(bf,
      arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBcast", bf,
      classOf[Broadcast[Array[Byte]]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomProbeOps.countContained($ref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bloom_union_agg(bloom)` — union serialized bloom filters built by
  * [[BloomFns.bloomAgg]] (bitwise OR of compatible filters — Spark's
  * own `BloomFilter.mergeInPlace`), making per-group bloom tables ROLL
  * UP like the HLL and quantile sketches: build per-shard membership
  * filters in one scan, union them to any coarser grouping with no
  * second look at the raw data. Union preserves the no-false-negative
  * guarantee; the fp rate degrades with load factor exactly as a
  * direct-built filter of the same size would. Filters must share
  * (numBits, numHashes) — i.e. be built with the same bloomAgg params —
  * or the merge throws (loudly: silently OR-ing incompatible filters
  * would fabricate memberships). NULL inputs (empty groups) are
  * skipped; an all-NULL relation yields NULL. */
case class BloomUnionAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Option[org.apache.spark.util.sketch.BloomFilter]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_union_agg needs a serialized bloom (binary), got ${other.sql}")
  }

  private def read(bytes: Array[Byte]) =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))

  override def createAggregationBuffer()
      : Option[org.apache.spark.util.sketch.BloomFilter] = None

  override def update(
      buf: Option[org.apache.spark.util.sketch.BloomFilter],
      input: org.apache.spark.sql.catalyst.InternalRow)
      : Option[org.apache.spark.util.sketch.BloomFilter] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val f = read(v.asInstanceOf[Array[Byte]])
      buf match {
        case Some(acc) => Some(acc.mergeInPlace(f))
        case None => Some(f)
      }
    }
  }

  override def merge(
      buf: Option[org.apache.spark.util.sketch.BloomFilter],
      other: Option[org.apache.spark.util.sketch.BloomFilter])
      : Option[org.apache.spark.util.sketch.BloomFilter] =
    (buf, other) match {
      case (Some(a), Some(b)) => Some(a.mergeInPlace(b))
      case (a, None) => a
      case (None, b) => b
    }

  override def eval(
      buf: Option[org.apache.spark.util.sketch.BloomFilter]): Any =
    buf.map(serializeFilter).orNull

  private def serializeFilter(
      f: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    f.writeTo(out)
    out.toByteArray
  }

  override def serialize(
      buf: Option[org.apache.spark.util.sketch.BloomFilter]): Array[Byte] =
    buf.map(serializeFilter).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte])
      : Option[org.apache.spark.util.sketch.BloomFilter] =
    if (bytes.isEmpty) None else Some(read(bytes))

  override def withNewMutableAggBufferOffset(o: Int): BloomUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object BloomProbeOps {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, AnyRef]()
  private val NullFilter: AnyRef = new Object // sentinel: empty build side

  private def filterFor(b: Broadcast[Array[Byte]]): AnyRef =
    cache.computeIfAbsent(b.id, _ => {
      val bytes = b.value
      if (bytes == null) NullFilter
      else org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
    })

  /** Probe; false when the broadcast value is NULL (nothing was built, so
    * nothing can match). Executor-wide memoized deserialization — the
    * cache is bounded by the number of distinct bloom broadcasts in the
    * application's lifetime (a handful). */
  def mightContain(b: Broadcast[Array[Byte]], h: Long): Boolean =
    filterFor(b) match {
      case f: org.apache.spark.util.sketch.BloomFilter => f.mightContainLong(h)
      case _ => false
    }

  /** Count of array elements probing true; null elements skipped. */
  def countContained(b: Broadcast[Array[Byte]],
                     arr: org.apache.spark.sql.catalyst.util.ArrayData): Int =
    filterFor(b) match {
      case f: org.apache.spark.util.sketch.BloomFilter =>
        var c = 0; var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (!arr.isNullAt(i) && f.mightContainLong(arr.getLong(i))) c += 1
          i += 1
        }
        c
      case _ => 0
    }
}
