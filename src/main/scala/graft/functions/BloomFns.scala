package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

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
    * "nothing can match" answer. */
  def bloomMightContain(bloomBytes: Array[Byte], h: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), Bridge.expression(h)))
}
