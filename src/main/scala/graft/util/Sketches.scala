package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count SKETCH TABLES (Spark's built-in Apache
  * DataSketches HLL functions) — the pre-aggregation pattern that makes
  * interactive roll-ups possible at 100 TB: scan the raw data ONCE into
  * per-group sketches (a few KB each), persist that tiny table, and
  * answer every later roll-up (any union of groups, the global total)
  * by MERGING sketches — no second look at the raw corpus, ever.
  * Distinct counts are the one aggregate that cannot roll up from
  * per-group exact counts (distinct is not additive); the sketch's
  * max-register merge is exactly what restores additivity.
  *
  * Merge is associative, commutative, and idempotent (register-wise
  * max), so partial tables from different ingest days combine in any
  * order — the property the spec pins. Estimates carry the standard
  * HLL error (~1.04/√2^lgK ≈ 1.6% at the default lgK 12). */
object Sketches {

  /** One sketch per group: `(groupCol, sketch binary)`. One scan, one
    * map-side-combined aggregation — the shuffle carries sketch
    * partials, never item values. */
  def hllBuild(df: DataFrame, groupCol: String, itemCol: String,
               lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"hllBuild: lgK must be in [4,21], got $lgK")
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(itemCol), lit(lgK)).as("sketch"))
  }

  /** Roll a sketch table up to coarser groups (or one row for the
    * global total) WITHOUT touching raw data: `(newGroup, sketch)`. */
  def hllRollup(sketches: DataFrame, newGroupCol: Column,
                sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(newGroupCol.as("grp"))
      .agg(hll_union_agg(col(sketchCol)).as("sketch"))

  /** Distinct-count estimate of a sketch column. */
  def hllEstimate(sketchCol: Column): Column =
    hll_sketch_estimate(sketchCol)

  // --- quantile sketch tables (graft.functions.QSketch) --------------
  // The same table pattern for PERCENTILES, the other non-additive
  // aggregate: per-group quantiles cannot roll up from per-group
  // quantiles, but per-group quantile SKETCHES merge exactly (weight-
  // preserving buffer union). One corpus scan → a (group, sketch)
  // table → any later rollup's p50/p99 without re-reading the corpus.

  /** One quantile sketch per group: `(groupCol, sketch binary)`. One
    * scan, map-side combined; the shuffle carries ≤ k·levels doubles
    * per partial, never rows. Exact while a group stays under `k` rows
    * (the value-oracle regime); bounded rank error past it. */
  def qsBuild(df: DataFrame, groupCol: String, valueCol: String,
              k: Int = 512): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.QSketchF.quantileSketch(
        col(valueCol).cast("double"), k).as("sketch"))

  /** Roll a quantile-sketch table up to coarser groups WITHOUT
    * touching raw data: `(grp, sketch)`. */
  def qsRollup(sketches: DataFrame, newGroupCol: Column,
               sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(newGroupCol.as("grp"))
      .agg(graft.functions.QSketchF.quantileSketchMerge(col(sketchCol))
        .as("sketch"))

  /** q-quantile of a sketch column (percentile-disc lower semantics). */
  def qsQuantile(sketchCol: Column, q: Double): Column =
    graft.functions.QSketchF.qsketchQuantile(sketchCol, q)

  /** Exact row count a sketch stands for (weight-preserving). */
  def qsCount(sketchCol: Column): Column =
    graft.functions.QSketchF.qsketchN(sketchCol)

  /** Count + a quantile LIST in one sketch decode —
    * `struct<n, q array<double>>`; the serving projection
    * `(n, p25, p50, p90)` should use this instead of one
    * [[qsQuantile]] call per column (each call deserializes and
    * re-sorts the whole sketch). */
  def qsStats(sketchCol: Column, qs: Seq[Double]): Column =
    graft.functions.QSketchF.qsketchStats(sketchCol, qs)

  // --- bloom membership tables (Spark's own BloomFilter sketch) ------
  // The MEMBERSHIP member of the sketch-table family: per-shard "have
  // we seen this fingerprint" filters built in the ingest scan, rolled
  // up (bitwise OR — union preserves no-false-negatives) to whatever
  // granularity the next incremental-dedup pass probes at. All shards
  // must share (estItems, numBits) or the union throws.

  /** One bloom per group over a LONG item column (hash fingerprints):
    * `(groupCol, bloom binary)`. */
  def bloomBuild(df: DataFrame, groupCol: String, itemCol: String,
                 estItems: Long, numBits: Long): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.BloomFns.bloomAgg(col(itemCol), estItems,
        numBits).as("bloom"))

  /** Union a bloom table up to coarser groups: `(grp, bloom)`. */
  def bloomRollup(blooms: DataFrame, newGroupCol: Column,
                  bloomCol: String = "bloom"): DataFrame =
    blooms.groupBy(newGroupCol.as("grp"))
      .agg(graft.functions.BloomFns.bloomUnion(col(bloomCol)).as("bloom"))
}
