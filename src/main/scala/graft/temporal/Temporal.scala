package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators the reference engine lacks but any event pipeline at
  * scale needs: as-of joins, sessionization (gaps-and-islands), and range
  * (interval) joins. The reference has NO join surface at all (SURVEY.md
  * §2.6 — railgun pipelines are single-stream); these are the extension
  * operators the builder brief names explicitly ("as-of join, range join"),
  * built Spark-first.
  *
  * Design rules shared by everything here:
  *   - Timestamps flow as epoch-µs LONGs (callers normalize once at the
  *     scan — see SparkEntry's events adaptation); all arithmetic is
  *     integer, so Spark and the DuckDB oracle evaluate one formula.
  *   - One shuffle per operator, on the natural key. The as-of join and
  *     sessionizer are WINDOW-shaped (sort-merge within each key
  *     partition, running-accumulator frames — Spark's WindowExec streams
  *     `ROWS UNBOUNDED PRECEDING → CURRENT ROW` frames without buffering
  *     the partition), NOT join-shaped: no range-explosion, no per-key
  *     collect, no driver state.
  *   - Skew: a single hot key serializes its window. That is inherent to
  *     order-dependent semantics (salting would break the running order);
  *     the mitigation at 100 TB is time-bucketing the key upstream, which
  *     callers can do because the contract is per-(key, ts) deterministic.
  */
object Temporal {

  /** Backward as-of join, the standard market-data/feature-store shape:
    * for each left row, attach the single LATEST right row with
    * `right.ts <= left.ts` on the same key (inclusive; `toleranceUs`
    * optionally voids matches older than `left.ts - toleranceUs`).
    *
    * Implementation is the union-window plan, not a join: tag both sides,
    * union, and take a running `last(payload) IGNORE NULLS` over
    * `(PARTITION BY key ORDER BY ts, side, payload)`. Right rows sort
    * before left rows at equal ts (side 0 < 1) so an exact-ts match is
    * visible, and equal-ts right duplicates resolve by payload struct
    * order — a total, engine-independent order, so the pick is
    * deterministic at any parallelism (DuckDB's ASOF JOIN leaves the
    * equal-ts pick unspecified; this operator does not).
    *
    * Scale: ONE shuffle on `keyCols`, then a streaming window frame. A
    * sort-merge join alternative re-shuffles both sides and still needs a
    * per-row backward scan; the union plan sorts once and reads once.
    *
    * @param left      probe side; all its columns pass through
    * @param right     reference side; its non-key, non-ts columns come
    *                  back prefixed, NULL where no match exists
    * @param keyCols   equi-key shared by both sides
    * @param leftTsUs  epoch-µs LONG column on `left`
    * @param rightTsUs epoch-µs LONG column on `right`
    * @param prefix    prefix for the attached right columns (also used for
    *                  the `<prefix>ts_us` match-timestamp column)
    *
    * NULL semantics (spec-pinned): a NULL-ts left row sorts before every
    * right row in its key partition and therefore never matches; NULL
    * keys form their own partition (Spark window semantics), so null-key
    * probes match null-key reference rows.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTsUs: String, rightTsUs: String, prefix: String = "asof_",
               toleranceUs: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin: at least one key column")
    val payloadCols = right.columns.filterNot(keyCols.contains).toSeq
    require(payloadCols.nonEmpty, "asofJoin: right side has no payload")
    // payload carries the right ts too — tolerance and the emitted
    // <prefix>ts_us both need the MATCHED row's timestamp, and packing it
    // in the struct guarantees all attached columns come from one row.
    val payload = struct(
      col(rightTsUs).as("__ts") +: payloadCols.filterNot(_ == rightTsUs)
        .map(c => col(c).as(c)): _*)
    val leftCols = left.columns.toSeq
    val tagged = left
      .withColumn("__side", lit(1)).withColumn("__ts", col(leftTsUs))
      .withColumn("__p", lit(null).cast(
        right.select(payload).schema.head.dataType))
      .select((keyCols.map(col) :+ col("__side") :+ col("__ts") :+
        col("__p")) ++ leftCols.filterNot(keyCols.contains).map(col): _*)
    val rightTagged = right
      .withColumn("__side", lit(0)).withColumn("__ts", col(rightTsUs))
      .withColumn("__p", payload)
      .select((keyCols.map(col) :+ col("__side") :+ col("__ts") :+
        col("__p")): _*)
    // left-only columns are NULL on right rows (dropped post-window)
    val unioned = tagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched = toleranceUs match {
      case Some(tol) => matchedRaw.withColumn("__m",
        when(col("__ts") - col("__m").getField("__ts") <= tol, col("__m")))
      case None => matchedRaw
    }
    val attached = payloadCols.filterNot(_ == rightTsUs)
      .map(c => col("__m").getField(c).as(s"$prefix$c"))
    matched.select(leftCols.map(col) ++
      (col("__m").getField("__ts").as(s"${prefix}ts_us") +: attached): _*)
  }

  /** FORWARD as-of join: for each left row, the single EARLIEST right row
    * with `right.ts >= left.ts` on the same key (inclusive;
    * `toleranceUs` voids matches further than `left.ts + toleranceUs`) —
    * the "next event after" shape (next fill after an order, next
    * heartbeat after a probe). Implemented as [[asofJoin]] on NEGATED
    * timestamps — time reversal turns earliest-after into latest-before,
    * so the two directions share one engine (and the same determinism
    * contract); the emitted `<prefix>ts_us` is negated back. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTsUs: String, rightTsUs: String,
                      prefix: String = "asof_",
                      toleranceUs: Option[Long] = None): DataFrame = {
    val l = left.withColumn(leftTsUs, -col(leftTsUs))
    val r = right.withColumn(rightTsUs, -col(rightTsUs))
    asofJoin(l, r, keyCols, leftTsUs, rightTsUs, prefix, toleranceUs)
      .withColumn(leftTsUs, -col(leftTsUs))
      .withColumn(s"${prefix}ts_us", -col(s"${prefix}ts_us"))
  }

  /** NEAREST as-of join: for each left row, the right row on the same
    * key MINIMIZING `|right.ts - left.ts|` — the sensor-alignment shape
    * (closest reading to each sample time), where neither direction
    * alone is right. Equal distance prefers the BACKWARD (earlier)
    * match; equal-timestamp right rows resolve by the same payload-
    * struct total order both directional engines use, so the pick is
    * deterministic at any parallelism and the two candidate engines
    * agree on boundary rows. `toleranceUs` bounds the distance on both
    * sides.
    *
    * Runs the backward and forward engines (two key-shuffles, sharing
    * the one union-window implementation) and selects per row — a
    * row-local projection over the two candidates; no third pass. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTsUs: String, rightTsUs: String,
                      prefix: String = "asof_",
                      toleranceUs: Option[Long] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(keyCols.contains)
      .filterNot(_ == rightTsUs).toSeq
    val b = asofJoin(left, right, keyCols, leftTsUs, rightTsUs, "__nb_", toleranceUs)
    val bf = asofJoinForward(b, right, keyCols, leftTsUs, rightTsUs, "__nf_", toleranceUs)
    val lts = col(leftTsUs)
    val bts = col("__nb_ts_us")
    val fts = col("__nf_ts_us")
    val useB = bts.isNotNull && (fts.isNull || (lts - bts) <= (fts - lts))
    val picked = ("ts_us" +: payloadCols).map { c =>
      when(useB, col(s"__nb_$c")).otherwise(col(s"__nf_$c")).as(s"$prefix$c")
    }
    bf.select(left.columns.toSeq.map(col) ++ picked: _*)
  }

  /** Gaps-and-islands sessionization: adds `session_start_us` — the first
    * timestamp of the session the row belongs to, where a session breaks
    * when the gap to the previous event on the same key exceeds `gapUs`.
    * `(key, session_start_us)` is the session identity, stable across
    * engines and re-runs (no synthetic ids).
    *
    * One window, two running functions over one sort: the boundary flag is
    * `ts - lag(ts) > gap` and `session_start_us` is a running
    * `max(boundary ? ts : NULL)` — no second pass, no cumsum+join.
    * Equal-ts events on one key never open a gap (gap 0 ≤ gapUs), so ties
    * need no tiebreak: every order gives the same sessions.
    *
    * Scale: one shuffle on `keyCol`; both window functions stream the
    * running frame. Downstream per-session aggregation (see
    * [[sessionStats]]) reuses the same key in its grouping, so the
    * partial (map-side) aggregation runs on already-clustered data.
    */
  def sessionIds(df: DataFrame, keyCol: String, tsUsCol: String,
                 gapUs: Long): DataFrame = {
    require(gapUs >= 0, "sessionIds: gap must be non-negative")
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = lag(col(tsUsCol), 1).over(order).isNull ||
      (col(tsUsCol) - lag(col(tsUsCol), 1).over(order)) > gapUs
    df.withColumn("session_start_us",
      max(when(boundary, col(tsUsCol))).over(run))
  }

  /** Per-session stats over [[sessionIds]]: `(key, session_start_us,
    * session_end_us, n_events, sum_value)` with the double sum rounded to
    * 2 (summation-order determinism — the repo-wide rule for double
    * aggregates). `valueCol` may be null-free or not; `sum` skips NULLs on
    * both engines. */
  def sessionStats(df: DataFrame, keyCol: String, tsUsCol: String,
                   gapUs: Long, valueCol: String): DataFrame =
    sessionIds(df, keyCol, tsUsCol, gapUs)
      .groupBy(col(keyCol), col("session_start_us"))
      .agg(max(col(tsUsCol)).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))

  /** Range (interval) join, broadcast path: match each fact row to the
    * intervals `[lo, hi]` (inclusive both ends) containing `valueCol`.
    * The dim side is broadcast — Spark plans a BroadcastNestedLoopJoin,
    * which is the RIGHT plan when the interval table is dim-sized (the
    * overwhelmingly common case: banding tables, SLA tiers, calendar
    * ranges). Left-outer: facts matching nothing survive with NULL dim
    * columns. For interval tables too large to broadcast, use
    * [[rangeJoinBucketed]] — identical semantics, equi-join shape. */
  def rangeJoinBroadcast(fact: DataFrame, valueCol: String,
                         intervals: DataFrame, loCol: String,
                         hiCol: String): DataFrame =
    fact.join(broadcast(intervals),
      fact(valueCol) >= intervals(loCol) && fact(valueCol) <= intervals(hiCol),
      "left")

  /** Range join, bucketized path for BIG interval tables: quantize the
    * domain into `bucketWidth`-sized buckets, explode each interval into
    * the buckets it covers, equi-join fact.bucket = interval.bucket, then
    * re-check the exact predicate. This turns the nested loop into a
    * shuffled hash/sort-merge EQUI-join — the 100 TB shape — at the cost
    * of interval duplication proportional to `ceil(span / bucketWidth)`,
    * so pick `bucketWidth` near the typical interval span. Semantics are
    * identical to [[rangeJoinBroadcast]] (spec-pinned), including
    * left-outer NULL rows and facts covered by overlapping intervals.
    */
  def rangeJoinBucketed(fact: DataFrame, valueCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "rangeJoinBucketed: bucketWidth must be positive")
    val fb = fact.withColumn("__b",
      floor(fact(valueCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__b", explode(sequence(
      floor(intervals(loCol) / bucketWidth).cast("long"),
      floor(intervals(hiCol) / bucketWidth).cast("long"))))
    fb.join(ib,
        fb("__b") === ib("__b") &&
          fb(valueCol) >= ib(loCol) && fb(valueCol) <= ib(hiCol), "left")
      .drop("__b")
  }
}
