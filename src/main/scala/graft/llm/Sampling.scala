package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling and splitting for training-data
  * pipelines: the same (id, seed) always lands in the same bucket, on any
  * engine, at any parallelism — so a 90/5/5 split computed today over a
  * growing corpus never reassigns yesterday's rows, and a 10% sample is
  * re-derivable by auditors from the id alone (no stored RNG state, no
  * `rand()` nondeterminism across retries/speculative tasks — Spark's
  * `sample()` is NOT stable under re-execution, which is exactly why
  * pipelines key splits off the id).
  *
  * The hash is a Knuth multiplicative mix kept inside 63-bit signed
  * arithmetic (`((id + seed) mod 2^31) * 506952113 mod 2^31`,
  * 506952113 = 2654435761 mod 2^31) so the IDENTICAL expression runs on
  * Spark (lenient or ANSI) and DuckDB without overflow — the DuckDB
  * oracle checks these operators value-for-value. Not cryptographic;
  * adjacent ids decorrelate through the golden-ratio multiplier, which is
  * all sampling needs.
  *
  * Scale shape: every operator here is a row-local codegen'd projection
  * or filter over the scan — no shuffle, no driver state, trivially
  * 100 TB-safe. Filters push down to the parquet scan when the id is a
  * plain column.
  */
object Sampling {

  private val M: Long = 2147483648L // 2^31
  private val A: Long = 506952113L  // 2654435761 (Knuth) mod 2^31

  /** Deterministic bucket in [0, buckets) for an integer id. */
  def hashBucket(id: Column, seed: Long, buckets: Int): Column = {
    require(buckets > 0, "hashBucket: buckets must be positive")
    pmod(pmod(pmod(id + seed, lit(M)) * A, lit(M)), lit(buckets.toLong))
  }

  /** The SQL rendering of [[hashBucket]] — shared with oracle SQL so both
    * engines evaluate one formula. */
  def hashBucketSql(idExpr: String, seed: Long, buckets: Int): String =
    s"((((($idExpr + $seed) % $M + $M) % $M) * $A) % $M) % $buckets"

  /** Deterministic bucket in [0, buckets) for a STRING id: the top 60
    * bits (15 hex chars) of `md5(id || '|' || seed)` mod buckets. md5 is
    * already uniform, so no multiplicative mix is needed; 60 bits keeps
    * the value inside signed-64 range on both engines. Chosen for exact
    * cross-engine replay — Spark's `conv(substring(md5(s),1,15),16,10)`
    * and DuckDB's `CAST('0x' || substring(md5(s),1,15) AS BIGINT)` parse
    * the identical lowercase hex — so string-keyed corpora get the same
    * audit-reproducible sampling contract as integer-keyed ones without
    * minting a numeric id first. */
  def hashBucketStr(id: Column, seed: Long, buckets: Int): Column = {
    require(buckets > 0, "hashBucketStr: buckets must be positive")
    pmod(conv(substring(md5(concat(id, lit("|" + seed))), 1, 15), 16, 10)
      .cast("long"), lit(buckets.toLong))
  }

  /** The DuckDB rendering of [[hashBucketStr]] — one formula, two
    * engines, as [[hashBucketSql]]. */
  def hashBucketStrSql(idExpr: String, seed: Long, buckets: Int): String =
    s"CAST(concat('0x', substring(md5($idExpr || '|$seed'), 1, 15)) " +
      s"AS BIGINT) % $buckets"

  /** The id-typed bucket dispatch every sampler here shares: string ids
    * hash through [[hashBucketStr]], numeric ids through [[hashBucket]]
    * (the dedup/cluster family supports string ids — the samplers do
    * too, with no API change). */
  private def bucketFor(df: DataFrame, idCol: String, seed: Long,
                        buckets: Int): Column =
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.StringType =>
        hashBucketStr(col(idCol), seed, buckets)
      case _ => hashBucket(col(idCol), seed, buckets)
    }

  /** Keep a deterministic `fraction` of rows keyed by `idCol`.
    * Resolution is 1e-6 (fraction maps to a bucket threshold over 1M
    * buckets). */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double,
                   seed: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1,
      s"sampleByHash: fraction must be in [0,1], got $fraction")
    val buckets = 1000000
    df.filter(bucketFor(df, idCol, seed, buckets) <
      math.round(fraction * buckets))
  }

  /** Assign each row a split index by cumulative `weights` (e.g.
    * Seq(0.9, 0.05, 0.05) → 0=train, 1=val, 2=test). Weights must sum to
    * ~1; the last split absorbs rounding. Adding rows later never moves
    * existing rows between splits. */
  def splitByHash(df: DataFrame, idCol: String, weights: Seq[Double],
                  seed: Long = 0L, splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ >= 0) &&
      math.abs(weights.sum - 1.0) < 1e-6,
      s"splitByHash: weights must be non-negative and sum to 1, got $weights")
    val buckets = 1000000
    val b = bucketFor(df, idCol, seed, buckets)
    val cuts = weights.scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * buckets))
    val expr = cuts.zipWithIndex.init.foldRight(
      lit(weights.size - 1)) { case ((cut, i), els) =>
      when(b < cut, lit(i)).otherwise(els)
    }
    df.withColumn(splitCol, expr)
  }

  /** Stratified deterministic sampling: per-stratum keep fractions (e.g.
    * per-language or per-source mixing rates for a training blend), with
    * `defaultFraction` for strata not listed. One row-local filter — the
    * stratum column is read per row; no per-stratum scans, no shuffle. */
  /** Temperature-based domain mixing — the standard pretraining data-mix
    * op (multilingual / multi-source corpora): rebalance domain shares
    * from the natural `p_d ∝ n_d` toward uniform by sampling domain `d`
    * at share `∝ n_d^alpha` (`alpha = 1` natural, `alpha → 0` uniform).
    * Downsampling-only (no replication), so the largest corpus subject
    * to the target shares keeps the SMALLEST domain whole and keeps
    * fraction
    *
    *   `f_d = (n_min / n_d)^(1-alpha)`
    *
    * of every other — the closed form of "maximize kept rows subject to
    * output shares ∝ n_d^alpha" (the Σ-normalizer cancels, which also
    * makes the formula ENGINE-EXACT: one division + one pow of exact
    * integer counts, no float summation order to drift; at `alpha = 0.5`
    * it is `sqrt(n_min/n_d)` — correctly rounded IEEE ops end to end,
    * which is what lets the DuckDB oracle check row sets value-for-value).
    *
    * Rows keep/drop by the same id-keyed hash as every sampler here, so
    * the mix is deterministic, id-stable, and a row-local codegen'd
    * filter: the only jobs are one small per-domain count (driver-side
    * thresholds — domain cardinality is small by definition) and the
    * map-only filter scan. NULL domains form their own stratum. */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
                     alpha: Double, seed: Long = 0L): DataFrame = {
    // NB `df` is evaluated TWICE — once for the domain counts, once by
    // the returned filter. For a raw table scan the first pass is a
    // cheap column-pruned count; when `df` is an expensive upstream
    // pipeline, persist it first or pass precomputed counts to the
    // overload below.
    val counts: Seq[(Any, Long)] = df.groupBy(col(domainCol)).count()
      .collect().toSeq
      .map(r => (if (r.isNullAt(0)) null else r.get(0), r.getLong(1)))
    temperatureMix(df, idCol, domainCol, alpha, seed, counts)
  }

  /** [[temperatureMix]] with caller-supplied per-domain counts (skips
    * the counting pass — for expensive upstream plans, or when counts
    * come from table statistics). */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
                     alpha: Double, seed: Long,
                     counts: Seq[(Any, Long)]): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"temperatureMix: alpha must be in (0,1], got $alpha")
    require(counts.forall(_._2 > 0),
      "temperatureMix: domain counts must be positive")
    val buckets = 1000000
    if (counts.isEmpty) return df
    val nMin = counts.map(_._2).min
    // correctly-rounded sqrt at the common alpha = 0.5: JVM Math.pow is
    // only 1-ulp accurate and not guaranteed equal to sqrt, and the
    // DuckDB oracle's sqrt() IS correctly rounded — a 1-ulp threshold
    // difference after round() near a .5 boundary would flip membership
    val ex = 1.0 - alpha
    def keepFrac(n: Long): Double =
      if (ex == 0.5) math.sqrt(nMin.toDouble / n)
      else math.pow(nMin.toDouble / n, ex)
    val thr = counts.map { case (d, n) =>
      d -> math.round(buckets * keepFrac(n))
    }
    val thresh = thr.foldRight(lit(0L)) { case ((d, t), els) =>
      when(if (d == null) col(domainCol).isNull else col(domainCol) === d,
        lit(t)).otherwise(els)
    }
    df.filter(bucketFor(df, idCol, seed, buckets) < thresh)
  }

  /** Token-budget cap: keep rows per domain, in deterministic id-hash
    * order, while the running total of `weightCol` (token counts,
    * byte sizes…) stays within `budget` — the "give me at most N tokens
    * per source, reproducibly" op that finalizes a training blend after
    * [[temperatureMix]] sets the shares. The first row of a domain is
    * kept even if it alone exceeds the budget iff `budget >= its weight`
    * — i.e. the rule is `cumsum(weight) <= budget`, inclusive of the
    * current row, NULL domains forming their own stratum as everywhere
    * in this file.
    *
    * Hash order (not ts/id order) makes the kept set a uniform sample of
    * the domain and — like every sampler here — id-stable: a row's rank
    * never changes as OTHER domains grow, and within a domain new rows
    * enter the order without reshuffling survivors' relative ranks.
    *
    * Scale: ONE shuffle (window partition by domain), running-frame sum,
    * then a row-local filter; integer weights make the cumsum
    * ENGINE-EXACT (no float summation order), which is what the DuckDB
    * oracle checks. Domain skew: a giant domain serializes its window —
    * at 100 TB, pre-filter with [[sampleByHash]] at `~budget/n_d` before
    * capping so the window sees a bounded candidate set. */
  def budgetCap(df: DataFrame, idCol: String, domainCol: String,
                weightCol: String, budget: Long, seed: Long = 0L): DataFrame = {
    require(budget >= 0, s"budgetCap: budget must be non-negative, got $budget")
    val buckets = 1000000
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(bucketFor(df, idCol, seed, buckets), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum", sum(col(weightCol)).over(order))
      .filter(col("__cum") <= budget).drop("__cum")
  }

  /** Deterministic WEIGHTED sampling: keep each row with probability
    * ∝ its weight (quality score, token count), hitting `fraction` of
    * rows in expectation — the "sample more of the good stuff" corpus
    * op, with the same id-keyed determinism contract as
    * [[sampleByHash]] (rerun-identical, id-stable under reshuffling;
    * under corpus GROWTH the global scale shifts, unlike the unweighted
    * sampler — documented trade of weight normalization). Keep rule:
    * `hash(id) < min(1, w·fraction·N/Σw)·10⁶` — the normalizing scalar
    * is one small aggregation broadcast into a row-local filter, and
    * the threshold arithmetic is rendered IDENTICALLY in the DuckDB
    * oracle so the boundary is engine-exact. Rows with weight ≥ the
    * mean·(1/fraction) are always kept (probability capped at 1), NULL
    * weights never keep. */
  def sampleByWeight(df: DataFrame, idCol: String, weightCol: String,
                     fraction: Double, seed: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1,
      s"sampleByWeight: fraction must be in [0,1], got $fraction")
    val buckets = 1000000
    val stats = df.agg(count(lit(1)).as("__n"),
      sum(col(weightCol)).as("__sw"))
    // explicit null guard: `least` IGNORES nulls in both engines, so a
    // bare least(1.0, NULL·…) would keep every null-weight row
    val thr = least(lit(1.0),
      col(weightCol) * lit(fraction) * col("__n") / col("__sw")) * buckets
    df.crossJoin(broadcast(stats))
      .filter(col(weightCol).isNotNull &&
        bucketFor(df, idCol, seed, buckets) < thr)
      .drop("__n", "__sw")
  }

  /** The DuckDB rendering of [[sampleByWeight]]'s keep rule (numeric
    * ids) — one formula, two engines. */
  def sampleByWeightSql(idExpr: String, weightExpr: String,
                        fraction: Double, seed: Long): String =
    s"$weightExpr IS NOT NULL AND ${hashBucketSql(idExpr, seed, 1000000)} < " +
      s"least(1.0, (($weightExpr * $fraction) * n) / sw) * 1000000"

  /** Balanced output-shard assignment — the WRITE end of a training
    * pipeline: each row gets a `shard` id such that every shard holds
    * ~`shardWeight` total weight (tokens, bytes), in the engine-exact
    * deterministic hash order the samplers and [[budgetCap]] share. Feed
    * the result to a `partitionBy("shard")` writer and the output files
    * are the ~equal-sized training shards a loader wants.
    *
    * Rule: rows totally ordered by (hash(id), id); `shard = ⌊prefix_excl
    * / shardWeight⌋` where prefix_excl is the exclusive running weight
    * sum. Shard k's total is therefore within one max-row-weight of
    * `shardWeight` — the greedy bin fill, same as sequence packing's
    * window variant but over documents. Shard ids run contiguous from 0
    * provided no single row outweighs `shardWeight`; a heavier row's
    * exclusive prefix jumps whole budgets and legitimately skips ids
    * (the property spec pins both regimes). Integer weights keep the cumsum
    * ENGINE-EXACT (no float order sensitivity), which the DuckDB oracle
    * checks value-for-value.
    *
    * Scale shape — a distributed global prefix sum, NOT a global window:
    * a naive `sum over (order by hash)` serializes the corpus through
    * one partition. Instead the hash order is cut into `orderBuckets`
    * contiguous logical ranges (a PREFIX of the total order, so sums
    * compose): (1) a per-bucket windowed cumsum — a normal shuffled
    * window, `orderBuckets` is the parallelism knob; (2) bucket totals →
    * exclusive bucket offsets via one tiny window over `orderBuckets`
    * rows (driver-scale, the only serial step); (3) a broadcast join
    * back. Hash order also means shard membership is NOT stable under
    * corpus growth — shards are a write-time layout, not an identity
    * (use [[splitByHash]] for stable train/val identity). */
  def shardAssign(df: DataFrame, idCol: String, weightCol: String,
                  shardWeight: Long, seed: Long = 0L,
                  orderBuckets: Int = 1024): DataFrame = {
    require(shardWeight > 0, s"shardAssign: shardWeight must be positive, got $shardWeight")
    val buckets = 1000000
    require(orderBuckets > 0 && orderBuckets <= buckets,
      s"shardAssign: orderBuckets must be in [1, $buckets]")
    import org.apache.spark.sql.expressions.Window
    // coarse bucket = a contiguous range of the fine hash order
    // (hb * orderBuckets DIV buckets: hb < 10^6, product < 10^13 — safe)
    val hb = bucketFor(df, idCol, seed, buckets)
    val keyed = df.withColumn("__ghb", hb)
      .withColumn("__gb", expr(s"__ghb * $orderBuckets DIV $buckets"))
    val withinW = Window.partitionBy("__gb").orderBy(col("__ghb"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = keyed.withColumn("__gcum", sum(col(weightCol)).over(withinW))
    // constant-valued partition key (non-foldable, so the optimizer
    // keeps it): the input is ≤ orderBuckets bucket-sum rows —
    // driver-scale by design — and the explicit key documents that in
    // the plan instead of tripping WindowExec's global-window warning
    val offW = Window.partitionBy(pmod(col("__gb"), lit(1))).orderBy("__gb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = cum.groupBy("__gb").agg(sum(col(weightCol)).as("__gbsum"))
      .withColumn("__goff", sum(col("__gbsum")).over(offW) - col("__gbsum"))
      .select("__gb", "__goff")
    cum.join(broadcast(offsets), Seq("__gb"))
      .withColumn("shard",
        expr(s"(__goff + __gcum - $weightCol) DIV $shardWeight"))
      .drop("__ghb", "__gb", "__gcum", "__goff")
  }

  /** The DuckDB rendering of [[shardAssign]]'s rule as a naive global
    * window (fine at oracle scale; the Spark side composes the same sum
    * from bucketed pieces): `(cum_excl) // shardWeight` over the shared
    * hash order. */
  def shardAssignSql(idExpr: String, weightExpr: String, shardWeight: Long,
                     seed: Long): String =
    // outer CAST: DuckDB widens sum(BIGINT) to HUGEINT, which would
    // drift the column dtype away from Spark's long
    s"""CAST((sum($weightExpr) OVER (ORDER BY ${hashBucketSql(idExpr, seed, 1000000)}, $idExpr
       |      ROWS UNBOUNDED PRECEDING) - $weightExpr) // $shardWeight AS BIGINT)""".stripMargin

  def stratifiedSampleByHash(df: DataFrame, idCol: String, stratumCol: String,
                             fractions: Map[String, Double],
                             defaultFraction: Double = 0.0,
                             seed: Long = 0L): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "stratifiedSampleByHash: fractions must be in [0,1]")
    val buckets = 1000000
    val thresh = fractions.foldRight(
      lit(math.round(defaultFraction * buckets))) { case ((k, f), els) =>
      when(col(stratumCol) === k, lit(math.round(f * buckets))).otherwise(els)
    }
    df.filter(bucketFor(df, idCol, seed, buckets) < thresh)
  }
}
