package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): choose source documents whose hashed-n-gram
  * distribution resembles a (small) TARGET domain, by importance weight
  * under two bag-of-n-grams language models:
  *
  *   log w(doc) = Σ_b count_doc[b] · (log p_target[b] − log p_source[b])
  *
  * over `buckets` hashed features (unigrams + bigrams, the paper's
  * feature space), with add-one smoothing on both models. Resampling
  * adds per-document Gumbel noise to the log-weight and takes the
  * global top-k — the standard Gumbel-top-k trick for sampling without
  * replacement ∝ w (Vieira '14), made DETERMINISTIC here by deriving
  * the uniform from the id's md5 bucket, so the selected set replays
  * bit-identically in DuckDB and across cluster sizes.
  *
  * Scale shape: the target is small by definition — its bucket counts
  * aggregate to ≤ `buckets` rows; the source-side gram explode feeds a
  * map-side-combined (id, bucket) count; the only joins are against the
  * ≤ `buckets`-row ratio table (broadcast). Scoring a 100 TB corpus is
  * one scan-explode-aggregate plus a broadcast join; the top-k plans as
  * TakeOrderedAndProject. No collect, no driver state. */
object Dsir {

  /** One (id, gram) row per unigram AND adjacent bigram of the
    * normalized text — the DSIR feature space. Bigrams come from two
    * codegen'd slices + arrays_zip (never a higher-order transform).
    * NOTE (round-21 measurement): a single-scan form (zip each token
    * with its null-padded successor, emit 1-2 grams per position
    * through a second Generate) was tried and REVERTED — the per-row
    * struct+array allocation cost more than the second map-only scan
    * it saved; the two branches here are simple explodes that overlap. */
  private def gramRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.wsTokens(TextAnalysis.normText(col(textCol)))
    val uni = df.select(col(idCol).as("id"), explode(toks).as("gram"))
    val bi = df.filter(size(toks) >= 2)
      .select(col(idCol).as("id"), explode(arrays_zip(
        slice(toks, lit(1), size(toks) - 1).as("p"),
        slice(toks, lit(2), size(toks) - 1).as("w"))).as("bg"))
      .select(col("id"), concat(col("bg.p"), lit(" "), col("bg.w")).as("gram"))
    uni.unionByName(bi)
  }

  private def bucketed(df: DataFrame, idCol: String, textCol: String,
                       buckets: Int, seed: Long): DataFrame =
    gramRows(df, idCol, textCol)
      .select(col("id"), Sampling.hashBucketStr(col("gram"), seed, buckets).as("b"))

  /** Target-side buckets: the target LM needs gram counts only — no id
    * column is required of the target corpus. */
  private def bucketedAnon(df: DataFrame, textCol: String,
                           buckets: Int, seed: Long): DataFrame = {
    val toks = TextAnalysis.wsTokens(TextAnalysis.normText(col(textCol)))
    val uni = df.select(explode(toks).as("gram"))
    val bi = df.filter(size(toks) >= 2)
      .select(explode(arrays_zip(
        slice(toks, lit(1), size(toks) - 1).as("p"),
        slice(toks, lit(2), size(toks) - 1).as("w"))).as("bg"))
      .select(concat(col("bg.p"), lit(" "), col("bg.w")).as("gram"))
    uni.unionByName(bi)
      .select(Sampling.hashBucketStr(col("gram"), seed, buckets).as("b"))
  }

  /** Train the DSIR model: the per-bucket log-ratio table `(b, lr)` —
    * add-one smoothed on both sides, COMPLETE over all `buckets` rows
    * (unseen-in-source buckets carry the OOV ratio), so the frozen table
    * scores corpora the training source never saw (the
    * train-batch/serve-stream split). ≤ `buckets` rows — persist it as
    * a parquet sidecar, broadcast it at scoring time. */
  def fit(source: DataFrame, target: DataFrame, textCol: String,
          buckets: Int = 1024, seed: Long = 7L): DataFrame = {
    require(buckets > 0, s"Dsir.fit: buckets must be positive, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val spark = source.sparkSession
    val cs = bucketedAnon(source, textCol, buckets, seed)
      .groupBy("b").agg(count(lit(1)).as("cs"))
    val ct = bucketedAnon(target, textCol, buckets, seed)
      .groupBy("b").agg(count(lit(1)).as("ct"))
    // totals as ONE window over the complete ≤`buckets`-row table (the
    // shardAssign constant-key idiom — non-foldable, driver-scale input
    // by design) instead of the former crossJoin of two scalar
    // aggregates: that shape re-planned — and, with AQE declining to
    // reuse the union'd gram stages, re-EXECUTED — the full gram
    // explode+aggregate of each corpus side a second time (8 corpus
    // scans / 32 exchanges for one dsir_scores; guide §2.4). Missing
    // buckets join as 0 and add nothing, so the window sums equal the
    // old per-side totals exactly (empty corpora included: ns = 0).
    val w = Window.partitionBy(pmod(col("b"), lit(1)))
    spark.range(buckets).select(col("id").as("b"))
      .join(cs, Seq("b"), "left").na.fill(0L, Seq("cs"))
      .join(ct, Seq("b"), "left").na.fill(0L, Seq("ct"))
      .select(col("b"), col("cs"), col("ct"),
        sum(col("cs")).over(w).as("ns"), sum(col("ct")).over(w).as("nt"))
      .select(col("b"),
        (log((col("ct") + 1.0) / (col("nt") + buckets.toLong)) -
         log((col("cs") + 1.0) / (col("ns") + buckets.toLong))).as("lr"))
  }

  /** Score a corpus against a frozen [[fit]] table: one gram explode →
    * map-side-combined (id, bucket) count → broadcast join → per-doc
    * sum. Works identically on a static frame or a streaming
    * micro-batch (row-local + broadcast only — no whole-corpus state). */
  def scoreWith(df: DataFrame, idCol: String, textCol: String,
                ratio: DataFrame, buckets: Int = 1024,
                seed: Long = 7L): DataFrame =
    bucketed(df, idCol, textCol, buckets, seed)
      .groupBy("id", "b").agg(count(lit(1)).as("tf"))
      .join(broadcast(ratio), "b")
      .groupBy("id")
      .agg(round(sum(col("tf") * col("lr")), 6).as("dsir"))

  /** Per-document DSIR log importance weight `(id, dsir)` of every
    * source row, target-vs-source (trains on the scored corpus itself —
    * the one-shot shape; use [[fit]]/[[scoreWith]] to train once and
    * serve many). Higher = more target-like. */
  def dsirScores(source: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int = 1024,
                 seed: Long = 7L): DataFrame =
    scoreWith(source, idCol, textCol,
      fit(source, target, textCol, buckets, seed), buckets, seed)

  /** The deterministic Gumbel perturbation: `g = −ln(−ln(u))` with
    * `u = (md5bucket(id) + 0.5) / 2²⁰` — uniform enough for resampling,
    * exactly replayable in SQL. */
  private def gumbel(id: Column, gumbelSeed: Long): Column = {
    val u = (Sampling.hashBucketStr(id.cast("string"), gumbelSeed, 1 << 20)
      .cast("double") + 0.5) / (1 << 20).toDouble
    -log(-log(u))
  }

  /** Gumbel-top-k resample: the `k` source documents with the largest
    * `dsir + gumbel` key (rounded to 6, ties broken by id — the set is
    * engine-exact). Plans as TakeOrderedAndProject over the score
    * output. */
  def dsirResample(source: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, k: Int, buckets: Int = 1024,
                   seed: Long = 7L, gumbelSeed: Long = 11L): DataFrame = {
    require(k > 0, s"dsirResample: k must be positive, got $k")
    dsirScores(source, target, idCol, textCol, buckets, seed)
      .select(col("id"),
        round(col("dsir") + gumbel(col("id"), gumbelSeed), 6).as("key"))
      .orderBy(col("key").desc, col("id").asc)
      .limit(k)
  }
}
