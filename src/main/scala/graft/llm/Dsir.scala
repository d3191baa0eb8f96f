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
    * codegen'd slices + arrays_zip (never a higher-order transform). */
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

  /** Per-document DSIR log importance weight `(id, dsir)` of every
    * source row, target-vs-source. Higher = more target-like. */
  def dsirScores(source: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int = 1024,
                 seed: Long = 7L): DataFrame = {
    require(buckets > 0, s"dsirScores: buckets must be positive, got $buckets")
    val sb = bucketed(source, idCol, textCol, buckets, seed)
    val tb = bucketedAnon(target, textCol, buckets, seed)
    val cs = sb.groupBy("b").agg(count(lit(1)).as("cs"))
    val ct = tb.groupBy("b").agg(count(lit(1)).as("ct"))
    val tot = cs.agg(sum(col("cs")).as("ns"))
      .crossJoin(tb.agg(count(lit(1)).as("nt")))
    // log-ratio per bucket, add-one smoothed on both sides; only buckets
    // that occur in the SOURCE matter (a source doc's grams are a subset
    // of the source universe by construction)
    val ratio = cs.join(ct, Seq("b"), "left").na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("ct") + 1.0) / (col("nt") + buckets.toLong)) -
         log((col("cs") + 1.0) / (col("ns") + buckets.toLong))).as("lr"))
    sb.groupBy("id", "b").agg(count(lit(1)).as("tf"))
      .join(broadcast(ratio), "b")
      .groupBy("id")
      .agg(round(sum(col("tf") * col("lr")), 6).as("dsir"))
  }

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
