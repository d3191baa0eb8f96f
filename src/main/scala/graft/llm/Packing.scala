package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM pretraining: assign documents to fixed-length
  * training sequences so short documents share a context window instead of
  * wasting it on padding. Two deterministic strategies:
  *
  *  - [[packSequential]] — GPT-style "concatenate then split": documents
  *    are laid end-to-end in id order and the stream is cut every `seqLen`
  *    tokens, so documents may straddle sequence boundaries. Pure window
  *    arithmetic → exactly reproducible in ANSI SQL (the DuckDB oracle
  *    checks it value-for-value).
  *  - [[packGreedy]] — boundary-respecting "next-fit": a document never
  *    splits across sequences; when the open pack lacks room the pack is
  *    closed and a new one starts (an oversized document gets a pack of
  *    its own). The running-state scan is not window-expressible, so this
  *    one is spec-checked by invariants (capacity, completeness,
  *    determinism) rather than a SQL oracle.
  *
  * Scale shape: both strategies bucket the corpus by a deterministic id
  * hash ([[Sampling.hashBucket]]) and pack WITHIN each bucket — the
  * window / running scan is per-bucket, so the work parallelizes across
  * `buckets` independent streams and no single global sort or
  * single-partition window ever forms. At 100 TB you raise `buckets`
  * (each bucket is corpus/buckets tokens); packing quality is unaffected
  * because any fixed corpus order is as arbitrary as any other. The
  * output is an assignment table (id → bucket/sequence/offset), which
  * downstream joins back to the tokens — emitting assignments instead of
  * materialized concatenated sequences keeps this operator shuffle-light
  * (one repartition by bucket).
  */
object Packing {

  /** Concat-then-split packing: documents ordered by id within their
    * bucket; `seq_ix` is the sequence in which the document STARTS and
    * `offset` its token offset inside that sequence (a document with
    * `offset + n_tok > seqLen` continues into the next sequence(s) —
    * the standard pretraining layout where boundaries fall mid-document).
    *
    * Output: (id, bucket, n_tok, seq_ix, offset), one row per input row.
    * All integer arithmetic — engine-exact. */
  def packSequential(df: DataFrame, idCol: String, textCol: String,
                     seqLen: Int, buckets: Int = 32, seed: Long = 9L)
      : DataFrame = {
    require(seqLen > 0, s"packSequential: seqLen must be positive, got $seqLen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol),
        TextAnalysis.tokenCountWs(col(textCol)).cast("long").as("n_tok"),
        Sampling.hashBucket(col(idCol), seed, buckets).as("bucket"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col(idCol), col("bucket"), col("n_tok"),
        (col("cum_before") / seqLen).cast("long").as("seq_ix"),
        (col("cum_before") % seqLen).as("offset"))
  }

  /** The SQL rendering of [[packSequential]] for the DuckDB oracle —
    * kept HERE next to the implementation so the two formulas can only
    * drift in one file. */
  def packSequentialSql(table: String, idCol: String, textCol: String,
                        seqLen: Int, buckets: Int = 32, seed: Long = 9L,
                        idAs: String = ""): String = {
    val bucket = Sampling.hashBucketSql(idCol, seed, buckets)
    // DuckDB rejects WITH inside a derived table, so callers that need
    // the id under a different output name (the DFL stage contract
    // renames it to `id`) alias it HERE rather than wrapping the query
    val idOut = if (idAs.isEmpty) idCol else s"$idCol AS $idAs"
    s"""WITH b AS (
       |  SELECT $idCol, CAST(len(string_split($textCol, ' ')) AS BIGINT) AS n_tok,
       |         $bucket AS bucket
       |    FROM $table),
       |c AS (
       |  SELECT *, coalesce(sum(n_tok) OVER (
       |           PARTITION BY bucket ORDER BY $idCol
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |    FROM b)
       |SELECT $idOut, bucket, n_tok,
       |       CAST(floor(cum_before / $seqLen.0) AS BIGINT) AS seq_ix,
       |       CAST(cum_before % $seqLen AS BIGINT) AS offset
       |  FROM c""".stripMargin
  }
  // NB the offset cast above is load-bearing for the oracle compare:
  // DuckDB's windowed sum(BIGINT) is HUGEINT, which pandas renders as
  // float64 — an int64 Spark column then hash-mismatches on "30" vs "30.0"
  // even though every value is equal.

  /** The SQL rendering of [[packGreedy]] for the DuckDB oracle. The
    * next-fit running state is not window-expressible, but it IS a
    * recursive CTE: step `rn` of the recursion carries (pack_ix, used)
    * for every bucket's rn-th document at once, so the recursion depth
    * is max-rows-per-bucket, not corpus size. */
  def packGreedySql(table: String, idCol: String, textCol: String,
                    cap: Int, buckets: Int = 32, seed: Long = 9L): String = {
    val bucket = Sampling.hashBucketSql(idCol, seed, buckets)
    s"""WITH RECURSIVE b AS (
       |  SELECT CAST($idCol AS BIGINT) AS id,
       |         CAST(len(string_split($textCol, ' ')) AS BIGINT) AS n_tok,
       |         $bucket AS bucket,
       |         row_number() OVER (PARTITION BY $bucket ORDER BY $idCol) AS rn
       |    FROM $table),
       |r AS (
       |  SELECT id, bucket, n_tok, rn,
       |         CAST(0 AS BIGINT) AS pack_ix, CAST(0 AS BIGINT) AS "offset",
       |         n_tok AS used
       |    FROM b WHERE rn = 1
       |  UNION ALL
       |  SELECT b.id, b.bucket, b.n_tok, b.rn,
       |         CASE WHEN r.used + b.n_tok <= $cap THEN r.pack_ix
       |              ELSE r.pack_ix + 1 END,
       |         CASE WHEN r.used + b.n_tok <= $cap THEN r.used
       |              ELSE CAST(0 AS BIGINT) END,
       |         CASE WHEN r.used + b.n_tok <= $cap THEN r.used + b.n_tok
       |              ELSE b.n_tok END
       |    FROM r JOIN b ON b.bucket = r.bucket AND b.rn = r.rn + 1)
       |SELECT id AS $idCol, bucket, n_tok, pack_ix, "offset" AS offset
       |  FROM r""".stripMargin
  }

  /** Boundary-respecting next-fit packing: within each bucket, documents
    * in id order go into the open pack while they fit (`used + n_tok <=
    * cap`); otherwise the pack closes and a new one opens. A document
    * longer than `cap` occupies a pack alone (callers chunk oversized
    * docs first — [[TextAnalysis.chunkTokens]] — if that matters).
    *
    * Output: (id, bucket, n_tok, pack_ix, offset) where `offset` is the
    * token offset inside the pack (== pack fill before this doc).
    *
    * Implementation: repartition by bucket, sort within partitions by
    * (bucket, id), one stateful pass per partition. Each partition holds
    * whole buckets (hash partitioning on the bucket column), so the
    * running state resets exactly at bucket changes and the result is
    * independent of which partition a bucket lands on — deterministic at
    * any parallelism. */
  def packGreedy(df: DataFrame, idCol: String, textCol: String,
                 cap: Int, buckets: Int = 32, seed: Long = 9L): DataFrame = {
    require(cap > 0, s"packGreedy: cap must be positive, got $cap")
    val spark = df.sparkSession
    val prepped = df
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokenCountWs(col(textCol)).cast("long").as("n_tok"),
        Sampling.hashBucket(col(idCol), seed, buckets).as("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("id"))
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("bucket", LongType, nullable = false),
      StructField("n_tok", LongType, nullable = false),
      StructField("pack_ix", LongType, nullable = false),
      StructField("offset", LongType, nullable = false)))
    val packed = prepped.rdd.mapPartitions { rows =>
      var curBucket = Long.MinValue
      var packIx = -1L
      var used = 0L
      rows.map { r =>
        val id = r.getLong(0); val nTok = r.getLong(1); val bucket = r.getLong(2)
        if (bucket != curBucket) { curBucket = bucket; packIx = -1L; used = 0L }
        if (packIx < 0 || used + nTok > cap) { packIx += 1; used = 0L }
        val offset = used
        used += nTok
        Row(id, bucket, nTok, packIx, offset)
      }
    }
    spark.createDataFrame(packed, outSchema)
      .withColumnRenamed("id", idCol)
  }
}
