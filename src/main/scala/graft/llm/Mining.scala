package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive-training data mining — the step between a curated corpus
  * and an embedding-model fine-tune: for every query, the top-k most
  * similar corpus items that are NOT its labeled positives ("hard
  * negatives" — RocketQA/ANCE-style). Built from the same one-pass
  * batched scoring scan as [[Similarity.bruteForceTopKBatch]] (native
  * MatVecDots, query matrix as chunked plan literals, bounded-heap
  * top-k with map-side partials); the positive set subtracts via one
  * BROADCAST anti-join between the scored stream and the (small,
  * per-query) label table — before the heap, so excluded items can
  * never eat result slots, and nothing about the scan's
  * no-window/no-global-sort scale shape changes. */
object Mining {

  /** `(qid, id, cos, rank)` — per query, the `k` best-scoring corpus
    * rows by cosine with `(qid, pos_id)` pairs from `positives`
    * excluded (label your self-match as a positive to exclude it).
    * `rank` is 1-based within qid (cos desc, id asc — the SQL
    * row_number tie order). `positives` must be broadcast-small: it is
    * a LABEL table (queries × a handful of labeled positives), not a
    * corpus. */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String,
                    queries: Seq[(Long, Seq[Double])], positives: DataFrame,
                    k: Int, chunkSize: Int = 256): DataFrame = {
    import graft.functions.{MatVecF, TopKF, VectorF}
    require(k > 0, s"hardNegatives: k must be positive, got $k")
    require(chunkSize > 0, "hardNegatives: chunkSize must be positive")
    if (queries.size > chunkSize)
      return queries.grouped(chunkSize)
        .map(c => hardNegatives(corpus, idCol, vecCol, c, positives, k, chunkSize))
        .reduce(_ unionByName _)
    val qNorms = queries.map { case (_, q) => math.sqrt(q.map(x => x * x).sum) }
    val qIds = queries.map(_._1)
    val pos = positives.select(col(positives.columns(0)).as("__pqid"),
      col(positives.columns(1)).as("__pid"))
    val scored = corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("vnorm", VectorF.norm(col("v")))
      .filter(col("vnorm").isNotNull && !isnan(col("vnorm")) && col("vnorm") > 0)
      .select(col("id"), col("vnorm"),
        posexplode(MatVecF.dots(col("v"), queries.map(_._2))))
      .select(element_at(array(qIds.map(lit): _*), col("pos") + 1).as("qid"),
        round(col("col") / (col("vnorm") *
          element_at(array(qNorms.map(lit): _*), col("pos") + 1)), 6).as("cos"),
        col("id"))
      .filter(col("cos").isNotNull && !isnan(col("cos")))
      // the label subtraction: map-side broadcast anti-join, BEFORE the
      // heap so a positive can never occupy a negative's slot
      .join(broadcast(pos),
        col("qid") === col("__pqid") && col("id") === col("__pid"),
        "left_anti")
    scored
      .groupBy("qid")
      .agg(TopKF.topKByScore(col("cos"), col("id"), k).as("topk"))
      .select(col("qid"), posexplode(col("topk")).as(Seq("r", "hit")))
      .select(col("qid"), col("hit.id").as("id"), col("hit.score").as("cos"),
        (col("r") + 1).cast("long").as("rank"))
  }
}
