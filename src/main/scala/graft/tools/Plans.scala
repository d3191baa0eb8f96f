package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: print `explain("formatted")` for registered
  * queries and flag anti-patterns (cartesian products outside the
  * documented all-pairs baseline, missing broadcast on dim joins).
  *
  * Usage: runMain graft.tools.Plans <sfDir> [query ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q2_join_agg", "dedup_minhash_pairs", "dedup_survivors",
        "dedup_simhash_pairs", "ann_topk", "ann_lsh_topk", "ann_ivf_topk",
        "filter_eq", "tile_hist")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-plans")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // materialize THIS dataframe's own QueryExecution (df.count() would
      // plan and run a separate aggregate tree, leaving df's adaptive
      // plan un-finalized — with no stages and no codegen spans to count)
      df.queryExecution.toRdd.count()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n======== $n ========")
      println(formatted)
      val cartesian = formatted.contains("CartesianProduct") ||
        formatted.contains("BroadcastNestedLoopJoin")
      val broadcast = formatted.contains("BroadcastHashJoin")
      // count codegen spans on the EXECUTED plan tree: under Spark 4 AQE
      // the formatted string no longer carries per-span `codegen id`
      // markers for materialized stages, so the old regex always read 0 —
      // walk through the adaptive wrapper and stage nodes instead
      val codegen = countCodegen(df.queryExecution.executedPlan)
      println(s"[audit] $n: cartesian=$cartesian broadcastHash=$broadcast " +
        s"codegenStages=$codegen")
    }
    spark.stop()
  }

  private def countCodegen(p: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.{WholeStageCodegenExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(node: SparkPlan): Int = node match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case w: WholeStageCodegenExec => 1 + w.children.map(walk).sum
      case other                    => other.children.map(walk).sum
    }
    walk(p)
  }
}

/** `runMain graft.tools.PlanLint <sfDir>` — sweep EVERY registered
  * query's physical plan for scale anti-patterns: any CartesianProduct
  * fails; BroadcastNestedLoopJoin fails unless the query is on the
  * documented allowlist (the broadcast interval-join path and the
  * one-row scalar-stats cross joins — shapes that are nested-loop BY
  * DESIGN over broadcast-small sides). Plans only — nothing executes
  * except the eager index builds some ANN query constructors run. Exit
  * 1 on any violation: the CI-able guard that a new query can't quietly
  * reintroduce an all-pairs plan. */
object PlanLint {
  // BNLJ-by-design: broadcast interval joins (dim-sized right side) and
  // one-row scalar-stat cross joins (the quantile_filter shape)
  private val bnljAllowed = Set(
    "range_join_bands", "pipeline_event_features",
    "quantile_filter", "feature_scaling", "doclen_quantiles_approx",
    "lm_xent", "lm_bigram_xent", "dfl_lm_score", "dfl_lm_bigram",
    "lm_kn_xent", "dfl_lm_kn", "lm_kn3_xent", "dfl_lm_kn3",
    "tfidf_top", "collocations", "temperature_mix",
    "pipeline_train_corpus", "pipeline_tokenized_corpus",
    "pipeline_clean_corpus", "pipeline_incremental_ingest",
    "dfl_scale", "pipeline_perplexity_filter", "weighted_sample",
    // the DSIR totals (ns, nt) are a one-row scalar-stat cross join, the
    // same shape as the LM family above
    "dsir_scores", "dsir_sample", "dfl_dsir", "pipeline_curation",
    "dfl_dsir_serve",
    // the planted-spam branch's literal source folds the anti-join
    // condition into a build-side filter + LocalLimit(1) existence
    // probe — a ≤1-row broadcast BNLJ by constant-folding, not a scan
    // pairing (the organic branch keeps its hash anti-join)
    "source_filtered", "dfl_source_filter",
    // BM25's corpus scalars (N, avgdl) are the same one-row broadcast
    // cross-join shape as the LM family; the eval rows inherit it from
    // their batch-BM25 run input
    "bm25_topk", "bm25_batch", "dfl_bm25", "rrf_fuse",
    "pipeline_hybrid_retrieval", "retrieval_eval", "dfl_rank_eval",
    "retrieval_eval_macro")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-planlint")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name)
        if (cartesian || bnlj) {
          bad += 1
          println(s"[planlint] FAIL $name: cartesian=$cartesian " +
            s"unallowlisted-bnlj=$bnlj")
        }
      } catch { case e: Throwable =>
        bad += 1
        println(s"[planlint] ERROR $name: ${e.getMessage}")
      }
    }
    println(s"[planlint] ${if (bad == 0) "CLEAN" else s"$bad violations"} " +
      s"over ${graft.SparkEntry.queries.size} queries")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
