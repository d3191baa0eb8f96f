package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-time breakdown of [[graft.llm.Dedup.jaccardPairs]]
  * at a given duplicate multiplicity — a diagnostic for where the
  * prefix-filtered PPJoin spends its time at high dup multiplicity.
  *
  * Times the REAL pipeline intermediates exposed by
  * [[graft.llm.Dedup.jaccardStages]] — never an inlined copy, so the
  * profile cannot drift from the operator it profiles.
  *
  * Usage: runMain graft.tools.JaccardProfile [mult] [sfDir]
  */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-jaccard-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.count()
    val big = (0 until mult).map(i =>
      docs.select((col("doc_id") + lit(i.toLong * base * 10)).as("doc_id"),
        col("text"))).reduce(_ union _)
    big.persist().count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val st = graft.llm.Dedup.jaccardStages(big, "doc_id", "text", 0.8)
    time("shingleDf")(st.sh.count())
    // persist the shingle table: downstream stage timings then measure the
    // stage itself, not a recompute of shingling (cache lookup is by plan
    // fragment, so every stage df below hits this cache)
    st.sh.persist().count()
    time("explode")(st.exploded.count())
    time("dfh_agg")(st.dfh.count())
    time("dfh_join")(st.capped.count())
    time("prefix_window")(st.prefixes.count())
    time("buckets")(st.buckets.count())
    time("cands")(st.cands.count())
    time("verify_total")(st.pairs.count())
    time("end_to_end")(graft.llm.Dedup.jaccardPairs(big, "doc_id", "text", 0.8).count())
    spark.stop()
  }
}
