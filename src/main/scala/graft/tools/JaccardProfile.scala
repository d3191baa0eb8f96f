package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Stage-by-stage wall-time breakdown of [[graft.llm.Dedup.jaccardPairs]]
  * at a given duplicate multiplicity — a diagnostic for where the
  * prefix-filtered PPJoin spends its time at high dup multiplicity.
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

    import org.apache.spark.sql.expressions.Window
    val threshold = 0.8
    val maxDocFreq = 1000L
    val sh = graft.llm.Dedup.shingleDf(big, "doc_id", "text", 3)
    time("shingleDf")(sh.count())
    sh.persist().count()
    val ex = sh.select(col("id"), explode(col("hs")).as("h"))
    time("explode")(ex.count())
    val dfh = ex.groupBy("h").agg(count(lit(1)).as("dfh"))
    time("dfh_agg")(dfh.count())
    val capped = ex.join(dfh, "h").filter(col("dfh") <= maxDocFreq)
    time("dfh_join")(capped.count())
    val w = Window.partitionBy("id").orderBy("dfh", "h")
    val exploded = capped
      .withColumn("rn", row_number().over(w))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("id")))
      .filter(col("rn") <= col("sz") - ceil(col("sz") * threshold - 1e-9) + 1)
      .select("id", "h", "rn", "sz")
    time("prefix_window")(exploded.count())
    val buckets = exploded.groupBy("h")
      .agg(collect_list(struct(col("id"), col("rn"), col("sz"))).as("xs"))
      .filter(size(col("xs")) >= 2)
    time("buckets")(buckets.count())
    val needed = (col("a.sz") + col("b.sz")).cast(DoubleType) *
      lit(threshold / (1.0 + threshold))
    val cands = buckets
      .select(explode(col("xs")).as("a"), col("xs"))
      .select(col("a"), explode(col("xs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .filter(greatest(col("a.sz"), col("b.sz")).cast(DoubleType) * threshold
        <= least(col("a.sz"), col("b.sz")).cast(DoubleType) + 1e-9)
      .filter(lit(1.0) +
        least(col("a.sz") - col("a.rn"), col("b.sz") - col("b.rn")).cast(DoubleType)
        >= needed - 1e-9)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .select("id_a", "id_b")
    time("cands")(cands.count())
    val withSh = cands
      .join(sh.select(col("id").as("id_a"), col("hs").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("hs").as("sh_b")), "id_b")
      .filter(greatest(size(col("sh_a")), size(col("sh_b"))).cast(DoubleType) * threshold
        <= least(size(col("sh_a")), size(col("sh_b"))).cast(DoubleType) + 1e-9)
    val inter = graft.functions.SortedIntersectF
      .count(col("sh_a"), col("sh_b")).cast(DoubleType)
    val union = (size(col("sh_a")) + size(col("sh_b"))).cast(DoubleType) - inter
    val out = withSh
      .withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    time("verify_total")(out.count())
    time("end_to_end")(graft.llm.Dedup.jaccardPairs(big, "doc_id", "text", 0.8).count())
    spark.stop()
  }
}
