package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity: run the near-dup pipeline at 1×/4×/20× the sf0.1 corpus
  * (ids shifted per copy so copies are near-dup pairs of each other) and
  * print wall times. Candidate counts grow with planted dup multiplicity,
  * so superlinear-but-bounded growth is expected; an all-pairs regression
  * would blow up immediately (20× data → 400× pairs).
  *
  * Usage: runMain graft.tools.ScaleCheck [sfDir]
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.count()
    Seq(1, 4, 20).foreach { mult =>
      val big = (0 until mult).map(i =>
        docs.select((col("doc_id") + lit(i.toLong * base * 10)).as("doc_id"),
          col("text"))).reduce(_ union _)
      big.persist().count()
      def time(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime(); val n = f
        println(f"[scale] mult=$mult%-3d $name%-16s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      }
      time("exact")(graft.llm.Dedup.exact(big, "doc_id", "text").count())
      time("minhash_pairs")(graft.llm.Dedup.minhashPairs(big, "doc_id", "text", 0.8).count())
      time("simhash_pairs")(graft.llm.Dedup.simhashPairs(big, "doc_id", "text", 3).count())
      time("jaccard_pairs")(graft.llm.Dedup.jaccardPairs(big, "doc_id", "text", 0.8).count())
      // skew probe: ONE boilerplate sentence appended to EVERY document.
      // Its shingles have df = corpus size; without the df-cap the
      // inverted join would emit df²/2 rows on each of those keys
      // (mult=20 ⇒ ~5·10⁹ rows from 5 keys); with the cap, runtime must
      // track the planted-dup pair count like the uncontaminated run
      val boiler = big.select(col("doc_id"),
        concat(col("text"), lit(" all rights reserved by the original author")).as("text"))
      time("jaccard_boiler")(graft.llm.Dedup.jaccardPairs(boiler, "doc_id", "text", 0.8).count())
      big.unpersist()
    }
    spark.stop()
  }
}
