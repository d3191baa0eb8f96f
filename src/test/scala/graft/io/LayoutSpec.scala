package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("clustered layout: disjoint per-file ranges, scans skip non-matching files") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars", "text")
    val clustered = Files.createTempDirectory("graft-lay-c").toString
    val shuffled = Files.createTempDirectory("graft-lay-u").toString
    Layout.clusterBy(docs, Seq("doc_id"), 4).write
      .mode("overwrite").parquet(clustered)
    // anti-layout control: hash-partitioned, every file spans ~everything
    docs.repartition(4, col("text")).write.mode("overwrite").parquet(shuffled)

    // per-file ranges are disjoint under the clustered layout
    val stats = Layout.fileStats(spark, clustered, "doc_id")
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(stats.length == 4)
    stats.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"file ranges overlap: $stats")
    }

    // a point-range scan reads ~1 file of the clustered layout and all
    // files of the control: compare the scans' output row metric
    def scanRows(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("doc_id") < 50)
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val cRows = scanRows(clustered)
    val uRows = scanRows(shuffled)
    // the scan metric counts rows of SURVIVING row groups: the clustered
    // scan decodes ~1 of 4 files, the control decodes everything
    assert(uRows == docs.count(), s"control scan decodes all rows, got $uRows")
    assert(cRows * 2 < uRows, s"clustered scan should skip most files: $cRows vs $uRows")
    // the real discriminator: matching FILES. The clustered layout puts
    // doc_id < 50 in exactly one file's range
    val matching = Layout.fileStats(spark, clustered, "doc_id")
      .count(r => r.getLong(1) < 50)
    assert(matching == 1)
    val matchingU = Layout.fileStats(spark, shuffled, "doc_id")
      .count(r => r.getLong(1) < 50)
    assert(matchingU == 4, "control: every file's range covers the predicate")
  }

  test("zOrderBy keeps locality in EVERY dimension; lexicographic control skips only the leading one") {
    import spark.implicits._
    // a 64×64 grid: both dims uniform, independent — the Z-curve's case
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong, x * 64L + y))).toDF("x", "y", "payload")
    val zDir = Files.createTempDirectory("graft-lay-z").toString
    val lexDir = Files.createTempDirectory("graft-lay-lex").toString
    Layout.zOrderBy(grid, Seq("x", "y"), files = 16, bits = 8).write
      .mode("overwrite").parquet(zDir)
    Layout.clusterBy(grid, Seq("x", "y"), 16).write
      .mode("overwrite").parquet(lexDir)

    // files whose [min, max] of a column overlap a point predicate
    def overlapping(path: String, c: String, v: Long): Int =
      Layout.fileStats(spark, path, c)
        .count(r => r.getLong(1) <= v && v <= r.getLong(2))

    // leading dimension: both layouts skip
    assert(overlapping(zDir, "x", 7) <= 8, "z-order skips on x")
    assert(overlapping(lexDir, "x", 7) <= 2, "lexicographic is best on its leading col")
    // SECOND dimension: the Z-curve still skips (≈ sqrt(files) overlap);
    // the lexicographic layout cannot — every file spans ~all of y
    val zY = overlapping(zDir, "y", 7)
    val lexY = overlapping(lexDir, "y", 7)
    assert(zY <= 8, s"z-order must keep y-locality, $zY of 16 files overlap")
    assert(lexY >= 15, s"control: y-point overlaps ~every file, got $lexY")
    assert(zY * 2 <= lexY, s"z-order second-dim skip must beat control: $zY vs $lexY")

    // the layout is a reordering, never a row change
    assert(spark.read.parquet(zDir).count() == 4096)
    assert(spark.read.parquet(zDir).agg(sum(col("payload"))).head().getLong(0)
      == grid.agg(sum(col("payload"))).head().getLong(0))

    // guards
    intercept[IllegalArgumentException](Layout.zOrderBy(grid, Seq("x"), 4))
    intercept[IllegalArgumentException](Layout.zOrderBy(grid, Seq("x", "y"), 0))
    intercept[IllegalArgumentException](
      Layout.zOrderBy(grid.withColumn("s", lit("a")), Seq("x", "s"), 4))
    intercept[IllegalArgumentException](
      Layout.zOrderBy(grid, Seq("x", "y"), 4, bits = 40))
  }

  test("process CLI exposes the clustered layout via --output-cluster-by") {
    val c = graft.cli.ProcessCli.parseArgs(Array(
      "--input-uri", "x.parquet",
      "--output-cluster-by", "doc_id,lang", "--output-files", "16"))
    assert(c.outputClusterBy == "doc_id,lang" && c.outputFiles == 16)
    val z = graft.cli.ProcessCli.parseArgs(Array(
      "--input-uri", "x.parquet",
      "--output-zorder-by", "x,y", "--output-files", "8"))
    assert(z.outputZorderBy == "x,y" && z.outputFiles == 8)
  }
}
