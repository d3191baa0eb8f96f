package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.dfl.DflFrame
import graft.io.DataStoreIO
import java.nio.file.Files

/** SURVEY.md §5.5: the same DFL pipeline in batch and stream mode must
  * agree (the reference guarantees this by sharing processObject,
  * cli/process.go:114-127). */
class StreamParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pipelineSrc =
    """filter(@, "(@amenity == bar) and (@name != null)") |
      |map(@, "{name: @name, tx: tileX(@lon, 8)}")""".stripMargin

  test("batch and stream runs of one DFL pipeline agree") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val rows = Seq(
      """{"amenity":"bar","name":"A","lon":-77.1}""",
      """{"amenity":"bar","name":"B","lon":10.5}""",
      """{"amenity":"cafe","name":"C","lon":3.0}""",
      """{"amenity":"bar","name":null,"lon":4.0}""",
    )
    Files.writeString(java.nio.file.Paths.get(s"$dir/part1.json"),
      rows.take(2).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/part2.json"),
      rows.drop(2).mkString("\n"))

    val batch = DflFrame.pipeline(spark.read.json(dir), pipelineSrc)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val stream = StreamRunner.runOnce(spark, dir, "jsonl", pipelineSrc)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(batch == stream)
    assert(batch == Set(("A", 73L), ("B", 135L)))
  }

  test("unstreamable formats and operators are rejected") {
    intercept[IllegalArgumentException] {
      StreamRunner.validateStreamable("json", "filter(@, '@a == 1')")
    }
    intercept[IllegalArgumentException] {
      StreamRunner.validateStreamable("jsonl", "sort(@) | limit(@, 5)")
    }
  }

  test("ProcessCli batch run: csv in, dfl, collect out") {
    val dir = Files.createTempDirectory("graft-cli").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "name,qty\nalpha,5\nbeta,50\n")
    val cfg = graft.cli.ProcessCli.parseArgs(Array(
      "--input-uri", s"$dir/in.csv",
      "--dfl", "filter(@, '@qty > 10') | map(@, '@name')"))
    val out = graft.cli.ProcessCli.run(spark, cfg)
    assert(out.as[String].collect().toSeq == Seq("beta"))
  }

  test("ProcessCli dynamic output via DataStoreIO write") {
    val dir = Files.createTempDirectory("graft-cli2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.jsonl"),
      """{"a":1,"b":"x"}
        |{"a":2,"b":"y"}""".stripMargin)
    val cfg = graft.cli.ProcessCli.parseArgs(Array(
      "--input-uri", s"$dir/in.jsonl",
      "--dfl", "filter(@, '@a > 1')",
      "--output-uri", s"$dir/out.jsonl"))
    val out = graft.cli.ProcessCli.run(spark, cfg)
    DataStoreIO.write(out, s"$dir/out.jsonl")
    assert(spark.read.json(s"$dir/out.jsonl").count() == 1)
  }
}
