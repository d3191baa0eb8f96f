package graft.cli

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import java.nio.file.{Files, Paths}

class ConvertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("jsonl -> yaml -> jsonl round-trips byte-equal") {
    val dir = Files.createTempDirectory("graft-conv").toString
    // alphabetical keys + stable types: json schema inference orders
    // fields alphabetically, so a canonical input survives byte-for-byte
    val lines = Seq(
      """{"amenity":"bar","id":1,"name":"dc1"}""",
      """{"amenity":"cafe","id":2,"name":"dc2"}""",
    )
    Files.writeString(Paths.get(s"$dir/in.jsonl"), lines.mkString("\n"))

    ConvertCli.convert(spark, ConvertCli.Config(
      inputUri = s"$dir/in.jsonl", outputUri = s"$dir/mid.yaml",
      outputFormat = "yaml"))
    assert(Files.readString(Paths.get(s"$dir/mid.yaml")).contains("amenity: bar"))

    ConvertCli.convert(spark, ConvertCli.Config(
      inputUri = s"$dir/mid.yaml", outputUri = s"$dir/out", outputFormat = "jsonl"))
    val out = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .flatMap(f => Files.readString(f.toPath).linesIterator)
      .filter(_.nonEmpty).toSeq.sorted
    assert(out == lines.sorted)
  }

  test("csv with header converts to jsonl with typed columns") {
    val dir = Files.createTempDirectory("graft-conv2").toString
    Files.writeString(Paths.get(s"$dir/in.csv"), "id,name\n1,ada\n2,linus\n")
    ConvertCli.convert(spark, ConvertCli.Config(
      inputUri = s"$dir/in.csv", outputUri = s"$dir/out", outputFormat = "jsonl"))
    val out = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("part-"))
      .flatMap(f => Files.readString(f.toPath).linesIterator).toSeq.sorted
    assert(out == Seq("""{"id":1,"name":"ada"}""", """{"id":2,"name":"linus"}"""))
  }

  test("unknown flag and missing stdout format are rejected") {
    intercept[IllegalArgumentException](ConvertCli.parseArgs(Array("--nope")))
    intercept[IllegalArgumentException](
      ConvertCli.convert(spark, ConvertCli.Config(inputUri = "x.jsonl")))
  }

  test("a trailing flag without its value is rejected across the shared Argv parsers") {
    // each parser gets one of ITS OWN value-taking flags dangling at the
    // end of the line, so every case exercises Argv.value()'s bounds
    // check (a foreign flag would fail as 'unknown' before reaching it)
    val cases = Seq[(Array[String] => Any, String)](
      (ConvertCli.parseArgs, "--input-uri"),
      (ProcessCli.parseArgs, "--input-uri"),
      (IngestCli.parseArgs, "--index-dir"),
      (ServeCli.parseArgs, "--index-dir"))
    cases.foreach { case (parse, flag) =>
      val e = intercept[IllegalArgumentException](parse(Array(flag)))
      assert(e.getMessage.contains(s"$flag requires a value"), e.getMessage)
    }
    // the exact shape that used to crash ProcessCli with a raw
    // ArrayIndexOutOfBounds
    val e = intercept[IllegalArgumentException](
      ProcessCli.parseArgs(Array("--input-uri", "x", "--dfl")))
    assert(e.getMessage.contains("--dfl requires a value"))
    // and the empty-value guard ConvertCli already had, now shared
    intercept[IllegalArgumentException](
      ProcessCli.parseArgs(Array("--input-uri", "x", "--input-comment", "")))
  }
}
