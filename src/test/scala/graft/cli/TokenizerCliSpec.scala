package graft.cli

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TokenizerCliSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpusDir(): String = {
    val d = Files.createTempDirectory("graft-tokcli").toString
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(6)("newest") ++
      Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w + " " + w) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/corpus")
    s"$d/corpus"
  }

  test("train persists each method under its own kind; apply dispatches by the artifact, not a flag") {
    val corpus = corpusDir()
    val base = Files.createTempDirectory("graft-tokcli").toString
    for ((method, kind) <- Seq("bpe" -> "bpe", "byte-bpe" -> "byte-bpe",
        "wordpiece" -> "wordpiece", "unigram" -> "unigram")) {
      val dir = s"$base/$method"
      TokenizerCli.train(spark, TokenizerCli.parseArgs(Array("train",
        "--method", method, "--corpus-uri", corpus,
        "--tokenizer-dir", dir, "--merges", "4", "--vocab-size", "32")))
      assert(graft.llm.TokenizerStore.kindOf(spark, dir) == kind)
      val out = s"$base/$method.out"
      val seg = TokenizerCli.apply(spark, TokenizerCli.parseArgs(Array(
        "apply", "--corpus-uri", corpus, "--tokenizer-dir", dir,
        "--output-uri", out)))
      // every doc segments to a positive piece count, and the written
      // parquet is the returned frame
      assert(seg.filter(col("n_pieces") <= 0).count() == 0)
      assert(spark.read.parquet(out).count() == seg.count())
    }
    // char-BPE artifact through the cli's dispatch serves the char path:
    // the textbook corpus keeps </w> markers in its pieces
    val bpeOut = spark.read.parquet(s"$base/bpe.out")
    assert(bpeOut.filter(col("pieces").contains("</w>")).count() > 0)
    // byte artifact's pieces never carry </w>
    val byteOut = spark.read.parquet(s"$base/byte-bpe.out")
    assert(byteOut.filter(col("pieces").contains("</w>")).count() == 0)
  }

  test("bad arguments are loud: mode, method, missing flags") {
    intercept[IllegalArgumentException](TokenizerCli.parseArgs(Array("x")))
    intercept[IllegalArgumentException](TokenizerCli.parseArgs(Array(
      "train", "--corpus-uri", "c")))
    intercept[IllegalArgumentException](TokenizerCli.parseArgs(Array(
      "apply", "--corpus-uri", "c", "--tokenizer-dir", "d")))
    val corpus = corpusDir()
    intercept[IllegalArgumentException](TokenizerCli.train(spark,
      TokenizerCli.parseArgs(Array("train", "--method", "nope",
        "--corpus-uri", corpus, "--tokenizer-dir", "/tmp/x"))))
  }
}
