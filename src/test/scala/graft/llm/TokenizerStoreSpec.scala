package graft.llm

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TokenizerStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("artifact").toString

  test("all three tokenizer kinds round-trip bit-identically") {
    val bpeDir = tmp("graft-tokstore")
    val merges = Seq(Bpe.Merge(0, "e", "s", 9L), Bpe.Merge(1, "es", "t</w>", 9L))
    TokenizerStore.saveBpe(spark, merges, bpeDir)
    assert(TokenizerStore.loadBpe(spark, bpeDir) == merges)

    val wpDir = tmp("graft-tokstore")
    val vocab = Seq("l", "##o", "##w", "lo", "##st")
    TokenizerStore.saveWordPiece(spark, vocab, wpDir)
    assert(TokenizerStore.loadWordPiece(spark, wpDir) == vocab.sorted)

    val uniDir = tmp("graft-tokstore")
    val pieces = Seq(Unigram.Piece("ab", -0.5), Unigram.Piece("a", -1.0))
    TokenizerStore.saveUnigram(spark, pieces, uniDir)
    assert(TokenizerStore.loadUnigram(spark, uniDir) == pieces.sortBy(_.piece))
  }

  test("loading the wrong kind is a loud error, not garbage tokens") {
    val dir = tmp("graft-tokstore")
    TokenizerStore.saveWordPiece(spark, Seq("a", "##b"), dir)
    val e = intercept[IllegalArgumentException] {
      TokenizerStore.loadBpe(spark, dir)
    }
    assert(e.getMessage.contains("wordpiece") && e.getMessage.contains("bpe"))
  }

  test("re-save swaps atomically; a crashed save leaves the previous artifact intact") {
    val dir = tmp("graft-tokstore")
    TokenizerStore.saveWordPiece(spark, Seq("a", "##b"), dir)
    TokenizerStore.saveWordPiece(spark, Seq("x", "##y", "##z"), dir)
    assert(TokenizerStore.loadWordPiece(spark, dir) == Seq("##y", "##z", "x"))
    // crash mid-save: the staged write dies AFTER partial output — the
    // committed artifact must still be the previous complete version
    intercept[RuntimeException] {
      Similarity.stagedCommit(spark, dir) { staging =>
        spark.range(1).write.parquet(s"$staging/table")
        throw new RuntimeException("simulated crash mid-save")
      }
    }
    assert(TokenizerStore.loadWordPiece(spark, dir) == Seq("##y", "##z", "x"))
    // and the serving path accepts the loaded artifact directly
    import spark.implicits._
    val seg = WordPiece.segment(Seq((1L, "x")).toDF("doc_id", "text"),
      "doc_id", "text", TokenizerStore.loadWordPiece(spark, dir))
    assert(seg.head().getString(2) == "x")
  }
}
