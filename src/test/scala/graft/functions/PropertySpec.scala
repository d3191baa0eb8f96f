package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed}

/** Property checks for the round-11 primitives — invariants that hold
  * for ALL inputs, not just the fixtures: normalization idempotence
  * (double-cleaning a corpus must be a no-op) and the Misra–Gries
  * guarantee under arbitrary data and split orders (the merge rule must
  * keep the bound however partials interleave). */
class PropertySpec extends AnyFunSuite {

  private def holds(p: Prop, n: Int = 500): Unit = {
    val res = check(Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.status == Passed, res.status.toString)
  }

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("café", "naïve", "mühle", "œuf", "ﬁn", "ｅ", "①", "ＡＢ"),
    Gen.const(" "))).map(_.mkString(" ")).map(_.take(120))

  test("unicode normalization is idempotent for every form and strip mode") {
    import org.apache.spark.unsafe.types.UTF8String
    val formGen = Gen.oneOf("NFC", "NFD", "NFKC", "NFKD")
    holds(Prop.forAll(textGen, formGen, Gen.oneOf(true, false)) { (s, form, strip) =>
      val once = UnicodeNormOps.norm(UTF8String.fromString(s), form, strip)
      val twice = UnicodeNormOps.norm(once, form, strip)
      once == twice
    })
  }

  test("strip mode removes every combining mark, for every input") {
    import org.apache.spark.unsafe.types.UTF8String
    holds(Prop.forAll(textGen) { s =>
      val out = UnicodeNormOps.norm(UTF8String.fromString(s), "NFD", true).toString
      out.forall(c => Character.getType(c) != Character.NON_SPACING_MARK)
    })
  }

  test("Misra–Gries bound holds under arbitrary data and arbitrary splits") {
    val itemsGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "hh"))
      .map(_.take(300))
    val capGen = Gen.choose(2, 6)
    holds(Prop.forAll(itemsGen, capGen, Gen.choose(1, 8)) { (items, cap, parts) =>
      // split into `parts` chunks, summarize each, merge in order — the
      // distributed execution shape at an arbitrary partitioning
      val chunks = items.grouped(math.max(1, (items.size + parts - 1) / parts)).toSeq
      val merged = chunks.map { ch =>
        val s = new FreqSummary(cap); ch.foreach(s.offer); s
      }.reduceOption((a, b) => a.mergeWith(b)).getOrElse(new FreqSummary(cap))
      val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = items.size.toDouble / (cap + 1)
      val est = merged.sorted.toMap
      // every reported count is a lower bound within the error bound
      val countsOk = est.forall { case (k, c) =>
        c <= trueCounts.getOrElse(k, 0L) &&
          trueCounts.getOrElse(k, 0L) - c <= bound + 1e-9
      }
      // every true heavy hitter survives
      val heavyOk = trueCounts.forall { case (k, c) =>
        c <= bound || est.contains(k)
      }
      countsOk && heavyOk && merged.counts.size <= cap
    }, n = 2000)
  }

  test("shard assignment conserves weight: shard totals sum to the corpus total") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rowsGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 100000L), Gen.choose(1L, 500L)))
      .map(_.distinctBy(_._1))
    // NoShrink: shrinking walks outside the generators' domain
    // (negative weights), which is a precondition violation, not a bug
    holds(Prop.forAllNoShrink(rowsGen, Gen.choose(100L, 2000L)) { (rows, b) =>
      rows.isEmpty || {
        val df = rows.toDF("id", "w")
        val out = graft.llm.Sampling.shardAssign(df, "id", "w", b)
          .groupBy("shard").agg(org.apache.spark.sql.functions.sum("w").as("t"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
        val total = rows.map(_._2).sum
        val maxW = rows.map(_._2).max
        out.map(_._2).sum == total &&
          out.forall { case (s, t) => t < b + maxW } &&
          // a row heavier than the budget legitimately SKIPS shard ids
          // (its exclusive prefix jumps whole budgets); contiguity is
          // only promised when no row exceeds the shard weight
          (maxW > b ||
            out.map(_._1).sorted.sameElements(0L to out.map(_._1).max))
      }
    }, n = 30) // each trial runs Spark jobs — keep the count bounded
  }

  test("DsirScore bucket bit-math matches the md5 hex-prefix formula for all grams") {
    // the native scorer extracts hashBucketStr's 60-bit value from the
    // raw digest bytes (7 bytes + a nibble) instead of formatting hex;
    // pin bit-for-bit agreement with the definitional hex-string parse.
    // lr(b) = b makes a single-token score read back its own bucket.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val buckets = 1024
    val lr = Array.tabulate(buckets)(_.toDouble)
    holds(Prop.forAll(textGen, Gen.oneOf(0L, 7L, -3L, 987654321L)) { (s, seed) =>
      val gram = if (s.trim.isEmpty) "x" else s.trim.split("\\s+")(0)
      val tbl = new DsirScoreTable(lr, seed, buckets)
      val got = tbl.score(
        new GenericArrayData(Array[Any](UTF8String.fromString(gram)))).toInt
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((gram + "|" + seed).getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      got == (BigInt(hex.take(15), 16) % buckets).toInt
    })
  }

  test("unigram lattice: segmentation is a PARTITION of the word for every vocab") {
    import org.apache.spark.unsafe.types.UTF8String
    val wordGen = Gen.listOfN(10, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      .flatMap(w => Gen.choose(0, 10).map(w.take))
    val vocabGen = Gen.nonEmptyListOf(for {
      p <- Gen.choose(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
      lp <- Gen.choose(-8.0, -0.1)
    } yield (p, lp)).map(_.distinctBy(_._1))
    holds(Prop.forAll(wordGen, vocabGen) { (w, vocab) =>
      val lat = new UnigramLattice(vocab.map(_._1).toArray,
        vocab.map(_._2).toArray, 4)
      val out = new java.util.ArrayList[UTF8String]()
      lat.segmentWord(w, out)
      val pieces = (0 until out.size).map(out.get(_).toString)
      // concatenating the pieces (</w> stripped from the last) is the word
      val joined = pieces.mkString("").replace("</w>", "")
      joined == w &&
        (w.isEmpty || pieces.last.endsWith("</w>")) &&
        (pieces.isEmpty || pieces.init.forall(!_.contains("</w>")))
    }, n = 300)
  }

  test("unigram lattice: the Viterbi score is maximal over random alternative segmentations") {
    val wordGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
    val vocabGen = Gen.nonEmptyListOf(for {
      p <- Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
      lp <- Gen.choose(-8.0, -0.1)
    } yield (p, lp)).map(l => (l ++ Seq(("a", -9.0), ("b", -9.0))).distinctBy(_._1))
    holds(Prop.forAll(wordGen, vocabGen, Gen.long) { (w, vocab, seed) =>
      val m = vocab.toMap
      val lat = new UnigramLattice(vocab.map(_._1).toArray,
        vocab.map(_._2).toArray, 3)
      val best = lat.score(w)
      // a random valid segmentation can never beat the DP
      val rnd = new scala.util.Random(seed)
      var i = 0
      var alt = 0.0
      var valid = true
      while (i < w.length && valid) {
        val lens = (1 to math.min(3, w.length - i))
          .filter(l => m.contains(w.substring(i, i + l)))
        if (lens.isEmpty) valid = false
        else {
          val l = lens(rnd.nextInt(lens.size))
          alt += m(w.substring(i, i + l)); i += l
        }
      }
      !valid || best >= alt - 1e-9
    }, n = 300)
  }
}
