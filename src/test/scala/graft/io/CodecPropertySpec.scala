package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed}
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the hand-rolled codecs and native string ops
  * (SURVEY.md §5: property-based coverage beyond example round-trips). */
class CodecPropertySpec extends AnyFunSuite {

  private def holds(p: Prop): Unit = {
    val res = check(Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.status == Passed, res.status.toString)
  }

  // BSON-encodable scalar values
  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(identity[Any]),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(identity[Any]),
    Gen.chooseNum(-1e9, 1e9).map(identity[Any]),
    Gen.oneOf(true, false).map(identity[Any]),
    Gen.const(null: Any),
  )

  private val recordGen: Gen[Map[String, Any]] = for {
    n <- Gen.chooseNum(0, 8)
    keys <- Gen.listOfN(n, Gen.identifier.map(_.take(12)))
    vals <- Gen.listOfN(n, Gen.oneOf(
      scalarGen,
      Gen.listOf(scalarGen).map(_.take(9).toList: Any),
      Gen.mapOf(Gen.zip(Gen.identifier.map(_.take(8)), scalarGen)).map(_.take(5): Any),
    ))
  } yield keys.zip(vals).toMap

  test("bson encode/decode is the identity on generated records") {
    holds(Prop.forAll(Gen.listOf(recordGen).map(_.take(5))) { records =>
      Bson.parseAll(Bson.renderAll(records)) == records
    })
  }

  test("hcl render/parse is the identity on flat string/number records") {
    val hclScalar: Gen[Any] = Gen.oneOf(
      // printable strings incl. quotes/backslashes/whitespace escapes
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('"', '\\', ' ', '\n', '\t')))
        .map(cs => cs.mkString: Any),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(identity[Any]),
      Gen.oneOf(true, false).map(identity[Any]),
    )
    val rec = for {
      n <- Gen.chooseNum(1, 6)
      keys <- Gen.listOfN(n, Gen.identifier.map(_.take(10)))
      vals <- Gen.listOfN(n, hclScalar)
    } yield keys.zip(vals).toMap
    holds(Prop.forAll(rec) { m => Hcl.parse(Hcl.render(m)) == m })
  }

  test("collapse_ws equals the \\s+ regex on generated strings") {
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B'),
      Gen.oneOf('é', '世', 'ш'))).map(_.mkString)
    holds(Prop.forAll(strGen) { s =>
      graft.functions.CollapseWsOps.collapse(UTF8String.fromString(s)).toString ==
        s.replaceAll("\\s+", " ")
    })
  }

  test("yaml render/parse is the identity on generated nested documents") {
    val scalar: Gen[Any] = Gen.oneOf(
      Gen.identifier.map(_.take(10): Any),
      Gen.chooseNum(-100000L, 100000L).map(identity[Any]),
      Gen.oneOf(true, false).map(identity[Any]),
      // adversarial strings: empty, whitespace-y, multi-line, type-lookalike,
      // DFL-expression-shaped (the real catalog payload)
      Gen.oneOf[Any]("", " lead", "trail ", "a\nb", "x\ty", "true", "123",
        "1.5", "null", "filter(@, '@x == $kind')", "a: b", "'quoted'",
        "\"dq\"", "# hash", "- dash"),
    )
    def docGen(depth: Int): Gen[Map[String, Any]] = for {
      n <- Gen.chooseNum(1, 5)
      keys <- Gen.listOfN(n, Gen.identifier.map(_.take(10)))
      vals <- Gen.listOfN(n,
        if (depth <= 0) scalar
        else Gen.frequency[Any](
          4 -> scalar,
          1 -> Gen.nonEmptyListOf(scalar).map(_.take(4).toList: Any),
          1 -> docGen(depth - 1),
        ))
    } yield keys.zip(vals).toMap
    holds(Prop.forAll(docGen(2)) { m =>
      TextFormats.parseYaml(TextFormats.renderYaml(m)) == m
    })
  }

  test("toml render/parse is the identity on flat scalar records") {
    val scalar: Gen[Any] = Gen.oneOf(
      Gen.identifier.map(_.take(10): Any),
      Gen.chooseNum(-100000L, 100000L).map(identity[Any]),
      Gen.oneOf(true, false).map(identity[Any]),
      // the YAML property's adversarial set, plus backslash payloads
      // (DFL \Q...\E patterns, Windows paths) that previously lost their
      // backslash — or failed to reload at all (raw newline) — on a
      // TOML round trip
      Gen.oneOf[Any]("", " lead", "trail ", "a\nb", "x\ty", "cr\rlf",
        "true", "123", "1.5", "null", "filter(@, '@x == $kind')",
        "a: b", "'quoted'", "\"dq\"", "# hash", "- dash",
        "\\Qa.b\\E", "C:\\path\\to", "end\\", "k = v"),
    )
    val rec = for {
      n <- Gen.chooseNum(1, 6)
      keys <- Gen.listOfN(n, Gen.identifier.map(_.take(10)))
      vals <- Gen.listOfN(n, scalar)
    } yield keys.zip(vals).toMap
    holds(Prop.forAll(rec) { m =>
      TextFormats.parseToml(TextFormats.renderToml(m)) == m
    })

    // nested documents: server responses carry entity maps and lists of
    // entity maps, which render as [section] blocks, inline tables, and
    // arrays of inline tables — all must survive the line-based parser.
    // Keys get the adversarial treatment too: user-chosen defaults-map
    // keys are unrestricted strings ('=' would split the line, ']' would
    // close a section header, '#' would comment the line out)
    val keyGen: Gen[String] = Gen.frequency(
      4 -> Gen.identifier.map(_.take(10)),
      1 -> Gen.oneOf("a=b", "# h", "[x]", "a]b", "k =", "\"q\"", "'sq'",
        "with space", "", "a\nb", "tab\tkey", "end\\", "=", "true", "123"),
    )
    def nestedGen(depth: Int): Gen[Map[String, Any]] = for {
      n <- Gen.chooseNum(1, 4)
      keys <- Gen.listOfN(n, keyGen)
      vals <- Gen.listOfN(n,
        if (depth <= 0) scalar
        else Gen.frequency[Any](
          4 -> scalar,
          1 -> Gen.listOf(scalar).map(_.take(4).toList: Any),
          1 -> Gen.listOf(nestedGen(0)).map(_.take(3).toList: Any),
          1 -> nestedGen(depth - 1),
        ))
    } yield keys.zip(vals).toMap
    holds(Prop.forAll(nestedGen(2)) { m =>
      TextFormats.parseToml(TextFormats.renderToml(m)) == m
    })
  }

  test("bpe_token_count equals the regex-match count on generated strings") {
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', '.', ',', '!', '-'),
      Gen.oneOf('é', '世', 'ш'))).map(_.mkString)
    val re = "[a-z]{1,4}|[A-Z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\\s]".r
    holds(Prop.forAll(strGen) { s =>
      BpeTokenCountOpsAlias.count(UTF8String.fromString(s)) ==
        re.findAllIn(s).size
    })
  }

  private object BpeTokenCountOpsAlias {
    def count(s: UTF8String): Int = graft.functions.BpeTokenCountOps.count(s)
  }

  test("minhash signature expression matches a naive per-element implementation") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val p = (1L << 61) - 1
    val paramGen = Gen.listOfN(8, Gen.zip(
      Gen.chooseNum(1L, p - 1), Gen.chooseNum(0L, p - 1)))
    val hsGen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      .map(_.take(50))
    holds(Prop.forAll(hsGen, paramGen) { (hs, params) =>
      val (as, bs) = params.unzip
      val expr = graft.functions.MinHashSigs(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), // child unused by nullSafeEval
        as.toArray, bs.toArray, p)
      val got = expr.nullSafeEval(new GenericArrayData(hs.toArray[Any]))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
      val want = params.map { case (a, b) =>
        hs.map { h => val x = (h * a + b) % p; if (x < 0) x + p else x }.min
      }
      got == want
    })
  }

  test("simhash signature expression matches a naive vote implementation") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    val toksGen = Gen.nonEmptyListOf(
      Gen.oneOf("a", "b", "cat", "dog", "", "é世", "the the"))
      .map(_.take(40))
    holds(Prop.forAll(toksGen) { toks =>
      val ad = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = graft.functions.SimHashSig(
        org.apache.spark.sql.catalyst.expressions.Literal(1L))
        .nullSafeEval(ad).asInstanceOf[Long]
      val votes = new Array[Int](64)
      toks.foreach { t =>
        val h = XxHash64Function.hash(UTF8String.fromString(t), StringType, 42L)
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        }
      }
      val want = (0 until 64).foldLeft(0L) { (s, b) =>
        if (votes(b) > 0) s | (1L << b) else s
      }
      got == want
    })
  }

  test("sorted intersect count matches set intersection on sorted arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arrGen = Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)
    holds(Prop.forAll(arrGen, arrGen) { (a, b) =>
      val got = graft.functions.SortedIntersectCount(
        org.apache.spark.sql.catalyst.expressions.Literal(1L),
        org.apache.spark.sql.catalyst.expressions.Literal(1L))
        .nullSafeEval(new GenericArrayData(a.toArray[Any]),
                      new GenericArrayData(b.toArray[Any]))
      got == a.toSet.intersect(b.toSet).size
    })
  }

  test("shingle hashes: count and distinctness match a naive implementation") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val toksGen = Gen.listOf(Gen.oneOf("a", "b", "cat", "dog", "x y", ""))
      .map(_.take(30))
    val nGen = Gen.chooseNum(1, 4)
    holds(Prop.forAll(toksGen, nGen) { (toks, n) =>
      val ad = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = graft.functions.ShingleHashOps.compute(ad, n)
      val expected = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq.distinct
      got.numElements() == expected.size
    })
  }
}
