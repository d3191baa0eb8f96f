package graft.dfl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed}
import Node._

/** Property: `parse(render(ast)) == ast` for generated ASTs — the
  * renderer and lexer/parser must agree on every construct (the catalog
  * persists processes as DFL source, so a disagreement silently corrupts
  * stored pipelines). */
class AstPropertySpec extends AnyFunSuite {

  private def holds(p: Prop): Unit = {
    val res = check(Parameters.default.withMinSuccessfulTests(5000), p)
    assert(res.status == Passed, res.status.toString)
  }

  // parser-reachable names only: DFL keywords can never lex as
  // identifiers, so ASTs using them as names are out of scope
  private val keywords = Set("and", "or", "not", "in", "iin", "like",
    "ilike", "between", "within", "null", "true", "false", "intersects")

  private val nameGen: Gen[String] = (for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('_'))).map(_.take(8))
  } yield (h :: t).mkString).suchThat(n => !keywords(n.toLowerCase)) // keywords match case-insensitively

  private val litGen: Gen[Node] = Gen.oneOf(
    Gen.chooseNum(0L, 1000000L).map(Lit(_)),
    // doubles rendered via toString must re-lex as floats: keep them simple
    Gen.chooseNum(0, 999).map(n => Lit(n + 0.5)),
    Gen.oneOf(true, false).map(Lit(_)),
    Gen.alphaNumStr.map(s => Lit(s.take(10))),
    // strings whose rendering must escape or quote correctly
    Gen.oneOf("it's", "back\\slash", "two''quotes", "\"dq\"", "a b",
      "%pat%", "and", "null", "1.5", ", comma", "(paren").map(Lit(_)),
    Gen.const(NullLit),
  )

  private val leafGen: Gen[Node] = Gen.oneOf(
    litGen,
    nameGen.map(Attr(_)),
    Gen.const(Attr("")),
    nameGen.map(Var(_)),
  )

  private def nodeGen(depth: Int): Gen[Node] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      1 -> (for { t <- nodeGen(depth - 1); n <- nameGen; ns <- Gen.oneOf(true, false) }
        yield Prop2(t, n, ns)),
      1 -> (for { t <- nodeGen(depth - 1); i <- Gen.chooseNum(0L, 9L) }
        yield Index(t, Lit(i))),
      1 -> Gen.listOf(nodeGen(depth - 1)).map(xs => ArrayLit(xs.take(3))),
      1 -> (for {
        op <- Gen.oneOf("==", "!=", "<", ">", "and", "or", "+", "-", "*", "/", "%")
        l <- nodeGen(depth - 1); r <- nodeGen(depth - 1)
      } yield Binary(op, l, r)),
      1 -> (for { x <- nodeGen(depth - 1); lo <- litGen; hi <- litGen
                  w <- Gen.oneOf(true, false) } yield Between(x, lo, hi, w)),
      1 -> (for { c <- nodeGen(depth - 1); t <- nodeGen(depth - 1); f <- nodeGen(depth - 1) }
        yield Ternary(c, t, f)),
      1 -> (for { l <- nodeGen(depth - 1); r <- nodeGen(depth - 1) } yield Elvis(l, r)),
      1 -> (for { n <- nameGen; args <- Gen.listOf(nodeGen(depth - 1)) }
        yield FunCall(n, args.take(2))),
      1 -> (for { n <- Gen.chooseNum(1, 3)
                  ks <- Gen.listOfN(n, nameGen)
                  vs <- Gen.listOfN(n, nodeGen(depth - 1)) }
        yield DictLit(ks.map(Lit(_): Node).zip(vs))),
    )

  // Prop is shadowed by scalacheck's Prop — alias the AST node
  private def Prop2(t: Node, n: String, ns: Boolean): Node = Node.Prop(t, n, ns)

  test("parse(render(ast)) == ast for generated expression trees") {
    holds(Prop.forAll(nodeGen(3)) { ast =>
      val rendered = Node.render(ast)
      val reparsed = Parser.parse(rendered)
      val ok = reparsed == ast
      if (!ok) println(s"MISMATCH\n  ast: $ast\n  src: $rendered\n  got: $reparsed")
      ok
    })
  }

  test("pipelines of generated stages round-trip") {
    val stageGen = Gen.oneOf(
      nodeGen(2),
      (for { n <- nameGen; v <- nodeGen(2) } yield Assign(n, v)): Gen[Node],
    )
    holds(Prop.forAll(Gen.listOfN(3, stageGen)) { stages =>
      val ast = Pipe(stages)
      Parser.parse(Node.render(ast)) == ast
    })
  }
}
