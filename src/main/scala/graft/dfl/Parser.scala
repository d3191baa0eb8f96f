package graft.dfl

import Lexer._
import Node._

/** Hand-rolled Pratt parser for DFL.
  *
  * Precedence (loosest → tightest), matching the structures observed at the
  * reference call sites (examples/bars.dfl:8-12, examples/geonames.dfl:1-46,
  * pipeline/Pipeline.go:7-11):
  *
  *   pipe `|`  <  assign `:=` `+=` `-=`  <  ternary `? :`  <  elvis `?:`
  *   <  or  <  and  <  not  <  comparisons (== != < <= > >= in iin like
  *   ilike between within)  <  additive + -  <  multiplicative * / %
  *   <  unary -  <  postfix (. ?. [] call)  <  primary
  */
object Parser {
  def parse(src: String): Node = new Parser(Lexer.lex(src)).parseTop()

  /** Parse + canonicalize (constant folding happens in the compiler;
    * here parse is already the compiled shape). */
  def parseCompile(src: String): Node = parse(src)
}

final class Parser(tokens: Vector[Token]) {
  private var pos = 0
  private def cur: Token = tokens(pos)
  private def advance(): Token = { val t = cur; pos += 1; t }
  private def expectOp(s: String): Unit = cur match {
    case TOp(`s`) => pos += 1
    case other    => throw new DflParseException(s"expected '$s' but found $other")
  }
  private def at(op: String): Boolean = cur match {
    case TOp(`op`) => true
    case _         => false
  }
  private def atWord(w: String): Boolean = cur match {
    case TWord(s) => s.equalsIgnoreCase(w)
    case _        => false
  }

  def parseTop(): Node = {
    val n = parsePipe()
    cur match {
      case TEof => n
      case t    => throw new DflParseException(s"trailing input at token $t")
    }
  }

  private def parsePipe(): Node = {
    var stages = List(parseAssign())
    while (at("|")) { advance(); stages ::= parseAssign() }
    stages match {
      case single :: Nil => single
      case many          => Pipe(many.reverse)
    }
  }

  private def parseAssign(): Node = {
    val lhs = parseTernary()
    cur match {
      case TOp(":=") =>
        advance()
        lhs match {
          case Var(name) => Assign(name, parseTernary())
          case other     => throw new DflParseException(s"':=' target must be a \\$$variable, got $other")
        }
      case TOp(op @ ("+=" | "-=")) =>
        advance()
        AugAssign(lhs, op, parseTernary())
      case _ => lhs
    }
  }

  private def parseTernary(): Node = {
    val cond = parseElvis()
    if (at("?")) {
      advance()
      val t = parseTernary()
      expectOp(":")
      val f = parseTernary()
      Ternary(cond, t, f)
    } else cond
  }

  private def parseElvis(): Node = {
    var l = parseOr()
    while (at("?:")) { advance(); l = Elvis(l, parseOr()) }
    l
  }

  private def parseOr(): Node = {
    var l = parseAnd()
    while (atWord("or")) { advance(); l = Binary("or", l, parseAnd()) }
    l
  }

  private def parseAnd(): Node = {
    var l = parseNot()
    while (atWord("and")) { advance(); l = Binary("and", l, parseNot()) }
    l
  }

  private def parseNot(): Node =
    if (atWord("not")) { advance(); Unary("not", parseNot()) }
    else parseComparison()

  private val cmpOps = Set("==", "!=", "<", "<=", ">", ">=")

  private def parseComparison(): Node = {
    val l = parseAdditive()
    cur match {
      case TOp(op) if cmpOps(op) =>
        advance(); Binary(op, l, parseAdditive())
      case TWord(w) if w.equalsIgnoreCase("in") || w.equalsIgnoreCase("iin") ||
                       w.equalsIgnoreCase("like") || w.equalsIgnoreCase("ilike") =>
        advance(); Binary(w.toLowerCase, l, parseAdditive())
      case TWord(w) if w.equalsIgnoreCase("between") || w.equalsIgnoreCase("within") =>
        advance()
        val lo = parseAdditive()
        if (!atWord("and")) throw new DflParseException(s"expected 'and' in $w range, found $cur")
        advance()
        val hi = parseAdditive()
        Between(l, lo, hi, within = w.equalsIgnoreCase("within"))
      case _ => l
    }
  }

  private def parseAdditive(): Node = {
    var l = parseMultiplicative()
    while (at("+") || at("-")) {
      val op = advance().asInstanceOf[TOp].s
      l = Binary(op, l, parseMultiplicative())
    }
    l
  }

  private def parseMultiplicative(): Node = {
    var l = parseUnary()
    while (at("*") || at("/") || at("%")) {
      val op = advance().asInstanceOf[TOp].s
      l = Binary(op, l, parseUnary())
    }
    l
  }

  private def parseUnary(): Node =
    if (at("-")) { advance(); Unary("-", parseUnary()) }
    else parsePostfix()

  private def parsePostfix(): Node = {
    var n = parsePrimary()
    var continue = true
    while (continue) {
      cur match {
        case TOp(".") =>
          advance()
          n = Prop(n, expectWord(), nullSafe = false)
        case TOp("?.") =>
          advance()
          n = Prop(n, expectWord(), nullSafe = true)
        case TOp("[") =>
          advance()
          val idx = parseTernary()
          expectOp("]")
          n = Index(n, idx)
        case _ => continue = false
      }
    }
    n
  }

  private def expectWord(): String = advance() match {
    case TWord(s)   => s
    case TString(s) => s
    case other      => throw new DflParseException(s"expected identifier, found $other")
  }

  private val keywords = Set(
    "and", "or", "not", "in", "iin", "like", "ilike", "between", "within",
    "true", "false", "null",
  )

  private def parsePrimary(): Node = cur match {
    case TString(s) => advance(); Lit(s)
    case TInt(v)    => advance(); Lit(v)
    case TFloat(v)  => advance(); Lit(v)
    case TOp("@") =>
      advance()
      cur match {
        case TWord(name) if !keywords(name.toLowerCase) => advance(); Attr(name)
        case _ => Attr("")
      }
    case TOp("$") =>
      advance()
      Var(expectWord())
    case TOp("(") =>
      advance()
      val n = parsePipe()
      expectOp(")")
      n
    case TOp("[") =>
      advance()
      val items = parseList("]")
      ArrayLit(items)
    case TOp("{") =>
      advance()
      parseBrace()
    case TWord(w) if w.equalsIgnoreCase("true")  => advance(); Lit(true)
    case TWord(w) if w.equalsIgnoreCase("false") => advance(); Lit(false)
    case TWord(w) if w.equalsIgnoreCase("null")  => advance(); NullLit
    case TWord(w) =>
      advance()
      if (at("(")) {
        advance()
        val args = parseList(")")
        FunCall(w, args)
      } else Lit(w) // bare word → string literal (reference: examples/bars.dfl:8 'bar')
    case other => throw new DflParseException(s"unexpected token $other")
  }

  private def parseList(close: String): List[Node] = {
    val items = List.newBuilder[Node]
    if (!at(close)) {
      items += parseTernary()
      while (at(",")) { advance(); items += parseTernary() }
    }
    expectOp(close)
    items.result()
  }

  /** `{...}` is a dict if any `key: value` appears, else a set.
    * (reference: examples/geonames.dfl:10-26 dict; osm.sh:308 set) */
  private def parseBrace(): Node = {
    if (at("}")) { advance(); return SetLit(Nil) }
    val first = parseTernary()
    if (at(":")) {
      advance()
      val entries = List.newBuilder[(Node, Node)]
      entries += ((first, parseTernary()))
      while (at(",")) {
        advance()
        val k = parseTernary()
        expectOp(":")
        entries += ((k, parseTernary()))
      }
      expectOp("}")
      DictLit(entries.result())
    } else {
      val items = List.newBuilder[Node]
      items += first
      while (at(",")) { advance(); items += parseTernary() }
      expectOp("}")
      SetLit(items.result())
    }
  }
}
