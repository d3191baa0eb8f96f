package graft.dfl

/** DFL (Dynamic Filter Language) abstract syntax tree.
  *
  * The node shapes mirror the language surface pinned by the reference's
  * call sites (reference: examples/bars.dfl:8-12, examples/geonames.dfl:1-36,
  * railgun/pipeline/Pipeline.go:7-11, railgun/named/named.go:14-22).
  * This is a fresh Scala design: nodes are immutable case classes and the
  * compiler (see [[ColumnCompiler]]) lowers them to Catalyst `Column`
  * expressions rather than interpreting them per row.
  */
sealed trait Node

object Node {
  /** Literal scalar: String, Long, Double, or Boolean. */
  final case class Lit(value: Any) extends Node
  case object NullLit extends Node

  /** `@name` attribute (empty name = the whole context `@`). */
  final case class Attr(name: String) extends Node
  /** `$name` runtime variable. */
  final case class Var(name: String) extends Node
  /** `target.name` / `target?.name` (nullSafe) member access. */
  final case class Prop(target: Node, name: String, nullSafe: Boolean) extends Node
  /** `target[idx]` element access. */
  final case class Index(target: Node, idx: Node) extends Node

  final case class ArrayLit(items: List[Node]) extends Node
  /** `{a, b, c}` — distinct-membership literal (reference: cli/eval.go:100-106). */
  final case class SetLit(items: List[Node]) extends Node
  /** `{k: v, ...}` object literal (reference: examples/geonames.dfl:10-26). */
  final case class DictLit(entries: List[(Node, Node)]) extends Node

  final case class FunCall(name: String, args: List[Node]) extends Node
  /** `not x`, unary `-x`. */
  final case class Unary(op: String, x: Node) extends Node
  /** Binary ops: == != < <= > >= + - * / % and or in iin like ilike intersects. */
  final case class Binary(op: String, l: Node, r: Node) extends Node
  /** `x between lo and hi` (inclusive); `within` variant is the bbox form
    * (reference: examples/geonames.dfl:39-40, pipeline/Pipeline.go:7). */
  final case class Between(x: Node, lo: Node, hi: Node, within: Boolean) extends Node
  final case class Ternary(cond: Node, t: Node, f: Node) extends Node
  /** `l ?: r` null-coalescing (reference: README.md:82). */
  final case class Elvis(l: Node, r: Node) extends Node
  /** `$name := expr` pipeline-stage binding (reference: examples/geonames.dfl:28). */
  final case class Assign(name: String, value: Node) extends Node
  /** `@properties += {...}` / `-=` in-place dict update returning the whole
    * context (reference: examples/geonames.dfl:31-35, named/named.go:20). */
  final case class AugAssign(target: Node, op: String, value: Node) extends Node
  /** `a | b | c` pipeline; each stage's result is the next stage's `@`. */
  final case class Pipe(stages: List[Node]) extends Node

  /** Direct child nodes, for generic tree walks. */
  def childrenOf(n: Node): List[Node] = n match {
    case Prop(t, _, _)        => List(t)
    case Index(t, i)          => List(t, i)
    case ArrayLit(xs)         => xs
    case SetLit(xs)           => xs
    case DictLit(es)          => es.flatMap { case (k, v) => List(k, v) }
    case FunCall(_, args)     => args
    case Unary(_, x)          => List(x)
    case Binary(_, l, r)      => List(l, r)
    case Between(x, lo, hi, _) => List(x, lo, hi)
    case Ternary(c, t, f)     => List(c, t, f)
    case Elvis(l, r)          => List(l, r)
    case Assign(_, v)         => List(v)
    case AugAssign(t, _, v)   => List(t, v)
    case Pipe(ss)             => ss
    case _                    => Nil
  }

  /** Render a node back to canonical DFL source (round-trip support; the
    * catalog stores processes as DFL strings, reference: core/Process.go:38). */
  def render(n: Node): String = n match {
    case Lit(s: String)       => quoteString(s)
    case Lit(v)               => v.toString
    case NullLit              => "null"
    case Attr("")             => "@"
    case Attr(name)           => "@" + name
    case Var(name)            => "$" + name
    // postfix access binds tightest: compound targets must parenthesize
    // (`(a and b)[1]`, never `a and b[1]`)
    case Prop(t, name, ns)    => renderP(t) + (if (ns) "?." else ".") + name
    case Index(t, i)          => s"${renderP(t)}[${render(i)}]"
    case ArrayLit(items)      => items.map(render).mkString("[", ", ", "]")
    case SetLit(items)        => items.map(render).mkString("{", ", ", "}")
    case DictLit(entries)     =>
      entries.map { case (k, v) => s"${renderKey(k)}: ${render(v)}" }
        .mkString("{", ", ", "}")
    case FunCall(name, args)  => s"$name(${args.map(render).mkString(", ")})"
    case Unary("not", x)      => s"not ${renderP(x)}"
    case Unary(op, x)         => s"$op${renderP(x)}"
    case Binary(op, l, r)     => s"${renderP(l)} $op ${renderP(r)}"
    case Between(x, lo, hi, w) =>
      s"${renderP(x)} ${if (w) "within" else "between"} ${renderP(lo)} and ${renderP(hi)}"
    case Ternary(c, t, f)     => s"${renderP(c)} ? ${renderP(t)} : ${renderP(f)}"
    case Elvis(l, r)          => s"${renderP(l)} ?: ${renderP(r)}"
    case Assign(name, v)      => s"$$$name := ${render(v)}"
    case AugAssign(t, op, v)  => s"${render(t)} $op ${render(v)}"
    case Pipe(stages)         => stages.map(renderP).mkString(" | ")
  }

  private def renderKey(k: Node): String = k match {
    case Lit(s: String) if s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_') => s
    case Lit(s: String) => quoteString(s)
    case other          => render(other)
  }

  /** Parenthesize compound sub-expressions so the round trip re-parses
    * with identical structure regardless of precedence. */
  private def renderP(n: Node): String = n match {
    case _: Lit | NullLit | _: Attr | _: Var | _: Prop | _: Index |
         _: ArrayLit | _: SetLit | _: DictLit | _: FunCall => render(n)
    case _ => "(" + render(n) + ")"
  }

  private def quoteString(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
}
