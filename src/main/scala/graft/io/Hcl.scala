package graft.io

/** Minimal HCL (HashiCorp configuration language, v1 syntax) codec for the
  * config surface the reference decodes (reference: cli/process.go:911
  * lists hcl; FormatInfer maps `.tf`/`.hcl`).
  *
  * Supported: `key = value` assignments (string/number/bool/null), lists
  * `[v, …]`, inline objects `{ k = v, … }`, nested blocks `name { … }`,
  * labeled blocks `name "label" { … }` (label becomes a nested key — and
  * repeated labels merge), `#`/`//` line comments.
  */
object Hcl {

  def parse(src: String): Map[String, Any] = {
    val toks = lex(src)
    val (m, rest) = parseBody(toks, topLevel = true)
    require(rest.isEmpty, s"hcl: trailing tokens: ${rest.take(3).mkString(" ")}")
    m
  }

  // ---------- lexer ----------

  private def lex(src: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c == '#' || (c == '/' && i + 1 < n && src(i + 1) == '/')) {
        while (i < n && src(i) != '\n') i += 1
      } else if (c.isWhitespace || c == ',') i += 1
      else if (c == '"') {
        val sb = new StringBuilder("\"")
        i += 1
        while (i < n && src(i) != '"') {
          if (src(i) == '\\' && i + 1 < n) {
            sb += (src(i + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other // \" \\ and unknown escapes keep the char
            })
            i += 2
          } else { sb += src(i); i += 1 }
        }
        i += 1
        out += sb.append('"').toString()
      } else if ("={}[]".contains(c)) { out += c.toString; i += 1 }
      else {
        val start = i
        while (i < n && !src(i).isWhitespace && !"={}[],#\"".contains(src(i))) i += 1
        out += src.substring(start, i)
      }
    }
    out.result()
  }

  // ---------- parser ----------

  /** Body = sequence of `k = v` | `k { … }` | `k "label" { … }`. */
  private def parseBody(toks: List[String], topLevel: Boolean): (Map[String, Any], List[String]) = {
    var rest = toks
    var m = Map.empty[String, Any]
    def merge(k: String, v: Any): Unit = (m.get(k), v) match {
      case (Some(a: Map[_, _]), b: Map[_, _]) =>
        m += k -> (a.asInstanceOf[Map[String, Any]] ++ b.asInstanceOf[Map[String, Any]])
      case _ => m += k -> v
    }
    while (rest.nonEmpty && rest.head != "}") {
      val key = unquote(rest.head)
      rest = rest.tail
      rest match {
        case "=" :: tail =>
          val (v, r) = parseValue(tail)
          merge(key, v); rest = r
        case "{" :: tail =>
          val (body, r) = parseBody(tail, topLevel = false)
          require(r.headOption.contains("}"), s"hcl: unclosed block $key")
          merge(key, body); rest = r.tail
        case label :: "{" :: tail if label.startsWith("\"") =>
          val (body, r) = parseBody(tail, topLevel = false)
          require(r.headOption.contains("}"), s"hcl: unclosed block $key")
          merge(key, Map(unquote(label) -> body)); rest = r.tail
        case _ => throw new IllegalArgumentException(
          s"hcl: expected '=' or '{' after $key, got ${rest.headOption.getOrElse("EOF")}")
      }
    }
    (m, rest)
  }

  private def parseValue(toks: List[String]): (Any, List[String]) = toks match {
    case "{" :: tail =>
      val (body, r) = parseBody(tail, topLevel = false)
      require(r.headOption.contains("}"), "hcl: unclosed object")
      (body, r.tail)
    case "[" :: tail =>
      var rest = tail
      val xs = List.newBuilder[Any]
      while (rest.nonEmpty && rest.head != "]") {
        val (v, r) = parseValue(rest)
        xs += v; rest = r
      }
      require(rest.headOption.contains("]"), "hcl: unclosed list")
      (xs.result(), rest.tail)
    case t :: tail => (scalar(t), tail)
    case Nil => throw new IllegalArgumentException("hcl: expected value, got EOF")
  }

  private def scalar(t: String): Any =
    if (t.startsWith("\"")) unquote(t)
    else t match {
      case "true"  => true
      case "false" => false
      case "null"  => null
      case _ => t.toLongOption.orElse(t.toDoubleOption).getOrElse(t)
    }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\"")) s.substring(1, s.length - 1)
    else s

  // ---------- render ----------

  def render(m: Map[String, Any], indent: Int = 0): String = {
    val pad = "  " * indent
    m.map { case (k, v) => v match {
      case o: Map[_, _] =>
        s"$pad$k {\n${render(o.asInstanceOf[Map[String, Any]], indent + 1)}\n$pad}"
      case _ => s"$pad$k = ${renderValue(v, indent)}"
    }}.mkString("\n")
  }

  private def renderValue(v: Any, indent: Int): String = v match {
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r") + "\""
    case null         => "null"
    case xs: Seq[_]   => xs.map(renderValue(_, indent)).mkString("[", ", ", "]")
    case o: Map[_, _] =>
      val pad = "  " * (indent + 1)
      "{\n" + render(o.asInstanceOf[Map[String, Any]], indent + 1) + s"\n${"  " * indent}}"
    case other        => String.valueOf(other)
  }
}
