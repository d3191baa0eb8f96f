package graft.io

/** Driver-side parsers/serializers for the config-ish text formats the
  * reference accepts (yaml, toml, properties — reference:
  * cli/process.go:911 via go-simple-serializer). These formats carry
  * catalog documents and small CLI payloads, never bulk data, so a
  * driver-side parse feeding `spark.read.json` is the right shape
  * (SURVEY.md §2.1); bulk paths stay on the native csv/tsv/json/jsonl
  * readers.
  *
  * The parsers cover the practical subset: scalars, flat and nested maps,
  * lists of scalars/maps — enough for every catalog/example document in
  * the reference repo. They are hand-rolled (no external deps available
  * offline) and deliberately strict: unparseable input throws.
  */
object TextFormats {

  // ---------- properties ----------

  /** `key=value` / `key: value` lines, `#`/`!` comments. */
  def parseProperties(src: String): Map[String, String] =
    src.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("!"))
      .map { l =>
        val i = l.indexWhere(c => c == '=' || c == ':')
        if (i < 0) (l, "") else (l.take(i).trim, l.drop(i + 1).trim)
      }.toMap

  def renderProperties(m: Map[String, Any]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=${scalarStr(v)}" }.mkString("\n")

  // ---------- toml (subset: [section], key = value, arrays of scalars) ----------

  def parseToml(src: String): Map[String, Any] = {
    val root = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    var section: Option[String] = None
    src.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .foreach { l =>
        if (l.startsWith("[") && l.endsWith("]")) {
          section = Some(unquoteKey(l.substring(1, l.length - 1).trim))
          root.getOrElseUpdate(section.get,
            scala.collection.mutable.LinkedHashMap.empty[String, Any])
        } else {
          // first '=' OUTSIDE quotes: a quoted key may itself contain '='
          val i = eqIndexTopLevel(l)
          if (i < 0) throw new IllegalArgumentException(s"bad toml line: $l")
          val k = unquoteKey(l.take(i).trim)
          val v = parseScalarOrArray(l.drop(i + 1).trim)
          section match {
            case Some(s) =>
              root(s).asInstanceOf[scala.collection.mutable.LinkedHashMap[String, Any]]
                .put(k, v)
            case None => root.put(k, v)
          }
        }
      }
    root.map { case (k, v) => k -> deepImmutable(v) }.toMap
  }

  /** Keys render bare when identifier-safe, double-quoted otherwise —
    * this undoes the quoting on read. */
  private def unquoteKey(raw: String): String =
    if (raw.startsWith("\"") || raw.startsWith("'")) String.valueOf(parseScalar(raw))
    else raw

  def renderToml(m: Map[String, Any]): String = {
    val (sections, scalars) = m.partition(_._2.isInstanceOf[Map[_, _]])
    val top = scalars.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${tomlKey(k)} = ${tomlValue(v)}" }
    val secs = sections.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      s"[${tomlKey(k)}]" +: v.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k2, v2) => s"${tomlKey(k2)} = ${tomlValue(v2)}" }
    }
    (top ++ secs).mkString("\n")
  }

  // ---------- yaml (subset: nested maps by 2-space indent, `- ` lists) ----------

  def parseYaml(src: String): Any = {
    val lines = src.linesIterator
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
      .toVector
    val (value, rest) = parseYamlBlock(lines, 0, 0)
    require(rest >= lines.size, s"trailing yaml at line $rest: ${lines(rest)}")
    value
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  private def parseYamlBlock(lines: Vector[String], start: Int, indent: Int): (Any, Int) = {
    if (start >= lines.size) return (Map.empty[String, Any], start)
    val first = lines(start)
    if (indentOf(first) < indent) return (Map.empty[String, Any], start)
    if (first.trim.startsWith("- ") || first.trim == "-") {
      // list block
      val items = scala.collection.mutable.ListBuffer.empty[Any]
      var i = start
      while (i < lines.size && indentOf(lines(i)) == indent && lines(i).trim.startsWith("-")) {
        val after = lines(i).trim.drop(1).trim
        if (after.isEmpty) {
          val (v, next) = parseYamlBlock(lines, i + 1, indent + 2)
          items += v; i = next
        } else if (after.contains(":") && !after.startsWith("{") &&
            !after.startsWith("\"") && !after.startsWith("'")) {
          // inline first key of a nested map item: "- k: v" (a QUOTED
          // leading token is a scalar, however many colons it contains)
          val synthetic = (" " * (indent + 2)) + after
          val (v, next) = parseYamlBlock(lines.patch(i, Seq(synthetic), 1), i, indent + 2)
          items += v; i = next
        } else {
          items += parseScalarOrArray(after); i += 1
        }
      }
      (items.toList, i)
    } else {
      // map block
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      var i = start
      while (i < lines.size && indentOf(lines(i)) == indent && lines(i).contains(":")) {
        val l = lines(i).trim
        val ci = l.indexOf(':')
        val k = stripQuotes(l.take(ci).trim)
        val rest = l.drop(ci + 1).trim
        if (rest.isEmpty) {
          val (v, next) = parseYamlBlock(lines, i + 1, indent + 2)
          m.put(k, v); i = next
        } else {
          m.put(k, parseScalarOrArray(rest)); i += 1
        }
      }
      (m.toMap, i)
    }
  }

  def renderYaml(v: Any, indent: Int = 0): String = {
    val pad = " " * indent
    v match {
      case m: Map[_, _] =>
        // keys that would not survive the line split (empty, padded)
        // are quoted; colon-bearing keys are not representable
        def keyStr(k: String): String =
          if (k.isEmpty || k != k.trim) "\"" + k + "\"" else k
        m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1).map {
          case (k, mv: Map[_, _]) => s"$pad${keyStr(k)}:\n${renderYaml(mv, indent + 2)}"
          case (k, lv: Seq[_])    => s"$pad${keyStr(k)}:\n${renderYaml(lv, indent + 2)}"
          case (k, sv)            => s"$pad${keyStr(k)}: ${scalarStr(sv)}"
        }.mkString("\n")
      case s: Seq[_] =>
        s.map {
          case m: Map[_, _] =>
            val body = renderYaml(m, indent + 2).dropWhile(_ == ' ')
            s"$pad- $body"
          case x => s"$pad- ${scalarStr(x)}"
        }.mkString("\n")
      case other => s"$pad${scalarStr(other)}"
    }
  }

  // ---------- shared scalar handling ----------

  private[io] def parseScalarOrArray(s0: String): Any = {
    val s = s0.trim
    if (s.startsWith("[") && s.endsWith("]")) {
      val body = s.substring(1, s.length - 1).trim
      if (body.isEmpty) Nil
      else splitTopLevel(body).map(x => parseScalarOrArray(x.trim))
    } else if (s.startsWith("{") && s.endsWith("}")) {
      // TOML inline table {k = v, ...} — how nested maps (and arrays of
      // maps, via [{...}, {...}]) survive the line-based document shape
      val body = s.substring(1, s.length - 1).trim
      if (body.isEmpty) Map.empty[String, Any]
      else splitTopLevel(body).map { kv =>
        val t = kv.trim
        val i = eqIndexTopLevel(t)
        if (i <= 0) throw new IllegalArgumentException(s"bad inline table entry: $t")
        val rawKey = t.take(i).trim
        val key = if (rawKey.startsWith("\"") || rawKey.startsWith("'"))
          String.valueOf(parseScalar(rawKey)) else rawKey
        key -> parseScalarOrArray(t.drop(i + 1).trim)
      }.toMap
    } else parseScalar(s)
  }

  /** First '=' outside any quoted string, or -1. */
  private def eqIndexTopLevel(s: String): Int = {
    var i = 0; var inStr = false; var q = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\' && q == '"') i += 1
        else if (c == q) inStr = false
      }
      else if (c == '"' || c == '\'') { inStr = true; q = c }
      else if (c == '=') return i
      i += 1
    }
    -1
  }

  private def splitTopLevel(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var depth = 0; var cur = new StringBuilder; var inStr = false; var q = ' '
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        cur += c
        // double-quoted strings carry backslash escapes (\" must not
        // terminate the string); single-quoted are literal
        if (c == '\\' && q == '"' && i + 1 < s.length) { cur += s.charAt(i + 1); i += 1 }
        else if (c == q) inStr = false
      }
      else c match {
        case '\'' | '"' => inStr = true; q = c; cur += c
        case '[' | '{' => depth += 1; cur += c
        case ']' | '}' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur = new StringBuilder
        case _ => cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toList
  }

  def parseScalar(s: String): Any = {
    val t = s.trim
    if (t.length >= 2 && t.head == '"' && t.last == '"')
      unescapeDq(t.substring(1, t.length - 1)) // quoted → always a string
    else if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      t.substring(1, t.length - 1)
    else if (t == "true") true
    else if (t == "false") false
    else if (t == "null" || t == "~") null
    else if (t.matches("-?\\d+")) t.toLong
    else if (t.matches("-?\\d+\\.\\d+([eE][+-]?\\d+)?")) t.toDouble
    else t
  }

  private[io] def stripQuotes(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s

  private def unescapeDq(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        sb += (s.charAt(i + 1) match {
          case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
          case other => other
        })
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Does a string scalar need double-quoting to survive a round trip?
    * Unquoted YAML re-parses bools/numbers/null by value, trims
    * whitespace, and cannot carry newlines (catalog Process expressions
    * are often multi-line DFL — reference: examples/geonames.dfl). */
  private def needsQuoting(s: String): Boolean =
    s.isEmpty || s != s.trim ||
      s.exists(c => c == '\n' || c == '\r' || c == '\t') ||
      s == "true" || s == "false" || s == "null" || s == "~" ||
      s.matches("-?\\d+") || s.matches("-?\\d+\\.\\d+([eE][+-]?\\d+)?") ||
      s.head == '"' || s.head == '\'' || s.head == '#' ||
      s.startsWith("- ") || s == "-" ||
      s.contains(": ") || s.endsWith(":")

  private def scalarStr(v: Any): String = v match {
    case null => "null"
    case s: String if needsQuoting(s) =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r") + "\""
    case s: String => s
    case other     => other.toString
  }

  private def tomlValue(v: Any): String = v match {
    // mirror scalarStr's escape set: parseScalar/unescapeDq consumes
    // \\ \n \t \r on read, so the writer must produce them — otherwise a
    // backslash-bearing value (DFL \Q...\E, Windows path) loses its
    // backslash on a round trip, and a raw newline inside the quotes
    // breaks the line-based parseToml entirely
    case s: String  =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r") + "\""
    case xs: Seq[_] => xs.map(tomlValue).mkString("[", ", ", "]")
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s"${tomlKey(k)} = ${tomlValue(x)}" }
        .mkString("{", ", ", "}")
    case other      => String.valueOf(other)
  }

  private def tomlKey(k: String): String =
    if (k.nonEmpty && k.forall(c => c.isLetterOrDigit || c == '_' || c == '-')) k
    else tomlValue(k)

  private def deepImmutable(v: Any): Any = v match {
    case m: scala.collection.mutable.LinkedHashMap[_, _] =>
      m.map { case (k, x) => k.toString -> deepImmutable(x) }.toMap
    case xs: Seq[_] => xs.map(deepImmutable).toList
    case other      => other
  }

  // ---------- JSON (for bridging driver-parsed records into Spark) ----------

  /** Minimal JSON renderer for driver-parsed records → `spark.read.json`. */
  def toJson(v: Any): String = v match {
    case null       => "null"
    case s: String  => "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]]
        .map { case (k, x) => s"${toJson(k)}:${toJson(x)}" }.mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(toJson).mkString("[", ",", "]")
    case other      => String.valueOf(other)
  }

  /** Indented JSON for the server's html preview (the reference
    * pretty-prints with MarshalIndent, handlers/BaseHandler.go:149). */
  def toJsonPretty(v: Any, indent: Int = 0): String = v match {
    case m: Map[_, _] if m.nonEmpty =>
      val pad2 = "  " * (indent + 1)
      m.asInstanceOf[Map[String, Any]]
        .map { case (k, x) => s"$pad2${toJson(k)}: ${toJsonPretty(x, indent + 1)}" }
        .mkString("{\n", ",\n", "\n" + "  " * indent + "}")
    case xs: Seq[_] if xs.nonEmpty =>
      val pad2 = "  " * (indent + 1)
      xs.map(x => pad2 + toJsonPretty(x, indent + 1))
        .mkString("[\n", ",\n", "\n" + "  " * indent + "]")
    case other => toJson(other)
  }
}
