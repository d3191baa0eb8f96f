package graft.dfl

/** Token stream for DFL source.
  *
  * Comment lines (`# ...`) are stripped first, mirroring the reference's
  * `RemoveComments` preprocessor (reference: config/Dfl.go:53). Strings may
  * be single-, double-, or backtick-quoted (reference: named/named.go:20 uses
  * backticks inside a set literal). Bare words (`bar`, `FeatureCollection`,
  * `%taco%`) lex as words and the parser decides whether they are keywords,
  * function names, or string literals (reference: examples/bars.dfl:8,
  * examples/mexican.dfl:8).
  */
object Lexer {
  sealed trait Token
  final case class TWord(s: String) extends Token       // bare word / ident
  final case class TString(s: String) extends Token     // quoted string
  final case class TInt(v: Long) extends Token
  final case class TFloat(v: Double) extends Token
  final case class TOp(s: String) extends Token         // punctuation/operator
  case object TEof extends Token

  private val multiCharOps = List(
    "?.", "?:", ":=", "+=", "-=", "==", "!=", "<=", ">=",
  )
  private val singleCharOps = "()[]{},:|?.+-*/%<>=@$!"

  def stripComments(src: String): String =
    src.linesIterator.map { line =>
      // a '#' inside a quoted string must survive; scan minimally
      var inQuote: Char = 0
      var i = 0
      var cut = -1
      while (i < line.length && cut < 0) {
        val c = line.charAt(i)
        if (inQuote != 0) {
          if (c == '\\') i += 1
          else if (c == inQuote) inQuote = 0
        } else if (c == '\'' || c == '"' || c == '`') inQuote = c
        else if (c == '#') cut = i
        i += 1
      }
      if (cut >= 0) line.substring(0, cut) else line
    }.mkString("\n")

  def lex(srcRaw: String): Vector[Token] = {
    val src = stripComments(srcRaw)
    val out = Vector.newBuilder[Token]
    var i = 0
    var prevWord = "" // last bare word, for like/ilike pattern position
    val n = src.length
    def peek(k: Int): Char = if (i + k < n) src.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"' || c == '`') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = src.charAt(i)
          if (d == '\\' && i + 1 < n) { sb.append(src.charAt(i + 1)); i += 2 }
          else if (d == c) { closed = true; i += 1 }
          else { sb.append(d); i += 1 }
        }
        if (!closed) throw new DflParseException(s"unterminated string at offset $i")
        out += TString(sb.toString)
      } else if (c.isDigit) {
        val start = i
        while (i < n && src.charAt(i).isDigit) i += 1
        if (i < n && src.charAt(i) == '.' && i + 1 < n && src.charAt(i + 1).isDigit) {
          i += 1
          while (i < n && src.charAt(i).isDigit) i += 1
          out += TFloat(src.substring(start, i).toDouble)
        } else out += TInt(src.substring(start, i).toLong)
      } else if (c.isLetter || c == '_' || c == '%' && peek(1).isLetter) {
        // bare word: letters, digits, '_'. '%' joins the word only at the
        // start or when the word follows like/ilike (pattern position,
        // e.g. `%taco%`, `ta%co`) — otherwise `@qty%2` must lex as
        // qty MOD 2, not one attribute name
        val inPattern = prevWord == "like" || prevWord == "ilike" || c == '%'
        val start = i
        while (i < n && { val d = src.charAt(i)
          d.isLetterOrDigit || d == '_' || (d == '%' && inPattern) }) i += 1
        val w = src.substring(start, i)
        prevWord = w
        out += TWord(w)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (multiCharOps.contains(two)) { out += TOp(two); i += 2 }
        else if (singleCharOps.indexOf(c) >= 0) { out += TOp(c.toString); i += 1 }
        else throw new DflParseException(s"unexpected character '$c' at offset $i")
      }
    }
    out += TEof
    out.result()
  }
}

class DflParseException(msg: String) extends RuntimeException(msg)
