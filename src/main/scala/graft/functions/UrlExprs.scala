package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `canon_url(url)` — URL canonicalization for web-corpus dedup keys:
  * two spellings of the same page must hash to one key, or URL-level
  * dedup silently keeps both copies. Rules (each is a standard
  * crawl-dedup normalization, applied in this order):
  *
  *   1. scheme and host lowercase (case-insensitive by RFC 3986);
  *   2. a leading `www.` strips off the host;
  *   3. default ports drop (`:80` for http, `:443` for https; other
  *      ports are meaningful and stay);
  *   4. the fragment (`#…`) drops — never sent to the server;
  *   5. query parameters: tracking params drop (`utm_*`, `fbclid`,
  *      `gclid`, `ref`), the rest SORT lexicographically (param order
  *      is almost never semantic; sorting makes it canonical), empty
  *      params drop, and an emptied query drops its `?`;
  *   6. trailing `/` strips from the path (`/a/b/` ≡ `/a/b`; the root
  *      path canonicalizes to no path at all).
  *
  * Path case and internal duplicate slashes are PRESERVED — they can be
  * semantic, and a canonicalizer must never merge two genuinely
  * different pages. A string without a valid `scheme://` is NULL (not
  * a URL — the caller decides whether that row drops or keeps its raw
  * key). Hand-rolled string surgery, not java.net.URI: URI throws on
  * the malformed-but-common URLs a crawl actually contains, and a
  * canonicalizer that throws mid-scan is useless at corpus scale.
  * Row-local, codegen'd — a scan-time projection. */
case class CanonUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "canon_url"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"canon_url needs a string url, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    UrlOps.canonical(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("canon")
      s"""
         |UTF8String $r = graft.functions.UrlOps.canonical($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlOps {
  private val trackedNames = Set("fbclid", "gclid", "ref")

  private def isTracked(param: String): Boolean = {
    val name = param.indexOf('=') match {
      case -1 => param
      case i => param.substring(0, i)
    }
    val n = name.toLowerCase(java.util.Locale.ROOT)
    n.startsWith("utm_") || trackedNames(n)
  }

  private def validScheme(s: String): Boolean =
    s.nonEmpty && s.head.isLetter &&
      s.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')

  def canonical(u: UTF8String): UTF8String = {
    val out = canonical(u.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  def canonical(raw: String): String = {
    val s = raw.trim
    val sep = s.indexOf("://")
    if (sep <= 0) return null
    val scheme = s.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    if (!validScheme(scheme)) return null
    val rest = s.substring(sep + 3)
    if (rest.isEmpty) return null
    // authority ends at the first '/', '?', or '#'
    var aEnd = 0
    while (aEnd < rest.length && rest(aEnd) != '/' && rest(aEnd) != '?' &&
           rest(aEnd) != '#') aEnd += 1
    val authority = rest.substring(0, aEnd)
    if (authority.isEmpty) return null
    val tail = rest.substring(aEnd)
    // userinfo@ passes through untouched; host[:port] canonicalizes
    val (userinfo, hostPort) = authority.lastIndexOf('@') match {
      case -1 => ("", authority)
      case i => (authority.substring(0, i + 1), authority.substring(i + 1))
    }
    val (host0, port) = hostPort.lastIndexOf(':') match {
      case -1 => (hostPort, "")
      case i if hostPort.substring(i + 1).forall(_.isDigit) =>
        (hostPort.substring(0, i), hostPort.substring(i + 1))
      case _ => (hostPort, "")
    }
    var host = host0.toLowerCase(java.util.Locale.ROOT)
    if (host.startsWith("www.") && host.length > 4) host = host.substring(4)
    if (host.isEmpty) return null
    val keepPort = port.nonEmpty &&
      !(scheme == "http" && port == "80") &&
      !(scheme == "https" && port == "443")
    // split tail into path / query, drop fragment
    val noFrag = tail.indexOf('#') match {
      case -1 => tail
      case i => tail.substring(0, i)
    }
    val (path0, query0) = noFrag.indexOf('?') match {
      case -1 => (noFrag, "")
      case i => (noFrag.substring(0, i), noFrag.substring(i + 1))
    }
    var path = path0
    while (path.endsWith("/")) path = path.substring(0, path.length - 1)
    val params = query0.split("&").toSeq
      .filter(_.nonEmpty).filterNot(isTracked).sorted
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(userinfo).append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (params.nonEmpty) sb.append('?').append(params.mkString("&"))
    sb.toString
  }
}

object UrlF {
  /** Canonical dedup key of a URL column (see [[CanonUrl]]). */
  def canonUrl(url: Column): Column =
    Bridge.column(CanonUrl(Bridge.expression(url)))
}
