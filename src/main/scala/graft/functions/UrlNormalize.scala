package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for crawl deduplication — the step that runs
  * BEFORE content dedup in a pretraining pipeline: the same page
  * arrives under `HTTPS://Host.COM:443/x/?b=2&a=1&utm_source=feed#top`
  * and `https://host.com/x?a=1&b=2`, and only a canonical form lets a
  * hash-groupBy collapse them. Rules (RFC 3986 §6 normalization plus
  * the crawl conventions):
  *
  *  - scheme and host lowercase; only http/https accepted (anything
  *    else → NULL — not a crawlable URL);
  *  - default ports stripped (`:80` http, `:443` https);
  *  - fragment removed;
  *  - tracking params dropped (`utm_*`, `gclid`, `fbclid`), remaining
  *    query params SORTED by key (stable — equal keys keep their
  *    relative order);
  *  - empty path → `/`; a non-root trailing slash is dropped.
  *
  * Malformed input → NULL, never a throw (the media-decoder
  * discipline). Pure string slicing — no regex, no java.net.URL (whose
  * equals() does DNS lookups — a famous scan-killer).
  */
object UrlNormalize {

  def normalize(url: String): String = {
    if (url == null) return null
    val si = url.indexOf("://")
    if (si <= 0) return null
    val scheme = url.substring(0, si).toLowerCase(java.util.Locale.ROOT)
    if (scheme != "http" && scheme != "https") return null
    var rest = url.substring(si + 3)
    val hi = rest.indexOf('#')
    if (hi >= 0) rest = rest.substring(0, hi)
    val pi = rest.indexWhere(c => c == '/' || c == '?')
    val (auth, pathq) =
      if (pi < 0) (rest, "") else (rest.substring(0, pi), rest.substring(pi))
    if (auth.isEmpty) return null
    var host = auth.toLowerCase(java.util.Locale.ROOT)
    // port handling per RFC 3986 §6.2.3: the separator after the LAST
    // ']' (IPv6 literals carry ':' inside brackets) splits host/port;
    // an EMPTY port is dropped, digits parse numerically (so ':080'
    // equals ':80' — a literal string compare would canonicalize the
    // same page to two keys), default ports vanish, non-defaults keep
    // their canonical digits, and a non-numeric port is malformed
    val portFrom = host.lastIndexOf(']') + 1
    val ci = host.indexOf(':', portFrom)
    if (ci >= 0) {
      val portStr = host.substring(ci + 1)
      host = host.substring(0, ci)
      if (portStr.nonEmpty) {
        if (!portStr.forall(_.isDigit) || portStr.length > 9) return null
        val port = portStr.toInt
        val default = if (scheme == "http") 80 else 443
        if (port != default) host = host + ":" + port
      }
    }
    // "https://:443/x" survives the auth check but strips to no host —
    // that is a malformed URL, not a canonical form
    if (host.isEmpty || host.startsWith(":")) return null
    val qi = pathq.indexOf('?')
    var path = if (qi < 0) pathq else pathq.substring(0, qi)
    val query = if (qi < 0) "" else pathq.substring(qi + 1)
    if (path.isEmpty) path = "/"
    if (path.length > 1 && path.endsWith("/")) path = path.dropRight(1)
    val kept = query.split('&').filter(_.nonEmpty).filterNot { p =>
      val k = p.takeWhile(_ != '=').toLowerCase(java.util.Locale.ROOT)
      k.startsWith("utm_") || k == "gclid" || k == "fbclid"
    }.sortBy(_.takeWhile(_ != '=')) // stable: equal keys keep order
    scheme + "://" + host + path +
      (if (kept.isEmpty) "" else "?" + kept.mkString("&"))
  }

  /** Codegen call target over UTF8String. */
  def normalizeUtf8(url: UTF8String): UTF8String = {
    val r = normalize(if (url == null) null else url.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
}

/** `url_normalize(string)` — see [[UrlNormalize]]. */
case class UrlNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"url_normalize requires string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true // malformed URLs normalize to null
  override def prettyName: String = "url_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UrlNormalize.normalizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u => s"""
      ${ev.value} = graft.functions.UrlNormalize.normalizeUtf8($u);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): UrlNormalizeExpr =
    copy(child = newChild)
}
