package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the Common-Crawl-pipeline pre-dedup step:
  * the same page arrives under `HTTP://Example.com:80/a/?utm_source=x`
  * and `http://example.com/a`, and URL-level dedup (the cheapest dedup
  * tier, upstream of content hashing) only works if both map to one
  * canonical string. Rules, chosen to be SAFE (two URLs only merge
  * when they provably name the same resource) and deterministic:
  *
  *  - scheme and HOST lowercase (RFC 3986 §6.2.2.1); userinfo kept;
  *  - default ports stripped (:80 http, :443 https);
  *  - fragment dropped (never sent to the server);
  *  - empty path → "/", trailing slash stripped off non-root paths;
  *  - tracking params dropped (utm_* prefix, fbclid, gclid, msclkid),
  *    remaining query params SORTED (param order is almost never
  *    semantic; sorting is what makes the canonical form a dedup key),
  *    empty params dropped, '?' dropped when nothing survives;
  *  - dot-segment resolution and percent-decoding are deliberately NOT
  *    applied (both can change semantics on hostile inputs);
  *  - inputs without a `scheme://` are returned trimmed as-is — a
  *    relative or garbage string cannot be canonicalized safely, and
  *    returning it unchanged keeps dedup grouping exact strings;
  *  - non-http(s) schemes lowercase the scheme only.
  */
object UrlCanon {

  private val TrackingExact = Set("fbclid", "gclid", "msclkid")

  private def isTracking(param: String): Boolean = {
    val name = param.indexOf('=') match {
      case -1 => param
      case i => param.substring(0, i)
    }
    val n = name.toLowerCase(java.util.Locale.ROOT)
    n.startsWith("utm_") || TrackingExact.contains(n)
  }

  def canonicalize(raw: String): String = {
    val s = raw.trim
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return s
    val scheme = s.substring(0, schemeEnd)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')
        || !scheme.head.isLetter) return s
    val lcScheme = scheme.toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(schemeEnd + 3)
    if (lcScheme != "http" && lcScheme != "https") return s"$lcScheme://$rest"

    // authority ends at the first '/', '?', or '#'
    val authEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
      case -1 => rest.length
      case i => i
    }
    val auth = rest.substring(0, authEnd)
    val tail = rest.substring(authEnd)
    val (userinfo, hostPort) = auth.lastIndexOf('@') match {
      case -1 => ("", auth)
      case i => (auth.substring(0, i + 1), auth.substring(i + 1))
    }
    // port split must not cut inside an IPv6 literal [::1]:8080
    val portIdx = hostPort.lastIndexOf(':')
    val bracketEnd = hostPort.lastIndexOf(']')
    val (host, port) =
      if (portIdx > bracketEnd && portIdx >= 0)
        (hostPort.substring(0, portIdx), hostPort.substring(portIdx))
      else (hostPort, "")
    val defaultPort = if (lcScheme == "http") ":80" else ":443"
    val canonAuth = userinfo + host.toLowerCase(java.util.Locale.ROOT) +
      (if (port == defaultPort) "" else port)

    // split tail into path / query, drop fragment
    val noFrag = tail.indexOf('#') match {
      case -1 => tail
      case i => tail.substring(0, i)
    }
    val (path0, query) = noFrag.indexOf('?') match {
      case -1 => (noFrag, "")
      case i => (noFrag.substring(0, i), noFrag.substring(i + 1))
    }
    val path =
      if (path0.isEmpty) "/"
      else if (path0.length > 1 && path0.endsWith("/")) path0.dropRight(1)
      else path0
    val params = query.split("&").toSeq
      .filter(_.nonEmpty).filterNot(isTracking).sorted
    val canonQuery = if (params.isEmpty) "" else params.mkString("?", "&", "")
    s"$lcScheme://$canonAuth$path$canonQuery"
  }
}

/** string → canonical-URL string, one pass, null-propagating — the
  * fused data-path form (a Scala UDF would pay SerDe per row across a
  * 100 TB crawl manifest). */
case class UrlCanonExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_canonical_url"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      UrlCanon.canonicalize(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
