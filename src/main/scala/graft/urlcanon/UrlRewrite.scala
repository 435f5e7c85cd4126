package graft.urlcanon

/**
 * The reference's URL normalization pipeline, re-expressed as pure Scala.
 *
 * Emission-form semantics follow `/root/reference/spiderfetch/urlrewrite.py`
 * exactly (break strip :62-64, scheme rewrite :13-25, credential
 * propagation :27-35,72-75, relative resolution :81-84, fragment drop :78,
 * space quoting :86, null drop :87-90). The emission form is the crawl
 * parity surface: the reference's seen-set/dump/queue all key on it.
 *
 * The north-rule canonical form (scheme+host lowercasing, default-port
 * strip, dot-segment path normalization) is a SEPARATE derived key used for
 * partitioning, politeness and sketch routing — never for parity emission.
 */
object UrlRewrite {

  /** rewrite_scheme (`urlrewrite.py:21-25`): regex-search `(ftp|http|https)$`
    * inside the scheme — `xhttp`→`http`, `myftp`→`ftp`; unknown schemes pass
    * through unchanged. */
  private val SchemeRx = java.util.regex.Pattern.compile("(ftp|http|https)$")

  def rewriteScheme(scheme: String): String = {
    val m = SchemeRx.matcher(scheme)
    if (m.find()) m.group(1) else scheme
  }

  /** assemble_netloc (`urlrewrite.py:27-35`). */
  def assembleNetloc(username: Option[String], password: Option[String],
                     hostname: Option[String], port: Option[Int]): String = {
    var netloc = hostname.getOrElse("")
    username.filter(_.nonEmpty).foreach { user =>
      val u = password.filter(_.nonEmpty) match {
        case Some(p) => s"$user:$p"
        case None    => user
      }
      netloc = s"$u@$netloc"
    }
    port.foreach(p => netloc = s"$netloc:$p")
    netloc
  }

  /** rewrite_urls (`urlrewrite.py:59-88`) for a single extracted URL.
    * Returns None for URLs that reduce to empty (e.g. fragment-only). */
  def rewriteOne(originUrl: String, rawUrl: String): Option[String] = {
    val origin = PyUrl.urlsplit(originUrl)
    var u = rawUrl
    if (u != null && u.nonEmpty) u = u.replaceAll("[\n\t]", "")
    if (u == null) u = ""

    val pack = PyUrl.urlsplit(u)
    val scheme = rewriteScheme(pack.scheme)

    var netloc = pack.netloc
    if (origin.username.exists(_.nonEmpty) && pack.hostname == origin.hostname) {
      netloc = assembleNetloc(origin.username, origin.password,
        pack.hostname, pack.port)
    }

    var newU = PyUrl.urlunsplit(scheme, netloc, pack.path, pack.query, "")

    // no scheme or netloc: it's a path on-site -> RFC-join to origin
    if (scheme.isEmpty && netloc.isEmpty && (pack.path.nonEmpty || pack.query.nonEmpty)) {
      val pathQuery = PyUrl.urlunsplit("", "", pack.path, pack.query, "")
      newU = PyUrl.urljoin(originUrl, pathQuery)
    }

    newU = newU.replace(" ", "%20")
    if (newU.nonEmpty) Some(newU) else None
  }

  /** rewrite_urls over a list, order-preserving, nulls dropped. */
  def rewriteUrls(originUrl: String, urls: Seq[String]): Seq[String] =
    urls.flatMap(u => rewriteOne(originUrl, u))

  /** url_to_filename (`urlrewrite.py:92-104`), ORIG_FILENAMES=0 branch. */
  def urlToFilename(url: String): String = {
    val p = PyUrl.urlsplit(url)
    val (path, ext) = PyUrl.splitext(p.path)
    val joined = Seq(p.scheme, p.netloc, path, p.query)
      .filter(_.nonEmpty).mkString("_")
    val flat = joined.replaceAll("[^a-zA-Z0-9]", "_")
      .replaceAll("_{2,}", "_")
      .replaceAll("_$", "")
    flat + ext
  }

  /** hostname_to_filename (`urlrewrite.py:106-107`). */
  def hostnameToFilename(host: String): String =
    host.replaceAll("[^a-zA-Z0-9]", "_")

  /** truncate_url (`urlrewrite.py:50-57`, P8): middle-ellipsis display
    * truncation — keep ceil((width-3)/2) head chars + "..." +
    * floor((width-3)/2) tail chars when the URL exceeds `width`. */
  def truncateUrl(width: Int, s: String): String =
    if (s.length > width) {
      val w = width - 3
      val half = w / 2
      s.substring(0, half + w % 2) + "..." + s.substring(s.length - half)
    } else s

  /** Column twin of truncateUrl (codegen'd; width is a plan literal). */
  def truncateUrlCol(url: org.apache.spark.sql.Column, width: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val w = width - 3
    val half = w / 2
    val prefix = half + w % 2
    when(length(url) > width,
      concat(substring(url, 1, prefix), lit("..."),
        substring(url, -half, half)))
      .otherwise(url)
  }

  private val DefaultPorts = Map("http" -> 80, "https" -> 443, "ftp" -> 21)

  /** North-rule canonical key: lowercase scheme (already) + host, strip
    * default port, remove dot segments, empty path -> "/", drop fragment.
    * NOT part of the reference-parity surface. */
  def canonicalUrl(url: String): String = {
    val p = PyUrl.urlsplit(url)
    if (p.netloc.isEmpty && p.scheme.isEmpty) return url // relative/opaque: leave as-is
    val host = p.hostname.getOrElse("")
    val keepPort = p.port.filterNot(pt => DefaultPorts.get(p.scheme).contains(pt))
    val userinfo = {
      val at = p.netloc.lastIndexOf('@')
      if (at >= 0) p.netloc.substring(0, at + 1) else ""
    }
    val netloc = userinfo + host + keepPort.map(":" + _).getOrElse("")
    val path0 = if (p.path.isEmpty) "/" else p.path
    val normPath = removeDotSegments(path0)
    PyUrl.urlunsplit(p.scheme, netloc, normPath, p.query, "")
  }

  /** Canonical host for partitioning / politeness keys. */
  def canonicalHost(url: String): String =
    PyUrl.getHostname(url).getOrElse("")

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path. */
  private[urlcanon] def removeDotSegments(path: String): String = {
    if (!path.contains('.')) return path
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "."  => ()
        case ".." => if (out.nonEmpty && out.last.nonEmpty) out.remove(out.length - 1)
                     else if (out.nonEmpty && out.last.isEmpty) () // at root, drop
        case s    => out += s
      }
      i += 1
    }
    var joined = out.mkString("/")
    if (path.startsWith("/") && !joined.startsWith("/")) joined = "/" + joined
    if ((segs.last == "." || segs.last == "..") && !joined.endsWith("/")) joined += "/"
    if (joined.isEmpty) "/" else joined
  }
}
