package graft.urlcanon

/**
 * Pure-Scala port of the CPython `urllib.parse` primitives the reference
 * engine's URL semantics are built on (`urlsplit`, `urlunsplit`, `urljoin`
 * incl. params handling), plus small accessors mirroring
 * `/root/reference/spiderfetch/urlrewrite.py:37-48` (`get_hostname`,
 * `get_scheme`, `get_referer`).
 *
 * Why a hand port: Java's `java.net.URI.resolve` diverges from Python
 * `urljoin` on dot-segment corner cases (`..` beyond root, trailing
 * `.`/`..`, empty middle segments), and the crawl parity contract requires
 * bit-exact URL emission. Behavior is golden-tested against CPython 3.11
 * outputs (src/test/resources/url*_goldens.jsonl).
 *
 * Everything here is a pure function on Strings — safe to call from typed
 * `Dataset.map` lambdas (serializable, no state).
 */
final case class SplitUrl(
    scheme: String,
    netloc: String,
    path: String,
    query: String,
    fragment: String) {

  /** Mirrors Python SplitResult._hostinfo + .hostname (lowercased). */
  def hostname: Option[String] = {
    val hostinfo = netloc.substring(netloc.lastIndexOf('@') + 1)
    val host =
      if (hostinfo.startsWith("[")) {
        val close = hostinfo.indexOf(']')
        if (close >= 0) hostinfo.substring(1, close) else hostinfo.substring(1)
      } else {
        val colon = hostinfo.indexOf(':')
        if (colon >= 0) hostinfo.substring(0, colon) else hostinfo
      }
    if (host.isEmpty) None else Some(host.toLowerCase)
  }

  /** Port digits after the first ':' of hostinfo; None when absent/invalid. */
  def port: Option[Int] = {
    val hostinfo = netloc.substring(netloc.lastIndexOf('@') + 1)
    val portStr =
      if (hostinfo.startsWith("[")) {
        val close = hostinfo.indexOf(']')
        if (close >= 0 && close + 1 < hostinfo.length && hostinfo.charAt(close + 1) == ':')
          hostinfo.substring(close + 2)
        else ""
      } else {
        val colon = hostinfo.indexOf(':')
        if (colon >= 0) hostinfo.substring(colon + 1) else ""
      }
    if (portStr.nonEmpty && portStr.forall(_.isDigit)) {
      val p = BigInt(portStr)
      if (p >= 0 && p <= 65535) Some(p.toInt) else None
    } else None
  }

  /** Userinfo before the last '@'; None when no '@' in netloc. */
  def username: Option[String] = {
    val at = netloc.lastIndexOf('@')
    if (at < 0) None
    else {
      val userinfo = netloc.substring(0, at)
      val colon = userinfo.indexOf(':')
      Some(if (colon >= 0) userinfo.substring(0, colon) else userinfo)
    }
  }

  def password: Option[String] = {
    val at = netloc.lastIndexOf('@')
    if (at < 0) None
    else {
      val userinfo = netloc.substring(0, at)
      val colon = userinfo.indexOf(':')
      if (colon >= 0) Some(userinfo.substring(colon + 1)) else None
    }
  }

  def unsplit: String = PyUrl.urlunsplit(scheme, netloc, path, query, fragment)
}

object PyUrl {

  private val SchemeChars: Set[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq('+', '-', '.')).toSet

  /** Schemes that honor relative-path joining (CPython uses_relative). */
  private val UsesRelative = Set(
    "", "ftp", "http", "gopher", "nntp", "imap", "wais", "file", "https",
    "shttp", "mms", "prospero", "rtsp", "rtspu", "sftp", "svn", "svn+ssh",
    "ws", "wss")

  /** Schemes with a network location (CPython uses_netloc). */
  private val UsesNetloc = Set(
    "", "ftp", "http", "gopher", "nntp", "telnet", "imap", "wais", "file",
    "mms", "https", "shttp", "snews", "prospero", "rtsp", "rtspu", "rsync",
    "svn", "svn+ssh", "sftp", "nfs", "git", "git+ssh", "ws", "wss",
    "itms-services")

  /** Schemes whose last path segment may carry ;params (CPython uses_params). */
  private val UsesParams = Set(
    "", "ftp", "hdl", "prospero", "http", "imap", "https", "shttp", "rtsp",
    "rtspu", "sip", "sips", "mms", "sftp", "tel")

  /** CPython strips ASCII tab/CR/LF anywhere in the URL before parsing. */
  private def stripUnsafe(url: String): String =
    if (url.exists(c => c == '\t' || c == '\r' || c == '\n'))
      url.filterNot(c => c == '\t' || c == '\r' || c == '\n')
    else url

  /** Port of urllib.parse.urlsplit (allow_fragments=True). */
  def urlsplit(rawUrl: String, defaultScheme: String = ""): SplitUrl = {
    var url = stripUnsafe(rawUrl)
    var scheme = defaultScheme
    var netloc = ""
    var query = ""
    var fragment = ""

    val i = url.indexOf(':')
    if (i > 0 && url.charAt(0).isLetter && url.charAt(0) < 128 &&
        url.substring(1, i).forall(SchemeChars.contains)) {
      scheme = url.substring(0, i).toLowerCase
      url = url.substring(i + 1)
    }
    if (url.startsWith("//")) {
      val delim = url.indexWhere(c => c == '/' || c == '?' || c == '#', 2) match {
        case -1 => url.length
        case d  => d
      }
      netloc = url.substring(2, delim)
      url = url.substring(delim)
    }
    val hash = url.indexOf('#')
    if (hash >= 0) { fragment = url.substring(hash + 1); url = url.substring(0, hash) }
    val qm = url.indexOf('?')
    if (qm >= 0) { query = url.substring(qm + 1); url = url.substring(0, qm) }
    SplitUrl(scheme, netloc, url, query, fragment)
  }

  /** Port of urllib.parse.urlunsplit. */
  def urlunsplit(scheme: String, netloc: String, path: String,
                 query: String, fragment: String): String = {
    var url = path
    if (netloc.nonEmpty || (url.nonEmpty && url.startsWith("//"))) {
      if (url.nonEmpty && !url.startsWith("/")) url = "/" + url
      url = "//" + netloc + url
    }
    if (scheme.nonEmpty) url = scheme + ":" + url
    if (query.nonEmpty) url = url + "?" + query
    if (fragment.nonEmpty) url = url + "#" + fragment
    url
  }

  /** urlparse's extra step: split ;params off the last path segment. */
  private def splitParams(path: String): (String, String) = {
    val from = math.max(path.lastIndexOf('/'), 0)
    val i = path.indexOf(';', from)
    if (i < 0) (path, "") else (path.substring(0, i), path.substring(i + 1))
  }

  private def unparse(scheme: String, netloc: String, path: String,
                      params: String, query: String, fragment: String): String = {
    val p = if (params.nonEmpty) path + ";" + params else path
    urlunsplit(scheme, netloc, p, query, fragment)
  }

  /** Port of urllib.parse.urljoin (CPython 3.x RFC-3986-style resolver). */
  def urljoin(base: String, url: String): String = {
    if (base.isEmpty) return url
    if (url.isEmpty) return base

    val b = urlsplit(base)
    val (bpath, bparams) =
      if (UsesParams.contains(b.scheme) && b.path.contains(';')) splitParams(b.path)
      else (b.path, "")

    val u = urlsplit(url, defaultScheme = b.scheme)
    val (upath, uparams) =
      if (UsesParams.contains(u.scheme) && u.path.contains(';')) splitParams(u.path)
      else (u.path, "")

    if (u.scheme != b.scheme || !UsesRelative.contains(u.scheme)) return url

    var netloc = u.netloc
    if (UsesNetloc.contains(u.scheme)) {
      if (u.netloc.nonEmpty)
        return unparse(u.scheme, u.netloc, upath, uparams, u.query, u.fragment)
      netloc = b.netloc
    }

    if (upath.isEmpty && uparams.isEmpty) {
      val query = if (u.query.isEmpty) b.query else u.query
      return unparse(u.scheme, netloc, bpath, bparams, query, u.fragment)
    }

    // CPython walks bpath from urlparse (;params already stripped)
    val baseParts = {
      val parts = bpath.split("/", -1).toBuffer
      if (parts.nonEmpty && parts.last != "") parts.remove(parts.length - 1)
      parts
    }
    val segments: Vector[String] =
      if (upath.startsWith("/")) upath.split("/", -1).toVector
      else {
        val own = upath.split("/", -1).toVector
        val joined = baseParts.toVector ++ own
        if (joined.length > 2)
          joined.head +: joined.slice(1, joined.length - 1).filter(_.nonEmpty) :+ joined.last
        else joined
      }

    val resolved = scala.collection.mutable.ArrayBuffer.empty[String]
    segments.foreach {
      case ".." => if (resolved.nonEmpty) resolved.remove(resolved.length - 1)
      case "."  => ()
      case seg  => resolved += seg
    }
    if (segments.nonEmpty && (segments.last == "." || segments.last == ".."))
      resolved += ""

    val joinedPath = { val p = resolved.mkString("/"); if (p.isEmpty) "/" else p }
    unparse(u.scheme, netloc, joinedPath, uparams, u.query, u.fragment)
  }

  /** get_hostname (`urlrewrite.py:37-39`): lowercased host or None. */
  def getHostname(url: String): Option[String] = urlsplit(url).hostname

  /** get_scheme (`urlrewrite.py:41-43`). */
  def getScheme(url: String): String = urlsplit(url).scheme

  /** path plus '?'+query when a query exists — the robots.txt match
    * target (RFC 9309 matches rules against the path-and-query). */
  def pathQuery(url: String): String = {
    val s = urlsplit(url)
    if (s.query.nonEmpty) s.path + "?" + s.query else s.path
  }

  /** Python os.path.dirname. */
  private[urlcanon] def dirname(path: String): String = {
    val i = path.lastIndexOf('/')
    if (i < 0) ""
    else {
      val head = path.substring(0, i + 1)
      if (head.nonEmpty && !head.forall(_ == '/')) head.reverse.dropWhile(_ == '/').reverse
      else head
    }
  }

  /** get_referer (`urlrewrite.py:45-48`): origin directory of a URL. */
  def getReferer(url: String): String = {
    val p = urlsplit(url)
    urlunsplit(p.scheme, p.netloc, dirname(p.path), "", "")
  }

  /** Python os.path.splitext over a path. */
  private[urlcanon] def splitext(p: String): (String, String) = {
    val sepIndex = p.lastIndexOf('/')
    val dotIndex = p.lastIndexOf('.')
    if (dotIndex > sepIndex) {
      // skip all-dots filename prefixes (".bashrc" has no ext)
      var filenameIndex = sepIndex + 1
      while (filenameIndex < dotIndex) {
        if (p.charAt(filenameIndex) != '.')
          return (p.substring(0, dotIndex), p.substring(dotIndex))
        filenameIndex += 1
      }
    }
    (p, "")
  }
}
