package graft.urlcanon

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5.3) over generated URLs. */
class UrlPropertySpec extends AnyFunSuite {

  private val genHost: Gen[String] = for {
    a <- Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty)
    tld <- Gen.oneOf("test", "example", "org")
  } yield s"$a.$tld"

  private val genPathSeg: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty),
      Gen.const("."), Gen.const(".."))

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "ftp", "HTTP", "xhttp")
    host <- genHost
    hostCase <- Gen.oneOf(host, host.toUpperCase)
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOfN(3, genPathSeg)
    q <- Gen.oneOf("", "?a=1", "?a=1&b=2")
    f <- Gen.oneOf("", "#frag")
  } yield s"$scheme://$hostCase$port/${segs.mkString("/")}$q$f"

  private val genRelative: Gen[String] = for {
    segs <- Gen.listOfN(3, genPathSeg)
    q <- Gen.oneOf("", "?x=1")
  } yield s"${segs.mkString("/")}$q"

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("canonicalUrl is idempotent") {
    check("canon-idem", Prop.forAll(genUrl) { u =>
      val c = UrlRewrite.canonicalUrl(u)
      UrlRewrite.canonicalUrl(c) == c
    })
  }

  test("canonical host is lowercase and portless default ports are stripped") {
    check("canon-host", Prop.forAll(genUrl) { u =>
      val c = UrlRewrite.canonicalUrl(u)
      val h = PyUrl.urlsplit(c).hostname.getOrElse("")
      h == h.toLowerCase &&
        !(c.startsWith("http://") && c.contains(":80/")) &&
        !(c.startsWith("https://") && c.contains(":443/"))
    })
  }

  test("rewriteOne emission: split/unsplit round-trip stable (second rewrite no-op)") {
    check("rewrite-stable", Prop.forAll(genUrl, genRelative) { (origin, rel) =>
      UrlRewrite.rewriteOne(origin, rel) match {
        case None => true
        case Some(u) =>
          // rewriting an already-emitted absolute URL is a no-op
          UrlRewrite.rewriteOne(origin, u).contains(u) ||
            // exception: scheme-rewritable or credential-propagating origins
            origin.contains("@") || u.startsWith("x") || origin.startsWith("x")
      }
    })
  }

  test("urljoin never produces dot segments for http bases") {
    check("join-no-dots", Prop.forAll(genHost, genRelative) { (host, rel) =>
      val joined = PyUrl.urljoin(s"http://$host/a/b/c.html", rel)
      val path = PyUrl.urlsplit(joined).path
      !path.split("/").contains("..") || rel.startsWith("..")
      // leading .. beyond root are dropped by the resolver
    })
  }

  test("fragments never survive the rewrite pipeline") {
    check("frag-drop", Prop.forAll(genUrl) { u =>
      UrlRewrite.rewriteOne("http://base.test/a/b.html", u)
        .forall(out => !out.contains("#"))
    })
  }

  test("urlToFilename output is shell-safe [A-Za-z0-9_.]") {
    check("filename-safe", Prop.forAll(genUrl) { u =>
      UrlRewrite.urlToFilename(u).forall(c =>
        c.isLetterOrDigit || c == '_' || c == '.')
    })
  }
}
