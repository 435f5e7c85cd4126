package graft.engine

import graft.SparkTestSession
import graft.model.RobotsRule
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt parsing (round-3 verdict #7), RFC 9309 group selection +
  * wildcard/`$` pattern matching (round-4 verdict #2 / advice #1), and
  * end-to-end admission through the Scheduler's filter. */
class RobotsSpec extends AnyFunSuite {

  private val H = "h0.test"

  test("basic allow/disallow group for *") {
    val txt =
      """User-agent: *
        |Disallow: /private
        |Allow: /private/pub
        |""".stripMargin
    assert(Robots.parse(H, txt) == Seq(
      RobotsRule(H, "/private", allow = false),
      RobotsRule(H, "/private/pub", allow = true)))
  }

  test("RFC 9309 §2.2.1: a named agent obeys ONLY its most-specific group") {
    val txt =
      """User-agent: evilbot
        |Disallow: /
        |
        |User-agent: somebot
        |User-agent: *
        |Disallow: /tmp
        |
        |User-agent: nice-bot
        |Allow: /everything
        |""".stripMargin
    assert(Robots.parse(H, txt) == Seq(RobotsRule(H, "/tmp", allow = false)))
    // named group matches => the * group does NOT apply (round-4 advice #1:
    // the old union let a named agent inherit * allowances/blocks)
    assert(Robots.parse(H, txt, agent = "EvilBot") == Seq(
      RobotsRule(H, "/", allow = false)))
    // no named group matches => fall back to the * groups
    assert(Robots.parse(H, txt, agent = "unknown-bot") == Seq(
      RobotsRule(H, "/tmp", allow = false)))
  }

  test("RFC 9309 §2.2.1: groups naming the same agent merge") {
    val txt =
      """User-agent: graftbot
        |Disallow: /a
        |
        |User-agent: *
        |Disallow: /star
        |
        |User-agent: GraftBot
        |Disallow: /b
        |""".stripMargin
    assert(Robots.parse(H, txt, agent = "graftbot") == Seq(
      RobotsRule(H, "/a", allow = false),
      RobotsRule(H, "/b", allow = false)))
  }

  test("under-blocking advice case: named Disallow:/ beats * Allow:/public") {
    val txt =
      """User-agent: graftbot
        |Disallow: /
        |
        |User-agent: *
        |Allow: /public
        |""".stripMargin
    val rules = Robots.parse(H, txt, agent = "graftbot")
    assert(rules == Seq(RobotsRule(H, "/", allow = false)))
    assert(!Robots.decide(rules, "/public/page.html"))
  }

  test("comments, CRLF, field-name case, empty disallow") {
    val txt = "# preamble\r\nUSER-AGENT: * # trailing\r\n" +
      "disallow:   \r\n" + // empty = allow all: no rule
      "DisAllow: /a # comment\r\n\r\nallow: /a/b\r\n"
    assert(Robots.parse(H, txt) == Seq(
      RobotsRule(H, "/a", allow = false),
      RobotsRule(H, "/a/b", allow = true)))
  }

  test("rule block ends the agent-line run: a later user-agent starts fresh") {
    val txt =
      """User-agent: *
        |Disallow: /x
        |User-agent: otherbot
        |Disallow: /y
        |""".stripMargin
    // /y belongs to otherbot's NEW group, not to *
    assert(Robots.parse(H, txt) == Seq(RobotsRule(H, "/x", allow = false)))
  }

  test("patterns kept: trailing * stripped, ** collapsed, non-path skipped") {
    val txt =
      """User-agent: *
        |Disallow: /cgi-bin/*
        |Disallow: /*.php$
        |Disallow: /a**b
        |Disallow: relative/path
        |Allow: /ok
        |""".stripMargin
    assert(Robots.parse(H, txt) == Seq(
      RobotsRule(H, "/cgi-bin/", allow = false),
      RobotsRule(H, "/*.php$", allow = false),
      RobotsRule(H, "/a*b", allow = false),
      RobotsRule(H, "/ok", allow = true)))
  }

  test("duplicate patterns: allow wins, patterns stay distinct") {
    val txt =
      """User-agent: *
        |Disallow: /p
        |Allow: /p
        |Disallow: /p
        |""".stripMargin
    val got = Robots.parse(H, txt)
    assert(got == Seq(RobotsRule(H, "/p", allow = true)))
    assert(got.map(_.pathPrefix).distinct.size == got.size)
  }

  // ---- RFC 9309 §2.2.3 / google robots.txt documented example table ----

  test("pattern matching: /fish prefix") {
    val p = "/fish"
    for (path <- Seq("/fish", "/fish.html", "/fish/salmon.html",
        "/fishheads", "/fishheads/yummy.html", "/fish.php?id=anything"))
      assert(Robots.matches(p, path), path)
    for (path <- Seq("/Fish.asp", "/catfish", "/?id=fish"))
      assert(!Robots.matches(p, path), path)
  }

  test("pattern matching: /fish/ directory prefix") {
    val p = "/fish/"
    for (path <- Seq("/fish/", "/fish/?id=anything", "/fish/salmon.htm"))
      assert(Robots.matches(p, path), path)
    for (path <- Seq("/fish", "/fish.html", "/animals/fish/"))
      assert(!Robots.matches(p, path), path)
  }

  test("pattern matching: /*.php wildcard") {
    val p = "/*.php"
    for (path <- Seq("/index.php", "/filename.php", "/folder/filename.php",
        "/folder/filename.php?parameters", "/folder/any.php.file.html",
        "/filename.php/"))
      assert(Robots.matches(p, path), path)
    for (path <- Seq("/", "/windows.PHP"))
      assert(!Robots.matches(p, path), path)
  }

  test("pattern matching: /*.php$ end-anchored") {
    val p = "/*.php$"
    for (path <- Seq("/filename.php", "/folder/filename.php"))
      assert(Robots.matches(p, path), path)
    for (path <- Seq("/filename.php?parameters", "/filename.php/",
        "/filename.php5", "/windows.PHP"))
      assert(!Robots.matches(p, path), path)
  }

  test("pattern matching: /fish*.php mixed literal + wildcard") {
    val p = "/fish*.php"
    for (path <- Seq("/fish.php", "/fishheads/catfish.php?parameters"))
      assert(Robots.matches(p, path), path)
    assert(!Robots.matches(p, "/Fish.PHP"))
  }

  test("mid-pattern $ is a literal octet (reference-matcher behavior)") {
    assert(Robots.matches("/a$b", "/a$b/c"))
    assert(!Robots.matches("/a$b", "/ab"))
  }

  test("decide: most octets wins, Allow wins equal-length ties") {
    val rules = Seq(
      RobotsRule(H, "/fish", allow = false),
      RobotsRule(H, "/fish/pub", allow = true))
    assert(!Robots.decide(rules, "/fish/x"))
    assert(Robots.decide(rules, "/fish/pub/x"))
    assert(Robots.decide(rules, "/elsewhere"))        // no match => allow
    // equal length (5): Allow wins the tie
    val tie = Seq(
      RobotsRule(H, "/p*ge", allow = false),
      RobotsRule(H, "/page", allow = true))
    assert(Robots.decide(tie, "/page"))
    // the wildcard rule is longer => more specific, wins over short allow
    val wild = Seq(
      RobotsRule(H, "/p", allow = true),
      RobotsRule(H, "/p*.php", allow = false))
    assert(!Robots.decide(wild, "/page.php"))
    assert(Robots.decide(wild, "/page.html"))
  }

  test("end-to-end: parsed file drives Scheduler admission, longest prefix wins") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val robots = Robots.parse(H,
      """User-agent: *
        |Disallow: /private
        |Allow: /private/pub
        |""".stripMargin)
    val queue = Seq(
      ("http://h0.test/open/a.html", H, 0L),
      ("http://h0.test/private/x.html", H, 1L),
      ("http://h0.test/private/pub/y.html", H, 2L))
      .toDF("url", "host", "seq")
    val (admitted, blocked) = Scheduler.robotsFilter(spark, queue, robots)
    assert(admitted.select("seq").as[Long].collect().sorted.toSeq == Seq(0L, 2L))
    assert(blocked.select("seq").as[Long].collect().toSeq == Seq(1L))
  }

  test("end-to-end: wildcard/$ rules through Scheduler ≡ Robots.decide") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val robots = Robots.parse(H,
      """User-agent: *
        |Disallow: /*.php$
        |Disallow: /cgi-bin/*
        |Allow: /cgi-bin/pub
        |Disallow: /tmp
        |""".stripMargin)
    val paths = Seq(
      "/index.php",              // blocked ($-anchored)
      "/index.php?x=1",          // allowed (query defeats the anchor)
      "/cgi-bin/run",            // blocked (wildcard dir)
      "/cgi-bin/pub/ok.html",    // allowed (longer allow wins)
      "/tmp/x",                  // blocked (plain prefix fast path)
      "/open/a.html")            // allowed (no match)
    val queue = paths.zipWithIndex
      .map { case (p, i) => (s"http://$H$p", H, i.toLong) }
      .toDF("url", "host", "seq")
    val (admitted, blocked) = Scheduler.robotsFilter(spark, queue, robots)
    val admittedSeqs = admitted.select("seq").as[Long].collect().sorted.toSeq
    // the SQL filter must agree with the shared Scala decision function
    val expect = paths.zipWithIndex
      .filter { case (p, _) => Robots.decide(robots, p) }.map(_._2.toLong)
    assert(admittedSeqs == expect)
    assert(admittedSeqs == Seq(1L, 3L, 5L))
    assert(blocked.select("seq").as[Long].collect().sorted.toSeq == Seq(0L, 2L, 4L))
  }
}
