package graft.engine

import graft.SparkTestSession
import graft.model.RobotsRule
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** robots.txt parsing (round-3 verdict #7) + end-to-end admission through
  * the Scheduler's longest-prefix filter. */
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

  test("groups for other agents are ignored; shared agent lines apply") {
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
    // a named agent collects ITS groups plus * groups
    assert(Robots.parse(H, txt, agent = "EvilBot") == Seq(
      RobotsRule(H, "/", allow = false),
      RobotsRule(H, "/tmp", allow = false)))
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

  test("trailing * stripped; wildcard/anchor patterns skipped; non-/ skipped") {
    val txt =
      """User-agent: *
        |Disallow: /cgi-bin/*
        |Disallow: /*.php$
        |Disallow: relative/path
        |Allow: /ok
        |""".stripMargin
    assert(Robots.parse(H, txt) == Seq(
      RobotsRule(H, "/cgi-bin/", allow = false),
      RobotsRule(H, "/ok", allow = true)))
  }

  test("duplicate prefixes: allow wins, prefixes stay distinct") {
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
}
