package graft.extract

import graft.SparkTestSession
import graft.model.{CorpusDoc, Span}
import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Extraction parity against the reference's own embedded testsuite: the 14
 * adversarial hrefs (`spider.py:15-32`) rendered as a span-table doc, with
 * the expected findall/unique sequences computed by executing the
 * reference's regexes (tools/gen_spider_goldens.py -> spider_testcases.json).
 */
class ExtractSpec extends AnyFunSuite {

  private lazy val golden: JValue = {
    val in = getClass.getResourceAsStream("/spider_testcases.json")
    JsonMethods.parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
  }
  private def s(j: JValue): String = j match { case JString(x) => x; case _ => "" }
  private def i(j: JValue): Int = j match { case JInt(x) => x.toInt; case _ => 0 }

  private lazy val doc: CorpusDoc = {
    val spans = (golden \ "spans").asInstanceOf[JArray].arr.map { j =>
      Span(s(j \ "kind"), s(j \ "text"), s(j \ "media_ref"), i(j \ "offset"))
    }
    CorpusDoc(s(golden \ "doc_id"), spans)
  }
  private lazy val expectedFindall: Seq[(String, String)] =
    (golden \ "expected_findall").asInstanceOf[JArray].arr
      .map(j => (s(j \ "kind"), s(j \ "url")))
  private lazy val expectedUnique: Seq[String] =
    (golden \ "expected_unique").asInstanceOf[JArray].arr.map(s)

  test("pure findallSeq reproduces reference findall order (25 matches)") {
    assert(Extract.findallSeq(doc) == expectedFindall)
  }

  test("pure uniqueSeq reproduces first-wins unique (19 urls)") {
    assert(Extract.uniqueSeq(Extract.findallSeq(doc).map(_._2)) == expectedUnique)
  }

  test("Spark findall reproduces reference findall order, UDF-free") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Extract.findall(Seq(doc).toDS.toDF)
    val got = df.orderBy("extract_idx")
      .select("kind", "url").as[(String, String)].collect.toSeq
    assert(got == expectedFindall)
  }

  test("Spark uniqueFirstWins matches reference unique") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val got = Extract.uniqueFirstWins(Extract.findall(Seq(doc).toDS.toDF))
      .orderBy("extract_idx").select("url").as[String].collect.toSeq
    assert(got == expectedUnique)
  }

  test("ftp spans gated on page scheme (spider.py:84-85)") {
    val ftpDoc = CorpusDoc("ftp://h/pub/", Seq(
      Span("ftp", "f.tar.gz", "", 0), Span("link", "http://h/x", "", 10)))
    val httpDoc = CorpusDoc("http://h/pub/", Seq(
      Span("ftp", "f.tar.gz", "", 0), Span("link", "http://h/x", "", 10)))
    assert(Extract.findallSeq(ftpDoc).map(_._1) == Seq("link", "ftp"))
    assert(Extract.findallSeq(httpDoc).map(_._1) == Seq("link"))
    val spark = SparkTestSession.spark
    import spark.implicits._
    val got = Extract.findall(Seq(ftpDoc, httpDoc).toDS.toDF)
      .orderBy("doc_id", "extract_idx")
      .select("doc_id", "kind").as[(String, String)].collect.toSeq
    assert(got == Seq(("ftp://h/pub/", "link"), ("ftp://h/pub/", "ftp"),
      ("http://h/pub/", "link")))
  }

  test("media kinds take url from media_ref (interleaved text+media)") {
    val d = CorpusDoc("http://h/p", Seq(
      Span("text", "intro", "", 0),
      Span("img", "alt text", "http://h/i.jpg", 10),
      Span("link", "http://h/a", "", 30)))
    assert(Extract.findallSeq(d) ==
      Seq(("link", "http://h/a"), ("img", "http://h/i.jpg")))
  }

  test("colorize_shell (E7): extractor spans ANSI-wrapped by rank, ftp gated") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      CorpusDoc("http://h/p", Seq(
        Span("text", "prose", "", 0),
        Span("link", "http://h/a", "", 10),
        Span("img", "", "http://h/i.jpg", 20),
        Span("ftp", "f.txt", "", 30))),
      CorpusDoc("ftp://h/pub/", Seq(Span("ftp", "f.txt", "", 0))))
    val got = docs.toDS.toDF
      .select(col("doc_id"),
        Extract.colorizeShell(col("doc_id"), col("spans")).as("c"))
      .orderBy("doc_id").as[(String, String)].collect.toSeq
    val E = "\u001b"
    // ftp page: ftp rank 7 -> 31 + 7%6 = 32
    assert(got.head == ("ftp://h/pub/", s"$E[32mf.txt$E[0m"))
    // http page: link rank 0 -> 31, img rank 4 -> 35, ftp NOT highlighted
    assert(got(1) == ("http://h/p",
      s"prose\n$E[31mhttp://h/a$E[0m\n$E[35mhttp://h/i.jpg$E[0m\nf.txt"))
  }

  test("truncate_url (P8): middle ellipsis, reference arithmetic") {
    import graft.urlcanon.UrlRewrite.truncateUrl
    // urlrewrite.py:50-57: w = width-3, head = w//2 + w%2, tail = w//2
    assert(truncateUrl(10, "0123456789abcdef") == "0123...def")
    assert(truncateUrl(10, "0123456789") == "0123456789") // == width: kept
    assert(truncateUrl(11, "0123456789abcdef") == "0123...cdef")
    assert(truncateUrl(30, "short") == "short")
  }
}
