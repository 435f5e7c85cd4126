package graft.functions

import graft.SparkTestSession
import graft.urlcanon.UrlRewrite
import org.scalatest.funsuite.AnyFunSuite

class UrlFunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val urls = Seq(
    "HTTP://WWW.Site.Com:80/a/../b/./c?q=1#f",
    "https://H:443/", "ftp://u:p@H2:21/d/f.tar.bz2",
    "http://h:8080/x", "mailto:x@y",
    "http://www.fosdem.org/2008/media/video/x.ogg?a=1")

  test("native expressions agree with the pure-Scala functions") {
    UrlFunctions.register(spark)
    val df = urls.toDF("url").createOrReplaceTempView("urls_t")
    val got = spark.sql(
      """SELECT url, canonical_host(url) AS h, canonical_url(url) AS cu,
        |       url_scheme(url) AS sch, url_filename(url) AS fn
        |FROM urls_t ORDER BY url""".stripMargin)
      .as[(String, String, String, String, String)].collect.toSeq
    got.foreach { case (u, h, cu, sch, fn) =>
      assert(h == UrlRewrite.canonicalHost(u), s"host of $u")
      assert(cu == UrlRewrite.canonicalUrl(u), s"canon of $u")
      assert(sch == graft.urlcanon.PyUrl.getScheme(u), s"scheme of $u")
      assert(fn == UrlRewrite.urlToFilename(u), s"filename of $u")
    }
  }

  test("expressions run inside whole-stage codegen (no fallback)") {
    UrlFunctions.register(spark)
    // a local Seq relation executes without codegen; use a range scan so
    // the projection lands inside a WholeStageCodegen subtree
    spark.range(100).selectExpr(
      "concat('http://H', id, '.Test:80/p') AS url")
      .createOrReplaceTempView("urls_t2")
    val df = spark.sql("SELECT canonical_host(url) AS h FROM urls_t2")
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("graft.functions.UrlStatics.canonicalHost"),
      s"expected generated static call:\n$codegen")
    // and null-safety via the scaffolding
    val withNull = spark.sql("SELECT canonical_host(CAST(NULL AS STRING)) AS h")
    assert(withNull.collect().head.isNullAt(0))
  }
}
