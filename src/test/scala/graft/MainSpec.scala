package graft

import graft.engine.Recipe
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The CLI surface (`spiderfetch <url> [pattern] [options]`): argument
  * parsing parity, recipe/pattern routing, checkpointed run + resume
  * reuse, and the reference's PatternError contract. */
class MainSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def fixtureSeed = graft.fixtures.FixtureCorpus.seedUrl(
    Queries.fixtureParams)

  test("argument parsing mirrors the reference option surface") {
    val a = Main.parse(Array("http://h/x.html", "(?i).*\\.ogg$",
      "--depth", "2", "--host-filter", "--budget", "7",
      "--out", "/tmp/o", "--pause", "3"))
    assert(a.url == "http://h/x.html")
    assert(a.pattern.contains("(?i).*\\.ogg$"))
    assert(a.depth.contains(2) && a.hostFilter && a.budget.contains(7))
    assert(a.out.contains("/tmp/o"))
    intercept[IllegalArgumentException](Main.parse(Array("u", "--bogus")))
    intercept[IllegalArgumentException](Main.parse(Array[String]()))
  }

  test("pattern crawl: matching files are SPIDER_FETCH, not moved (reference S5)") {
    // plain `url pattern` = {spider: .*, fetch: pattern} (recipe.py:67-69);
    // a matching file then satisfies BOTH masks -> SPIDER_FETCH, and the
    // reference moves only FETCH-mode files to final names
    // (spiderfetch.py:163-165) — so the fetched-files sink stays empty
    // while the fetch log records the downgraded fetches
    val a = Main.parse(Array(fixtureSeed, "(?i).*\\.bz2$", "--depth", "3"))
    val t = Main.run(a, spark)
    import spark.implicits._
    assert(t.fetched.count() == 0)
    val logged = t.fetchLog.filter(col("url").endsWith(".bz2"))
      .select("url").as[String].collect().toSet
    assert(logged.nonEmpty)
    assert(t.seen.count() > 20)
  }

  test("recipe-file CLI crawl equals the programmatic fixture crawl") {
    // the fixture rules (disjoint spider/fetch/dump masks) rendered to a
    // recipe JSON and driven through the full CLI path: Recipe.load ->
    // CrawlEngine; every table must equal Queries.fixtureCrawl's
    val r = Queries.fixtureRules.head
    val json = s"""[{"spider": "${r.spider.get.replace("\\", "\\\\")}",
      "fetch": "${r.fetch.get.replace("\\", "\\\\")}",
      "dump": "${r.dump.get.replace("\\", "\\\\")}",
      "depth": ${r.depth}}]"""
    val f = java.nio.file.Files.createTempDirectory("graft-recipe-")
      .resolve("fixture.json")
    java.nio.file.Files.writeString(f, json)
    val t = Main.run(Main.parse(Array(fixtureSeed, "--recipe",
      f.toString)), spark)
    val ref = Queries.fixtureCrawl(spark)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(t.seen) == rows(ref.seen))
    assert(rows(t.processed) == rows(ref.processed))
    assert(rows(t.dump) == rows(ref.dump))
    assert(rows(t.fetched) == rows(ref.fetched))
    assert(rows(t.edges) == rows(ref.edges))
  }

  test("shipped recipe names resolve like the reference's recipes/ dir") {
    // `--recipe mov` with no mov.json anywhere -> the shipped data twin
    assert(Recipe.load("mov", fixtureSeed) ==
      Recipe.rewrite(Recipe.mov, fixtureSeed))
    assert(Recipe.load("jpg", fixtureSeed, Recipe.Env(depth = Some(4))) ==
      Recipe.rewrite(Recipe.jpg, fixtureSeed, Recipe.Env(depth = Some(4))))
    // the CLI crawl with it spiders (mov's spider mask is .*) even though
    // this corpus has no matching media to dump
    val t = Main.run(Main.parse(Array(fixtureSeed, "--recipe", "mov")),
      spark)
    assert(t.seen.count() > 1 && t.dump.count() == 0)
    intercept[java.io.FileNotFoundException] {
      Main.run(Main.parse(Array(fixtureSeed, "--recipe", "nope")), spark)
    }
  }

  test("bad pattern raises the reference's PatternError at plan time") {
    intercept[Recipe.PatternError] {
      Main.run(Main.parse(Array(fixtureSeed, "(unclosed")), spark)
    }
  }

  test("checkpointed CLI run resumes from --out instead of recrawling") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-cli-").toString + "/crawl"
    val a = Main.parse(Array(fixtureSeed, "(?i).*\\.bz2$", "--out", out))
    val t1 = Main.run(a, spark)
    val seen1 = t1.seen.collect().map(_.toString).sorted.toSeq
    val io = new graft.tableio.TableIO(out, spark)
    val v1 = io.latestId.get
    // second invocation: _latest exists -> resume path, which must not
    // redo the finished crawl (snapshot count unchanged beyond the
    // resume's own final commit) and must reproduce the same tables
    val t2 = Main.run(a, spark)
    val seen2 = t2.seen.collect().map(_.toString).sorted.toSeq
    assert(seen2 == seen1)
    assert(io.latestId.get <= v1 + 1)
  }
}
