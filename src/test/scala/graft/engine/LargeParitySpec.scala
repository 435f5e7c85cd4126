package graft.engine

import graft.SparkTestSession
import graft.fixtures.FixtureCorpus
import graft.model._
import graft.oracle.RefCrawler
import org.scalatest.funsuite.AnyFunSuite

/** Parity stress: a larger, skewed, messier web (8 hosts, hot host x3,
  * 3 redirects, 3 flaky pages, ~260 pages) crawled to depth 2 under a
  * politeness budget — the engine must still match the oracle exactly on
  * every surface. Guards against order bugs that only appear when waves
  * span many partitions and dedup collisions are frequent. */
class LargeParitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("large skewed crawl under budget: full surface parity") {
    val params = FixtureCorpus.Params(hosts = 8, pagesPerHost = 6,
      linksPerPage = 5, redirectPages = 3, failPages = 3,
      hotHostFactor = 3, quirkEvery = 3)
    val corpus = FixtureCorpus.generate(params)
    val seed = FixtureCorpus.seedUrl(params)
    val rules = Seq(RecipeRule(spider = Some(".*"),
      fetch = Some("(?i).*\\.(txt|bz2)$"),
      dump = Some(".*page[0-2]\\.html$"), depth = 3))
    val config = CrawlConfig(perHostBudget = Some(4))

    val oracle = RefCrawler.run(corpus, seed, rules, config = config)
    val engine = new CrawlEngine(spark, corpus.toDF, seed, rules,
      config = config, useSketch = true).run()

    val eSeen = engine.seen.orderBy("seq")
      .select("url", "wave").as[(String, Int)].collect.toSeq
    assert(eSeen == oracle.seen.map(s => (s.url, s.wave)), "seen order")
    assert(eSeen.size > 60, s"crawl too small to be meaningful: ${eSeen.size}")

    val eProc = engine.processed.orderBy("ord")
      .select("wave", "url", "mode", "retry")
      .as[(Int, String, Int, Boolean)].collect.toSeq
    assert(eProc == oracle.processed.map(p => (p.wave, p.url, p.mode, p.retry)),
      "processing order")

    val eDump = engine.dump.orderBy("seq").select("url").as[String].collect.toSeq
    assert(eDump == oracle.dump, "dump order")

    val eEdges = engine.edges.select("src", "dst").as[(String, String)].collect.toSet
    assert(eEdges == oracle.edges.keySet, "edges")

    val eFetched = engine.fetched.orderBy("ord")
      .select("url", "filename").as[(String, String)].collect.toSeq
    assert(eFetched == oracle.fetched, "fetched")
  }
}
