package graft.engine

import graft.SparkTestSession
import graft.fixtures.FixtureCorpus
import graft.model._
import graft.oracle.RefCrawler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The north-rule correctness gate: the distributed engine must reproduce
 * the reference's crawl ordering, final URL-seen set, dump output, graph
 * and fetch log EXACTLY, under the same seed list + politeness budget —
 * verified against the in-repo sequential oracle (RefCrawler) on
 * recipe-driven crawls over the deterministic fixture corpus.
 */
class CrawlParitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val params = FixtureCorpus.Params(hosts = 3, pagesPerHost = 3,
    linksPerPage = 3, redirectPages = 2, failPages = 2)
  private lazy val corpus = FixtureCorpus.generate(params)
  private lazy val corpusDf = corpus.toDF
  private val seed = FixtureCorpus.seedUrl(params)

  private def assertParity(
      rules: Seq[RecipeRule],
      hostFilter: Boolean = false,
      config: CrawlConfig = CrawlConfig(),
      useSketch: Boolean = false,
      docs: Seq[CorpusDoc] = corpus,
      seedUrl: String = seed,
      clue: String = ""): Unit = {

    val oracle = RefCrawler.run(docs, seedUrl, rules, hostFilter, config)
    val engine = new CrawlEngine(spark, docs.toDF, seedUrl, rules,
      hostFilter, config, checkpoint = None, useSketch = useSketch).run()

    val eSeen = engine.seen.orderBy("seq")
      .select("url", "wave").as[(String, Int)].collect.toSeq
    val oSeen = oracle.seen.map(s => (s.url, s.wave))
    assert(eSeen == oSeen, s"$clue: seen-set order")

    val eProc = engine.processed.orderBy("ord")
      .select("wave", "url", "mode", "retry")
      .as[(Int, String, Int, Boolean)].collect.toSeq
    val oProc = oracle.processed.map(p => (p.wave, p.url, p.mode, p.retry))
    assert(eProc == oProc, s"$clue: crawl (processing) order")

    val eDump = engine.dump.orderBy("seq").select("url").as[String].collect.toSeq
    assert(eDump == oracle.dump, s"$clue: dump order")

    val eEdges = engine.edges.select("src", "dst", "wave")
      .as[(String, String, Int)].collect.toSet
    assert(eEdges == oracle.edges.map { case ((s, d), w) => (s, d, w) }.toSet,
      s"$clue: edge set (with first wave)")

    val eAliases = engine.aliases.select("canonicalUrl", "aliasUrl", "wave")
      .as[(String, String, Int)].collect.toSet
    assert(eAliases == oracle.aliases.toSet, s"$clue: alias set")

    val eLog = engine.fetchLog
      .select("wave", "url", "mode", "errorCode", "attempt")
      .as[(Int, String, Int, Int, Int)].collect.toSeq.sorted
    val oLog = oracle.fetchLog
      .map(l => (l.wave, l.url, l.mode, l.errorCode, l.attempt)).sorted
    assert(eLog == oLog, s"$clue: fetch log")

    val eBlocked = engine.robotsBlocked.select("url").as[String].collect.toSeq.sorted
    assert(eBlocked == oracle.robotsBlocked.sorted, s"$clue: robots blocked")

    val eFetched = engine.fetched.orderBy("ord")
      .select("url", "filename").as[(String, String)].collect.toSeq
    assert(eFetched == oracle.fetched, s"$clue: fetched files")
  }

  test("default recipe (spider .* / fetch pattern), depth 1") {
    assertParity(Recipe.default("(?i).*\\.(txt|bz2)$", seed), clue = "default")
  }

  test("deep crawl: spider .*, fetch media, depth 3 — redirects/retries/ftp") {
    assertParity(Seq(RecipeRule(spider = Some(".*"),
      fetch = Some("(?i).*\\.(txt|bz2|jpe?g)$"), depth = 3)), clue = "deep")
  }

  test("dump-only recipe, depth 2 (mov recipe shape)") {
    assertParity(Seq(RecipeRule(spider = Some(".*"),
      dump = Some(".*page[12]\\.html$"), depth = 2)), clue = "dump")
  }

  test("jpg recipe shape: negative-lookahead spider mask") {
    assertParity(Recipe.rewrite(Recipe.jpg, seed), clue = "jpg")
  }

  test("two-rule recipe: depth-0 split defers spiders to next rule") {
    assertParity(Seq(
      RecipeRule(spider = Some(".*"), fetch = Some(".*flaky.*"), depth = 1),
      RecipeRule(spider = Some(".*page[01]\\.html$"), fetch = Some(".*\\.txt$"),
        depth = 1)), clue = "two-rule")
  }

  test("host filter: spider restricted to seed host, redirects off-host dropped") {
    assertParity(Recipe.default(".*\\.html$", seed,
      Recipe.Env(hostFilter = true)), hostFilter = true, clue = "hostfilter")
  }

  test("politeness budget 2/host: chunked dequeue, same final state as oracle") {
    assertParity(Seq(RecipeRule(spider = Some(".*"),
      fetch = Some("(?i).*\\.(txt|bz2)$"), depth = 2)),
      config = CrawlConfig(perHostBudget = Some(2)), clue = "budget")
  }

  test("robots rules: deny prefix blocks dequeue, longest prefix wins") {
    val robots = Seq(
      RobotsRule("host1.test", "/d1/", allow = false),
      RobotsRule("host1.test", "/d1/page1", allow = true))
    assertParity(Seq(RecipeRule(spider = Some(".*"), depth = 3)),
      config = CrawlConfig(robots = robots), clue = "robots")
  }

  test("robots wildcard/$ patterns: engine admission ≡ oracle (RFC 9309)") {
    // mixes the regexp_like slow path ($-anchored, mid-pattern *) with a
    // plain-prefix allow override on BOTH engines (round-4 verdict #2)
    val robots = Seq(
      RobotsRule("host1.test", "/d1/*1.html$", allow = false),
      RobotsRule("host1.test", "/d1/page11", allow = true),
      RobotsRule("host0.test", "/*plain", allow = false))
    assertParity(Seq(RecipeRule(spider = Some(".*"),
      fetch = Some("(?i).*\\.(txt|bz2)$"), depth = 3)),
      config = CrawlConfig(robots = robots), clue = "robots-pattern")
  }

  test("bloom-sketch path yields identical results (exactness never depends on sketch)") {
    assertParity(Seq(RecipeRule(spider = Some(".*"),
      fetch = Some("(?i).*\\.(txt|bz2)$"), depth = 3)),
      useSketch = true, clue = "sketch")
  }

  test("WRONG_TYPE typecheck: spidered plain-text page errors, no retry") {
    // plain0.txt is text-only (neither HTML nor URL-bearing): a SPIDER
    // record on it must log WRONG_TYPE (fetch.py:519-531), stay
    // un-retried (non-temporal) and discover nothing
    val rules = Seq(RecipeRule(spider = Some(".*(\\.html|\\.txt)$"), depth = 2))
    assertParity(rules, clue = "wrongtype")
    val engine = new CrawlEngine(spark, corpusDf, seed, rules).run()
    val wt = engine.fetchLog
      .filter(col("errorCode") === ErrorCode.WRONG_TYPE)
      .select("url", "mode").as[(String, Int)].collect.toSeq
    assert(wt.nonEmpty, "expected WRONG_TYPE rows in the fetch log")
    assert(wt.forall(_._2 == Mode.SPIDER), "typecheck errors only in SPIDER mode")
    assert(wt.exists(_._1.endsWith("plain0.txt")))
  }

  test("SPIDER_FETCH downgrade: wrong-type content fetched without error") {
    // the same plain-text page matched by BOTH masks rides as SPIDER_FETCH
    // while depth > 0 — fetch_if_wrongtype downgrades the typecheck to a
    // plain fetch (fetch.py:390-391,527-529): logged NONE, not WRONG_TYPE
    val rules = Seq(RecipeRule(spider = Some(".*(\\.html|\\.txt)$"),
      fetch = Some(".*\\.txt$"), depth = 3))
    assertParity(rules, clue = "downgrade")
    val engine = new CrawlEngine(spark, corpusDf, seed, rules).run()
    val plainRows = engine.fetchLog
      .filter(col("url").endsWith("plain0.txt"))
      .select("mode", "errorCode").as[(Int, Int)].collect.toSeq
    assert(plainRows.contains((Mode.SPIDER_FETCH, ErrorCode.NONE)),
      s"SPIDER_FETCH fetch of wrong-type content must log NONE; got $plainRows")
    assert(!plainRows.contains((Mode.SPIDER_FETCH, ErrorCode.WRONG_TYPE)))
  }

  test("in-fetch TRIES retries: fail_attempts past 1 succeed, log per launch") {
    // tries=3 (the reference's TRIES env, fetch.py:393-395,650-664):
    //  - t2 (fail_attempts=2) succeeds within the FIRST fetch call
    //    (launches 0,1 TIMEOUT; launch 2 succeeds) — no crawl-level retry;
    //  - t4 exhausts call 0 (launches 0-2), crawl retries once, call 1
    //    succeeds at launch 4 -> multi-attempt rows in the fetch log;
    //  - t7 exhausts both calls -> permanent temporal error.
    val seed2 = "http://h9.test/seed.html"
    def flaky(name: String, fails: Int) = CorpusDoc(
      s"http://h9.test/$name.html",
      Seq(Span("text", "eventually", "", 0),
        Span("link", s"http://h9.test/leaf-$name.html", "", 20)),
      fail_attempts = fails)
    def leaf(name: String) = CorpusDoc(s"http://h9.test/leaf-$name.html",
      Seq(Span("text", "leaf", "", 0)))
    val docs = Seq(
      CorpusDoc(seed2, Seq(
        Span("link", "http://h9.test/t2.html", "", 0),
        Span("link", "http://h9.test/t4.html", "", 30),
        Span("link", "http://h9.test/t7.html", "", 60))),
      flaky("t2", 2), flaky("t4", 4), flaky("t7", 7),
      leaf("t2"), leaf("t4"), leaf("t7"))
    val rules = Seq(RecipeRule(spider = Some(".*"), depth = 3))
    val cfg = CrawlConfig(tries = 3)
    assertParity(rules, config = cfg, docs = docs, seedUrl = seed2,
      clue = "tries")
    val engine = new CrawlEngine(spark, docs.toDF, seed2, rules,
      config = cfg).run()
    val t4rows = engine.fetchLog.filter(col("url") === "http://h9.test/t4.html")
      .select("errorCode", "attempt").as[(Int, Int)].collect.toSeq.sortBy(_._2)
    assert(t4rows == Seq((ErrorCode.TIMEOUT, 0), (ErrorCode.TIMEOUT, 1),
      (ErrorCode.TIMEOUT, 2), (ErrorCode.TIMEOUT, 3), (ErrorCode.NONE, 4)),
      s"per-launch log rows: $t4rows")
    // t2's leaf discovered in wave 2 (no crawl retry), t4's via the retry
    assert(engine.seen.filter(col("url").endsWith("leaf-t2.html")).count() == 1)
    assert(engine.seen.filter(col("url").endsWith("leaf-t4.html")).count() == 1)
    assert(engine.seen.filter(col("url").endsWith("leaf-t7.html")).count() == 0)
  }

  test("hot-host skew corpus: parity holds under budget + skew") {
    val skewed = FixtureCorpus.generate(params.copy(hotHostFactor = 4,
      redirectPages = 1, failPages = 1))
    assertParity(Seq(RecipeRule(spider = Some(".*"), depth = 2)),
      config = CrawlConfig(perHostBudget = Some(3)),
      docs = skewed, clue = "skew")
  }

  test("politeness budget x in-fetch tries: chunked retries keep positions") {
    // the interplay edge: under a per-host budget a temporal retry
    // re-enters the PENDING set at its original discovery position
    // (RefCrawler mirrors the engine's seq-ordered window), while tries=2
    // shifts which fail_attempts survive which crawl-level call
    assertParity(Seq(RecipeRule(spider = Some(".*"),
      fetch = Some("(?i).*\\.(txt|bz2)$"), depth = 2)),
      config = CrawlConfig(perHostBudget = Some(2), tries = 2),
      clue = "budget-tries")
  }
}
