package graft.engine

import graft.SparkTestSession
import graft.fixtures.FixtureCorpus
import graft.model._
import graft.oracle.RefCrawler
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Per-wave driver-ACTION budget (round-2 verdict #1): deep crawls are
 * wave-latency bound, and every driver action is a scheduling round-trip
 * on the critical path. Round 2 issued ~10 actions per batch (empty
 * probes, discovered.count, frontier pre-count, per-batch stat collects);
 * round 3 folds them into the aggregations each batch must run anyway.
 *
 * Jobs are NOT the unit here — AQE launches one job per query stage, so
 * job counts overstate actions ~8x. An ACTION = one SQL execution id
 * (AQE's stages share it) or one RDD-level job without an execution id
 * (localCheckpoint materialization).
 */
class ActionBudgetSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def countActions(body: => Unit): Int = {
    val execIds = scala.collection.concurrent.TrieMap.empty[String, Unit]
    val rddJobs = new java.util.concurrent.atomic.AtomicInteger()
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val id = j.properties.getProperty("spark.sql.execution.id")
        if (id == null) rddJobs.incrementAndGet() else execIds.put(id, ())
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { body; org.apache.spark.GraftListenerBridge
      .waitUntilListenerBusEmpty(spark.sparkContext, 30000L) }
    finally spark.sparkContext.removeSparkListener(l)
    execIds.size + rddJobs.get
  }

  test("per-batch action budget: <= 6 actions/batch on the parity config") {
    // no redirects / no temporal failures: one batch per wave, so the
    // budget divides cleanly. Budget per batch (sketch on): the batch
    // aggregation, the rank materialize + its count pass, the sketch
    // build, the per-wave seen checkpoint, and one spare.
    val params = FixtureCorpus.Params(hosts = 3, pagesPerHost = 4,
      linksPerPage = 3, redirectPages = 0, failPages = 0, plainPages = 0,
      ftpHost = false)
    val corpus = FixtureCorpus.generate(params)
    val seed = FixtureCorpus.seedUrl(params)
    val rules = Seq(RecipeRule(spider = Some(".*"), depth = 4))
    val oracle = RefCrawler.run(corpus, seed, rules)
    val waves = oracle.waveTotals.size
    var tables: CrawlTables = null
    val actions = countActions {
      tables = new CrawlEngine(spark, corpus.toDF, seed, rules,
        useSketch = true).run()
    }
    // end-of-crawl fixed cost: lazily-materialized table checkpoints +
    // the ord rank + the final empty-queue probe (CrawlTables fields only
    // checkpoint on access, so this crawl+seen-read pays far less; the
    // headroom covers a consumer touching every table)
    val budget = waves * 6 + 12
    info(s"$actions driver actions over $waves waves (budget $budget)")
    assert(actions <= budget,
      s"driver actions must stay within the per-batch budget: " +
        s"$actions actions for $waves waves (budget $budget)")
    // and the crawl still matches the oracle exactly
    val eSeen = tables.seen.orderBy("seq")
      .select("url", "wave").as[(String, Int)].collect.toSeq
    assert(eSeen == oracle.seen.map(s => (s.url, s.wave)), "seen parity")
  }
}
