package graft
/** Ad-hoc local timing probe for the fixture + synthetic crawls. */
object CrawlTime {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("fixture")) {
      // time the shared fixture crawl (the driver's crawl_seen query),
      // with a job counter to see where per-wave overhead lands
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
      graft.engine.WavePhase.install(spark)
      (1 to 3).foreach { i =>
        graft.engine.WavePhase.reset()
        val t0 = System.nanoTime()
        Queries.crawlCacheClear()
        val n = Queries.crawlSeen(spark, "").count()
        println(f"FIXTURE run$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f jobs=${jobs.getAndSet(0)}")
        println(graft.engine.WavePhase.report())
      }
    } else {
      graft.engine.WavePhase.install(spark)
      graft.engine.WavePhase.reset()
      val (thr, n) = Bench.crawlThroughput(spark,
        fanout = args.headOption.map(_.toInt).getOrElse(100))
      println(f"CRAWLBENCH urls=$n thr=${thr.toLong}/s")
      println(graft.engine.WavePhase.report())
    }
    spark.stop()
  }
}
