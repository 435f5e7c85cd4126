package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/**
 * Diagnostic main: runs the shared fixture crawl once and prints the
 * driver-action/job timeline — the tool behind the per-wave action-budget
 * work (round-2 verdict #1). Not part of the driver contract.
 *
 *   java -cp "target/scala-2.13/classes:SPARK_JARS" \
 *     graft.tools.CrawlProfile [aqe=0|1] [shufflePartitions]
 */
object CrawlProfile {
  def main(args: Array[String]): Unit = {
    val aqe = args.headOption.forall(_ == "1")
    val parts = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-crawl-profile")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val exec = Option(j.properties.getProperty("spark.sql.execution.id"))
          .getOrElse("rdd")
        starts.put(j.jobId, (System.nanoTime(), exec))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, exec) =>
          rows.add((j.jobId, exec, (System.nanoTime() - t0) / 1000000))
        }
      }
    })

    // optional: profile an arbitrary driver query (1 32 query <name>
    // <sfDir>) or the synthetic-web crawl benchmark (1 32 crawl-bench
    // [fanout]) instead of the fixture crawl
    val mode = args.lift(2).getOrElse("fixture")
    def runOnce(): Long = mode match {
      case "query" =>
        graft.SparkEntry.queries(args(3))(spark, args(4)).count()
      case "crawl-bench" =>
        val (thr, n) = graft.Bench.crawlThroughput(spark,
          fanout = args.lift(3).map(_.toInt).getOrElse(100))
        println(s"CRAWLBENCH urls_per_sec=${thr.toLong} seen=$n")
        n
      case _ =>
        graft.Queries.crawlCacheClear()
        graft.Queries.crawlSeen(spark, "unused").count()
    }
    val t0 = System.nanoTime()
    val n = runOnce()
    val sec = (System.nanoTime() - t0) / 1e9
    // run it a SECOND time (fresh crawl, warm JVM) — separates JIT/codegen
    // warmup from structural driver cost
    val t1 = System.nanoTime()
    runOnce()
    val sec2 = (System.nanoTime() - t1) / 1e9
    org.apache.spark.GraftListenerBridge
      .waitUntilListenerBusEmpty(spark.sparkContext, 30000L)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(_._1)
    val actions = all.map(_._2).distinct.size
    val jobMs = all.map(_._3).sum
    println(f"TOTAL $sec%.2f s (2nd run $sec2%.2f s), seen=$n, " +
      f"jobs=${all.size}, actions~=$actions, sum(job time)=${jobMs / 1000.0}%.2f s")
    println("slowest jobs:")
    all.sortBy(-_._3).take(15).foreach { case (id, exec, ms) =>
      println(f"  job $id%4d exec=$exec%-6s $ms%6d ms")
    }
    spark.stop()
  }
}
