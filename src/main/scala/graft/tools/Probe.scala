package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time one driver-surface query N times in a fresh session
  * (`Probe <query> [sfDir] [passes]`) — the per-query feedback loop while
  * tuning, without the full Bench protocol around it. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k, v)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // PROBE_JOBS=1: per-job wall times — where does a latency-bound run
    // actually spend its driver round-trips?
    if (sys.env.contains("PROBE_JOBS")) {
      val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
      val sites = scala.collection.concurrent.TrieMap.empty[Int, String]
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            starts(j.jobId) = System.nanoTime()
            sites(j.jobId) = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            starts.remove(j.jobId).foreach { t0 =>
              println(f"JOB ${j.jobId}%4d sec=${(System.nanoTime() - t0) / 1e9}%7.3f " +
                s"site=${sites.remove(j.jobId).getOrElse("?")}")
            }
        })
    }
    // PROBE_EXPLAIN=1: dump the formatted physical plan once before timing
    if (sys.env.contains("PROBE_EXPLAIN"))
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    (1 to n).foreach { i =>
      if (name.startsWith("crawl")) graft.Queries.crawlCacheClear()
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"PROBE $name pass=$i rows=$c sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
