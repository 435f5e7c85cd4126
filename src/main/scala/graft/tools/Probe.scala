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
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to n).foreach { i =>
      if (name.startsWith("crawl")) graft.Queries.crawlCacheClear()
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"PROBE $name pass=$i rows=$c sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
