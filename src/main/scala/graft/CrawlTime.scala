package graft
/** Ad-hoc local timing probe for the fixture + synthetic crawls. */
object CrawlTime {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (thr, n) = Bench.crawlThroughput(spark,
      fanout = args.headOption.map(_.toInt).getOrElse(100))
    println(f"CRAWLBENCH urls=$n thr=${thr.toLong}/s")
    spark.stop()
  }
}
