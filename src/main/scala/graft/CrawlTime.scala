package graft
object CrawlTime {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = Queries.crawlSeen(spark, "x").count()
    println(f"CRAWLTIME ${(System.nanoTime()-t0)/1e9}%.1f s, rows=$n")
    spark.stop()
  }
}
