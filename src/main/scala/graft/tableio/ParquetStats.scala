package graft.tableio

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Row counts from parquet FOOTER metadata — the moral equivalent of an
 * Iceberg manifest's record-count stats (TableIO.commit records the same
 * numbers at write time). ANN knob sizing (IVF cells ~ √n, LSH bits ~
 * log2 n) needs only n, and a `count()` action is a full extra table scan
 * per query at the 100-TB design point (round-3 verdict #4); the footers
 * answer in O(files) driver-side metadata reads, cached per path per JVM.
 */
object ParquetStats {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Total rows of a parquet file or directory, from footers only. */
  def rowCount(spark: SparkSession, path: String): Long =
    cache.computeIfAbsent(path, _ => {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).toSeq.map(_.getPath).filter { f =>
            f.getName.endsWith(".parquet") || f.getName.startsWith("part-")
          }
        else Seq(p)
      files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
    })
}
