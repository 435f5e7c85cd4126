package graft.tableio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.charset.StandardCharsets

/**
 * Iceberg-shaped snapshot layer over Parquet + JSON manifests.
 *
 * The sandbox ships no Iceberg jars (SURVEY §1.3), so this reproduces the
 * Iceberg properties the north rule needs — atomic snapshot commit,
 * manifest with per-partition lineage + metrics, time-travelable table
 * versions, resume-from-checkpoint — with the real Iceberg catalog as a
 * deploy-time swap. The atomic `.partial` + rename of the reference
 * (`ioutils.py:126-130`) becomes: write snapshot dir under `_tmp`, fs
 * rename into place, then atomically swap the `_latest` pointer.
 *
 * Layout:
 *   base/v{N}/{table}/part-*.parquet   -- table data
 *   base/v{N}/manifest.json            -- meta + per-table/per-file lineage
 *   base/_latest                       -- current snapshot id (atomic swap)
 */
final case class FileLineage(name: String, bytes: Long)
final case class TableLineage(rows: Long, files: Seq[FileLineage])
final case class Snapshot(id: Long, meta: Map[String, String],
                          tables: Map[String, TableLineage], path: String)

class TableIO(baseDir: String, spark: SparkSession) {

  private val fs: FileSystem =
    new Path(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def latestPath = new Path(baseDir, "_latest")

  def latestId: Option[Long] = {
    if (!fs.exists(latestPath)) None
    else {
      val in = fs.open(latestPath)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        if (s.isEmpty) None else Some(s.toLong)
      } finally in.close()
    }
  }

  /** Atomic commit: tables + meta -> new snapshot; returns snapshot id. */
  def commit(meta: Map[String, String], tables: Map[String, DataFrame]): Snapshot = {
    val id = latestId.getOrElse(-1L) + 1L
    val tmp = new Path(baseDir, s"_tmp_v$id")
    val fin = new Path(baseDir, s"v$id")
    fs.delete(tmp, true)
    fs.mkdirs(tmp)

    val lineage = tables.map { case (name, df) =>
      val p = new Path(tmp, name)
      df.write.mode("overwrite").parquet(p.toString)
      val files = fs.listStatus(p).toSeq
        .filter(s => s.getPath.getName.startsWith("part-"))
        .map(s => FileLineage(s.getPath.getName, s.getLen))
      // row counts straight from the parquet FOOTERS on the driver — the
      // write already recorded them; the round-2 version re-read every
      // table with a spark.read...count() job (one extra scan action per
      // table per snapshot on checkpointed crawls). This is what a real
      // Iceberg commit does: manifests carry write-time stats.
      val rows = files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new Path(p, f.name), spark.sparkContext.hadoopConfiguration))
        try r.getRecordCount finally r.close()
      }.sum
      name -> TableLineage(rows, files)
    }

    writeString(new Path(tmp, "manifest.json"), manifestJson(id, meta, lineage))
    fs.delete(fin, true)
    require(fs.rename(tmp, fin), s"snapshot rename failed for v$id")
    // atomic pointer swap (tmp file + rename)
    val ptrTmp = new Path(baseDir, "_latest.partial")
    writeString(ptrTmp, id.toString)
    fs.delete(latestPath, false)
    require(fs.rename(ptrTmp, latestPath), "latest-pointer swap failed")
    Snapshot(id, meta, lineage, fin.toString)
  }

  def latest: Option[Snapshot] = latestId.map(read)

  def read(id: Long): Snapshot = {
    val dir = new Path(baseDir, s"v$id")
    val in = fs.open(new Path(dir, "manifest.json"))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    parseManifest(json, dir.toString)
  }

  def table(snap: Snapshot, name: String): DataFrame =
    spark.read.parquet(new Path(snap.path, name).toString)

  // --- tiny JSON codec (flat manifest; avoids extra deps in main) ---

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  private def manifestJson(id: Long, meta: Map[String, String],
                           tables: Map[String, TableLineage]): String = {
    val metaJson = meta.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val tablesJson = tables.toSeq.sortBy(_._1).map { case (n, t) =>
      val files = t.files.map(f => s"""{"name":${q(f.name)},"bytes":${f.bytes}}""")
        .mkString("[", ",", "]")
      s"${q(n)}:" + s"""{"rows":${t.rows},"files":$files}"""
    }.mkString("{", ",", "}")
    s"""{"snapshot_id":$id,"meta":$metaJson,"tables":$tablesJson}"""
  }

  private def parseManifest(json: String, path: String): Snapshot = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(json)
    val id = (j \ "snapshot_id") match { case JInt(n) => n.toLong; case _ => -1L }
    val meta = (j \ "meta") match {
      case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
    val tables = (j \ "tables") match {
      case JObject(fields) => fields.map { case (name, tj) =>
        val rows = (tj \ "rows") match { case JInt(n) => n.toLong; case _ => 0L }
        val files = (tj \ "files") match {
          case JArray(fa) => fa.map { fj =>
            FileLineage(
              (fj \ "name") match { case JString(s) => s; case _ => "" },
              (fj \ "bytes") match { case JInt(n) => n.toLong; case _ => 0L })
          }
          case _ => Nil
        }
        name -> TableLineage(rows, files)
      }.toMap
      case _ => Map.empty[String, TableLineage]
    }
    Snapshot(id, meta, tables, path)
  }

  private def writeString(p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}
