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
/** One data file of a table. `name` is the path RELATIVE TO THE TABLE
  * BASE DIR (e.g. "v3/seen/part-...parquet") so a snapshot can reference
  * files written by EARLIER snapshots — the Iceberg append model. */
final case class FileLineage(name: String, bytes: Long)
final case class TableLineage(rows: Long, files: Seq[FileLineage])
final case class Snapshot(id: Long, meta: Map[String, String],
                          tables: Map[String, TableLineage], path: String)

/** One table's contribution to a commit. A FULL write (`prevFiles` empty,
  * the default) replaces the table with `df`. An APPEND write carries the
  * previous snapshot's file list + row count: only `df` (the DELTA since
  * that snapshot) is written, and the new manifest references old + new
  * files — per-wave commit cost is then O(wave), not O(crawl so far)
  * (round-4: the full rewrite was O(waves × total) write amplification,
  * exactly what Iceberg manifests exist to avoid). `extraDfs` are written
  * as SEPARATE append jobs into the same table dir — callers that need
  * file-boundary control (compaction bins) pass one df per desired file,
  * since a plain union cannot pin boundaries: Spark 4's UnionExec merges
  * children partition-wise when their partitionings compare equal, so a
  * union of coalesce(1) bins collapses back into ONE partition. */
final case class TableWrite(df: DataFrame,
                            prevFiles: Seq[FileLineage] = Nil,
                            prevRows: Long = 0L,
                            extraDfs: Seq[DataFrame] = Nil)

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

  private def footerRows(p: Path): Long = {
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        p, spark.sparkContext.hadoopConfiguration))
    try r.getRecordCount finally r.close()
  }

  /** Convenience: full-write commit of every table. */
  def commit(meta: Map[String, String], tables: Map[String, DataFrame]): Snapshot =
    commitWrites(meta, tables.map { case (n, df) => n -> TableWrite(df) })

  /**
   * Atomic commit: each TableWrite's df is written under `v{N}/{table}/`;
   * the manifest's file list is prevFiles ++ the new files (append model
   * — older snapshots' data files are referenced, never rewritten or
   * copied). Row counts come from the parquet FOOTERS on the driver (no
   * scan job) and accumulate onto prevRows — write-time stats, as an
   * Iceberg manifest carries them. Zero-row delta files are dropped from
   * the lineage (and disk) so file lists stay O(written data), EXCEPT
   * that a table with no files at all keeps one empty file as the schema
   * carrier. Returns the committed snapshot.
   */
  def commitWrites(meta: Map[String, String],
                   tables: Map[String, TableWrite]): Snapshot = {
    val expectedPrev = latestId.getOrElse(-1L)
    val id = expectedPrev + 1L
    val tmp = new Path(baseDir, s"_tmp_v$id")
    val fin = new Path(baseDir, s"v$id")
    fs.delete(tmp, true)
    fs.mkdirs(tmp)

    // per-table writes run CONCURRENTLY: a wave commit is a dozen mostly
    // tiny delta writes whose cost is scheduling latency, not bytes —
    // serial writes put 12 job round-trips on the wave's critical path.
    // Spark job submission is thread-safe; lineage assembly stays
    // deterministic because results keep the input ordering.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val lineageF = tables.toSeq.map { case (name, w) =>
      Future {
        val p = new Path(tmp, name)
        w.df.write.mode("overwrite").parquet(p.toString)
        w.extraDfs.foreach(_.write.mode("append").parquet(p.toString))
        val written = fs.listStatus(p).toSeq
          .filter(s => s.getPath.getName.startsWith("part-"))
          .map(s => (s.getPath, s.getLen, footerRows(s.getPath)))
        val nonEmpty = written.filter(_._3 > 0)
        val keep =
          if (nonEmpty.isEmpty && w.prevFiles.isEmpty) written.take(1)
          else nonEmpty
        written.diff(keep).foreach(f => fs.delete(f._1, false))
        val newFiles = keep.map { case (path, bytes, _) =>
          FileLineage(s"v$id/$name/${path.getName}", bytes)
        }
        val newRows = keep.map(_._3).sum
        name -> TableLineage(w.prevRows + newRows, w.prevFiles ++ newFiles)
      }
    }
    // generous bound, not Inf: a hung FS write must fail loudly with the
    // table names instead of hanging the crawl with no diagnostic
    val lineage =
      try Await.result(Future.sequence(lineageF),
        Duration(10, scala.concurrent.duration.MINUTES)).toMap
      catch {
        case e: java.util.concurrent.TimeoutException =>
          throw new IllegalStateException(
            s"snapshot v$id of $baseDir: table writes did not finish in " +
              s"10 min (tables: ${tables.keys.mkString(", ")})", e)
      }

    writeString(new Path(tmp, "manifest.json"), manifestJson(id, meta, lineage))
    // optimistic concurrency (Iceberg's commit model, as in
    // HadoopTableOperations): re-validate the version immediately before
    // the swap — a second committer on this baseDir advanced `_latest`
    // while our files were writing, and proceeding would silently clobber
    // its snapshot. Abort loudly; our tmp dir is discarded, the winner's
    // state is untouched. (The residual check→rename window is the same
    // one Iceberg's rename-based FS catalog accepts.)
    beforeSwap(id)
    val current = latestId.getOrElse(-1L)
    if (current != expectedPrev) {
      fs.delete(tmp, true)
      throw new java.util.ConcurrentModificationException(
        s"concurrent commit on $baseDir: expected latest v$expectedPrev " +
          s"but found v$current while committing v$id")
    }
    fs.delete(fin, true)
    require(fs.rename(tmp, fin), s"snapshot rename failed for v$id")
    // atomic pointer swap (tmp file + rename)
    val ptrTmp = new Path(baseDir, "_latest.partial")
    writeString(ptrTmp, id.toString)
    fs.delete(latestPath, false)
    require(fs.rename(ptrTmp, latestPath), "latest-pointer swap failed")
    Snapshot(id, meta, lineage, fin.toString)
  }

  /** Test seam: runs after the snapshot files are written, immediately
    * before the optimistic-commit re-validation. */
  protected def beforeSwap(id: Long): Unit = ()

  def latest: Option[Snapshot] = latestId.map(read)

  /** Roll the table back to an earlier snapshot (Iceberg's
    * rollback-to-snapshot maintenance call): a pure `_latest` pointer
    * swap — O(1) at any table size, no data moves. The abandoned newer
    * snapshots stay on disk and remain time-travel-readable until
    * `expire` reclaims them; the NEXT commit after a rollback branches
    * from the restored snapshot and overwrites the abandoned version
    * directories (history past the rollback point is forfeited, the
    * documented Iceberg rollback contract). */
  def rollback(id: Long): Snapshot = {
    val cur = latestId.getOrElse(-1L)
    require(id <= cur, s"cannot roll forward to v$id (latest is v$cur)")
    val snap = read(id) // validates the target manifest exists
    val ptrTmp = new Path(baseDir, "_latest.partial")
    writeString(ptrTmp, id.toString)
    fs.delete(latestPath, false)
    require(fs.rename(ptrTmp, latestPath), "latest-pointer swap failed")
    snap
  }

  def read(id: Long): Snapshot = {
    val dir = new Path(baseDir, s"v$id")
    val in = fs.open(new Path(dir, "manifest.json"))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    parseManifest(json, dir.toString)
  }

  /** Read a table from its manifest FILE LIST (files may span snapshots
    * under the append model). */
  def table(snap: Snapshot, name: String): DataFrame = {
    val paths = snap.tables(name).files
      .map(f => new Path(baseDir, f.name).toString)
    spark.read.parquet(paths: _*)
  }

  /** Iceberg-style INCREMENTAL scan: the rows `name` gained between two
    * snapshots, read from the manifest FILE-LIST diff alone — never a
    * full-table read + except. Valid between APPEND snapshots (the
    * engine's per-wave commits); a compaction rewrites the file list, so
    * incremental consumers restart from the compacted snapshot — exactly
    * Iceberg's incremental-read contract, which skips replace snapshots.
    * `prev = None` reads the whole of `cur` (the first commit). At scale
    * this is how a downstream consumer (indexer, trainer) tails a crawl:
    * O(delta) per poll, never O(corpus). */
  def addedTable(prev: Option[Snapshot], cur: Snapshot, name: String): DataFrame = {
    val prevFiles = prev.flatMap(_.tables.get(name))
      .map(_.files.map(_.name).toSet).getOrElse(Set.empty[String])
    val added = cur.tables(name).files.map(_.name).filterNot(prevFiles)
    if (added.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        table(cur, name).schema)
    else spark.read.parquet(added.map(f => new Path(baseDir, f).toString): _*)
  }

  /**
   * Iceberg COPY-ON-WRITE MERGE (upsert) on an integer-keyed table:
   * `updates` rows REPLACE same-key rows of `name`; update keys the table
   * doesn't hold are inserted. Only the data files whose parquet-footer
   * key envelope CAN contain a matched key are rewritten — every other
   * file's manifest entry is carried into the new snapshot verbatim
   * (never read, never copied): at 100 TB a clustered correction batch
   * (late CDC for one day, a GDPR purge for one id range) rewrites a few
   * files, not the table. Pruning is envelope-sound (false positives
   * rewrite an extra file; false negatives are impossible), so carried
   * files can never hold a matched key. The hit-test broadcasts the
   * O(files) envelope list and semi-joins the UPDATE side against it —
   * the update set never collects to the driver. Pure-insert merges
   * (no envelope hit) rewrite nothing and just append one delta file.
   * Other tables in the snapshot are carried forward untouched.
   *
   * Precondition: `updates` is key-unique (callers dedupe; a MERGE with
   * two rows for one key has no defined winner in Iceberg either).
   * Returns the committed snapshot; its meta records rewritten/preserved
   * file counts (the Iceberg commit-summary fields).
   */
  def mergeTable(cur: Snapshot, name: String, updates: DataFrame,
                 keyCol: String,
                 meta: Map[String, String] = Map.empty): Snapshot =
    copyOnWrite(cur, name, updates.select(updates(keyCol)), keyCol, "merge",
      meta, survivors => survivors.unionByName(updates))

  /** Iceberg copy-on-write DELETE on an integer-keyed table: drop every
    * row whose key appears in `keys`, with the SAME footer-envelope file
    * pruning as mergeTable — a retention sweep or right-to-be-forgotten
    * purge over a clustered key slice rewrites only the files that can
    * hold a doomed key; history outside the slice is carried verbatim. */
  def deleteKeys(cur: Snapshot, name: String, keys: DataFrame,
                 keyCol: String,
                 meta: Map[String, String] = Map.empty): Snapshot =
    copyOnWrite(cur, name, keys.select(keys(keyCol)), keyCol, "delete",
      meta, identity)

  /** Shared copy-on-write kernel: footer-envelope hit-test -> rewrite
    * only touched files (their rows minus `keyDf` matches, then
    * `finish` — union the updates for MERGE, identity for DELETE) ->
    * commit with untouched manifest entries carried verbatim. The
    * hit-test broadcasts the O(files) envelope list and semi-joins the
    * key side against it — the key set never collects to the driver. */
  private def copyOnWrite(cur: Snapshot, name: String, keyDf: DataFrame,
                          keyCol: String, op: String,
                          meta: Map[String, String],
                          finish: DataFrame => DataFrame): Snapshot = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val stats = cur.tables(name).files.map { f =>
      val (lo, hi, rows) = ParquetStats.int64FileStats(
        spark, new Path(baseDir, f.name).toString, keyCol)
      (f, lo, hi, rows)
    }
    val envDf = spark.createDataFrame(
      stats.zipWithIndex.map { case ((_, lo, hi, _), i) => (i, lo, hi) })
      .toDF("__fid", "__lo", "__hi")
    val touchedIds = keyDf
      .select(col(keyCol).cast("long").as("__k")).distinct()
      .join(broadcast(envDf),
        col("__k") >= col("__lo") && col("__k") <= col("__hi"))
      .select("__fid").distinct()
      .collect().map(_.getInt(0)).toSet
    val (touched, untouched) =
      stats.zipWithIndex.partition(s => touchedIds(s._2))
    val survivors =
      if (touched.isEmpty) table(cur, name).limit(0)
      else spark.read.parquet(touched.map { case ((f, _, _, _), _) =>
          new Path(baseDir, f.name).toString }: _*)
        .join(keyDf.distinct(), Seq(keyCol), "left_anti")
    val others = (cur.tables - name).map { case (n, tl) =>
      n -> TableWrite(table(cur, n).limit(0), tl.files, tl.rows)
    }
    commitWrites(
      meta ++ Map(
        s"$op.table" -> name,
        s"$op.rewritten_files" -> touched.size.toString,
        s"$op.preserved_files" -> untouched.size.toString),
      others ++ Map(name -> TableWrite(finish(survivors),
        untouched.map(_._1._1), untouched.map(_._1._4).sum)))
  }

  /** The manifest file-list diff between two versions of `name`:
    * (removed, added) file names, sorted. Files in BOTH manifests are
    * CARRIED — data files are immutable under the append/CoW model, so a
    * carried file's rows are bit-identical in both versions and can
    * never contribute a change. */
  def changedFileSets(prev: Snapshot, cur: Snapshot,
                      name: String): (Seq[String], Seq[String]) = {
    val f0 = prev.tables(name).files.map(_.name).toSet
    val f1 = cur.tables(name).files.map(_.name).toSet
    ((f0 -- f1).toSeq.sorted, (f1 -- f0).toSeq.sorted)
  }

  /** CDC / changelog read between two snapshots (Delta CDF / Iceberg
    * changelog-scan shape): every row of `cur` not in `prev` tagged
    * `insert`, every row of `prev` not in `cur` tagged `delete` — an
    * update is its delete+insert pair (the retract/add changelog form
    * streaming consumers expect). Computed from the MANIFEST DIFF alone:
    * carried files are never read (their rows would cancel in the
    * multiset difference anyway — skipping them is pure pruning), so the
    * scan + the two exceptAll shuffles are O(rewritten slice), never
    * O(table). Rows a copy-on-write rewrite carried unchanged into a new
    * file cancel in exceptAll and emit nothing — the changelog is the
    * LOGICAL diff, not the physical one. */
  def changelog(prev: Snapshot, cur: Snapshot, name: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val (removed, added) = changedFileSets(prev, cur, name)
    def readFiles(fsq: Seq[String]): DataFrame =
      if (fsq.isEmpty) table(cur, name).limit(0)
      else spark.read.parquet(fsq.map(f => new Path(baseDir, f).toString): _*)
    val before = readFiles(removed)
    val after = readFiles(added)
    after.exceptAll(before).withColumn("change", lit("insert"))
      .unionByName(before.exceptAll(after).withColumn("change", lit("delete")))
  }

  private def deletesTableName(name: String) = s"${name}__deletes"

  /** Iceberg v2 MERGE-ON-READ equality delete — the other half of the
    * delete model next to copy-on-write `deleteKeys`: the doomed KEYS are
    * committed as a DELETE FILE and every data file is carried verbatim,
    * so the commit costs O(keys) at ANY table size. This is the right
    * shape when the keys are SCATTERED across the key space (a per-user
    * purge over a time-clustered table): CoW would envelope-hit — and
    * rewrite — every file, while MoR defers that cost to readers (an
    * anti-join against the broadcast-sized delete set) until a
    * maintenance `compactDeletes` folds them in. Delete files accumulate
    * under the append model across repeated MoR commits. */
  def deleteKeysMor(cur: Snapshot, name: String, keys: DataFrame,
                    keyCol: String,
                    meta: Map[String, String] = Map.empty): Snapshot = {
    val dt = deletesTableName(name)
    val carried = (cur.tables - dt).map { case (n, tl) =>
      n -> TableWrite(table(cur, n).limit(0), tl.files, tl.rows)
    }
    val prior = cur.tables.get(dt)
    val dw = TableWrite(keys.select(keys(keyCol)).distinct(),
      prior.map(_.files).getOrElse(Nil), prior.map(_.rows).getOrElse(0L))
    commitWrites(
      meta ++ Map("mor.delete.table" -> name, "mor.delete.key" -> keyCol),
      carried ++ Map(dt -> dw))
  }

  /** Read `name` with pending merge-on-read deletes APPLIED: an anti-join
    * against the (broadcast-sized) accumulated delete-key set — the
    * read-time merge Iceberg v2 readers perform. No pending deletes →
    * the plain manifest read. */
  def tableMor(snap: Snapshot, name: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val dt = deletesTableName(name)
    val data = table(snap, name)
    snap.tables.get(dt) match {
      case Some(tl) if tl.rows > 0 =>
        data.join(broadcast(table(snap, dt).select(col(keyCol)).distinct()),
          Seq(keyCol), "left_anti")
      case _ => data
    }
  }

  /** Maintenance: fold the accumulated equality deletes into the data
    * files (Iceberg's rewrite_data_files + delete-file cleanup) — a
    * copy-on-write delete of the pending key set, with the delete table
    * dropped in the SAME commit. After this, plain `table` reads no
    * longer pay the anti-join. */
  def compactDeletes(cur: Snapshot, name: String, keyCol: String,
                     meta: Map[String, String] = Map.empty): Snapshot = {
    import org.apache.spark.sql.functions.col
    val dt = deletesTableName(name)
    require(cur.tables.contains(dt), s"no pending deletes for $name")
    val keys = table(cur, dt).select(col(keyCol)).distinct()
    deleteKeys(cur.copy(tables = cur.tables - dt), name, keys, keyCol, meta)
  }

  /** Maintenance: BIN-PACK small data files into target-sized files
    * (Iceberg's `rewrite_data_files` binpack strategy). Streaming sinks
    * and per-wave delta commits leave a long tail of tiny files, and at
    * scale the FILE COUNT — per-file open/footer cost, manifest size,
    * task-launch overhead — becomes the scan bottleneck before the byte
    * count does. Files already at or above `targetRows` are CARRIED
    * VERBATIM (never read, never copied — the CoW discipline); smaller
    * files are packed greedily, in deterministic manifest order, into
    * bins of up to `targetRows` rows, and every multi-file bin is
    * rewritten as exactly ONE file: each bin is its own coalesced write
    * job (Iceberg likewise rewrites each file group as its own task —
    * and a single union write canNOT pin the boundaries, see TableWrite's
    * extraDfs note). A single-file bin is
    * carried, not rewritten (no gain). Content is untouched — a pure
    * layout commit; like any compaction it restarts incremental
    * consumers (`addedTable`'s documented contract). */
  def rewriteSmallFiles(cur: Snapshot, name: String, targetRows: Long,
                        meta: Map[String, String] = Map.empty): Snapshot = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val stats = cur.tables(name).files.map { f =>
      (f, footerRows(new Path(baseDir, f.name)))
    }
    val (big, small) = stats.partition(_._2 >= targetRows)
    val bins = collection.mutable.ArrayBuffer[Vector[(FileLineage, Long)]]()
    var bin = Vector.empty[(FileLineage, Long)]
    var binRows = 0L
    small.foreach { case fr @ (_, r) =>
      if (bin.nonEmpty && binRows + r > targetRows) {
        bins += bin; bin = Vector(fr); binRows = r
      } else { bin :+= fr; binRows += r }
    }
    if (bin.nonEmpty) bins += bin
    val (rewriteBins, carryBins) = bins.toVector.partition(_.size >= 2)
    val carried = big ++ carryBins.flatten
    val packed = rewriteBins.map { b =>
      spark.read.parquet(b.map { case (f, _) =>
        new Path(baseDir, f.name).toString }: _*).coalesce(1)
    }
    val df =
      if (packed.isEmpty) table(cur, name).limit(0) else packed.head
    val extra = if (packed.isEmpty) Nil else packed.tail
    val others = (cur.tables - name).map { case (n, tl) =>
      n -> TableWrite(table(cur, n).limit(0), tl.files, tl.rows)
    }
    commitWrites(
      meta ++ Map(
        "compact.table" -> name,
        "compact.rewritten_files" -> rewriteBins.map(_.size).sum.toString,
        "compact.new_files" -> rewriteBins.size.toString,
        "compact.carried_files" -> carried.size.toString),
      others ++ Map(name -> TableWrite(df, carried.map(_._1),
        carried.map(_._2).sum, extra)))
  }

  /** Maintenance: delete files NO existing manifest references —
    * Iceberg's `remove_orphan_files`, the missing half of `expire`
    * (expire reclaims files whose manifests aged out; this reclaims
    * debris that never made it INTO a manifest): crashed-commit temp
    * dirs (`_tmp_v*`, `_latest.partial`) and stray data files inside
    * version dirs. A file any live (time-travel-readable) manifest
    * lists is never touched — compacted-away files stay until `expire`
    * drops their manifests. `graceMs` skips entries modified within
    * that window (Iceberg's `older_than` guard: a CONCURRENT committer's
    * in-flight `_tmp_v` dir must not be swept — production passes hours;
    * tests pass 0). Returns the number of deleted entries. */
  def removeOrphans(graceMs: Long = 0L): Int = {
    if (latestId.isEmpty) return 0
    // referenced = the union over EVERY version dir that still holds a
    // manifest.json — not just ids <= the latest pointer: rollback()
    // abandons snapshots ABOVE the pointer but keeps their manifests
    // time-travel-readable until expire drops them, and sweeping their
    // data files would leave dangling manifests whose reads fail
    // (round-5 advice #1).
    val referenced = fs.listStatus(new Path(baseDir)).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("v\\d+"))
      .map(_.drop(1).toLong)
      .filter(id => fs.exists(new Path(baseDir, s"v$id/manifest.json")))
      .flatMap(id => read(id).tables.values.flatMap(_.files.map(_.name)))
      .toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var deleted = 0
    fs.listStatus(new Path(baseDir)).foreach { st =>
      val nm = st.getPath.getName
      if ((nm.startsWith("_tmp_v") || nm == "_latest.partial") &&
          st.getModificationTime <= cutoff) {
        fs.delete(st.getPath, true)
        deleted += 1
      } else if (nm.matches("v\\d+") && st.isDirectory) {
        fs.listStatus(st.getPath).filter(_.isDirectory).foreach { td =>
          fs.listStatus(td.getPath).foreach { f =>
            val fn = f.getPath.getName
            val rel = s"$nm/${td.getPath.getName}/$fn"
            // Hadoop-hidden entries (_SUCCESS markers, .crc) are write
            // metadata, not data debris — never manifest-listed, never
            // orphans
            if (!fn.startsWith("_") && !fn.startsWith(".") &&
                !referenced.contains(rel) &&
                f.getModificationTime <= cutoff) {
              fs.delete(f.getPath, false)
              deleted += 1
            }
          }
        }
      }
    }
    deleted
  }

  /** Iceberg-style queryable METADATA table `table.files`: one row per
    * manifest entry of a snapshot — (table, file, bytes, origin
    * version). Pure manifest data (zero data-file IO); the inspection
    * surface a 100-TB operator queries before planning a compaction or
    * auditing a merge's carry set. */
  def filesTable(snap: Snapshot): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    snap.tables.toSeq.flatMap { case (t, tl) =>
      tl.files.map { f =>
        (t, f.name, f.bytes, f.name.takeWhile(_ != '/').drop(1).toLong)
      }
    }.toDF("table", "file", "bytes", "origin_version")
  }

  /** Metadata table `table.snapshots`: every still-readable version's
    * (id, per-table row counts, file count, meta as sorted k=v) —
    * Iceberg's snapshots/history inspection surface, from manifests
    * alone. */
  def snapshotsTable(): org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val last = latestId.getOrElse(-1L)
    val fss = fs.listStatus(new Path(baseDir)).toSeq
      .map(_.getPath.getName).filter(_.matches("v\\d+"))
      .map(_.drop(1).toLong).filter(_ <= last).sorted
      .filter(id => fs.exists(new Path(baseDir, s"v$id/manifest.json")))
    fss.map { id =>
      val s = read(id)
      (id, s.tables.map { case (t, tl) => s"$t=${tl.rows}" }.toSeq.sorted
        .mkString(","),
        s.tables.values.map(_.files.size).sum.toLong,
        s.meta.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(";"))
    }.toDF("version", "row_stats", "n_files", "meta")
  }

  /** Read a table with ADD-COLUMN schema evolution reconciled at read
    * time (Iceberg's evolution model, restricted to the additive case
    * parquet name-based merging supports): files written before the
    * column was added simply lack it, and their rows surface it as null.
    * `mergeSchema` unions the footer schemas across the manifest's file
    * list — an O(files) planning cost, which is why it's a separate
    * method and not the default `table` read path. */
  def tableEvolved(snap: Snapshot, name: String): DataFrame = {
    val paths = snap.tables(name).files
      .map(f => new Path(baseDir, f.name).toString)
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
  }

  /**
   * Iceberg-style snapshot expiry (expire_snapshots + the data-file
   * sweep): keep the newest `keepLast` manifests; older snapshots stop
   * being time-travelable and any data file NO KEPT MANIFEST references
   * is deleted. Under the append model a file written by snapshot k is
   * typically referenced by every later manifest until a compaction, so
   * reachability is computed from the kept manifests' file lists — never
   * from file age. Returns the number of deleted data files.
   */
  def expire(keepLast: Int): Int = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val last = latestId.getOrElse(return 0)
    val firstKept = math.max(0L, last - keepLast + 1)
    // a kept id whose manifest a PREVIOUS (tighter) expire already
    // dropped contributes nothing — reachability comes from manifests
    // that still exist
    val referenced = (firstKept to last)
      .filter(id => fs.exists(new Path(baseDir, s"v$id/manifest.json")))
      .flatMap(id => read(id).tables.values.flatMap(_.files.map(_.name)))
      .toSet
    var deleted = 0
    (0L until firstKept).foreach { id =>
      val dir = new Path(baseDir, s"v$id")
      if (fs.exists(dir)) {
        if (!referenced.exists(_.startsWith(s"v$id/"))) {
          // nothing in this snapshot dir is reachable: drop it wholesale
          fs.listStatus(dir).filter(_.isDirectory).foreach { td =>
            deleted += fs.listStatus(td.getPath).length
          }
          fs.delete(dir, true)
        } else {
          // some files still back kept snapshots: expire the manifest
          // (no more time travel to this version) + unreferenced files
          fs.delete(new Path(dir, "manifest.json"), false)
          fs.listStatus(dir).filter(_.isDirectory).foreach { td =>
            fs.listStatus(td.getPath).foreach { f =>
              val rel = s"v$id/${td.getPath.getName}/${f.getPath.getName}"
              if (!referenced.contains(rel)) {
                fs.delete(f.getPath, false)
                deleted += 1
              }
            }
          }
        }
      }
    }
    deleted
  }

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
