package graft.engine

import graft.SparkTestSession
import graft.tableio.{TableIO, TableWrite}
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Model-based randomized test of the whole table-format layer: a seeded
 * random walk over {append, merge, delete, compact, rollback, expire,
 * orphan-GC} is mirrored against a trivial in-memory model
 * (Map[key -> tag] per version), and after EVERY step the real table
 * must equal the model — latest content, the rows stat, and a randomly
 * chosen still-readable old version (time travel). Semantics honored by
 * the model: a commit after a rollback BRANCHES (history past the
 * rollback point is forfeited — the engine overwrites the abandoned
 * version dirs), and expire(keepLast) ends time travel below the kept
 * window. Three fixed seeds keep the walk deterministic while covering
 * op interleavings no hand-written case would.
 */
class TableIOModelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "tag").repartition(2)
  }

  private def contentOf(io: TableIO, snapId: Long): Map[Long, String] =
    io.table(io.read(snapId), "t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def walk(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-model-$seed-").toString
    val io = new TableIO(dir, spark)

    var nextKey = 0L
    def freshKeys(n: Int): Seq[Long] = {
      val ks = nextKey until (nextKey + n)
      nextKey += n
      ks
    }

    var model = freshKeys(20).map(_ -> "v0").toMap
    var cur = io.commit(Map.empty, Map("t" -> df(model.toSeq)))
    // readable history: version id -> expected content
    var history = Map(cur.id -> model)

    for (step <- 1 to 25) {
      rnd.nextInt(10) match {
        case 0 | 1 => // append a fresh-key delta
          val delta = freshKeys(1 + rnd.nextInt(8)).map(_ -> s"a$step")
          val tl = cur.tables("t")
          cur = io.commitWrites(Map.empty, Map("t" ->
            TableWrite(df(delta), tl.files, tl.rows)))
          model ++= delta
          history += cur.id -> model
        case 2 | 3 => // merge: update a random slice + maybe insert
          val upd = rnd.shuffle(model.keys.toSeq)
            .take(1 + rnd.nextInt(6)).map(_ -> s"m$step")
          val ins =
            if (rnd.nextBoolean()) freshKeys(rnd.nextInt(3)).map(_ -> s"m$step")
            else Nil
          val batch = upd ++ ins
          if (batch.nonEmpty) {
            cur = io.mergeTable(cur, "t", df(batch), "k")
            model ++= batch
            history += cur.id -> model
          }
        case 4 => // retention delete of a random slice
          val doomed = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(5))
          if (doomed.nonEmpty) {
            cur = io.deleteKeys(cur, "t",
              df(doomed.map(_ -> "")).select(col("k")), "k")
            model --= doomed
            history += cur.id -> model
          }
        case 5 => // bin-pack compaction: layout-only
          cur = io.rewriteSmallFiles(cur, "t", targetRows = 40)
          history += cur.id -> model
        case 6 => // rollback, then the walk continues from there (branch)
          val candidates = history.keys.filter(_ < cur.id).toSeq.sorted
          if (candidates.nonEmpty) {
            val target = candidates(rnd.nextInt(candidates.size))
            cur = io.rollback(target)
            model = history(target)
            // the next commit overwrites the abandoned dirs — forfeit
            // that history in the model NOW (reads of abandoned versions
            // between rollback and branch commit are legal but the walk
            // doesn't rely on them)
            history = history.filter(_._1 <= target)
          }
        case 7 => // expire: time travel ends below the kept window
          val keep = 2 + rnd.nextInt(3)
          io.expire(keepLast = keep)
          val firstKept = math.max(0L, cur.id - keep + 1)
          history = history.filter(_._1 >= firstKept)
        case 8 => // orphan GC: never changes any readable content
          io.removeOrphans()
        case 9 => // no-op step: re-read latest (pointer stability)
          assert(io.latestId.contains(cur.id))
      }
      // invariants after every step
      assert(contentOf(io, cur.id) == model,
        s"seed=$seed step=$step: latest content diverged from the model")
      assert(cur.tables("t").rows == model.size,
        s"seed=$seed step=$step: manifest row stat diverged")
      // time travel to a random still-readable version
      if (history.size > 1 && step % 3 == 0) {
        val vid = rnd.shuffle(history.keys.toSeq).head
        assert(contentOf(io, vid) == history(vid),
          s"seed=$seed step=$step: time travel to v$vid diverged")
      }
    }
  }

  test("randomized op walk preserves content, stats, and time travel (seed 1)") {
    walk(1L)
  }
  test("randomized op walk preserves content, stats, and time travel (seed 2)") {
    walk(2L)
  }
  test("randomized op walk preserves content, stats, and time travel (seed 3)") {
    walk(3L)
  }
}
