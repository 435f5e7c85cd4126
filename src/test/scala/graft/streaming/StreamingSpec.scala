package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streaming windowed counts == batch time-bucket aggregation") {
    // watermarks need TIMESTAMP (with tz); testdata ts is TIMESTAMP_NTZ
    val batchDf = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val expected = Streaming.windowedEventCounts(batchDf)
      .orderBy("w_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect.toSeq

    val dir = Files.createTempDirectory("graft-stream-").toString
    batchDf.write.mode("overwrite").parquet(s"$dir/in")
    val fileStream = spark.readStream.schema(batchDf.schema).parquet(s"$dir/in")

    val q = Streaming.windowedEventCounts(fileStream)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .format("memory").queryName("wincounts")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("wincounts").orderBy("w_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect.toSeq
    assert(got == expected)
  }

  test("append mode + watermark: late rows dropped, windows emit on close (q35)") {
    // round-4 verdict #5: q23/q24/q31 never exercised the watermark's
    // late-row drop or append-mode emission. q35 stages on-time / bridge /
    // late micro-batches; the engine must drop every late row (they are 6h
    // past a 2h watermark) and emit exactly the closed on-time windows.
    val got = graft.Queries.q35StreamLate(spark, sf)
      .as[(java.time.LocalDateTime, String, Long, Double)].collect.toSeq
    // hard evidence the watermark did the dropping (not the aggregation
    // shape): the state operator's numRowsDroppedByWatermark counter
    assert(graft.Queries.q35LastDropped > 0,
      "expected the late batch to be dropped by the watermark")
    // batch oracle: window agg over the on-time rows, windows closed at
    // the final watermark (end <= max(ts) - 2h; boundary measured)
    val events = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val wm = events.agg(max("ts")).head.getTimestamp(0).toInstant
      .minusSeconds(2 * 3600)
    val expected = Streaming.windowedEventCounts(events)
      .filter(col("w_start") + expr("INTERVAL 1 HOUR") <= lit(java.sql.Timestamp.from(wm)))
      .withColumn("w_start", col("w_start").cast("timestamp_ntz"))
      .orderBy("w_start", "event_type")
      .as[(java.time.LocalDateTime, String, Long, Double)].collect.toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("streaming sessions merge across micro-batches == batch session_window (q70)") {
    val got = graft.Queries.q70StreamSessions(spark, sf)
      .as[(Long, java.time.LocalDateTime, java.time.LocalDateTime, Long, Double)]
      .collect.toSeq
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .filter(col("user_id") < 40)
    // the parity split puts both halves of these sessions in DIFFERENT
    // micro-batches: if streaming state failed to merge across batches,
    // they would emit split and the equality below could not hold
    val crossBatch = ev
      .withColumn("par", pmod(col("event_id"), lit(2)))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(countDistinct("par").as("np"))
      .filter(col("np") === 2).count()
    assert(crossBatch > 0, "fixture must contain cross-batch sessions")
    val expected = ev
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("user_id"),
        col("sw.start").cast("timestamp_ntz").as("s_start"),
        col("sw.end").cast("timestamp_ntz").as("s_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "s_start")
      .as[(Long, java.time.LocalDateTime, java.time.LocalDateTime, Long, Double)]
      .collect.toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("streaming first-seen dedup == batch first-wins window") {
    val rows = Seq(
      Streaming.UrlEvent("http://h/a", "h", 3),
      Streaming.UrlEvent("http://h/a", "h", 1),
      Streaming.UrlEvent("http://h/b", "h", 2),
      Streaming.UrlEvent("http://g/c", "g", 5),
      Streaming.UrlEvent("http://h/b", "h", 9))
    val dir = Files.createTempDirectory("graft-stream2-").toString
    rows.toDS.write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream
      .schema(rows.toDS.toDF.schema)
      .parquet(s"$dir/in")
      .as[Streaming.UrlEvent]
    val q = Streaming.firstSeenUrls(stream)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .format("memory").queryName("firstseen")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("firstseen")
      .select("url", "firstSeq").as[(String, Long)].collect.toSet
    // one row per distinct url, first by seq within the micro-batch
    assert(got == Set(("http://h/a", 1L), ("http://h/b", 2L), ("http://g/c", 5L)))

    val batch = Streaming.firstSeenUrlsBatch(rows.toDS.toDF)
      .select("url", "firstSeq").as[(String, Long)].collect.toSet
    assert(got == batch)
  }

  test("watermark-bounded dedup: replayed duplicates suppressed exactly") {
    val dir = Files.createTempDirectory("graft-stream-dd-").toString
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
    // each event once PLUS a replayed (at-least-once redelivery) slice
    ev.unionAll(ev.filter(col("event_id") % 7 === 0))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema("event_id BIGINT, ts TIMESTAMP")
      .parquet(s"$dir/in")
    val q = Streaming.dedupWithinWatermark(stream)
      .writeStream.outputMode("append").format("memory").queryName("ddwm")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("ddwm").select("event_id").as[Long].collect().sorted
    val want = ev.select("event_id").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq,
      "dedup must emit each event exactly once")
    // and it ran as the state-EVICTING dedup operator, not a lifetime set
    val ops = q.recentProgress.flatMap(_.stateOperators).map(_.operatorName)
    assert(ops.exists(_.toLowerCase.contains("dedupe")),
      s"expected a dedupe state operator, got: ${ops.toSeq}")
  }

  test("exactly-once sink: replayed batch ids are no-ops, restart commits nothing") {
    val io = new graft.tableio.TableIO(
      Files.createTempDirectory("graft-sink-").toString, spark)
    val b0 = spark.range(0, 100).select(col("id").as("k"))
    val b1 = spark.range(100, 150).select(col("id").as("k"))
    assert(Streaming.commitBatch(io, "t", b0.toDF, 0L))
    assert(Streaming.commitBatch(io, "t", b1.toDF, 1L))
    // foreachBatch's at-least-once crash contract: the last batch is
    // re-offered with the SAME id — the sink must make it a no-op
    assert(!Streaming.commitBatch(io, "t", b1.toDF, 1L), "replay must no-op")
    assert(!Streaming.commitBatch(io, "t", b0.toDF, 0L), "stale id must no-op")
    assert(io.latestId.contains(1L), "replays must not create snapshots")
    assert(io.table(io.latest.get, "t").count() == 150)
    // per-batch snapshot lineage: batch 0 alone is time-travelable
    assert(io.table(io.read(0L), "t").count() == 100)

    // end-to-end: an AvailableNow restart over the same checkpoint with
    // no new input commits nothing new
    val inDir = Files.createTempDirectory("graft-sink-in-").toString
    spark.range(0, 40).select(col("id").as("k"))
      .coalesce(1).write.mode("overwrite").parquet(inDir)
    val ckpt = Files.createTempDirectory("graft-sink-ckpt-").toString
    val out = new graft.tableio.TableIO(
      Files.createTempDirectory("graft-sink-out-").toString, spark)
    def runOnce(): Unit = {
      val q = spark.readStream.schema("k BIGINT").parquet(inDir)
        .writeStream
        .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       id: Long) => { Streaming.commitBatch(out, "t", df.toDF, id); () })
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); ()
    }
    runOnce()
    val idAfterFirst = out.latestId
    assert(idAfterFirst.isDefined)
    assert(out.table(out.latest.get, "t").count() == 40)
    runOnce() // restart, no new files
    assert(out.latestId == idAfterFirst, "a no-input restart must not commit")
    assert(out.table(out.latest.get, "t").count() == 40)
  }

  test("stream-stream interval join == batch interval join (q52 twin)") {
    val got = graft.Queries.q52StreamJoin(spark, sf)
      .as[(Long, Long, Long, Long)].collect.toSeq
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"),
        col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("cid"),
        col("ts").as("cts"))
    val batch = p.join(c, col("pu") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("cts") <= col("pts"))
      .select(col("pu"), col("pid"), col("cid"),
        (unix_micros(col("pts")) - unix_micros(col("cts"))).as("gap"))
      .orderBy("pid", "cid").as[(Long, Long, Long, Long)].collect.toSeq
    assert(got.nonEmpty, "fixture window must produce attribution pairs")
    assert(got == batch)
  }

  test("left-outer stream-stream join: watermark certifies null emission (q95 twin)") {
    val got = graft.Queries.q95StreamOuterJoin(spark, sf)
      .as[(Long, Long, Long, Long)].collect.toSeq
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"),
        col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("cid"),
        col("ts").as("cts"))
    val batch = p.join(c, col("pu") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL 1 HOUR") &&
        col("cts") <= col("pts"), "left")
      .select(col("pu"), col("pid"),
        coalesce(col("cid"), lit(-1L)).as("cid"),
        coalesce(unix_micros(col("pts")) - unix_micros(col("cts")),
          lit(-1L)).as("gap"))
      .orderBy("pid", "cid").as[(Long, Long, Long, Long)].collect.toSeq
    assert(got.exists(_._3 == -1L),
      "unmatched purchases must emit with the null (pinned -1) click side")
    assert(got.exists(_._3 >= 0L), "matched pairs must emit too")
    assert(got == batch)
  }

  test("batch markers are per-table and survive interleaved commits " +
      "(round-5 advice #2)") {
    val io = new graft.tableio.TableIO(
      Files.createTempDirectory("graft-sink-multi-").toString, spark)
    val rows = spark.range(0, 10).select(col("id").as("k"))
    // two independent streams into one store: t2's batch 0 must not be
    // swallowed by t1's higher marker
    assert(Streaming.commitBatch(io, "t1", rows.toDF, 5L))
    assert(Streaming.commitBatch(io, "t2", rows.toDF, 0L),
      "a different table's stream starts at its own batch 0")
    // an interleaved maintenance commit (no marker in its meta) must not
    // void replay protection for either stream
    io.commitWrites(Map("maintenance" -> "true"),
      Map("m" -> graft.tableio.TableWrite(rows.toDF)))
    assert(!Streaming.commitBatch(io, "t1", rows.toDF, 5L),
      "replay of t1 batch 5 must still no-op after a maintenance commit")
    assert(!Streaming.commitBatch(io, "t2", rows.toDF, 0L),
      "replay of t2 batch 0 must still no-op")
    // and t1's next batch both commits and CARRIES its accumulated rows
    // even though the latest snapshots were written by other commits
    assert(Streaming.commitBatch(io, "t1", rows.toDF, 6L))
    assert(io.table(io.latest.get, "t1").count() == 20L,
      "interleaved commits must not reset another stream's table")
  }

  test("mergeBatch: per-batch CoW upsert, exactly-once on batchId") {
    val dir = Files.createTempDirectory("graft-merge-batch-").toString
    val tio = new graft.tableio.TableIO(dir, spark)
    val base = spark.range(0, 100)
      .select(col("id").as("k"), lit("base").as("tag"))
    tio.commit(Map.empty, Map("t" ->
      base.repartitionByRange(4, col("k")).sortWithinPartitions("k")))
    val b0 = spark.range(0, 100).filter(col("id") % 10 === 0)
      .select(col("id").as("k"), lit("u0").as("tag"))
    assert(Streaming.mergeBatch(tio, "t", b0, "k", 0L))
    val v1 = tio.latestId.get
    // crash replay of the SAME batch id: no commit, no change
    assert(!Streaming.mergeBatch(tio, "t", b0, "k", 0L))
    assert(tio.latestId.get == v1)
    // batch 1: update the %15 slice (overlap at %30 -> last writer wins)
    // and insert new keys
    val b1 = spark.range(0, 100).filter(col("id") % 15 === 0)
      .select(col("id").as("k"), lit("u1").as("tag"))
      .unionByName(spark.range(1000, 1003)
        .select(col("id").as("k"), lit("ins").as("tag")))
    assert(Streaming.mergeBatch(tio, "t", b1, "k", 1L))
    // stale/out-of-order id after batch 1: refused
    assert(!Streaming.mergeBatch(tio, "t", b0, "k", 1L))
    val expected = spark.range(0, 100)
      .select(col("id").as("k"),
        when(col("id") % 15 === 0, "u1")
          .when(col("id") % 10 === 0, "u0")
          .otherwise("base").as("tag"))
      .unionByName(spark.range(1000, 1003)
        .select(col("id").as("k"), lit("ins").as("tag")))
    val got = tio.table(tio.latest.get, "t")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
