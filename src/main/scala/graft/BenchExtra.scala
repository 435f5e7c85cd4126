package graft

import org.apache.spark.sql.SparkSession

/**
 * Round-6 measurement harness (separate from the FROZEN graft.Bench —
 * driver contract): per-query isolation timings and plan dumps, used to
 * produce the before/after evidence in OPTIMIZATION_r06.md and
 * plans/r06/. Methodology mirrors Bench where it matters (same session
 * config, same `.count()` action, same SPARK_GRAFT_SF_DIR/CPUS contract)
 * and adds what the optimization guide §1 asks for:
 *
 *  - `time <q1,q2,...|all> [reps]` — N timed runs per query (count()
 *    action, like Bench), each labelled via setJobDescription;
 *  - `noop <q1,...> [reps]`       — same but with the noop sink (§1.4:
 *    forces every column, no count-only pruning);
 *  - `explain <q1,...> <outdir> [tag]` — writes
 *    `<outdir>/<query>_<tag>.txt` with explain("formatted").
 */
object BenchExtra {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString).toInt
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("time")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names: Seq[String] = args.lift(1) match {
      case None | Some("all") => SparkEntry.queries.keys.toSeq.sorted
      case Some(list) => list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }
    val spark = session()
    mode match {
      case "time" | "noop" =>
        val reps = args.lift(2).map(_.toInt).getOrElse(3)
        val phases = sys.env.get("SPARK_GRAFT_PHASES").contains("1")
        if (phases) graft.engine.WavePhase.install(spark)
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          val secs = (1 to reps).map { i =>
            if (name.startsWith("crawl") || name.startsWith("web"))
              Queries.crawlCacheClear()
            if (phases) graft.engine.WavePhase.reset()
            spark.sparkContext.setJobDescription(s"$name#$i")
            val (_, sec) = time {
              val df = fn(spark, sfDir)
              if (mode == "noop")
                df.write.format("noop").mode("overwrite").save()
              else df.count()
            }
            spark.sparkContext.setJobDescription(null)
            if (phases) println(graft.engine.WavePhase.report())
            sec
          }
          println(f"EXTRA $name%-24s ${secs.map(s => f"$s%.3f").mkString(" ")} min=${secs.min}%.3f")
        }
      case "roofline" =>
        // round-5 verdict #4: the roofline-normalized η claim rests on the
        // wave job and the roofline job being BYTES-MATCHED per row across
        // their exchanges. Pin it: run both legs at the declared scale and
        // report shuffle bytes-written per record from stage metrics.
        val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8000000").toLong
        val bytes = new java.util.concurrent.atomic.AtomicLong()
        val recs = new java.util.concurrent.atomic.AtomicLong()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val m = s.stageInfo.taskMetrics
              if (m != null) {
                bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
                recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
              }
            }
          })
        def leg(name: String)(f: => Unit): Unit = {
          // settle the listener bus so bytes land in the right bucket
          org.apache.spark.GraftListenerBridge
            .waitUntilListenerBusEmpty(spark.sparkContext, 30000L)
          bytes.set(0); recs.set(0)
          f
          org.apache.spark.GraftListenerBridge
            .waitUntilListenerBusEmpty(spark.sparkContext, 30000L)
          val b = bytes.get; val r = recs.get
          println(f"ROOFLINE $name%-10s shuffle_bytes=$b%d records=$r%d " +
            f"bytes_per_record=${if (r == 0) 0.0 else b.toDouble / r}%.1f")
        }
        leg("wave") { Bench.frontierThroughput(spark, n, warmupWaves = 1) }
        leg("roofline") { Bench.rooflineShuffle(spark, n) }
      case "explain" =>
        val outDir = args.lift(2).getOrElse("plans/r06")
        val tag = args.lift(3).getOrElse("before")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        names.foreach { name =>
          val fn = SparkEntry.queries(name)
          val df = fn(spark, sfDir)
          // queryExecution.explainString — the same text explain() prints
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
            txt.getBytes("UTF-8"))
          println(s"EXPLAIN $name -> $outDir/${name}_$tag.txt")
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
