package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming extension (SURVEY §2.10): the reference is batch
 * with incremental checkpointing; its wave loop is a BSP superstep, which
 * the engine keeps batch. These operators are the documented continuous
 * path — the same logical transforms running incrementally:
 *
 *  - windowed event aggregation with watermarks (late-data bounded) — the
 *    streaming twin of the batch time-bucket query;
 *  - a stateful first-seen URL dedup via mapGroupsWithState — the
 *    streaming twin of the frontier's seen-set anti-join (J1).
 *
 * Both run identically from `readStream` sources; tests drive them with
 * file sources + Trigger.AvailableNow for deterministic replay.
 */
object Streaming {

  /** Windowed counts with a watermark: append-mode safe. */
  def windowedEventCounts(events: DataFrame,
                          window_ : String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).getField("start").as("w_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))

  /**
   * APPEND-mode windowed counts (§2.10, late-data semantics): each window
   * row is emitted exactly once — when the watermark passes the window
   * end — and a row arriving after its window closed is dropped by the
   * watermark before it reaches state (`numRowsDroppedByWatermark` in the
   * query progress counts them). Unlike `windowedEventCounts` (complete
   * mode), the full `window` struct must survive the aggregation for the
   * watermark→state linkage, so the start is projected AFTER the agg.
   */
  def windowedEventCountsAppend(events: DataFrame,
                                window_ : String = "1 hour",
                                watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /**
   * APPEND-mode event-time SESSIONIZATION (§2.10 part 9) — the streaming
   * twin of the batch session_window query: session state for a user key
   * MERGES across micro-batches while consecutive events stay within the
   * gap, and a session is emitted exactly once, when the watermark passes
   * its end (last event + gap). State is O(open sessions), evicted on
   * close — the only sessionization that runs forever on a firehose.
   * NOTE: Catalyst pushes non-time predicates BELOW the watermark node
   * (correct — the watermark only bounds rows that reach state, and at a
   * parquet source the pushed filter prunes whole row groups), so a
   * watermark-advancing sentinel row must SURVIVE any upstream scoping
   * filter; park it at a far-future event time instead — its own session
   * then never closes and never reaches the sink. The session struct
   * must survive the aggregation for the watermark→state linkage (same
   * rule as windowedEventCountsAppend); start/end project after the agg.
   */
  def sessionizedAppend(events: DataFrame,
                        gap: String = "30 minutes",
                        watermark: String = "45 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("n_events"), col("sum_value"))

  final case class UrlEvent(url: String, host: String, seq: Long)
  final case class FirstSeen(url: String, host: String, firstSeq: Long)

  /**
   * Streaming first-seen dedup: for each URL key, emit exactly one row
   * (its first occurrence by arrival), keep a boolean state afterwards.
   * This is the incremental form of the seen-set anti-join — state store
   * = the seen table, partitioned by key hash exactly like the batch
   * engine's canonical-host hash partitioning.
   */
  def firstSeenUrls(urls: Dataset[UrlEvent]): Dataset[FirstSeen] = {
    import urls.sparkSession.implicits._
    urls
      .groupByKey(_.url)
      .mapGroupsWithState[Boolean, Option[FirstSeen]](
        GroupStateTimeout.NoTimeout) {
        case (url, rows, state: GroupState[Boolean]) =>
          if (state.exists) None
          else {
            val first = rows.minBy(_.seq)
            state.update(true)
            Some(FirstSeen(url, first.host, first.seq))
          }
      }
      .flatMap(_.toSeq)
  }

  /**
   * Stream-static enrichment (§2.10, part 3): a streaming event source
   * joined against a STATIC dimension table, then aggregated per
   * dimension attribute. The static side re-plans per micro-batch (so a
   * dimension refresh is picked up) and broadcasts when small — the
   * standard enrichment topology of a live crawl/ingest pipeline
   * (events ⨝ host-metadata). Complete-mode aggregation: the final
   * table equals the batch join+agg, which is the DuckDB oracle.
   */
  def enrichedSegmentStats(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))

  final case class RateUrl(host: String, url: String, seq: Long)
  final case class Admitted(host: String, url: String, seq: Long,
                            adm_rank: Long)

  /**
   * Streaming per-host admission budget via flatMapGroupsWithState — the
   * continuous form of the batch politeness dequeue (O5): each host may
   * admit at most `perHostCap` URLs over the LIFETIME of the stream, in
   * (micro-batch, seq) order; the running admitted count is the keyed
   * state carried across batches. Admission rank is global per host
   * (state + in-batch position), so a host capped in batch 0 admits
   * nothing in batch 1 — the cross-batch-state behavior q24's boolean
   * seen-set cannot express.
   *
   * Per-batch group rows are sorted by seq before admission: the admitted
   * set is deterministic regardless of partition iteration order. The
   * sort materializes one host's single-batch rows (bounded in any real
   * deployment by per-host politeness pacing upstream — the same bound
   * the batch scheduler's per-host windows rely on).
   */
  def rateLimitedAdmissions(urls: Dataset[RateUrl],
                            perHostCap: Int): Dataset[Admitted] = {
    import urls.sparkSession.implicits._
    urls
      .groupByKey(_.host)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (host, rows, state: GroupState[Long]) =>
          val sofar = state.getOption.getOrElse(0L)
          val room = math.max(0L, perHostCap.toLong - sofar).toInt
          val admitted = rows.toSeq.sortBy(_.seq).take(room)
            .zipWithIndex.map { case (r, i) =>
              Admitted(host, r.url, r.seq, sofar + i + 1) }
          state.update(sofar + admitted.size)
          admitted.iterator
      }
  }

  /**
   * Stream-stream interval join (§2.10, part 6): each purchase joined to
   * the SAME user's clicks in the preceding hour — the attribution join.
   * Both sides carry watermarks and the join condition is time-bounded
   * in BOTH directions, which is exactly what lets Spark bound the join
   * state at 100 TB: click state older than (purchase watermark − 1 h)
   * is evicted instead of accumulating forever. Inner time-interval
   * joins are append-mode by construction — a matched pair is emitted
   * once, when both sides have arrived.
   */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame =
    purchases.withWatermark("p_ts", "2 hours")
      .join(clicks.withWatermark("c_ts", "2 hours"),
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))

  /**
   * LEFT-OUTER stream-stream interval join (§2.10, part 10): the
   * attribution join with null emission — purchases with NO click in
   * the preceding hour still emit, with a null click side. Unlike the
   * inner form, an outer row can only be emitted once the WATERMARK
   * proves no matching click can still arrive (the condition's
   * `c_ts <= p_ts` bound means a purchase's state is complete when the
   * global watermark passes p_ts) — it is the watermark, not batch
   * boundaries, that certifies the null, which keeps the semantics
   * exact on an unbounded out-of-order stream while join state stays
   * bounded exactly as in [[clickAttribution]].
   */
  def clickAttributionOuter(clicks: DataFrame,
                            purchases: DataFrame): DataFrame =
    purchases.withWatermark("p_ts", "2 hours")
      .join(clicks.withWatermark("c_ts", "2 hours"),
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "leftOuter")

  /**
   * Watermark-BOUNDED streaming dedup (§2.10, part 7):
   * `dropDuplicatesWithinWatermark` keys state by event_id but — unlike
   * `firstSeenUrls`' lifetime seen-set — EVICTS a key's state once the
   * watermark passes its event time plus the delay. State is therefore
   * O(duplication window), not O(distinct keys ever) — the only dedup
   * shape that runs forever on a 100-TB firehose. Exact whenever
   * duplicates arrive within the watermark of the original, i.e. the
   * standard contract of upstream at-least-once delivery with bounded
   * replay lag (a producer retry, a Kafka rebalance replay).
   */
  def dedupWithinWatermark(events: DataFrame,
                           watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /**
   * Exactly-once TableIO sink for `foreachBatch` (§2.10, part 8): append
   * the micro-batch as a new snapshot whose meta records the batch id.
   * Spark's foreachBatch contract is at-least-once — after a crash
   * between the sink write and the checkpoint commit, the restarted
   * query RE-OFFERS the last batch with the SAME batchId — so the sink
   * must be idempotent on batchId to lift it to exactly-once (the
   * transactional-sink recipe from the Structured Streaming docs; Delta
   * and Iceberg sinks record txnAppId/batchId the same way). A replayed
   * or out-of-order batch id (≤ the latest committed) is skipped; the
   * atomic `_latest` pointer swap means a torn commit is invisible and
   * the replay cleanly re-commits. Returns whether a commit happened.
   */
  /** Latest committed batch id for `table`'s stream: the marker is
    * NAMESPACED per table (round-5 advice #2 — two streams writing
    * different tables of one store, or a stream plus a maintenance
    * commit like rewriteSmallFiles, would otherwise stomp each other's
    * store-global marker: lost updates or voided replay protection) and
    * found by scanning back through snapshots, so an interleaved commit
    * that doesn't carry the key can't erase it. The un-namespaced legacy
    * key is honored as a fallback for stores written by older code. */
  private def lastBatchId(tio: graft.tableio.TableIO, table: String): Long = {
    val key = s"stream.batch_id.$table"
    var id = tio.latestId.getOrElse(return -1L)
    while (id >= 0) {
      val m = tio.read(id).meta
      m.get(key).orElse(m.get("stream.batch_id")) match {
        case Some(v) => return v.toLong
        case None => id -= 1
      }
    }
    -1L
  }

  /** The table's most recent lineage, scanning back like the marker: a
    * snapshot only carries the tables its commit wrote, so when another
    * stream committed last, `latest.tables` misses this stream's table —
    * appending from None would silently reset its content. */
  private def lastLineage(tio: graft.tableio.TableIO,
                          table: String): Option[graft.tableio.TableLineage] = {
    var id = tio.latestId.getOrElse(return None)
    while (id >= 0) {
      tio.read(id).tables.get(table) match {
        case some @ Some(_) => return some
        case None => id -= 1
      }
    }
    None
  }

  def commitBatch(tio: graft.tableio.TableIO, table: String,
                  df: DataFrame, batchId: Long): Boolean = {
    if (batchId <= lastBatchId(tio, table)) false
    else {
      val tl = lastLineage(tio, table)
      tio.commitWrites(Map(s"stream.batch_id.$table" -> batchId.toString),
        Map(table -> graft.tableio.TableWrite(df,
          tl.map(_.files).getOrElse(Nil), tl.map(_.rows).getOrElse(0L))))
      true
    }
  }

  /**
   * Exactly-once streaming MERGE sink — the streaming-CDC apply recipe
   * (Delta's foreachBatch-MERGE pattern): each micro-batch of keyed
   * upserts lands as one copy-on-write `TableIO.mergeTable` commit, so
   * only files whose key envelopes match the batch rewrite (O(slice)
   * per batch at any table size) and every other manifest entry carries
   * verbatim. Idempotent on batchId exactly like `commitBatch` — a
   * crash-replayed batch is detected from the snapshot meta and
   * skipped, lifting foreachBatch's at-least-once to exactly-once.
   * The target table must exist (seed v0 with the base data); batches
   * must be key-unique (mergeTable's precondition — dedupe upstream).
   */
  def mergeBatch(tio: graft.tableio.TableIO, table: String,
                 updates: DataFrame, keyCol: String,
                 batchId: Long): Boolean = {
    val latest = tio.latest.getOrElse(throw new IllegalStateException(
      s"mergeBatch requires a seeded table '$table' (commit v0 first)"))
    if (batchId <= lastBatchId(tio, table)) false
    else {
      tio.mergeTable(latest, table, updates, keyCol,
        Map(s"stream.batch_id.$table" -> batchId.toString))
      true
    }
  }

  /** Batch twin of firstSeenUrls (for test equivalence). */
  def firstSeenUrlsBatch(urls: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url")).orderBy(col("seq"))
    urls.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("url"), col("host"), col("seq").as("firstSeq"))
  }
}
