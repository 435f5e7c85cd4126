package graft.engine

import graft.model._
import graft.urlcanon.UrlRewrite
import graft.extract.Extract
import graft.seenset.{SeenFilter, SeenSet}
import graft.tableio.TableIO
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * The distributed crawl engine: a driver loop of BSP superstep "waves",
 * each wave one declarative DataFrame DAG (SURVEY §3.1):
 *
 *   frontier scan -> robots/politeness dequeue (O5) -> fetch join (J2)
 *   -> span extraction (E4) -> URL rewrite (F1-F7, typed map) -> qualify
 *   (§2.5) -> first-wins dedup (O4) + seen anti-join (J1, sketch-fronted)
 *   -> multi-insert (frontier', seen, edges, aliases, dump, fetch_log)
 *   -> snapshot commit (S7).
 *
 * Ordering parity with the sequential reference (`spiderfetch.py:138-190`)
 * comes from the explicit total-order key: every frontier record carries a
 * global `seq` (its discovery rank); every wave's discoveries are ranked by
 * (parent seq, extract idx) — exactly FIFO-enqueue order — and appended
 * after current maxima. Retries re-enter the same wave after the original
 * records (`spiderfetch.py:150-154`). Redirect records are sequence points
 * (each hop's dedup test observes earlier records' discoveries and aliases,
 * `spiderfetch.py:87-102`); their sequential interleaving is reconstructed
 * analytically by RedirectResolver, so EVERY wave runs as one distributed
 * batch and jobs scale with chain length, not redirect count.
 *
 * "Fetching" in-sandbox is the lookup join against the span-table corpus
 * (the corpus IS the web); on a real deploy the join body is replaced by a
 * host-partitioned mapPartitions HTTP client (SURVEY §2.1 S1).
 */
class CrawlEngine(
    private val spark: SparkSession,
    corpus: DataFrame,
    seedUrl: String,
    rules: Seq[RecipeRule],
    hostFilterEnabled: Boolean = false,
    config: CrawlConfig = CrawlConfig(),
    checkpoint: Option[TableIO] = None,
    useSketch: Boolean = false,
    stopAfterWaves: Option[Int] = None) {

  import spark.implicits._

  // corpus normalized to (doc_id, spans, redirect_to, fail_attempts)
  private val corpusN: DataFrame = {
    var c = corpus
    if (!c.columns.contains("redirect_to"))
      c = c.withColumn("redirect_to", lit(null).cast("string"))
    if (!c.columns.contains("fail_attempts"))
      c = c.withColumn("fail_attempts", lit(0))
    c.select("doc_id", "spans", "redirect_to", "fail_attempts")
  }

  // ---- mutable driver state (persisted in snapshots) ----
  private var seen: DataFrame = _
  private var processed: DataFrame = _
  private var dumped: DataFrame = _
  private var edges: DataFrame = _
  private var aliases: DataFrame = _
  private var fetchLog: DataFrame = _
  private var robotsBlocked: DataFrame = _
  private var metrics: DataFrame = _
  private var fetched: DataFrame = _  // raw fetched-file log (batch_ord, seq, wave, url)
  private var seqCounter: Long = 0L
  private var batchOrd: Long = 0L // sequential batch counter (ord prefix key)
  private var waveNo: Int = 0
  private var waveErrorCount: Long = 0L
  // per-partition (rows, errors) of the wave's fetch batches (A4 lineage)
  private var wavePartStats: Map[Int, (Long, Long)] = Map.empty
  private var lastWaveDiscovered: Long = 1L // seed queue is non-empty
  private var lastBatchNoRetries: Boolean = false
  private var sketch: SeenFilter = SeenFilter.empty

  private def tables: CrawlTables = {
    // materialize once: downstream consumers collect these repeatedly
    if (checkpoint.isEmpty) {
      processed = processed.localCheckpoint(true)
      dumped = dumped.localCheckpoint(true)
      aliases = aliases.localCheckpoint(true)
      fetchLog = fetchLog.localCheckpoint(true)
      robotsBlocked = robotsBlocked.localCheckpoint(true)
      metrics = metrics.localCheckpoint(true)
      edges = edges.localCheckpoint(true)
      fetched = fetched.localCheckpoint(true)
    }
    // the global processing order `ord` is assigned ONCE here — the crawl
    // accumulates raw (batch_ord, seq) keys instead of ranking per batch
    // (two Spark actions per batch saved; the key pair is already the
    // total processing order: batches are sequential, seq orders within)
    val (procRanked, _) = withOrderedIndex(processed,
      Seq(col("batch_ord"), col("seq")), "ord", 0L, truncateLineage = false)
    val processedTable = procRanked
      .select("wave", "ord", "url", "mode", "retry")
    // collision-safe filenames (ioutils.safe_filename + F8): n-th use of a
    // base name (in processing order) gets suffix ".n"
    val fetchedNamed = {
      import spark.implicits._
      val named = fetched
        .join(procRanked.select(col("batch_ord"), col("seq"), col("ord")),
          Seq("batch_ord", "seq"))
        .select(col("wave"), col("ord"), col("url"))
        .as[(Int, Long, String)]
        .map { case (w, o, u) => (w, o, u, UrlRewrite.urlToFilename(u)) }
        .toDF("wave", "ord", "url", "base")
      val wName = Window.partitionBy(col("base")).orderBy(col("ord"))
      named
        .withColumn("_n", row_number().over(wName) - 1)
        .withColumn("filename",
          when(col("_n") === 0, col("base"))
            .otherwise(concat(col("base"), lit("."), col("_n"))))
        .select("wave", "ord", "url", "filename")
    }
    CrawlTables(seen, processedTable, dumped,
      edges.groupBy("src", "dst").agg(min("wave").as("wave")),
      aliases, fetchLog, robotsBlocked, metrics, fetchedNamed)
  }

  // ---------------------------------------------------------------- utils

  private def emptyFrontier: DataFrame = spark.emptyDataset[FrontierRecord].toDF

  private def frontierRow(url: String, mode: Int, wave: Int, seq: Long): FrontierRecord =
    FrontierRecord(url, UrlRewrite.canonicalUrl(url), UrlRewrite.canonicalHost(url),
      mode, wave, seq, retry = false, attempt = 0)

  /**
   * Global deterministic dense rank over UNIQUE sort keys (SURVEY §4.3.1).
   * Two-phase partition-offset rank, pure DataFrame ops — no RDD
   * zipWithIndex hop out of Tungsten (round-1 verdict #6): range-shuffle
   * by the key, sort within partitions, then exploit
   * monotonically_increasing_id's documented layout
   * (partitionId << 33 | localRowNumber) for the within-partition
   * position; per-partition offsets come from one tiny count-per-partition
   * collect. One shuffle + one small job; no single-partition window.
   * Returns (persisted df with the rank column, row count).
   */
  private def withOrderedIndex(df: DataFrame, sortCols: Seq[Column],
                               name: String, offset: Long,
                               truncateLineage: Boolean = true): (DataFrame, Long) = {
    // localCheckpoint when the ranked output feeds the NEXT wave's plans —
    // without truncation the logical plan grows with every wave and
    // analysis/explain goes quadratic in crawl depth; plain persist when
    // the output only lands in end-of-crawl accumulators (one less job).
    // No explicit partition count: AQE coalesces the range shuffle for
    // tiny waves (task-latency dominated) and widens it for big ones.
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_g_mid", monotonically_increasing_id())
    val mid = if (truncateLineage) sorted.localCheckpoint(true)
      else sorted.persist()
    val parts = mid.groupBy(shiftright(col("_g_mid"), 33).as("_g_pid")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = parts.map(_._2).sum
    var acc = 0L
    val offRows = parts.map { case (pid, n) => val o = acc; acc += n; (pid, o) }
    import spark.implicits._
    val offDf = broadcast(offRows.toSeq.toDF("_g_pid", "_g_off"))
    val out = mid.withColumn("_g_pid", shiftright(col("_g_mid"), 33))
      .join(offDf, Seq("_g_pid"))
      .withColumn(name, col("_g_off") +
        col("_g_mid").bitwiseAND(lit((1L << 33) - 1)) + offset)
      .drop("_g_pid", "_g_off", "_g_mid")
    (out, total)
  }

  private def maskCol(pattern: Option[String]): Column =
    pattern.map(p => col("url").rlike(p)).getOrElse(lit(false))

  // ------------------------------------------------------------ lifecycle

  def run(): CrawlTables = {
    seen = Seq(Seen(seedUrl, UrlRewrite.canonicalHost(seedUrl), 0, 0L)).toDF
    processed = spark.emptyDataset[ProcessedRow].toDF
    dumped = spark.emptyDataset[DumpRow].toDF
    edges = spark.emptyDataset[Edge].toDF
    aliases = spark.emptyDataset[Alias].toDF
    fetchLog = spark.emptyDataset[FetchLogEntry].toDF
    robotsBlocked = spark.emptyDataset[RobotsBlockedRow].toDF
    metrics = spark.emptyDataset[WaveMetrics].toDF
    fetched = spark.emptyDataset[FetchedRaw].toDF
    seqCounter = 1L
    batchOrd = 0L
    waveNo = 0
    if (useSketch)
      sketch.addOne(seedUrl, UrlRewrite.canonicalHost(seedUrl))
    val queue0 = Seq(frontierRow(seedUrl, Mode.SPIDER, 0, 0L)).toDF
    crawlLoop(0, rules.head.depth, queue0, emptyFrontier)
  }

  /** Resume from the latest snapshot: identical final state to an
    * uninterrupted run (the reference's exact-resume contract,
    * `spiderfetch.py:169-174`, at wave granularity). */
  def resume(): CrawlTables = {
    val io = checkpoint.getOrElse(
      throw new IllegalStateException("resume requires a checkpoint TableIO"))
    val snap = io.latest.getOrElse(
      throw new IllegalStateException("no snapshot to resume from"))
    seen = io.table(snap, "seen"); processed = io.table(snap, "processed")
    dumped = io.table(snap, "dump"); edges = io.table(snap, "edges")
    aliases = io.table(snap, "aliases"); fetchLog = io.table(snap, "fetch_log")
    robotsBlocked = io.table(snap, "robots_blocked")
    metrics = io.table(snap, "metrics")
    fetched = io.table(snap, "fetched")
    seqCounter = snap.meta("seq_counter").toLong
    batchOrd = snap.meta("batch_ord").toLong
    waveNo = snap.meta("wave").toInt
    snap.meta.get("bloom").foreach(b =>
      sketch = SeenFilter.fromBytes(java.util.Base64.getDecoder.decode(b)))
    val ruleIdx = snap.meta("rule_idx").toInt
    val depth = snap.meta("depth").toInt
    crawlLoop(ruleIdx, depth, io.table(snap, "queue"), io.table(snap, "outer_queue"))
  }

  // main loop (spiderfetch.py:209-231)
  private def crawlLoop(startRule: Int, startDepth: Int,
                        startQueue: DataFrame, startOuter: DataFrame): CrawlTables = {
    var queue = startQueue
    var outer = startOuter
    var ruleIdx = startRule
    var depth = startDepth
    var resuming = true
    while (ruleIdx < rules.length) {
      val rule = rules(ruleIdx)
      if (!resuming) { queue = outer; outer = emptyFrontier; depth = rule.depth }
      resuming = false
      var more = queue.limit(1).count() > 0
      while (more) {
        if (depth > 0) depth -= 1
        else {
          val (fq, sq) = splitQueue(queue, ruleIdx == rules.length - 1)
          queue = fq; outer = sq
        }
        queue = processWave(queue, rule, ruleIdx)
        commitWave(ruleIdx, depth, queue, outer)
        if (stopAfterWaves.exists(waveNo >= _)) return tables
        // processWave already counted its discoveries — no extra job
        more = lastWaveDiscovered > 0
      }
      ruleIdx += 1
    }
    tables
  }

  // split_queue (spiderfetch.py:192-207): two filtered projections, seq kept
  private def splitQueue(queue: DataFrame, lastRule: Boolean): (DataFrame, DataFrame) = {
    val fetchQ = queue
      .filter(col("mode") === Mode.FETCH || col("mode") === Mode.SPIDER_FETCH)
      .withColumn("mode", lit(Mode.FETCH))
    val spiderQ =
      if (lastRule) emptyFrontier
      else queue
        .filter(col("mode") === Mode.SPIDER || col("mode") === Mode.SPIDER_FETCH)
        .withColumn("mode", lit(Mode.SPIDER))
    (fetchQ, spiderQ)
  }

  // ------------------------------------------------------------ wave body

  private def processWave(queue: DataFrame, rule: RecipeRule, ruleIdx: Int): DataFrame = {
    waveNo += 1
    waveErrorCount = 0L
    wavePartStats = Map.empty
    val (admitted0, blocked) = Scheduler.robotsFilter(spark, queue, config.robots)
    if (config.robots.nonEmpty && blocked.count() > 0)
      robotsBlocked = robotsBlocked.unionByName(
        blocked.select(lit(waveNo).as("wave"), col("url"), col("seq")))

    var discovered = emptyFrontier
    var frontierRows = 0L
    config.perHostBudget match {
      case None =>
        val admitted = admitted0.persist()
        frontierRows = admitted.count()
        val (frag1, retries) = processBatch(admitted, rule,
          knownNonEmpty = frontierRows > 0)
        val (frag2, _) = // retried once only
          if (lastBatchNoRetries) (emptyFrontier, emptyFrontier)
          else processBatch(retries, rule)
        discovered = frag1.unionByName(frag2)
      case Some(k) =>
        // localCheckpoint, not persist: `rest` references `pending` on
        // both join sides, so without truncation the logical plan doubles
        // every chunk iteration (analysis goes exponential in chunks)
        var pending = admitted0.localCheckpoint(true)
        var pendingCount = pending.count()
        frontierRows = pendingCount
        while (pendingCount > 0) {
          val (chunk, rest) = Scheduler.dequeueChunk(pending, k)
          // top-k of a non-empty pending set is non-empty
          val (frag, retries) = processBatch(chunk.persist(), rule,
            knownNonEmpty = true)
          discovered = discovered.unionByName(frag)
          pending = (if (lastBatchNoRetries) rest
            else rest.unionByName(retries)).localCheckpoint(true)
          pendingCount = pending.count()
        }
    }

    // per-partition lineage metrics (north rule): rows fetched and errors
    // per physical partition of the wave's fetch join (A4)
    val waveErrors = waveErrorCount
    val discN = discovered.count()
    lastWaveDiscovered = discN
    val partRows = wavePartStats.toSeq.sortBy(_._1).map { case (pid, (n, e)) =>
      WaveMetrics(waveNo, ruleIdx, pid, n, n, e, 0L)
    }
    val totalRow = WaveMetrics(waveNo, ruleIdx, -1, frontierRows, frontierRows,
      waveErrors, discN)
    metrics = metrics.unionByName((partRows :+ totalRow).toDF)

    discovered
  }

  /**
   * Process one ordered batch of frontier records as ONE distributed DAG.
   * Returns (discovered next-wave records, retry records for this wave).
   *
   * Redirect records are sequence points in the reference (their dup
   * checks observe earlier-seq records' discoveries and aliases); instead
   * of splitting the wave into per-redirect segments, the interleaving is
   * computed analytically by RedirectResolver — jobs per wave scale with
   * the longest redirect chain, not with the number of redirects.
   */
  private def processBatch(records: DataFrame, rule: RecipeRule,
                           knownNonEmpty: Boolean = false): (DataFrame, DataFrame) = {
    lastBatchNoRetries = true
    if (!knownNonEmpty && records.limit(1).count() == 0)
      return (emptyFrontier, emptyFrontier)

    val joinedBase = records.join(corpusN, col("url") === col("doc_id"), "left")
    val joined = (config.resumeState match {
      case Nil => joinedBase.withColumn("_resume_err", lit(null).cast("int"))
      case st => joinedBase.join(
        broadcast(FetchResume.failedResumes(spark, corpusN, st)),
        Seq("url"), "left")
    }).withColumn("outcome", CrawlEngine.outcomeCol)
      .persist()

    // ONE aggregation materializes the batch AND yields the per-partition
    // lineage rows (A4), the origin error count, and the redirect flag —
    // three former jobs folded into the cache-warming pass
    val temporalCodesS = ErrorCode.Temporal.toSeq
    val batchStats = joined.groupBy(spark_partition_id().as("_pid"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col("outcome") =!= ErrorCode.NONE, 1L).otherwise(0L)).as("_e"),
        sum(when(col("outcome") === ErrorCode.REDIRECT, 1L).otherwise(0L)).as("_r"),
        sum(when(col("outcome").isin(temporalCodesS: _*) && !col("retry"), 1L)
          .otherwise(0L)).as("_t"))
      .collect()
    batchStats.foreach { r =>
      val prev = wavePartStats.getOrElse(r.getInt(0), (0L, 0L))
      wavePartStats += r.getInt(0) ->
        (prev._1 + r.getLong(1), prev._2 + r.getLong(2))
    }
    waveErrorCount += batchStats.map(_.getLong(2)).sum

    val redirects = joined.filter(col("outcome") === ErrorCode.REDIRECT)
    val hasRedirects = batchStats.map(_.getLong(3)).sum > 0
    // no origin-temporal failures and no chains => retries provably empty;
    // the caller skips the retry sub-batch without another empty-check job
    lastBatchNoRetries = batchStats.map(_.getLong(4)).sum == 0 && !hasRedirects

    // spidering sources: successful SPIDER-mode rows (spiderfetch.py:156-161)
    val nonRedirectCands = qualifyCandidates(
      joined.filter(col("mode") === Mode.SPIDER &&
          col("outcome") === ErrorCode.NONE)
        .select(col("seq").as("parent_seq"), col("doc_id"), col("spans")),
      rule)

    val analysis =
      if (hasRedirects)
        Some(RedirectResolver.analyze(spark, redirects, corpusN, seen, rule,
          hostFilterEnabled, docs => qualifyCandidates(docs, rule),
          nonRedirectCands))
      else None

    val allCands = analysis.map(_.candidates).getOrElse(nonRedirectCands)
      .persist()

    // ---- processed log (the crawl-ordering parity surface): recorded
    // lazily under the (batch_ord, seq) total order; the dense global
    // `ord` is ranked once at tables() — no per-batch ranking actions
    processed = processed.unionByName(
      joined.select(lit(batchOrd).as("batch_ord"), col("seq"),
        lit(waveNo).as("wave"), col("url"), col("mode"), col("retry")))

    // ---- fetch log: origin fetch of every record + each reached chain hop
    val originLog = joined.select(col("url"), col("mode"),
      lit(waveNo).as("wave"), col("outcome").as("errorCode"), col("attempt"))
    val logAll = analysis match {
      case Some(a) => originLog.unionByName(
        a.validHops.select(col("alias_url").as("url"), col("mode"),
          lit(waveNo).as("wave"), col("to_outcome").as("errorCode"),
          col("attempt")))
      case None => originLog
    }
    fetchLog = fetchLog.unionByName(logAll)
    // origin-fetch errors were counted in batchStats; chain-hop errors
    // only exist when the batch had redirects
    analysis.foreach { a =>
      waveErrorCount += a.validHops
        .filter(col("to_outcome") =!= ErrorCode.NONE).count()
    }

    // ---- S5 fetched-file sink: FETCH-mode records move their file to a
    // collision-safe final name (spiderfetch.py:163-165); redirected
    // fetches land under the chain's FINAL url, dup-aborted records don't
    fetched = fetched.unionByName(
      joined.filter(col("mode") === Mode.FETCH &&
          col("outcome") =!= ErrorCode.REDIRECT)
        .select(lit(batchOrd).as("batch_ord"), col("seq"),
          lit(waveNo).as("wave"), col("url")))
    analysis.foreach { a =>
      fetched = fetched.unionByName(
        a.finals.filter(col("mode") === Mode.FETCH && !col("aborted"))
          .select(lit(batchOrd).as("batch_ord"), col("seq"),
            lit(waveNo).as("wave"), col("final_url").as("url")))
    }
    batchOrd += 1

    // ---- edges: every matched url, seen or not, self-loops excluded
    // (web.py:44-50)
    edges = edges.unionByName(
      allCands.filter(col("url") =!= col("parent_url"))
        .select(col("parent_url").as("src"), col("url").as("dst"),
          lit(waveNo).as("wave")))

    // ---- discoveries: O4 first-wins within the batch, J1 exact dedup vs
    // seen (sketch-fronted), then alias suppression (a url alias'd at pos
    // <= its would-be discovery is already in the web)
    val w = Window.partitionBy(col("url"))
      .orderBy(col("parent_seq"), col("extract_idx"))
    val firstWins = allCands
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn")
    val fresh = SeenSet.filterNew(spark, firstWins, seen, "url",
      if (useSketch) Some(sketch) else None)
    val freshReal = analysis match {
      case Some(a) =>
        fresh.join(a.aliasMin, Seq("url"), "left")
          .filter(col("_apos").isNull || col("_apos") > col("parent_seq"))
          .drop("_apos")
      case None => fresh
    }

    // ---- unified seen-event ordering: a record's chain aliases land
    // before its discoveries; everything interleaves by record seq
    // (spiderfetch.py:87-102 addRef vs qualify_urls add_url order)
    val discEvents = freshReal.select(col("url"), col("host"),
      col("parent_seq").as("pos"), lit(1).as("phase"),
      col("extract_idx").as("idx"), col("canonicalUrl"),
      col("m_dump"), col("m_fetch"), col("m_spider"))
    val events = analysis match {
      case Some(a) => a.validHops.select(col("alias_url").as("url"),
        col("alias_host").as("host"), col("pos"), lit(0).as("phase"),
        col("hop").cast("long").as("idx"),
        lit(null).cast("string").as("canonicalUrl"),
        lit(false).as("m_dump"), lit(false).as("m_fetch"),
        lit(false).as("m_spider"))
        .unionByName(discEvents)
      case None => discEvents
    }
    val (ranked, nNew) = withOrderedIndex(events,
      Seq(col("pos"), col("phase"), col("idx")), "new_seq", seqCounter)
    seqCounter += nNew

    seen = seen.unionByName(ranked.select(col("url"),
      col("host").as("canonicalHost"), lit(waveNo).as("wave"),
      col("new_seq").as("seq")))
    if (useSketch && nNew > 0) sketch.add(spark, ranked, "url", "host")

    analysis.foreach { a =>
      aliases = aliases.unionByName(a.validHops.select(
        col("origin_url").as("canonicalUrl"), col("alias_url").as("aliasUrl"),
        lit(waveNo).as("wave")))
    }

    dumped = dumped.unionByName(
      ranked.filter(col("m_dump"))
        .select(col("new_seq").as("seq"), lit(waveNo).as("wave"), col("url")))

    val discovered = ranked
      .filter(col("m_fetch") || col("m_spider"))
      .select(col("url"), col("canonicalUrl"), col("host"),
        when(col("m_fetch") && col("m_spider"), Mode.SPIDER_FETCH)
          .when(col("m_fetch"), Mode.FETCH)
          .otherwise(Mode.SPIDER).as("mode"),
        lit(waveNo).as("wave"), col("new_seq").as("seq"),
        lit(false).as("retry"), lit(0).as("attempt"))

    // ---- once-only temporal retry (spiderfetch.py:150-154); a redirected
    // record retries under its ORIGIN url when the chain's final fetch
    // failed temporally (and the chain wasn't dup-aborted)
    val temporalCodes = ErrorCode.Temporal.toSeq
    val retryNR = joined
      .filter(col("outcome").isin(temporalCodes: _*) && !col("retry"))
      .select(col("url"), col("canonicalUrl"), col("host"), col("mode"),
        col("wave"), col("seq"), lit(true).as("retry"),
        (col("attempt") + 1).as("attempt"))
    val retries = analysis match {
      case Some(a) => retryNR.unionByName(
        a.finals
          .filter(!col("aborted") &&
            col("final_outcome").isin(temporalCodes: _*) && !col("retry"))
          .select(col("origin_url").as("url"),
            col("origin_canonical").as("canonicalUrl"),
            col("origin_host").as("host"), col("mode"), col("wave"),
            col("seq"), lit(true).as("retry"),
            (col("attempt") + 1).as("attempt")))
      case None => retryNR
    }
    (discovered, retries)
  }

  /**
   * Extraction + reference-exact rewrite + mask qualification for a set
   * of successfully fetched SPIDER pages — PURE (no state updates).
   * Input: (parent_seq, doc_id, spans); output one row per qualified
   * candidate: (parent_seq, parent_url, extract_idx, url, canonicalUrl,
   * host, m_dump, m_fetch, m_spider).
   */
  private def qualifyCandidates(spiderDocs: DataFrame, rule: RecipeRule): DataFrame = {
    // E4: span extraction in findall order (UDF-free)
    val extracted = Extract.findall(spiderDocs)
      .select(col("parent_seq"), col("doc_id").as("parent_url"),
        col("extract_idx"), col("url").as("raw_url"))

    // F1-F7: reference-exact rewrite, typed map (SURVEY §2.11)
    val candidates = extracted
      .as[(Long, String, Long, String)]
      .flatMap { case (pseq, purl, idx, raw) =>
        UrlRewrite.rewriteOne(purl, raw).map { u =>
          CandidateRow(pseq, purl, idx, u,
            UrlRewrite.canonicalUrl(u), UrlRewrite.canonicalHost(u))
        }
      }.toDF

    // §2.5 qualification: one projection over three mask predicates
    val hostOkCol: Column =
      if (!hostFilterEnabled) lit(true)
      else col("host") === lit(rule.hostFilter.getOrElse(""))
    candidates
      .withColumn("m_dump", maskCol(rule.dump))
      .withColumn("m_fetch", maskCol(rule.fetch))
      .withColumn("m_spider", maskCol(rule.spider) && hostOkCol)
      .filter(col("m_dump") || col("m_fetch") || col("m_spider"))
  }

  // ------------------------------------------------------- wave commit

  private def commitWave(ruleIdx: Int, depth: Int,
                         queue: DataFrame, outer: DataFrame): Unit = {
    checkpoint match {
      case Some(io) =>
        val meta = Map(
          "rule_idx" -> ruleIdx.toString, "depth" -> depth.toString,
          "wave" -> waveNo.toString, "seq_counter" -> seqCounter.toString,
          "batch_ord" -> batchOrd.toString) ++
          sketch.serialized.map(b => "bloom" ->
            java.util.Base64.getEncoder.encodeToString(b))
        val snap = io.commit(meta, Map(
          "seen" -> seen, "processed" -> processed, "dump" -> dumped,
          "edges" -> edges, "aliases" -> aliases, "fetch_log" -> fetchLog,
          "robots_blocked" -> robotsBlocked, "metrics" -> metrics,
          "fetched" -> fetched, "queue" -> queue, "outer_queue" -> outer,
          // S2: byte-range fetch-state table — a restarted session feeds
          // this back via CrawlConfig.resumeState
          "fetch_state" -> FetchResume.stateOf(spark, fetched, corpusN)))
        // reload: truncates lineage, pins state to the snapshot
        seen = io.table(snap, "seen"); processed = io.table(snap, "processed")
        dumped = io.table(snap, "dump"); edges = io.table(snap, "edges")
        aliases = io.table(snap, "aliases"); fetchLog = io.table(snap, "fetch_log")
        robotsBlocked = io.table(snap, "robots_blocked")
        metrics = io.table(snap, "metrics")
        fetched = io.table(snap, "fetched")
      case None =>
        // in-memory mode: only `seen` is re-read during the crawl (dedup
        // anti-joins, redirect dup checks) — eager-truncate just it per
        // wave; append-only tables stay lazy and materialize once in
        // tables() at the end.
        seen = seen.localCheckpoint(true)
    }
    // adaptive sketch sizing (SURVEY §4.4): shards past their sizing have
    // degraded FPP — rebuild the bank from the exact table at 4x capacity
    if (useSketch && sketch.needsRebuild)
      sketch.rebuildFrom(spark, seen, "url", "canonicalHost")
  }
}

object CrawlEngine {
  import graft.model.{ErrorCode, Mode}

  /**
   * Fetch-outcome expression over a (frontier record ⨝ corpus) row —
   * the error taxonomy of `fetch.py:74-121` on the span-table web:
   * missing doc = DNS, `attempt < fail_attempts` = temporal TIMEOUT,
   * `redirect_to` = 30x, empty spans = ZeroDataError, and the SPIDER-mode
   * typecheck (`fetch.py:512-531`): content that is neither HTML nor
   * URL-bearing raises WrongFileTypeError — but only in SPIDER mode;
   * FETCH is pre-typechecked (`fetch.py:384-385`) and SPIDER_FETCH
   * downgrades to a plain fetch instead of erroring
   * (`fetch_if_wrongtype`, `fetch.py:390-391,527-529`).
   */
  def outcomeCol: Column =
    when(col("doc_id").isNull, ErrorCode.DNS)
      .when(col("attempt") < col("fail_attempts"), ErrorCode.TIMEOUT)
      // S2 resume verdicts (fetch.py:205-217): a failed byte-range resume
      // (CHECKSUM / NO_RESUME) pre-joined per url; CONT applies to
      // non-SPIDER fetches (fetch.py:555-558)
      .when(col("mode") =!= Mode.SPIDER && col("_resume_err").isNotNull,
        col("_resume_err"))
      .when(col("redirect_to").isNotNull, ErrorCode.REDIRECT)
      .when(size(col("spans")) === 0, ErrorCode.NO_DATA)
      .when(col("mode") === Mode.SPIDER &&
        !graft.extract.Extract.isHtmlCol(col("spans")) &&
        !graft.extract.Extract.hasUrlsCol(col("spans"), col("doc_id")),
        ErrorCode.WRONG_TYPE)
      .otherwise(ErrorCode.NONE)
}

/** Crawl output tables (the persisted relations of SURVEY §1.2). */
final case class CrawlTables(
    seen: DataFrame, processed: DataFrame, dump: DataFrame,
    edges: DataFrame, aliases: DataFrame, fetchLog: DataFrame,
    robotsBlocked: DataFrame, metrics: DataFrame, fetched: DataFrame)

/** Raw fetched-file log row; global ord + collision-safe names derived
  * at table-build time from the (batch_ord, seq) processing order. */
final case class FetchedRaw(batch_ord: Long, seq: Long, wave: Int, url: String)

/** Rewritten+canonicalized extraction candidate (engine-internal). */
final case class CandidateRow(
    parent_seq: Long, parent_url: String, extract_idx: Long,
    url: String, canonicalUrl: String, host: String)

/** Raw processed-log row — the crawl-ordering parity surface; the dense
  * global `ord` is ranked from (batch_ord, seq) at table-build time. */
final case class ProcessedRow(batch_ord: Long, seq: Long, wave: Int,
                              url: String, mode: Int, retry: Boolean)

final case class RobotsBlockedRow(wave: Int, url: String, seq: Long)
