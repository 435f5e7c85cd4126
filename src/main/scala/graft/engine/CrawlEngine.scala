package graft.engine

import graft.model._
import graft.urlcanon.{PyUrl, UrlRewrite}
import graft.extract.Extract
import graft.seenset.{SeenFilter, SeenSet}
import graft.tableio.TableIO
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

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
 * records (`spiderfetch.py:150-154`); redirect records are sequence points
 * (their dedup test observes earlier records' discoveries,
 * `spiderfetch.py:87-102`), so a wave is processed as segments split at
 * redirect records — scale note: waves without redirects (the common case)
 * run as ONE distributed batch.
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
  private var fetched: DataFrame = _  // raw fetched-file log (wave, ord, url)
  private var seqCounter: Long = 0L
  private var ordCounter: Long = 0L
  private var waveNo: Int = 0
  private var waveErrorCount: Long = 0L
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
    // collision-safe filenames (ioutils.safe_filename + F8): n-th use of a
    // base name (in processing order) gets suffix ".n"
    val fetchedNamed = {
      import spark.implicits._
      val named = fetched.select("wave", "ord", "url")
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
    CrawlTables(seen, processed, dumped,
      edges.groupBy("src", "dst").agg(min("wave").as("wave")),
      aliases, fetchLog, robotsBlocked, metrics, fetchedNamed)
  }

  // ---------------------------------------------------------------- utils

  private def emptyFrontier: DataFrame = spark.emptyDataset[FrontierRecord].toDF

  private def frontierRow(url: String, mode: Int, wave: Int, seq: Long): FrontierRecord =
    FrontierRecord(url, UrlRewrite.canonicalUrl(url), UrlRewrite.canonicalHost(url),
      mode, wave, seq, retry = false, attempt = 0)

  /** Global deterministic rank: sort + zipWithIndex (distributed — no
    * single-partition window; SURVEY §4.3.1). Returns persisted df + count. */
  private def withOrderedIndex(df: DataFrame, sortCols: Seq[Column],
                               name: String, offset: Long): (DataFrame, Long) = {
    val schema = df.schema.add(name, LongType, nullable = false)
    val rdd = df.orderBy(sortCols: _*).rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + offset)) }
    val out = spark.createDataFrame(rdd, schema).persist()
    (out, out.count())
  }

  private def hostOk(filter: Option[String], url: String): Boolean =
    !hostFilterEnabled || PyUrl.getHostname(url) == filter

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
    ordCounter = 0L
    waveNo = 0
    if (useSketch) sketch.addOne(seedUrl)
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
    ordCounter = snap.meta("ord_counter").toLong
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
        more = queue.limit(1).count() > 0
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
    val (admitted0, blocked) = Scheduler.robotsFilter(spark, queue, config.robots)
    val nBlocked = blocked.count()
    if (nBlocked > 0)
      robotsBlocked = robotsBlocked.unionByName(
        blocked.select(lit(waveNo).as("wave"), col("url"), col("seq")))

    var discovered = emptyFrontier
    var frontierRows = 0L
    config.perHostBudget match {
      case None =>
        val admitted = admitted0.persist()
        frontierRows = admitted.count()
        val (frag1, retries) = processBatch(admitted, rule)
        val (frag2, _) = processBatch(retries, rule) // retried once only
        discovered = frag1.unionByName(frag2)
      case Some(k) =>
        var pending = admitted0.persist()
        var pendingCount = pending.count()
        frontierRows = pendingCount
        while (pendingCount > 0) {
          val (chunk, rest) = Scheduler.dequeueChunk(pending, k)
          val (frag, retries) = processBatch(chunk.persist(), rule)
          discovered = discovered.unionByName(frag)
          pending = rest.unionByName(retries).persist()
          pendingCount = pending.count()
        }
    }

    // per-partition lineage metrics (north rule)
    val waveErrors = waveErrorCount
    val discN = discovered.count()
    val partRows = queue.groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => WaveMetrics(waveNo, ruleIdx, r.getInt(0),
        r.getLong(1), r.getLong(1), 0L, 0L)).toSeq
    val totalRow = WaveMetrics(waveNo, ruleIdx, -1, frontierRows, frontierRows,
      waveErrors, discN)
    metrics = metrics.unionByName((partRows :+ totalRow).toDF)

    discovered
  }

  /**
   * Process one ordered batch of frontier records. Returns
   * (discovered next-wave records, retry records for this wave).
   * Splits into segments at redirect records — those are order-sensitive
   * sequence points (their dedup check sees earlier discoveries).
   */
  private def processBatch(records: DataFrame, rule: RecipeRule): (DataFrame, DataFrame) = {
    if (records.limit(1).count() == 0) return (emptyFrontier, emptyFrontier)

    val joined = records.join(corpusN, col("url") === col("doc_id"), "left")
      .withColumn("outcome",
        when(col("doc_id").isNull, ErrorCode.DNS)
          .when(col("attempt") < col("fail_attempts"), ErrorCode.TIMEOUT)
          .when(col("redirect_to").isNotNull, ErrorCode.REDIRECT)
          .when(size(col("spans")) === 0, ErrorCode.NO_DATA)
          .otherwise(ErrorCode.NONE))
      .persist()

    val redirectRecs = joined.filter(col("outcome") === ErrorCode.REDIRECT)
      .select("seq", "url", "mode", "retry", "attempt")
      .collect().sortBy(_.getLong(0))

    var discovered = emptyFrontier
    var retries = emptyFrontier
    var lo = Long.MinValue
    redirectRecs.foreach { r =>
      val hi = r.getLong(0)
      val seg = joined.filter(col("seq") > lo && col("seq") < hi)
      val (d1, r1) = processSegment(seg, rule)
      discovered = discovered.unionByName(d1); retries = retries.unionByName(r1)
      val (d2, r2) = handleRedirect(r, rule)
      discovered = discovered.unionByName(d2); retries = retries.unionByName(r2)
      lo = hi
    }
    val (dL, rL) = processSegment(joined.filter(col("seq") > lo), rule)
    (discovered.unionByName(dL), retries.unionByName(rL))
  }

  /** Distributed processing of a redirect-free segment. */
  private def processSegment(segment: DataFrame, rule: RecipeRule): (DataFrame, DataFrame) = {
    val seg = segment.persist()
    val n = seg.count()
    if (n == 0) return (emptyFrontier, emptyFrontier)

    // processed log in dequeue order (the crawl-ordering parity surface)
    val (procOrdered, nProc) = withOrderedIndex(
      seg.select(col("seq"), lit(waveNo).as("wave"), col("url"), col("mode"), col("retry")),
      Seq(col("seq")), "ord", ordCounter)
    ordCounter += nProc
    processed = processed.unionByName(
      procOrdered.select("wave", "ord", "url", "mode", "retry"))

    // S5 fetched-file sink: FETCH-mode records move their file to a
    // collision-safe final name (spiderfetch.py:163-165); the raw log
    // records processing order, names are derived in tables()
    fetched = fetched.unionByName(
      procOrdered.filter(col("mode") === Mode.FETCH)
        .select(col("wave"), col("ord"), col("url")))

    fetchLog = fetchLog.unionByName(
      seg.select(col("url"), col("mode"), lit(waveNo).as("wave"),
        col("outcome").as("errorCode"), col("attempt")))
    waveErrorCount += seg.filter(col("outcome") =!= ErrorCode.NONE).count()

    // once-only temporal retry (spiderfetch.py:150-154)
    val temporalCodes = ErrorCode.Temporal.toSeq
    val retryBatch = seg
      .filter(col("outcome").isin(temporalCodes: _*) && !col("retry"))
      .select(col("url"), col("canonicalUrl"), col("host"), col("mode"),
        col("wave"), col("seq"), lit(true).as("retry"),
        (col("attempt") + 1).as("attempt"))

    // spidering: successful SPIDER-mode rows only (spiderfetch.py:156-161)
    val spiderRows = seg.filter(col("mode") === Mode.SPIDER &&
      col("outcome") === ErrorCode.NONE)
    val discovered = qualifyAndEnqueue(
      spiderRows.select(col("seq").as("parent_seq"), col("url").as("doc_id"),
        col("spans")),
      rule)
    (discovered, retryBatch)
  }

  /**
   * Extraction + rewrite + qualification + dedup + enqueue for a set of
   * successfully fetched SPIDER pages — the wave DAG's discovery half.
   */
  private def qualifyAndEnqueue(spiderDocs: DataFrame, rule: RecipeRule): DataFrame = {
    if (spiderDocs.limit(1).count() == 0) return emptyFrontier

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
    val qualified = candidates
      .withColumn("m_dump", maskCol(rule.dump))
      .withColumn("m_fetch", maskCol(rule.fetch))
      .withColumn("m_spider", maskCol(rule.spider) && hostOkCol)
      .withColumn("m_any", col("m_dump") || col("m_fetch") || col("m_spider"))
      .filter(col("m_any"))
      .persist()

    // edges: every matched url, seen or not, self-loops excluded (web.py:44-50)
    edges = edges.unionByName(
      qualified.filter(col("url") =!= col("parent_url"))
        .select(col("parent_url").as("src"), col("url").as("dst"),
          lit(waveNo).as("wave")))

    // O4 first-wins within the batch, then J1 exact dedup vs seen
    val w = Window.partitionBy(col("url"))
      .orderBy(col("parent_seq"), col("extract_idx"))
    val firstWins = qualified
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    val fresh = SeenSet.filterNew(spark, firstWins, seen, "url",
      if (useSketch) Some(sketch) else None)

    // discovery order -> global seq (the crawl-ordering key, §4.3.1)
    val (newUrls, nNew) = withOrderedIndex(
      fresh, Seq(col("parent_seq"), col("extract_idx")), "new_seq", seqCounter)
    seqCounter += nNew

    seen = seen.unionByName(newUrls.select(col("url"), col("host").as("canonicalHost"),
      lit(waveNo).as("wave"), col("new_seq").as("seq")))
    if (useSketch && nNew > 0) sketch.add(spark, newUrls, "url")

    dumped = dumped.unionByName(
      newUrls.filter(col("m_dump"))
        .select(col("new_seq").as("seq"), lit(waveNo).as("wave"), col("url")))

    newUrls
      .filter(col("m_fetch") || col("m_spider"))
      .select(col("url"), col("canonicalUrl"), col("host"),
        when(col("m_fetch") && col("m_spider"), Mode.SPIDER_FETCH)
          .when(col("m_fetch"), Mode.FETCH)
          .otherwise(Mode.SPIDER).as("mode"),
        lit(waveNo).as("wave"), col("new_seq").as("seq"),
        lit(false).as("retry"), lit(0).as("attempt"))
  }

  /**
   * Driver-side redirect record (spiderfetch.py:87-102 + web.py:52-54):
   * tiny by construction (one frontier row), exact ordering semantics.
   */
  private def handleRedirect(r: Row, rule: RecipeRule): (DataFrame, DataFrame) = {
    val seq = r.getLong(0); val url = r.getString(1); val mode = r.getInt(2)
    val retry = r.getBoolean(3); val attempt = r.getInt(4)

    processed = processed.unionByName(
      Seq(ProcessedRow(waveNo, ordCounter, url, mode, retry)).toDF)
    ordCounter += 1

    var cur = url
    var aborted = false
    var finalOutcome = ErrorCode.REDIRECT
    var hops = 0
    while (!aborted && hops < 50) {
      hops += 1
      val doc = corpusN.filter(col("doc_id") === cur)
        .select("redirect_to", "fail_attempts", "spans")
        .collect().headOption
      val outcome: Int = doc match {
        case None => ErrorCode.DNS
        case Some(d) if attempt < d.getInt(1) => ErrorCode.TIMEOUT
        case Some(d) if !d.isNullAt(0) => ErrorCode.REDIRECT
        case Some(d) if d.getSeq[Row](2).isEmpty => ErrorCode.NO_DATA
        case Some(_) => ErrorCode.NONE
      }
      fetchLog = fetchLog.unionByName(
        Seq(FetchLogEntry(cur, mode, waveNo, outcome, attempt)).toDF)
      if (outcome != ErrorCode.NONE) waveErrorCount += 1
      if (outcome == ErrorCode.REDIRECT) {
        val loc = doc.get.getString(0)
        val newRaw = PyUrl.urljoin(cur, loc)
        UrlRewrite.rewriteOne(cur, newRaw) match {
          case None => aborted = true // StopIteration analogue -> record aborted
          case Some(newUrl) =>
            val dup = seen.filter(col("url") === newUrl).limit(1).count() > 0
            if (dup) aborted = true // DuplicateUrlWarning
            else if (!hostOk(rule.hostFilter, newUrl)) aborted = true // off-host
            else {
              aliases = aliases.unionByName(
                Seq(Alias(url, newUrl, waveNo)).toDF)
              seen = seen.unionByName(Seq(Seen(newUrl,
                UrlRewrite.canonicalHost(newUrl), waveNo, seqCounter)).toDF)
              seqCounter += 1
              if (useSketch) sketch.addOne(newUrl)
              cur = newUrl
            }
        }
      } else { finalOutcome = outcome; hops = Int.MaxValue }
    }
    if (aborted) return (emptyFrontier, emptyFrontier)

    if (mode == Mode.FETCH)
      fetched = fetched.unionByName(
        Seq(FetchedRaw(waveNo, ordCounter - 1, cur)).toDF)

    val retries =
      if (ErrorCode.isTemporal(finalOutcome) && !retry)
        Seq(FrontierRecord(url, UrlRewrite.canonicalUrl(url),
          UrlRewrite.canonicalHost(url), mode, waveNo, seq,
          retry = true, attempt = attempt + 1)).toDF
      else emptyFrontier

    val discovered =
      if (mode == Mode.SPIDER && finalOutcome == ErrorCode.NONE) {
        val finalDoc = corpusN.filter(col("doc_id") === cur)
          .select(lit(seq).as("parent_seq"), col("doc_id"), col("spans"))
        qualifyAndEnqueue(finalDoc, rule)
      } else emptyFrontier
    (discovered, retries)
  }

  // ------------------------------------------------------- wave commit

  private def commitWave(ruleIdx: Int, depth: Int,
                         queue: DataFrame, outer: DataFrame): Unit = {
    checkpoint match {
      case Some(io) =>
        val meta = Map(
          "rule_idx" -> ruleIdx.toString, "depth" -> depth.toString,
          "wave" -> waveNo.toString, "seq_counter" -> seqCounter.toString,
          "ord_counter" -> ordCounter.toString) ++
          sketch.serialized.map(b => "bloom" ->
            java.util.Base64.getEncoder.encodeToString(b))
        val snap = io.commit(meta, Map(
          "seen" -> seen, "processed" -> processed, "dump" -> dumped,
          "edges" -> edges, "aliases" -> aliases, "fetch_log" -> fetchLog,
          "robots_blocked" -> robotsBlocked, "metrics" -> metrics,
          "fetched" -> fetched, "queue" -> queue, "outer_queue" -> outer))
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
  }
}

/** Crawl output tables (the persisted relations of SURVEY §1.2). */
final case class CrawlTables(
    seen: DataFrame, processed: DataFrame, dump: DataFrame,
    edges: DataFrame, aliases: DataFrame, fetchLog: DataFrame,
    robotsBlocked: DataFrame, metrics: DataFrame, fetched: DataFrame)

/** Raw fetched-file log row (names derived at table-build time). */
final case class FetchedRaw(wave: Int, ord: Long, url: String)

/** Rewritten+canonicalized extraction candidate (engine-internal). */
final case class CandidateRow(
    parent_seq: Long, parent_url: String, extract_idx: Long,
    url: String, canonicalUrl: String, host: String)

/** Processed-order row — the crawl-ordering parity surface. */
final case class ProcessedRow(wave: Int, ord: Long, url: String, mode: Int,
                              retry: Boolean)

final case class RobotsBlockedRow(wave: Int, url: String, seq: Long)
