package graft.oracle

import graft.model._
import graft.urlcanon.{PyUrl, UrlRewrite}
import graft.extract.Extract
import scala.collection.mutable

/**
 * Sequential, list-based reimplementation of the reference crawl loop —
 * the in-repo ORACLE for crawl parity tests (SURVEY §5.2). Mirrors
 * `/root/reference/spiderfetch/spiderfetch.py` semantics exactly:
 *
 *  - rule/depth staging + depth-0 queue split (`spiderfetch.py:209-231,192-207`)
 *  - FIFO wave processing with same-wave retry append (`:138-190,150-154`)
 *  - redirect loop with dedup/hostfilter/alias (`:87-102`, `web.py:52-54`)
 *  - qualification + dedup-at-enqueue + dump ordering (`:104-136`)
 *  - graph building with self-loop exclusion (`web.py:36-50`)
 *
 * "Fetching" resolves against the span-table corpus (the corpus IS the
 * web): redirects via `redirect_to`, temporal failures via `fail_attempts`
 * (launch j of a doc fails iff j < fail_attempts; a fetch call at crawl
 * attempt k covers launches [k*tries, (k+1)*tries) — the in-fetch retry
 * loop of `fetch.py:650-664` with TRIES = config.tries, each launch logged
 * — before the crawl-level once-only retry), zero-data via empty spans.
 * A 30x raises ChangedUrlWarning inside open() BEFORE the resume checks
 * run (`fetch.py:193` vs `:205-217`), so redirect outranks the S2 resume
 * verdicts here and in the engine.
 *
 * Extension knobs (politeness budget, robots) define the SAME semantics the
 * distributed engine implements, so engine==oracle can be asserted for
 * those configs too; with defaults they degrade to reference behavior.
 */
object RefCrawler {

  final case class SeenRow(url: String, wave: Int, seq: Long)
  final case class ProcessedRow(wave: Int, url: String, mode: Int, retry: Boolean)

  final case class CrawlResult(
      seen: Vector[SeenRow],
      processed: Vector[ProcessedRow],
      dump: Vector[String],
      edges: Map[(String, String), Int],   // (src, dst) -> first wave
      aliases: Vector[(String, String, Int)], // (canonical first-url, alias, wave)
      fetchLog: Vector[FetchLogEntry],
      robotsBlocked: Vector[String],
      fetched: Vector[(String, String)],   // (url, collision-safe filename)
      // (wave, ruleIdx, frontierRows, errorRows, discoveredRows, bytesFetched)
      waveTotals: Vector[(Int, Int, Long, Long, Long, Long)],
      // (wave, processedCalls, originCallErrors, originFetchBytes) —
      // the layout-independent invariant of the engine's per-PARTITION
      // lineage rows: summed over partitions they must equal these
      // per-wave origin-record stats (calls = admitted + same-wave
      // retries; errors/bytes from each record's FIRST fetch call only —
      // redirect-chain hops are attributed to the totals row). The
      // crawl_lineage driver oracle (round-3 verdict #6).
      waveOriginStats: Vector[(Int, Long, Long, Long)])

  private sealed trait FetchOutcome
  private case object Success extends FetchOutcome
  private final case class Failed(code: Int) extends FetchOutcome
  private final case class Redirected(location: String) extends FetchOutcome

  private case class DuplicateUrlWarning() extends Exception
  private case class UrlRedirectsOffHost() extends Exception
  private case class RecordAborted() extends Exception

  private final case class Rec(url: String, mode: Int, retry: Boolean)

  /** Rendered content length in Unicode CODE POINTS — the unit of the
    * engine's contentLenCol (Spark length()) and of Python len(). */
  private def contentCodePoints(d: CorpusDoc): Long = {
    val c = graft.engine.FetchResume.contentOf(d)
    c.codePointCount(0, c.length).toLong
  }

  def run(
      corpus: Seq[CorpusDoc],
      seedUrl: String,
      rules: Seq[RecipeRule],
      hostFilterEnabled: Boolean = false,
      config: CrawlConfig = CrawlConfig()): CrawlResult = {

    val docs: Map[String, CorpusDoc] = corpus.map(d => d.doc_id -> d).toMap

    // --- web graph state (web.py:13-57) ---
    val index = mutable.LinkedHashMap.empty[String, Int] // url -> nodeId
    val nodeFirstUrl = mutable.Map.empty[Int, String]
    val nodeAliases = mutable.Map.empty[Int, mutable.ArrayBuffer[String]]
    var nextNode = 0
    val seen = Vector.newBuilder[SeenRow]
    var seqCounter = 0L
    var waveNo = 0

    def addNode(url: String, wave: Int): Int = {
      val id = nextNode; nextNode += 1
      index(url) = id
      nodeFirstUrl(id) = url
      nodeAliases(id) = mutable.ArrayBuffer(url)
      seen += SeenRow(url, wave, seqCounter); seqCounter += 1
      id
    }

    val edges = mutable.LinkedHashMap.empty[(String, String), Int]
    val aliasRows = Vector.newBuilder[(String, String, Int)]
    val waveTotals = Vector.newBuilder[(Int, Int, Long, Long, Long, Long)]
    val dump = Vector.newBuilder[String]
    val processed = Vector.newBuilder[ProcessedRow]
    val fetchLog = Vector.newBuilder[FetchLogEntry]
    var fetchLogErrors = 0L
    val robotsBlocked = Vector.newBuilder[String]
    val fetchedRaw = scala.collection.mutable.ArrayBuffer.empty[String]

    // add_url (web.py:36-50): ensure nodes, record edges, skip self-loops
    def addUrl(url: String, children: Seq[String]): Unit = {
      if (!index.contains(url)) addNode(url, waveNo)
      children.foreach { c =>
        if (c != url) {
          if (!index.contains(c)) addNode(c, waveNo)
          if (!edges.contains((url, c))) edges((url, c)) = waveNo
        }
      }
    }
    // add_ref (web.py:52-54): alias newUrl to url's existing node
    def addRef(url: String, newUrl: String): Unit = {
      val id = index(url)
      index(newUrl) = id
      nodeAliases(id) += newUrl
      seen += SeenRow(newUrl, waveNo, seqCounter); seqCounter += 1
      aliasRows += ((nodeFirstUrl(id), newUrl, waveNo))
    }

    addNode(seedUrl, 0) // Web(root) — seed is seen from the start

    val resumeByUrl: Map[String, FetchStateRow] =
      config.resumeState.map(r => r.url -> r).toMap
    // S2 resume verdict (fetch.py:205-217); CONT path is non-SPIDER only
    def resumeErr(url: String, d: CorpusDoc, mode: Int): Option[Int] =
      if (mode == Mode.SPIDER) None
      else resumeByUrl.get(url)
        .map(st => graft.engine.FetchResume.verdict(
          graft.engine.FetchResume.contentOf(d), st))
        .filter(_ != ErrorCode.NONE)

    var fetchBytes = 0L

    // origin-record stats (first fetch call of each processed record) —
    // the engine's per-partition lineage rows carry exactly these
    val waveOriginStats = Vector.newBuilder[(Int, Long, Long, Long)]
    var processedCalls = 0L
    var originErrors = 0L
    var originBytes = 0L

    // One fetch CALL = up to `tries` launches (launch_w_tries,
    // fetch.py:650-664): launch j = attempt*tries + i fails temporally iff
    // j < fail_attempts; each launch logs a row; the call's outcome is the
    // first non-temporal launch, or TIMEOUT when the budget runs out.
    def fetch(url: String, attempt: Int, mode: Int): FetchOutcome = {
      val tries = config.tries
      val base = attempt * tries
      val d = docs.get(url)
      val nFails = d.map(doc =>
        math.min(math.max(doc.fail_attempts - base, 0), tries)).getOrElse(0)
      (0 until nFails).foreach { i =>
        fetchLog += FetchLogEntry(url, mode, waveNo, ErrorCode.TIMEOUT, base + i)
      }
      val out: FetchOutcome =
        if (nFails == tries) Failed(ErrorCode.TIMEOUT)
        else d match {
          case None => Failed(ErrorCode.DNS)
          // ChangedUrlWarning raises inside open() before the resume
          // checks run (fetch.py:193 vs :205-217)
          case Some(doc) if doc.redirect_to.isDefined =>
            Redirected(doc.redirect_to.get)
          case Some(doc) if resumeErr(url, doc, mode).isDefined =>
            Failed(resumeErr(url, doc, mode).get)
          case Some(doc) if doc.spans.isEmpty => Failed(ErrorCode.NO_DATA)
          // SPIDER-mode typecheck (fetch.py:512-531): neither HTML nor
          // URL-bearing -> WrongFileTypeError. FETCH is pre-typechecked
          // (fetch.py:384-385); SPIDER_FETCH downgrades to plain fetch
          // instead of erroring (fetch_if_wrongtype, fetch.py:390-391).
          case Some(doc) if mode == Mode.SPIDER &&
            !Extract.isHtmlSeq(doc) && !Extract.hasUrlsSeq(doc) =>
            Failed(ErrorCode.WRONG_TYPE)
          case Some(_) => Success
        }
      val code = out match {
        case Failed(c) => c
        case Redirected(_) => ErrorCode.REDIRECT
        case Success => ErrorCode.NONE
      }
      // the final (non-budget-exhausted) launch logs the real outcome
      if (nFails < tries)
        fetchLog += FetchLogEntry(url, mode, waveNo, code, base + nFails)
      if (code != ErrorCode.NONE) fetchLogErrors += 1
      // completed fetches download the rendered content (fetch.py:443-453).
      // Unit: CODE POINTS — the engine's contentLenCol uses Spark length()
      // (code points of the UTF8String), and Python len() counts code
      // points too; Java String.length is UTF-16 units and disagrees on
      // supplementary-plane text (round-3 advice #3; the fixture corpus
      // carries non-BMP spans so drift here fails parity, not silence).
      else fetchBytes += contentCodePoints(d.get)
      out
    }

    def hostOk(filter: Option[String], url: String): Boolean =
      !hostFilterEnabled || PyUrl.getHostname(url) == filter

    // get_url (spiderfetch.py:87-102): redirect loop
    def getUrl(rec: Rec, rule: RecipeRule): (String, Option[Int]) = {
      var cur = rec.url
      val attempt = if (rec.retry) 1 else 0
      var firstCall = true
      while (true) {
        val out = fetch(cur, attempt, rec.mode)
        if (firstCall) {
          firstCall = false
          out match {
            case Success => originBytes += contentCodePoints(docs(cur))
            case _ => originErrors += 1 // Failed OR Redirected: outcome != NONE
          }
        }
        out match {
          case Redirected(loc) =>
            val newRaw = PyUrl.urljoin(cur, loc) // redirect_internal (fetch.py:192)
            val newUrl = UrlRewrite.rewriteUrls(cur, Seq(newRaw)).headOption
              .getOrElse(throw RecordAborted())
            if (index.contains(newUrl)) throw DuplicateUrlWarning()
            if (!hostOk(rule.hostFilter, newUrl)) throw UrlRedirectsOffHost()
            addRef(cur, newUrl)
            cur = newUrl
          case Failed(c) => return (cur, Some(c))
          case Success => return (cur, None)
        }
      }
      throw new IllegalStateException("unreachable")
    }

    def applyMask(pattern: Option[String], url: String): Boolean =
      pattern.exists(p =>
        java.util.regex.Pattern.compile(p).matcher(url).find()) // re.search

    // findall over a span doc (shared ordering contract with the engine)
    def findallUrls(doc: CorpusDoc): Seq[String] =
      Extract.findallSeq(doc).map(_._2)

    // qualify_urls (spiderfetch.py:104-136)
    def qualifyUrls(refUrl: String, urls: Seq[String], rule: RecipeRule,
                    newqueue: mutable.ArrayBuffer[Rec]): Unit = {
      urls.foreach { url =>
        val doDump = applyMask(rule.dump, url)
        val doFetch = applyMask(rule.fetch, url)
        val doSpider = applyMask(rule.spider, url) && hostOk(rule.hostFilter, url)
        if (!index.contains(url)) {
          if (doDump) dump += url
          val mode =
            if (doFetch && doSpider) Mode.SPIDER_FETCH
            else if (doFetch) Mode.FETCH
            else if (doSpider) Mode.SPIDER
            else 0
          if (doFetch || doSpider) newqueue += Rec(url, mode, retry = false)
        }
        if (doDump || doFetch || doSpider) addUrl(refUrl, Seq(url))
      }
    }

    def robotsAllows(url: String): Boolean = {
      val host = UrlRewrite.canonicalHost(url)
      val path = PyUrl.pathQuery(url)
      // shared RFC 9309 decision (longest pattern wins, Allow wins ties)
      // — the SAME function semantics Scheduler.robotsFilter runs in SQL
      graft.engine.Robots.decide(config.robots.filter(_.host == host), path)
    }

    def processOne(rec: Rec, rule: RecipeRule,
                   newqueue: mutable.ArrayBuffer[Rec],
                   retrySink: mutable.ArrayBuffer[Rec]): Unit = {
      processed += ProcessedRow(waveNo, rec.url, rec.mode, rec.retry)
      processedCalls += 1
      try {
        val (finalUrl, error) = getUrl(rec, rule)
        if (error.exists(ErrorCode.isTemporal) && !rec.retry)
          retrySink += rec.copy(retry = true)
        if (rec.mode == Mode.SPIDER) {
          // content only if the fetch succeeded (empty temp file otherwise)
          val content = if (error.isEmpty) docs.get(finalUrl) else None
          val rawUrls = content.map(findallUrls).getOrElse(Nil)
          val urls = UrlRewrite.rewriteUrls(finalUrl, rawUrls)
          qualifyUrls(finalUrl, urls, rule, newqueue)
        }
        // FETCH mode: file moved to final name (S5, spiderfetch.py:163-165)
        if (rec.mode == Mode.FETCH) fetchedRaw += finalUrl
      } catch {
        case _: DuplicateUrlWarning => ()
        case _: UrlRedirectsOffHost => ()
        case _: RecordAborted => ()
      }
    }

    // process_records (spiderfetch.py:138-190)
    def processRecords(queue: Seq[Rec], rule: RecipeRule, ruleIdx: Int): Seq[Rec] = {
      waveNo += 1
      val errorsBefore = fetchLogErrors
      val bytesBefore = fetchBytes
      val callsBefore = processedCalls
      val originErrorsBefore = originErrors
      val originBytesBefore = originBytes
      val newqueue = mutable.ArrayBuffer.empty[Rec]
      val admitted = queue.filter { r =>
        val ok = robotsAllows(r.url)
        if (!ok) robotsBlocked += r.url
        ok
      }
      config.perHostBudget match {
        case None =>
          // reference-exact: iterate while appending retries to same list
          val q = mutable.ArrayBuffer(admitted: _*)
          var i = 0
          while (i < q.length) { processOne(q(i), rule, newqueue, retrySink = q); i += 1 }
        case Some(k) =>
          // politeness chunking: first-k-per-host chunks in discovery order
          // (SURVEY §4.3.2); a retried record keeps its original position
          // (same semantics as the engine's seq-ordered pending window).
          var pending = mutable.ArrayBuffer(admitted.zipWithIndex.map(_.swap): _*)
          while (pending.nonEmpty) {
            val taken = mutable.Map.empty[String, Int]
            val (chunk, rest) = pending.partition { case (_, r) =>
              val h = UrlRewrite.canonicalHost(r.url)
              val n = taken.getOrElse(h, 0)
              if (n < k) { taken(h) = n + 1; true } else false
            }
            pending = rest
            val retries = mutable.ArrayBuffer.empty[Rec]
            chunk.foreach { case (ord, r) =>
              val before = retries.length
              processOne(r, rule, newqueue, retrySink = retries)
              // a retry keeps the original record's discovery position
              (before until retries.length).foreach { i =>
                pending += ((ord, retries(i)))
              }
            }
            pending = pending.sortBy(_._1)
          }
      }
      waveTotals += ((waveNo, ruleIdx, admitted.length.toLong,
        fetchLogErrors - errorsBefore, newqueue.length.toLong,
        fetchBytes - bytesBefore))
      if (processedCalls > callsBefore)
        waveOriginStats += ((waveNo, processedCalls - callsBefore,
          originErrors - originErrorsBefore, originBytes - originBytesBefore))
      newqueue.toSeq
    }

    // split_queue (spiderfetch.py:192-207)
    def splitQueue(queue: Seq[Rec], lastRule: Boolean): (Seq[Rec], Seq[Rec]) = {
      val fetchQ = queue.collect {
        case r if r.mode == Mode.FETCH || r.mode == Mode.SPIDER_FETCH =>
          r.copy(mode = Mode.FETCH)
      }
      val spiderQ =
        if (lastRule) Seq.empty
        else queue.collect {
          case r if r.mode == Mode.SPIDER || r.mode == Mode.SPIDER_FETCH =>
            r.copy(mode = Mode.SPIDER)
        }
      (fetchQ, spiderQ)
    }

    // main (spiderfetch.py:209-231)
    var outerQueue: Seq[Rec] = Seq(Rec(seedUrl, Mode.SPIDER, retry = false))
    rules.zipWithIndex.foreach { case (rule, ruleIdx) =>
      var depth = rule.depth
      var queue = outerQueue
      outerQueue = Seq.empty
      while (queue.nonEmpty) {
        if (depth > 0) depth -= 1
        else {
          val (fq, sq) = splitQueue(queue, ruleIdx == rules.length - 1)
          queue = fq
          outerQueue = sq
        }
        queue = processRecords(queue, rule, ruleIdx)
      }
    }

    // collision-safe filename assignment (ioutils.safe_filename semantics)
    val nameCounts = mutable.Map.empty[String, Int]
    val fetched = fetchedRaw.map { u =>
      val base = UrlRewrite.urlToFilename(u)
      val k = nameCounts.getOrElse(base, 0)
      nameCounts(base) = k + 1
      (u, if (k == 0) base else s"$base.$k")
    }.toVector

    CrawlResult(
      seen.result(), processed.result(), dump.result(),
      edges.toMap, aliasRows.result(), fetchLog.result(), robotsBlocked.result(),
      fetched, waveTotals.result(), waveOriginStats.result())
  }
}
