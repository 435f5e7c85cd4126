package graft.model

/**
 * Typed schemas for the crawl engine. The reference keeps everything in
 * Python dicts/object graphs (`spiderfetch/web.py:13-57`, queue records at
 * `spiderfetch/recipe.py:71-72`); here each abstraction is a case class with
 * a Spark `Encoder`, stored as a columnar table.
 */

/** One interleaved span of a document (input_hint schema).
  * `kind` ∈ {text, link, link_unq, frame, frame_unq, img, img_unq, uri, ftp};
  * non-text kinds map 1:1 to the reference extractors (`spider.py:34-57`).
  * For media kinds the URL target lives in `media_ref`; for link/uri kinds
  * in `text`; `text` spans carry prose with empty `media_ref`. */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** A document in the corpus table. `doc_id` is its canonical fetch URL.
  * `redirect_to` models an HTTP 30x Location header (raw, pre-urljoin —
  * `fetch.py:182-193`); `fail_attempts` models temporal fetch errors: the
  * first N fetch attempts of this URL time out (deterministic stand-in for
  * `fetch.py:89` temporal errors). Empty spans model zero-data documents. */
final case class CorpusDoc(
    doc_id: String,
    spans: Seq[Span],
    redirect_to: Option[String] = None,
    fail_attempts: Int = 0)

object Mode {
  /** fetch.Fetcher mode constants (`fetch.py:363-365`). */
  val FETCH = 1
  val SPIDER = 2
  val SPIDER_FETCH = 3
}

object ErrorCode {
  /** Error taxonomy (`fetch.py:74-121`). */
  val NONE = 0
  val DNS = 1
  val TIMEOUT = 2
  val SOCKET = 3
  val SSL = 4
  val AUTH = 5
  val URL_ERROR = 6
  val INCOMPLETE = 7
  val WRONG_TYPE = 8
  val NO_DATA = 9
  val REDIRECT = 10
  val CHECKSUM = 11
  val NO_RESUME = 12
  def http(code: Int): Int = 2000 + code
  def ftp(code: Int): Int = 1000 + code
  /** Retryable set (`fetch.py:89`). */
  val Temporal: Set[Int] = Set(TIMEOUT, SOCKET, URL_ERROR, http(503))
  def isTemporal(e: Int): Boolean = Temporal.contains(e)
}

/** One frontier (queue) row. The reference's `{"url","mode","retry"}` dict
  * (`spiderfetch.py:118-130,150-154`) extended with the explicit total-order
  * key that reproduces FIFO enqueue order under distributed execution:
  * `(wave, seq)` where `seq` is the enqueue rank within the wave. */
final case class FrontierRecord(
    url: String,
    canonicalUrl: String,
    host: String,
    mode: Int,
    wave: Int,
    seq: Long,
    retry: Boolean,
    attempt: Int)

/** Directed crawl-graph edge (`web.py:44-50`); self-loops excluded. */
final case class Edge(src: String, dst: String, wave: Int)

/** Redirect alias (`web.py:52-54`): aliasUrl redirects to the document at
  * canonicalUrl (= the URL first fetched; reference keeps one Node). */
final case class Alias(canonicalUrl: String, aliasUrl: String, wave: Int)

/** URL-seen set row (`web.py:27-28` membership). Keyed on the reference's
  * emission-form URL; canonicalHost is the partitioning key. */
final case class Seen(url: String, canonicalHost: String, wave: Int, seq: Long)

/** Dump-sink row (`spiderfetch.py:120-121`), order-preserving. */
final case class DumpRow(seq: Long, wave: Int, url: String)

/** Fetch log row (`fetch.py:432-441`). */
final case class FetchLogEntry(
    url: String, mode: Int, wave: Int, errorCode: Int, attempt: Int)

/** One recipe rule (`recipe.py:23-44`): nullable regex masks + depth.
  * Masks use java.util.regex; fixture masks stay in the Java∩Python common
  * subset (SURVEY §2.2 P1). */
final case class RecipeRule(
    spider: Option[String] = None,
    fetch: Option[String] = None,
    dump: Option[String] = None,
    depth: Int = 1,
    hostFilter: Option[String] = None)

/** S2 fetch-state row (`fetch.py:205-217` partial-file stand-in):
  * persisted per snapshot; fed back via CrawlConfig.resumeState after a
  * crash so interrupted FETCHes resume from `bytes_done` iff the overlap
  * `tail_hash` still matches. */
final case class FetchStateRow(url: String, bytes_done: Long, tail_hash: Long)

/** Engine-only scale knobs (north rule), absent in the reference. The
  * parity configuration is the defaults: unlimited budget, no robots,
  * FIFO priority — which degrades the scheduler to reference behavior.
  *
  * `tries` models the reference's in-fetch retry loop (`fetch.py:393-395,
  * 650-664`: TRIES temporal attempts with a wait INSIDE one fetch call,
  * before the crawl-level once-only requeue of `spiderfetch.py:150-154`).
  * Launch k*tries+i of a doc fails iff its index < fail_attempts; a fetch
  * call at crawl attempt k reports TIMEOUT only when all `tries` launches
  * fail. Default 1 = the reference's default (TRIES env unset). One
  * documented simplification: the reference DECREMENTS one shared counter
  * across the redirect hops of a get_url call; here each hop fetch gets a
  * fresh budget (indistinguishable at tries=1, and RefCrawler mirrors the
  * same model so parity is exact). */
final case class CrawlConfig(
    perHostBudget: Option[Int] = None,
    robots: Seq[RobotsRule] = Nil,
    saltBuckets: Int = 1,
    resumeState: Seq[FetchStateRow] = Nil,
    tries: Int = 1)

/** robots.txt rule: RFC 9309 path pattern allow/deny per host. The
  * `pathPrefix` field holds the (normalized) pattern — a literal prefix in
  * the common case, with `*` wildcards and a final-`$` end anchor per
  * §2.2.3 (see engine.Robots for matching + precedence). */
final case class RobotsRule(host: String, pathPrefix: String, allow: Boolean)

/** Per-wave, per-partition lineage/metrics row (north rule).
  * `bytesFetched` is the rendered content length of completed (outcome
  * NONE) fetches — the engine twin of the reference's download byte/rate
  * tracking (`fetch.py:443-453,533-545`); redirect-chain hop bytes are
  * attributed to the wave's totals row (partitionId = -1), per-partition
  * rows carry the origin-fetch bytes of their physical partition. */
final case class WaveMetrics(
    wave: Int, ruleIdx: Int, partitionId: Int,
    frontierRows: Long, fetchedRows: Long, errorRows: Long,
    discoveredRows: Long, bytesFetched: Long)
