package graft.fixtures

import graft.model.{CorpusDoc, Span}
import scala.util.Random
import scala.collection.mutable.ArrayBuffer

/**
 * Deterministic synthetic linked corpus (seeded, no wall-clock, no network)
 * — the crawl engine's test web. Shape mirrors what the reference crawls:
 * HTML-ish pages with interleaved text + link/media spans, relative and
 * absolute links, cross-host links, quirky URLs (fragments, mailto, spaces,
 * rewritable schemes — `urlrewrite.py` edge cases), redirects
 * (`fetch.py:182-193`), temporal failures (`fetch.py:89`), an FTP listing
 * host (`spider.py:55-72`), dangling 404 links, and a hot-host skew knob
 * (Zipf-ish) to exercise salting/politeness.
 */
object FixtureCorpus {

  final case class Params(
      hosts: Int = 4,
      pagesPerHost: Int = 6,
      linksPerPage: Int = 4,
      crossHostEvery: Int = 3,   // every Nth link goes cross-host
      mediaEvery: Int = 4,       // every Nth span is an img/frame media span
      redirectPages: Int = 2,    // pages that 30x-redirect
      failPages: Int = 2,        // pages whose first fetch times out
      danglingEvery: Int = 7,    // every Nth link points outside the corpus
      quirkEvery: Int = 5,       // every Nth page gets a quirky extra link
      hotHostFactor: Int = 1,    // host0 gets factor x pages (skew knob)
      ftpHost: Boolean = true,
      plainPages: Int = 1,       // text-only .txt pages (WRONG_TYPE bait)
      seed: Long = 42L)

  def hostName(i: Int): String = s"host$i.test"
  def pageUrl(host: Int, page: Int): String =
    s"http://${hostName(host)}/d$host/page$page.html"

  def seedUrl(p: Params): String = pageUrl(0, 0)

  /** Generate the corpus. Returns docs in a deterministic order. */
  def generate(p: Params): Seq[CorpusDoc] = {
    val rnd = new Random(p.seed)
    val docs = ArrayBuffer.empty[CorpusDoc]

    val pageCount: Int => Int =
      host => if (host == 0) p.pagesPerHost * p.hotHostFactor else p.pagesPerHost

    val allPages: Seq[(Int, Int)] =
      for (h <- 0 until p.hosts; pg <- 0 until pageCount(h)) yield (h, pg)

    var linkCounter = 0
    for ((h, pg) <- allPages) {
      val spans = ArrayBuffer.empty[Span]
      var offset = 0
      def addText(): Unit = {
        val words = 3 + rnd.nextInt(5)
        val t = (0 until words).map(i => s"w${rnd.nextInt(1000)}").mkString(" ")
        spans += Span("text", t, "", offset); offset += t.length + 1
      }
      def addLink(kind: String, target: String): Unit = {
        val media = graft.extract.Extract.MediaKinds.contains(kind)
        spans += Span(kind,
          if (media) s"media $linkCounter" else target,
          if (media) target else "",
          offset)
        offset += target.length + 16
        linkCounter += 1
      }

      addText()
      for (l <- 0 until p.linksPerPage) {
        val cross = linkCounter % p.crossHostEvery == 0 && p.hosts > 1
        val dangling = linkCounter % p.danglingEvery == 0
        val targetHost = if (cross) (h + 1 + rnd.nextInt(p.hosts - 1)) % p.hosts else h
        val targetPage = rnd.nextInt(pageCount(targetHost))
        val target =
          if (dangling) s"http://nowhere$linkCounter.test/missing.html"
          else if (cross) pageUrl(targetHost, targetPage)              // absolute
          else if (l % 2 == 0) s"page$targetPage.html"                 // relative
          else s"../d$targetHost/page$targetPage.html"                 // dot-segment
        // uri-kind spans only for absolute URIs (URI_MATCH matches scheme://)
        val kind =
          if (linkCounter % p.mediaEvery == 0) Seq("img", "frame")(rnd.nextInt(2))
          else if (target.startsWith("http")) Seq("link", "link_unq", "uri")(rnd.nextInt(3))
          else Seq("link", "link_unq")(rnd.nextInt(2))
        addLink(kind, target)
        addText()
      }
      // quirky extras exercising urlrewrite corner cases
      if ((h * 31 + pg) % p.quirkEvery == 0) {
        addLink("link", "#fragment-only")       // dropped (P4)
        addLink("link", "mailto:x@y.test")      // unknown scheme passthrough
        addLink("link", s"xhttp://${hostName(h)}/d$h/page0.html") // scheme rewrite
        addLink("link", s"a b$pg.html")         // space -> %20
      }
      docs += CorpusDoc(pageUrl(h, pg), spans.toSeq)
    }

    // redirect pages: redirect$i.html 30x-redirects to a dedicated target
    // page nothing else links to (so the alias branch actually fires);
    // redirect1 additionally points at an ALREADY-SEEN page to exercise
    // the DuplicateUrlWarning drop (spiderfetch.py:96-97).
    for (i <- 0 until p.redirectPages) {
      val h = i % p.hosts
      val target =
        if (i == 1) pageUrl(h, 1 % pageCount(h)) // duplicate branch
        else s"http://${hostName(h)}/d$h/rtarget$i.html"
      docs += CorpusDoc(
        s"http://${hostName(h)}/d$h/redirect$i.html",
        Nil,
        redirect_to = Some(target))
      if (i != 1)
        docs += CorpusDoc(s"http://${hostName(h)}/d$h/rtarget$i.html",
          Seq(
            // non-BMP char: chain-hop byte accounting must count CODE
            // POINTS on both engines (round-3 advice #3)
            Span("text", "redirect landing page 🚀", "", 0),
            Span("link", pageUrl(h, 0), "", 30)))
    }
    // temporal-failure pages: first fetch attempt times out, retry succeeds
    for (i <- 0 until p.failPages) {
      val h = i % p.hosts
      docs += CorpusDoc(
        s"http://${hostName(h)}/d$h/flaky$i.html",
        Seq(
          Span("text", "eventually reachable", "", 0),
          Span("link", pageUrl(h, 0), "", 30)),
        fail_attempts = 1)
    }
    // plain-text pages: non-empty, no HTML markup, no URLs — when SPIDERED
    // they trip the typecheck (WRONG_TYPE, fetch.py:519-531); when
    // SPIDER_FETCHed the fetcher downgrades to a plain fetch (no error)
    for (i <- 0 until p.plainPages) {
      val h = i % p.hosts
      docs += CorpusDoc(
        s"http://${hostName(h)}/d$h/plain$i.txt",
        Seq(Span("text", s"just prose $i no markup no links", "", 0)))
    }
    // ftp listing host: directory page with ftp-kind spans
    if (p.ftpHost) {
      docs += CorpusDoc(
        "ftp://ftp0.test/pub/",
        Seq(
          Span("ftp", "stage1-x86.tar.bz2", "", 0),
          Span("ftp", "notes.txt", "", 80)),
        redirect_to = None)
      docs += CorpusDoc("ftp://ftp0.test/pub/stage1-x86.tar.bz2",
        Seq(Span("text", "binary blob", "", 0)))
      docs += CorpusDoc("ftp://ftp0.test/pub/notes.txt",
        Seq(Span("text", "plain notes", "", 0)))
    }

    // wire the extra pages into the seed host graph so they're reachable
    val extraTargets =
      (0 until p.redirectPages).map(i => s"http://${hostName(i % p.hosts)}/d${i % p.hosts}/redirect$i.html") ++
      (0 until p.failPages).map(i => s"http://${hostName(i % p.hosts)}/d${i % p.hosts}/flaky$i.html") ++
      (0 until p.plainPages).map(i => s"http://${hostName(i % p.hosts)}/d${i % p.hosts}/plain$i.txt") ++
      (if (p.ftpHost) Seq("ftp://ftp0.test/pub/") else Nil)
    val seedId = seedUrl(p)
    docs.zipWithIndex.find(_._1.doc_id == seedId).foreach { case (seedDoc, idx) =>
      var off = seedDoc.spans.map(s => s.offset + s.text.length).maxOption.getOrElse(0) + 50
      val extra = extraTargets.map { t =>
        val s = Span("link", t, "", off); off += t.length + 16; s
      }
      // supplementary-plane prose on a successfully-SPIDERed page: the
      // origin-batch byte metric (contentLenCol) counts code points; a
      // UTF-16-unit counter anywhere in the parity chain fails HERE
      // instead of only on real-world non-ASCII corpora (round-3 advice #3)
      val nonBmp = Span("text", "emoji prose 😀🤖 end", "", off)
      docs(idx) = seedDoc.copy(spans = (seedDoc.spans :+ nonBmp) ++ extra)
    }
    docs.toSeq
  }

  /** A deterministic empty-spans (zero-data) doc appender for error tests. */
  def withZeroDataDoc(docs: Seq[CorpusDoc], url: String): Seq[CorpusDoc] =
    docs :+ CorpusDoc(url, Nil)
}
