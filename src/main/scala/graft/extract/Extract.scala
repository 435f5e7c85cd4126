package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * UDF-free span extraction pipeline — the Spark-native replacement for the
 * reference's regex spider (`/root/reference/spiderfetch/spider.py:34-88`).
 *
 * The corpus is pre-tokenized into interleaved spans (input_hint), so
 * "extraction" is a span filter + deterministic ordering, not regex work:
 *
 *   findall order (spider.py:82-88) = extractor rank, then match offset,
 *   where rank: link:0, link_unq:1, frame:2, frame_unq:3, img:4, img_unq:5,
 *   uri:6, ftp:7 — and ftp spans only count when the page scheme is ftp
 *   (spider.py:84-85).
 *
 * Everything is built-in higher-order functions (`filter`, `array_sort`
 * with comparator, `posexplode`) — full Catalyst optimization, no UDFs, no
 * shuffle: ordering happens inside the span array before exploding.
 */
object Extract {

  /** Extractor ranks defining findall order (spider.py:74-88). */
  val ExtractorRank: Map[String, Int] = Map(
    "link" -> 0, "link_unq" -> 1, "frame" -> 2, "frame_unq" -> 3,
    "img" -> 4, "img_unq" -> 5, "uri" -> 6, "ftp" -> 7)

  /** Media kinds carry the URL in media_ref; link-ish kinds in text. */
  val MediaKinds: Seq[String] = Seq("frame", "frame_unq", "img", "img_unq")

  private val rankMap: Column =
    typedLit(ExtractorRank)

  /** URL of a span struct column (media kinds -> media_ref, else text). */
  def spanUrl(span: Column): Column =
    when(span.getField("kind").isin(MediaKinds: _*), span.getField("media_ref"))
      .otherwise(span.getField("text"))

  /**
   * colorize_shell (`spider.py:106-123`, E7) re-expressed over the span
   * model: the reference wraps every extractor match in an ANSI highlight
   * colored by extractor id; here the rendered document (pieces joined by
   * newline, the same rendering as FetchResume.contentOf) wraps each span
   * findall WOULD extract (non-text kinds; ftp kinds only on ftp pages)
   * in SGR color 31 + rank mod 6. One codegen'd expression, no UDF.
   */
  def colorizeShell(docId: Column, spans: Column): Column = {
    import org.apache.spark.sql.functions.{array_join, coalesce, concat,
      element_at, lit, pmod, transform, when}
    val isFtpPage = schemeOf(docId) === "ftp"
    val pieces = transform(spans, s => {
      val body = when(s.getField("media_ref") =!= "", s.getField("media_ref"))
        .otherwise(s.getField("text"))
      val extracted = s.getField("kind") =!= "text" &&
        (s.getField("kind") =!= "ftp" || isFtpPage)
      val color = (lit(31) +
        pmod(coalesce(element_at(rankMap, s.getField("kind")), lit(99)),
          lit(6))).cast("string")
      when(extracted,
        concat(lit("\u001b["), color, lit("m"), body, lit("\u001b[0m")))
        .otherwise(body)
    })
    array_join(pieces, "\n")
  }

  /** Lowercased scheme of a URL column (urlsplit semantics: leading
    * letter + [letter digit +.-]* before ':'). */
  def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.\\-]*):", 1))

  /**
   * findall (spider.py:82-88) over a span-table corpus.
   *
   * Input: (doc_id, spans) [+ passthrough columns, preserved].
   * Output: one row per extracted span in exact findall order:
   * (passthrough..., doc_id, extract_idx, kind, text, media_ref, offset, url).
   */
  def findall(docs: DataFrame): DataFrame = {
    val isFtpPage = schemeOf(col("doc_id")) === "ftp"
    val urlSpans = filter(col("spans"), s =>
      s.getField("kind") =!= "text" &&
        (s.getField("kind") =!= "ftp" || isFtpPage))
    val sortKey = (s: Column) =>
      coalesce(element_at(rankMap, s.getField("kind")), lit(99))
        .cast("long") * lit(1000000000L) + s.getField("offset")
    val ordered = array_sort(urlSpans, (l, r) =>
      when(sortKey(l) < sortKey(r), -1)
        .when(sortKey(l) > sortKey(r), 1)
        .otherwise(0))
    docs
      .select(col("*"), posexplode(ordered).as(Seq("pos", "s")))
      .withColumn("extract_idx", col("pos").cast("long"))
      .withColumn("kind", col("s.kind"))
      .withColumn("text", col("s.text"))
      .withColumn("media_ref", col("s.media_ref"))
      .withColumn("offset", col("s.offset"))
      .withColumn("url", spanUrl(col("s")))
      .drop("pos", "s", "spans")
  }

  /**
   * unique (spider.py:102-104): order-preserving first-wins distinct of
   * extracted URLs per document. A ranking window, NOT dropDuplicates
   * (which has no ordering guarantee) — SURVEY §2.3 E6 / §2.8 O4.
   */
  def uniqueFirstWins(extracted: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"), col("url"))
      .orderBy(col("extract_idx"))
    extracted
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** has_urls typecheck (filetype.py:28-34 / SURVEY P6): any non-text span
    * (gated on scheme for ftp spans). */
  def hasUrls(docs: DataFrame): DataFrame = {
    val isFtpPage = schemeOf(col("doc_id")) === "ftp"
    docs.withColumn("has_urls",
      size(filter(col("spans"), s =>
        s.getField("kind") =!= "text" &&
          (s.getField("kind") =!= "ftp" || isFtpPage))) > 0)
  }

  /** HTML-tag extractor kinds: only these match actual HTML markup
    * (`spider.py:34-53` tag regexes); `uri`/`ftp` also match plain text. */
  val HtmlKinds: Seq[String] = Seq("link", "link_unq", "frame", "frame_unq",
    "img", "img_unq")

  /** is_html typecheck analogue (filetype.py:13,24-26 / SURVEY P5): the doc
    * carries HTML markup — any span of an HTML-tag extractor kind. A doc
    * of only `text` (or only `uri`) spans models a non-HTML file. */
  def isHtml(docs: DataFrame): DataFrame =
    docs.withColumn("is_html", isHtmlCol(col("spans")))

  /** Column twins of the typechecks, for use inside engine expressions. */
  def isHtmlCol(spans: Column): Column =
    exists(spans, s => s.getField("kind").isin(HtmlKinds: _*))

  def hasUrlsCol(spans: Column, docId: Column): Column = {
    val isFtpPage = schemeOf(docId) === "ftp"
    exists(spans, s =>
      s.getField("kind") =!= "text" &&
        (s.getField("kind") =!= "ftp" || isFtpPage))
  }

  /** Scala twins (sequential oracle). */
  def isHtmlSeq(doc: graft.model.CorpusDoc): Boolean =
    doc.spans.exists(s => HtmlKinds.contains(s.kind))

  def hasUrlsSeq(doc: graft.model.CorpusDoc): Boolean = {
    val isFtp = doc.doc_id.take(4).equalsIgnoreCase("ftp:")
    doc.spans.exists(s => s.kind != "text" && (s.kind != "ftp" || isFtp))
  }

  // ---- pure-Scala twin (used by the sequential oracle + unit tests) ----

  /** findall over a single span doc: (kind, url) in exact findall order.
    * Same contract as the Spark `findall` above. */
  def findallSeq(doc: graft.model.CorpusDoc): Seq[(String, String)] = {
    val isFtp = doc.doc_id.take(4).equalsIgnoreCase("ftp:")
    doc.spans
      .filter(s => s.kind != "text" && (s.kind != "ftp" || isFtp))
      .sortBy(s => (ExtractorRank.getOrElse(s.kind, 99), s.offset))
      .map(s => (s.kind, if (MediaKinds.contains(s.kind)) s.media_ref else s.text))
  }

  /** unique (spider.py:102-104): order-preserving first-wins distinct. */
  def uniqueSeq(urls: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    urls.filter(seen.add)
  }
}
