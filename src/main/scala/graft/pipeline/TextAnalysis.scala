package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * language ID (n-gram/marker heuristic), quality scoring, token counting
 * (whitespace + BPE-ish estimate), document fingerprinting. All built-in
 * column expressions (whole-stage codegen; no UDFs), each with an exact
 * ANSI-SQL twin for the DuckDB oracle — formulas use only
 * length/replace/regexp primitives that behave identically in both
 * engines.
 */
object TextAnalysis {

  /** Whitespace tokens, empty-safe. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** BPE-ish subword estimate: ~3.5 chars/token, integer-exact formula
    * (mirrorable in ANSI SQL without float rounding hazards). */
  def bpeTokenEstimate(text: Column): Column =
    ((length(text) * 2 + 6) / 7).cast("long")

  /** Occurrence count of a literal marker via the replace trick —
    * identical semantics in Spark and DuckDB. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(marker), ""))) /
      marker.length).cast("long")

  /** Language-ID marker words per language (padded to word boundaries). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " die ", " und "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " que "),
    "zh" -> Seq("的", "是", "了"))

  /** Heuristic language ID: argmax of marker-hit counts, deterministic
    * tie-break by marker-list order, 'und' when nothing hits. */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scores = LangMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => occurrences(padded, m)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Word n-grams in order, NOT deduped (occurrence counts matter for
    * the repetition metrics); fewer than n tokens → empty. The DuckDB
    * twin is a 1-based list comprehension over the same token array. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Longest consecutive run of the same token — the "same word repeated
    * k times" repetition signal of quality-filter pipelines (Rae et al.,
    * Gopher, arXiv:2112.11446 §A1.1 uses the families of repetition
    * fractions this and the bigram fraction represent). One fold over
    * the token array, no shuffle; empty → 0. */
  def maxTokenRun(toks: Column): Column =
    aggregate(toks,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** English stopword list for the quality stopword ratio (a fixed,
    * deterministic set — both engines filter tokens against it). */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Fraction of tokens that are (lowercased) stopwords — high values
    * indicate prose, near-zero values indicate boilerplate/code/tables. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    round(size(filter(toks, t => t.isin(Stopwords.map(lit(_)): _*)))
      .cast("double") / greatest(size(toks), lit(1)).cast("double"), 4)
  }

  /** Quality-scoring features: length, word stats, char-class ratios. */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val len = length(t).cast("double")
    val nTok = tokenCount(t).cast("double")
    val safeLen = greatest(len, lit(1.0))
    df
      .withColumn("n_chars_q", length(t).cast("long"))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("mean_word_len",
        round((len - (nTok - 1)) / greatest(nTok, lit(1.0)), 4))
      .withColumn("punct_ratio",
        round(length(regexp_replace(t, "[^.,;:!?'\"()\\[\\]-]", "")) / safeLen, 4))
      .withColumn("digit_ratio",
        round(length(regexp_replace(t, "[^0-9]", "")) / safeLen, 4))
      .withColumn("upper_ratio",
        round(length(regexp_replace(t, "[^A-Z]", "")) / safeLen, 4))
      .withColumn("space_ratio",
        round(length(regexp_replace(t, "[^ ]", "")) / safeLen, 4))
  }

  /** Composite quality score in [0,1]: longer docs with word-like shape
    * score higher; degenerate punctuation/digit walls score low. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame =
    qualityFeatures(df, textCol).withColumn("quality_score",
      round(
        least(col("n_tokens") / lit(100.0), lit(1.0)) * lit(0.5) +
        (lit(1.0) - least(col("punct_ratio") * 5, lit(1.0))) * lit(0.25) +
        (lit(1.0) - least(col("digit_ratio") * 5, lit(1.0))) * lit(0.25), 4))

  /** Normalized-content fingerprint: md5 over lowercased,
    * whitespace-collapsed text — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Rolling (polynomial) hash over the normalized text — cheap
    * content-defined fingerprint usable for chunk-level dedup. Pure
    * integer column expression via aggregate over characters is
    * impractical; use 8-gram sampled xxhash instead: hash of every
    * stride-th 8-gram, combined order-independently. */
  def rollingFingerprint(text: Column, stride: Int = 16): Column = {
    val norm = trim(regexp_replace(lower(text), "\\s+", " "))
    val idx = sequence(lit(0),
      greatest(((length(norm) - 8) / stride).cast("int"), lit(0)))
    val grams = transform(idx, i => norm.substr(i * stride + 1, lit(8)))
    aggregate(transform(grams, g => xxhash64(g)), lit(0L), (acc, h) => acc.bitwiseXOR(h))
  }

  /**
   * Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
   * — the MOSS scheme): rolling k-gram hashes over the normalized text,
   * then the minimum hash of every w-hash window; the distinct minima are
   * the fingerprint SET. Guarantee: any shared substring of length
   * >= k + w - 1 contributes at least one shared fingerprint, so overlap
   * of fingerprint sets lower-bounds copied content — the classic
   * partial-duplicate / contamination detector, as one codegen'd column
   * expression (no UDF; one scan, no shuffle until the caller aggregates).
   *
   * The hash is the first 8 hex chars of md5(gram) compared as a string —
   * identical in Spark and DuckDB, so the oracle replays it exactly
   * (per-window min VALUE is tie-break-free: equal minima pick the same
   * value either way).
   */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column = {
    val norm = trim(regexp_replace(lower(text), "\\s+", " "))
    val gIdx = sequence(lit(1), greatest(length(norm) - (k - 1), lit(1)))
    val hashes = transform(gIdx, i => md5(norm.substr(i, lit(k))).substr(1, 8))
    val wIdx = sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1)))
    array_sort(array_distinct(
      transform(wIdx, j => array_min(slice(hashes, j, lit(w))))))
  }

  /** JVM twin of `winnowFingerprints` — same values, one tight pass
    * (round-6, measure-first sweep): the expression form sits outside
    * whole-stage codegen (higher-order functions are interpreted) and its
    * md5-expression-per-gram + slice-per-window shape cost ~1.3 s/DOC at
    * bench scale — 130 s for q25's ~100-doc sample, the worst operator in
    * the 138-query sweep by 5x. The kernel reuses one MessageDigest,
    * emits the identical first-8-hex-chars hashes, takes per-window
    * minima by the same string comparison, and returns the same
    * distinct+sorted fingerprint set — pinned bit-identical to the
    * expression in PipelineSpec and to the DuckDB oracle (q25Sql). */
  private[graft] def winnowKernel(text: String, k: Int = 8,
                                  w: Int = 4): Array[String] = {
    val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
    val md = java.security.MessageDigest.getInstance("MD5")
    val nGrams = math.max(norm.length - (k - 1), 1)
    val hashes = new Array[String](nGrams)
    val hexDigits = "0123456789abcdef".toCharArray
    var i = 0
    while (i < nGrams) {
      val g = norm.substring(i, math.min(i + k, norm.length))
      val d = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val cs = new Array[Char](8)
      var b = 0
      while (b < 4) {
        val v = d(b) & 0xff
        cs(2 * b) = hexDigits(v >> 4)
        cs(2 * b + 1) = hexDigits(v & 15)
        b += 1
      }
      hashes(i) = new String(cs)
      md.reset()
      i += 1
    }
    val nWin = math.max(nGrams - (w - 1), 1)
    val out = new java.util.TreeSet[String]()
    var j = 0
    while (j < nWin) {
      var m = hashes(j)
      var t = j + 1
      val end = math.min(j + w, nGrams)
      while (t < end) { if (hashes(t) < m) m = hashes(t); t += 1 }
      out.add(m)
      j += 1
    }
    out.toArray(new Array[String](out.size))
  }
}
