package graft

import graft.fixtures.FixtureCorpus
import graft.model.ErrorCode
import graft.oracle.RefCrawler
import graft.urlcanon.UrlRewrite
import scala.collection.mutable

/**
 * Driver-oracle generation for the crawl-engine queries: runs the
 * sequential in-repo reference implementation (RefCrawler — an
 * INDEPENDENT, list-based mirror of `spiderfetch.py` semantics, not the
 * Spark engine) over the same fixture corpus and renders its expected
 * tables as DuckDB `VALUES` SQL. Verify merges these into
 * oracle_sql.json, turning the `crawl_*`/`web_*` rows of the driver's
 * correctness report into real engine-vs-oracle comparisons instead of
 * `no_oracle`.
 */
object OracleGen {

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  private def values(rows: Seq[Seq[String]], cols: Seq[String],
                     casts: Map[String, String], orderBy: String): String = {
    require(rows.nonEmpty, "VALUES oracle needs at least one row")
    val sel = cols.map(c =>
      casts.get(c).map(t => s"$c::$t AS $c").getOrElse(c)).mkString(", ")
    val vs = rows.map(_.mkString("(", ", ", ")")).mkString(",\n")
    s"SELECT $sel FROM (VALUES\n$vs\n) AS t(${cols.mkString(", ")}) ORDER BY $orderBy"
  }

  /** The oracle crawl for the shared fixture (same params/rules/seed as
    * Queries.fixtureCrawl). */
  lazy val ref: RefCrawler.CrawlResult = RefCrawler.run(
    FixtureCorpus.generate(Queries.fixtureParams),
    FixtureCorpus.seedUrl(Queries.fixtureParams),
    Queries.fixtureRules)

  private lazy val seedUrl = FixtureCorpus.seedUrl(Queries.fixtureParams)

  // url -> (seq, wave) of its seen row (first occurrence)
  private lazy val seenIndex: Map[String, (Long, Int)] =
    ref.seen.groupBy(_.url).map { case (u, rows) =>
      u -> (rows.head.seq, rows.head.wave)
    }

  def crawlSeenSql: String = values(
    ref.seen.map(s => Seq(q(s.url), q(UrlRewrite.canonicalHost(s.url)),
      s.wave.toString, s.seq.toString)),
    Seq("url", "canonicalHost", "wave", "seq"),
    Map("wave" -> "INT", "seq" -> "BIGINT"), "seq")

  /** Per-wave seen-row attribution for crawl_increments: the union of
    * incremental snapshot reads must deliver every seen row exactly once,
    * so grouping it by wave reproduces these per-wave (count, seq-range)
    * totals from the sequential crawler. */
  def crawlIncrementsSql: String = values(
    ref.seen.groupBy(_.wave).toSeq.sortBy(_._1).map { case (w, rows) =>
      Seq(w.toString, rows.size.toString,
        rows.map(_.seq).min.toString, rows.map(_.seq).max.toString)
    },
    Seq("wave", "rows_added", "min_seq", "max_seq"),
    Map("wave" -> "INT", "rows_added" -> "BIGINT",
      "min_seq" -> "BIGINT", "max_seq" -> "BIGINT"), "wave")

  /** Per-host seen counts for crawl_ivm: the incrementally-maintained
    * view's final state must equal the full-table aggregation of the
    * sequential crawler's seen rows. */
  def crawlIvmSql: String = values(
    ref.seen.groupBy(s => UrlRewrite.canonicalHost(s.url)).toSeq
      .sortBy(_._1).map { case (h, rows) =>
        Seq(q(h), rows.size.toString)
      },
    Seq("canonicalHost", "n_seen"),
    Map("n_seen" -> "BIGINT"), "canonicalHost")

  def crawlOrderSql: String = values(
    ref.processed.zipWithIndex.map { case (p, i) =>
      Seq(p.wave.toString, i.toString, q(p.url), p.mode.toString,
        p.retry.toString.toUpperCase)
    },
    Seq("wave", "ord", "url", "mode", "retry"),
    Map("wave" -> "INT", "ord" -> "BIGINT", "mode" -> "INT",
      "retry" -> "BOOLEAN"), "ord")

  def crawlDumpSql: String = values(
    ref.dump.map { u =>
      val (seq, wave) = seenIndex(u)
      Seq(seq.toString, wave.toString, q(u))
    },
    Seq("seq", "wave", "url"),
    Map("seq" -> "BIGINT", "wave" -> "INT"), "seq")

  def crawlEdgesSql: String = values(
    ref.edges.toSeq.map { case ((s, d), w) => Seq(q(s), q(d), w.toString) },
    Seq("src", "dst", "wave"), Map("wave" -> "INT"), "src, dst")

  def crawlAliasesSql: String = values(
    ref.aliases.map { case (c, a, w) => Seq(q(c), q(a), w.toString) },
    Seq("canonicalUrl", "aliasUrl", "wave"), Map("wave" -> "INT"), "aliasUrl")

  def crawlFetchLogSql: String = values(
    ref.fetchLog.map(l => Seq(q(l.url), l.mode.toString, l.wave.toString,
      l.errorCode.toString, l.attempt.toString)),
    Seq("url", "mode", "wave", "errorCode", "attempt"),
    Map("mode" -> "INT", "wave" -> "INT", "errorCode" -> "INT",
      "attempt" -> "INT"), "wave, url, attempt, mode")

  def crawlIndegreeSql: String = {
    val top = ref.edges.keys.toSeq.groupBy(_._2).toSeq
      .map { case (d, es) => (d, es.size.toLong) }
      .sortBy { case (u, n) => (-n, u) }.take(10)
    values(top.map { case (u, n) => Seq(q(u), n.toString) },
      Seq("url", "in_degree"), Map("in_degree" -> "BIGINT"),
      "in_degree DESC, url")
  }

  def crawlFetchedSql: String = values(
    ref.fetched.map { case (u, f) => Seq(q(u), q(f)) },
    Seq("url", "filename"), Map.empty, "filename")

  def crawlMetricsSql: String = values(
    ref.waveTotals.map { case (w, r, fr, er, dr, by) =>
      Seq(w.toString, r.toString, fr.toString, er.toString, dr.toString,
        by.toString) },
    Seq("wave", "ruleIdx", "frontierRows", "errorRows", "discoveredRows",
      "bytesFetched"),
    Map("wave" -> "INT", "ruleIdx" -> "INT", "frontierRows" -> "BIGINT",
      "errorRows" -> "BIGINT", "discoveredRows" -> "BIGINT",
      "bytesFetched" -> "BIGINT"), "wave")

  /** crawl_lineage oracle (round-3 verdict #6): the layout-independent
    * per-wave SUM over the engine's per-partition lineage rows — every
    * processed record (admitted + same-wave retries), origin-call errors,
    * origin-fetch bytes — rendered from RefCrawler's independently-
    * tracked origin stats. */
  def crawlLineageSql: String = values(
    ref.waveOriginStats.map { case (w, n, e, b) =>
      Seq(w.toString, n.toString, e.toString, b.toString) },
    Seq("wave", "processed_rows", "error_rows", "origin_bytes"),
    Map("wave" -> "INT", "processed_rows" -> "BIGINT",
      "error_rows" -> "BIGINT", "origin_bytes" -> "BIGINT"), "wave")

  /** crawl_pagerank oracle: the INDEPENDENT edge list (RefCrawler's, not
    * the engine's) rendered as VALUES, with the fixed-point PageRank
    * recurrence computed BY DUCKDB via unrolled per-iteration CTEs —
    * integer `//` ≡ Spark `div` on non-negative longs, so the replay is
    * bit-identical (see GraphQueries.pagerank). */
  def crawlPagerankSql(iters: Int = 3): String = {
    val vs = ref.edges.keys.toSeq.sorted
      .map { case (s0, d0) => s"(${q(s0)}, ${q(d0)})" }.mkString(",\n")
    val rounds = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst AS url, sum(p.r // o.d)::BIGINT AS c
         |  FROM e JOIN outdeg o ON e.src = o.src
         |  JOIN pr${i - 1} p ON p.url = e.src GROUP BY e.dst),
         |pr$i AS (SELECT n.url,
         |    (150000 + (85 * coalesce(c.c, 0)) // 100)::BIGINT AS r
         |  FROM nodes n LEFT JOIN c$i c ON n.url = c.url)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT src, dst FROM (VALUES
       |$vs
       |) AS t(src, dst)),
       |nodes AS (SELECT src AS url FROM e UNION SELECT dst FROM e),
       |outdeg AS (SELECT src, count(*)::BIGINT AS d FROM e GROUP BY src),
       |pr0 AS (SELECT url, 1000000::BIGINT AS r FROM nodes),
       |$rounds
       |SELECT url, r AS pagerank FROM pr$iters
       |ORDER BY pagerank DESC, url""".stripMargin
  }

  // ----------------------------------------------- web.py analytics twins

  def webMultipleSql: String = {
    val groups = ref.aliases.groupBy(_._1).toSeq
      .map { case (c, as) =>
        (c, as.size + 1L, as.map(_._2).sorted.mkString("|"))
      }
      .filter(_._2 > 1)
      .sortBy { case (c, n, _) => (-n, c) }
    values(groups.map { case (c, n, a) => Seq(q(c), n.toString, q(a)) },
      Seq("canonicalUrl", "n_urls", "alias_urls"),
      Map("n_urls" -> "BIGINT"), "n_urls DESC, canonicalUrl")
  }

  def webStatsSql: String = {
    val hosts = ref.seen.map(s => UrlRewrite.canonicalHost(s.url)).distinct.size
    s"SELECT ${ref.seen.size}::BIGINT AS web_size, $hosts::BIGINT AS n_hosts"
  }

  /** BFS trace root<-..<-target over incoming edges — the sequential twin
    * of GraphQueries.trace: per level, unvisited predecessors keep the
    * lexicographically smallest path (all same length at a level). */
  def traceSeq(edges: Iterable[(String, String)], root: String,
               target: String, maxDepth: Int = 64): Seq[String] = {
    if (root == target) return Seq(root)
    val incoming = edges.groupBy(_._2).map { case (d, es) =>
      d -> es.map(_._1).toSeq
    }
    implicit val vecOrd: Ordering[Vector[String]] =
      Ordering.Implicits.seqOrdering[Vector, String]
    var frontier: Map[String, Vector[String]] = Map(target -> Vector(target))
    val visited = mutable.Set(target)
    var depth = 0
    while (depth < maxDepth && frontier.nonEmpty) {
      depth += 1
      val next = mutable.Map.empty[String, Vector[String]]
      for ((u, path) <- frontier; src <- incoming.getOrElse(u, Nil)
           if !visited(src)) {
        val cand = path :+ src
        if (!next.get(src).exists(p => vecOrd.lteq(p, cand))) next(src) = cand
      }
      next.get(root) match {
        case Some(p) => return p.reverse
        case None => ()
      }
      if (next.isEmpty) return Seq.empty
      visited ++= next.keys
      frontier = next.toMap
    }
    Seq.empty
  }

  /** Sequential twin of GraphQueries.deepest: BFS distances from root;
    * deepest = lexicographically-min url of the last non-empty level. */
  def deepestSeq(edges: Iterable[(String, String)], root: String,
                 maxDepth: Int = 64): (String, Int) = {
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSeq }
    val dist = mutable.Map(root -> 0)
    var frontier: Set[String] = Set(root)
    var depth = 0
    var last = (root, 0)
    while (depth < maxDepth && frontier.nonEmpty) {
      depth += 1
      val next = frontier.flatMap(u => out.getOrElse(u, Nil))
        .filterNot(dist.contains)
      if (next.isEmpty) return last
      last = (next.min, depth)
      next.foreach(u => dist(u) = depth)
      frontier = next
    }
    last
  }

  /** Fixed trace target for the driver surface: the deepest ftp file —
    * exercises a multi-hop path through the ftp listing. */
  val TraceTarget = "ftp://ftp0.test/pub/notes.txt"

  def webTraceSql: String = {
    val path = traceSeq(ref.edges.keys, seedUrl, TraceTarget)
    values(path.zipWithIndex.map { case (u, i) => Seq(i.toString, q(u)) },
      Seq("step", "url"), Map("step" -> "INT"), "step")
  }

  def webDeepestSql: String = {
    val (u, d) = deepestSeq(ref.edges.keys, seedUrl)
    s"SELECT ${q(u)} AS url, $d::INT AS depth"
  }

  /** G3: in/out neighbors of the seed, direction-tagged. */
  def webRefsSql: String = {
    val out = ref.edges.keys.toSeq.filter(_._1 == seedUrl).map(_._2)
      .map(u => Seq(q("out"), q(u)))
    val in = ref.edges.keys.toSeq.filter(_._2 == seedUrl).map(_._1)
      .map(u => Seq(q("in"), q(u)))
    values(out ++ in, Seq("dir", "url"), Map.empty, "dir, url")
  }

  /** G4: every URL in discovery order (the web dump). */
  def webDumpSql: String = values(
    ref.seen.map(r => Seq(r.seq.toString, q(r.url))),
    Seq("seq", "url"), Map("seq" -> "BIGINT"), "seq")

  /** G5: alias rows touching the probe URL. */
  def webAliasesOfSql: String = values(
    ref.aliases.filter(a =>
      a._1 == Queries.AliasProbeUrl || a._2 == Queries.AliasProbeUrl)
      .map { case (c, a, w) => Seq(q(c), q(a), w.toString) },
    Seq("canonicalUrl", "aliasUrl", "wave"), Map("wave" -> "INT"), "aliasUrl")

  // --------------------------- data-dependent oracles (round-2 verdict #3)

  /**
   * q15 expected rows: SEQUENTIAL all-pairs simhash over the sf-dir
   * documents table (+ the same planted near-dups as the Spark side),
   * rendered as VALUES. Independent of the engine's Manku block-table
   * path — it pins the banding's pigeonhole recall AND the distributed
   * plumbing; the 64-bit kernel itself is shared (its bit pattern is not
   * ANSI-SQL-expressible, which is why this row was `no_oracle` before).
   */
  private def q15Sql(spark: org.apache.spark.sql.SparkSession,
                     sfDir: String): String = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val planted = docs.filter(_._1 % 100 == 0)
      .map { case (id, t) => (id + 10000000L, t + " planted near dup tail") }
    val all = (docs ++ planted).map { case (id, t) =>
      (id, graft.pipeline.Dedup.simhash64(t))
    }.sortBy(_._1)
    val pairs = for {
      i <- all.indices
      j <- (i + 1) until all.length
      d = java.lang.Long.bitCount(all(i)._2 ^ all(j)._2)
      if d <= 6 // q15's maxDistance
    } yield Seq(all(i)._1.toString, all(j)._1.toString, d.toString)
    values(pairs, Seq("id_a", "id_b", "hamming"),
      Map("id_a" -> "BIGINT", "id_b" -> "BIGINT", "hamming" -> "INT"),
      "id_a, id_b")
  }

  /**
   * q20 expected rows: sequential replay of the deterministic media
   * synthesis + the stub codec (the fake decode IS the defined semantic
   * in this sandbox — Multimodal.MediaCodec). Pins the Spark-side
   * plumbing: schema, mapPartitions batching, row count, determinism.
   */
  private def q20Sql: String = {
    val rnd = new scala.util.Random(11L) // Multimodal.synthesize default seed
    val rows = (0 until 120).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = Array.fill(64 + rnd.nextInt(192))(rnd.nextInt().toByte)
      // synthesize consumes one more rnd draw for non-image duration_ms
      if (kind != "image") rnd.nextInt(9000)
      val (_, frames, _) = graft.pipeline.Multimodal.MediaCodec.decode(kind, payload)
      Seq(i.toString,
        q(s"http://host${i % 4}.test/d${i % 4}/page${i % 3}.html"),
        q(kind), "TRUE", frames.toString)
    }
    values(rows, Seq("media_id", "doc_id", "kind", "decoded_ok", "n_frames"),
      Map("media_id" -> "BIGINT", "decoded_ok" -> "BOOLEAN",
        "n_frames" -> "INT"), "media_id")
  }

  /** Oracles that depend on the sf-dir data (rendered by Verify at run
    * time, like `all` but parameterized by the table directory). */
  def dataOracles(spark: org.apache.spark.sql.SparkSession,
                  sfDir: String): Map[String, String] = Map(
    "q15_simhash_pairs" -> q15Sql(spark, sfDir),
    "q20_multimodal_features" -> q20Sql)

  /** All runtime-generated oracles (merged by Verify into oracle_sql.json). */
  def all: Map[String, String] = Map(
    "crawl_seen" -> crawlSeenSql,
    "crawl_increments" -> crawlIncrementsSql,
    "crawl_ivm" -> crawlIvmSql,
    "crawl_order" -> crawlOrderSql,
    "crawl_dump" -> crawlDumpSql,
    "crawl_edges" -> crawlEdgesSql,
    "crawl_aliases" -> crawlAliasesSql,
    "crawl_fetch_log" -> crawlFetchLogSql,
    "crawl_indegree" -> crawlIndegreeSql,
    "crawl_fetched" -> crawlFetchedSql,
    "crawl_metrics" -> crawlMetricsSql,
    "crawl_lineage" -> crawlLineageSql,
    "crawl_pagerank" -> crawlPagerankSql(),
    "web_multiple" -> webMultipleSql,
    "web_stats" -> webStatsSql,
    "web_trace" -> webTraceSql,
    "web_deepest" -> webDeepestSql,
    "web_refs" -> webRefsSql,
    "web_dump" -> webDumpSql,
    "web_aliases_of" -> webAliasesOfSql)
}
