package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The crawl-graph analytics surface of `web.py` (reference query tool
 * `python -m spiderfetch.web`, `web.py:177-226`), re-expressed as plain
 * DataFrame ops over the normalized relations (SURVEY §2.9 / §2.7) —
 * no graph library needed; adjacency queries are joins/aggregations.
 *
 * Tables: edges(src, dst, wave), seen(url, canonicalHost, wave, seq),
 * aliases(canonicalUrl, aliasUrl, wave).
 */
object GraphQueries {

  /** A1 print_popular (`web.py:122-128`): top-k by in-degree.
    * Partial+final hash agg + TakeOrderedAndProject for free. */
  def popular(edges: DataFrame, k: Int = 10): DataFrame =
    edges.groupBy(col("dst").as("url"))
      .agg(count(lit(1)).as("in_degree"))
      .orderBy(desc("in_degree"), asc("url"))
      .limit(k)

  /** A2 print_multiple (`web.py:130-149`): documents with >1 URL (alias
    * groups), largest groups first. Aliases joined to one sorted string —
    * a stable, SQL-oracle-friendly shape. */
  def multiple(aliases: DataFrame): DataFrame =
    aliases.groupBy(col("canonicalUrl"))
      .agg((count(lit(1)) + 1).as("n_urls"),       // +1: canonical itself
        array_join(sort_array(collect_list(col("aliasUrl"))), "|")
          .as("alias_urls"))
      .filter(col("n_urls") > 1)
      .orderBy(desc("n_urls"), asc("canonicalUrl"))

  /** A3 print_stats (`web.py:151-154`): web size. Exact distinct-host
    * count (count_distinct shuffles by host — cheap next to the crawl;
    * swap in approx_count_distinct at 10^10 if ±2% is acceptable). */
  def stats(seen: DataFrame): DataFrame =
    seen.agg(count(lit(1)).as("web_size"),
      countDistinct(col("canonicalHost")).as("n_hosts"))

  /** G3 print_refs (`web.py:70-77`): out-/in-neighbors of a URL. */
  def outRefs(edges: DataFrame, url: String): DataFrame =
    edges.filter(col("src") === url).select(col("dst").as("url"))
  def inRefs(edges: DataFrame, url: String): DataFrame =
    edges.filter(col("dst") === url).select(col("src").as("url"))

  /** G4 dump (`web.py:61-63`): all URLs in discovery order. */
  def dumpUrls(seen: DataFrame): DataFrame =
    seen.orderBy("seq").select("url")

  /** G5 aliases of a URL (`web.py:79-82`). */
  def aliasesOf(aliases: DataFrame, url: String): DataFrame =
    aliases.filter(col("canonicalUrl") === url || col("aliasUrl") === url)

  /**
   * G1 get_trace (`web.py:84-103`): BFS shortest path from root to a URL
   * over incoming edges, cycle-safe. Pregel-style driver loop of joins;
   * iteration count bounded by crawl depth. Returns hops (step, url) root
   * -> target, empty when unreachable.
   */
  /** Bounded small-graph probe: true when `edges` holds at most `limit`
    * rows, decided by an incremental limit-count (never a full scan). */
  private def smallGraph(edges: DataFrame, limit: Long): Boolean =
    edges.limit((limit + 1).toInt).count() <= limit

  /** Edge cap below which the BFS loops run driver-local: a fixture-scale
    * graph pays ~4 plan+job round-trips PER LEVEL in the distributed
    * loop (3-4 s for a 25-edge graph, round-6 WavePhase evidence) while a
    * collected adjacency map answers in microseconds. 10^5 edges bounds
    * the collect at a few MB; past it the Pregel-style loop stands. */
  private val SmallGraphEdges = 100000L

  def trace(spark: SparkSession, edges: DataFrame, root: String,
            target: String, maxDepth: Int = 64,
            localMaxEdges: Long = SmallGraphEdges): Seq[String] = {
    import spark.implicits._
    if (root == target) return Seq(root)
    if (localMaxEdges > 0 && smallGraph(edges, localMaxEdges)) {
      // driver-local BFS — SAME semantics as the distributed loop below:
      // backwards over incoming edges, per-level per-url minimum path
      // (all candidate paths at a level share a length, so the
      // lexicographic element-wise minimum is the identical tie-break),
      // visited set excludes re-expansion (cycle-safe).
      val in = edges.select("src", "dst").as[(String, String)].collect()
        .groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
      val pathOrd = Ordering.Implicits.seqOrdering[Seq, String]
      var frontier = Map(target -> Seq(target))
      val visited = scala.collection.mutable.Set(target)
      var depth = 0
      while (depth < maxDepth && frontier.nonEmpty) {
        depth += 1
        val next = scala.collection.mutable.Map.empty[String, Seq[String]]
        frontier.foreach { case (url, path) =>
          in.getOrElse(url, Array.empty[String]).foreach { src =>
            if (!visited.contains(src)) {
              val p = path :+ src
              next.get(src) match {
                case Some(old) if pathOrd.lteq(old, p) => ()
                case _ => next(src) = p
              }
            }
          }
        }
        next.get(root).foreach(p => return p.reverse)
        if (next.isEmpty) return Seq.empty
        visited ++= next.keys
        frontier = next.toMap
      }
      return Seq.empty
    }
    // per-level caches are released once superseded (a 64-level trace on a
    // long-lived session must not grow block-manager storage — round-2
    // verdict #3); the still-live pair is dropped on every exit path
    var liveVisited: DataFrame = null
    var liveLevel: DataFrame = null
    def release(): Unit = {
      if (liveVisited != null) liveVisited.unpersist(false)
      if (liveLevel != null) liveLevel.unpersist(false)
    }
    // BFS backwards from target via incoming edges, tracking the path
    var frontier = Seq((target, Seq(target))).toDF("url", "path")
    var visited = Seq(target).toDF("url").persist()
    liveVisited = visited
    var depth = 0
    while (depth < maxDepth) {
      depth += 1
      val next = frontier
        .join(edges, frontier("url") === edges("dst"))
        .select(col("src").as("url"),
          concat(col("path"), array(col("src"))).as("path"))
        .join(visited.withColumnRenamed("url", "v"), col("url") === col("v"), "left_anti")
      // deterministic per-url reduction: all candidate paths at a BFS
      // level share a length, so the lexicographically smallest path is a
      // total tie-break (min over the orderable array column)
      val dedup = next.groupBy("url").agg(min(col("path")).as("path")).persist()
      val hit = dedup.filter(col("url") === root).select("path")
        .as[Seq[String]].collect().headOption
      if (hit.isDefined) {
        val p = hit.get.reverse; dedup.unpersist(false); release(); return p
      }
      if (dedup.limit(1).count() == 0) {
        dedup.unpersist(false); release(); return Seq.empty
      }
      // localCheckpoint truncates visited's lineage so the superseded
      // level caches can actually be freed (a lazy union over every
      // previous level would re-pin them)
      visited = visited.unionByName(dedup.select("url")).localCheckpoint(true)
      release() // previous visited + previous level are superseded
      liveVisited = null // checkpointed, not cached
      liveLevel = dedup // materialized above; feeds the next level's join
      frontier = dedup
    }
    release()
    Seq.empty
  }

  /**
   * Link-analysis extension over the crawl graph (the natural next
   * question after A1's raw in-degree: popularity weighted by where the
   * links come from): fixed-iteration PageRank in INTEGER fixed-point
   * arithmetic. All math is long multiply/divide (`div` here ≡ DuckDB
   * `//` on non-negative operands), so the result is bit-identically
   * replayable in ANSI SQL — float PageRank can never be hash-oracled
   * because summation order perturbs ULPs. Per iteration:
   * rank'(v) = 0.15·scale + floor(0.85 · Σ_{u→v} floor(rank(u)/outdeg(u))),
   * the standard simplified recurrence (dangling mass not redistributed —
   * identical on both engines). Scale shape: each round is ONE dst-keyed
   * hash agg + two equi-joins on src (outdeg and rank both key-partitioned
   * with the edges — at 10^10 edges the rank join reuses the edges'
   * hash partitioning); per-round localCheckpoint keeps the plan O(1) in
   * iterations, the same discipline as Dedup.connectedComponents. Hot
   * dst keys (the home-page every page links to) are plain agg skew —
   * map-side partial aggregation absorbs them, no salting needed.
   */
  def pagerank(edges: DataFrame, iters: Int = 3,
               scale: Long = 1000000L): DataFrame = {
    val e = edges.select("src", "dst").distinct()
    val nodes = e.select(col("src").as("url"))
      .unionByName(e.select(col("dst").as("url"))).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("d"))
    var rank = nodes.withColumn("r", lit(scale))
    for (_ <- 1 to iters) {
      val contrib = e.join(outdeg, "src")
        .join(rank.select(col("url").as("src"), col("r").as("pr")), "src")
        .select(col("dst").as("url"), expr("pr div d").as("c"))
        .groupBy("url").agg(sum("c").as("c"))
      rank = nodes.join(contrib, Seq("url"), "left")
        .selectExpr("url",
          s"${scale * 15L / 100L}L + (85L * coalesce(c, 0L)) div 100L AS r")
        .localCheckpoint(true)
    }
    rank.select(col("url"), col("r").as("pagerank"))
      .orderBy(desc("pagerank"), asc("url"))
  }

  /**
   * G2 deepest_url (`web.py:106-114`): the URL furthest from root. One
   * multi-source BFS from root computing distances — O(depth) joins, not
   * O(N) traces like the reference.
   */
  def deepest(spark: SparkSession, edges: DataFrame, root: String,
              maxDepth: Int = 64,
              localMaxEdges: Long = SmallGraphEdges): (String, Int) = {
    import spark.implicits._
    if (localMaxEdges > 0 && smallGraph(edges, localMaxEdges)) {
      // driver-local multi-source BFS, same level semantics as below:
      // `last` = the ascending-minimum url of the deepest non-empty level
      val out = edges.select("src", "dst").as[(String, String)].collect()
        .groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._2) }
      var frontier = Set(root)
      val dist = scala.collection.mutable.Set(root)
      var depth = 0
      var last = (root, 0)
      while (depth < maxDepth && frontier.nonEmpty) {
        depth += 1
        val next = frontier.iterator
          .flatMap(u => out.getOrElse(u, Array.empty[String]))
          .filterNot(dist.contains).toSet
        if (next.isEmpty) return last
        last = (next.min, depth)
        dist ++= next
        frontier = next
      }
      return last
    }
    // superseded level/dist caches released per level (round-2 verdict #3)
    var liveLevel: DataFrame = null
    var dist = Seq((root, 0)).toDF("url", "d").localCheckpoint(true)
    var frontier = dist
    var depth = 0
    var last = (root, 0)
    while (depth < maxDepth) {
      depth += 1
      val next = frontier
        .join(edges, frontier("url") === edges("src"))
        .select(col("dst").as("url"), lit(depth).as("d"))
        .join(dist.select(col("url").as("v")), col("url") === col("v"), "left_anti")
        .distinct()
        .persist()
      val n = next.count()
      if (n == 0) {
        next.unpersist(false)
        if (liveLevel != null) liveLevel.unpersist(false)
        return last
      }
      last = next.orderBy(asc("url")).select("url", "d")
        .as[(String, Int)].head()
      // checkpoint truncates dist's lineage so old level caches free up
      dist = dist.unionByName(next.select("url", "d")).localCheckpoint(true)
      if (liveLevel != null) liveLevel.unpersist(false)
      liveLevel = next // materialized; feeds the next level's join
      frontier = next
    }
    if (liveLevel != null) liveLevel.unpersist(false)
    last
  }
}
