package graft.engine

import graft.model.{ErrorCode, Mode, RecipeRule}
import graft.urlcanon.{PyUrl, UrlRewrite}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.collection.mutable.ArrayBuffer

/**
 * Distributed redirect-chain resolution — the round-2 replacement for the
 * driver-side per-redirect loop (one full corpus scan + one seen-count job
 * PER HOP serialized the engine at a real web's 10-30% redirect rate).
 *
 * Reference semantics preserved exactly (`spiderfetch.py:87-102`,
 * `fetch.py:182-193`, `web.py:52-54`): a redirect record is a SEQUENCE
 * POINT — each hop's duplicate test observes every URL added by
 * earlier-seq records of the same wave (their discoveries AND their
 * aliases), aliases from hops before an abort persist, and a chain aborts
 * at the first hop whose target is already known (DuplicateUrlWarning),
 * rewrites to nothing (StopIteration), or leaves the host filter
 * (UrlRedirectsOffHost).
 *
 * Two phases, both distributed:
 *
 *  1. RESOLVE — chase `redirect_to` for ALL chains jointly, one iteration
 *     per hop LEVEL (like `trace` chases edges): jobs per wave scale with
 *     the longest chain (~2-3 on the real web), NOT with the number of
 *     redirect records. Hops carry a path array for same-chain cycle
 *     cutoff (the reference's dup test catches cycles; finite corpora
 *     guarantee termination).
 *
 *  2. SURVIVAL FIXPOINT — the sequential interleaving is computed
 *     analytically: a hop at chain position R is a duplicate iff its
 *     target is in the pre-wave seen set, was alias'd by a chain at
 *     position R' < R, or is really discovered at a position D < R
 *     ("really" = not suppressed by an alias at pos <= D). Dependencies
 *     flow strictly from lower to higher seq, so optimistic iteration
 *     converges (1 pass when no same-wave collision exists — the common
 *     case; bounded by the collision-dependency depth otherwise).
 */
/** One attempted redirect hop, pre-dup-analysis (resolver-internal row;
  * top-level so Catalyst codegen can reach the accessors). */
final case class SteppedHop(
    seq: Long, mode: Int, attempt: Int, hop: Int,
    from_url: String, to_url: String, to_host: String,
    rw_ok: Boolean, host_ok: Boolean, cycle: Boolean, path: Seq[String])

object RedirectResolver {

  /** Safety cap on chain length. The reference loops until the dup check
    * fires; in a finite corpus a chain either terminates or cycles (cut
    * by the path check), so this cap is unreachable except for
    * pathological megachains — fail loudly rather than loop. */
  val MaxHops = 1000
  private val MaxFixpointIters = 50

  final case class Analysis(
      /** Per chain: seq, mode, retry, attempt, wave, origin_url,
        * origin_canonical, origin_host, aborted, final_url, final_outcome. */
      finals: DataFrame,
      /** Valid alias events (== fetched hops): pos(seq), hop, alias_url,
        * alias_host, origin_url, mode, attempt, to_outcome. */
      validHops: DataFrame,
      /** Full qualified candidate set: non-redirect ∪ surviving chains. */
      candidates: DataFrame,
      /** min alias pos per url (for discovery suppression). */
      aliasMin: DataFrame,
      /** Frames this analysis persisted — the engine registers them in
        * its pin ledger and releases them once the wave's outputs are
        * materialized (round-2 advice #1). */
      persisted: Seq[DataFrame])

  /**
   * @param redirects     joined frontier rows with outcome REDIRECT
   *                      (url, canonicalUrl, host, mode, wave, seq, retry,
   *                      attempt, redirect_to, ...)
   * @param candidateFn   (parent_seq, doc_id, spans) -> qualified candidates
   * @param nonRedirectCands qualified candidates of the batch's
   *                      non-redirect SPIDER successes
   * @param tries         in-fetch temporal retry budget (CrawlConfig.tries)
   */
  def analyze(
      spark: SparkSession,
      redirects: DataFrame,
      corpusN: DataFrame,
      seenPre: DataFrame,
      rule: RecipeRule,
      hostFilterEnabled: Boolean,
      candidateFn: DataFrame => DataFrame,
      nonRedirectCands: DataFrame,
      tries: Int = 1,
      small: Boolean = false): Analysis = {
    import spark.implicits._

    val keep = ArrayBuffer.empty[DataFrame]
    // SMALL-batch regime (round-6, verdict #1): the WavePhase timers put
    // ~40% of the fixture-crawl steady floor inside this one call, and
    // seven eighths of THAT is driver-side plan construction/analysis —
    // the fixpoint re-embeds the full candidate tree (extract + rewrite +
    // qualify) into every newAbort/diff plan it builds. For a batch the
    // engine already ranks driver-side (<= SmallRankRows), truncate the
    // shared subtrees with eager localCheckpoints (one cheap interpreted
    // job each) so every downstream construction analyzes a leaf, and
    // run the abort-set stability compare on collected rows (the abort
    // set is bounded by the batch's redirect count) instead of a
    // full-outer-join diff plan per iteration. Big batches keep the
    // all-distributed shapes — checkpointing a 10^8-row candidate set
    // eagerly would be real I/O, and the diff join stays O(chains).
    def trunc(df: DataFrame): DataFrame =
      if (small) df.localCheckpoint(true)
      else { val p = df.persist(); keep += p; p }

    // ---------------------------------------------------- phase 1: RESOLVE
    val hostFilter = rule.hostFilter
    val hfEnabled = hostFilterEnabled

    var cur = redirects.select(
      col("seq"), col("mode"), col("attempt"), col("url").as("from_url"),
      col("redirect_to").as("loc"), array(col("url")).as("path"),
      lit(0).as("hop"))
    val levels = ArrayBuffer.empty[DataFrame]
    var more = true
    var level = 0
    while (more) WavePhase.time(spark, "rr_level") {
      level += 1
      if (level > MaxHops)
        throw new IllegalStateException(s"redirect chain longer than $MaxHops")
      // pure per-row hop: Location join (fetch.py:192) + reference-exact
      // rewrite (F1-F7) + host filter — typed map, no driver involvement
      val stepped = cur
        .select("seq", "mode", "attempt", "from_url", "loc", "path", "hop")
        .as[(Long, Int, Int, String, String, Seq[String], Int)]
        .map { case (seq, mode, attempt, from, loc, path, hop) =>
          val raw = PyUrl.urljoin(from, loc)
          val to = UrlRewrite.rewriteOne(from, raw).orNull
          val hostOk = to == null || !hfEnabled ||
            PyUrl.getHostname(to) == hostFilter
          SteppedHop(seq, mode, attempt, hop + 1, from, to,
            if (to == null) null else UrlRewrite.canonicalHost(to),
            rw_ok = to != null, host_ok = hostOk,
            cycle = to != null && path.contains(to),
            path = if (to == null) path else path :+ to)
        }.toDF
      val hopJoined = stepped
        .join(corpusN, col("to_url") === col("doc_id"), "left")
        // resume state applies at the record's origin fetch, not mid-chain
        .withColumn("_resume_err", lit(null).cast("int"))
        .withColumn("to_outcome", CrawlEngine.outcomeCol(tries))
        // hop target's content length + fail_attempts ride along for the
        // wave's bytes metric and the per-launch fetch-log expansion
        .withColumn("to_len", CrawlEngine.contentLenCol)
        .withColumn("to_fail", coalesce(col("fail_attempts"), lit(0)))
      val hopJoinedM = trunc(hopJoined)
      levels += hopJoinedM.select("seq", "mode", "attempt", "hop", "from_url",
        "to_url", "to_host", "rw_ok", "host_ok", "cycle", "to_outcome",
        "to_len", "to_fail")
      cur = hopJoinedM
        .filter(col("rw_ok") && col("host_ok") && !col("cycle") &&
          col("to_outcome") === ErrorCode.REDIRECT)
        .select(col("seq"), col("mode"), col("attempt"),
          col("to_url").as("from_url"), col("redirect_to").as("loc"),
          col("path"), col("hop"))
      more = cur.limit(1).count() > 0
    }
    val hops = WavePhase.time(spark, "rr_static") {
      if (small) levels.reduce(_ unionByName _)
      else { val p = levels.reduce(_ unionByName _).persist(); keep += p; p }
    }

    // static abort conditions: rewrite fail (StopIteration analogue),
    // off-host, same-chain cycle, target already in the pre-wave seen set
    val seenMark = seenPre.select(col("url").as("to_url"), lit(true).as("_in_seen"))
    val hopsF = WavePhase.time(spark, "rr_static") {
      if (small)
        hops.join(seenMark, Seq("to_url"), "left")
          .withColumn("_static_bad",
            !col("rw_ok") || !col("host_ok") || col("cycle") ||
              coalesce(col("_in_seen"), lit(false)))
          .localCheckpoint(true)
      else {
        val p = hops.join(seenMark, Seq("to_url"), "left")
          .withColumn("_static_bad",
            !col("rw_ok") || !col("host_ok") || col("cycle") ||
              coalesce(col("_in_seen"), lit(false)))
          .persist()
        keep += p
        p
      }
    }

    // -------------------------------------- phase 2: SURVIVAL FIXPOINT
    // abort-set materialization: small batches collect it (bounded by the
    // batch's redirect count) so stability is a driver-side map compare
    // and downstream joins see a LocalRelation leaf; big batches persist.
    def abortState(df: DataFrame): (DataFrame, Option[Map[Long, Int]]) =
      if (small) {
        val m = df.collect()
          .map(r => r.getLong(0) -> r.getAs[Number](1).intValue).toMap
        (m.toSeq.toDF("seq", "abort_hop"), Some(m))
      } else { val p = df.persist(); keep += p; (p, None) }
    var (abort, abortMap) = abortState(hopsF.filter(col("_static_bad"))
      .groupBy("seq").agg(min("hop").as("abort_hop")))

    val finalsBase = redirects.select(
      col("seq"), col("mode"), col("retry"), col("attempt"), col("wave"),
      col("url").as("origin_url"), col("canonicalUrl").as("origin_canonical"),
      col("host").as("origin_host"))
    val terminal = {
      val w = Window.partitionBy(col("seq")).orderBy(col("hop").desc)
      hops.withColumn("_rk", row_number().over(w)).filter(col("_rk") === 1)
        .select(col("seq"), col("hop").as("_term_hop"),
          col("to_url").as("_term_url"), col("to_outcome").as("_term_outcome"))
    }

    def buildState(abortDf: DataFrame)
        : (DataFrame, DataFrame, DataFrame, DataFrame) =
        WavePhase.time(spark, "rr_buildstate") {
      val finals = finalsBase
        .join(terminal, Seq("seq"))
        .join(abortDf, Seq("seq"), "left")
        .withColumn("aborted", col("abort_hop").isNotNull)
        .withColumn("final_url",
          when(col("aborted"), lit(null)).otherwise(col("_term_url")))
        .withColumn("final_outcome",
          when(col("aborted"), lit(null)).otherwise(col("_term_outcome")))
        .drop("_term_hop", "_term_url", "_term_outcome")
      // hops the sequential loop actually reached = fetched = alias'd
      // (addRef fires for exactly the targets that then get fetched)
      val validHops = hopsF.join(abortDf, Seq("seq"), "left")
        .filter(col("abort_hop").isNull || col("hop") < col("abort_hop"))
        .join(finalsBase.select(col("seq"), col("origin_url"), col("retry")),
          Seq("seq"))
        .select(col("seq").as("pos"), col("hop"), col("to_url").as("alias_url"),
          col("to_host").as("alias_host"), col("origin_url"), col("mode"),
          col("attempt"), col("retry"), col("to_outcome"), col("to_len"),
          col("to_fail"))
      val chainSpiderDocs = finals
        .filter(!col("aborted") && col("mode") === Mode.SPIDER &&
          col("final_outcome") === ErrorCode.NONE)
        .join(corpusN, col("final_url") === col("doc_id"))
        .select(col("seq").as("parent_seq"), col("doc_id"), col("spans"))
      val allCands = trunc(
        nonRedirectCands.unionByName(candidateFn(chainSpiderDocs)))
      val aliasMin = validHops.groupBy(col("alias_url").as("url"))
        .agg(min("pos").as("_apos"))
      (finals, validHops, allCands, aliasMin)
    }

    var iter = 0
    var stable = false
    var state = buildState(abort)
    while (!stable) WavePhase.time(spark, "rr_fixpoint") {
      iter += 1
      if (iter > MaxFixpointIters)
        throw new IllegalStateException("redirect survival fixpoint diverged")
      val (_, _, allCands, aliasMin) = state
      // D map: first-wins discovery position per candidate url, minus
      // pre-wave seen, minus alias-suppressed (alias pos <= discovery pos
      // puts the url in the web before its would-be discovery)
      val w = Window.partitionBy(col("url"))
        .orderBy(col("parent_seq"), col("extract_idx"))
      val firstWins = allCands
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      val dReal = firstWins
        .join(seenPre.select(col("url")), Seq("url"), "left_anti")
        .join(aliasMin, Seq("url"), "left")
        .filter(col("_apos").isNull || col("_apos") > col("parent_seq"))
        .select(col("url").as("to_url"), col("parent_seq").as("_dpos"))
      val (newAbort, newMap) = abortState(hopsF
        .join(aliasMin.withColumnRenamed("url", "to_url"), Seq("to_url"), "left")
        .join(dReal, Seq("to_url"), "left")
        .filter(col("_static_bad") ||
          col("_apos") < col("seq") || col("_dpos") < col("seq"))
        .groupBy("seq").agg(min("hop").as("abort_hop")))
      stable = (abortMap, newMap) match {
        case (Some(a), Some(b)) => a == b
        case _ =>
          val diff = abort.withColumnRenamed("abort_hop", "_a1")
            .join(newAbort.withColumnRenamed("abort_hop", "_a2"),
              Seq("seq"), "full")
            .filter(!(col("_a1") <=> col("_a2")))
          diff.limit(1).count() == 0
      }
      abort = newAbort
      abortMap = newMap
      if (!stable) state = buildState(abort)
    }

    val (finals, validHops, allCands, aliasMin) = state
    Analysis(finals, validHops, allCands, aliasMin, keep.toSeq)
  }
}
