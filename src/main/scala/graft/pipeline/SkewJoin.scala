package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit salted-key skew mitigation for equi-joins on a hot-keyed fact
 * table (SURVEY §2: the skew lever the frontier scheduler applies to hot
 * hosts — Scheduler.scala — exposed as a standalone relational operator).
 *
 * The problem at 100 TB: a shuffle join hash-partitions both sides on the
 * key, so a heavy-hitter key (one host with 10^8 queued URLs, one user
 * with 10^8 events) lands its ENTIRE payload in one reducer task — the
 * stage runs at the speed of that one straggler no matter how many
 * executors exist. Spark's AQE skew-join splits oversized partitions at
 * runtime, but only for sort-merge joins and only per-partition (a single
 * monster KEY inside a partition still can't be split without replicating
 * its join counterpart). Salting fixes it structurally:
 *
 *  1. identify the heavy-hitter keys — top `hotK` by fact-side count, a
 *     slim (key-only) aggregation whose result is tiny by construction
 *     (at 100 TB the same list comes from a sample or a count-min sketch;
 *     a key hot enough to matter is visible in any sample);
 *  2. broadcast the hot-key list and tag both sides with a salt column:
 *     hot FACT rows get a deterministic per-row salt in [0, salts),
 *     hot DIM rows are replicated once per salt (explode), cold rows on
 *     both sides get salt 0 — so only the handful of hot dim rows are
 *     replicated, not the dim table;
 *  3. join on (key, salt): ONE shuffle join, one scan per side, and the
 *     monster key's rows now spread over `salts` reducers.
 *
 * Inner-join semantics are exactly preserved: a hot fact row carries one
 * salt and matches exactly the one dim replica with that salt; cold rows
 * pair on salt 0. The salt is dropped before returning, so the result is
 * row-for-row the plain join (PipelineSpec pins multiset equality; the
 * driver oracle for q53 is the unsalted join in ANSI SQL).
 */
object SkewJoin {

  /**
   * Salted inner equi-join of `fact` and `dim` on `factKey == dimKey`.
   *
   * @param factSaltSrc deterministic per-row expression salting hot fact
   *                    rows (e.g. a row id); hashed into [0, salts).
   * @param hotK        how many heavy-hitter keys to salt (ties broken by
   *                    key value, so the hot set is deterministic).
   * @param salts       fan-out per hot key — sized so a hot key's rows
   *                    divided by `salts` fit one reducer's budget.
   * @param strategy    optional join-strategy hint for the salted join
   *                    ("merge" / "shuffle_hash"). Salting only matters
   *                    when the dim side is too big to broadcast — at
   *                    fixture scale Catalyst would broadcast it and
   *                    bypass the shuffle being demonstrated, so q53 pins
   *                    the 100-TB strategy explicitly (same honesty device
   *                    as q49's merge hint).
   */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      factSaltSrc: Column, hotK: Int, salts: Int,
      strategy: Option[String] = None): DataFrame = {
    require(salts > 0 && hotK >= 0, s"bad knobs: hotK=$hotK salts=$salts")
    val hot = fact.groupBy(factKey).agg(count(lit(1)).as("__n"))
      .orderBy(desc("__n"), col(factKey))
      .limit(hotK)
      .select(col(factKey).as("__hot"))
    val hotB = broadcast(hot)

    val factS = fact
      .join(hotB, col(factKey) === col("__hot"), "left_outer")
      .withColumn("__fsalt",
        when(col("__hot").isNotNull,
          pmod(xxhash64(factSaltSrc), lit(salts.toLong)))
          .otherwise(lit(0L)))
      .drop("__hot")
    val dimS = dim
      .join(hotB, col(dimKey) === col("__hot"), "left_outer")
      .withColumn("__dsalt",
        explode(when(col("__hot").isNotNull,
          sequence(lit(0L), lit(salts.toLong - 1L)))
          .otherwise(array(lit(0L)))))
      .drop("__hot")

    // hint rides the dim side: for shuffle_hash the hinted side is the
    // build side, and the hash table must come from the (replicated but
    // still small-per-reducer) dim rows, never from the fact side
    val dimH = strategy.fold(dimS)(dimS.hint(_))
    factS
      .join(dimH,
        col(factKey) === col(dimKey) && col("__fsalt") === col("__dsalt"))
      .drop("__fsalt", "__dsalt")
  }
}
