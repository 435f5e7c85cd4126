package graft.seenset

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The adaptive per-host-partition bloom bank (SURVEY §4.4 / round-1
 * verdict #3): capacity grows from observed counts via rebuildFrom, so a
 * 10^7-row seen set keeps FPP low where a fixed 2^20 sizing would
 * saturate — and membership NEVER false-negatives (the correctness
 * contract: a missed member would re-enqueue a seen URL).
 */
class BloomBankSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def urls(lo: Long, hi: Long) = spark.range(lo, hi).select(
    concat(lit("http://host"), pmod(col("id"), lit(991)),
      lit(".test/p"), col("id"), lit(".html")).as("url"),
    concat(lit("host"), pmod(col("id"), lit(991)), lit(".test")).as("host"))

  test("10^7-row seen set: adaptive rebuild, FPP < 5%, zero false negatives") {
    val n = 10000000L
    val seen = urls(0, n)
    val sketch = SeenFilter.empty
    // undersized initial shards -> saturation flagged -> rebuild sized
    // from observed shard counts
    sketch.add(spark, seen, "url", "host")
    assert(sketch.needsRebuild, "10^7 rows must saturate the 2^16 initial shards")
    sketch.rebuildFrom(spark, seen, "url", "host")
    assert(!sketch.needsRebuild)

    // zero false negatives on a member sample (correctness contract)
    val members = urls(0, n).filter(pmod(xxhash64(col("url")), lit(97)) === 0)
      .limit(100000)
    val (defNewM, _) = sketch.split(spark, members, "url", "host")
    assert(defNewM.count() == 0, "sketch false negative: member classified new")

    // FPP on disjoint probes
    val probes = urls(n, n + 100000L)
    val (defNewP, maybeP) = sketch.split(spark, probes, "url", "host")
    val fp = maybeP.count().toDouble / (defNewP.count() + maybeP.count())
    assert(fp < 0.05, s"FPP too high after rebuild: $fp")
  }

  test("snapshot round-trip preserves the bank exactly") {
    val seen = urls(0, 50000)
    val sketch = SeenFilter.empty
    sketch.add(spark, seen, "url", "host")
    val rt = SeenFilter.fromBytes(sketch.serialized.get)
    val (defNew, _) = rt.split(spark, seen, "url", "host")
    assert(defNew.count() == 0, "round-tripped bank lost members")
  }

  test("driver-side addOne lands in the right shard") {
    val sketch = SeenFilter.empty
    sketch.addOne("http://solo.test/x", "solo.test")
    val one = Seq(("http://solo.test/x", "solo.test")).toDF("url", "host")
    val (defNew, maybe) = sketch.split(spark, one, "url", "host")
    assert(defNew.count() == 0 && maybe.count() == 1)
  }
}
