package graft.seenset

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/**
 * The URL-seen set at scale (SURVEY §4.4): an exact table (hash-partitioned
 * by canonical host) fronted by sketches.
 *
 * Dedup contract (J1, `spiderfetch.py:119` / `web.py:27-28`):
 *   new(candidates) = candidates \ seen      -- EXACT, via left-anti join.
 *
 * At 10^10 rows the anti-join shuffles the full candidate set against the
 * full seen table every wave; the sketch path cuts that:
 *   - bloom(mightContain = false)  -> definitely new, skips the join;
 *   - bloom-positives ("maybe seen", a small slice at low FPP) -> refined
 *     by the exact anti-join (the cuckoo-refinement stage of the north
 *     rule: false positives are recovered, exactness never depends on the
 *     sketch).
 *
 * The bloom is built/merged incrementally per wave (mergeInPlace of the
 * wave's additions) and serialized into the snapshot for resume.
 */
class SeenFilter(private var bloom: Option[BloomFilter]) extends Serializable {

  def isDefined: Boolean = bloom.isDefined

  /** Split candidates into (definitelyNew, maybeSeen) by the sketch. */
  def split(spark: SparkSession, candidates: DataFrame, urlCol: String)
      : (DataFrame, DataFrame) = bloom match {
    case None => (candidates.limit(0), candidates)
    case Some(bf) =>
      val b = spark.sparkContext.broadcast(bf)
      val might = udf((u: String) => b.value.mightContain(u))
      (candidates.filter(!might(col(urlCol))),
       candidates.filter(might(col(urlCol))))
  }

  /** Fold a wave's newly-seen URLs into the sketch. Fixed (expected, fpp)
    * parameters keep every wave's bloom merge-compatible. */
  def add(spark: SparkSession, added: DataFrame, urlCol: String): Unit = {
    val waveBloom = added.stat.bloomFilter(urlCol, SeenFilter.Expected, SeenFilter.Fpp)
    bloom match {
      case Some(bf) if bf.isCompatible(waveBloom) => bf.mergeInPlace(waveBloom)
      case Some(bf) => // unreachable with fixed params; never drop entries
        throw new IllegalStateException("incompatible bloom merge")
      case None => bloom = Some(waveBloom)
    }
  }

  /** Driver-side single insert (seed URL, redirect aliases). A URL missing
    * from the sketch would be an effective false-NEGATIVE — a correctness
    * bug, not a precision loss — so every seen insertion must land here. */
  def addOne(url: String): Unit = {
    if (bloom.isEmpty)
      bloom = Some(BloomFilter.create(SeenFilter.Expected, SeenFilter.Fpp))
    bloom.get.putString(url)
  }

  def serialized: Option[Array[Byte]] = bloom.map { bf =>
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos); bos.toByteArray
  }
}

object SeenFilter {
  val Expected: Long = 1L << 20
  val Fpp: Double = 0.03
  def empty: SeenFilter = new SeenFilter(None)
  def fromBytes(bytes: Array[Byte]): SeenFilter =
    new SeenFilter(Some(BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))))
}

object SeenSet {

  /**
   * Exact dedup: candidates not present in `seen`, sketch-accelerated.
   * Result preserves candidate columns; order restored by the caller's
   * sort on the ordering key (anti-join + union do not preserve order).
   */
  def filterNew(
      spark: SparkSession,
      candidates: DataFrame,
      seen: DataFrame,
      urlCol: String,
      sketch: Option[SeenFilter] = None): DataFrame = {
    val seenKeys = seen.select(col(urlCol))
    sketch.filter(_.isDefined) match {
      case Some(f) =>
        val (definitelyNew, maybeSeen) = f.split(spark, candidates, urlCol)
        definitelyNew.unionByName(
          maybeSeen.join(seenKeys, Seq(urlCol), "left_anti"))
      case None =>
        candidates.join(seenKeys, Seq(urlCol), "left_anti")
    }
  }
}
