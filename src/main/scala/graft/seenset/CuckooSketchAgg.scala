package graft.seenset

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Distributed cuckoo-sketch construction as a typed `Aggregator` (SURVEY
 * §2.7 A5 / §4.4): builds the URL-seen cuckoo filter with map-side partial
 * aggregation — each partition fills its own filter, merge re-inserts
 * fingerprints (partial-key cuckoo hashing makes that size-stable).
 * Register with `udaf(...)` for `agg(cuckoo_sketch(col))`.
 */
class CuckooSketchAgg(expectedItems: Long)
    extends Aggregator[String, CuckooFilter, Array[Byte]] {

  override def zero: CuckooFilter = CuckooFilter.create(expectedItems)

  // The sketch's seen-set contract is NO false negatives: a silently
  // dropped insert would let a seen URL pass the sketch as "new". insert
  // and mergeInPlace both report overflow — fail loudly so the caller
  // re-sizes from observed counts instead of shipping a lying sketch.
  override def reduce(b: CuckooFilter, a: String): CuckooFilter = {
    if (!b.insert(a))
      throw new IllegalStateException(
        s"cuckoo filter over capacity at ${b.size} items — " +
          "size expectedItems from observed counts")
    b
  }

  override def merge(b1: CuckooFilter, b2: CuckooFilter): CuckooFilter = {
    val (into, from) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    if (!into.mergeInPlace(from))
      throw new IllegalStateException(
        s"cuckoo merge overflow at ${into.size} items — " +
          "size expectedItems from observed counts")
    into
  }

  override def finish(reduction: CuckooFilter): Array[Byte] =
    reduction.serialized

  override def bufferEncoder: Encoder[CuckooFilter] =
    Encoders.javaSerialization[CuckooFilter]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object CuckooSketchAgg {
  /** Column function: cuckooSketch(urlCol) -> serialized filter bytes. */
  def cuckooSketch(c: Column, expectedItems: Long = 1 << 20): Column =
    udaf(new CuckooSketchAgg(expectedItems)).apply(c)
}
