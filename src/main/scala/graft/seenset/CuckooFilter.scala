package graft.seenset

/**
 * Compact cuckoo filter (Fan, Andersen, Kaminsky, Mitzenmacher, CoNEXT'14:
 * "Cuckoo Filter: Practically Better Than Bloom") — 4-slot buckets, 16-bit
 * fingerprints, partial-key cuckoo hashing (alt bucket = i XOR H(fp)).
 *
 * Role in the engine (SURVEY §4.4): second-level membership sketch for the
 * URL-seen set. Unlike Bloom it supports deletes (needed if seen entries
 * are ever evicted/compacted) and gives better space at low FPP. Exactness
 * of dedup NEVER depends on it — sketch positives are refined by the exact
 * left-anti join; the sketch only cuts shuffle volume.
 *
 * Serializable: ships to executors as a broadcast, persists in snapshots.
 */
final class CuckooFilter private (
    val numBuckets: Int,
    private val table: Array[Char], // numBuckets * 4 slots; 0 = empty
    private var count: Long) extends Serializable {

  import CuckooFilter._

  def size: Long = count

  private def indexOf(hash64: Long): Int = {
    val i = (hash64 & 0x7fffffffffffffffL) % numBuckets
    i.toInt
  }

  private def fingerprintOf(hash64: Long): Char = {
    val fp = ((hash64 >>> 32) & 0xffff).toChar
    if (fp == 0) 1.toChar else fp // 0 is the empty marker
  }

  private def altIndex(i: Int, fp: Char): Int = {
    val h = (fp * 0x5bd1e995) & 0x7fffffff
    ((i ^ h) % numBuckets + numBuckets) % numBuckets
  }

  private def bucketInsert(i: Int, fp: Char): Boolean = {
    val base = i * BucketSize
    var s = 0
    while (s < BucketSize) {
      if (table(base + s) == 0) { table(base + s) = fp; return true }
      s += 1
    }
    false
  }

  private def bucketContains(i: Int, fp: Char): Boolean = {
    val base = i * BucketSize
    var s = 0
    while (s < BucketSize) {
      if (table(base + s) == fp) return true
      s += 1
    }
    false
  }

  private def bucketDelete(i: Int, fp: Char): Boolean = {
    val base = i * BucketSize
    var s = 0
    while (s < BucketSize) {
      if (table(base + s) == fp) { table(base + s) = 0; return true }
      s += 1
    }
    false
  }

  def insert(item: String): Boolean = {
    val h = hash64(item)
    val fp = fingerprintOf(h)
    val i1 = indexOf(h)
    val i2 = altIndex(i1, fp)
    if (bucketInsert(i1, fp) || bucketInsert(i2, fp)) { count += 1; return true }
    // cuckoo kicking
    var i = if ((h & 1L) == 0L) i1 else i2
    var f = fp
    val rnd = new java.util.Random(h)
    var n = 0
    while (n < MaxKicks) {
      val slot = i * BucketSize + rnd.nextInt(BucketSize)
      val evicted = table(slot)
      table(slot) = f
      f = evicted
      i = altIndex(i, f)
      if (bucketInsert(i, f)) { count += 1; return true }
      n += 1
    }
    false // table full; caller falls back to exact path
  }

  def mightContain(item: String): Boolean = {
    val h = hash64(item)
    val fp = fingerprintOf(h)
    val i1 = indexOf(h)
    bucketContains(i1, fp) || bucketContains(altIndex(i1, fp), fp)
  }

  def delete(item: String): Boolean = {
    val h = hash64(item)
    val fp = fingerprintOf(h)
    val i1 = indexOf(h)
    val ok = bucketDelete(i1, fp) || bucketDelete(altIndex(i1, fp), fp)
    if (ok) count -= 1
    ok
  }

  /** Re-insert a stored fingerprint at bucket i (or its alternate) —
    * possible because the alternate index is derivable from (i, fp)
    * alone (partial-key cuckoo hashing). Used by merge. Falls back to
    * cuckoo kicking like a fresh insert: without it, merges overflow at
    * ~50% load and a size-adequate filter would spuriously fail. */
  private[seenset] def insertFingerprint(i0: Int, fp0: Char): Boolean = {
    if (bucketInsert(i0, fp0) || bucketInsert(altIndex(i0, fp0), fp0)) {
      count += 1; return true
    }
    var i = altIndex(i0, fp0)
    var f = fp0
    val rnd = new java.util.Random(fp0 * 0x9e3779b9L + i0)
    var n = 0
    while (n < MaxKicks) {
      val slot = i * BucketSize + rnd.nextInt(BucketSize)
      val evicted = table(slot)
      table(slot) = f
      f = evicted
      i = altIndex(i, f)
      if (bucketInsert(i, f)) { count += 1; return true }
      n += 1
    }
    false
  }

  /** Merge another filter of the SAME size by re-inserting its
    * fingerprints (alt-index math only holds across equal bucket counts).
    * Returns false if any insert failed (caller falls back to exact). */
  def mergeInPlace(other: CuckooFilter): Boolean = {
    require(other.numBuckets == numBuckets, "cuckoo merge: size mismatch")
    var ok = true
    var slot = 0
    while (slot < other.table.length) {
      val fp = other.table(slot)
      if (fp != 0) ok &= insertFingerprint(slot / BucketSize, fp)
      slot += 1
    }
    ok
  }

  def serialized: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + table.length * 2)
    bb.putInt(numBuckets); bb.putInt(0); bb.putLong(count)
    table.foreach(c => bb.putChar(c))
    bb.array()
  }
}

object CuckooFilter {
  val BucketSize = 4
  val MaxKicks = 500

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buckets = bb.getInt(); bb.getInt()
    val count = bb.getLong()
    val table = new Array[Char](buckets * BucketSize)
    var i = 0
    while (i < table.length) { table(i) = bb.getChar(); i += 1 }
    new CuckooFilter(buckets, table, count)
  }

  def create(expectedItems: Long): CuckooFilter = {
    // 95% target load factor for 4-slot buckets
    val buckets = math.max(4L, (expectedItems / (BucketSize * 0.95)).toLong + 1)
    val n = nextPowerOfTwo(buckets)
    new CuckooFilter(n.toInt, new Array[Char](n.toInt * BucketSize), 0L)
  }

  private def nextPowerOfTwo(x: Long): Long = {
    var v = 1L
    while (v < x) v <<= 1
    math.min(v, 1L << 28)
  }

  /** 64-bit FNV-1a (stable across JVMs — safe for persisted sketches). */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
