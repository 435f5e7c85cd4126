package graft.seenset

import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {

  test("cuckoo filter: no false negatives on inserted items") {
    val cf = CuckooFilter.create(10000)
    val items = (0 until 5000).map(i => s"http://host$i.test/p$i.html")
    items.foreach(u => assert(cf.insert(u)))
    items.foreach(u => assert(cf.mightContain(u), s"false negative: $u"))
  }

  test("cuckoo filter: low false-positive rate") {
    val cf = CuckooFilter.create(10000)
    (0 until 5000).foreach(i => cf.insert(s"in-$i"))
    val fp = (0 until 10000).count(i => cf.mightContain(s"out-$i"))
    assert(fp < 300, s"fp rate too high: $fp/10000") // ~1.6% expected at 16-bit fp
  }

  test("cuckoo filter: deletes recover slots (bloom cannot do this)") {
    val cf = CuckooFilter.create(1000)
    (0 until 500).foreach(i => cf.insert(s"u$i"))
    assert(cf.size == 500)
    (0 until 250).foreach(i => assert(cf.delete(s"u$i")))
    assert(cf.size == 250)
    (250 until 500).foreach(i => assert(cf.mightContain(s"u$i")))
  }

  test("cuckoo filter: stable FNV hash (persisted sketches survive JVMs)") {
    assert(CuckooFilter.hash64("http://h/x") == CuckooFilter.hash64("http://h/x"))
    assert(CuckooFilter.hash64("") == 0xcbf29ce484222325L)
  }

  test("cuckoo serialized size is capacity-determined (pins the q22 oracle)") {
    assert(CuckooFilter.create(16384).serialized.length == 65552)
  }

  test("property: inserted strings are always found (seeded random corpora)") {
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.asciiPrintableStr)
    val prop = org.scalacheck.Prop.forAll(gen) { xs =>
      val cf = CuckooFilter.create(math.max(xs.size * 2L, 64L))
      val inserted = xs.filter(cf.insert)
      inserted.forall(cf.mightContain)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }
}
