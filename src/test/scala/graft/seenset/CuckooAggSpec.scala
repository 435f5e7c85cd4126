package graft.seenset

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CuckooAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("distributed cuckoo sketch: partial+merge build, no false negatives") {
    val urls = (0 until 8000).map(i => s"http://host${i % 13}.test/p$i.html")
    val df = urls.toDF("url").repartition(6) // force multi-partition merge
    val bytes = df.agg(
      CuckooSketchAgg.cuckooSketch(col("url"), 16384).as("sk"))
      .select("sk").as[Array[Byte]].head()
    val cf = CuckooFilter.deserialize(bytes)
    assert(cf.size == 8000)
    urls.foreach(u => assert(cf.mightContain(u), s"false negative: $u"))
    val fp = (0 until 8000).count(i => cf.mightContain(s"http://other$i/x"))
    assert(fp < 400, s"fp=$fp")
  }

  test("overflow fails loudly — never a silent false-negative factory") {
    // undersized sketch: the aggregation must THROW (reduce-insert or
    // merge overflow), not drop fingerprints and report success
    val df = (0 until 50000).map(i => s"http://h$i.test/p$i").toDF("url")
      .repartition(8)
    val e = intercept[Exception] {
      df.agg(CuckooSketchAgg.cuckooSketch(col("url"), 64).as("sk"))
        .select("sk").as[Array[Byte]].head()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(c => Option(c.getMessage).exists(_.contains("capacity") ) ||
        Option(c.getMessage).exists(_.contains("overflow"))),
      s"expected a capacity/overflow failure, got: $e")
  }

  test("cuckoo merge re-inserts fingerprints exactly (serialize round-trip)") {
    val a = CuckooFilter.create(4096)
    val b = CuckooFilter.create(4096)
    (0 until 1000).foreach(i => a.insert(s"a$i"))
    (0 until 1000).foreach(i => b.insert(s"b$i"))
    assert(a.mergeInPlace(b))
    (0 until 1000).foreach { i =>
      assert(a.mightContain(s"a$i")); assert(a.mightContain(s"b$i"))
    }
    val rt = CuckooFilter.deserialize(a.serialized)
    assert(rt.size == a.size)
    (0 until 1000).foreach(i => assert(rt.mightContain(s"b$i")))
  }
}
