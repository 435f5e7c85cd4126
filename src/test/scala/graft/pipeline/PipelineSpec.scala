package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("tokenCount / bpeTokenEstimate / langId column semantics") {
    val df = Seq(
      (1L, "the cat and the hat of oz"),
      (2L, "der hund und die katze der"),
      (3L, ""),
      (4L, "  spaced   out  ")).toDF("id", "text")
      .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      .withColumn("n_bpe", TextAnalysis.bpeTokenEstimate(col("text")))
      .withColumn("lang", TextAnalysis.langId(col("text")))
    val rows = df.orderBy("id")
      .select("n_tok", "lang").as[(Long, String)].collect.toSeq
    assert(rows.map(_._1) == Seq(7L, 6L, 0L, 2L))
    assert(rows(0)._2 == "en")
    assert(rows(1)._2 == "de")
    assert(rows(2)._2 == "und")
  }

  test("quality score: word-like text beats punctuation walls") {
    val df = Seq(
      (1L, "a sensible sentence with ordinary words flowing along nicely"),
      (2L, "!!!???;;;...,,,!!!???;;;...,,,")).toDF("doc_id", "text")
    val s = TextAnalysis.qualityScore(df)
      .orderBy("doc_id").select("quality_score").as[Double].collect
    assert(s(0) > s(1))
    assert(s.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("exact dedup: duplicates collapse to min id; survivors first-wins") {
    val df = Seq(
      (10L, "same text here"), (3L, "same   TEXT here "), (5L, "unique one")
    ).toDF("doc_id", "text")
    val groups = Dedup.exact(df).orderBy("keep_id")
      .select("keep_id", "group_size").as[(Long, Long)].collect.toSeq
    assert(groups == Seq((3L, 2L), (5L, 1L)))
    val surv = Dedup.exactSurvivors(df).select("doc_id").as[Long].collect.toSet
    assert(surv == Set(3L, 5L))
  }

  test("shingles + jaccard kernel") {
    val df = Seq((1L, "abcdef"), (2L, "abcdeg")).toDF("id", "text")
      .withColumn("sh", Dedup.shingles(col("text"), 3))
    val j = df.as("a").crossJoin(df.as("b"))
      .filter($"a.id" === 1 && $"b.id" === 2)
      .select(Dedup.jaccard($"a.sh", $"b.sh")).as[Double].head()
    // shingles(abcdef,3) = {abc,bcd,cde,def}; (abcdeg) = {abc,bcd,cde,deg}
    assert(math.abs(j - 3.0 / 5.0) < 1e-9)
  }

  test("minhash-LSH finds the planted near-duplicate pair only") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val nearDup = base.replace("lazy", "sleepy")
    val docs = Seq(
      (1L, base), (2L, nearDup),
      (3L, "completely different content about spark shuffles and parquet"),
      (4L, "yet another unrelated document mentioning minhash banding"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 5, k = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect.toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash rejoin regimes (slim two-phase vs coalesced) are bit-identical") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def run(minDocs: Long) =
      Dedup.minhashLshPairs(graft.Queries.withPlantedDups(docs),
        "doc_id", "text", shingleN = 5, k = 120, bands = 24,
        threshold = 0.6, slimRejoinMinDocs = minDocs)
        .orderBy("id_a", "id_b")
        .as[(Long, Long, Double)].collect.toSeq
    val slim = run(0L)            // force the large-corpus two-phase shape
    val coalesced = run(Long.MaxValue) // force the small-corpus shape
    assert(slim.nonEmpty && slim == coalesced)
  }

  test("simhash: identical=0 distance, near-dup small, different large") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "totally different words nothing shared at all here"))
      .toDF("id", "text").withColumn("s", Dedup.simhash(col("text")))
    val s = df.orderBy("id").select("s").as[Long].collect
    assert(java.lang.Long.bitCount(s(0) ^ s(1)) <
      java.lang.Long.bitCount(s(0) ^ s(2)))
    val pairs = Dedup.simhashPairs(
      Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "x y z q"))
        .toDF("id", "text"), "id", "text", maxDistance = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect.toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("brute-force cosine top-k on real embeddings; self is rank 1") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.orderBy("vec_id").select("embedding")
      .as[Seq[Float]].head()
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .as[(Long, Double)].collect.toSeq
    assert(top.head._1 == 0L && math.abs(top.head._2 - 1.0) < 1e-4)
    assert(top.map(_._2) == top.map(_._2).sorted.reverse)
  }

  test("IVF ANN with k-means refinement: recall@10 >= 0.9 at nprobe 6/16") {
    // round-1 verdict #10: first-k-by-id "centroids" made recall
    // data-order luck; two Lloyd passes must reach recall@10 >= 0.9
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    val q = emb.orderBy("vec_id").select("embedding").as[Seq[Float]].head()
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect.toSet
    val approx = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10,
      cells = 16, nprobe = 6, iters = 2).select("vec_id").as[Long].collect.toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
    // and the probe prunes: scanned candidates well under the full table
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 16, 2)
    val scanned = Similarity.withIvfCell(emb, "embedding", cents)
      .groupBy("cell").count().orderBy(desc("count")).limit(6)
      .agg(sum("count")).as[Long].head()
    assert(scanned < emb.count(), s"scanned $scanned")
  }

  test("winnowing fingerprints: copied content shares fingerprints, disjoint doesn't") {
    import graft.pipeline.TextAnalysis
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the forest while the hunters sleep soundly at home"
    val docs = Seq(
      (1L, base),
      (2L, base + " with a freshly appended tail of new words"),
      (3L, "completely unrelated content about spark catalyst optimizer " +
        "rules and whole stage codegen internals nothing shared at all"))
      .toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
      TextAnalysis.winnowFingerprints(col("text")).as("fp"))
      .as[(Long, Seq[String])].collect().toMap
    def overlap(a: Long, b: Long): Double =
      fps(a).toSet.intersect(fps(b).toSet).size.toDouble / fps(a).size
    // doc 2 contains doc 1 verbatim: winnowing guarantees shared
    // fingerprints for every shared window (>= k+w-1 chars)
    assert(overlap(1, 2) >= 0.8, s"near-copy overlap ${overlap(1, 2)}")
    assert(overlap(1, 3) <= 0.1, s"disjoint overlap ${overlap(1, 3)}")
    // deterministic (pure column expression)
    val again = docs.select(col("doc_id"),
      TextAnalysis.winnowFingerprints(col("text")).as("fp"))
      .as[(Long, Seq[String])].collect().toMap
    assert(again == fps)
  }

  test("hot-bucket cap: 10^5 identical docs do not go quadratic") {
    // a degenerate band key (boilerplate/empty docs) must stay bounded:
    // bucketCap keeps the C lowest ids per bucket -> C*(C-1)/2 pairs, not
    // n^2/2 (round-1 verdict #6)
    val n = 100000
    val docs = spark.range(n).select(col("id").as("doc_id"),
      lit("identical boilerplate page content repeated everywhere").as("text"))
    val cap = 64
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 5, k = 64, bands = 16, threshold = 0.9, bucketCap = cap)
    val nPairs = pairs.count()
    assert(nPairs == cap.toLong * (cap - 1) / 2,
      s"expected capped pair count, got $nPairs")
    // kept members pair with each other (identical docs share ALL buckets)
    val ids = pairs.select("id_a").as[Long].collect.toSet
    assert(ids.subsetOf((0L until cap.toLong).toSet))
  }

  test("connected components: driver-local union-find == distributed " +
      "min-label loop (chains, cliques, singleton pairs)") {
    // chain 1-2-3-4, clique 10-11-12, pair 20-21, cross-orientation edges
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (12L, 10L),
      (11L, 12L), (21L, 20L)).toDF("a", "b")
    val local = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toSet
    val dist = Dedup.connectedComponents(pairs, "a", "b",
        localMaxEdges = 0)
      .as[(Long, Long)].collect().toSet
    assert(local == dist)
    assert(local == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L)))
  }

  test("word-ngram kernel == column expression (q79's typed source)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(60)
    val viaExpr = docs.select(col("doc_id"),
      TextAnalysis.wordNgrams(TextAnalysis.tokens(col("text")), 8).as("gs"))
      .as[(Long, Seq[String])].collect().toMap
    val viaKernel = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> Dedup.wordNgramList(t, 8).toSeq }.toMap
    assert(viaKernel == viaExpr)
    Seq("", "short text", "a b c d e f g h i") foreach { t =>
      val e = spark.createDataset(Seq(t)).toDF("text")
        .select(TextAnalysis.wordNgrams(TextAnalysis.tokens(col("text")), 8))
        .as[Seq[String]].head()
      assert(Dedup.wordNgramList(t, 8).toSeq == e, s"text='$t'")
    }
  }

  test("word-shingle kernel == column expression (q76's typed source)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(60)
    val viaExpr = docs.select(col("doc_id"),
      Dedup.wordShingles(col("text"), 3).as("gs"))
      .as[(Long, Seq[String])].collect().toMap
    val viaKernel = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> Dedup.wordShingleSet(t, 3).toSeq }.toMap
    assert(viaKernel == viaExpr)
    Seq("", "one", "a b", "a b c d") foreach { t =>
      val e = spark.createDataset(Seq(t)).toDF("text")
        .select(Dedup.wordShingles(col("text"), 3))
        .as[Seq[String]].head()
      assert(Dedup.wordShingleSet(t, 3).toSeq == e, s"text='$t'")
    }
  }

  test("winnow kernel == column expression: bit-identical fingerprints " +
      "on the corpus (q25's typed-map rewrite)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(60)
    val viaExpr = docs.select(col("doc_id"),
      TextAnalysis.winnowFingerprints(col("text")).as("fp"))
      .as[(Long, Seq[String])].collect().toMap
    val viaKernel = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> TextAnalysis.winnowKernel(t).toSeq }.toMap
    assert(viaKernel == viaExpr)
    // edge shapes the expression defines: empty and shorter-than-k text
    Seq("", "ab", "exactly8") foreach { t =>
      val e = spark.createDataset(Seq(t)).toDF("text")
        .select(TextAnalysis.winnowFingerprints(col("text")))
        .as[Seq[String]].head()
      assert(TextAnalysis.winnowKernel(t).toSeq == e, s"text='$t'")
    }
  }

  test("q106 corpus-side hot-bucket cap: keeps lowest ids, does not bite " +
      "at the driver's SFs (round-5 verdict #5)") {
    // unit contract: capBuckets keeps exactly the `cap` lowest ids per key
    val banded = spark.range(100).select(lit(1L).as("bucket"), col("id"))
    val capped = Dedup.capBuckets(banded, Seq("bucket"), "id", 8)
      .select("id").as[Long].collect.toSet
    assert(capped == (0L until 8L).toSet, s"capped set was $capped")
    // the production cap (4096) must be a pure scale guard at test SFs:
    // the hottest corpus-side SRP bucket sits far below it, so q106's
    // output — and the FROZEN DuckDB oracle — is byte-identical
    val path = s"$sf/embeddings.parquet"
    val emb = spark.read.parquet(path)
    val n = graft.tableio.ParquetStats.rowCount(spark, path)
    val bits = math.max(6,
      (math.log(n.toDouble + 1) / math.log(2)).ceil.toInt - 3)
    val planes = Similarity.md5Planes(bits, 64, seed = 7L)
    val hottest = Similarity.withPlaneBucket(emb, "embedding", planes)
      .filter(col("vec_id") % 50 =!= 0)
      .groupBy("bucket").count().agg(max("count")).as[Long].head()
    assert(hottest < 4096,
      s"cap would bite at test scale (hottest bucket $hottest) — " +
        "the frozen oracle does not replay the cap, results would diverge")
  }

  test("hyperplane LSH top-k returns plausible neighbors (bucketed path)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
    val q = emb.orderBy("vec_id").select("embedding").as[Seq[Float]].head()
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", q, 10,
      bits = 6, multiprobe = 6).as[(Long, Double)].collect.toSeq
    assert(approx.nonEmpty && approx.head._1 == 0L) // self lands in own bucket
  }

  test("repetition metrics: max token run, n-grams, flag semantics") {
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (1L, "a b c d"),                  // no repetition
      (2L, "spam spam spam spam end"),  // run of 4, heavy bigram
      (3L, "x"),                        // single token: no bigrams
      (4L, ""))                         // empty
      .toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
    val runs = toks.select(col("doc_id"),
      TextAnalysis.maxTokenRun(col("ts")).as("r"))
      .as[(Long, Int)].collect.toMap
    assert(runs == Map(1L -> 1, 2L -> 4, 3L -> 1, 4L -> 0))
    val grams = toks.select(col("doc_id"),
      TextAnalysis.wordNgrams(col("ts"), 2).as("g"))
      .as[(Long, Seq[String])].collect.toMap
    assert(grams(1L) == Seq("a b", "b c", "c d"))
    assert(grams(2L).count(_ == "spam spam") == 3)
    assert(grams(3L).isEmpty && grams(4L).isEmpty)
  }

  test("contamination join broadcasts the benchmark gram set") {
    val p = graft.Queries.q30Contamination(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"benchmark grams must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("md5 hyperplanes: DuckDB-pinned value, range, determinism (q28 oracle contract)") {
    // ('0x'||substr(md5('7:0:0'),1,15))::BIGINT::DOUBLE / 2^59 - 1.0
    // evaluated in DuckDB = -0.8649490801517901; the Scala generator must
    // produce the SAME double or the q28 oracle replay drifts.
    val p = Similarity.md5Planes(2, 3, 7L)
    assert(p(0)(0) == -0.8649490801517901, s"got ${p(0)(0)}")
    assert(p.flatten.forall(v => v >= -1.0 && v < 1.0))
    assert(Similarity.md5Planes(2, 3, 7L).map(_.toSeq).toSeq ==
      p.map(_.toSeq).toSeq)
    // distinct components (md5 of distinct inputs)
    assert(p.flatten.distinct.length == 6)
  }

  test("lshTopK with md5 planes (q28 path): self lands in its own bucket") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.orderBy("vec_id").select("embedding").as[Seq[Float]].head()
    val n = graft.tableio.ParquetStats.rowCount(spark, s"$sf/embeddings.parquet")
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", q, 10,
      n = n, hashPlanes = true).as[(Long, Double)].collect.toSeq
    assert(approx.nonEmpty && approx.head._1 == 0L)
    assert(approx.map(_._2) == approx.map(_._2).sorted.reverse)
  }

  test("embedding near-dup via LSH buckets finds planted duplicate vector") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val v0 = emb.orderBy("vec_id").select("embedding").as[Seq[Float]].head()
    val planted = emb.unionByName(
      Seq((99999L, v0, 0)).toDF("vec_id", "embedding", "label"))
    val dups = Dedup.embeddingNearDups(spark, planted, "vec_id", "embedding",
      threshold = 0.999, bits = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect.toSet
    assert(dups.contains((0L, 99999L)))
  }

  test("multimodal: batch decode plumbing — schema, shapes, determinism") {
    val media = Multimodal.synthesize(spark, 60)
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() == 60)
    val f = feats.filter($"media_id" === 7L).head()
    assert(f.feature.length == Multimodal.MediaCodec.FeatureDim)
    assert(f.decoded_ok)
    // deterministic: second run identical
    val again = Multimodal.extractFeatures(media)
      .filter($"media_id" === 7L).head()
    assert(f.feature == again.feature && f.n_frames == again.n_frames)
    val plan = Multimodal.frameSamplePlan(feats.toDF, stride = 4)
    assert(plan.filter(size(col("sampled_frames")) < 1).count() == 0)
    val repart = Multimodal.repartitionBySize(spark, media.toDF, 4096)
    assert(repart.rdd.getNumPartitions >= 2)
  }

  test("rolling fingerprint: stable under reordering-free duplication") {
    val df = Seq((1L, "some stable content for rolling hash fingerprints"),
                 (2L, "some stable content for rolling hash fingerprints"),
                 (3L, "different content entirely for the rolling hash"))
      .toDF("id", "text")
      .withColumn("rfp", TextAnalysis.rollingFingerprint(col("text")))
    val v = df.orderBy("id").select("rfp").as[Long].collect
    assert(v(0) == v(1) && v(0) != v(2))
  }

  test("q34 approx twin: approx_percentile within its rank-error bound (sf0.1)") {
    // round-4 verdict #6: the documented 100-TB path (approx_percentile,
    // bounded mergeable sketch, no per-group sort) gets its own gate. The
    // guarantee is RANK error <= 1/B, so the approx value must lie inside
    // the exact [p - 1/B, p + 1/B] quantile envelope per (source, p).
    // No DuckDB oracle can pin the VALUE: the chosen element depends on
    // Spark's sketch internals — the bound is the contract.
    // the envelope is over DISCRETE order statistics (the approx value is
    // an actual element), not the interpolated percentile: rank range
    // [floor((p-1/B)·n)-1, ceil((p+1/B)·n)+1), ±1 slack for the
    // target-rank definition
    val big = "/root/testdata/sf0.1"
    val B = 10000
    val eps = 1.0 / B
    val ps = Seq(0.5, 0.9, 0.99)
    val byGroup = spark.read.parquet(s"$big/documents.parquet")
      .select("source", "n_chars")
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (s, a) => s -> a.map(_._2).sorted }
    val approx = graft.Queries.q34QuantilesApprox(spark, big, accuracy = B)
      .select("source", "p50", "p90", "p99")
      .as[(String, Double, Double, Double)].collect()
    assert(approx.nonEmpty && approx.length == byGroup.size)
    approx.foreach { case (src, a50, a90, a99) =>
      val v = byGroup(src)
      val n = v.length
      Seq(a50, a90, a99).zipWithIndex.foreach { case (a, i) =>
        val rLo = math.max(0, math.floor((ps(i) - eps) * n).toInt - 1)
        val rHi = math.min(n - 1, math.ceil((ps(i) + eps) * n).toInt + 1)
        assert(v(rLo) <= a && a <= v(rHi),
          s"$src p=${ps(i)}: approx $a outside element envelope " +
            s"[${v(rLo)}, ${v(rHi)}] (ranks $rLo..$rHi of $n)")
      }
    }
  }

  test("connectedComponents: chain + triangle + pair resolve to min-id clusters") {
    // chain 1-2-3-4 (diameter 3: exercises multi-round propagation),
    // triangle 10-11-12, disjoint pair 20-21; 5 is absent from pairs
    // (singletons are the caller's no-op set — not emitted)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .orderBy("id").as[(Long, Long)].collect.toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: maxIter guard errors rather than mis-labels") {
    // a 12-node chain cannot converge in 2 rounds (distributed path —
    // the driver-local union-find has no iteration bound to guard)
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter = 2,
        localMaxEdges = 0).collect()
    }
  }

  test("q36 split is a stable per-row property with sane proportions") {
    val out = graft.Queries.q36TrainSplit(spark, sf)
    val rows = out.select("doc_id", "bucket", "split")
      .as[(Long, Long, String)].collect.toSeq
    assert(rows.nonEmpty)
    // md5-derived bucket is a pure function of doc_id — pin one value
    // computed independently (first 8 hex of md5("0") = "cfcd2084")
    val b0 = java.lang.Long.parseLong("cfcd2084", 16) % 100
    rows.find(_._1 == 0L).foreach(r => assert(r._2 == b0))
    assert(rows.forall { case (_, b, s) =>
      (b < 80 && s == "train") || (b >= 80 && b < 90 && s == "validation") ||
        (b >= 90 && s == "test")
    })
    // 500 docs: the 80/10/10 split should be within generous bounds
    val frac = rows.count(_._3 == "train").toDouble / rows.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("q39 ranks top-5 terms per source; score matches tf*n_src/df") {
    val out = graft.Queries.q39Tfidf(spark, sf)
      .select("source", "term", "tf", "df", "score", "rk")
      .as[(String, String, Long, Long, Double, Int)].collect.toSeq
    assert(out.nonEmpty)
    // independent n_src from the raw table
    val nSrc = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct.count
    out.groupBy(_._1).foreach { case (src, g) =>
      val sorted = g.sortBy(_._6)
      assert(sorted.map(_._6) == (1 to g.size) && g.size <= 5, src)
      // score is non-increasing down the ranks and matches the formula
      // ordering is by the unrounded score; the reported column is rounded
      // to 6 places, so allow that much slack
      assert(sorted.sliding(2).forall {
        case Seq(a, b) => a._5 >= b._5 - 1e-6; case _ => true
      }, src)
      sorted.foreach { case (_, _, tf, df, score, _) =>
        assert(math.abs(score - BigDecimal(tf.toDouble * nSrc / df)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      }
    }
  }

  test("q40 reports only cross-document 8-grams, capped at 20, desc order") {
    val out = graft.Queries.q40Boilerplate(spark, sf)
      .as[(String, Long)].collect.toSeq
    assert(out.size <= 20)
    assert(out.forall(_._2 >= 2))
    assert(out.sliding(2).forall {
      case Seq(a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
      case _ => true
    })
    // every reported gram must really be 8 whitespace-separated words
    assert(out.forall(_._1.split(" ").length == 8))
  }

  test("q41 extracts typed JSON fields; aggregates are internally consistent") {
    val out = graft.Queries.q41JsonProps(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect.toSeq
    assert(out.nonEmpty && out.map(_._1) == out.map(_._1).sorted)
    out.foreach { case (et, n, nk, sum, mn, mx) =>
      assert(n > 0 && nk <= n && mn <= mx, et)
      assert(sum >= n * mn && sum <= n * mx, et)
    }
    // independent recount of one cell via from_json on the raw table
    val total = spark.read.parquet(s"$sf/events.parquet")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(sum("k")).as[Long].head
    assert(out.map(_._4).sum == total)
  }

  test("q42 as-of: match is same-user, at-or-before, and a real click") {
    val out = graft.Queries.q42AsofJoin(spark, sf)
      .select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")
      .as[(Long, Long, java.sql.Timestamp, Long, java.sql.Timestamp)]
      .collect.toSeq
    assert(out.nonEmpty)
    assert(out.forall { case (_, _, pts, _, cts) => !cts.after(pts) })
    // every (click_id, click_ts, user) triple must exist as a click event
    val clicks = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "click")
      .select("event_id", "ts", "user_id")
      .as[(Long, java.sql.Timestamp, Long)].collect.toSet
    assert(out.forall { case (u, _, _, cid, cts) => clicks((cid, cts, u)) })
    // and it must be the LATEST qualifying click (max ts, then max id)
    val byUser = clicks.groupBy(_._3)
    assert(out.forall { case (u, _, pts, cid, cts) =>
      val best = byUser(u).filter(c => !c._2.after(pts))
        .maxBy(c => (c._2.getTime, c._1))
      best._1 == cid && best._2 == cts
    })
  }

  test("q43 rollup: nation rows reconcile to region subtotals and the total") {
    val out = graft.Queries.q43Rollup(spark, sf)
      .select("lvl", "r_name", "n_name", "n_orders")
      .as[(Long, String, String, Long)].collect.toSeq
    assert(out.map(_._1).toSet == Set(0L, 1L, 3L))
    val detail = out.filter(_._1 == 0L)
    val regionSub = out.filter(_._1 == 1L)
    val total = out.filter(_._1 == 3L)
    assert(total.size == 1 && regionSub.nonEmpty && detail.nonEmpty)
    regionSub.foreach { case (_, r, n, cnt) =>
      assert(n == null, s"region subtotal carries n_name $n")
      assert(detail.filter(_._2 == r).map(_._4).sum == cnt, r)
    }
    assert(regionSub.map(_._4).sum == total.head._4)
  }

  test("q44 pivot: one row per user, columns sum to the user's event count") {
    val out = graft.Queries.q44Pivot(spark, sf)
    assert(out.columns.toSeq ==
      Seq("user_id", "click", "error", "purchase", "signup", "view"))
    val rows = out.as[(Long, Long, Long, Long, Long, Long)].collect.toSeq
    assert(rows.map(_._1).distinct.size == rows.size)
    val totals = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("user_id").count()
      .as[(Long, Long)].collect.toMap
    rows.foreach { case (u, a, b, c, d, e) =>
      assert(a + b + c + d + e == totals(u), s"user $u")
    }
  }

  test("q45 pii: counts match an independent Java-regex sweep per source") {
    val out = graft.Queries.q45PiiRedact(spark, sf)
      .select("source", "n_docs", "docs_with_pii", "n_emails", "n_ips",
        "chars_redacted")
      .as[(String, Long, Long, Long, Long, Long)].collect.toSeq
    assert(out.nonEmpty)
    // independent twin: same salting + patterns evaluated with plain
    // java.util.regex over the collected corpus (tiny at sf0.001)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b".r
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect.toSeq
    val expect = docs.map { case (id, src, text) =>
      val body = text +
        (if (id % 3 == 0) s" contact user$id@mail.example" else "") +
        (if (id % 5 == 0) s" from 10.${id % 200}.0.${id % 250}" else "")
      val e = email.findAllIn(body).size
      val i = ip.findAllIn(body).size
      val scrubbed = ip.replaceAllIn(
        email.replaceAllIn(body, "<EMAIL>"), "<IP>")
      (src, e, i, body.length - scrubbed.length)
    }.groupBy(_._1).map { case (src, a) =>
      src -> ((a.size.toLong, a.count(x => x._2 + x._3 > 0).toLong,
        a.map(_._2).sum.toLong, a.map(_._3).sum.toLong,
        a.map(_._4).sum.toLong))
    }
    assert(out.size == expect.size)
    out.foreach { case (src, nd, np, ne, ni, cr) =>
      assert(expect(src) == ((nd, np, ne, ni, cr)), src)
    }
    assert(out.map(_._4).sum > 0 && out.map(_._5).sum > 0)
  }

  test("q46 range join: window counts equal brute-force containment") {
    val out = graft.Queries.q46RangeJoin(spark, sf)
      .select("w_start", "n_events")
      .as[(java.sql.Timestamp, Long)].collect.toSeq
    assert(out.nonEmpty)
    val ts = spark.read.parquet(s"$sf/events.parquet")
      .select(unix_micros(col("ts").cast("timestamp")))
      .as[Long].collect.toSeq
    val h = 3600L * 1000000L
    val lo = (ts.min / h) * h
    out.foreach { case (w, n) =>
      val w0 = w.getTime * 1000L + (w.getNanos / 1000L) % 1000L
      assert((w0 - lo) % (2 * h) == 0, s"off-grid window $w")
      assert(n == ts.count(t => t >= w0 && t < w0 + 3 * h), s"window $w")
    }
    // overlapping 3h/2h windows: interior events appear in 1-2 windows,
    // so total window hits must be >= the event count (strictly, unless
    // every event sat in a seam gap — impossible with coverage 1-2)
    assert(out.map(_._2).sum >= ts.size)
  }

  test("q47 gaps: integer microsecond gap stats equal brute force") {
    val out = graft.Queries.q47EventGaps(spark, sf)
      .select("user_id", "n_events", "sum_gap_us", "max_gap_us", "min_gap_us")
      .as[(Long, Long, Long, Long, Long)].collect.toSeq
    assert(out.nonEmpty)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")))
      .as[(Long, Long, Long)].collect.toSeq
    val byUser = ev.groupBy(_._1)
    out.foreach { case (u, n, sg, mx, mn) =>
      val us = byUser(u).sortBy(e => (e._3, e._2)).map(_._3)
      val gaps = us.zip(us.tail).map { case (a, b) => b - a }
      assert(n == us.size && gaps.nonEmpty, u)
      assert(sg == gaps.sum && mx == gaps.max && mn == gaps.min, u)
    }
    assert(out.size == byUser.count(_._2.size >= 2))
  }

  test("q48 rate limiter: cross-batch cap = first-25 by (batch, seq) per host") {
    val out = graft.Queries.q48StreamRateLimit(spark, sf)
      .select("host", "seq", "adm_rank")
      .as[(String, Long, Long)].collect.toSeq
    assert(out.nonEmpty)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(pmod(col("user_id"), lit(50)), col("event_id"))
      .as[(Long, Long)].collect.toSeq
    val admitted = ev.groupBy(_._1).flatMap { case (h, a) =>
      a.map(_._2).sortBy(id => (id % 2, id)).take(25).zipWithIndex
        .map { case (seq, i) => (s"host$h.test", seq, i + 1L) }
    }.toSet
    assert(out.size == admitted.size)
    assert(out.forall(admitted), "admitted set or rank mismatch")
    // cross-batch state: some host must exhaust its cap inside batch 0
    // (even seqs) so batch 1 rows are REJECTED by carried state
    assert(out.exists { case (_, seq, r) => r == 25L && seq % 2 == 0 })
  }

  test("hll twin: approx_count_distinct within 3x rsd of exact (sf0.01)") {
    // same contract shape as the q34 approx twin: the 100-TB distinct
    // path is the mergeable HLL++ sketch (one pass, no exact-distinct
    // two-shuffle expansion); its value is engine-internal so no DuckDB
    // oracle can pin it — the documented rsd bound is the gate.
    val dir = "/root/testdata/sf0.01"
    val rsd = 0.05
    val approx = graft.Queries.distinctUsersApprox(spark, dir, rsd)
      .select("event_type", "n_users_approx")
      .as[(String, Long)].collect.toMap
    val exact = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect.toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex) <= math.max(1L, (3 * rsd * ex).toLong),
        s"$k approx=$ap exact=$ex")
    }
  }

  test("q38 emits at most 3 deterministic rows per language") {
    val a = graft.Queries.q38SamplePerGroup(spark, sf)
      .as[(String, Long, Int)].collect.toSeq
    val b = graft.Queries.q38SamplePerGroup(spark, sf)
      .as[(String, Long, Int)].collect.toSeq
    assert(a == b)
    a.groupBy(_._1).foreach { case (lang, g) =>
      assert(g.size <= 3 && g.map(_._3).sorted == (1 to g.size), lang)
    }
  }

  test("salted skew join == plain join (incl. duplicate dim keys)") {
    import spark.implicits._
    // one mega-hot key (0: 600 rows), two warm (1,2), a cold tail — and
    // dim-side DUPLICATE keys so the hot-row replication logic is exercised
    // (each fact row must match every dim row with its key exactly once)
    val fact = (0 until 1000).map { i =>
      val k = if (i < 600) 0L else if (i < 800) 1L else if (i < 900) 2L
        else (i % 7 + 3).toLong
      (k, i.toLong)
    }.toDF("k", "rid")
    val dim = Seq((0L, "a"), (0L, "b"), (1L, "c"), (3L, "d"), (4L, "e"),
      (9L, "z")).toDF("dk", "tag")
    val salted = graft.pipeline.SkewJoin
      .saltedJoin(fact, dim, "k", "dk", col("rid"), hotK = 3, salts = 4)
      .select("k", "rid", "tag").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "rid", "tag").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.count(_._1 == 0L) == 1200, "hot key must hit both dim dups")
    // events x customer at fixture scale, through the q53 path
    val got = graft.Queries.q53SkewJoin(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val exp = spark.read.parquet(s"$sf/events.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        min("event_id").as("min_event"), max("event_id").as("max_event"))
      .orderBy("c_mktsegment")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == exp)
  }

  test("q50 shard export: bounded files, sharded layout, exact round trip") {
    val out = graft.Queries.shardExportPath(spark, sf)
    // every data file respects maxRecordsPerFile (footer evidence)
    val counts = graft.tableio.ParquetStats.fileRowCounts(spark, out)
    assert(counts.nonEmpty && counts.forall(_ <= 250),
      s"file sizes exceed the 250-record bound: $counts")
    // the layout really is partitioned by shard
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard="))
    assert(shardDirs.length == 16, s"expected 16 shard dirs: ${shardDirs.toSeq}")
    // write -> read round trip loses nothing and invents nothing
    val src = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars")
    val back = spark.read.parquet(out).select("doc_id", "n_chars")
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("q54 cms: estimates dominate exact counts, deterministic top-10") {
    val rows = graft.Queries.q54CmsTopk(spark, sf).collect()
    assert(rows.length == 10, s"expected a top-10, got ${rows.length}")
    // the defining CMS guarantee: min-over-rows never under-counts
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CMS under-counted user ${r.getLong(0)}: est=${r.getLong(1)} " +
          s"exact=${r.getLong(2)}")
    }
    val ests = rows.map(_.getLong(1)).toSeq
    assert(ests == ests.sorted.reverse, s"top-10 not est-descending: $ests")
    // md5-derived hashes: a re-run reproduces the exact same report
    val again = graft.Queries.q54CmsTopk(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "CMS report must be bit-deterministic across runs")
  }

  test("q57 event paths: ts order with event_id tie-break, exact on a hand case") {
    import org.apache.spark.sql.functions.{col, expr, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft-q57-").toString
    // user 1: a ts TIE between event_ids 11 and 10 — the path must order
    // by event_id within the tie, regardless of collect order
    spark.createDataFrame(Seq(
      (11L, "2024-01-01 00:00:05", 1L, "view"),
      (10L, "2024-01-01 00:00:05", 1L, "click"),
      (12L, "2024-01-01 00:00:01", 1L, "open"),
      (20L, "2024-01-01 00:00:09", 2L, "buy")))
      .toDF("event_id", "s", "user_id", "event_type")
      .select(col("event_id"), expr("cast(s as timestamp_ntz)").as("ts"),
        col("user_id"), col("event_type"), lit(0.0).as("value"),
        lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    val got = graft.Queries.q57EventPaths(spark, dir)
      .select("user_id", "path", "n_events")
      .as[(Long, String, Long)].collect.toSeq
    assert(got == Seq((1L, "open>click>view", 3L), (2L, "buy", 1L)))
  }

  test("q55 z-order layout: content-preserving rewrite") {
    val out = graft.Queries.zorderLayoutPath(spark, sf)
    val src = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id")
    val back = spark.read.parquet(out).select("event_id", "user_id")
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("q66 inverted index: distinct-term df, sorted bounded head segment") {
    // d1's doubled 'apple' must not inflate df (per-doc DISTINCT terms)
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "cherry banana zebra")).toDF("doc_id", "text")
    val got = graft.Queries.invertedIndex(docs, headK = 20)
      .as[(String, Long, String)].collect.toSeq
    assert(got == Seq(("apple", 1L, "1"), ("banana", 3L, "1,2,3"),
      ("cherry", 2L, "2,3"), ("zebra", 1L, "3")))
    // the head segment is CAPPED before the collect: df stays exact while
    // postings_head carries only the first headK doc ids in doc order
    val capped = graft.Queries.invertedIndex(docs, headK = 2)
      .as[(String, Long, String)].collect.toSeq
    assert(capped.find(_._1 == "banana").get == (("banana", 3L, "1,2")))
  }

  test("q72 table fingerprint: md5-exact and order/partition-invariant") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "t")
    val rowCol = concat_ws("|", col("id"), col("t"))
    def fp(sd: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(sd.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val fps = Seq("1|x", "2|y", "3|z").map(fp)
    val exp = ("t3", 3L, fps.reduce(_ ^ _), fps.map(_ % 1000000007L).sum)
    val got = graft.Queries.tableFingerprint(df, "t3", rowCol)
      .as[(String, Long, Long, Long)].collect.head
    assert(got == exp)
    // the checksum is a content property: row order and physical
    // partitioning must not move it (the anti-entropy invariant)
    val shuffled = graft.Queries.tableFingerprint(
      df.orderBy(col("t").desc).repartition(7), "t3", rowCol)
      .as[(String, Long, Long, Long)].collect.head
    assert(shuffled == exp)
  }

  test("q73 co-occurrence: df band excludes hapax+stopword, lift exact") {
    // stop: df=10 = corpus size -> above the 9/10 ceiling; rare: df=1
    // below the floor; alpha(6) x beta(7) co-occur in 6 docs
    val docs = ((1 to 6).map(i => (i.toLong, "stop alpha beta")) ++ Seq(
      (7L, "stop beta"), (8L, "stop rare gamma"), (9L, "stop gamma"),
      (10L, "stop"))).toDF("doc_id", "text")
    val got = graft.Queries.termCooccur(spark, docs, nDocs = 10L,
      minDf = 2L, ceilNum = 9L, ceilDen = 10L, minPair = 2L)
      .as[(String, String, Long, Long)].collect.toSeq
    // lift = 6*10*1e6 div (6*7)
    assert(got == Seq(("alpha", "beta", 6L, 1428571L)))
  }

  test("q74 decay: half-life shift weights, boundary week, recency gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q74-").toString
    val anchor = java.time.Instant.parse("2024-03-01T00:00:00Z")
    def ts(minusUs: Long) = java.sql.Timestamp.from(anchor.minusNanos(minusUs * 1000))
    val week = 604800000000L
    Seq(
      (1L, ts(0L), "click"),            // age 0 weeks -> 1000000
      (2L, ts(week), "click"),          // exactly 1 week -> 500000 (recent)
      (3L, ts(2 * week + 1L), "click"), // 2 weeks -> 250000 (stale)
      (3L, ts(0L), "view"))             // second type, weight 1000000
      .toDF("user_id", "ts", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.Queries.q74DecayScores(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    assert(got == Seq(("click", 3L, 1750000L, 1000000L, 2L),
      ("view", 1L, 1000000L, 1000000L, 1L)))
  }

  test("q75 triangles: support threshold, single enumeration per triangle") {
    // orders o1,o2 repeat {1,2,3} (all three edges reach w=2); (1,4) has
    // support 1 and is dropped; (4,5) is a supported edge in no triangle
    val lp = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 4L),
      (4L, 4L), (4L, 5L),
      (5L, 4L), (5L, 5L)).toDF("ok", "pk")
    val got = graft.Queries.triangles(lp)
      .as[(Long, Long)].collect.toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("q76 prefix ssjoin: lossless vs brute-force exact jaccard") {
    // d1=d2 identical; d1~d3 at EXACTLY theta (3/5 = 0.6, the boundary
    // the integer test 10*I >= 6*U must keep); d4 disjoint
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "a b c d e x"), (4L, "z y x w v u"),
      (5L, "a b c q r s t")).toDF("doc_id", "text")
    val got = graft.Queries.prefixSsjoin(docs, theta10 = 6L)
      .as[(Long, Long, Long, Long)].collect.toSeq
    // brute force over the same shingle definition
    def sh(t: String) = t.split("\\s+").filter(_.nonEmpty).sliding(3)
      .map(_.mkString(" ")).toSet
    val m = Map(1L -> "a b c d e f", 2L -> "a b c d e f",
      3L -> "a b c d e x", 4L -> "z y x w v u", 5L -> "a b c q r s t")
    val exp = (for {
      a <- m.keys; b <- m.keys if a < b
      ia = sh(m(a)).intersect(sh(m(b))).size.toLong
      ua = (sh(m(a)) ++ sh(m(b))).size.toLong
      if 10 * ia >= 6 * ua
    } yield (a, b, ia, ua)).toSeq.sorted
    assert(got == exp)
    assert(exp.contains((1L, 3L, 3L, 5L))) // the theta-boundary pair
  }

  test("q77 funnel: strict stage ordering, integer gap sums") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q77-").toString
    val t0 = java.time.Instant.parse("2024-02-01T00:00:00Z")
    def ts(plusUs: Long) = java.sql.Timestamp.from(t0.plusNanos(plusUs * 1000))
    Seq(
      (1L, "view", ts(0L)), (1L, "click", ts(10L)), (1L, "purchase", ts(20L)),
      // u2: the click BEFORE the first view must not convert; the
      // purchase BEFORE the qualifying click must not convert either
      (2L, "click", ts(0L)), (2L, "view", ts(5L)), (2L, "purchase", ts(6L)),
      (2L, "click", ts(7L)),
      (3L, "view", ts(100L)))
      .toDF("user_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.Queries.q77Funnel(spark, dir)
      .as[(String, Long, Long)].collect.toSeq
    assert(got == Seq(("1_view", 3L, 0L), ("2_click", 2L, 12L),
      ("3_purchase", 1L, 10L)))
  }

  test("q78 vocab encode: frequency-ranked ids, OOV=0, order preserved") {
    // cf: a=3, b=3, c=2, d=1 -> ids a=1 (tie with b broken by term),
    // b=2, c=3; vocabSize=3 makes d OOV
    val docs = Seq((1L, "b a b c b a"), (2L, "a c d")).toDF("doc_id", "text")
    val got = graft.Queries.vocabEncode(docs, vocabSize = 3, headLen = 4)
      .as[(Long, Long, String, Long)].collect.toSeq
    assert(got == Seq((1L, 6L, "2,1,2,3", 0L), (2L, 3L, "1,3,0", 1L)))
  }

  test("q79 dup spans: shared 8-gram marks both docs, unique spans do not") {
    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, s"$span x"), (2L, s"z $span"),
      (3L, "a b c d e f g h")).toDF("doc_id", "text")
    val got = graft.Queries.q79DupSpansOn(docs)
      .as[(Long, Long, Long, Long)].collect.toSeq
    assert(got == Seq((1L, 2L, 1L, 500000L), (2L, 2L, 1L, 500000L),
      (3L, 1L, 0L, 0L)))
  }

  test("q80 fk audit: planted orphans all found, clean constraints zero") {
    val dir = sf
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val plantedEv = ev.filter(pmod(col("event_id"), lit(500)) === 0).count()
    val plantedLi = li.filter(pmod(col("l_orderkey"), lit(997)) === 0 &&
      col("l_linenumber") === 1).count()
    val got = graft.Queries.q80FkAudit(spark, dir)
      .as[(String, Long, Long)].collect.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(plantedEv > 0 && plantedLi > 0) // the plant is non-degenerate
    assert(got("events.user_id->customer") ==
      ((ev.count() + plantedEv, plantedEv)))
    assert(got("lineitem.l_orderkey->orders") ==
      ((li.count() + plantedLi, plantedLi)))
    assert(got("lineitem.l_partkey->part")._2 == 0L)
    assert(got("orders.o_custkey->customer")._2 == 0L)
  }

  test("q81 jsonl round trip: read-back multiset equals the source") {
    val src = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars", "text")
    val out = graft.Queries.jsonlExportPath(spark, sf)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT, text STRING")
    val back = spark.read.text(out)
      .withColumn("r", from_json(col("value"), schema))
      .select("r.doc_id", "r.lang", "r.source", "r.n_chars", "r.text")
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("q82 mixture allocation: exact budget sum, remainder + tie rules") {
    val per = Seq(("A", 10L, 5L), ("B", 6L, 3L), ("C", 4L, 2L))
      .toDF("source", "n_docs", "mass")
    val got = graft.Queries.mixtureAlloc(per, budget = 7L)
      .as[(String, Long, Long, Long)].collect.toSeq
    // floors 3/2/1 leave one seat; A has the largest remainder (5)
    assert(got == Seq(("A", 10L, 5L, 4L), ("B", 6L, 3L, 2L),
      ("C", 4L, 2L, 1L)))
    assert(got.map(_._4).sum == 7L)
    // equal remainders: the seat goes to the lexicographically first
    val tie = Seq(("A", 1L, 1L), ("B", 1L, 1L)).toDF("source", "n_docs", "mass")
    val gt = graft.Queries.mixtureAlloc(tie, budget = 3L)
      .as[(String, Long, Long, Long)].collect.toSeq
    assert(gt == Seq(("A", 1L, 1L, 2L), ("B", 1L, 1L, 1L)))
  }

  test("q83 interleaved spans: synthesis shape, offsets, media resolution") {
    val docs = Seq(
      (1L, "a b c"), // 1 chunk, (1+1)%3!=0 -> text only
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")) // chunk1 + media m15, chunk2
      .toDF("doc_id", "text")
    val spans = graft.Queries.interleavedSpans(docs)
      .select(col("doc_id"), expr(
        "transform(spans, e -> concat_ws('|', e.kind, e.text, e.media_ref, e.offset))")
        .as("s"))
      .as[(Long, Seq[String])].collect.toMap
    assert(spans(1L) == Seq("text|a b c||0"))
    assert(spans(2L) == Seq("text|t1 t2 t3 t4 t5 t6 t7 t8||0",
      "image||m15|1", "text|t9 t10||2"))
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val prof = graft.Queries.spanProfile(graft.Queries.interleavedSpans(docs))
      .as[(Long, Long, Long, Long, String)].collect.toSeq
    val m15bytes = java.lang.Long.parseLong(md5hex("m15").take(6), 16) % 100000
    assert(prof == Seq(
      (1L, 1L, 0L, 0L, md5hex("text|a b c||0")),
      (2L, 3L, 1L, m15bytes, md5hex(
        "text|t1 t2 t3 t4 t5 t6 t7 t8||0#image||m15|1#text|t9 t10||2"))))
  }

  test("q84 lang confusion: off-diagonal cells surface misclassification") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q84-").toString
    Seq(
      (1L, "the cat and the hat", "en", 19L),   // pred en  (diagonal)
      (2L, "der hund und die katze", "en", 22L), // pred de (off-diagonal)
      (3L, "!!!", "de", 3L))                     // pred und (off-diagonal)
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.Queries.q84LangConfusion(spark, dir)
      .as[(String, String, Long, Long)].collect.toSeq
    assert(got == Seq(("de", "und", 1L, 3L), ("en", "de", 1L, 22L),
      ("en", "en", 1L, 19L)))
  }

  test("q85 common neighbors: 2-hop score, existing edges anti-joined") {
    // edges (support 2 each): 1-2, 2-3, 1-4, 4-3. Non-edges (1,3) and
    // (2,4) each share TWO neighbors -> recommended; every adjacent pair
    // is suppressed by the anti-join
    val lp = (Seq((1L, 2L), (2L, 3L), (1L, 4L), (4L, 3L))
      .zipWithIndex.flatMap { case ((u, v), i) =>
        Seq((2L * i + 100L, u), (2L * i + 100L, v),
          (2L * i + 101L, u), (2L * i + 101L, v))
      }).toDF("ok", "pk")
    val got = graft.Queries.commonNeighbors(lp)
      .as[(Long, Long, Long)].collect.toSeq
    assert(got == Seq((1L, 3L, 2L), (2L, 4L, 2L)))
  }

  test("q86 frequent triples: joint support, not pairwise support") {
    // {1,2,3} in o1+o2 and {1,2,4} in o2+o3 are frequent; {1,3,4} and
    // {2,3,4} appear jointly only in o2 and are pruned
    val lp = Seq((1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L),
      (3L, 1L), (3L, 2L), (3L, 4L)).toDF("ok", "pk")
    val got = graft.Queries.frequentTriples(lp)
      .as[(Long, Long, Long, Long)].collect.toSeq
    assert(got == Seq((1L, 2L, 3L, 2L), (1L, 2L, 4L, 2L)))
  }

  test("q87 transitions: per-user consecutive pairs, ts ties by event_id") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q87-").toString
    val t0 = java.time.Instant.parse("2024-02-01T00:00:00Z")
    def ts(plusUs: Long) = java.sql.Timestamp.from(t0.plusNanos(plusUs * 1000))
    Seq(
      (1L, 10L, ts(0L), "view"),
      (2L, 10L, ts(1L), "click"),
      (3L, 10L, ts(1L), "purchase"), // tie with e2 -> ordered by event_id
      (4L, 20L, ts(5L), "view"))     // single event, no transition
      .toDF("event_id", "user_id", "ts", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.Queries.q87EventTransitions(spark, dir)
      .as[(String, String, Long)].collect.toSeq
    assert(got == Seq(("click", "purchase", 1L), ("view", "click", 1L)))
  }

  test("q88 cohort retention: first-bucket cohorts, distinct activity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q88-").toString
    val bucket = 43200L // seconds
    def ts(b: Long, off: Long = 100L) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(b * bucket + off))
    Seq( // u1 cohort 0, active {0,0,1,3} (dup collapses); u2 cohort 1, {1,2}
      (1L, ts(0)), (1L, ts(0, 200L)), (1L, ts(1)), (1L, ts(3)),
      (2L, ts(1)), (2L, ts(2)))
      .toDF("user_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.Queries.q88CohortRetention(spark, dir)
      .as[(Long, Long, Long)].collect.toSeq
    assert(got == Seq((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("q89 centroid stats: quantization boundary + negative values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q89-").toString
    // 0.0005f -> floor(0.5+0.5)=1; -0.0005f -> floor(-0.5+0.5)=0 after
    // the exact float->double cast (0.0005f != 0.0005 but consistent)
    Seq((1L, Seq(1.5f, -2.25f), 0), (2L, Seq(0.0005f, 0.25f), 0),
      (3L, Seq(-0.0005f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    def qz(f: Float): Long = math.floor(f.toDouble * 1000.0 + 0.5).toLong
    val got = graft.Queries.q89CentroidStats(spark, dir)
      .as[(Int, Long, Long, Long, Long)].collect.toSeq
    assert(got == Seq(
      (0, 2L, qz(1.5f) + qz(-2.25f) + qz(0.0005f) + qz(0.25f),
        qz(1.5f) + qz(0.0005f), qz(-2.25f) + qz(0.25f)),
      (1, 1L, qz(-0.0005f) + qz(1.0f), qz(-0.0005f), qz(1.0f))))
  }

  test("q90 gap histogram: bit-length buckets, zero gap pinned to 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q90-").toString
    val t0 = java.time.Instant.parse("2024-02-01T00:00:00Z")
    def ts(plusUs: Long) = java.sql.Timestamp.from(t0.plusNanos(plusUs * 1000))
    Seq( // gaps for u1: 1 (bucket 1), 7 (bucket 3), 0 (bucket 0)
      (1L, 10L, ts(0L), "click"), (2L, 10L, ts(1L), "click"),
      (3L, 10L, ts(8L), "click"), (4L, 10L, ts(8L), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.Queries.q90GapHistogram(spark, dir)
      .as[(String, Int, Long)].collect.toSeq
    assert(got == Seq(("click", 0, 1L), ("click", 1, 1L), ("click", 3, 1L)))
  }

  test("q91 activity bitmask: bit per day, dup days collapse, clamp") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q91-").toString
    def ts(day: Long, off: Long = 3600L) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day * 86400L + off))
    Seq( // u1 active days {0,0,2} -> mask 0b101; u2 day 70 -> clamped bit 62
      (1L, ts(100)), (1L, ts(100, 7200L)), (1L, ts(102)),
      (2L, ts(170)))
      .toDF("user_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.Queries.q91ActivityBitmask(spark, dir)
      .as[(Long, Long, Long)].collect.toSeq
    assert(got == Seq((1L, 5L, 2L), (2L, 1L << 62, 1L)))
  }

  test("q93 arg-max agg: ts ties broken by event_id, no window sort") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q93-").toString
    val t0 = java.time.Instant.parse("2024-02-01T00:00:00Z")
    def ts(plusUs: Long) = java.sql.Timestamp.from(t0.plusNanos(plusUs * 1000))
    Seq( // two events at the max ts: the larger event_id must win
      (5L, ts(10L), "click"), (9L, ts(10L), "click"), (1L, ts(0L), "click"))
      .toDF("event_id", "ts", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = graft.Queries.q93LatestByType(spark, dir)
      .as[(String, Long, Long, Long)].collect.toSeq
    val baseUs = t0.toEpochMilli * 1000L
    assert(got == Seq(("click", 9L, baseUs + 10L, 3L)))
  }

  test("q94 shard checksums reconcile with the q72 whole-table digest") {
    // the Merkle property: shard digests must recombine to the table
    // digest (xor of xors, sums of counts/sums)
    val shards = graft.Queries.q94ShardChecksums(spark, sf)
      .as[(Long, Long, Long, Long)].collect.toSeq
    val table = graft.Queries.q72TableChecksum(spark, sf)
      .as[(String, Long, Long, Long)].collect
      .find(_._1 == "documents").get
    assert(shards.map(_._2).sum == table._2)
    assert(shards.map(_._3).reduce(_ ^ _) == table._3)
    assert(shards.map(_._4).sum == table._4)
    assert(shards.size > 1) // localization is real, not one bucket
  }

  test("q96 PQ codes: integer codebook assignment matches brute force") {
    def centroid(sub: Int, c: Int, j: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pq:$sub:$c:$j".getBytes("UTF-8"))
      val hex = h.map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
    }
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect.toSeq
    val brute = collection.mutable.Map[(Long, Long), (Long, Long)]()
    for ((_, v) <- emb; sub <- 0 until 4) {
      val q = v.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)
      val dists = (0 until 4).map { c =>
        (0 until 16).map { j =>
          val d = q(sub * 16 + j) - centroid(sub, c, j); d * d
        }.sum
      }
      val code = dists.zipWithIndex.minBy { case (d, cc) => (d, cc) }._2
      val key = (sub.toLong, code.toLong)
      val (n0, s0) = brute.getOrElse(key, (0L, 0L))
      brute(key) = (n0 + 1, s0 + dists(code))
    }
    val got = graft.Queries.q96PqCodes(spark, sf)
      .as[(Long, Long, Long, Long)].collect.toSeq
    val exp = brute.toSeq.map { case ((s0, c), (n, d)) => (s0, c, n, d) }
      .sortBy(t => (t._1, t._2))
    assert(got == exp)
    assert(got.map(_._3).sum == emb.size * 4L,
      "every vector gets exactly one code per subspace")
  }

  test("q97 SCD2: changed keys close v1 and append current v2") {
    val got = graft.Queries.q97Scd2Dim(spark, sf)
      .as[(Long, String, Long, Boolean)].collect.toSeq
    val base = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment").as[(Long, String)].collect.toSeq
    val changed = base.filter(_._1 % 7 == 0)
    assert(changed.nonEmpty)
    assert(got.size == base.size + changed.size)
    val byKey = got.groupBy(_._1)
    for ((k, seg) <- changed) {
      val vs = byKey(k).sortBy(_._3).map(v => (v._2, v._3, v._4))
      assert(vs == Seq((seg, 1L, false), ("MIGRATED", 2L, true)))
    }
    for ((k, seg) <- base.filterNot(_._1 % 7 == 0).take(25))
      assert(byKey(k).toSeq == Seq((k, seg, 1L, true)))
    val current = got.filter(_._4)
    assert(current.size == base.size &&
      current.groupBy(_._1).forall(_._2.size == 1),
      "exactly one current version per key")
  }

  test("q98 chunking: ceil(n/48) chunks, 64-token window, overlap math") {
    // hand case: 100 tokens -> chunks at 0/48/96 with lengths 64, 52, 4
    val dir = java.nio.file.Files.createTempDirectory("graft-q98-").toString
    Seq((1L, "w", ("t " * 100).trim), (2L, "w", "a b c"))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$dir/documents.parquet")
    val hand = graft.Queries.q98ChunkSplit(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    assert(hand == Seq(("w", 2L, 4L, 64L + 52L + 4L + 3L, 1L)))

    // corpus twin: recompute the aggregation from collected token counts
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"),
        TextAnalysis.tokenCount(col("text")).as("n"))
      .as[(String, Long)].collect.toSeq.filter(_._2 > 0)
    val exp = docs.groupBy(_._1).map { case (src, ds) =>
      val chunks = ds.flatMap { case (_, n) =>
        (0L until ((n + 47) / 48)).map(k => math.min(64L, n - 48 * k)) }
      (src, ds.size.toLong, chunks.size.toLong, chunks.sum,
        chunks.count(_ == 64L).toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.Queries.q98ChunkSplit(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    assert(got == exp)
  }

  test("q99 MAD outliers: integer rule matches a direct median/MAD recompute") {
    // 2x the continuous median of integers is always an exact integer
    def med2(xs: Seq[Long]): Long = {
      val s0 = xs.sorted; val n = s0.size
      if (n % 2 == 1) 2 * s0(n / 2) else s0(n / 2 - 1) + s0(n / 2)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "n_chars").as[(String, Long)].collect.toSeq
    val exp = docs.groupBy(_._1).map { case (lang, ds) =>
      val xs = ds.map(_._2)
      val m2 = med2(xs)
      val dev2 = xs.map(x => math.abs(2 * x - m2))
      val m4 = med2(dev2) // dev2 already carries the x2 => this is 4*MAD
      (lang, xs.size.toLong, m2, m4, dev2.count(d => 2 * d > 3 * m4).toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.Queries.q99MadOutliers(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    assert(got == exp)
    assert(got.forall(_._4 > 0), "degenerate zero-MAD groups would make " +
      "every deviation an outlier; the fixture must not be degenerate")
  }

  test("q100 BPE pairs: hand-counted adjacent pairs, pinned tie order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q100-").toString
    // "abab" -> ab, ba, ab; "ab" -> ab; "x" skipped (len 1); "ba" x2 -> ba
    Seq((1L, "abab ab x"), (2L, "ba ba")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.Queries.q100BpePairs(spark, dir)
      .as[(String, Long)].collect.toSeq
    assert(got == Seq(("ab", 3L), ("ba", 3L))) // tie broken by pair asc
  }

  test("q67 bigram LM: pruned model, occurrence-weighted hit mass") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q67-").toString
    // bigram counts: 'a b'=3 (kept), 'b a'=1, 'b c'=1, 'b x'=1 (pruned)
    // d1 = a b a b c -> 4 bigrams, 2 known ('a b' twice), hits 2*3 = 6
    // d2 = a b x     -> 2 bigrams, 1 known, hits 3
    Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.Queries.q67BigramLm(spark, dir)
      .as[(Long, Long, Long, Long)].collect.toSeq
    assert(got == Seq((1L, 4L, 2L, 6L), (2L, 2L, 1L, 3L)))
  }

  test("q102 merkle descent: located cells hold exactly the corrupted rows") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = (1L to 400L).map(i =>
      (i, "en", s"src${i % 7}", 10L + i % 50, s"text $i"))
    val got = graft.Queries.merkleRepair(
      docs.toDF("doc_id", "lang", "source", "n_chars", "text"))
      .as[(Long, Long, Long, Long)].collect.toSeq
    // brute force: the corruption predicate locates rows directly
    val corrupted = docs.filter { case (id, _, _, _, _) =>
      java.lang.Long.parseLong(md5hex("x" + id).substring(0, 8),
        16) % 101 == 0
    }
    assert(corrupted.nonEmpty)
    val byCell = corrupted.groupBy { case (id, _, _, _, _) =>
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 8), 16) % 256
    }
    assert(got.map(_._2).toSet == byCell.keySet)
    assert(got.map(g => g._2 -> g._4).toMap ==
      byCell.map { case (k, v) => k -> v.size.toLong })
    // the descent kept the digest-tree prefix: subshard refines shard
    got.foreach(g => assert(g._1 == g._2 % 16))
  }

  test("q104 multi-pass blocking: pass 2 recovers an edit inside the pass-1 block") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q104-").toString
    Seq((1L, "abcdefghijklmnop"), (2L, "aXcdefghijklmnop"),
      (3L, "abcdefghZZZZZZZZ"), (4L, "zzzz"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val single = graft.Queries.q64FuzzyMatch(spark, dir)
      .as[(Long, Long, Long)].collect.toSeq
    val multi = graft.Queries.q104MultiBlock(spark, dir)
      .as[(Long, Long, Long)].collect.toSeq
    // (1,2): one edit at position 2 — invisible to pass 1 (block keys
    // differ), caught by pass 2 on the disjoint chars 5-8; the pass-1
    // candidates (1,3)/(2,3) fail the exact verify (edit 8 > 3); the
    // short doc is excluded from pass 2 by the length guard
    assert(single.isEmpty)
    assert(multi == Seq((1L, 2L, 1L)))
  }

  test("q106 kNN join: matches brute-force MIPS within LSH buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q106-").toString
    // ids 0 and 50 are the query side; corpus vectors are POSITIVE
    // scalings of a query pattern (sign pattern — hence SRP bucket —
    // provably shared, integer dots still distinct for ranking)
    def pat(s: Long)(j: Int): Float = (((s * 37 + j * 11) % 200) - 100) / 100.0f
    val vecs: Seq[(Long, Seq[Float])] =
      Seq(0L -> (0 until 64).map(pat(1)), 50L -> (0 until 64).map(pat(2))) ++
        (1L to 5L).map(i => i ->
          (0 until 64).map(j => pat(1)(j) * (1.0f + i / 20.0f))) ++
        (6L to 10L).map(i => i ->
          (0 until 64).map(j => pat(2)(j) * (1.0f + i / 20.0f)))
    val ids = vecs.map(_._1)
    vecs.toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = graft.Queries.q106KnnJoin(spark, dir)
      .as[(Long, Long, Long, Long)].collect.toSeq
    // independent expectation: same md5 planes, float-sign bucket,
    // integer-quantized dot, top-3 per query by (dot desc, id asc)
    val bits = math.max(6,
      (math.log(ids.size.toDouble + 1) / math.log(2)).ceil.toInt - 3)
    val planes = Similarity.md5Planes(bits, 64, 7L)
    def bucket(v: Seq[Float]): Long = (0 until bits).map { i =>
      val d = planes(i).zip(v).map { case (p, x) => p * x.toDouble }.sum
      if (d >= 0) 1L << i else 0L
    }.sum
    def qv(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * 1000).toLong)
    val expected = vecs.filter(_._1 % 50 == 0).flatMap { case (qid, qvec) =>
      vecs.filter(c => c._1 % 50 != 0 && bucket(c._2) == bucket(qvec))
        .map { case (cid, cvec) =>
          (qid, cid, qv(qvec).zip(qv(cvec)).map(t => t._1 * t._2).sum)
        }
        .sortBy { case (_, cid, d) => (-d, cid) }
        .take(3).zipWithIndex
        .map { case ((a, b, d), i) => (a, b, d, i + 1L) }
    }.sortBy(r => (r._1, r._4))
    assert(expected.nonEmpty && expected.exists(_._4 > 1))
    assert(got == expected)
  }

  test("q107 sliding distinct: hand-computed trailing-7d reach") {
    val ev = Seq(
      (1L, "2026-01-01 00:00:00"), (2L, "2026-01-01 12:00:00"),
      (1L, "2026-01-03 05:00:00"), (3L, "2026-01-10 01:00:00"))
      .toDF("user_id", "ts")
    val got = graft.Queries.slidingDistinct(ev)
      .as[(Long, Long, Long)].collect.toSeq
    // (u,day) pairs: (1,0) (2,0) (1,2) (3,9); pair (d) serves t in
    // [d, min(d+6, 9)]; 7d = distinct users serving t, 1d = users with d==t
    assert(got == Seq(
      (0L, 2L, 2L), (1L, 2L, 0L), (2L, 2L, 1L), (3L, 2L, 0L),
      (4L, 2L, 0L), (5L, 2L, 0L), (6L, 2L, 0L),
      (7L, 1L, 0L), (8L, 1L, 0L), (9L, 1L, 1L)))
  }

  test("q108 random projection: constant vectors give signed plane sums") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q108-").toString
    // qv all-ones (0.001 -> floor(1.0)=1) and all-minus-ones (-0.0005)
    Seq((1L, Seq.fill(64)(0.001f)), (2L, Seq.fill(64)(-0.0005f)))
      .toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = graft.Queries.q108RandomProjection(spark, dir).collect()
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sums = (0 until 8).map { k =>
      (0 until 64).map { j =>
        if (java.lang.Long.parseLong(
          md5hex(s"rp:$k:$j").substring(0, 8), 16) % 2 == 0) 1L else -1L
      }.sum
    }
    (0 until 8).foreach { k =>
      assert(got(0).getLong(k + 1) == sums(k))
      assert(got(1).getLong(k + 1) == -sums(k))
    }
  }

  test("q109 incremental dedup: delta-vs-index equals the batch scan's delta slice") {
    // base corpus indexed once; two hand-built deltas probe it
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again ok"),
      (3L, "completely different content about spark physical plans etc"),
      (7L, "a third unrelated document mentioning parquet footers only"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again okay"),
      (12L, "the quick brown fox jumps over the lazy dog again and again okay!"),
      (14L, "nothing like anything above whatsoever in any shingle"))
      .toDF("doc_id", "text")
    val (buckets, sigs) =
      Dedup.minhashIndexTables(base, "doc_id", "text", 5, 120, 24)
    val inc = Dedup.minhashDeltaPairs(base, buckets, sigs, delta,
      "doc_id", "text", 5, 120, 24, threshold = 0.6)
      .as[(Long, Long, Double)].collect.toSeq.sorted
    // ground truth: the batch scan over base+delta, restricted to pairs
    // with a delta side
    val all = Dedup.minhashLshPairs(base.unionByName(delta),
      "doc_id", "text", 5, 120, 24, threshold = 0.6)
      .as[(Long, Long, Double)].collect.toSeq
      .filter(p => p._1 >= 10 || p._2 >= 10).sorted
    assert(inc == all)
    // both cross (base 1 vs deltas) and within-delta (10 vs 12) pairs
    assert(inc.exists(p => p._1 == 1L && p._2 >= 10L))
    assert(inc.exists(p => p._1 == 10L && p._2 == 12L))
    assert(!inc.exists(p => p._1 == 14L || p._2 == 14L))
  }

  test("q110 bloom layout: blooms in every group, envelopes span the probe") {
    val sf01 = "/root/testdata/sf0.01"
    val dir = {
      // force the fixture build, then read its footers
      graft.Queries.q110BloomSkipping(spark, sf01).collect()
      graft.Queries.bloomFixtureDir(spark, sf01)
    }
    val groups = graft.tableio.ParquetStats.int64GroupStats(
      spark, s"$dir/events_bloom", "event_id")
    assert(groups.size >= 4, s"need several row groups, got ${groups.size}")
    assert(groups.forall(_._3), "every row group must carry a bloom filter")
    // the md5-scatter makes min/max skipping useless for the probe keys
    for (k <- Seq(417L, 523L, 611L))
      assert(groups.forall { case (mn, mx, _) => mn <= k && k <= mx },
        s"envelopes must span $k — otherwise min/max could have pruned")
    // the scan itself reads less than half the table: bloom skipping
    // is the only pruning that can explain it
    val df = spark.read.parquet(s"$dir/events_bloom")
      .filter(col("event_id") === 523L)
    val total = graft.tableio.ParquetStats.rowCount(spark, s"$dir/events_bloom")
    assert(df.collect().length == 1) // executes df's own plan → metrics live
    val scanRows = df.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics("numOutputRows").value).sum
    assert(scanRows < total / 2,
      s"scan read $scanRows of $total rows — bloom skipping did not engage")
  }

  test("q111 line dedup: shared blocks removed, docs reconstructed in order") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val header = (1 to 10).map(i => s"h$i").mkString(" ")
    def body(id: Long) = (1 to 25).map(i => s"w${id}_$i").mkString(" ")
    // three docs share the header block; one control doc has none
    val docs = (1L to 3L).map(i => (i, s"$header ${body(i)}")) :+
      (9L, body(9))
    val got = graft.Queries.lineDedup(
      docs.toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.pipeline.TextAnalysis.tokens(col("text")).as("ts")),
      minDocs = 3)
      .as[(Long, Long, Long, String)].collect.toSeq
    // 35 words -> 4 blocks for planted docs (header + 3 body blocks);
    // header removed everywhere; control doc (25 words -> 3 blocks) intact
    def blocksOf(words: Seq[String]) =
      words.grouped(10).map(_.mkString(" ")).toSeq
    val expected = ((1L to 3L).map { i =>
      val kept = blocksOf(body(i).split(" ").toSeq)
      (i, 4L, 3L, md5hex(kept.mkString(" ")))
    } :+ {
      val kept = blocksOf(body(9).split(" ").toSeq)
      (9L, 3L, 3L, md5hex(kept.mkString(" ")))
    }).sortBy(_._1)
    assert(got == expected)
  }

  test("q112 AUC: rank-sum identity on a hand case with a score tie") {
    // type x: scores 1,2,2,3 for events 1..4; positives = events 2,4
    // pinned order (value, event_id): 1(e1,neg) 2(e2,pos) 2(e3,neg) 4(e4,pos)
    // ranks of positives: 2 + 4 = 6; num = 6 - 3 = 3; den = 4; AUC .75
    val ev = Seq(
      (1L, 101L, "x", 1.0), (2L, 100L, "x", 2.0),
      (3L, 101L, "x", 2.0), (4L, 105L, "x", 3.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-q112-").toString
    ev.write.parquet(s"$dir/events.parquet")
    val got = graft.Queries.q112Auc(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect.toSeq
    assert(got == Seq(("x", 2L, 2L, 3L, 4L, 750000L)))
  }

  test("q113 partition pruning: PartitionFilters planned, 1 of 5 files read") {
    val sf01 = "/root/testdata/sf0.01"
    val df = graft.Queries.q113PartitionPruning(spark, sf01)
    val rows = df.collect()
    assert(rows.length == 1)
    val scanPlan = spark.read
      .parquet(s"${graft.Queries.partLayoutDir(spark, sf01)}/events_part")
      .filter(col("event_type") === "purchase")
    assert(scanPlan.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(event_type"),
      "the partition predicate must prune at planning time")
    scanPlan.collect()
    val leaves = scanPlan.queryExecution.executedPlan.collectLeaves()
    val filesRead = leaves.map(_.metrics("numFiles").value).sum
    assert(filesRead == 1,
      s"expected exactly the purchase directory's single file, read $filesRead")
  }

  test("q114 entity clusters: cross-pass matches close into one entity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q114-").toString
    // 1~2 only via pass 2, 1~5 only via pass 1, 2~5 via pass 2:
    // the three close into ONE entity although no single blocking pass
    // sees all three pairs; 3 and 4 stay singletons (absent)
    Seq((1L, "abcdefghijklmnop"), (2L, "aXcdefghijklmnop"),
      (5L, "abcdefghijklmnXp"),
      (3L, "abcdefghZZZZZZZZ"), (4L, "zzzz"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = graft.Queries.q114EntityClusters(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect.toSeq
    assert(got == Seq((1L, 1L, 3L, true), (2L, 1L, 3L, false),
      (5L, 1L, 3L, false)))
  }

  test("q115 gap fill: absent hours appear as explicit zeros") {
    val ev = Seq(
      ("a", "2026-01-01 00:10:00"), ("a", "2026-01-01 00:40:00"),
      ("a", "2026-01-01 03:10:00"), ("b", "2026-01-01 02:05:00"))
      .toDF("event_type", "ts")
    val got = graft.Queries.gapFill(ev)
      .as[(String, Long, Long)].collect.toSeq
    // span hours 0..3 for BOTH types; a: 2,0,0,1; b: 0,0,1,0
    assert(got == Seq(
      ("a", 0L, 2L), ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("b", 0L, 0L), ("b", 1L, 0L), ("b", 2L, 1L), ("b", 3L, 0L)))
  }

  test("q103 KS drift: hand-computed D on a two-sample step-CDF case") {
    val df = (Seq(("xx", 1L), ("xx", 2L), ("xx", 2L), ("xx", 3L)) ++
      Seq(("en", 1L), ("en", 1L), ("en", 2L), ("en", 4L)))
      .toDF("lang", "n_chars")
    val got = graft.Queries.ksDrift(df, "en")
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    // merged support {1,2,3,4}: cum_xx = 1,3,4,4; cum_en = 2,3,3,4
    // d_num = max |cum_l*4 - cum_r*4| = 4 (at v=1 and v=3)
    // d_ppm = 4_000_000 div 16 = 250000 (D = 0.25 exactly)
    assert(got == Seq(("xx", 4L, 4L, 4L, 250000L)))
  }
}
