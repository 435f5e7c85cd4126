package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (`Array[Float]`):
 *
 *  - brute-force cosine top-k — the exact baseline; one scan + one
 *    TakeOrderedAndProject, `zip_with`/`aggregate` keep the dot product
 *    inside whole-stage codegen (no UDF);
 *  - hyperplane-LSH bucketed ANN — the scale path: sign-bit signature
 *    against `bits` fixed seeded random hyperplanes (Charikar'02 SRP);
 *    query probes its bucket (+ optional multiprobe by flipping bits).
 *
 * At 10^10 rows the brute path is a full scan per query; the LSH path
 * turns it into a bucket-pruned scan (expected n / 2^bits candidates per
 * probe) — same shape as a real IVF index, built from plain columns.
 */
object Similarity {

  /** dot(a, b) as a codegen'd column expression. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Exact brute-force cosine top-k against a literal query vector.
    * Deterministic tie-break on id. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(query.map(_.toDouble))
    embeddings
      .withColumn("cosine",
        round(cosine(col(vecCol).cast("array<double>"), q), 6))
      .orderBy(desc("cosine"), asc(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** Deterministic seeded hyperplanes (bits x dim), same on driver and
    * executors — the "index" is pure math, rebuildable anywhere. */
  def hyperplanes(bits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }

  /** Add an LSH `bucket` column: packed sign bits of dot(v, plane_i). */
  def withHyperplaneBucket(df: DataFrame, vecCol: String, bits: Int,
                           dim: Int, seed: Long): DataFrame = {
    val planes = hyperplanes(bits, dim, seed)
    val bucket = (0 until bits).map { i =>
      val plane = typedLit(planes(i).toSeq)
      when(dot(col(vecCol).cast("array<double>"), plane) >= 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    df.withColumn("bucket", bucket)
  }

  /** ANN top-k: probe the query's bucket plus `multiprobe` single-bit
    * flips, exact cosine within candidates. Recall grows with probes. */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, bits: Int = 8, seed: Long = 7L,
              multiprobe: Int = 8): DataFrame = {
    val dim = query.length
    val planes = hyperplanes(bits, dim, seed)
    val qBucket = (0 until bits).map { i =>
      val d = planes(i).zip(query).map { case (p, x) => p * x }.sum
      if (d >= 0) 1L << i else 0L
    }.sum
    val probes = qBucket +: (0 until math.min(multiprobe, bits))
      .map(i => qBucket ^ (1L << i))
    val bucketed = withHyperplaneBucket(embeddings, vecCol, bits, dim, seed)
    val q = typedLit(query.map(_.toDouble))
    bucketed
      .filter(col("bucket").isin(probes: _*))
      .withColumn("cosine",
        round(cosine(col(vecCol).cast("array<double>"), q), 6))
      .orderBy(desc("cosine"), asc(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  // ----------------------------------------------------------------- IVF

  /** Deterministic coarse centroids: the first k vectors by id. One
    * k-means refinement pass would sharpen cells; sampled centroids keep
    * the index fully deterministic and rebuild-free. */
  def sampledCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
                       k: Int): Array[Seq[Double]] =
    embeddings.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0))

  /** Assign each vector to its nearest (max-dot) centroid — an IVF-Flat
    * index as a plain column. At scale: `repartition(cell)` + parquet
    * partitioning makes the probe a partition-pruned scan. */
  def withIvfCell(df: DataFrame, vecCol: String,
                  centroids: Array[Seq[Double]]): DataFrame = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(dot(col(vecCol).cast("array<double>"), typedLit(c)).as("d"),
        lit(i).as("idx"))
    }
    df.withColumn("cell", array_max(array(scored: _*)).getField("idx"))
  }

  /** IVF ANN top-k: probe the nprobe nearest cells, exact cosine within.
    * Expected scan fraction = nprobe / k-cells. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, cells: Int = 16,
              nprobe: Int = 4): DataFrame = {
    val cents = sampledCentroids(embeddings, idCol, vecCol, cells)
    val qd = query.map(_.toDouble)
    val probeCells = cents.zipWithIndex
      .map { case (c, i) => (c.zip(qd).map { case (a, b) => a * b }.sum, i) }
      .sortBy(-_._1).take(nprobe).map(_._2)
    val q = typedLit(qd)
    withIvfCell(embeddings, vecCol, cents)
      .filter(col("cell").isin(probeCells: _*))
      .withColumn("cosine",
        round(cosine(col(vecCol).cast("array<double>"), q), 6))
      .orderBy(desc("cosine"), asc(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** All-pairs exact cosine above a threshold within LSH buckets — the
    * verification join for embedding near-dup (see Dedup). */
  def bucketJoinPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                      bits: Int, dim: Int, seed: Long): DataFrame = {
    val bucketed = withHyperplaneBucket(
      embeddings.select(col(idCol).as("id"), col(vecCol).as("v")), "v",
      bits, dim, seed)
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a").cast("array<double>"),
        col("v_b").cast("array<double>")))
  }
}
