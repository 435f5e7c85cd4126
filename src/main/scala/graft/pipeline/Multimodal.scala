package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing for training pipelines.
 *
 * Media payloads are opaque `binary` columns with typed metadata structs —
 * the Spark-side contract (schema, partitioning, batch-shaped processing,
 * row-group-friendly sizes) is real and tested; the actual codec calls are
 * STUBBED behind `MediaCodec` with a deterministic fake, clearly marked:
 * this container has no image/audio libraries. On a real cluster the stub
 * body is replaced by (e.g.) a JNI/Java codec or an Arrow-batched Python
 * worker; nothing else changes.
 *
 * Processing is `mapPartitions` over iterator batches — one codec init per
 * partition (the expensive part in real decoders), streaming through rows
 * without materializing the partition.
 */
object Multimodal {

  /** Typed media row: binary payload + metadata. */
  final case class MediaRow(
      media_id: Long, doc_id: String, kind: String, // image | audio | video
      payload: Array[Byte], mime: String, width: Int, height: Int,
      duration_ms: Int)

  final case class MediaFeatures(
      media_id: Long, doc_id: String, kind: String,
      decoded_ok: Boolean, feature: Seq[Float], n_frames: Int,
      brightness: Double)

  /**
   * STUB CODEC — deterministic fake standing in for the real decoder.
   * Real deploy: replace `decode` with the actual library call; the
   * signature (bytes in, fixed-width feature out) is the stable contract.
   */
  object MediaCodec {
    val FeatureDim = 8

    /** ??? real decoder goes here — deterministic fake for the sandbox:
      * features derive from a rolling hash of the payload, so tests are
      * reproducible and schema/shape are exercised end-to-end. */
    def decode(kind: String, payload: Array[Byte]): (Seq[Float], Int, Double) = {
      var h = 1469598103934665603L
      var i = 0
      while (i < payload.length) { h ^= payload(i); h *= 1099511628211L; i += 1 }
      val feat = (0 until FeatureDim).map { d =>
        (((h >>> (d * 8)) & 0xff).toFloat - 128f) / 128f
      }
      val frames = kind match {
        case "video" => 1 + (math.abs(h) % 32).toInt
        case "audio" => 1 + (math.abs(h) % 16).toInt
        case _ => 1
      }
      val brightness = ((math.abs(h) % 1000) / 1000.0)
      (feat, frames, brightness)
    }
  }

  /** Batch decode/feature-extract: one codec per partition, streamed. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs initialize heavyweight state here, once per partition
      rows.map { m =>
        val (feat, frames, bright) = MediaCodec.decode(m.kind, m.payload)
        MediaFeatures(m.media_id, m.doc_id, m.kind,
          decoded_ok = m.payload.nonEmpty, feat, frames, bright)
      }
    }
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index —
    * pure column math (the decode of each sampled frame is codec work). */
  def frameSamplePlan(features: DataFrame, stride: Int = 4): DataFrame =
    features.filter(col("kind") === "video")
      .withColumn("sampled_frames",
        sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride)))

  /** Size-aware repartitioning for binary tables: media rows are orders of
    * magnitude wider than text — partition count scales with payload
    * bytes, not row count (keeps parquet row groups and shuffle blocks
    * bounded at 100 TB). */
  def repartitionBySize(spark: SparkSession, media: DataFrame,
                        targetPartitionBytes: Long = 128L << 20): DataFrame = {
    val stats = media.agg(
      coalesce(sum(length(col("payload"))), lit(0L)).as("bytes")).head()
    val totalBytes = stats.getLong(0)
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    media.repartition(parts, col("doc_id"))
  }

  /** Deterministic synthetic media table (tests/bench). */
  def synthesize(spark: SparkSession, n: Int, seed: Long = 11L): Dataset[MediaRow] = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = Array.fill(64 + rnd.nextInt(192))(rnd.nextInt().toByte)
      MediaRow(i.toLong, s"http://host${i % 4}.test/d${i % 4}/page${i % 3}.html",
        kind, payload,
        Seq("image/jpeg", "audio/ogg", "video/mp4")(i % 3),
        if (kind == "image") 640 else 0, if (kind == "image") 480 else 0,
        if (kind == "image") 0 else 1000 + rnd.nextInt(9000))
    }.toDS
  }
}
