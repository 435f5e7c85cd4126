package graft.engine

import graft.model.{CorpusDoc, ErrorCode, FetchStateRow}
import graft.seenset.CuckooFilter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * S2: byte-range fetch resume with overlap checksum (`fetch.py:205-217` —
 * the CONT path: an interrupted download leaves a partial file; the next
 * session resumes from `bytes_done` after verifying a checksum of the
 * already-downloaded tail, raising ResumeChecksumFailed /
 * ResumeNotSupported otherwise).
 *
 * The fetch-state TABLE (url, bytes_done, tail_hash) is the distributed
 * stand-in for the reference's partial files on disk: persisted in every
 * snapshot (TableIO), fed back through CrawlConfig.resumeState on restart.
 * In-sandbox "content" is the deterministic rendering of a doc's spans;
 * on a real deploy the hash is over the stored partial bytes.
 */
object FetchResume {

  /** Overlap window checked before resuming (reference checks a tail
    * slice of the partial file). */
  val TailWindow = 64

  /** Deterministic content rendering of a span doc (both engines). */
  def contentOf(doc: CorpusDoc): String =
    doc.spans.map(s => if (s.media_ref.nonEmpty) s.media_ref else s.text)
      .mkString("\n")

  def tailHash(content: String, bytesDone: Long): Long = {
    val hi = math.min(bytesDone, content.length.toLong).toInt
    val lo = math.max(0, hi - TailWindow)
    CuckooFilter.hash64(content.substring(lo, hi))
  }

  /** Resume verdict for one state row against current content:
    * NONE = resumable, NO_RESUME = partial longer than current content,
    * CHECKSUM = overlap hash mismatch (content changed under us). */
  def verdict(content: String, st: FetchStateRow): Int =
    if (st.bytes_done > content.length) ErrorCode.NO_RESUME
    else if (tailHash(content, st.bytes_done) != st.tail_hash) ErrorCode.CHECKSUM
    else ErrorCode.NONE

  /** Pre-pass: state rows that FAIL resume -> (url, resume_error). The
    * result is driver-small (in-flight fetches, not the corpus) and
    * broadcast into the wave's outcome expression. */
  def failedResumes(spark: SparkSession, corpusN: DataFrame,
                    state: Seq[FetchStateRow]): DataFrame = {
    import spark.implicits._
    if (state.isEmpty)
      return spark.emptyDataset[(String, Int)].toDF("url", "_resume_err")
    val stateDf = state.toDF
    stateDf.join(corpusN, col("url") === col("doc_id"), "left")
      .select(col("url"), col("bytes_done"), col("tail_hash"), col("spans"))
      .as[(String, Long, Long, Option[Seq[graft.model.Span]])]
      .flatMap { case (url, bytes, hash, spans) =>
        spans.map { sp =>
          val content = contentOf(CorpusDoc(url, sp))
          (url, verdict(content, FetchStateRow(url, bytes, hash)))
        } // missing doc: DNS wins in the outcome chain anyway
      }
      .filter(_._2 != ErrorCode.NONE)
      .toDF("url", "_resume_err")
  }

  /** Snapshot output: completed fetches as fetch-state rows (bytes_done =
    * full length + tail hash), the table a restarted session feeds back. */
  def stateOf(spark: SparkSession, fetchedUrls: DataFrame,
              corpusN: DataFrame): DataFrame = {
    import spark.implicits._
    fetchedUrls.select(col("url")).distinct()
      .join(corpusN, col("url") === col("doc_id"))
      .select(col("url"), col("spans"))
      .as[(String, Seq[graft.model.Span])]
      .map { case (url, sp) =>
        val content = contentOf(CorpusDoc(url, sp))
        FetchStateRow(url, content.length.toLong,
          tailHash(content, content.length.toLong))
      }.toDF
  }
}
