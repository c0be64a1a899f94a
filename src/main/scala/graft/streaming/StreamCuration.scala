package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.{Decontaminate, Scrub}

/** Streaming faces of the curation operators — the continuous-ingest
  * deployment: documents arrive as a stream (crawl drops, WAL CDC) and
  * are scrubbed/decontaminated on the way into the corpus.
  */
object StreamCuration {

  /** PII scrub of a streaming document table. Stateless narrow
    * projections are streaming-compatible as-is, so this IS
    * [[Scrub.scrub]] — the method exists to document that contract and
    * pin it with a spec (no state, no watermark, works in append mode).
    */
  def scrubStream(docs: DataFrame, textCol: String): DataFrame =
    Scrub.scrub(docs, textCol)

  /** Decontaminate a streaming corpus against a STATIC benchmark table:
    * each micro-batch drops docs sharing >= minShared word-n-grams with
    * the bench set ([[Decontaminate.cleanCorpus]] per batch — the gram
    * aggregation needs a batch context; the bench gram set broadcasts
    * exactly as in the batch path).
    */
  def decontaminate(
      docs: DataFrame,          // streaming: (idCol, textCol, ...)
      bench: DataFrame,         // static benchmark table
      idCol: String, textCol: String, n: Int, minShared: Int = 1,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          sink(Decontaminate.cleanCorpus(batch, bench, idCol, textCol, n, minShared),
            epochId)
        }
      }
}
