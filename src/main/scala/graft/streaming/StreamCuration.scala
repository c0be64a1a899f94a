package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.{Decontaminate, Quality, Scrub}

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

  /** Quality rule-pack gate on a streaming document table: only rows
    * passing every Gopher-style gate flow on. Like [[scrubStream]], the
    * gates are stateless row-local integer comparisons
    * ([[Quality.ruleFlags]]), so the same plan runs in append mode with
    * no state and no watermark — this method pins that contract.
    */
  def qualityGateStream(docs: DataFrame, textCol: String,
      minTok: Long = 15L, maxTok: Long = 500L,
      loLen: Long = 3L, hiLen: Long = 8L,
      symPermille: Long = 100L, minStop: Long = 1L): DataFrame = {
    import org.apache.spark.sql.functions.col
    Quality.ruleFlags(docs, textCol, minTok, maxTok, loLen, hiLen,
        symPermille, minStop)
      .where(col("pass"))
      .drop("n_tok", "sum_len", "n_sym", "c_stop",
        "pass_len", "pass_wordlen", "pass_symbol", "pass_stop", "pass")
  }

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
