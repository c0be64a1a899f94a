package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.TopK

/** Continuous KNN serving: a micro-batch stream of query vectors answered
  * against a static (or slowly-compacting) vector table — the Spark
  * rendering of the reference's always-on search service
  * (`src/coordinator/handler.py:173-228` + `clip/backend.py:37-57`).
  *
  * Global top-k is not expressible inside a streaming aggregation (no
  * ordered-limit on unbounded state), so each micro-batch is answered with
  * the BATCH engine via foreachBatch — the standard pattern for
  * serve-from-snapshot: every arriving query gets exact top-k against the
  * current corpus, and corpus updates show up at the next batch boundary.
  */
object QueryStream {

  /** Wire a query stream (qid, qvec) to a sink fn; each micro-batch runs
    * the grouped-KNN join (map-side top-k heaps) against `corpus`.
    * Default trigger is continuous micro-batching (as-fast-as-possible);
    * pass `Trigger.AvailableNow()` to drain a backlog and stop.
    */
  def serve(
      queries: DataFrame,       // streaming: (queryId LONG, queryVec ARRAY<numeric>)
      corpus: DataFrame,        // static: (corpusId, corpusVec)
      corpusId: String, corpusVec: String,
      k: Int,
      queryId: String = "qid", queryVec: String = "qvec",
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    queries.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val answers = TopK.knnJoin(corpus, batch,
            corpusId, corpusVec, queryId, queryVec, k)
          sink(answers, epochId)
        }
      }
}
