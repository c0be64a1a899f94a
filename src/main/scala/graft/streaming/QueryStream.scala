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

  /** PQ serving: like [[serve]], but each micro-batch is answered by the
    * ADC join over a PRE-ENCODED corpus ([[graft.operators.Pq.encode]],
    * the write-side cost paid once at index build) — the streaming face of
    * the FAISS-style serving stack: queries arrive, their M×K ADC tables
    * are computed on the broadcast side, and the corpus scan touches only
    * code arrays, never vectors. The 100-TB shape: the encoded table is
    * ~1/32 the corpus bytes, so serving QPS is bounded by code-scan
    * throughput, not vector I/O.
    */
  def servePq(
      queries: DataFrame,       // streaming: (queryId LONG, queryVec ARRAY<numeric>)
      encodedCorpus: DataFrame, // static: (corpusId, codes) from Pq.encode
      corpusId: String,
      cb: graft.operators.Pq.Codebooks,
      k: Int,
      queryId: String = "qid", queryVec: String = "qvec",
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    queries.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val answers = graft.operators.Pq.adcKnnJoin(encodedCorpus, batch,
            corpusId, queryId, queryVec, cb, k)
          sink(answers, epochId)
        }
      }

  /** BQ serving: like [[servePq]], but the first pass scans PACKED SIGN
    * BITS ([[graft.operators.Bq.packBits]], 1/32 the corpus bytes, paid
    * once at index build) with XOR+popcount Hamming, then exact-re-ranks
    * the `rerankFrom` survivors per query against the full-vector
    * corpus. The cheapest first-pass of the serving tiers; QPS is
    * bounded by packed-scan throughput.
    */
  def serveBq(
      queries: DataFrame,      // streaming: (queryId LONG, queryVec ARRAY<numeric>)
      packedCorpus: DataFrame, // static: (corpusId, bits) from Bq.packBits
      fullCorpus: DataFrame,   // static: (corpusId, vec) for the re-rank
      corpusId: String, corpusVec: String, dim: Int,
      k: Int, rerankFrom: Int = 50,
      queryId: String = "qid", queryVec: String = "qvec",
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    queries.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val answers = graft.operators.Bq.bqKnnJoin(packedCorpus,
            fullCorpus, batch, corpusId, corpusVec, queryId, queryVec,
            dim, k, rerankFrom)
          sink(answers, epochId)
        }
      }

  /** NSW graph serving: like [[serve]], but each micro-batch is answered
    * by the per-partition NSW graph ([[graft.operators.Nsw]]) — the
    * streaming face of the reference's always-on HNSW search. The arriving
    * query batch is collected driver-side (a request batch is tiny by
    * nature) and broadcast into ONE graph build per partition that then
    * answers every query in the batch — bigger trigger batches amortize
    * the build further, exactly the [[graft.operators.Nsw.nswTopKBatch]]
    * economics. Output per batch: (query_id, corpusId, score), k rows per
    * query.
    *
    * `maxQueriesPerTrigger` BOUNDS the driver collect: the query batch
    * lives in driver memory and broadcasts to every task, so an unbounded
    * trigger (e.g. a huge backlog drained by AvailableNow) would be
    * driver-bound. Over-cap batches FAIL FAST with a real message — the
    * fix belongs at the source (`maxOffsetsPerTrigger`/
    * `maxFilesPerTrigger` throttling), not in silent truncation.
    */
  def serveNsw(
      queries: DataFrame,       // streaming: (queryId LONG, queryVec ARRAY<numeric>)
      corpus: DataFrame,        // static: (corpusId, corpusVec)
      corpusId: String, corpusVec: String,
      k: Int, m: Int = 8, efConstruction: Int = 64, efSearch: Int = 64,
      queryId: String = "qid", queryVec: String = "qvec",
      maxQueriesPerTrigger: Long = 65536L,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    queries.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // count BEFORE collect — the check must not itself materialize an
        // unbounded batch on the driver
        val n = batch.count()
        require(n <= maxQueriesPerTrigger,
          s"serveNsw: micro-batch of $n query rows exceeds " +
            s"maxQueriesPerTrigger=$maxQueriesPerTrigger — the batch is " +
            "collected driver-side; throttle the source " +
            "(maxOffsetsPerTrigger/maxFilesPerTrigger) or raise the cap")
        val qs = batch
          .select(col(queryId).cast("long"), col(queryVec).cast("array<double>"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
        if (qs.nonEmpty) {
          val answers = graft.operators.Nsw.nswTopKBatch(corpus, corpusId,
            corpusVec, qs, k, m, efConstruction, efSearch)
          sink(answers, epochId)
        }
      }
}
