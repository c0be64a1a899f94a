package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Grouped top-k via a typed heap `Aggregator` — SURVEY §4 item 2.
  *
  * `Window` + `row_number <= k` is the declarative form, but it shuffles
  * EVERY scored row to the reducer and sorts whole groups. The aggregator
  * form does map-side partial aggregation: each task reduces its slice of
  * a group to k rows before the shuffle, so bytes-on-the-wire per group
  * drop from |group| to k·(#map tasks). At 100 TB of scored pairs that is
  * the difference between a shuffle that fits and one that doesn't.
  */
object TopK {

  case class Scored(key: Long, id: Long, score: Double)
  case class Neighbor(id: Long, score: Double)

  /** Keeps the k smallest (score, id) per group; emits ascending.
    * The buffer is a bounded max-heap (worst element on top, O(log k)
    * insert); ties break on id so results are deterministic bit-for-bit
    * with the window form.
    */
  class SmallestK(k: Int)
      extends Aggregator[Scored, mutable.PriorityQueue[(Double, Long)], Seq[Neighbor]] {

    // max-heap on (score, id): dequeue removes the current worst
    override def zero: mutable.PriorityQueue[(Double, Long)] =
      mutable.PriorityQueue.empty[(Double, Long)](Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))

    override def reduce(b: mutable.PriorityQueue[(Double, Long)], a: Scored) = {
      b.enqueue((a.score, a.id))
      if (b.size > k) b.dequeue()
      b
    }

    override def merge(b1: mutable.PriorityQueue[(Double, Long)],
        b2: mutable.PriorityQueue[(Double, Long)]) = {
      b2.foreach { e => b1.enqueue(e); if (b1.size > k) b1.dequeue() }
      b1
    }

    override def finish(b: mutable.PriorityQueue[(Double, Long)]): Seq[Neighbor] = {
      val worstFirst: Seq[(Double, Long)] = b.dequeueAll
      worstFirst.reverse.map(t => Neighbor(t._2, t._1))
    }

    override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
      Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]
    override def outputEncoder: Encoder[Seq[Neighbor]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Batch KNN join: top-k corpus neighbors (squared L2) for EVERY query
    * row. Queries are broadcast (they're the small side); scoring streams
    * the corpus once; the heap aggregator reduces map-side.
    * Output: (qid, id, score) ascending (score, id) within each qid.
    */
  def knnJoin(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val scored = corpus.select(col(corpusId).as("id"), col(corpusVec).as("cv"))
      .crossJoin(broadcast(queries.select(col(queryId).as("qid"), col(queryVec).as("qv"))))
      .select(col("qid").as("key"), col("id"), l2Sq(col("cv"), col("qv")).as("score"))
      .as[Scored]
    scored.groupByKey(_.key)
      .agg(new SmallestK(k).toColumn.name("topk"))
      .toDF("qid", "topk")
      .select(col("qid"), explode(col("topk")).as("n"))
      .select(col("qid"), col("n.id").as("id"), col("n.score").as("score"))
  }
}
