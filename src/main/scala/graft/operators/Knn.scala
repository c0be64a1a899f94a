package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Exact k-nearest-neighbor search — the reference's whole query path
  * (`src/coordinator/handler.py:173-228` + `src/datanode/handler.py:344-408`)
  * as ONE declarative Spark job:
  *
  *   scan → [metadata filter] → score (squared L2) → [threshold] →
  *   orderBy(score, key).limit(k)
  *
  * Catalyst plans the tail as `TakeOrderedAndProject` — per-partition top-k
  * heaps merged on the driver, which IS the reference's scatter-gather merge
  * (`coordinator/handler.py:201-216`) but parallel and shuffle-free: only k
  * rows per partition ever move.
  *
  * Implements for real the two declared-but-dead reference features:
  * metadata equality filter (`vector_db.thrift:26`, dropped at
  * `coordinator/handler.py:186-189`) and score threshold
  * (`vector_db.thrift:27`, commented out at `datanode/handler.py:394-396`).
  * Threshold compares against *squared* L2 (lower = closer), matching
  * hnswlib `space='l2'`.
  */
object Knn {

  /** Analog of the reference `SearchRequest` (`src/vector_db.thrift:23-28`). */
  case class SearchRequest(
      queryVector: Array[Double],
      topK: Int = graft.core.Constants.DefaultTopK,
      filter: Map[String, String] = Map.empty,
      threshold: Option[Double] = None)

  /** Fold a metadata equality map into conjunctive predicates (R6). */
  def metadataFilter(df: DataFrame, metaCol: String, filter: Map[String, String]): DataFrame =
    filter.foldLeft(df) { case (d, (k, v)) => d.where(col(metaCol)(k) === lit(v)) }

  /** Generic exact KNN over any table with a key column and a vector column.
    * Output: (keyCol, score DOUBLE) ascending by (score, key) — the
    * deterministic total order required for oracle parity.
    */
  def search(
      df: DataFrame,
      keyCol: String,
      vecCol: String,
      query: Array[Double],
      k: Int,
      threshold: Option[Double] = None,
      extraFilter: Option[Column] = None): DataFrame = {
    val base     = extraFilter.map(df.where).getOrElse(df)
    val scored   = base.select(col(keyCol), l2Sq(col(vecCol), typedLit(query)).as("score"))
    val bounded  = threshold.map(t => scored.where(col("score") <= lit(t))).getOrElse(scored)
    bounded.orderBy(col("score").asc, col(keyCol).asc).limit(k)
  }

  /** KNN over the canonical keyed vector store (key/vector/metadata schema),
    * honoring the full `SearchRequest` surface.
    */
  def searchStore(store: DataFrame, req: SearchRequest): DataFrame = {
    val filtered = metadataFilter(store, "metadata", req.filter)
    search(filtered, "key", "vector", req.queryVector, req.topK, req.threshold)
  }
}
