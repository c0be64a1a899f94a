package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Late-interaction retrieval (ColBERT, Khattab & Zaharia SIGIR 2020):
  * documents carry MANY vectors (one per token/passage), and relevance is
  * MaxSim — for each query vector take the best-matching document vector,
  * then sum over query vectors:
  *
  *   score(D) = Σ_{q ∈ Q} max_{v ∈ D} q·v
  *
  * The shape that makes this 100-TB safe: ONE groupBy(doc) shuffle
  * assembles each document's vector set (bounded by document length —
  * hundreds, not corpus-sized), after which scoring is a ROW-LOCAL
  * nested fold of the literal query vectors against the doc's own
  * vectors (|Q|·|D|·d flops per doc, whole plan embarrassingly
  * parallel), and the ranking is `orderBy().limit()` ⇒
  * TakeOrderedAndProject — map-side heaps, no global sort. At serving
  * scale the groupBy disappears entirely: store the corpus
  * doc-partitioned (one row per doc, vectors pre-collected) and the
  * query is a pure scan.
  *
  * Float discipline: each q·v is the index-order Double fold (IEEE
  * +,· — bit-stable), max is order-free, and the final sum adds the
  * per-query-vector maxima in FIXED query order — so even the float
  * scores hash-match an engine computing the same folds (q135).
  */
object LateInteraction {

  /** Top-`k` docs by MaxSim. `vectors`: one row per (doc, vector);
    * `queryVecs`: the query's vector set (small — a query is one
    * document's worth). Output: (docCol, score) ranked
    * (score desc, doc asc).
    */
  def maxSimTopK(vectors: DataFrame, docCol: String, vecCol: String,
      queryVecs: Seq[Seq[Double]], k: Int): DataFrame = {
    require(queryVecs.nonEmpty, "maxSimTopK: empty query vector set")
    require(queryVecs.size <= 4096,
      s"maxSimTopK: ${queryVecs.size} query vectors — a query is one " +
        "document, not a corpus")
    val byDoc = vectors.groupBy(col(docCol))
      .agg(collect_list(col(vecCol)).as("__vs"))
    // Σ in FIXED query order (left-assoc), each term an order-free max
    // of bit-stable dots — the whole score is engine-portable
    val score = queryVecs.map { q =>
      val ql = typedLit(q)
      // codegen VectorDistance dot (bit-identical to the fold twin, no
      // per-pair zip_with allocation when eval'd inside the lambda)
      aggregate(col("__vs"), lit(Double.NegativeInfinity),
        (acc, v) => greatest(acc, VectorFunctions.dot(ql, v)))
    }.reduceLeft(_ + _)
    byDoc.select(col(docCol), score.as("score"))
      .orderBy(col("score").desc, col(docCol).asc)
      .limit(k)
  }
}
