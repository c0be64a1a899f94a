package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Contrastive training-pair (triplet) mining over an embedding column.
  *
  * The reference serves plain KNN over its vector table
  * (`interface.thrift` search RPC, squared-L2 per
  * `src/datanode/handler.py:46`); an embedding-model TRAINING pipeline
  * additionally needs, for each anchor vector, (a) the nearest corpus items
  * of a DIFFERENT class — "hard negatives", items that look similar but are
  * labeled apart, the gradient-rich half of a triplet loss — and (b) the
  * farthest item of the SAME class — the "hardest positive" the margin must
  * still pull in. This operator mines both in ONE corpus pass.
  *
  * Scale shape: anchors broadcast (they are the per-batch small side),
  * the corpus streams once through a codegen squared-L2, and each anchor's
  * negatives reduce map-side through [[TopK.SmallestK]] — bytes on the
  * shuffle per anchor are k·(#map tasks), never |corpus|. The hardest
  * positive is a plain `max(struct(score, id))` hash-aggregate over the
  * same scored relation, so it too combines map-side. No row of the corpus
  * is ever materialized per-anchor.
  */
object Contrastive {

  /** Top-k nearest (squared L2) corpus rows whose `labelCol` differs from
    * the anchor's. Output: (qid, id, score), ascending (score, id) per qid.
    */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame,
      corpusId: String, corpusVec: String, corpusLabel: String,
      anchorId: String, anchorVec: String, anchorLabel: String,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val scored = corpus
      .select(col(corpusId).as("id"), col(corpusVec).as("cv"),
        col(corpusLabel).as("cl"))
      .crossJoin(broadcast(anchors.select(col(anchorId).as("qid"),
        col(anchorVec).as("qv"), col(anchorLabel).as("ql"))))
      .where(col("cl") =!= col("ql"))
      .select(col("qid").as("key"), col("id"), l2Sq(col("cv"), col("qv")).as("score"))
      .as[TopK.Scored]
    scored.groupByKey(_.key)
      .agg(new TopK.SmallestK(k).toColumn.name("topk"))
      .toDF("qid", "topk")
      .select(col("qid"), explode(col("topk")).as("n"))
      .select(col("qid"), col("n.id").as("id"), col("n.score").as("score"))
  }

  /** The single farthest same-label corpus row per anchor (anchor itself
    * excluded). Ties break to the higher id (`max` over a (score, id)
    * struct is lexicographic). Output: (qid, id, score).
    */
  def hardestPositives(corpus: DataFrame, anchors: DataFrame,
      corpusId: String, corpusVec: String, corpusLabel: String,
      anchorId: String, anchorVec: String, anchorLabel: String): DataFrame =
    corpus
      .select(col(corpusId).as("id"), col(corpusVec).as("cv"),
        col(corpusLabel).as("cl"))
      .crossJoin(broadcast(anchors.select(col(anchorId).as("qid"),
        col(anchorVec).as("qv"), col(anchorLabel).as("ql"))))
      .where(col("cl") === col("ql") && col("id") =!= col("qid"))
      .select(col("qid"), col("id"), l2Sq(col("cv"), col("qv")).as("score"))
      .groupBy("qid")
      .agg(max(struct(col("score"), col("id"))).as("m"))
      .select(col("qid"), col("m.id").as("id"), col("m.score").as("score"))

  /** Full triplet-mining relation: per anchor, k hard negatives
    * (`role = 'neg'`) plus the hardest positive (`role = 'pos'`).
    * Output: (qid, role, id, score) with a deterministic total order.
    */
  def triplets(corpus: DataFrame, anchors: DataFrame,
      corpusId: String, corpusVec: String, corpusLabel: String,
      anchorId: String, anchorVec: String, anchorLabel: String,
      k: Int): DataFrame = {
    val neg = hardNegatives(corpus, anchors, corpusId, corpusVec, corpusLabel,
        anchorId, anchorVec, anchorLabel, k)
      .select(col("qid"), lit("neg").as("role"), col("id"), col("score"))
    val pos = hardestPositives(corpus, anchors, corpusId, corpusVec, corpusLabel,
        anchorId, anchorVec, anchorLabel)
      .select(col("qid"), lit("pos").as("role"), col("id"), col("score"))
    neg.unionAll(pos)
      .orderBy(col("qid").asc, col("role").asc, col("score").asc, col("id").asc)
  }
}
