package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.TopK

class TopKSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("heap aggregator knnJoin == window row_number form, bit-for-bit") {
    val queries = emb.where(col("vec_id") < 5)
    val viaAgg = TopK.knnJoin(emb, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .orderBy("qid", "score", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    val w = Window.partitionBy(col("qid")).orderBy(col("score").asc, col("id").asc)
    val viaWindow = emb.select(col("vec_id").as("id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))))
      .select(col("qid"), col("id"), l2Sq(col("cv"), col("qv")).as("score"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .orderBy("qid", "score", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(viaAgg === viaWindow)
    assert(viaAgg.length === 15) // 5 queries x 3
  }

  test("each query's own row ranks first at score 0") {
    val queries = emb.where(col("vec_id") < 5)
    val firsts = TopK.knnJoin(emb, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .orderBy("qid", "score", "id")
      .collect().groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.head }
    firsts.foreach { case (q, r) =>
      assert(r.getLong(1) === q && r.getDouble(2) === 0.0)
    }
  }
}
