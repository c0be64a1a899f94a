package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.QueryStream

class QueryStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed queries get the same top-k as the batch engine") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

    // stage 3 query vectors as a file stream (ids 0, 7, 19)
    val tmp  = Files.createTempDirectory("graft-qstream-").toString
    val qdir = s"$tmp/queries"
    emb.where(col("vec_id").isin(0L, 7L, 19L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .write.parquet(qdir)
    val qstream = spark.readStream
      .schema(spark.read.parquet(qdir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(qdir)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val writer = QueryStream.serve(qstream, emb, "vec_id", "embedding", k = 3,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()) {
      (answers, _) =>
        collected ++= answers.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    val q = writer.option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)

    val batch = graft.operators.TopK.knnJoin(emb,
        emb.where(col("vec_id").isin(0L, 7L, 19L))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "vec_id", "embedding", "qid", "qvec", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(collected.sortBy(t => (t._1, t._3, t._2)) ===
      batch.sortBy(t => (t._1, t._3, t._2)).toSeq)
    assert(collected.size === 9) // 3 queries x k=3
  }
}
