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

  test("NSW serving: streamed queries at exhaustive beam match exact KNN") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .repartition(4, col("vec_id"))
    val tmp  = Files.createTempDirectory("graft-nswstream-").toString
    val qdir = s"$tmp/queries"
    emb.where(col("vec_id").isin(0L, 19L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .write.parquet(qdir)
    val qstream = spark.readStream
      .schema(spark.read.parquet(qdir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(qdir)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val writer = QueryStream.serveNsw(qstream, emb, "vec_id", "embedding",
      k = 3, efSearch = 1 << 20,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()) {
      (answers, _) =>
        collected ++= answers.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    val q = writer.option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)

    // exhaustive beam ≡ exact: compare to the batch grouped-KNN join
    val batch = graft.operators.TopK.knnJoin(emb,
        emb.where(col("vec_id").isin(0L, 19L))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "vec_id", "embedding", "qid", "qvec", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(collected.sortBy(t => (t._1, t._3, t._2)) ===
      batch.sortBy(t => (t._1, t._3, t._2)).toSeq)
    assert(collected.size === 6) // 2 queries x k=3
  }

  test("NSW serving fails fast when a trigger batch exceeds the driver-collect cap") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val tmp  = Files.createTempDirectory("graft-nswcap-").toString
    val qdir = s"$tmp/queries"
    // one file with 5 query rows against a cap of 2: the batch must be
    // REJECTED with a real message, never silently truncated
    emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .coalesce(1).write.parquet(qdir)
    val qstream = spark.readStream
      .schema(spark.read.parquet(qdir).schema)
      .parquet(qdir)
    val writer = QueryStream.serveNsw(qstream, emb, "vec_id", "embedding",
      k = 3, efSearch = 16, maxQueriesPerTrigger = 2L,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()) {
      (_, _) => ()
    }
    val q = writer.option("checkpointLocation", s"$tmp/ckpt").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("maxQueriesPerTrigger"), messages(e))
  }

  test("PQ serving: streamed queries match the batch ADC join over the encoded corpus") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cb = graft.operators.Pq.deterministicCodebooks(emb, "vec_id", "embedding",
      numSub = 2, numWords = 4)
    // write-side: encode once; serving never reads the vector column
    val encoded = graft.operators.Pq.encode(emb, "vec_id", "embedding", cb)

    val tmp  = Files.createTempDirectory("graft-pqstream-").toString
    val qdir = s"$tmp/queries"
    val queries = emb.where(col("vec_id").isin(3L, 11L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    queries.write.parquet(qdir)
    val qstream = spark.readStream
      .schema(spark.read.parquet(qdir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(qdir)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val writer = QueryStream.servePq(qstream, encoded, "vec_id", cb, k = 4,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()) {
      (answers, _) =>
        collected ++= answers.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    val q = writer.option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)

    val batch = graft.operators.Pq.adcKnnJoin(encoded, queries,
        "vec_id", "qid", "qvec", cb, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(collected.sortBy(t => (t._1, t._3, t._2)) ===
      batch.sortBy(t => (t._1, t._3, t._2)).toSeq)
    assert(collected.size === 8) // 2 queries x k=4
  }

  test("BQ serving: full-overfetch streamed answers equal exact KNN") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val n = emb.count().toInt
    val packed = emb.select(col("vec_id"),
      graft.operators.Bq.packBits(col("embedding"), 64).as("bits"))
    val tmp  = Files.createTempDirectory("graft-bqstream-").toString
    val qdir = s"$tmp/queries"
    emb.where(col("vec_id").isin(0L, 19L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .write.parquet(qdir)
    val qstream = spark.readStream
      .schema(spark.read.parquet(qdir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(qdir)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val writer = QueryStream.serveBq(qstream, packed, emb, "vec_id",
      "embedding", dim = 64, k = 3, rerankFrom = n,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()) {
      (answers, _) =>
        collected ++= answers.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    val q = writer.option("checkpointLocation", s"$tmp/ckpt").start()
    q.awaitTermination(120000)

    // rerankFrom = corpus → exact: compare against the exact batch join
    val batch = graft.operators.TopK.knnJoin(emb,
        emb.where(col("vec_id").isin(0L, 19L))
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "vec_id", "embedding", "qid", "qvec", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(collected.sortBy(t => (t._1, t._3, t._2)) ===
      batch.sortBy(t => (t._1, t._3, t._2)).toSeq)
    assert(collected.size === 6) // 2 queries x k=3
  }
}
