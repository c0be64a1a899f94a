package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffled storage: two tables bucketed the same way on
  * the join key join WITHOUT a shuffle. This is the layout the
  * VectorStore snapshot would use at cluster scale (bucket by `key`) so
  * recurring compactions and hit→row joins are co-located.
  *
  * AQE and auto-broadcast are disabled inside these tests: a broadcast of
  * the 500-row side would avoid the shuffle for the wrong reason and make
  * the assertion vacuous — we want the sort-merge path that a 100 TB
  * fact-fact join would actually take.
  */
class BucketingSpec extends SparkSpec {

  private def withSmjPlan[T](f: => T): T = {
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled")
    val bro = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bro)
    }
  }

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }.size

  /** shared fixture so each test can run standalone */
  private lazy val bucketedTables: Unit = {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    spark.sql("DROP TABLE IF EXISTS emb_a")
    spark.sql("DROP TABLE IF EXISTS emb_b")
    emb.write.mode("overwrite").bucketBy(8, "vec_id").sortBy("vec_id").saveAsTable("emb_a")
    emb.select(col("vec_id"), col("label").as("label_b"))
      .write.mode("overwrite").bucketBy(8, "vec_id").saveAsTable("emb_b")
  }

  test("join of co-bucketed tables plans no shuffle exchange") {
    bucketedTables
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    withSmjPlan {
      val joined = spark.table("emb_a").join(spark.table("emb_b"), "vec_id")
      assert(joined.count() === 500)
      assert(shuffleCount(joined) === 0,
        s"expected shuffle-free co-located join, got:\n${joined.queryExecution.executedPlan}")

      // control: the same join from un-bucketed parquet DOES shuffle
      val unbucketed = emb.join(
        emb.select(col("vec_id"), col("label").as("label_b")), "vec_id")
      assert(shuffleCount(unbucketed) > 0)
    }
  }

  test("aggregation on the bucket key avoids the shuffle") {
    bucketedTables
    withSmjPlan {
      val agg = spark.table("emb_a").groupBy("vec_id").agg(count(lit(1)))
      assert(agg.count() === 500)
      assert(shuffleCount(agg) === 0)
    }
  }
}
