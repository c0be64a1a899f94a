package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

class TablesSpec extends SparkSpec {

  test("parFloor fires on a tiny parquet input: same rows, floor-many " +
      "partitions") {
    val docs = Tables.documents(spark, sf0001)
    val floored = Tables.parFloor(docs)
    assert(floored.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // row multiset unchanged — the floor is pure layout
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = floored.orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("parFloor is a no-op on non-file sources and above the size gate") {
    import spark.implicits._
    val mem = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    // in-memory frame: no input files -> returned untouched (same plan)
    assert(Tables.parFloor(mem) eq mem)
    // perTaskBytes = 0 puts any file input over the gate -> untouched
    val docs = Tables.documents(spark, sf0001)
    assert(Tables.parFloor(docs, perTaskBytes = 0L) eq docs)
  }
}
