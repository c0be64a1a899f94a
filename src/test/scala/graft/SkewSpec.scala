package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("salted two-phase aggregation equals the direct groupBy") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val salted = Skew.saltedCountSum(ev, "event_type", "value",
        saltSource = col("event_id"), salts = 8)
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // counts exact; sums compared with fp tolerance (different add order)
    assert(salted.map(t => (t._1, t._2)) === direct.map(t => (t._1, t._2)))
    salted.zip(direct).foreach { case (s, d) =>
      assert(math.abs(s._3 - d._3) < 1e-6, s"sum mismatch for ${s._1}")
    }
  }

  test("salting actually splits hot keys across sub-groups") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val groups = ev
      .withColumn("_salt", pmod(crc32(col("event_id").cast("string")), lit(8)))
      .groupBy("event_type", "_salt").count()
    // every event_type should occupy all 8 salt buckets at this size
    val perKey = groups.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perKey.values.forall(_ == 8L), perKey.toString)
  }
}
