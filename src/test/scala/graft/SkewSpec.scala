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

  test("saltedJoin matches the plain inner join on a skewed key") {
    import spark.implicits._
    // one hot key (999 of 1010 rows) + a long tail
    val big = ((1 to 999).map(i => ("hot", i.toLong)) ++
      (1 to 11).map(i => (s"k$i", i.toLong))).toDF("key", "v")
    val right = (Seq("hot") ++ (1 to 20).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 10L) }.toDF("key", "w")
    val plain = big.join(right, "key")
      .select("key", "v", "w").orderBy("key", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val salted = graft.operators.Skew.saltedJoin(big, right, "key",
        saltSource = col("v"), salts = 8)
      .select("key", "v", "w").orderBy("key", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(salted === plain)
    // the hot key's rows really spread across sub-keys
    val spread = big.where(col("key") === "hot")
      .withColumn("_salt", pmod(crc32(col("v").cast("string")), lit(8)))
      .select("_salt").distinct().count()
    assert(spread === 8L)
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
