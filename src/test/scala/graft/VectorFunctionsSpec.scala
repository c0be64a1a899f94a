package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("l2Sq matches hand-computed value and is squared (no sqrt)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 6.0f, 3.0f))).toDF("a", "b")
    val got = df.select(l2Sq($"a", $"b")).head().getDouble(0)
    assert(got === 9.0 + 16.0 + 0.0)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    val got = df.select(cosine($"a", $"b")).collect().map(_.getDouble(0))
    assert(got(0) === 1.0 && got(1) === 0.0)
  }

  test("normalize produces unit norm; zero vector guarded (no NaN)") {
    val df = Seq(Tuple1(Array(3.0f, 4.0f)), Tuple1(Array(0.0f, 0.0f))).toDF("v")
    val out = df.select(normalize($"v")).collect().map(_.getSeq[Double](0))
    assert(math.abs(out(0).map(x => x * x).sum - 1.0) < 1e-12)
    assert(out(1) === Seq(0.0, 0.0)) // not NaN
  }

  test("shardId matches CPython int(md5(key),16) % 4 on fixtures") {
    // expected values computed with CPython hashlib
    val expected = Seq(
      "test_8081" -> 3, "a" -> 1, "key42" -> 3, "" -> 2, "hello world" -> 3,
      "vector-0" -> 2, "αβγ" -> 0, "1234567890" -> 3, "zzz" -> 0, "k" -> 3)
    val got = expected.map(_._1).toDF("key")
      .select($"key", shardId($"key", 4).as("shard"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.foreach { case (k, v) => assert(got(k) === v.toLong, s"key=$k") }
  }

  test("shardId stays in [0, shards) for arbitrary keys") {
    val rnd = new scala.util.Random(42)
    val keys = (1 to 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(24)).mkString)
    val shards = keys.toDF("key").select(shardId($"key", 4)).collect().map(_.getLong(0))
    assert(shards.forall(s => s >= 0 && s < 4))
    assert(shards.distinct.sorted === Seq(0L, 1L, 2L, 3L)) // all shards hit
  }

  test("shardId rejects non-power-of-two-dividing shard counts") {
    intercept[IllegalArgumentException] { shardId(lit("x"), 3) }
  }

  test("dimOk validates length") {
    val df = Seq(Tuple1(Array.fill(512)(0.0f)), Tuple1(Array(1.0f))).toDF("v")
    assert(df.where(dimOk($"v", 512)).count() === 1)
  }
}
