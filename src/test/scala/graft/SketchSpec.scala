package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val items = (Seq.fill(5)("apple") ++ Seq.fill(3)("pear") ++
    Seq("plum")).toDF("k")

  test("wide sketch with few keys estimates exactly (no collisions)") {
    val sk = Sketch.countMin(items, "k", depth = 4, width = 4096)
    val probes = Seq("apple", "pear", "plum").toDF("k")
    val got = Sketch.estimate(sk, probes, "k", depth = 4, width = 4096)
      .orderBy("k").as[(String, Long)].collect()
    assert(got.toSeq === Seq(("apple", 5L), ("pear", 3L), ("plum", 1L)))
  }

  test("estimates are upper bounds; width=1 degenerates to the total count") {
    val sk = Sketch.countMin(items, "k", depth = 4, width = 1)
    val probes = Seq("apple", "plum").toDF("k")
    val got = Sketch.estimate(sk, probes, "k", depth = 4, width = 1)
      .orderBy("k").as[(String, Long)].collect()
    // every key hashes to the single counter = N(=9) in every row
    assert(got.toSeq === Seq(("apple", 9L), ("plum", 9L)))
  }

  test("unseen keys estimate 0 when their cells are empty") {
    val sk = Sketch.countMin(items, "k", depth = 4, width = 4096)
    val got = Sketch.estimate(sk, Seq("zzz-unseen").toDF("k"), "k",
      depth = 4, width = 4096).as[(String, Long)].collect()
    assert(got.toSeq === Seq(("zzz-unseen", 0L)))
  }

  test("the grid never exceeds depth x width cells and is partition-invariant") {
    val big = (1 to 500).map(i => s"k$i").toDF("k")
    val sk = Sketch.countMin(big, "k", depth = 3, width = 8)
    assert(sk.count() <= 3L * 8L)
    val a = Sketch.countMin(big.coalesce(1), "k", 3, 8)
      .orderBy("r", "b").collect().toSeq
    val b = Sketch.countMin(big.repartition(13), "k", 3, 8)
      .orderBy("r", "b").collect().toSeq
    assert(a === b)
  }

  test("linear counting: busy state bounded, estimate within 10% at light load") {
    // 600 distinct values into 4096 buckets (~15% load): the Whang et al.
    // regime where the estimate is tight
    val vals = (1 to 1800).map(i => ("g", s"v${i % 600}")).toDF("g", "v")
    val busyRow = Sketch.linearCountBuckets(vals, "g", "v", buckets = 4096)
      .collect()
    assert(busyRow.length === 1)
    val busy = busyRow.head.getLong(1)
    assert(busy <= 600L) // collisions only shrink it
    val est = Sketch.linearCountEstimate(busy, 4096)
    assert(math.abs(est - 600.0) / 600.0 < 0.10, s"estimate $est")
    // duplicates cannot change the sketch state
    val once = (1 to 600).map(i => ("g", s"v$i")).toDF("g", "v")
    val b1 = Sketch.linearCountBuckets(once, "g", "v", 4096)
      .collect().head.getLong(1)
    val b3 = Sketch.linearCountBuckets(once.union(once).union(once), "g", "v", 4096)
      .collect().head.getLong(1)
    assert(b1 === b3)
    // saturation refuses a meaningless estimate
    intercept[IllegalArgumentException] {
      Sketch.linearCountEstimate(16, 16)
    }
  }
}
