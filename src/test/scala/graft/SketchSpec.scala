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
}
