package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.VectorStore

/** SURVEY §5(c) property-style invariants, seeded-random so they're
  * reproducible without a scalatest-scalacheck bridge.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  private def randomOps(n: Int, keys: Int) = (0 until n).map { i =>
    val key = s"k${rnd.nextInt(keys)}"
    val del = rnd.nextDouble() < 0.3
    (key, if (del) "DELETE" else "PUT",
      Array(rnd.nextFloat(), rnd.nextFloat()), (i + 1) * 10L)
  }

  test("LWW compaction is insensitive to op arrival order") {
    val ops = randomOps(200, 25)
    def runStore(sequence: Seq[(String, String, Array[Float], Long)]): Map[String, Seq[Double]] = {
      val store = new VectorStore(spark, Files.createTempDirectory("graft-prop-").toString, dim = 2)
      sequence.grouped(40).foreach { chunk =>
        val puts = chunk.filter(_._2 == "PUT")
        if (puts.nonEmpty) store.put(puts.map(o =>
          (o._1, o._3, Map.empty[String, String], o._4)).toDF("key", "vector", "metadata", "ts"))
        val dels = chunk.filter(_._2 == "DELETE")
        if (dels.nonEmpty) store.delete(dels.map(o => (o._1, o._4)).toDF("key", "ts"))
      }
      store.scan.collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    }
    val inOrder  = runStore(ops)
    val shuffled = runStore(rnd.shuffle(ops))
    assert(inOrder === shuffled) // event-time LWW, not arrival-time
    assert(inOrder.nonEmpty)
  }

  test("put then delete (later ts) of every key replays to empty") {
    val store = new VectorStore(spark, Files.createTempDirectory("graft-prop-").toString, dim = 2)
    val keys = (0 until 30).map(i => s"k$i")
    store.put(keys.map(k => (k, Array(1f, 2f), Map.empty[String, String], 10L))
      .toDF("key", "vector", "metadata", "ts"))
    store.delete(keys.map(k => (k, 20L)).toDF("key", "ts"))
    assert(store.scan.count() === 0)
  }

  test("KNN with k >= n returns exactly the live rows") {
    val n = 40
    val df = (0 until n).map(i => (s"k$i", Array(rnd.nextFloat(), rnd.nextFloat())))
      .toDF("key", "vector")
    val got = graft.operators.Knn.search(df, "key", "vector", Array(0.0, 0.0), k = 500)
    assert(got.count() === n)
    assert(got.select("key").distinct().count() === n)
  }

  test("minhash similarity tracks jaccard on generated near-dups") {
    // pairs with controlled overlap: more shared words -> more equal minhashes
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val near = (0 until 40).map(i => if (i < 36) s"w$i" else s"x$i").mkString(" ")
    val far  = (0 until 40).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.minhashed(df, "doc_id", "text")
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count(p => p._1 == p._2)
    assert(agree(sigs(1L), sigs(2L)) > agree(sigs(1L), sigs(3L)))
  }
}
