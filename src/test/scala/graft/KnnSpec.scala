package graft

import org.apache.spark.sql.functions._

import graft.operators.Knn

class KnnSpec extends SparkSpec {
  import spark.implicits._

  private def store = Seq(
    ("k1", Array(0.0f, 0.0f), Map("tag" -> "test"), 1L),
    ("k2", Array(1.0f, 0.0f), Map("tag" -> "test"), 2L),
    ("k3", Array(0.0f, 2.0f), Map("tag" -> "other"), 3L),
    ("k4", Array(3.0f, 0.0f), Map("tag" -> "test"), 4L)
  ).toDF("key", "vector", "metadata", "ts")

  test("top-k ascending by squared L2 with key tie-break") {
    val got = Knn.search(store, "key", "vector", Array(0.0, 0.0), k = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got === Array(("k1", 0.0), ("k2", 1.0), ("k3", 4.0)))
  }

  test("k larger than table returns all rows") {
    assert(Knn.search(store, "key", "vector", Array(0.0, 0.0), k = 99).count() === 4)
  }

  test("threshold bounds squared distance (R7 semantics, lower = closer)") {
    val got = Knn.search(store, "key", "vector", Array(0.0, 0.0), k = 10,
      threshold = Some(4.0)).collect().map(_.getString(0))
    assert(got === Array("k1", "k2", "k3")) // k4 at 9.0 excluded
  }

  test("metadata equality filter applies before scoring (R6 for real)") {
    val got = Knn.searchStore(store,
      Knn.SearchRequest(Array(0.0, 0.0), topK = 10, filter = Map("tag" -> "test")))
      .collect().map(_.getString(0))
    assert(got === Array("k1", "k2", "k4"))
  }

  test("exact ties break on key ascending") {
    val tied = Seq(
      ("b", Array(1.0f, 0.0f)), ("a", Array(-1.0f, 0.0f)), ("c", Array(0.0f, 1.0f))
    ).toDF("key", "vector")
    val got = Knn.search(tied, "key", "vector", Array(0.0, 0.0), k = 3)
      .collect().map(_.getString(0))
    assert(got === Array("a", "b", "c"))
  }

  test("plan uses TakeOrderedAndProject (no global sort at scale)") {
    val plan = Knn.search(store, "key", "vector", Array(0.0, 0.0), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
