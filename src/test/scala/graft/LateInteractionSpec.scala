package graft

import org.apache.spark.sql.functions._

import graft.operators.LateInteraction

class LateInteractionSpec extends SparkSpec {
  import spark.implicits._

  // doc 1: strong on q-axis-0 only; doc 2: moderate on both axes;
  // doc 3: orthogonal to the query entirely
  // dyadic components only, so float->double widening is exact and the
  // hand arithmetic below is bit-precise
  private def vectors = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.5f, 0.0f, 0.0f)),
    (2L, Seq(0.5f, 0.0f, 0.0f)), (2L, Seq(0.0f, 0.75f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.0f)), (3L, Seq(0.0f, 0.0f, 0.5f)))
    .toDF("doc", "embedding")

  private val query = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))

  test("MaxSim hand-computed: per-query best vector, summed") {
    val got = LateInteraction.maxSimTopK(vectors, "doc", "embedding",
        query, k = 3)
      .as[(Long, Double)].collect().toSeq
    // doc1: max(1.0,0.5)+max(0,0)=1.0; doc2: 0.5+0.75=1.25; doc3: 0
    assert(got === Seq((2L, 1.25), (1L, 1.0), (3L, 0.0)))
  }

  test("k truncates after ranking") {
    val got = LateInteraction.maxSimTopK(vectors, "doc", "embedding",
      query, k = 1).as[(Long, Double)].collect().toSeq
    assert(got === Seq((2L, 1.25)))
  }

  test("plan: one doc shuffle + TakeOrderedAndProject, no join") {
    val plan = LateInteraction.maxSimTopK(vectors, "doc", "embedding",
        query, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      "at most the groupBy exchange (plus AQE read): " + plan.take(2000))
  }

  test("single-vector docs degrade to plain max-dot ranking") {
    val single = vectors.groupBy("doc")
      .agg(first("embedding").as("embedding"))
    val got = LateInteraction.maxSimTopK(single, "doc", "embedding",
      Seq(Seq(1.0, 0.0, 0.0)), k = 3).as[(Long, Double)].collect().toSeq
    assert(got.head._1 == 1L && got.last._2 == 0.0)
  }
}
