package graft

import org.apache.spark.sql.functions._

import graft.operators.Contrastive

class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  // 1-d embeddings make distances hand-checkable: id on a number line,
  // label = id % 2 (evens vs odds).
  private def corpus1d(n: Int) =
    (0 until n).map(i => (i.toLong, Array(i.toFloat), (i % 2)))
      .toDF("vec_id", "embedding", "label")

  test("hardNegatives: only opposite-label rows, nearest first") {
    val c = corpus1d(10)
    val got = Contrastive.hardNegatives(c, c.where(col("vec_id") === 4),
        "vec_id", "embedding", "label", "vec_id", "embedding", "label", k = 3)
      .as[(Long, Long, Double)].collect().toSeq
    // anchor 4 (even): odd ids by distance: 3,5 (1.0), 1,7 (9.0) — ties
    // break to lower id
    assert(got === Seq((4L, 3L, 1.0), (4L, 5L, 1.0), (4L, 1L, 9.0)))
  }

  test("hardestPositives: farthest same-label row, anchor excluded") {
    val c = corpus1d(10)
    val got = Contrastive.hardestPositives(c, c.where(col("vec_id") === 0),
        "vec_id", "embedding", "label", "vec_id", "embedding", "label")
      .as[(Long, Long, Double)].collect().toSeq
    // anchor 0 (even): evens 2,4,6,8 — farthest is 8 at 64.0
    assert(got === Seq((0L, 8L, 64.0)))
  }

  test("triplets = negatives tagged 'neg' + one 'pos' row per anchor") {
    val c = corpus1d(12)
    val anchors = c.where(col("vec_id") < 3)
    val got = Contrastive.triplets(c, anchors,
        "vec_id", "embedding", "label", "vec_id", "embedding", "label", k = 2)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got.count(_._2 == "pos") === 3)
    assert(got.count(_._2 == "neg") === 6)
    // every neg row really is opposite-label, every pos row same-label
    got.foreach { case (qid, role, id, _) =>
      if (role == "neg") assert((id % 2) !== (qid % 2))
      else { assert((id % 2) === (qid % 2)); assert(id !== qid) }
    }
  }

  test("hardNegatives matches the brute-force window form bit-for-bit") {
    val c = corpus1d(50)
    val anchors = c.where(col("vec_id") % 11 === 0)
    val got = Contrastive.hardNegatives(c, anchors,
        "vec_id", "embedding", "label", "vec_id", "embedding", "label", k = 4)
      .orderBy("qid", "score", "id")
      .as[(Long, Long, Double)].collect().toSeq
    val a = anchors.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      col("label").as("ql"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").asc, col("id").asc)
    val want = c.crossJoin(a).where(col("label") =!= col("ql"))
      .select(col("qid"), col("vec_id").as("id"),
        graft.functions.VectorFunctions.l2Sq(col("embedding"), col("qv")).as("score"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 4)
      .select("qid", "id", "score").orderBy("qid", "score", "id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === want)
  }

  test("an all-one-label corpus yields no negatives and no positives beyond peers") {
    val c = (0 until 6).map(i => (i.toLong, Array(i.toFloat), 7))
      .toDF("vec_id", "embedding", "label")
    val neg = Contrastive.hardNegatives(c, c.limit(1),
      "vec_id", "embedding", "label", "vec_id", "embedding", "label", k = 3)
    assert(neg.count() === 0)
    val pos = Contrastive.hardestPositives(c, c.where(col("vec_id") === 2),
        "vec_id", "embedding", "label", "vec_id", "embedding", "label")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pos === Seq((2L, 5L, 9.0))) // farthest peer; anchor itself excluded
  }
}
