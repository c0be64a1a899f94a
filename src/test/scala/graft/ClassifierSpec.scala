package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // planted two-vocabulary corpus: positives share "science" words,
  // negatives share "spam" words; held-out docs recombine each side's
  // vocabulary in unseen sentences
  private def trainDocs = Seq(
    (0L, "quantum field theory predicts particle decay", 1),
    (1L, "quantum entanglement violates local realism", 1),
    (2L, "particle accelerators probe quantum structure", 1),
    (3L, "field equations constrain particle interactions", 1),
    (4L, "buy cheap pills online casino bonus", 0),
    (5L, "casino bonus free spins buy now", 0),
    (6L, "cheap online casino free bonus pills", 0),
    (7L, "free spins now buy cheap pills", 0))
    .toDF("doc_id", "text", "label")

  private def heldOut = Seq(
    (100L, "particle theory predicts quantum interactions", 1),
    (101L, "entanglement constrains field structure", 1),
    (102L, "cheap casino spins free pills now", 0),
    (103L, "buy bonus pills online now", 0))
    .toDF("doc_id", "text", "label")

  private val B = 512

  test("training separates the planted classes completely") {
    val m = Classifier.train(trainDocs, "doc_id", "text",
      col("label") === 1, buckets = B, iters = 40)
    val scores = Classifier.score(trainDocs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pos = (0L to 3L).map(scores)
    val neg = (4L to 7L).map(scores)
    assert(pos.min > neg.max,
      s"positives must outrank negatives: pos=$pos neg=$neg")
    assert(pos.min > 0.5 && neg.max < 0.5,
      s"calibrated threshold at 0.5: pos=$pos neg=$neg")
  }

  test("generalizes to held-out recombinations of the vocabularies") {
    val m = Classifier.train(trainDocs, "doc_id", "text",
      col("label") === 1, buckets = B, iters = 40)
    val scores = Classifier.score(heldOut, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Seq(100L, 101L).map(scores).min > Seq(102L, 103L).map(scores).max,
      s"held-out separation failed: $scores")
  }

  test("filterByQuality keeps exactly the high-scoring side") {
    val m = Classifier.train(trainDocs, "doc_id", "text",
      col("label") === 1, buckets = B, iters = 40)
    val kept = Classifier.filterByQuality(heldOut, "doc_id", "text", m, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(100L, 101L), s"kept $kept")
  }

  test("codegen scoring kernel is bit-identical to the declarative fold") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Classifier.train(real, "doc_id", "text", col("lang") === "en",
      buckets = 1024, iters = 5)
    val fast = Classifier.score(real, "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val fold = Classifier.scoreFold(real, "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(fast === fold)
  }

  test("scoring pass is row-local: zero Exchange in the plan") {
    val m = Classifier.LogRegModel(Array.fill(B)(0.1), 0.0, B, "qcls:")
    val plan = Classifier.score(trainDocs, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"score must not shuffle:\n$plan")
  }

  test("no cached blocks leak from the training loop") {
    Classifier.train(trainDocs, "doc_id", "text", col("label") === 1,
      buckets = B, iters = 2)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "featurized frame must be unpersisted after train")
  }

  test("real corpus: en-vs-rest classifier separates the language means") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Classifier.train(docs, "doc_id", "text", col("lang") === "en",
      buckets = 2048, iters = 15)
    val means = Classifier.score(docs, "doc_id", "text", m)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(avg("quality_score").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(means("en") > means("zh") && means("en") > means("de"),
      s"en mean must dominate: $means")
  }

  test("more training iterations do not hurt planted separation") {
    val m5 = Classifier.train(trainDocs, "doc_id", "text",
      col("label") === 1, buckets = B, iters = 5)
    val gap = (m: Classifier.LogRegModel) => {
      val s = Classifier.score(trainDocs, "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      (0L to 3L).map(s).min - (4L to 7L).map(s).max
    }
    val m40 = Classifier.train(trainDocs, "doc_id", "text",
      col("label") === 1, buckets = B, iters = 40)
    assert(gap(m40) > gap(m5), "longer training must widen the margin")
  }
}
