package graft

import graft.operators.LmScore

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("docBigrams: consecutive pairs, row-local; short docs drop") {
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"),
      (4L, "  x   y  ")).toDF("doc_id", "text")
    val got = LmScore.docBigrams(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got === Seq((1L, "a b"), (1L, "a b"), (1L, "b a"),
      (2L, "a b"), (2L, "b c"), (4L, "x y")).sorted)
  }

  test("noveltyStats: hand-computed familiarity and hapax") {
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // corpus counts: "a b"->3, "b a"->1, "b c"->1
    val got = LmScore.noveltyStats(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, 3L, 7L, 1L), (2L, 2L, 4L, 1L)))
  }

  test("noveltyStats invariants: familiarity >= n_bigrams >= n_hapax") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = LmScore.noveltyStats(docs, "doc_id", "text")
      .where(org.apache.spark.sql.functions.col("familiarity") <
          org.apache.spark.sql.functions.col("n_bigrams") ||
        org.apache.spark.sql.functions.col("n_hapax") >
          org.apache.spark.sql.functions.col("n_bigrams"))
      .count()
    assert(bad === 0L)
  }

  test("perplexityTiers: thirds by familiarity cutoffs; ties share a tier") {
    import spark.implicits._
    // three repeated-phrase docs (high familiarity), three mixed, three
    // all-unique (every bigram hapax -> lm_milli exactly 1000)
    val docs = Seq(
      (1L, "x y x y x y x y"), (2L, "x y x y x y"), (3L, "x y x y"),
      (4L, "x y p q r s"), (5L, "x y u v w z"), (6L, "p q a b c d"),
      (7L, "m1 m2 m3 m4"), (8L, "k1 k2 k3 k4"), (9L, "j1 j2 j3 j4")
    ).toDF("doc_id", "text")
    val got = graft.operators.LmScore
      .perplexityTiers(docs, "doc_id", "text")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size === 9)
    // the all-hapax docs are the least familiar -> tail, identical
    // scores -> identical tier
    Seq(7L, 8L, 9L).foreach { id =>
      assert(got(id)._1 < 1500L && got(id)._2 === "tail", s"doc $id: ${got(id)}")
    }
    // the repeated-phrase docs carry the top familiarity -> head
    assert(got(1L)._2 === "head", got(1L).toString)
    // monotone: a doc in 'head' never scores below one in 'tail'
    val byTier = got.values.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byTier("head").min >= byTier("tail").max)
  }
}
