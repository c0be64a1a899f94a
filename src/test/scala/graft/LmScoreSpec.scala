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
}
