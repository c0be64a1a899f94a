package graft

import org.apache.spark.sql.functions._

import graft.operators.Rank

class RankSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Seq(
    (1L, "cat dog cat"),
    (2L, "cat"),
    (3L, "dog mouse"),
    (4L, "bird bird bird")).toDF("doc_id", "text")

  test("bm25 matches the hand-applied formula on a tiny corpus") {
    val got = Rank.bm25(corpus(), "doc_id", "text", Seq("cat", "dog"))
      .orderBy("doc_id")
      .as[(Long, Double, Long, Long)].collect()

    // N=4, sum_dl=9, avgdl=2.25; df(cat)=2, df(dog)=2
    val k1 = 1.2; val b = 0.75
    val avgdl = 9.0 / 4.0
    def idf(df: Long) = math.log(1.0 + (4.0 - df.toDouble + 0.5) / (df.toDouble + 0.5))
    def s(tf: Long, df: Long, dl: Long) =
      idf(df) * (tf.toDouble * (k1 + 1.0)) /
        (tf.toDouble + k1 * ((1.0 - b) + b * dl.toDouble / avgdl))
    val exp = Seq(
      (1L, 0.0 + s(2, 2, 3) + s(1, 2, 3), 2L, 3L), // cat then dog (sorted)
      (2L, 0.0 + s(1, 2, 1), 1L, 1L),
      (3L, 0.0 + s(1, 2, 2), 1L, 2L))
    assert(got.toSeq === exp) // doc 4 matches no term: absent
  }

  test("bm25 orders more-occurrences and rarer-term higher") {
    val docs = Seq(
      (1L, "rare common filler filler"),
      (2L, "common common filler filler"),
      (3L, "common filler filler filler"),
      (4L, "filler filler filler filler"),
      (5L, "filler filler filler filler")).toDF("doc_id", "text")
    val sc = Rank.bm25(docs, "doc_id", "text", Seq("rare", "common"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(sc(1L) > sc(2L), "a rare-term hit outweighs a repeated common term")
    assert(sc(2L) > sc(3L), "tf=2 beats tf=1 at equal length")
  }

  test("rrf fuses two ranked lists with absent ranks contributing zero") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val bl = Seq((3L, 1L), (1L, 2L)).toDF("id", "rank")
    val got = Rank.rrf(Seq(a, bl), "id", "rank")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      (1L, 1.0 / 61.0 + 1.0 / 62.0, Some(1L), Some(2L)),
      (2L, 1.0 / 62.0 + 0.0, Some(2L), None),
      (3L, 1.0 / 63.0 + 1.0 / 61.0, Some(3L), Some(1L))))
  }

  test("ranked assigns 1-based row numbers with the id tie-break") {
    val scored = Seq((5L, 2.0), (9L, 2.0), (1L, 3.0)).toDF("id", "score")
    val got = Rank.ranked(scored, "id", col("score").desc)
      .select("id", "rank").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (5L, 2L), (9L, 3L)))
  }

  test("majorityVote: plurality wins, ties break to the smallest label, " +
      "totals carry agreement") {
    val votes = Seq(
      (1L, "pos"), (1L, "pos"), (1L, "neg"),          // clear majority
      (2L, "neg"), (2L, "pos"),                       // tie -> "neg" (lex)
      (3L, "neu"))                                    // single vote
      .toDF("item", "label")
    val got = Rank.majorityVote(votes, "item", "label")
      .orderBy("item").as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "pos", 2L, 3L), (2L, "neg", 1L, 2L), (3L, "neu", 1L, 1L)))
    // result is partition-order independent (the determinism contract)
    val again = Rank.majorityVote(votes.repartition(7), "item", "label")
      .orderBy("item").as[(Long, String, Long, Long)].collect().toSeq
    assert(again === got)
  }
}
