package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("ruleFlags: each gate judged independently on hand-built docs") {
    val docs = Seq(
      (0L, "s0", "the quick brown fox jumps over the lazy dog again today"), // passes all (10 toks, stops)
      (1L, "s0", "one two"),                               // fails length (2 < 3 minTok)
      (2L, "s0", "a aa aa aa"),                            // mean len (1+2+2+2)/4 < 3 → fails wordlen
      (3L, "s1", "the !!! ??? ;;; ###"),                   // symbol-heavy → fails symbol
      (4L, "s1", "uno dos tres cuatro cinco"))             // no English stopword → fails stop
      .toDF("doc_id", "source", "text")
    val flags = Quality.ruleFlags(docs, "text",
        minTok = 3L, maxTok = 100L, loLen = 3L, hiLen = 8L,
        symPermille = 100L, minStop = 1L)
      .select("doc_id", "pass_len", "pass_wordlen", "pass_symbol", "pass_stop", "pass")
      .orderBy("doc_id")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(flags(0) === ((0L, true, true, true, true, true)))
    assert(!flags(1)._2 && !flags(1)._6)           // length gate
    assert(!flags(2)._3)                           // wordlen gate
    assert(!flags(3)._4)                           // symbol gate
    assert(flags(3)._5)                            // ...but it does contain 'the'
    assert(!flags(4)._5 && flags(4)._2)            // stopword gate only
  }

  test("wordlen gate is exact cross-multiplied integer arithmetic (no fp drift)") {
    // mean token length exactly 3.0: loLen=3 boundary must PASS (<=)
    val docs = Seq((0L, "s", "abc def ghi")).toDF("doc_id", "source", "text")
    val f = Quality.ruleFlags(docs, "text", minTok = 1L, loLen = 3L, hiLen = 3L)
      .select("pass_wordlen").head().getBoolean(0)
    assert(f)
  }

  test("symbol gate boundary: ratio exactly at the threshold fails (strict >)") {
    // text of length 10 with exactly 1 symbol char = 100 permille → the
    // gate needs symPermille·len > 1000·n_sym, 1000 > 1000 is false
    val docs = Seq((0L, "s", "abcd efg,h")).toDF("doc_id", "source", "text")
    assert(docs.select(length(col("text"))).head().getInt(0) === 10)
    val f = Quality.ruleFlags(docs, "text", minTok = 1L, symPermille = 100L)
      .select("pass_symbol").head().getBoolean(0)
    assert(!f)
  }

  test("rejectionReport: totals, survivors and independent fail columns") {
    val docs = Seq(
      (0L, "s0", "the cat sat mat dog fox hen owl"),
      (1L, "s0", "x"),                            // fails len + stop (+wordlen: 1 < 3)
      (2L, "s1", "the cat sat mat dog fox hen owl"))
      .toDF("doc_id", "source", "text")
    val got = Quality.rejectionReport(docs, "source", "text",
        minTok = 3L, maxTok = 100L, loLen = 2L, hiLen = 8L,
        symPermille = 100L, minStop = 1L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("s0", 2L, 1L, 1L, 1L, 0L, 1L),
      ("s1", 1L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("pass column filters the corpus the way the report counts it") {
    val docs = Tables(sf0001)
    val flags = Quality.ruleFlags(docs, "text")
    val nPass = flags.where(col("pass")).count()
    val reported = Quality.rejectionReport(docs, "source", "text")
      .agg(sum("n_pass")).head().getLong(0)
    assert(nPass === reported)
  }

  private def Tables(d: String) = graft.core.Tables.documents(spark, d)
}
