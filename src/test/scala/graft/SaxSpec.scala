package graft

import org.apache.spark.sql.functions._

import graft.operators.Sax

/** SAX word semantics on hand-computable fixtures; oracle parity over the
  * real events series is q54_series_sax_blocked.
  */
class SaxSpec extends SparkSpec {
  import spark.implicits._

  private def series = Seq(
    (1L, Array(1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0)), // step up   -> aadd
    (2L, Array(3.0, 3.0, 3.0, 3.0, 5.0, 5.0, 5.0, 5.0)), // same SHAPE -> aadd
    (3L, Array(2.0, 2.0, 2.0, 2.0, 1.0, 1.0, 1.0, 1.0)), // step down -> ddaa
    (4L, Array(7.0, 7.0, 7.0, 7.0, 7.0, 7.0, 7.0, 7.0))  // constant  -> bbbb
  ).toDF("user_id", "series")

  test("saxWords: z-norm + PAA + quartile letters, hand-checked") {
    val got = Sax.saxWords(series, "user_id", "series")
      .orderBy("user_id").select("user_id", "sax")
      .as[(Long, String)].collect().toSeq
    // series 1: mean 1.5, std 0.5, z = ±1, paa = (-1,-1,1,1) -> a,a,d,d
    // constant series: std 0 -> z 0 -> paa 0 -> 'b' (0 > -0.6745 only)
    assert(got === Seq((1L, "aadd"), (2L, "aadd"), (3L, "ddaa"), (4L, "bbbb")))
  }

  test("saxBlockedPairs: same-shape series pair up across scale, others don't") {
    val got = Sax.saxBlockedPairs(series, "user_id", "series")
      .select("a", "b", "sax").as[(Long, Long, String)].collect().toSeq
    // z-normalization makes 1 and 2 (same shape, different scale/offset)
    // share "aadd"; 3 and 4 block alone
    assert(got === Seq((1L, 2L, "aadd")))
  }

  test("blocking is an equi-join on the word — no nested loop") {
    val plan = Sax.saxBlockedPairs(series, "user_id", "series")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(3000))
  }

  test("saxWordCol (single-expression form) matches saxWords") {
    val viaOp = Sax.saxWords(series, "user_id", "series")
      .orderBy("user_id").select("sax").as[String].collect().toSeq
    val viaCol = series.orderBy("user_id")
      .select(Sax.saxWordCol(col("series")).as("sax"))
      .as[String].collect().toSeq
    assert(viaCol === viaOp)
  }

  test("segments must divide cleanly in spirit: 2 segments of 4 work too") {
    val got = Sax.saxWords(series, "user_id", "series", segments = 2)
      .orderBy("user_id").select("sax").as[String].collect().toSeq
    assert(got === Seq("ad", "ad", "da", "bb"))
  }
}
