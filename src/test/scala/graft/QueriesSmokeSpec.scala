package graft

/** Smoke: every registered query runs at sf0.001 with a non-degenerate
  * schema, and the oracle registry stays consistent with the query registry.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("oracle keys are a subset of query keys; no empty SQL") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"orphan oracles: ${ok -- qk}")
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
