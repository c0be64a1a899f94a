package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("epochExpand: full copies exact, fractional coin unbiased-ish, reproducible") {
    import graft.operators.Sampling
    // source A: avail 100 tokens, budget 250 -> 2 full copies + P=0.5
    // extra; source B: avail 100, budget 100 -> exactly 1 copy each;
    // source C: no budget -> dropped
    val df = ((1 to 10).map(i => ("A", i.toLong, 10L)) ++
      (11 to 20).map(i => ("B", i.toLong, 10L)) ++
      (21 to 25).map(i => ("C", i.toLong, 10L)))
      .toDF("source", "id", "n_tok")
    val out = Sampling.epochExpand(df, "id", "n_tok", "source",
      Map("A" -> 250L, "B" -> 100L))
    val perDoc = out.groupBy("source", "id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // B: exactly one copy per doc, copy_idx 0
    (11 to 20).foreach(i => assert(perDoc(("B", i.toLong)) == 1L))
    assert(!perDoc.keys.exists(_._1 == "C"), "unbudgeted source must drop")
    // A: every doc has 2 or 3 copies; total tokens lands near the budget
    (1 to 10).foreach { i =>
      val c = perDoc(("A", i.toLong))
      assert(c == 2L || c == 3L, s"doc $i copies $c")
    }
    val toksA = out.where(col("source") === "A")
      .agg(sum("n_tok")).as[Long].head()
    assert(toksA >= 200L && toksA <= 300L, s"A emitted $toksA of budget 250")
    // copy_idx is a clean 0..c-1 range and the expansion is reproducible
    val again = Sampling.epochExpand(df, "id", "n_tok", "source",
      Map("A" -> 250L, "B" -> 100L))
      .orderBy("source", "id", "copy_idx").collect().map(_.toString).toSeq
    assert(again === out.orderBy("source", "id", "copy_idx")
      .collect().map(_.toString).toSeq)
  }

  test("epochExpand: budgeted-but-unknown source fails loud") {
    import graft.operators.Sampling
    val df = (1 to 5).map(i => ("A", i.toLong, 10L))
      .toDF("source", "id", "n_tok")
    // "B" is budgeted but absent from the corpus (the recipe-typo case):
    // the old inner join silently dropped it; now the plan raises.
    val ex = intercept[Exception] {
      Sampling.epochExpand(df, "id", "n_tok", "source",
        Map("A" -> 100L, "B" -> 50L)).count()
    }
    assert(ex.getMessage.contains("no available tokens"), ex.getMessage)
  }

  test("epochExpand: budgeted source with zero token sum fails loud") {
    import graft.operators.Sampling
    // source Z exists but every row has 0 tokens — `budget div 0` used to
    // null out and silently drop the whole source
    val df = ((1 to 5).map(i => ("A", i.toLong, 10L)) ++
      (6 to 8).map(i => ("Z", i.toLong, 0L)))
      .toDF("source", "id", "n_tok")
    val ex = intercept[Exception] {
      Sampling.epochExpand(df, "id", "n_tok", "source",
        Map("A" -> 100L, "Z" -> 50L)).count()
    }
    assert(ex.getMessage.contains("no available tokens"), ex.getMessage)
    // zero BUDGET on a present source stays fine: expands to nothing
    val out = Sampling.epochExpand(df.where(col("source") === "A"),
      "id", "n_tok", "source", Map("A" -> 0L))
    assert(out.count() == 0L)
  }

  test("temperature allocation: sqrt-rebalanced quotas, head capped, tail boosted") {
    import graft.operators.Sampling
    // head lang 900 docs, tail lang 9: proportional share would be
    // 99 vs 1; sqrt share is 30:3 -> ~91 vs 9 of 100
    val df = ((1 to 900).map(i => ("en", i.toLong)) ++
      (1001 to 1009).map(i => ("is", i.toLong))).toDF("lang", "id")
    val a = Sampling.temperatureAllocation(df, "lang", total = 100L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a("en")._1 == 900L && a("is")._1 == 9L)
    val (en, is) = (a("en")._2, a("is")._2)
    assert(is > 1L, s"tail must be boosted above proportional: $a")
    assert(en < 99L, s"head must be capped below proportional: $a")
    assert(en + is <= 100L)
    // deterministic sample honors quotas exactly and is reproducible
    val s1 = Sampling.temperatureSample(df, "lang", "id", 100L, salt = "x:")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1("en") == en && s1("is") == is)
    val ids = Sampling.temperatureSample(df, "lang", "id", 100L, salt = "x:")
      .select("id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling.temperatureSample(df.repartition(7), "lang", "id",
      100L, salt = "x:").select("id").as[Long].collect().sorted.toSeq
    assert(ids === ids2, "partitioning must not change the sample")
  }

  /** Plain-JVM mirror of the md5-low-32 coin + integer priority key. */
  private def priority(salt: String, id: Long, w: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val u = java.lang.Long.parseLong(hex.substring(24, 32), 16)
    (w * 4294967296L) / (u + 1L)
  }

  private val data = Seq(
    ("g1", 1L, 500L), ("g1", 2L, 10L), ("g1", 3L, 10000L), ("g1", 4L, 7L),
    ("g1", 5L, 900L), ("g2", 6L, 1L), ("g2", 7L, 2L), ("g2", 8L, 3L))

  test("selection matches a driver-side recomputation of the DLT priority") {
    val got = Sampling.prioritySample(data.toDF("g", "id", "w"),
        Seq("g"), "id", "w", n = 2, salt = "t:")
      .select("g", "rk", "id").orderBy("g", "rk")
      .as[(String, Int, Long)].collect().toSeq
    val expected = data.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      rows.map { case (_, id, w) => (id, priority("t:", id, w)) }
        .sortBy { case (id, p) => (-p, id) }
        .take(2).zipWithIndex
        .map { case ((id, _), i) => (g, i + 1, id) }
    }.sorted
    assert(got === expected)
  }

  test("result is invariant to input partitioning") {
    val df = data.toDF("g", "id", "w")
    val one = Sampling.prioritySample(df.coalesce(1), Seq("g"), "id", "w", 3)
      .select("g", "rk", "id").orderBy("g", "rk").collect().toSeq
    val many = Sampling.prioritySample(df.repartition(7), Seq("g"), "id", "w", 3)
      .select("g", "rk", "id").orderBy("g", "rk").collect().toSeq
    assert(one === many)
  }

  test("zero/negative weights never outrank positive ones") {
    val df = Seq(("g", 1L, 0L), ("g", 2L, -5L), ("g", 3L, 1L))
      .toDF("g", "id", "w")
    val got = Sampling.prioritySample(df, Seq("g"), "id", "w", n = 1)
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(3L))
  }

  test("n beyond the group size returns the whole group, ranked") {
    val df = Seq(("g", 1L, 5L), ("g", 2L, 9L)).toDF("g", "id", "w")
    val got = Sampling.prioritySample(df, Seq("g"), "id", "w", n = 10)
    assert(got.count() === 2L)
    assert(got.agg(max("rk")).head().getInt(0) === 2)
  }

  test("a weight at or past 2^31 fails loud, not silently corrupt") {
    val df = Seq(("g", 1L, 1L << 31), ("g", 2L, 1L)).toDF("g", "id", "w")
    val e = intercept[Exception] {
      Sampling.prioritySample(df, Seq("g"), "id", "w", n = 1).collect()
    }
    assert(e.getMessage.contains("2^31") ||
      Option(e.getCause).exists(_.getMessage.contains("2^31")),
      s"unexpected error: ${e.getMessage}")
    // and the guard's boundary itself is safe: 2^31 - 1 ranks fine
    val ok = Seq(("g", 1L, (1L << 31) - 1), ("g", 2L, 1L)).toDF("g", "id", "w")
    assert(Sampling.prioritySample(ok, Seq("g"), "id", "w", n = 1)
      .select("id").as[Long].collect().toSeq === Seq(1L))
  }
}
