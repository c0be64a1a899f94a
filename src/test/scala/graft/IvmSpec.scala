package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Ivm

class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    ("a", 5L), ("a", -3L), ("a", 7L),
    ("b", 100L), ("b", 100L),
    ("c", 0L))

  test("merge of any split equals the full recompute, group-wise exact") {
    val df = rows.toDF("g", "v")
    val full = Ivm.aggState(df, Seq("g"), "v")
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    // every 2-way split of the 6 rows by index parity/prefix
    for (cut <- 0 to rows.size) {
      val base = rows.take(cut).toDF("g", "v")
      val delta = rows.drop(cut).toDF("g", "v")
      val merged = Ivm.mergeStates(
          Seq(Ivm.aggState(base, Seq("g"), "v"),
            Ivm.aggState(delta, Seq("g"), "v")),
          Seq("g"))
        .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(merged === full, s"split at $cut diverged")
    }
  }

  test("groups present on only one side pass through unchanged") {
    val a = Ivm.aggState(Seq(("x", 1L)).toDF("g", "v"), Seq("g"), "v")
    val b = Ivm.aggState(Seq(("y", 2L)).toDF("g", "v"), Seq("g"), "v")
    val got = Ivm.mergeStates(Seq(a, b), Seq("g"))
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("x", 1L, 1L, 1L, 1L), ("y", 1L, 2L, 2L, 2L)))
  }

  test("persisted view lifecycle: build, refresh with delta, read — " +
      "equals full recompute; versions advance") {
    val dir = Files.createTempDirectory("ivm").toString
    val base = rows.take(4).toDF("g", "v")
    val delta = rows.drop(4).toDF("g", "v")
    Ivm.buildAggView(base, Seq("g"), "v", dir)
    Ivm.refreshAggView(delta, Seq("g"), "v", dir)
    val got = Ivm.readAggView(spark, dir)
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    val full = Ivm.aggState(rows.toDF("g", "v"), Seq("g"), "v")
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === full)
    // both versions exist on disk (v1 build, v2 refresh)
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/v1")))
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/v2")))
  }

  test("reading an unbuilt view fails loudly") {
    val dir = Files.createTempDirectory("ivm-empty").toString
    intercept[IllegalArgumentException] {
      Ivm.readAggView(spark, dir)
    }
  }

  private def hllRows = Seq(
    ("a", 5L, "u1"), ("a", -3L, "u2"), ("a", 7L, "u1"), // u1 repeats
    ("b", 100L, "u3"), ("b", 100L, "u4"),
    ("c", 0L, "u5"))

  test("hll column: merge of any split equals the full recompute " +
      "(registers AND scalars)") {
    val full = Ivm.aggState(hllRows.toDF("g", "v", "u"), Seq("g"), "v",
        hllCol = Some("u"), p = 4)
      .orderBy("g").as[(String, Long, Long, Long, Long, Seq[Long])]
      .collect().toSeq
    assert(full.forall(_._6.length === 16)) // dense 2^p register array
    for (cut <- 0 to hllRows.size) {
      val merged = Ivm.mergeStates(
          Seq(Ivm.aggState(hllRows.take(cut).toDF("g", "v", "u"),
              Seq("g"), "v", hllCol = Some("u"), p = 4),
            Ivm.aggState(hllRows.drop(cut).toDF("g", "v", "u"),
              Seq("g"), "v", hllCol = Some("u"), p = 4)),
          Seq("g"))
        .orderBy("g").as[(String, Long, Long, Long, Long, Seq[Long])]
        .collect().toSeq
      assert(merged === full, s"split at $cut diverged")
    }
  }

  test("merging states built with incompatible widths fails loud") {
    val df = hllRows.toDF("g", "v", "u")
    // hll built at different p: register arrays 16 vs 32 wide — a silent
    // bucket-wise max over those would corrupt the sketch
    val p4 = Ivm.aggState(df, Seq("g"), "v", hllCol = Some("u"), p = 4)
    val p5 = Ivm.aggState(df, Seq("g"), "v", hllCol = Some("u"), p = 5)
    val ex = intercept[Exception] {
      Ivm.mergeStates(Seq(p4, p5), Seq("g")).collect()
    }
    assert(ex.getMessage.contains("width mismatch"), ex.getMessage)
    // hist built with different bucket counts: same guard
    val h8 = Ivm.aggState(df, Seq("g"), "v", histSpec = Some((-10L, 110L, 8)))
    val h16 = Ivm.aggState(df, Seq("g"), "v", histSpec = Some((-10L, 110L, 16)))
    val ex2 = intercept[Exception] {
      Ivm.mergeStates(Seq(h8, h16), Seq("g")).collect()
    }
    assert(ex2.getMessage.contains("width mismatch"), ex2.getMessage)
  }

  test("hll column: registers match Sketch.hllRegisters' sparse form") {
    val df = hllRows.toDF("g", "v", "u")
    val dense = Ivm.aggState(df, Seq("g"), "v", hllCol = Some("u"), p = 4)
      .select(col("g"), posexplode(col("hll")).as(Seq("b", "reg")))
      .where(col("reg") > 0)
      .select(col("g"), col("b").cast("long").as("b"), col("reg"))
      .orderBy("g", "b").as[(String, Long, Long)].collect().toSeq
    val sparse = graft.operators.Sketch.hllRegisters(df, "g", "u", p = 4)
      .orderBy("g", "b").as[(String, Long, Long)].collect().toSeq
    assert(dense === sparse)
  }

  test("hll column: persisted view refresh carries the sketch through") {
    val dir = Files.createTempDirectory("ivm-hll").toString
    Ivm.buildAggView(hllRows.take(3).toDF("g", "v", "u"), Seq("g"), "v",
      dir, hllCol = Some("u"), p = 4)
    Ivm.refreshAggView(hllRows.drop(3).toDF("g", "v", "u"), Seq("g"), "v",
      dir, hllCol = Some("u"), p = 4)
    val got = Ivm.readAggView(spark, dir)
      .orderBy("g").as[(String, Long, Long, Long, Long, Seq[Long])]
      .collect().toSeq
    val full = Ivm.aggState(hllRows.toDF("g", "v", "u"), Seq("g"), "v",
        hllCol = Some("u"), p = 4)
      .orderBy("g").as[(String, Long, Long, Long, Long, Seq[Long])]
      .collect().toSeq
    assert(got === full)
  }

  private def xyRows = Seq(
    ("a", 0L, 10L), ("a", 1L, 13L), ("a", 2L, 16L), ("a", 3L, 19L),
    ("b", 0L, 9L), ("b", 5L, 4L), ("b", 10L, -1L),
    ("c", 7L, 7L))

  test("trend sums: merge of any split equals the full recompute") {
    val full = Ivm.aggState(xyRows.toDF("g", "x", "v"), Seq("g"), "v",
        xCol = Some("x"))
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    for (cut <- 0 to xyRows.size) {
      val merged = Ivm.mergeStates(
          Seq(Ivm.aggState(xyRows.take(cut).toDF("g", "x", "v"), Seq("g"), "v",
              xCol = Some("x")),
            Ivm.aggState(xyRows.drop(cut).toDF("g", "x", "v"), Seq("g"), "v",
              xCol = Some("x"))),
          Seq("g"))
        .orderBy("g")
        .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(merged === full, s"split at $cut diverged")
    }
  }

  test("trendOf on a refreshed view equals Profile.trendExact on all rows") {
    val dir = Files.createTempDirectory("ivm-trend").toString
    val base = xyRows.take(5).toDF("g", "x", "v")
    val delta = xyRows.drop(5).toDF("g", "x", "v")
    Ivm.buildAggView(base, Seq("g"), "v", dir, xCol = Some("x"))
    Ivm.refreshAggView(delta, Seq("g"), "v", dir, xCol = Some("x"))
    val got = Ivm.trendOf(Ivm.readAggView(spark, dir), Seq("g"))
      .select(col("g"), col("n"), col("slope_num").cast("long"),
        col("slope_den").cast("long"))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    val want = graft.operators.Profile.trendExact(
        xyRows.toDF("g", "x", "v"), "g", "x", "v")
      .select(col("g"), col("n"), col("slope_num").cast("long"),
        col("slope_den").cast("long"))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    assert(got === want)
    // sanity: group a is y = 3x + 10 exactly → slope rational reduces to 3
    val a = got.find(_._1 == "a").get
    assert(a._3 === 3L * a._4 && a._4 > 0L)
  }

  test("trend sums ride the hll variant too (both optional columns at once)") {
    val rows = Seq(("g", 1L, 2L, "u1"), ("g", 2L, 4L, "u2"), ("g", 3L, 6L, "u1"))
    val full = Ivm.aggState(rows.toDF("g", "x", "v", "u"), Seq("g"), "v",
        hllCol = Some("u"), p = 4, xCol = Some("x"))
    assert(full.columns.toSeq ===
      Seq("g", "n", "s", "mn", "mx", "sx", "sxy", "sxx", "hll"))
    val merged = Ivm.mergeStates(Seq(
        Ivm.aggState(rows.take(1).toDF("g", "x", "v", "u"), Seq("g"), "v",
          hllCol = Some("u"), p = 4, xCol = Some("x")),
        Ivm.aggState(rows.drop(1).toDF("g", "x", "v", "u"), Seq("g"), "v",
          hllCol = Some("u"), p = 4, xCol = Some("x"))),
      Seq("g"))
    assert(merged.select("g", "n", "s", "mn", "mx", "sx", "sxy", "sxx", "hll")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Seq[Long])]
      .collect().toSeq ===
      full.as[(String, Long, Long, Long, Long, Long, Long, Long, Seq[Long])]
        .collect().toSeq)
  }

  private val histSpec = Some((0L, 16L, 4))

  test("hist column: merge of any split equals the full recompute") {
    val df = rows.toDF("g", "v")
    val full = Ivm.aggState(df, Seq("g"), "v", histSpec = histSpec)
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Seq[Long])].collect().toSeq
    // out-of-domain values (-3, 100) clamp into edge buckets, never error
    for (cut <- 0 to rows.size) {
      val merged = Ivm.mergeStates(Seq(
          Ivm.aggState(rows.take(cut).toDF("g", "v"), Seq("g"), "v",
            histSpec = histSpec),
          Ivm.aggState(rows.drop(cut).toDF("g", "v"), Seq("g"), "v",
            histSpec = histSpec)),
        Seq("g"))
        .orderBy("g")
        .as[(String, Long, Long, Long, Long, Seq[Long])].collect().toSeq
      assert(merged === full, s"split at $cut diverged")
    }
    // bucket counts per group sum to n
    full.foreach { case (_, n, _, _, _, h) => assert(h.sum == n) }
  }

  test("histogramOf matches Sketch.histogramBuckets on the same domain") {
    val df = rows.toDF("g", "v")
    val viaState = Ivm.histogramOf(
        Ivm.aggState(df, Seq("g"), "v", histSpec = histSpec), Seq("g"))
      .orderBy("g", "bucket")
      .as[(String, Long, Long)].collect().toSeq
    val direct = graft.operators.Sketch.histogramBuckets(df, "g", "v",
        lo = 0L, hi = 16L, buckets = 4)
      .orderBy("g", "bucket")
      .as[(String, Long, Long)].collect().toSeq
    assert(viaState === direct)
  }

  test("hist column: persisted lifecycle + streaming batch merge carry it") {
    val dir = Files.createTempDirectory("ivm-hist").toString
    Ivm.buildAggView(rows.take(3).toDF("g", "v"), Seq("g"), "v", dir,
      histSpec = histSpec)
    Ivm.mergeBatch(rows.drop(3).toDF("g", "v"), Seq("g"), "v", dir,
      batchId = 0L, histSpec = histSpec)
    Ivm.mergeBatch(rows.drop(3).toDF("g", "v"), Seq("g"), "v", dir,
      batchId = 0L, histSpec = histSpec) // replay must be a no-op
    val got = Ivm.readAggView(spark, dir)
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Seq[Long])].collect().toSeq
    val full = Ivm.aggState(rows.toDF("g", "v"), Seq("g"), "v",
        histSpec = histSpec)
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Seq[Long])].collect().toSeq
    assert(got === full)
  }

  test("hll + hist in one view is rejected loudly") {
    intercept[IllegalArgumentException] {
      Ivm.aggState(Seq(("g", 1L, "u")).toDF("g", "v", "u"), Seq("g"), "v",
        hllCol = Some("u"), histSpec = histSpec)
    }
  }
}
