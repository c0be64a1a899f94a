package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val items = (Seq.fill(5)("apple") ++ Seq.fill(3)("pear") ++
    Seq("plum")).toDF("k")

  test("wide sketch with few keys estimates exactly (no collisions)") {
    val sk = Sketch.countMin(items, "k", depth = 4, width = 4096)
    val probes = Seq("apple", "pear", "plum").toDF("k")
    val got = Sketch.estimate(sk, probes, "k", depth = 4, width = 4096)
      .orderBy("k").as[(String, Long)].collect()
    assert(got.toSeq === Seq(("apple", 5L), ("pear", 3L), ("plum", 1L)))
  }

  test("estimates are upper bounds; width=1 degenerates to the total count") {
    val sk = Sketch.countMin(items, "k", depth = 4, width = 1)
    val probes = Seq("apple", "plum").toDF("k")
    val got = Sketch.estimate(sk, probes, "k", depth = 4, width = 1)
      .orderBy("k").as[(String, Long)].collect()
    // every key hashes to the single counter = N(=9) in every row
    assert(got.toSeq === Seq(("apple", 9L), ("plum", 9L)))
  }

  test("unseen keys estimate 0 when their cells are empty") {
    val sk = Sketch.countMin(items, "k", depth = 4, width = 4096)
    val got = Sketch.estimate(sk, Seq("zzz-unseen").toDF("k"), "k",
      depth = 4, width = 4096).as[(String, Long)].collect()
    assert(got.toSeq === Seq(("zzz-unseen", 0L)))
  }

  test("the grid never exceeds depth x width cells and is partition-invariant") {
    val big = (1 to 500).map(i => s"k$i").toDF("k")
    val sk = Sketch.countMin(big, "k", depth = 3, width = 8)
    assert(sk.count() <= 3L * 8L)
    val a = Sketch.countMin(big.coalesce(1), "k", 3, 8)
      .orderBy("r", "b").collect().toSeq
    val b = Sketch.countMin(big.repartition(13), "k", 3, 8)
      .orderBy("r", "b").collect().toSeq
    assert(a === b)
  }

  test("linear counting: busy state bounded, estimate within 10% at light load") {
    // 600 distinct values into 4096 buckets (~15% load): the Whang et al.
    // regime where the estimate is tight
    val vals = (1 to 1800).map(i => ("g", s"v${i % 600}")).toDF("g", "v")
    val busyRow = Sketch.linearCountBuckets(vals, "g", "v", buckets = 4096)
      .collect()
    assert(busyRow.length === 1)
    val busy = busyRow.head.getLong(1)
    assert(busy <= 600L) // collisions only shrink it
    val est = Sketch.linearCountEstimate(busy, 4096)
    assert(math.abs(est - 600.0) / 600.0 < 0.10, s"estimate $est")
    // duplicates cannot change the sketch state
    val once = (1 to 600).map(i => ("g", s"v$i")).toDF("g", "v")
    val b1 = Sketch.linearCountBuckets(once, "g", "v", 4096)
      .collect().head.getLong(1)
    val b3 = Sketch.linearCountBuckets(once.union(once).union(once), "g", "v", 4096)
      .collect().head.getLong(1)
    assert(b1 === b3)
    // saturation refuses a meaningless estimate
    intercept[IllegalArgumentException] {
      Sketch.linearCountEstimate(16, 16)
    }
  }

  /** JVM-side reference of the register computation: md5 of "hll:"+v,
    * hex chars 18..32 as a 60-bit value, low p bits bucket, rank of the
    * high bits — the same arithmetic the Spark expressions encode.
    */
  private def refRegisters(vals: Seq[String], p: Int): Set[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    vals.map { v =>
      val hex = md.digest(s"hll:$v".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex.substring(17, 32), 16)
      val w = h >>> p
      val wBits = 60 - p
      val r = if (w == 0) wBits + 1L
        else wBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1L
      (h % (1L << p), r)
    }.groupBy(_._1).map { case (b, rs) => (b, rs.map(_._2).max) }.toSet
  }

  test("hll registers: bit-identical to a JVM md5 reference, dup-invariant") {
    val vals = (1 to 200).map(i => s"v$i")
    val df = vals.map(("g", _)).toDF("g", "v")
    val got = Sketch.hllRegisters(df, "g", "v", p = 6)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === refRegisters(vals, 6))
    // duplicates never move a max register
    val got3 = Sketch.hllRegisters(df.union(df).union(df), "g", "v", p = 6)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got3 === got)
    // state is bounded by m regardless of cardinality
    assert(got.size <= 64)
  }

  test("hll merge: union of shard sketches == sketch of the union") {
    val a = (1 to 300).map(i => ("g", s"a$i")).toDF("g", "v")
    val b = (200 to 500).map(i => ("g", s"b$i")).toDF("g", "v")
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(a, "g", "v", p = 7),
      Sketch.hllRegisters(b, "g", "v", p = 7), "g")
      .orderBy("b").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val direct = Sketch.hllRegisters(a.union(b), "g", "v", p = 7)
      .orderBy("b").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(merged === direct)
  }

  test("hll estimate: within 10% at 5k distinct with m=1024, past linear-count saturation") {
    // 5000 distinct into 1024 buckets: a linear-count sketch of the same
    // size is saturated-or-nearly (busy → B); HLL still estimates ~1.04/√m ≈ 3%
    val df = (1 to 5000).map(i => ("g", s"value-$i")).toDF("g", "v")
    val regs = Sketch.hllRegisters(df, "g", "v", p = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val est = Sketch.hllEstimate(regs, p = 10)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.10, s"estimate $est")
    // partition-invariance: the sketch is a pure max semilattice
    val r13 = Sketch.hllRegisters(df.repartition(13), "g", "v", p = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(r13 === regs.sorted)
  }

  test("histogramBuckets: assignment incl. clamped domain stragglers") {
    val df = Seq(("g", -5L), ("g", 0L), ("g", 9L), ("g", 10L), ("g", 15L),
      ("g", 99L), ("g", 100L), ("g", 1000L)).toDF("g", "v")
    val got = Sketch.histogramBuckets(df, "g", "v", lo = 0L, hi = 100L,
        buckets = 10)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    // -5 clamps to 0; 100 and 1000 clamp to 9; 9→0, 10→1, 15→1, 99→9
    assert(got === Seq((0L, 3L), (1L, 2L), (9L, 3L)))
  }

  test("histogram sketch is mergeable: hist(a ∪ b) == summed hists") {
    val rnd = new scala.util.Random(3)
    val a = Seq.fill(60)(("x", rnd.nextInt(200).toLong)).toDF("g", "v")
    val b = Seq.fill(40)(("x", rnd.nextInt(300).toLong - 50)).toDF("g", "v")
    def h(df: org.apache.spark.sql.DataFrame) =
      Sketch.histogramBuckets(df, "g", "v", 0L, 100L, 8)
    val merged = h(a).unionByName(h(b))
      .groupBy("g", "bucket").agg(sum("n").as("n"))
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val full = h(a.unionByName(b))
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(merged === full)
  }

  test("histogramPercentile reads the conservative upper edge") {
    // values 0..9 in [0,10) with 10 buckets: one value per bucket
    val df = (0L to 9L).map(("g", _)).toDF("g", "v")
    val h = Sketch.histogramBuckets(df, "g", "v", 0L, 10L, 10)
    def p(num: Int, den: Int) =
      Sketch.histogramPercentile(h, "g", 0L, 10L, 10, num, den)
        .head().getLong(1)
    assert(p(1, 2) === 5L)   // cum 5 of 10 at bucket 4 → edge 5
    assert(p(95, 100) === 10L) // 9.5 of 10 needs bucket 9 → edge 10
    assert(p(1, 10) === 1L)
  }

  test("histogramBuckets: values far outside the domain clamp to edge " +
      "buckets without overflowing the bucket product") {
    // pre-clamp arithmetic would compute (MaxValue - 0) * 64 → Long wrap
    val df = Seq(("g", Long.MaxValue), ("g", Long.MinValue), ("g", 5L))
      .toDF("g", "v")
    val got = Sketch.histogramBuckets(df, "g", "v", lo = 0L, hi = 64L,
        buckets = 64)
      .orderBy("bucket").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("g", 0L, 1L), ("g", 5L, 1L), ("g", 63L, 1L)))
    // declaring a domain whose width * buckets cannot fit a Long is the
    // caller's error, caught eagerly
    intercept[IllegalArgumentException] {
      Sketch.histogramBuckets(df, "g", "v", 0L, Long.MaxValue, 64)
    }
  }

  private def jvmH32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(24, 32), 16)
  }

  test("kmvSample: bottom-k of the md5 order, bit-equal to a JVM mirror") {
    val keys = (0L until 500L)
    val df = keys.map(("g", _)).toDF("g", "k")
    val got = Sketch.kmvSample(df, "g", "k", k = 16)
      .orderBy("pos").as[(String, Long, Int)].collect().toSeq
    val want = keys.map(x => jvmH32(x.toString)).distinct.sorted.take(16)
    assert(got.map(_._2) === want)
    assert(got.map(_._3) === (1 to 16)) // positions ascend with h
  }

  test("kmvSample: state bounded at k rows per group, whatever the cardinality") {
    val df = (0L until 3000L).map(x => (s"g${x % 3}", x)).toDF("g", "k")
    val s = Sketch.kmvSample(df, "g", "k", k = 32)
    assert(s.groupBy("g").count().as[(String, Long)].collect()
      .forall(_._2 === 32L))
  }

  test("kmvSample: shard-merge == direct build (bottom-k of unioned samples)") {
    val all = (0L until 2000L).map(("g", _))
    val (s1, s2) = all.splitAt(900)
    val direct = Sketch.kmvSample(all.toDF("g", "k"), "g", "k", k = 64)
      .select("g", "h")
    // merge = bottom-k of the UNION of the two shard samples
    val merged = Sketch.kmvSample(s1.toDF("g", "k"), "g", "k", k = 64)
      .select("g", "h")
      .unionAll(Sketch.kmvSample(s2.toDF("g", "k"), "g", "k", k = 64)
        .select("g", "h"))
      .orderBy(col("h").asc).limit(64)
    assert(direct.orderBy("h").as[(String, Long)].collect().toSeq
      === merged.orderBy("h").as[(String, Long)].collect().toSeq)
  }

  test("kmvIntersect: disjoint groups estimate zero; planted overlap lands near truth") {
    // A = [0, 5000), B = [2500, 7500): |A∩B| = 2500; C disjoint
    val rows = (0L until 5000L).map(("A", _)) ++
      (2500L until 7500L).map(("B", _)) ++
      (100000L until 101000L).map(("C", _))
    val s = Sketch.kmvSample(rows.toDF("g", "k"), "g", "k", k = 256)
    val est = Sketch.kmvIntersect(s, "g")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ab = est(("A", "B"))
    assert(math.abs(ab._5 - 2500.0) / 2500.0 < 0.35,
      s"A∩B estimate ${ab._5} too far from 2500")
    assert(est(("A", "C"))._4 === 0L && est(("A", "C"))._5 === 0.0)
    assert(est(("B", "C"))._4 === 0L && est(("B", "C"))._5 === 0.0)
  }

  // ---- KLL-style deterministic quantile sketch ----

  private def kllRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3),
      if (r.isNullAt(4)) -1L else r.getLong(4))).sortBy(identity).toSeq

  test("kllState: below k the sample is the whole group (level 0) and " +
      "the quantile is exact; state is partitioning-invariant") {
    val df = (0L until 50L).map(i => ("g", i, i * 10L)).toDF("g", "id", "v")
    val st = Sketch.kllState(df, "g", "v", "id", k = 64)
    // one meta row + every item at level 0, weight 1
    assert(st.where(col("u").isNull).count() === 1L)
    assert(st.where(col("u").isNotNull).count() === 50L)
    assert(st.agg(max("level")).head.getInt(0) === 0)
    // exact median of 0,10,...,490: smallest v with cum >= 25 of 50
    val q = Sketch.kllQuantile(st, "g", 1, 2).head.getLong(1)
    assert(q === 240L, s"exact level-0 median, got $q")
    val repart = Sketch.kllState(df.repartition(13), "g", "v", "id", k = 64)
    assert(kllRows(st) === kllRows(repart), "state must not depend on partitioning")
  }

  test("kllMerge of disjoint shards is bit-identical to a direct build " +
      "of the union — nested coins re-filter in place") {
    val rows = (0L until 20000L).map(i => (if (i % 3 == 0) "a" else "b", i, i))
    val df = rows.toDF("g", "id", "v")
    val left = df.where(col("id") < 7000)
    val right = df.where(col("id") >= 7000)
    val direct = Sketch.kllState(df, "g", "v", "id", k = 128)
    val merged = Sketch.kllMerge(
      Sketch.kllState(left, "g", "v", "id", k = 128),
      Sketch.kllState(right, "g", "v", "id", k = 128), "g", k = 128)
    assert(kllRows(direct) === kllRows(merged))
    // every group carries exactly one meta row through the merge
    assert(merged.where(col("u").isNull).groupBy("g").count()
      .collect().forall(_.getLong(1) === 1L))
  }

  test("kllQuantile rank error stays within the sample bound on a " +
      "100k-item group sketched at k=256") {
    val n = 100000L
    val df = (0L until n).map(i => ("g", i, i)).toDF("g", "id", "v")
    val st = Sketch.kllState(df, "g", "v", "id", k = 256)
    val sampled = st.where(col("u").isNotNull).count()
    assert(sampled <= 256L && sampled >= 64L,
      s"survivor count $sampled outside the k-band")
    // values ARE ranks here, so |q - p·n| is the rank error directly;
    // allow ~3/sqrt(k_eff) of n (deterministic coins -> fixed outcome,
    // pinned with margin)
    for ((pn, pd) <- Seq((1, 4), (1, 2), (3, 4), (9, 10))) {
      val q = Sketch.kllQuantile(st, "g", pn, pd).head.getLong(1)
      val truth = n * pn / pd
      val tol = (3.0 * n / math.sqrt(sampled.toDouble)).toLong
      assert(math.abs(q - truth) <= tol,
        s"p=$pn/$pd: got $q vs $truth (tol $tol, sample $sampled)")
    }
  }

  test("kllState guards: k >= 2; weights are 2^level and total weight " +
      "approximates n") {
    intercept[IllegalArgumentException] {
      Sketch.kllState(Seq(("g", 1L, 1L)).toDF("g", "id", "v"), "g", "v", "id", 1)
    }
    val df = (0L until 5000L).map(i => ("g", i, i)).toDF("g", "id", "v")
    val st = Sketch.kllState(df, "g", "v", "id", k = 64)
    val lvl = st.agg(max("level")).head.getInt(0)
    assert(lvl === 7, s"5000 items at k=64 need level 7 (64*2^7=8192), got $lvl")
    val totalW = st.where(col("u").isNotNull)
      .agg(sum(expr("shiftleft(1L, level)"))).head.getLong(0)
    assert(math.abs(totalW - 5000L) < 2500L,
      s"total weight $totalW should approximate n=5000")
  }
}
