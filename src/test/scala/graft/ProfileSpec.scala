package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers: hand-checked medians, MAD and the 3·MAD cut") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 100L))
      .toDF("g", "v")
    // lower median of [1,2,3,4,100] = 3; |v−3| = [2,1,0,1,97], lower
    // median = 1; outliers beyond 3·1: only 100 (97 > 3)
    val got = Profile.madOutliers(df, "g", "v")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("g", 3L, 1L, 1L)))
  }

  test("madOutliers: even group takes the LOWER median; no interpolation") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L)).toDF("g", "v")
    // (4+1) div 2 = 2nd smallest → med 2; d sorted [0,1,1,2] → mad 1
    val got = Profile.madOutliers(df, "g", "v")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("g", 2L, 1L, 0L)))
  }

  test("madOutliers: constant group has MAD 0 and zero outliers") {
    val df = Seq.fill(7)(("g", 42L)).toDF("g", "v")
    val got = Profile.madOutliers(df, "g", "v")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("g", 42L, 0L, 0L)))
  }

  test("madOutliers is robust where mean/σ is not: one wild value moves nothing") {
    val base = (1L to 99L).map(("g", _))
    val wild = base :+ (("g", 1000000L))
    val a = Profile.madOutliers(base.toDF("g", "v"), "g", "v").head()
    val b = Profile.madOutliers(wild.toDF("g", "v"), "g", "v").head()
    assert(a.getLong(1) === 50L && b.getLong(1) === 50L) // median unmoved
    assert(a.getLong(2) === 25L && b.getLong(2) === 25L) // MAD unmoved
    assert(b.getLong(3) === 1L) // the wild value itself is the one outlier
  }

  test("vocabGrowth: first-occurrence bucketing and cumulative vocabulary") {
    val docs = Seq(
      (0L, "a b"),        // bucket 0: a, b new
      (1L, "a c"),        // bucket 0: c new
      (2L, "b c d"),      // bucket 1: d new
      (3L, "e e a"))      // bucket 1: e new (dups inside a doc count once)
      .toDF("doc_id", "text")
    val got = Profile.vocabGrowth(docs, "doc_id", "text", bucketDocs = 2)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 3L, 3L), (1L, 2L, 5L)))
  }

  test("vocabGrowth: a template-saturated corpus flattens after bucket 0") {
    val docs = (0L until 40L).map(i => (i, "same words every time"))
      .toDF("doc_id", "text")
    val got = Profile.vocabGrowth(docs, "doc_id", "text", bucketDocs = 10)
      .orderBy("bucket").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 4L, 4L))) // all vocabulary in the first bucket
  }

  test("zipfCoverage: hand-checked mass coverage at each k") {
    // frequencies: a×6, b×3, c×1 → total 10
    val docs = Seq((0L, "a a a b"), (1L, "a a a b b c")).toDF("doc_id", "text")
    val got = Profile.zipfCoverage(docs, "text", Seq(1L, 2L, 3L))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 6L, 10L, 0.6), (2L, 9L, 10L, 0.9), (3L, 10L, 10L, 1.0)))
  }

  test("zipfCoverage: frequency ties rank alphabetically; k beyond vocab saturates") {
    val docs = Seq((0L, "b a b a")).toDF("doc_id", "text")
    val got = Profile.zipfCoverage(docs, "text", Seq(1L, 99L))
      .as[(Long, Long, Long, Double)].collect().toSeq
    // a and b tie at 2 — rank 1 is 'a'; k=99 covers everything
    assert(got === Seq((1L, 2L, 4L, 0.5), (99L, 4L, 4L, 1.0)))
  }

  test("zipfCoverage: the ranking never globally sorts the vocabulary") {
    val docs = Seq((0L, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = Profile.zipfCoverage(docs, "text", Seq(3L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a distributed top-k, got:\n$plan")
  }

  private def trend(rows: Seq[(String, Long, Long)]) =
    Profile.trendExact(rows.toDF("g", "x", "y"), "g", "x", "y")
      .select(col("g"), col("n"), col("slope_num").cast("long"),
        col("slope_den").cast("long"))
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("trendExact: hand-checked slope rational on a perfect line") {
    // y = 2x over x ∈ {0,1,2}: num = 3·10 − 3·6 = 12, den = 3·5 − 3² = 6
    val got = trend(Seq(("g", 0L, 0L), ("g", 1L, 2L), ("g", 2L, 4L)))
    assert(got === Seq(("g", 3L, 12L, 6L)))
  }

  test("trendExact: constant y is zero drift; descending y is negative") {
    val got = trend(Seq(
      ("flat", 0L, 7L), ("flat", 1L, 7L), ("flat", 2L, 7L),
      ("down", 0L, 9L), ("down", 1L, 6L), ("down", 2L, 3L)))
    assert(got === Seq(("down", 3L, -18L, 6L), ("flat", 3L, 0L, 6L)))
  }

  test("trendExact: a single-x group degenerates to den 0, never a crash") {
    val got = trend(Seq(("g", 5L, 1L), ("g", 5L, 9L)))
    assert(got === Seq(("g", 2L, 0L, 0L))) // vertical: undefined slope, exact 0/0
  }

  test("ksDrift: identical samples gap 0; disjoint samples hit the max gap") {
    // identical distributions: every bucket's scaled CDFs agree exactly
    val same = (1 to 20).flatMap(i => Seq(("a", i * 10L), ("b", i * 10L)))
      .toDF("g", "v")
    val g0 = Profile.ksDrift(same, "g", "v", "a", "b",
        bucketWidth = 50L, buckets = 8)
      .select("gap_num").as[Long].collect()
    assert(g0.forall(_ === 0L))
    // fully separated distributions: at the boundary cum_a=na, cum_b=0
    // -> gap = na*nb (the KS=1 numerator)
    val apart = ((1 to 10).map(i => ("a", i.toLong)) ++
      (1 to 5).map(i => ("b", 400L + i))).toDF("g", "v")
    val rows = Profile.ksDrift(apart, "g", "v", "a", "b",
        bucketWidth = 50L, buckets = 16)
      .select("bucket", "cum_a", "cum_b", "gap_num")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._4).max === 10L * 5L)
    // values past the last bucket clamp into it instead of vanishing
    val clamped = Profile.ksDrift(apart, "g", "v", "a", "b",
        bucketWidth = 50L, buckets = 4)
      .agg(sum("n_a"), sum("n_b")).as[(Long, Long)].head()
    assert(clamped === ((10L, 5L)))
  }

  test("trendExact aggregates map-side (one shuffle, partial sums below it)") {
    val df = Seq(("g", 1L, 2L)).toDF("g", "x", "y")
    val plan = Profile.trendExact(df, "g", "x", "y")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("tokenTvDrift: hand-checked TV numerators — identical 0, " +
      "disjoint 1000 permille, mixed pair exact") {
    val docs = Seq(
      ("A", "x x y"), ("B", "x z"),          // mixed: num 6 / denom 12
      ("C", "x x y"),                        // identical to A
      ("D", "d1 d2 d3"))                     // disjoint from A
      .toDF("source", "text")
    val got = graft.operators.Profile.tokenTvDrift(docs, "source", "text")
      .select("src_a", "src_b", "n_a", "n_b", "tv_num", "tv_permille")
      .as[(String, String, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.size === 6) // all pairs present, even zero-overlap ones
    // A vs B: counts A{x:2,y:1} N=3, B{x:1,z:1} N=2 ->
    //   |2*2-1*3| + |1*2-0*3| + |0*2-1*3| = 1+2+3 = 6; 6000 div 12 = 500
    assert(got(("A", "B")) === (("A", "B", 3L, 2L, 6L, 500L)))
    // identical sources: zero drift
    assert(got(("A", "C")) === (("A", "C", 3L, 3L, 0L, 0L)))
    // disjoint vocab: num = 2*N_A*N_B -> permille exactly 1000
    assert(got(("A", "D")) === (("A", "D", 3L, 3L, 18L, 1000L)))
  }

  test("tokenTvDrift incremental state: base ⊕ delta merge == from-scratch " +
      "recompute, empty delta is identity") {
    val docs = Seq((1L, "A", "x x y"), (2L, "B", "x z"), (3L, "A", "y w"),
      (4L, "B", "w w x"), (5L, "A", "z q"))
      .toDF("id", "source", "text")
    val P = graft.operators.Profile
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("src_a", "src_b")
        .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    val direct = rows(P.tokenTvDrift(docs, "source", "text"))
    val merged = rows(P.tokenTvDriftFromCounts(P.mergeTokenBucketCounts(Seq(
      P.tokenBucketCounts(docs.where(col("id") <= 2), "source", "text"),
      P.tokenBucketCounts(docs.where(col("id") > 2), "source", "text")))))
    assert(merged === direct, s"merged $merged != direct $direct")
    val withEmpty = rows(P.tokenTvDriftFromCounts(P.mergeTokenBucketCounts(Seq(
      P.tokenBucketCounts(docs, "source", "text"),
      P.tokenBucketCounts(docs.where(lit(false)), "source", "text")))))
    assert(withEmpty === direct)
  }

  test("crossSourceContainment: exact intersections and containments on " +
      "a hand fixture; sketch is exact when k covers the sets and " +
      "tracks the true jaccard when it does not") {
    val P = graft.operators.Profile
    // sources share a 10-token passage; 3-gram sets small + countable
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      ("a", shared + " ax0 ax1 ax2"),
      ("b", shared + " bx0 bx1 bx2 bx3"),
      ("c", "totally disjoint content cx0 cx1 cx2 cx3 cx4 cx5"))
      .toDF("source", "text")
    val exact = P.crossSourceContainment(docs, "source", "text", n = 3)
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // doc a: 11 3-grams (13 toks), doc b: 12, shared prefix grams: the
    // 8 fully-inside-shared + none crossing (suffixes differ)
    val ab = exact(("a", "b"))
    assert(ab._3 === 11L && ab._4 === 12L)
    assert(ab._5 === 8L, ab.toString)
    assert(ab._6 === 8000L / 11L && ab._7 === 8000L / 12L)
    assert(exact(("a", "c"))._5 === 0L)
    // k large enough -> the union bottom-k IS the union: estimate exact
    val sk = P.crossSourceContainmentSketch(docs, "source", "text",
        n = 3, k = 64)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val skAb = sk(("a", "b"))
    // |A u B| = 11 + 12 - 8 = 15 <= 64 -> k_used = 15, inter = 8
    assert(skAb._3 === 15L && skAb._4 === 8L)
    assert(skAb._5 === 8000L / 15L)
    // UNSATURATED sketches are the full sets, so every estimator column
    // is EXACT: sizes, union, intersection — and the asymmetric
    // containments equal the exact matrix's (the r12 Beyer-estimator
    // contract: < k hashes means nothing was ever estimated)
    assert(skAb._6 === 11L && skAb._7 === 12L, skAb.toString) // n_a/b_est
    assert(skAb._8 === 15L && skAb._9 === 8L) // union_est, inter_est
    assert(skAb._10 === 8000L / 11L && skAb._11 === 8000L / 12L)
    assert(sk(("a", "c"))._4 === 0L)
    assert(sk(("a", "c"))._10 === 0L && sk(("a", "c"))._11 === 0L)
    // k SMALLER than the union: the estimate stays in [0, 1000] and
    // within coarse range of the true jaccard (8/15 = 533 permille)
    val tight = P.crossSourceContainmentSketch(docs, "source", "text",
        n = 3, k = 8)
      .select("src_a", "src_b", "k_used", "inter_k", "jac_est_permille")
      .as[(String, String, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val t = tight(("a", "b"))
    assert(t._3 === 8L)
    assert(t._5 >= 0L && t._5 <= 1000L)
    // salt pre-pass parity: any saltFactor gives the same sketch
    val salted = P.crossSourceContainmentSketch(docs, "source", "text",
        n = 3, k = 8, saltFactor = 5)
      .collect().map(_.toSeq).toSeq
    val unsalted = P.crossSourceContainmentSketch(docs, "source", "text",
        n = 3, k = 8, saltFactor = 1)
      .collect().map(_.toSeq).toSeq
    assert(salted === unsalted)
    // INCREMENTAL: batch synopses merged == from-scratch over the
    // union, with source 'a' split ACROSS batches and k=8 genuinely
    // trimming (a's union carries 15 distinct grams) — the bottom-k
    // composition identity at work, the q175 merge == recompute shape
    val b1 = Seq(("a", shared), ("b", shared + " bx0 bx1 bx2 bx3"))
      .toDF("source", "text")
    val b2 = Seq(("a", "ax0 ax1 ax2 ax3 ax4 ax5 ax6 ax7 ax8"),
      ("c", "cc0 cc1 cc2 cc3 cc4")).toDF("source", "text")
    def pairsOf(sets: org.apache.spark.sql.DataFrame) =
      P.containmentFromSketches(sets, k = 8)
        .collect().map(_.toSeq).toSeq
    val direct = pairsOf(
      P.gramBottomK(b1.union(b2), "source", "text", n = 3, k = 8))
    val merged = pairsOf(P.mergeGramBottomK(Seq(
      P.gramBottomK(b1, "source", "text", n = 3, k = 8),
      P.gramBottomK(b2, "source", "text", n = 3, k = 8)), k = 8))
    assert(merged === direct, s"merged $merged != direct $direct")
  }

  test("containment 0-fill contract: a gram-less source (all docs shorter " +
      "than n tokens) still appears in every pair — exact matrix, " +
      "synopsis, sketch matrix, and through the merge") {
    val P = graft.operators.Profile
    val docs = Seq(
      ("a", "a0 a1 a2 a3 a4"),
      ("b", "a0 a1 a2 b3 b4"),
      ("d", "too short")) // 2 tokens, zero 3-grams
      .toDF("source", "text")
    val exact = P.crossSourceContainment(docs, "source", "text", n = 3)
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(exact.keySet === Set(("a", "b"), ("a", "d"), ("b", "d")),
      exact.keySet.toString) // d present despite zero grams (ADVICE r11)
    assert(exact(("a", "d")) === (("a", "d", 3L, 0L, 0L, 0L, 0L)))
    assert(exact(("b", "d"))._4 === 0L)
    // synopsis: d rides as an EMPTY bottom-k, so the sketch matrix has
    // the same every-pair-present shape
    val sets = P.gramBottomK(docs, "source", "text", n = 3, k = 8)
    val bk = sets.as[(String, Seq[Long])].collect().toMap
    assert(bk.keySet === Set("a", "b", "d"))
    assert(bk("d") === Seq.empty[Long] && bk("a").size === 3)
    val skPairs = P.containmentFromSketches(sets, k = 8)
      .select("src_a", "src_b", "k_used", "inter_k", "n_a_est", "n_b_est",
        "cont_a_in_b_est_permille")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(skPairs.keySet === Set(("a", "b"), ("a", "d"), ("b", "d")))
    assert(skPairs(("a", "d")) === (("a", "d", 3L, 0L, 3L, 0L, 0L)))
    // the empty synopsis survives a merge (explode would drop it)
    val merged = P.mergeGramBottomK(Seq(sets, sets), k = 8)
      .as[(String, Seq[Long])].collect().toMap
    assert(merged === bk)
  }
}
