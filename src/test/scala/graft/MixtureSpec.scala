package graft

import graft.operators.Mixture

/** Multiplicative-weights domain reweighting semantics; corpus-level
  * oracle parity (5-round unrolled CTE) is q173.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private val P = Mixture.P

  private def traj(rows: Seq[(String, Long, Long)], iters: Int = 3) =
    Mixture.domainReweight(
        rows.toDF("domain", "proxy", "ref"), "domain", "proxy", "ref",
        iters = iters)
      .as[(Long, String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

  test("round 0 is uniform; excess clips at zero and normalizes to P") {
    val t = traj(Seq(
      ("a", 10L, 10L),  // no excess
      ("b", 30L, 10L),  // max excess (20) -> P
      ("c", 20L, 10L),  // half excess -> P/2
      ("d", 5L, 10L)))  // proxy BETTER than ref -> clipped to 0
    val r0 = t(0L)
    assert(r0.map(_._4).toSeq === Seq.fill(4)(P))
    assert(r0.map(_._5).toSeq === Seq.fill(4)(P / 4))
    assert(r0.map(r => r._2 -> r._3).toMap ===
      Map("a" -> 0L, "b" -> P, "c" -> P / 2, "d" -> 0L))
  }

  test("above-mean domains grow, below-mean decay, order by excess") {
    val t = traj(Seq(("a", 10L, 10L), ("b", 30L, 10L), ("c", 20L, 10L)),
      iters = 4)
    val last = t(4L).map(r => r._2 -> r._5).toMap
    assert(last("b") > last("c") && last("c") > last("a"))
    // mixture mass moved away from the zero-excess domain
    assert(last("a") < P / 3 && last("b") > P / 3)
  }

  test("all-equal losses stay exactly uniform through every round") {
    val t = traj(Seq(("a", 10L, 10L), ("b", 10L, 10L), ("c", 10L, 10L)))
    (0L to 3L).foreach { r =>
      assert(t(r).map(_._5).toSeq === Seq.fill(3)(P / 3), s"round $r")
    }
  }

  test("the exact update is reproducible arithmetic, not float drift") {
    // hand-computed first round for (exn, mean): exn = (0, P),
    // mean = (P*0 + P*P)/(2P) = P/2; w' = P*(2P ± P/2)/2P
    val t = traj(Seq(("a", 10L, 10L), ("b", 20L, 10L)), iters = 1)
    val r1 = t(1L).map(r => r._2 -> r._4).toMap
    assert(r1("a") === P * (2 * P - P / 2) / (2 * P))
    assert(r1("b") === P * (2 * P + P / 2) / (2 * P))
  }

  test("per-domain aggregation sums over documents before the loop") {
    // two docs in one domain average to the same excess as one doc at
    // the mean -> identical trajectories
    val two = traj(Seq(("a", 10L, 10L), ("a", 30L, 10L), ("b", 40L, 10L)))
    val one = traj(Seq(("a", 20L, 10L), ("b", 40L, 10L)))
    assert(two(3L).map(r => (r._2, r._4)).toSeq ===
      one(3L).map(r => (r._2, r._4)).toSeq)
  }

  test("guards: empty input and runaway iters fail loud") {
    intercept[IllegalArgumentException] {
      traj(Seq.empty)
    }
    intercept[IllegalArgumentException] {
      traj(Seq(("a", 10L, 10L), ("b", 3000L, 10L)), iters = 200)
    }
  }

  test("domainStats is an additive monoid: base + delta == recompute") {
    val all = Seq(("a", 10L, 5L), ("a", 20L, 5L), ("b", 9L, 2L),
      ("c", 7L, 7L), ("c", 1L, 3L))
    def stats(rows: Seq[(String, Long, Long)]) =
      Mixture.domainStats(rows.toDF("domain", "proxy", "ref"),
        "domain", "proxy", "ref")
    val merged = Mixture.domainReweightFromStats(Mixture.mergeDomainStats(
      Seq(stats(all.take(2)), stats(all.drop(2)))))
    val direct = Mixture.domainReweightFromStats(stats(all))
    assert(merged.orderBy("round", "domain").collect().toSeq ===
      direct.orderBy("round", "domain").collect().toSeq)
  }
}
