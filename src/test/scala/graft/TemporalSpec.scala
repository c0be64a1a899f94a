package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // left: (key, ts, lbl) — right: (key, ts, tie, v)
  private def leftDf = Seq(
    ("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 30L, "c"),
    ("u2", 15L, "d"), ("u3", 5L, "e")
  ).toDF("k", "lts", "lbl")

  private def rightDf = Seq(
    ("u1", 10L, 1L, 100.0), // equal-ts: inclusive boundary must match
    ("u1", 25L, 2L, 200.0),
    ("u2", 99L, 3L, 300.0), // after u2's only left row — never matches
    ("u4", 1L, 4L, 400.0)   // key absent on the left
  ).toDF("k", "rts", "tie", "v")

  test("asofJoin: latest right at-or-before, inclusive, left-outer") {
    val got = Temporal.asofJoin(leftDf, rightDf, "k", "lts", "rts",
        rightPayload = Seq("rts", "v"), rightTie = Seq("tie"))
      .orderBy("k", "lts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_ => r.getLong(3)), Option(r.get(4)).map(_ => r.getDouble(4))))
    assert(got === Array(
      ("u1", 10L, Some(10L), Some(100.0)), // equal ts matches (inclusive)
      ("u1", 20L, Some(10L), Some(100.0)),
      ("u1", 30L, Some(25L), Some(200.0)), // latest wins, not first
      ("u2", 15L, None, None),             // right exists but only later
      ("u3", 5L, None, None)))             // no right rows at all
  }

  test("asofJoin: duplicate right (key, ts) resolves to the greatest tie, atomically") {
    val dup = Seq(
      ("u1", 10L, 1L, 1.0), ("u1", 10L, 9L, 9.0), ("u1", 10L, 5L, 5.0)
    ).toDF("k", "rts", "tie", "v")
    val got = Temporal.asofJoin(leftDf.where($"k" === "u1"), dup, "k", "lts", "rts",
        rightPayload = Seq("v"), rightTie = Seq("tie"))
      .orderBy("lts").collect().map(_.getDouble(3))
    // every matched row carries the tie=9 payload, never a mix
    assert(got === Array(9.0, 9.0, 9.0))
  }

  test("asofJoin matches a window-free oracle on random data") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 200).map(i => (s"u${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i))
      .toDF("k", "lts", "lid")
    val rRows = (1 to 100).map(i => (s"u${rnd.nextInt(6)}", rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble()))
    val r = rRows.toDF("k", "rts", "tie", "v")
    val got = Temporal.asofJoin(l, r, "k", "lts", "rts",
        rightPayload = Seq("rts", "v"), rightTie = Seq("tie"))
      .orderBy("lid").collect()
      .map(x => (x.getInt(2), Option(x.get(3)).map(_ => (x.getLong(3), x.getDouble(4)))))
    val byKey = rRows.groupBy(_._1)
    val want = l.collect().map { row =>
      val (k, lts, lid) = (row.getString(0), row.getLong(1), row.getInt(2))
      val best = byKey.getOrElse(k, Nil).filter(_._2 <= lts)
        .sortBy(x => (x._2, x._3)).lastOption
      (lid, best.map(b => (b._2, b._4)))
    }.sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("rangeJoinBucketed equals the naive non-equi join (inclusive bounds)") {
    val rnd = new scala.util.Random(11)
    val a = (1 to 150).map(i => (s"u${rnd.nextInt(4)}", rnd.nextInt(500).toLong, i)).toDF("ak", "ats", "aid")
    val b = (1 to 150).map(i => (s"u${rnd.nextInt(4)}", rnd.nextInt(500).toLong, i + 1000)).toDF("bk", "bts", "bid")
    for ((lo, hi) <- Seq((0L, 50L), (1L, 37L), (-20L, 20L), (5L, 5L))) {
      val got = Temporal.rangeJoinBucketed(a, b, "ak", "bk", "ats", "bts", lo, hi)
        .select("aid", "bid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val want = a.join(b, $"ak" === $"bk" && $"bts".between($"ats" + lo, $"ats" + hi))
        .select("aid", "bid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(got === want, s"interval [$lo, $hi]")
      // and no pair is ever emitted twice
      val dup = Temporal.rangeJoinBucketed(a, b, "ak", "bk", "ats", "bts", lo, hi).count()
      assert(dup === want.size.toLong, s"duplicate pairs at [$lo, $hi]")
    }
  }

  test("asofJoin plans one window over a union — no join node") {
    val plan = Temporal.asofJoin(leftDf, rightDf, "k", "lts", "rts",
      rightPayload = Seq("v"), rightTie = Seq("tie"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
  }

  test("rangeJoinBucketed plans an equi-join, never a nested loop") {
    val b = rightDf.withColumnRenamed("k", "rk")
    val plan = Temporal.rangeJoinBucketed(leftDf, b, "k", "rk", "lts", "rts", 0L, 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(2000))
  }

  test("rangeJoinBucketed rejects overlapping column names and empty intervals") {
    intercept[IllegalArgumentException] {
      Temporal.rangeJoinBucketed(leftDf, rightDf, "k", "k", "lts", "rts", 0L, 10L)
    }
    val b = rightDf.withColumnRenamed("k", "rk")
    intercept[IllegalArgumentException] {
      Temporal.rangeJoinBucketed(leftDf, b, "k", "rk", "lts", "rts", 10L, 0L)
    }
  }

  // funnel fixture: u1 completes A->B->C in order; u2 has B BEFORE its
  // first A (ordering must reject the early B, but a later B counts);
  // u3 stops at A; u4 has B and C but no A (never enters)
  private def funnelEvents = Seq(
    (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
    (2L, "B", 5L), (2L, "A", 10L), (2L, "B", 15L),
    (3L, "A", 10L),
    (4L, "B", 10L), (4L, "C", 20L))
    .toDF("user_id", "event_type", "ts")

  test("funnel: strict ordering, early steps rejected, chain per user") {
    val got = Temporal.funnel(funnelEvents, "user_id", "event_type", "ts",
        Seq("A", "B", "C"))
      .as[(Int, String, Long)].collect().toSeq
    // A: u1,u2,u3; B after A: u1 (20>10), u2 (15>10); C after B: u1 only
    assert(got === Seq((0, "A", 3L), (1, "B", 2L), (2, "C", 1L)))
  }

  test("funnel: same-timestamp step does NOT advance (strict >)") {
    val ev = Seq((1L, "A", 10L), (1L, "B", 10L)).toDF("user_id", "event_type", "ts")
    val got = Temporal.funnel(ev, "user_id", "event_type", "ts", Seq("A", "B"))
      .as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((0, "A", 1L), (1, "B", 0L)))
  }

  test("funnel maxGap: conversions outside the window do not count") {
    val ev = Seq(
      (1L, "A", 10L), (1L, "B", 15L),   // within gap 10
      (2L, "A", 10L), (2L, "B", 40L),   // outside gap 10
      (3L, "A", 10L), (3L, "B", 20L))   // exactly at the edge (<=) counts
      .toDF("user_id", "event_type", "ts")
    val got = Temporal.funnel(ev, "user_id", "event_type", "ts",
        Seq("A", "B"), maxGap = Some(10L))
      .as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((0, "A", 3L), (1, "B", 2L)))
  }

  test("funnel maxGap: ANCHORED (first-touch) semantics, not existential") {
    // the documented deliberate choice: anchored greedy takes click@40,
    // closing the purchase window at 90 — the compliant alternative
    // chain through click@45 is NOT searched (see scaladoc)
    val ev = Seq(
      (1L, "A", 0L), (1L, "B", 40L), (1L, "B", 45L), (1L, "C", 95L))
      .toDF("user_id", "event_type", "ts")
    val got = Temporal.funnel(ev, "user_id", "event_type", "ts",
        Seq("A", "B", "C"), maxGap = Some(50L))
      .as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((0, "A", 1L), (1, "B", 1L), (2, "C", 0L)))
  }

  test("funnelExists: the counter-example converts; anchored does not") {
    val ev = Seq(
      (1L, "A", 0L), (1L, "B", 40L), (1L, "B", 45L), (1L, "C", 95L))
      .toDF("user_id", "event_type", "ts")
    val anchored = Temporal.funnel(ev, "user_id", "event_type", "ts",
        Seq("A", "B", "C"), maxGap = Some(50L))
      .as[(Int, String, Long)].collect().toSeq
    val exists = Temporal.funnelExists(ev, "user_id", "event_type", "ts",
        Seq("A", "B", "C"), maxGap = 50L)
      .as[(Int, String, Long)].collect().toSeq
    assert(anchored.last._3 == 0L)
    assert(exists === Seq((0, "A", 1L), (1, "B", 1L), (2, "C", 1L)),
      s"existential chain A@0 -> B@45 -> C@95 must count: $exists")
  }

  test("funnelExists >= anchored funnel at every step on random streams") {
    val rnd = new scala.util.Random(7L)
    val types = Vector("A", "B", "C")
    val ev = (0 until 300).map { _ =>
      (rnd.nextInt(25).toLong, types(rnd.nextInt(3)), rnd.nextInt(500).toLong)
    }.toDF("user_id", "event_type", "ts")
    val a = Temporal.funnel(ev, "user_id", "event_type", "ts",
        Seq("A", "B", "C"), maxGap = Some(60L))
      .orderBy("step").select("users").as[Long].collect().toSeq
    val x = Temporal.funnelExists(ev, "user_id", "event_type", "ts",
        Seq("A", "B", "C"), maxGap = 60L)
      .orderBy("step").select("users").as[Long].collect().toSeq
    a.zip(x).foreach { case (av, xv) =>
      assert(xv >= av, s"existential must dominate: $a vs $x")
    }
  }

  test("funnel rejects duplicate steps") {
    intercept[IllegalArgumentException] {
      Temporal.funnel(funnelEvents, "user_id", "event_type", "ts",
        Seq("A", "A"))
    }
  }
}
