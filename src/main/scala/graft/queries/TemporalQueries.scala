package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Temporal

/** q48–q49: point-in-time joins over the events stream — the as-of and
  * bounded-interval primitives of feature/attribution pipelines.
  *
  * Timestamp parity: events.parquet is TIMESTAMP(NANOS) with NONZERO
  * sub-µs digits, and DuckDB truncates reads to µs — so every comparison
  * here happens on `ts div 1000` (µs) integers on BOTH engines, or
  * interval boundaries would diverge on the sub-µs remainder. (user_id,
  * µs) is collision-free in the fixtures, so µs order is total per user.
  */
object TemporalQueries {

  val all: Seq[QueryDef] = Seq(

    // Backward as-of join: each click is attributed to the user's latest
    // purchase at-or-before it (left-outer: clicks before any purchase
    // keep null attribution). Oracle = DuckDB's native ASOF LEFT JOIN —
    // a genuinely independent implementation of the same semantics.
    QueryDef("q48_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click" && col("user_id") < 30)
          .select(col("user_id"), expr("ts div 1000").as("click_us"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), expr("ts div 1000").as("purchase_us"),
            col("value").as("purchase_value"))
        Temporal.asofJoin(clicks, purchases, "user_id",
            leftTs = "click_us", rightTs = "purchase_us",
            rightPayload = Seq("purchase_us", "purchase_value"))
          .orderBy(col("user_id"), col("click_us"))
      },
      Some("""WITH c AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS click_us
        |        FROM events WHERE event_type = 'click' AND user_id < 30),
        |     p AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS purchase_us, value AS purchase_value
        |        FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_us, p.purchase_us, p.purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.click_us >= p.purchase_us
        |ORDER BY c.user_id, c.click_us""".stripMargin)),

    // Bounded-interval range join: errors within the hour AFTER each
    // signup, counted per signup (zero kept via the count join-back).
    // The Spark plan is the binned equi-join — no BroadcastNestedLoopJoin
    // (plan-pinned in PlanShapeSpec) — while the oracle states the naive
    // inequality join; matching proves the binning is lossless.
    QueryDef("q49_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val signups = ev.where(col("event_type") === "signup" && col("user_id") < 40)
          .select(col("user_id"), expr("ts div 1000").as("signup_us"))
        val errors = ev.where(col("event_type") === "error")
          .select(col("user_id").as("e_user"), expr("ts div 1000").as("err_us"))
        // strictly-after lower bound on µs integers: ts + 1
        val hits = Temporal.rangeJoinBucketed(signups, errors,
            leftKey = "user_id", rightKey = "e_user",
            leftTs = "signup_us", rightTs = "err_us",
            lo = 1L, hi = 3600000000L)
          .groupBy(col("user_id"), col("signup_us"))
          .agg(count(lit(1)).as("n_errors"))
        signups.join(hits, Seq("user_id", "signup_us"), "left")
          .select(col("user_id"), col("signup_us"),
            coalesce(col("n_errors"), lit(0L)).as("n_errors"))
          .orderBy(col("user_id"), col("signup_us"))
      },
      Some("""WITH s AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS signup_us
        |        FROM events WHERE event_type = 'signup' AND user_id < 40),
        |     e AS (SELECT user_id AS e_user, CAST(epoch_us(ts) AS BIGINT) AS err_us
        |        FROM events WHERE event_type = 'error')
        |SELECT s.user_id, s.signup_us, COUNT(e.err_us) AS n_errors
        |FROM s LEFT JOIN e ON s.user_id = e.e_user
        |  AND e.err_us > s.signup_us AND e.err_us <= s.signup_us + 3600000000
        |GROUP BY s.user_id, s.signup_us
        |ORDER BY s.user_id, s.signup_us""".stripMargin)),

    // Rolling 3-event window per user (ROWS 2 PRECEDING..CURRENT): the
    // moving-aggregate surface. Sums run over floor(value*1000) BIGINTs —
    // association-free exact integers, because engines are free to
    // re-associate float window sums (segment trees vs running buffers)
    // and a double sum would be a latent parity break; floor (not cast)
    // because Spark truncates double→long while DuckDB rounds. (user_id,
    // µs) is collision-free in the fixtures, so the frame order is total.
    QueryDef("q58_rolling_window",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("us"))
          .rowsBetween(-2, org.apache.spark.sql.expressions.Window.currentRow)
        Tables.events(s, d)
          .where(col("user_id") < 10)
          .select(col("user_id"), expr("ts div 1000").as("us"),
            floor(col("value") * 1000).cast("long").as("v_m"))
          .select(col("user_id"), col("us"),
            sum(col("v_m")).over(w).as("roll_sum_m"),
            count(lit(1)).over(w).cast("long").as("roll_n"))
          .orderBy(col("user_id"), col("us"))
      },
      Some("""SELECT user_id, us,
        |  CAST(SUM(v_m) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_sum_m,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_n
        |FROM (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
        |        CAST(floor(value * 1000) AS BIGINT) AS v_m
        |      FROM events WHERE user_id < 10)
        |ORDER BY user_id, us""".stripMargin)),

    // Last-touch attribution: each purchase credited to the user's most
    // recent view/click within a 7-day lookback, else 'none' — the
    // marketing-attribution report. ONE per-user window pass (a running
    // max over a filtered (us, event_id, type) struct — no join at all),
    // where the oracle does it the join-and-rank way: two independent
    // implementations of the same semantics agreeing bit-for-bit.
    QueryDef("q124_attribution",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"),
          expr("ts div 1000").as("us"), col("event_id"), col("event_type"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val m = when(col("event_type").isin("view", "click"),
          struct(col("us"), col("event_id"), col("event_type")))
        ev.withColumn("lastm", max(m).over(w))
          .where(col("event_type") === "purchase")
          .select(when(col("lastm").isNotNull &&
                col("us") - col("lastm.us") <= lit(604800000000L),
              col("lastm.event_type")).otherwise("none").as("channel"))
          .groupBy("channel").agg(count(lit(1)).as("n_purchases"))
          .orderBy("channel")
      },
      Some("""WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_id, event_type FROM events),
        |p AS (SELECT user_id, us, event_id FROM e WHERE event_type = 'purchase'),
        |m AS (SELECT user_id, us, event_id, event_type FROM e WHERE event_type IN ('view', 'click')),
        |j AS (SELECT p.user_id, p.event_id AS pid, m.event_type AS mtype,
        |    row_number() OVER (PARTITION BY p.user_id, p.event_id ORDER BY m.us DESC, m.event_id DESC) AS rn
        |  FROM p JOIN m ON m.user_id = p.user_id
        |    AND (m.us < p.us OR (m.us = p.us AND m.event_id < p.event_id))
        |    AND p.us - m.us <= 604800000000),
        |att AS (SELECT p.user_id, p.event_id, COALESCE(j1.mtype, 'none') AS channel
        |  FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j1
        |    ON j1.user_id = p.user_id AND j1.pid = p.event_id)
        |SELECT channel, COUNT(*) AS n_purchases FROM att
        |GROUP BY channel ORDER BY channel""".stripMargin)),

    // SCD2 dimension build: each user's event_type history collapsed to
    // CHANGE-only versioned rows with [valid_from, valid_to) intervals
    // (valid_to null = current) — the slowly-changing-dimension modeling
    // pass of a warehouse, from the raw event log in two window passes
    // (run detection + lead) and one hash-agg. All integer µs.
    QueryDef("q125_scd2_intervals",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
        val wv = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ver").asc)
        Tables.events(s, d).where(col("user_id") < 20)
          .select(col("user_id"), expr("ts div 1000").as("us"),
            col("event_id"), col("event_type"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .withColumn("chg", when(col("prev").isNull ||
            col("prev") =!= col("event_type"), 1L).otherwise(0L))
          .withColumn("ver", sum(col("chg")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy("user_id", "ver")
          .agg(min(col("event_type")).as("value"),
            min(col("us")).as("valid_from_us"))
          .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wv))
          .orderBy("user_id", "ver")
      },
      Some("""WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_id, event_type
        |  FROM events WHERE user_id < 20),
        |x AS (SELECT user_id, us, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |         OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)),
        |v AS (SELECT user_id, us, event_type,
        |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ver FROM x),
        |r AS (SELECT user_id, ver, MIN(event_type) AS value, MIN(us) AS valid_from_us
        |  FROM v GROUP BY 1, 2)
        |SELECT user_id, ver, value, valid_from_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY ver ASC) AS valid_to_us
        |FROM r ORDER BY user_id, ver""".stripMargin)),

    // Ordered funnel: users completing view -> click -> purchase in
    // STRICT time order (earliest-chain semantics — greedy-earliest is
    // optimal for pure ordering constraints). k chained min-aggs on the
    // user key; nanosecond vs microsecond timestamps don't matter — the
    // chain uses only order, which the 1000x scaling preserves.
    QueryDef("q137_funnel",
      (s, d) => graft.operators.Temporal.funnel(Tables.events(s, d),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase")),
      Some("""WITH e AS (SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS tu FROM events),
        |s0 AS (SELECT user_id, min(tu) AS t FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, min(tu) AS t FROM e JOIN s0 USING (user_id)
        |       WHERE event_type = 'click' AND tu > s0.t GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, min(tu) AS t FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'purchase' AND tu > s1.t GROUP BY e.user_id)
        |SELECT CAST(0 AS INT) AS step, 'view' AS event_type, (SELECT COUNT(*) FROM s0) AS users
        |UNION ALL SELECT CAST(1 AS INT), 'click', (SELECT COUNT(*) FROM s1)
        |UNION ALL SELECT CAST(2 AS INT), 'purchase', (SELECT COUNT(*) FROM s2)
        |ORDER BY step""".stripMargin)),

    // Windowed funnel: each step must land within ONE HOUR of the
    // previous (the conversion-window form). ts is BIGINT nanos on the
    // Spark side and epoch micros in the oracle — the window constant
    // scales with the unit; strict ordering and the earliest-chain rule
    // are unit-invariant.
    QueryDef("q140_funnel_windowed",
      (s, d) => graft.operators.Temporal.funnel(Tables.events(s, d),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"),
        maxGap = Some(3600L * 1000 * 1000 * 1000)),
      Some("""WITH e AS (SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS tu FROM events),
        |s0 AS (SELECT user_id, min(tu) AS t FROM e WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, min(tu) AS t FROM e JOIN s0 USING (user_id)
        |       WHERE event_type = 'click' AND tu > s0.t AND tu <= s0.t + 3600000000 GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, min(tu) AS t FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'purchase' AND tu > s1.t AND tu <= s1.t + 3600000000 GROUP BY e.user_id)
        |SELECT CAST(0 AS INT) AS step, 'view' AS event_type, (SELECT COUNT(*) FROM s0) AS users
        |UNION ALL SELECT CAST(1 AS INT), 'click', (SELECT COUNT(*) FROM s1)
        |UNION ALL SELECT CAST(2 AS INT), 'purchase', (SELECT COUNT(*) FROM s2)
        |ORDER BY step""".stripMargin)),

    // EXISTENTIAL windowed funnel — q140's other semantics: a user
    // converts if ANY chain satisfies every 1-hour gap (not just the
    // chain anchored at the earliest first step). Per step, one
    // user-equi-join of the step's events against the previous FEASIBLE
    // set with the window as a residual predicate; counts >= q140's at
    // every step by construction.
    QueryDef("q143_funnel_exists",
      (s, d) => graft.operators.Temporal.funnelExists(Tables.events(s, d),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"),
        maxGap = 3600L * 1000 * 1000 * 1000),
      Some("""WITH e AS (SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS tu FROM events),
        |f0 AS (SELECT DISTINCT user_id, tu FROM e WHERE event_type = 'view'),
        |f1 AS (SELECT DISTINCT e.user_id, e.tu FROM e JOIN f0 ON e.user_id = f0.user_id
        |       AND e.tu > f0.tu AND e.tu <= f0.tu + 3600000000
        |       WHERE e.event_type = 'click'),
        |f2 AS (SELECT DISTINCT e.user_id, e.tu FROM e JOIN f1 ON e.user_id = f1.user_id
        |       AND e.tu > f1.tu AND e.tu <= f1.tu + 3600000000
        |       WHERE e.event_type = 'purchase')
        |SELECT CAST(0 AS INT) AS step, 'view' AS event_type, (SELECT COUNT(DISTINCT user_id) FROM f0) AS users
        |UNION ALL SELECT CAST(1 AS INT), 'click', (SELECT COUNT(DISTINCT user_id) FROM f1)
        |UNION ALL SELECT CAST(2 AS INT), 'purchase', (SELECT COUNT(DISTINCT user_id) FROM f2)
        |ORDER BY step""".stripMargin))
  )
}
