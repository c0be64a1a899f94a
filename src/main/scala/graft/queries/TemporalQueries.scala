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
        |ORDER BY user_id, us""".stripMargin))
  )
}
