package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for: the backward as-of
  * join (each left row picks the latest right row at-or-before its
  * timestamp) and the bounded-interval range join — the two point-in-time
  * primitives of event/feature pipelines (feature stores, attribution,
  * "state as of" queries; the reference's event-time LWW,
  * `src/utils/wal_manager.py:90-98`, is the degenerate as-of with one
  * right row per key surviving).
  *
  * Both are built to never materialize a time cross product:
  *   - as-of = ONE shuffle: union the sides tagged, sort each key's
  *     timeline once inside a window, carry the last right payload
  *     forward (`last(..., ignoreNulls)` over rows-unbounded-preceding) —
  *     the classic distributed merge-as-of. No non-equi join, no
  *     BroadcastNestedLoopJoin, cost ∝ |L|+|R| per key.
  *   - range join = equi-join on (key, time bucket): with bucket width =
  *     interval span each left row probes exactly 2 buckets, so shuffle
  *     volume is 2|L|+|R| and candidates are only same-bucket rows — the
  *     standard binned interval join (what Databricks' range-join hint
  *     does under the hood), instead of Spark's default O(|L|·|R|)
  *     nested-loop on a non-equi condition.
  *
  * Timestamp discipline: callers pass INTEGER time columns (the engine's
  * queries use parquet-ns `div 1000` = µs). Comparisons are integer-exact;
  * nothing here touches Double (ns epochs exceed 2^53).
  */
object Temporal {

  /** Backward as-of join: every `left` row + the payload of the LATEST
    * `right` row of the same `key` with `right.tsCol <= left.tsCol`
    * (inclusive; left-outer — unmatched rows keep null payload).
    *
    * `rightPayload` columns are appended under their own names (must not
    * clash with `left`'s). When several right rows share (key, ts), the
    * greatest `rightTie` tuple wins — pass a unique id for deterministic
    * output.
    *
    * One hash shuffle on `key` + one per-key sort; at 100 TB both sides
    * flow through a single window, no join node at all. Hot keys cost one
    * in-partition sort (same skew profile as any per-key window; salt
    * upstream if one key is a torrent).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      rightTie: Seq[String] = Nil): DataFrame = {
    val clash = left.columns.toSet.intersect(rightPayload.toSet)
    require(clash.isEmpty, s"asofJoin: rename right columns $clash — they clash with left")
    // internal plumbing columns: a caller column with one of these names
    // would silently corrupt the tagged union instead of erroring
    val reserved = Set("__key", "__ts", "__side", "__pay") ++
      rightTie.map(c => s"__tie_$c")
    val hit = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(hit.isEmpty, s"asofJoin: input columns $hit collide with reserved internal names")
    // payload travels as ONE nullable struct so a matched left row gets
    // every column from the SAME right row (per-column fills could mix
    // rows when a payload value is legitimately null)
    val payType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val tieTypes = rightTie.map(c => c -> right.schema(c).dataType)

    // tagged union: right rows (side 0) sort BEFORE left rows (side 1) at
    // equal ts, which is exactly the inclusive <= boundary
    val l = left.select(
      col(key).as("__key") +: col(leftTs).as("__ts") +: lit(1).as("__side") +:
        lit(null).cast(payType).as("__pay") +:
        (left.columns.map(col) ++
          tieTypes.map { case (c, t) => lit(null).cast(t).as(s"__tie_$c") }): _*)
    val r = right.select(
      col(key).as("__key") +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        struct(rightPayload.map(col): _*).as("__pay") +:
        (left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightTie.map(c => col(c).as(s"__tie_$c"))): _*)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").asc +: col("__side").asc +:
        rightTie.map(c => col(s"__tie_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.map(col) ++
        rightPayload.map(c => col("__pay").getField(c).as(c)): _*)
  }

  /** Bounded-interval range join: inner-join pairs with
    * `left.key == right.key` and `right.ts ∈ [left.ts + lo, left.ts + hi]`
    * (both ends inclusive). Output = left.* ++ right.* (column sets must
    * be disjoint; the key/ts columns may be named differently per side).
    *
    * Plan shape: right rows land in ONE bucket of width `hi - lo` (or
    * `minBucket` for point intervals); left rows explode to the 2 (≤3)
    * buckets their interval can reach; the join is a pure equi-join on
    * (key, bucket) with the exact range as a post-filter. Each right row
    * lives in exactly one bucket, so no pair ever duplicates. At 100×
    * the shuffle is ~2|L|+|R| rows — never |L|·|R|.
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      lo: Long, hi: Long, minBucket: Long = 1L): DataFrame = {
    require(lo <= hi, s"rangeJoinBucketed: empty interval [$lo, $hi]")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"rangeJoinBucketed: overlapping columns $clash — rename one side")
    val hit = (left.columns ++ right.columns).toSet.intersect(Set("__bkt", "__rbkt"))
    require(hit.isEmpty, s"rangeJoinBucketed: input columns $hit collide with reserved internal names")
    val width = math.max(hi - lo, math.max(minBucket, 1L))
    // SQL `div` = truncating integer division (no Double round-trip — ns
    // epochs exceed 2^53). Truncation vs floor only shifts bucket edges
    // near zero; it is monotone, so a right row's bucket always falls
    // inside the left row's enumerated [lo_bucket, hi_bucket] interval.
    val lExp = left.withColumn("__bkt",
      explode(sequence(expr(s"(`$leftTs` + ${lo}L) div ${width}L"),
        expr(s"(`$leftTs` + ${hi}L) div ${width}L"))))
    val rBkt = right.withColumn("__rbkt", expr(s"`$rightTs` div ${width}L"))
    lExp.join(rBkt,
        col(leftKey) === col(rightKey) && col("__bkt") === col("__rbkt"))
      .where(col(rightTs).between(col(leftTs) + lit(lo), col(leftTs) + lit(hi)))
      .drop("__bkt", "__rbkt")
  }

  /** Ordered-funnel analysis — the event-analytics staple: how many
    * users complete step₀ → step₁ → … in STRICT time order. Per user,
    * t₀ = earliest step₀ event; tᵢ = earliest stepᵢ event AFTER tᵢ₋₁
    * (the standard earliest-chain semantics: greedy-earliest is optimal
    * for pure ordering constraints — if any qualifying chain exists, the
    * earliest-prefix one does). Output: (step, event_type, users) — the
    * funnel report, one row per step.
    *
    * Scale shape: k steps = k filtered min-aggregations chained by
    * equi-joins on the user key — every shuffle is a hash key, state per
    * step is one (user, ts) row, nothing is ordered globally and no
    * per-user event array is ever materialized (the collect_list
    * sessionization trap). Join i's right side is step i−1's SHRINKING
    * survivor set, so work decreases down the funnel.
    */
  /** `maxGap`: optional conversion window — step i must follow step i−1
    * within `maxGap` time units (the "purchase within an hour of the
    * click" form). SEMANTICS NOTE: with a window the funnel counts the
    * ANCHORED greedy chain — each user's journey starts at their
    * EARLIEST step₀ and takes the earliest qualifying event per step
    * (the first-touch convention most funnel tools use). That is NOT
    * the existential "does any compliant chain exist" question: a user
    * with view@0, click@40, click@45, purchase@95 under maxGap=50 does
    * NOT convert here (the anchored chain takes click@40, closing the
    * purchase window at 90) even though the view@0→click@45→purchase@95
    * chain would comply — existential matching needs per-user sequence
    * search, a different (and much costlier) operator. Without a window
    * the two definitions coincide (greedy-earliest is optimal for pure
    * ordering), and the oracle pins exactly the anchored semantics.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      maxGap: Option[Long] = None): DataFrame = {
    funnelValidate(steps)
    require(maxGap.forall(_ > 0), s"funnel: maxGap $maxGap must be positive")
    var reached = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val stages = scala.collection.mutable.ArrayBuffer((steps.head, reached))
    steps.drop(1).foreach { st =>
      val inWindow = maxGap match {
        case Some(g) => col(tsCol) > col("__prev") &&
          col(tsCol) <= col("__prev") + lit(g)
        case None => col(tsCol) > col("__prev")
      }
      reached = events.where(col(typeCol) === st)
        .join(reached.select(col(userCol), col("__t").as("__prev")),
          Seq(userCol))
        .where(inWindow)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      stages += ((st, reached))
    }
    funnelReport(stages.toSeq, userCol)
  }

  /** Shared report tail of both funnel variants: one row per step with
    * the surviving-user count. Both stage frames carry at most one row
    * per user, so countDistinct(user) is exact for each.
    */
  private def funnelReport(stages: Seq[(String, DataFrame)],
      userCol: String): DataFrame =
    stages.zipWithIndex.map { case ((st, df), i) =>
      df.agg(countDistinct(col(userCol)).as("users"))
        .select(lit(i).cast("int").as("step"), lit(st).as("event_type"),
          col("users"))
    }.reduce(_.unionByName(_)).orderBy("step")

  private def funnelValidate(steps: Seq[String]): Unit = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(steps.distinct.size == steps.size, s"funnel: duplicate steps $steps")
  }

  /** EXISTENTIAL windowed funnel — [[funnel]]'s other semantics: a user
    * reaches step i if ANY chain of events satisfies every ordering +
    * window constraint (not just the chain anchored at their earliest
    * step₀). Per step, the FEASIBLE event set is computed by one
    * user-equi-join against the previous step's feasible set with the
    * window as a residual predicate — hash join on the user key, never
    * a time cross-product; feasible sets are bounded by each user's own
    * event count, and DISTINCT keeps them from multiplying through the
    * chain. Counts are ≥ [[funnel]]'s at every step by construction
    * (TemporalSpec pins the separating counter-example). Output:
    * (step, event_type, users).
    */
  def funnelExists(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], maxGap: Long): DataFrame = {
    funnelValidate(steps)
    require(maxGap > 0, s"funnelExists: maxGap $maxGap must be positive")
    var feasible = events.where(col(typeCol) === steps.head)
      .select(col(userCol), col(tsCol).as("__t")).distinct()
    val stages = scala.collection.mutable.ArrayBuffer((steps.head, feasible))
    steps.drop(1).foreach { st =>
      feasible = events.where(col(typeCol) === st)
        .select(col(userCol), col(tsCol))
        .join(feasible.select(col(userCol), col("__t").as("__prev")),
          Seq(userCol))
        .where(col(tsCol) > col("__prev") &&
          col(tsCol) <= col("__prev") + lit(maxGap))
        .select(col(userCol), col(tsCol).as("__t")).distinct()
      stages += ((st, feasible))
    }
    funnelReport(stages.toSeq, userCol)
  }
}
