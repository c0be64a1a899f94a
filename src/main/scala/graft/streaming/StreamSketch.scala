package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions.md5Bucket

/** Streaming distinct-cardinality tracking with BOUNDED state — the live
  * face of [[graft.operators.Sketch.linearCountBuckets]]: an unbounded
  * stream of (group, value) updates a per-group BUSY-BUCKET BITMAP of
  * exactly ⌈buckets/64⌉ longs (512 bytes at 4096 buckets), emitting the
  * current busy count per group on every trigger. A streaming exact
  * COUNT(DISTINCT) would hold one state row PER DISTINCT VALUE — state
  * grows with the vocabulary and eventually evicts or OOMs; the bitmap
  * is O(buckets) forever, the property that makes cardinality tracking
  * deployable on an infinite stream.
  *
  * Bucket ids are the same salted-md5 as the batch sketch, computed
  * IN-PLAN (codegen) before the stateful operator — the state update is
  * a pure bit-OR, so the streamed bitmap equals the batch bitmap over
  * the same rows regardless of arrival order or batching (parity-pinned
  * in StreamSketchSpec). Estimate via
  * [[graft.operators.Sketch.linearCountEstimate]] on the emitted counts.
  */
object StreamSketch {

  /** (groupCol STRING, busy LONG) per trigger, Update output mode. */
  def linearCount(values: DataFrame, groupCol: String, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets $buckets must be >= 2")
    val spark = values.sparkSession
    import spark.implicits._
    val words = (buckets + 63) / 64
    val keyed: Dataset[(String, Long)] = values
      .select(col(groupCol).cast("string"),
        md5Bucket(col(valueCol), buckets, salt = "lc:"))
      .as[(String, Long)]
    keyed.groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Long)](
        GroupStateTimeout.NoTimeout) {
        case (g, it, state) =>
          val bm = state.getOption.getOrElse(new Array[Long](words))
          it.foreach { case (_, b) =>
            bm((b >> 6).toInt) |= 1L << (b & 63L)
          }
          state.update(bm)
          (g, bm.map(w => java.lang.Long.bitCount(w).toLong).sum)
      }
      .toDF(groupCol, "busy")
  }

  /** Streaming HyperLogLog — the bounded-state distinct tracker that
    * stays accurate PAST the bitmap's saturation point (the live face of
    * [[graft.operators.Sketch.hllRegisters]]): per-group state is m = 2^p
    * register BYTES (256 bytes at p = 8; ranks max out at 60−p+1 ≤ 59, so
    * a byte each), updated by pure per-bucket max — associative and
    * commutative, so the streamed registers equal the batch registers
    * over the same rows regardless of arrival order or batching
    * (parity-pinned in StreamSketchSpec). The (bucket, rank) pair is
    * computed IN-PLAN (codegen) by the same
    * [[graft.operators.Sketch.hllBucketRank]] columns the batch
    * aggregation uses — one definition, agreement by construction.
    *
    * Emits (groupCol STRING, regs ARRAY<LONG> dense length m) per
    * trigger, Update mode; estimate via
    * [[graft.operators.Sketch.hllEstimate]] on the sparse view of the
    * emitted row.
    */
  def hll(values: DataFrame, groupCol: String, valueCol: String,
      p: Int): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    val m = 1 << p
    val (b, r) = graft.operators.Sketch.hllBucketRank(col(valueCol), p)
    val keyed: Dataset[(String, Long, Long)] = values
      .select(col(groupCol).cast("string"), b, r)
      .as[(String, Long, Long)]
    keyed.groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, Seq[Long])](
        GroupStateTimeout.NoTimeout) {
        case (g, it, state) =>
          val regs = state.getOption.getOrElse(new Array[Byte](m))
          it.foreach { case (_, bkt, rank) =>
            val i = bkt.toInt
            if (rank > regs(i)) regs(i) = rank.toByte
          }
          state.update(regs)
          (g, regs.map(_.toLong).toSeq)
      }
      .toDF(groupCol, "regs")
  }

  /** Streaming heavy hitters with BOUNDED state — SpaceSaving (Metwally
    * et al. 2005), the live top-k completing the sketch trio (cardinality
    * = [[linearCount]]/[[hll]], frequency = this): per group, at most
    * `capacity` (item, count, err) entries forever, where exact streaming
    * counts keep one state row per distinct item and grow without bound.
    * On overflow the minimum-count entry is EVICTED and the newcomer
    * inherits its count (+1) with that floor recorded as `err`: counts
    * are upper bounds with `cnt − err ≤ true ≤ cnt`, and any item with
    * true frequency > N/capacity is guaranteed present — the heavy-hitter
    * guarantee.
    *
    * Unlike the max/bit-OR sketches, SpaceSaving state depends on arrival
    * order ONCE EVICTING — but while distinct items ≤ capacity it is
    * EXACT and order-invariant (err = 0, counts = true counts; the regime
    * StreamSketchSpec parity-pins against a batch groupBy count). Emits
    * the current top-`emitK` per group each trigger as (groupCol, item,
    * cnt, err), Update mode.
    */
  def spaceSaving(values: DataFrame, groupCol: String, valueCol: String,
      capacity: Int, emitK: Int): DataFrame = {
    require(capacity >= 1, s"capacity $capacity must be >= 1")
    require(emitK >= 1 && emitK <= capacity,
      s"emitK $emitK outside 1..capacity=$capacity")
    val spark = values.sparkSession
    import spark.implicits._
    val keyed: Dataset[(String, String)] = values
      .select(col(groupCol).cast("string"), col(valueCol).cast("string"))
      .as[(String, String)]
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, (Long, Long)],
          (String, String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (g, it, state) =>
          var m = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
          it.foreach { case (_, v) =>
            m.get(v) match {
              case Some((c, e)) => m = m.updated(v, (c + 1, e))
              case None if m.size < capacity => m = m.updated(v, (1L, 0L))
              case None =>
                // evict the min-count entry (ties: lexicographic item, so
                // the update is deterministic given arrival order)
                val (minV, (minC, _)) = m.minBy { case (v2, (c, _)) => (c, v2) }
                m = (m - minV).updated(v, (minC + 1, minC))
            }
          }
          state.update(m)
          m.toSeq.sortBy { case (v, (c, _)) => (-c, v) }.take(emitK)
            .iterator.map { case (v, (c, e)) => (g, v, c, e) }
      }
      .toDF(groupCol, "item", "cnt", "err")
  }

  /** Streaming KMV/Theta sample — the bounded-state SET-OPERATION sketch
    * completing the quartet (cardinality = [[linearCount]]/[[hll]],
    * frequency = [[spaceSaving]], set intersection = this; the live face
    * of [[graft.operators.Sketch.kmvSample]]): per group, the k minimum
    * distinct md5 hash values of the keys, ≤ k Longs of state forever.
    * The update (set-union then keep the k smallest) is associative,
    * commutative and idempotent, so the streamed sample equals the batch
    * sample over the same rows regardless of arrival order or batching
    * (parity-pinned in StreamSketchSpec). Hashes are computed IN-PLAN by
    * the same md5Low32 column as the batch sketch. Feed emitted samples
    * to [[graft.operators.Sketch.kmvIntersect]] for live "distinct in
    * BOTH groups" estimates. Emits (groupCol STRING, hs ARRAY<LONG>
    * ascending) per trigger, Update mode.
    */
  def kmv(values: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2 (got $k)")
    val spark = values.sparkSession
    import spark.implicits._
    val keyed: Dataset[(String, Long)] = values
      .select(col(groupCol).cast("string"),
        graft.functions.TextFunctions.md5Low32(col(keyCol).cast("string")))
      .as[(String, Long)]
    keyed.groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Seq[Long])](
        GroupStateTimeout.NoTimeout) {
        case (g, it, state) =>
          val cur = state.getOption.getOrElse(Array.empty[Long])
          val merged = (cur.toSet ++ it.map(_._2))
            .toSeq.sorted.take(k).toArray
          state.update(merged)
          (g, merged.toSeq)
      }
      .toDF(groupCol, "hs")
  }

  /** Streaming per-source GRAM bottom-k synopsis — the live face of
    * [[graft.operators.Profile.gramBottomK]], maintaining the state the
    * cross-source containment matrix (q184) serves off. Per source the
    * state is the k smallest distinct 60-bit gram hashes; the update
    * (set-union then keep the k smallest) is [[mergeGramBottomK]]'s ⊕ —
    * associative, commutative, idempotent — so the streamed synopsis
    * EQUALS the batch one over the same rows regardless of arrival
    * order or batching (parity-pinned in StreamSketchSpec), exactly the
    * bottom-k composition identity the batch monoid rests on. Shingling
    * and hashing run IN-PLAN (codegen) with the SAME columns as the
    * batch build (`overlappingGrams` → `md5Low60`) — one definition,
    * agreement by construction.
    *
    * A doc shorter than n tokens contributes an empty gram array but
    * still carries its source key, so a gram-less source appears with
    * an EMPTY synopsis — the batch anchor contract (ADVICE r11) held
    * live. Emits (__g STRING, bk ARRAY<LONG> ascending) per trigger,
    * Update mode — the EXACT schema
    * [[graft.operators.Profile.containmentFromSketches]] takes, so the
    * live pair matrix is one batch call over the latest emit per
    * source. ≤ k longs of state per source forever.
    */
  def gramBottomK(values: DataFrame, srcCol: String, textCol: String,
      n: Int = 8, k: Int = 256): DataFrame = {
    require(n >= 1, s"gramBottomK: n $n must be >= 1")
    require(k >= 2, s"gramBottomK: k $k must be >= 2")
    val spark = values.sparkSession
    import spark.implicits._
    import graft.functions.TextFunctions
    val keyed: Dataset[(String, Seq[Long])] = values
      .select(col(srcCol).cast("string"),
        coalesce(
          transform(
            TextFunctions.overlappingGrams(
              TextFunctions.wsTokens(col(textCol)), n),
            g => TextFunctions.md5Low60(g)),
          array().cast("array<long>")))
      .as[(String, Seq[Long])]
    keyed.groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Seq[Long])](
        GroupStateTimeout.NoTimeout) {
        case (g, it, state) =>
          val cur = state.getOption.getOrElse(Array.empty[Long])
          val merged = (cur.toSet ++ it.flatMap(_._2))
            .toSeq.sorted.take(k).toArray
          state.update(merged)
          (g, merged.toSeq)
      }
      .toDF("__g", "bk")
  }

  /** The only output mode `mapGroupsWithState` supports. */
  /** Streaming KLL-style quantile sketch — the live face of
    * [[graft.operators.Sketch.kllState]]: per-group state is the exact
    * arrival count plus the ≤ ~k surviving (coin, value) pairs. The
    * nested per-item coin makes the update order-free: the level only
    * GROWS as n grows, survivorship at a higher level is a subset of
    * survivorship at a lower one, and a dropped item can never be
    * needed again — so the streamed state EQUALS the batch
    * `kllState` over the same rows regardless of arrival order or
    * batching (parity-pinned in StreamSketchSpec). The coin is the same
    * in-plan salted md5 column as the batch build — one definition,
    * agreement by construction.
    *
    * Emits one row per group per trigger (Update mode):
    * (groupCol, level, n, vs, us) with survivors sorted by (v, u) —
    * the batch state's survivor rows reshaped; read quantiles off the
    * emitted arrays with the same rational cumulative-weight rule as
    * [[graft.operators.Sketch.kllQuantile]].
    */
  def kll(values: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kll: k $k must be >= 2")
    val spark = values.sparkSession
    import spark.implicits._
    val keyed: Dataset[(String, Long, Long)] = values
      .select(col(groupCol).cast("string"),
        graft.functions.TextFunctions.md5Low32(
          concat(lit("kll:"), col(idCol).cast("string"))),
        col(valueCol).cast("long"))
      .as[(String, Long, Long)]
    keyed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Array[Long], Array[Long]),
        (String, Int, Long, Seq[Long], Seq[Long])](
        GroupStateTimeout.NoTimeout) {
        case (g, it, state) =>
          val (n0, us0, vs0) = state.getOption
            .getOrElse((0L, Array.empty[Long], Array.empty[Long]))
          val batch = it.toArray
          val n = n0 + batch.length
          var lvl = 0 // smallest l with n <= k·2^l — the batch levelFor
          while (n > (k.toLong << lvl)) lvl += 1
          val mask = (1L << lvl) - 1
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var i = 0
          while (i < us0.length) {
            if ((us0(i) & mask) == 0L) buf += ((us0(i), vs0(i)))
            i += 1
          }
          batch.foreach { case (_, u, v) =>
            if ((u & mask) == 0L) buf += ((u, v))
          }
          val sorted = buf.sortBy { case (u, v) => (v, u) }.toArray
          state.update((n, sorted.map(_._1), sorted.map(_._2)))
          (g, lvl, n, sorted.map(_._2).toSeq, sorted.map(_._1).toSeq)
      }
      .toDF(groupCol, "level", "n", "vs", "us")
  }

  val outputMode: OutputMode = OutputMode.Update()
}
