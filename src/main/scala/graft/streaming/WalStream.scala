package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.core.Schemas

/** The WAL as a live change stream — Structured Streaming over the same
  * JSON-lines dir the batch store appends to (SURVEY §1.5: the WAL *is* an
  * event stream; `readStream.json` replaces hand-rolled tail-and-replay,
  * and `checkpointLocation` replaces `wal_pos.txt`, reference
  * `src/utils/wal_manager.py:185-246`).
  */
object WalStream {

  case class KeyState(key: String, opType: String, timestamp: Long, batchSeq: Long)

  /** Streaming source over a WAL dir (batch store's `put`/`delete` output). */
  def source(spark: SparkSession, walDir: String): DataFrame =
    spark.readStream
      .schema(Schemas.wal.add("batch_seq", "long"))
      .option("mode", "PERMISSIVE")
      .json(walDir)
      .where(col("op_type").isNotNull && col("key").isNotNull)

  /** Streaming last-writer-wins: per key, keep the op with the max
    * (timestamp, batch_seq) and emit a change row whenever the winner
    * changes — `flatMapGroupsWithState`, the streaming form of the batch
    * LWW window (R16). State is one small record per key; at unbounded key
    * cardinality, pair with snapshot-compaction cadence like the
    * reference's per-2k-puts checkpoint (`datanode/handler.py:316-317`).
    */
  def lwwUpdates(ops: DataFrame): Dataset[KeyState] = {
    val spark = ops.sparkSession
    import spark.implicits._
    ops.select("key", "op_type", "timestamp", "batch_seq")
      .as[(String, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KeyState, KeyState](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[KeyState]) =>
          val incoming = rows.toSeq
          if (incoming.isEmpty) Iterator.empty
          else {
            import scala.math.Ordering.Implicits._
            val best = incoming.maxBy(r => (r._3, r._4))
            val cur  = state.getOption
            if (cur.forall(c => (best._3, best._4) > ((c.timestamp, c.batchSeq)))) {
              val ks = KeyState(key, best._2, best._3, best._4)
              state.update(ks)
              Iterator.single(ks)
            } else Iterator.empty
          }
      }
  }

  /** Live index maintenance — the reference's put→index loop
    * (`datanode/handler.py:300-315`: every applied PUT goes straight into
    * the live HNSW) as a streaming sink over the WAL: each micro-batch's
    * PUT ops append into the persisted IVF layout via
    * [[graft.store.VectorStore.appendToIvfIndex]] (assignment against
    * the persisted centroids — shuffle-free — writing only into the
    * cells the batch lands in). DELETEs need no index write: `searchIvf`
    * drops dead keys at query time, exactly the reference's
    * `deleted_ids` soft-delete. Replaying history through the stream is
    * harmless — re-appended rows lose the probed-cell LWW to themselves
    * (same ts) or to newer versions, so served results are unchanged.
    */
  def indexMaintenance(ops: DataFrame, store: graft.store.VectorStore,
      trigger: Trigger = Trigger.ProcessingTime(0L)): DataStreamWriter[Row] =
    putMaintenance(ops, trigger)(store.appendToIvfIndex)

  /** The same live put→index loop against the persisted NSW graphs — the
    * streaming form of `hnsw.add_items` (`datanode/handler.py:263-297`):
    * each micro-batch's PUTs route to their stable graph partition and
    * are inserted via [[graft.store.VectorStore.appendToNswIndex]]
    * (only touched partitions rewrite). DELETEs and checkpoint replays
    * are harmless for the same reason as the IVF sink: `searchNsw`'s
    * newest-version window + liveness semi-join drop duplicate and dead
    * nodes at serve time (and any append invalidates the fresh-index
    * fast path, so that discipline is guaranteed to run).
    */
  def nswIndexMaintenance(ops: DataFrame, store: graft.store.VectorStore,
      trigger: Trigger = Trigger.ProcessingTime(0L)): DataStreamWriter[Row] =
    putMaintenance(ops, trigger)(store.appendToNswIndex)

  /** Shared put→append sink. The freshness claim passed to the append is
    * `max(batch_seq) - 1`, which is PROVABLY sound under the store's
    * one-writer discipline: `put(N)` returns (all of batch N's files on
    * disk) before `put(N+1)` starts, so any file of batch N existing
    * means every batch < N is complete — and the file source lists all
    * unprocessed files per trigger, so those batches were delivered in
    * this or an earlier micro-batch. Batch N itself may still be
    * mid-write when the trigger lists (half its files now, half next
    * trigger), so claiming N would lie; the strict-predecessor claim
    * never can. The tail batch is claimed one trigger late — conservative
    * staleness, never false freshness ([[graft.store.VectorStore.verifyFresh]]
    * trust model); a snapshot-taker closes the gap with
    * `store.indexPending(tier)`.
    */
  private def putMaintenance(ops: DataFrame, trigger: Trigger)(
      append: (DataFrame, Option[Long]) => Unit): DataStreamWriter[Row] =
    ops.where(col("op_type") === "PUT")
      .writeStream.trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val maxSeq = batch.agg(max(col("batch_seq"))).head.getLong(0)
          append(batch.select(col("key"), col("vector"),
            col("metadata"), col("timestamp").as("ts")), Some(maxSeq - 1))
        }
      }

  /** The reference's compaction CADENCE as a streaming sink — its
    * datanode checkpoints the store every 2k applied puts
    * (`datanode/handler.py:316-317`, `src/utils/wal_manager.py`); here
    * every micro-batch of WAL ops re-probes
    * [[graft.store.VectorStore.compactIfNeeded]], whose op-count probe
    * scans only post-snapshot WAL partitions (directory pruning), so
    * sustained writes snapshot every ~`minWalOps` ops and an idle stream
    * costs one cheap probe per trigger. The probe-then-compact runs
    * driver-side in foreachBatch — exactly where the reference's counter
    * lives — and snapshots are atomic (pointer-file commit), so readers
    * through [[graft.store.VectorStore.compacted]] never see a torn
    * rewrite; a replayed micro-batch at worst re-probes (compact itself
    * is idempotent past the pointer).
    */
  def compactionMaintenance(ops: DataFrame, store: graft.store.VectorStore,
      minWalOps: Long, tombstoneRatio: Double = 0.2,
      trigger: Trigger = Trigger.ProcessingTime(0L)): DataStreamWriter[Row] =
    ops.writeStream.trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { store.compactIfNeeded(minWalOps, tombstoneRatio); () }
      }

  /** Stream-stream interval self-join: every DELETE matched to the PUT(s)
    * it tombstones within `horizon` of event time — a live audit of the
    * reference's tombstone set (`datanode/handler.py:43`) as a join
    * instead of mutable state. Both sides carry watermarks and the join
    * condition bounds event time in both directions, so Spark expires
    * join state at the horizon — state is bounded by the horizon's
    * arrival volume, not the stream's history.
    * Output: (key, put_time, del_time) per tombstoned PUT.
    */
  def tombstoneAudit(ops: DataFrame, horizon: String = "1 hour"): DataFrame = {
    val puts = ops.where(col("op_type") === "PUT")
      .select(col("key"), timestamp_millis(col("timestamp")).as("put_time"))
      .withWatermark("put_time", horizon)
    val dels = ops.where(col("op_type") === "DELETE")
      .select(col("key").as("dkey"), timestamp_millis(col("timestamp")).as("del_time"))
      .withWatermark("del_time", horizon)
    puts.join(dels,
        col("key") === col("dkey") &&
          col("del_time") >= col("put_time") &&
          col("del_time") <= col("put_time") + expr(s"INTERVAL $horizon"))
      .select(col("key"), col("put_time"), col("del_time"))
  }

  /** Watermarked sliding-window op counts over the stream — the streaming
    * analog of the ingest tally (R17) with late-data bounds.
    * `tsCol` must be an event-time timestamp column.
    */
  def windowedOpCounts(ops: DataFrame, windowDur: String, slideDur: String,
      watermark: String): DataFrame =
    ops.withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowDur, slideDur), col("op_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("op_type"), col("n"))
}
