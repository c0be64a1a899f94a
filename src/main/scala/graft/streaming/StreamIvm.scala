package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Ivm

/** Streaming maintenance of the [[Ivm]] aggregate view — the always-on
  * form of the nightly delta refresh: each micro-batch's partial state
  * merges into the persisted artifact, so the view trails the stream by
  * one trigger while every refresh reads O(batch + groups), never the
  * corpus. Batch-ids ride in the version dir names and completed
  * versions carry parquet's `_SUCCESS`, making the merge IDEMPOTENT
  * under foreachBatch's at-least-once replay ([[Ivm.mergeBatch]]) — the
  * streaming sink discipline a bounded-state aggregation needs without
  * holding any state in the query itself (contrast
  * [[StreamSketch]], which keeps sketch state in the streaming engine;
  * here ALL state lives in the artifact, so the query restarts
  * stateless).
  */
object StreamIvm {

  /** Start maintaining the view at `path` from `stream`. The view must
    * already exist ([[Ivm.buildAggView]] over the base corpus — the one
    * full scan); `checkpointDir` is the streaming source position store.
    */
  /** `hllCol`/`xCol` flow through to [[Ivm.aggState]]: the streamed view
    * can carry the distinct-count registers and the least-squares trend
    * sums — all three optional statistics ride the same idempotent ⊕.
    */
  def maintain(stream: DataFrame, groupCols: Seq[String], valueCol: String,
      path: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      hllCol: Option[String] = None, p: Int = 8,
      xCol: Option[String] = None,
      histSpec: Option[(Long, Long, Int)] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Ivm.mergeBatch(batch, groupCols, valueCol, path, id, hllCol, p, xCol,
          histSpec)
      }
      .trigger(trigger)
      .start()
}
