package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for aggregates — the nightly-pipeline
  * pattern the store's WAL/compaction lifecycle implies but never names:
  * a 100-TB corpus's per-group statistics must absorb a daily delta
  * WITHOUT rescanning the corpus. The trick is to materialize the view
  * as MERGEABLE PARTIAL STATES (count/sum/min/max — each an
  * associative, commutative monoid), so
  *
  *   state(base ∪ delta) = state(base) ⊕ state(delta)
  *
  * holds exactly and the refresh cost is O(delta + |groups|), never
  * O(base). This is the same algebra Spark's own partial aggregation
  * exploits WITHIN a job (map-side combine), lifted ACROSS jobs as a
  * persisted artifact — and the same contract the sketch family
  * ([[Sketch.hllMerge]], linear-count bucket OR) satisfies for
  * non-trivial statistics, so sketch columns ride the same refresh.
  *
  * Exactness: states carry only Long arithmetic (callers pre-scale
  * money to milli-units as everywhere else), so a merged view is
  * bit-identical to a full recompute — the oracle hook (q95) and the
  * invariant IvmSpec property-pins.
  */
object Ivm {

  /** Per-group partial aggregate state of `valueCol` (LONG): one row per
    * group — (groups..., n, s, mn, mx). The mergeable unit.
    */
  def aggState(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"),
        min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))

  /** ⊕ — merge state frames group-wise: counts and sums add, extrema
    * take min/max. Groups absent on one side pass through (the monoid
    * identity). One hash-agg over the concatenated states — the states
    * are |groups|-sized, so this never touches source data.
    */
  def mergeStates(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeStates: need at least one state frame")
    states.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))
  }

  /** Build + persist the view artifact (versioned dir, newest-wins —
    * the snapshot discipline of VectorStore): the one full scan, paid at
    * build time.
    */
  def buildAggView(df: DataFrame, groupCols: Seq[String], valueCol: String,
      path: String): Unit =
    aggState(df, groupCols, valueCol)
      .write.mode("overwrite").parquet(s"$path/v${nextVersion(path)}")

  /** Refresh the persisted view with a delta batch: read the current
    * state (|groups| rows), ⊕ the delta's state (computed from the delta
    * ALONE), write the next version. The base corpus is never read.
    */
  def refreshAggView(delta: DataFrame, groupCols: Seq[String],
      valueCol: String, path: String): Unit = {
    val cur = readAggView(delta.sparkSession, path)
    mergeStates(Seq(cur, aggState(delta, groupCols, valueCol)), groupCols)
      .write.mode("overwrite").parquet(s"$path/v${nextVersion(path)}")
  }

  /** The newest COMPLETE persisted state — completeness is parquet's own
    * `_SUCCESS` marker, so a version dir torn by a crashed writer is
    * never read (the VectorStore snapshot-pointer discipline, here for
    * free from the commit protocol).
    */
  def readAggView(spark: SparkSession, path: String): DataFrame = {
    val v = completeVersions(path)
    require(v.nonEmpty, s"no agg view at $path — call buildAggView first")
    spark.read.parquet(versionDirs(path).filter(_._1 == v.max).head._2)
  }

  /** Idempotent streaming merge step — the `foreachBatch` body of
    * [[graft.streaming.StreamIvm]]: merge this micro-batch's state into
    * the view UNLESS a complete version already carries this `batchId`
    * (foreachBatch is at-least-once; a retry of a batch that already
    * committed must be a no-op or counts double). The batch id rides in
    * the version dir name (`v<n>_b<id>`), so the dedup ledger IS the
    * artifact listing — no side state.
    */
  def mergeBatch(delta: DataFrame, groupCols: Seq[String], valueCol: String,
      path: String, batchId: Long): Unit = {
    if (completeBatchIds(path).contains(batchId)) return
    val cur = readAggView(delta.sparkSession, path)
    mergeStates(Seq(cur, aggState(delta, groupCols, valueCol)), groupCols)
      .write.mode("overwrite")
      .parquet(s"$path/v${nextVersion(path)}_b$batchId")
  }

  /** (version, dir, batchId?) for every version dir on disk, torn or not. */
  private def versionDirs(path: String): Seq[(Long, String, Option[Long])] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Seq.empty
    val stream = Files.list(p)
    try stream.toArray.map(_.toString)
      .filter(_.split('/').last.startsWith("v"))
      .flatMap { dir =>
        val name = dir.split('/').last.stripPrefix("v")
        val parts = name.split("_b", 2)
        scala.util.Try(parts(0).toLong).toOption.map { v =>
          (v, dir, parts.lift(1).flatMap(b => scala.util.Try(b.toLong).toOption))
        }
      }.toSeq
    finally stream.close()
  }

  private def isComplete(dir: String): Boolean =
    Files.exists(Paths.get(dir, "_SUCCESS"))

  private def completeVersions(path: String): Seq[Long] =
    versionDirs(path).filter(d => isComplete(d._2)).map(_._1)

  private def completeBatchIds(path: String): Set[Long] =
    versionDirs(path).filter(d => isComplete(d._2)).flatMap(_._3).toSet

  /** Next version number — counts TORN dirs too, so a crashed write's
    * number is never reused (its leftover dir can't shadow a newer
    * complete one).
    */
  private def nextVersion(path: String): Long =
    versionDirs(path).map(_._1).foldLeft(0L)(math.max) + 1L
}
