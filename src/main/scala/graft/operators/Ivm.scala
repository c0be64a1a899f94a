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

  /** The newest persisted state. */
  def readAggView(spark: SparkSession, path: String): DataFrame = {
    val v = versions(path)
    require(v.nonEmpty, s"no agg view at $path — call buildAggView first")
    spark.read.parquet(s"$path/v${v.max}")
  }

  private def versions(path: String): Seq[Long] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Seq.empty
    val stream = Files.list(p)
    try stream.toArray.map(_.toString.split('/').last)
      .filter(_.startsWith("v"))
      .flatMap(n => scala.util.Try(n.stripPrefix("v").toLong).toOption)
      .toSeq
    finally stream.close()
  }

  private def nextVersion(path: String): Long =
    versions(path).foldLeft(0L)(math.max) + 1L
}
