package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    *
    * `hllCol`: optionally carry a DISTINCT-COUNT sketch in the same
    * state row — a dense `hll` array of 2^p HyperLogLog registers over
    * the column's values ([[Sketch.hllBucketRank]] hashing, so the
    * registers are exact integers and the merged view hash-matches a
    * full recompute). Registers are a max semilattice, so the sketch
    * rides the SAME ⊕ as the scalar monoids and a materialized view
    * refreshes per-group distinct counts incrementally — the one
    * statistic count/sum/min/max can't express. Built in two hash-aggs:
    * (groups, bucket) partials first — every scalar is a monoid, so
    * re-aggregating the partials is exact — then one fold into the
    * dense array.
    */
  def aggState(df: DataFrame, groupCols: Seq[String], valueCol: String,
      hllCol: Option[String] = None, p: Int = 8,
      xCol: Option[String] = None,
      histSpec: Option[(Long, Long, Int)] = None): DataFrame = {
    // histSpec (lo, hi, buckets): carry a dense fixed-width HISTOGRAM of
    // valueCol in the state row ([[Sketch.histogramBuckets]] bucketing,
    // domain-clamped) — per-bucket counts are sum monoids, so the merged
    // view serves exact bucket percentiles/MAD in O(delta + groups)
    // ([[histogramOf]] reads it back out). One array statistic per view:
    // compose hll + hist as two views sharing the same refresh cadence.
    require(hllCol.isEmpty || histSpec.isEmpty,
      "aggState: hllCol and histSpec are one-array-per-view — use two views")
    histSpec.foreach { case (lo, hi, bk) =>
      require(hi > lo && bk >= 1 && (hi - lo) <= Long.MaxValue / bk,
        s"aggState: bad histogram domain [$lo, $hi) x $bk")
      return aggStateWithHist(df, groupCols, valueCol, xCol, lo, hi, bk)
    }
    // optional regression-trend sums: with an x column, the state also
    // carries (sx, sxy, sxx) — three more Long monoids, so a refreshed
    // view reads out the exact least-squares drift ([[trendOf]]) without
    // ever rescanning the base. Row-level products stay in Long (the
    // Profile.trendExact contract); the CLEARED-denominator widening to
    // decimal38 happens only at read time.
    val trendAggs = xCol.toSeq.flatMap { xc =>
      Seq(sum(col(xc)).as("sx"),
        sum(col(xc) * col(valueCol)).as("sxy"),
        sum(col(xc) * col(xc)).as("sxx"))
    }
    hllCol match {
      case None =>
        val aggs = Seq(count(lit(1)).as("n"), sum(col(valueCol)).as("s"),
          min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx")) ++
          trendAggs
        df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      case Some(hc) =>
        val m = 1 << p
        val (b, r) = graft.operators.Sketch.hllBucketRank(col(hc), p)
        val keep = groupCols.map(col) ++ Seq(col(valueCol)) ++
          xCol.map(col).toSeq ++ Seq(b.as("__b"), r.as("__r"))
        val partial = Seq(count(lit(1)).as("n"), sum(col(valueCol)).as("s"),
          min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx")) ++
          trendAggs ++ Seq(max(col("__r")).as("__reg"))
        val resum = Seq(sum(col("n")).as("n"), sum(col("s")).as("s"),
          min(col("mn")).as("mn"), max(col("mx")).as("mx")) ++
          xCol.toSeq.flatMap(_ => Seq(sum(col("sx")).as("sx"),
            sum(col("sxy")).as("sxy"), sum(col("sxx")).as("sxx"))) ++
          Seq(aggregate(collect_list(struct(col("__b"), col("__reg"))),
            array_repeat(lit(0L), m),
            (acc, e) => transform(acc, (v, i) =>
              when(i.cast("long") === e.getField("__b"),
                greatest(v, e.getField("__reg"))).otherwise(v))).as("hll"))
        df.select(keep: _*)
          .groupBy((groupCols.map(col) :+ col("__b")): _*)
          .agg(partial.head, partial.tail: _*)
          .groupBy(groupCols.map(col): _*)
          .agg(resum.head, resum.tail: _*)
    }
  }

  /** Two-level histogram-state build (the hll pattern with SUM in place
    * of register-max): partials by (groups, bucket) — every scalar is a
    * monoid so re-aggregating is exact — then one fold into the dense
    * per-group count array.
    */
  private def aggStateWithHist(df: DataFrame, groupCols: Seq[String],
      valueCol: String, xCol: Option[String], lo: Long, hi: Long,
      bk: Int): DataFrame = {
    val trendAggs = xCol.toSeq.flatMap { xc =>
      Seq(sum(col(xc)).as("sx"),
        sum(col(xc) * col(valueCol)).as("sxy"),
        sum(col(xc) * col(xc)).as("sxx"))
    }
    val b = expr(s"((greatest(${lo}L, least(${hi - 1}L, `$valueCol`)) - ${lo}L)" +
      s" * ${bk}L) div ${hi - lo}L")
    val partial = Seq(count(lit(1)).as("n"), sum(col(valueCol)).as("s"),
      min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx")) ++
      trendAggs ++ Seq(count(lit(1)).as("__c"))
    val resum = Seq(sum(col("n")).as("n"), sum(col("s")).as("s"),
      min(col("mn")).as("mn"), max(col("mx")).as("mx")) ++
      xCol.toSeq.flatMap(_ => Seq(sum(col("sx")).as("sx"),
        sum(col("sxy")).as("sxy"), sum(col("sxx")).as("sxx"))) ++
      Seq(aggregate(collect_list(struct(col("__b"), col("__c"))),
        array_repeat(lit(0L), bk),
        (acc, e) => transform(acc, (v, i) =>
          v + when(i.cast("long") === e.getField("__b"),
            e.getField("__c")).otherwise(0L))).as("hist"))
    df.select((groupCols.map(col) :+ col(valueCol) :+ b.as("__b")) ++
        xCol.map(col).toSeq: _*)
      .groupBy((groupCols.map(col) :+ col("__b")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(groupCols.map(col): _*)
      .agg(resum.head, resum.tail: _*)
  }

  /** Bucket rows back out of a hist-carrying state/view:
    * (groups…, bucket, n_bucket), empty buckets omitted — exactly the
    * shape [[Sketch.histogramBuckets]] produces from a full scan, so the
    * sketch's percentile/MAD readers run unchanged on the refreshed
    * view.
    */
  def histogramOf(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state.select((groupCols.map(col) :+
        posexplode(col("hist")).as(Seq("bucket", "n"))): _*)
      .where(col("n") =!= 0L)
      .select((groupCols.map(col) :+ col("bucket").cast("long").as("bucket") :+
        col("n")): _*)

  /** Exact least-squares drift read out of a state/view frame that
    * carries the trend sums: (group..., n, slope_num, slope_den) —
    * num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)², decimal(38,0). The IVM
    * face of [[Profile.trendExact]]: same rational, but computed from a
    * persisted view that refreshed in O(delta).
    */
  def trendOf(state: DataFrame, groupCols: Seq[String]): DataFrame = {
    val dec = "decimal(38,0)"
    state.select((groupCols.map(col) :+ col("n") :+
      (col("n").cast(dec) * col("sxy").cast(dec) -
        col("sx").cast(dec) * col("s").cast(dec)).as("slope_num") :+
      (col("n").cast(dec) * col("sxx").cast(dec) -
        col("sx").cast(dec) * col("sx").cast(dec)).as("slope_den")): _*)
  }

  /** ⊕ — merge state frames group-wise: counts and sums add, extrema
    * take min/max, HLL registers (when the states carry an `hll` column)
    * take bucket-wise max. Groups absent on one side pass through (the
    * monoid identity). One hash-agg over the concatenated states — the
    * states are |groups|-sized, so this never touches source data.
    */
  def mergeStates(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeStates: need at least one state frame")
    val u = states.reduce(_.unionByName(_))
    val scalars0 = Seq(sum(col("n")).as("n"), sum(col("s")).as("s"),
      min(col("mn")).as("mn"), max(col("mx")).as("mx"))
    // trend sums (when the states carry them) add like every other sum
    val scalars =
      if (!u.columns.contains("sx")) scalars0
      else scalars0 ++ Seq(sum(col("sx")).as("sx"),
        sum(col("sxy")).as("sxy"), sum(col("sxx")).as("sxx"))
    // Bucket-wise array folds MUST see a uniform width: zip_with pads a
    // shorter side with nulls, so silently merging an hll built at a
    // different `p` (or a hist with a different bucket count) would
    // corrupt registers instead of failing. Guard every step after the
    // empty-init adoption with a loud width check.
    def widthCheckedFold(colName: String, what: String,
        step: (Column, Column) => Column): Column =
      aggregate(collect_list(col(colName)), array().cast("array<bigint>"),
        (acc, x) => when(size(acc) === 0, x)
          .when(size(x) =!= size(acc),
            raise_error(format_string(
              s"Ivm.mergeStates: $what width mismatch (%d vs %d) — " +
                "states were built with incompatible specs",
              size(acc), size(x))).cast("array<bigint>"))
          .otherwise(zip_with(acc, x, step))).as(colName)
    val withHll =
      if (!u.columns.contains("hll")) scalars
      // registers take bucket-wise max; first step adopts the row
      else scalars :+ widthCheckedFold("hll", "hll register",
        (a, b) => greatest(a, b))
    val aggs =
      if (!u.columns.contains("hist")) withHll
      // histogram counts ADD bucket-wise (sum monoid)
      else withHll :+ widthCheckedFold("hist", "histogram bucket",
        (a, b) => a + b)
    u.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Build + persist the view artifact (versioned dir, newest-wins —
    * the snapshot discipline of VectorStore): the one full scan, paid at
    * build time.
    */
  def buildAggView(df: DataFrame, groupCols: Seq[String], valueCol: String,
      path: String, hllCol: Option[String] = None, p: Int = 8,
      xCol: Option[String] = None,
      histSpec: Option[(Long, Long, Int)] = None): Unit =
    aggState(df, groupCols, valueCol, hllCol, p, xCol, histSpec)
      .write.mode("overwrite").parquet(s"$path/v${nextVersion(path)}")

  /** Refresh the persisted view with a delta batch: read the current
    * state (|groups| rows), ⊕ the delta's state (computed from the delta
    * ALONE), write the next version. The base corpus is never read.
    */
  def refreshAggView(delta: DataFrame, groupCols: Seq[String],
      valueCol: String, path: String, hllCol: Option[String] = None,
      p: Int = 8, xCol: Option[String] = None,
      histSpec: Option[(Long, Long, Int)] = None): Unit = {
    val cur = readAggView(delta.sparkSession, path)
    mergeStates(Seq(cur,
        aggState(delta, groupCols, valueCol, hllCol, p, xCol, histSpec)),
        groupCols)
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
      path: String, batchId: Long, hllCol: Option[String] = None,
      p: Int = 8, xCol: Option[String] = None,
      histSpec: Option[(Long, Long, Int)] = None): Unit = {
    if (completeBatchIds(path).contains(batchId)) return
    val cur = readAggView(delta.sparkSession, path)
    mergeStates(Seq(cur,
        aggState(delta, groupCols, valueCol, hllCol, p, xCol, histSpec)),
        groupCols)
      .write.mode("overwrite")
      .parquet(s"$path/v${nextVersion(path)}_b$batchId")
  }

  /** (version, dir, batchId?) for every version dir on disk, torn or not. */
  private[operators] def versionDirs(path: String): Seq[(Long, String, Option[Long])] = {
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

  private[operators] def completeVersions(path: String): Seq[Long] =
    versionDirs(path).filter(d => isComplete(d._2)).map(_._1)

  private def completeBatchIds(path: String): Set[Long] =
    versionDirs(path).filter(d => isComplete(d._2)).flatMap(_._3).toSet

  /** Next version number — counts TORN dirs too, so a crashed write's
    * number is never reused (its leftover dir can't shadow a newer
    * complete one).
    */
  private[operators] def nextVersion(path: String): Long =
    versionDirs(path).map(_._1).foldLeft(0L)(math.max) + 1L
}
