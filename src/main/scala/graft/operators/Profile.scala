package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE`/data-quality pass of a warehouse: one
  * row per column with null/distinct/range stats, the input to skew
  * detection, partition planning, and ingestion QA.
  *
  * Scale shape: ONE aggregation over one scan produces every metric
  * (column-wise agg, then an in-row `stack` to the long format — the
  * reshape costs nothing, it runs on a single driver-bound row). The
  * exact `countDistinct` per column makes Spark expand the input (one
  * group-set per column) — correct for oracle parity; at 100 TB swap in
  * `approx_count_distinct` (HLL, single pass, no expand) and drop the
  * cross-engine hash check (sketches are engine-specific by nature).
  */
object Profile {

  /** (col_name, n_nonnull, n_null, n_distinct, min_v, max_v) for each of
    * `cols` (numeric or castable-to-double), ordered by col_name.
    *
    * Shape: null/range stats come from ONE expand-free pass (putting the
    * exact countDistincts in that same agg would make Spark EXPAND the
    * scan — one input replica per distinct column); each distinct count
    * is its own column-pruned branch (scan reads one column, map-side
    * partial-distinct, shuffle carries only the distinct values), all
    * unioned and broadcast-joined to the base stats. At 100 TB swap the
    * branches for `approx_count_distinct` (HLL, zero extra passes) and
    * drop the cross-engine hash check (sketches are engine-specific).
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.numeric: no columns given")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
      min(col(c).cast("double")).as(s"${c}__mn"),
      max(col(c).cast("double")).as(s"${c}__mx")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', ${c}__n, ${c}__nn, ${c}__mn, ${c}__mx").mkString(", ")
    val base = wide.selectExpr(s"stack(${cols.length}, $stacked) AS " +
      "(col_name, n_nonnull, n_null, min_v, max_v)")
    val ndist = cols.map { c =>
      df.where(col(c).isNotNull).select(col(c).as("v")).distinct()
        .agg(count(lit(1)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_distinct"))
    }.reduce(_.unionAll(_))
    base.join(broadcast(ndist), "col_name")
      .select(col("col_name"), col("n_nonnull"), col("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy(col("col_name"))
  }
}
