package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum ordering — assign every row its EXACT global training-order
  * index under a (difficulty, tie) total order, without the one shape
  * that cannot survive 100 TB: `row_number() OVER (ORDER BY …)` funnels
  * the entire corpus through a single task. The standard two-level
  * decomposition instead:
  *
  *   1. per-bucket counts (`difficulty` is bucketed/integral — quality
  *      grades, token-count bands): one hash-agg, ≤ |buckets| rows out;
  *   2. exclusive running offsets over that TINY frame (a single-
  *      partition window over bucket-cardinality rows — an artifact, not
  *      data);
  *   3. intra-bucket `row_number` partitioned BY bucket — parallel
  *      across buckets — plus the broadcast offset.
  *
  * `ord = offset(bucket) + rank_within(bucket)` is exactly the global
  * row_number (CurriculumSpec pins equality against the naive global
  * window; the oracle query pins it against SQL). Skew note: one giant
  * bucket re-creates the funnel inside that bucket — pick a bucketing
  * with bounded occupancy (band token counts, don't use a constant).
  */
object Curriculum {

  /** (input columns…, ord LONG): 1-based global index under
    * (bucketCol asc, tieCol asc). `bucketCol` must be integral-ordered;
    * `tieCol` must be unique per row for a total order.
    */
  def globalOrderIndex(df: DataFrame, bucketCol: String,
      tieCol: String): DataFrame = {
    // A NULL bucket would never match the offsets frame (null != null in
    // an equi-join) and its rows would silently vanish, breaking the
    // 1..n permutation contract — fail loud in the plan instead (zero
    // extra passes; the check rides the existing scan).
    val checked = df.withColumn(bucketCol,
      when(col(bucketCol).isNull, raise_error(lit(
        s"Curriculum.globalOrderIndex: NULL $bucketCol — every row needs " +
          "a bucket; filter or impute nulls upstream")))
        .otherwise(col(bucketCol)))
    val counts = checked.groupBy(col(bucketCol)).agg(count(lit(1)).as("__n"))
    // exclusive running sum over the bucket-cardinality frame (tiny)
    val offsets = counts.withColumn("__off",
      coalesce(sum(col("__n")).over(
        Window.orderBy(col(bucketCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(bucketCol), col("__off"))
    val intra = Window.partitionBy(col(bucketCol)).orderBy(col(tieCol).asc)
    checked.join(broadcast(offsets), Seq(bucketCol))
      .withColumn("ord", col("__off") + row_number().over(intra))
      .drop("__off")
  }
}
