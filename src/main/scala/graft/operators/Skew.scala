package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase (salted) aggregation.
  *
  * A single `groupBy(key)` puts every row of a hot key on one reducer; at
  * 100 TB a heavy-hitter key (one language, one boilerplate doc group)
  * stalls the stage. Salting splits each key into `salts` deterministic
  * sub-groups, aggregates partially per (key, salt), then combines the
  * small per-salt partials — two shuffles, both balanced. AQE's skew-join
  * handling covers joins; this is the aggregation-side analog.
  */
object Skew {

  /** Count + sum per key via salted two-phase aggregation. `saltSource`
    * must be a deterministic per-row column (e.g. the row id) so results
    * are reproducible run-to-run.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
      saltSource: Column, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(crc32(saltSource.cast("string")), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_cnt"), sum(col(valueCol)).as("_sum"))
      .groupBy(col(keyCol))
      .agg(sum(col("_cnt")).as("cnt"), sum(col("_sum")).as("sum"))
}
