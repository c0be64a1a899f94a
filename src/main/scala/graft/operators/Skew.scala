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

  /** Skew-resilient INNER equi-join — the join-side analog of
    * [[saltedCountSum]]: the big side salts each row into one of `salts`
    * deterministic sub-keys; the other side replicates every row across
    * all salts, so the join key becomes (key, salt) and a hot key's rows
    * spread over `salts` reducers instead of stalling one. Semantics
    * identical to `big.join(right, key)`; cost is a `salts`× replication
    * of the right side — use when the right side is too large or
    * spill-prone to broadcast but far smaller than the skewed left. AQE's
    * skew-join split is the reactive fix; this is the explicit,
    * plannable form (e.g. when a single key exceeds what one task can
    * hold regardless of split).
    */
  def saltedJoin(big: DataFrame, right: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"salts $salts must be >= 1")
    val b = big.withColumn("_salt",
      pmod(crc32(saltSource.cast("string")), lit(salts)))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    b.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
