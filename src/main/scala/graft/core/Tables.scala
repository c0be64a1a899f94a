package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (see /root/repo/TESTDATA.md).
  *
  * One parquet file per table; the scale-factor directory is passed in by
  * the harness. All loads are plain `spark.read.parquet` so Catalyst can
  * push filters / prune columns into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")

  /** `events.ts` surfaces as BIGINT nanoseconds since epoch, whatever
    * width the parquet writer used — the engine's one event-time
    * representation (long-ns ordering/comparison is bit-exact across
    * engines; oracles read the same instants via `epoch_us(ts)`):
    *
    *  - TIMESTAMP(NANOS) data arrives as LongType already (the
    *    `nanosAsLong` session conf) and passes through untouched;
    *  - TIMESTAMP(MICROS)/(MILLIS) data (the driver's current fixture
    *    width) arrives as TIMESTAMP_NTZ and is converted exactly:
    *    wall-clock in the UTC session → `unix_micros × 1000`.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(load(spark, sfDir, "events"))

  /** The ts-to-long-nanos normalization, exposed for every other reader
    * of an events-shaped frame (streaming file sources, specs, demos) so
    * the representation can't fork.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn(tsCol,
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col(tsCol).cast("timestamp")) *
          org.apache.spark.sql.functions.lit(1000L))
    }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
}
