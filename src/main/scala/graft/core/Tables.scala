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

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * only reads with `spark.sql.legacy.parquet.nanosAsLong=true` — so `ts`
    * surfaces as BIGINT nanoseconds since epoch here. That is a feature for
    * oracle parity: long-ns ordering/comparison is bit-exact against
    * DuckDB's TIMESTAMP_NS with zero truncation.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "events")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
}
