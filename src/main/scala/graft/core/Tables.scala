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

  /** Parallelism floor for HEAVY ROW-LOCAL pipelines over tiny inputs
    * (r15, guide §2.6 "idle capacity" / §6 input splits). A parquet file
    * is split by byte range, but rows live in row groups: a
    * single-row-group file is read by AT MOST ONE task no matter how
    * many splits it gets, so every expression above the scan — tokenize,
    * gram-build, md5, shingle — runs single-threaded while the rest of
    * the cluster idles (measured at sf0.1: the corpus gram+md5 map stage
    * of q181 was ONE 5 s task on a 32-core session).
    *
    * When the input is small enough that moving it once is free
    * (total bytes < defaultParallelism × `perTaskBytes`), round-robin it
    * across the cluster BEFORE the expensive row-local work. The gate is
    * scale-adaptive, not a local-mode constant: at production scale a
    * table is orders of magnitude over it (and already has row-group
    * parallelism), the branch is never taken, and no shuffle is added —
    * the file-count short-circuit also keeps the gate itself O(1) there
    * (no per-file stat when files >= cores). Apply ONLY where the
    * downstream per-row work dominates (text pipelines); a plain
    * scan→aggregate is faster unfloored (measured: q67 0.3 s → 0.8 s
    * under a blanket floor).
    */
  def parFloor(df: DataFrame, perTaskBytes: Long = 4L << 20): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty || files.length >= par) return df
    val conf = spark.sessionState.newHadoopConf()
    val total = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    if (total < par.toLong * perTaskBytes) {
      // The always-true nondeterministic predicate is a PUSHDOWN BARRIER:
      // Catalyst pushes deterministic filters through a repartition, so a
      // heavy row-local GATE (q147's count_in_set probe, measured as one
      // 2.9 s scan-side task) would land back in the single-task scan and
      // undo the floor. Filters cannot be reordered across a
      // nondeterministic predicate, so everything above runs on the
      // spread partitions. Only under the gate — at scale the floor (and
      // the barrier) do not exist, and scan-level pushdown is untouched.
      df.repartition(par)
        .where(org.apache.spark.sql.functions.spark_partition_id() >= 0)
    } else df
  }

  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")

  /** [[documents]] under the [[parFloor]] parallelism floor — for query
    * paths whose scan-side per-row work (tokenize / gram / hash /
    * classify) dominates. Applied PER QUERY to the r15-measured winners
    * only: pipelines that run many small jobs (the minhash/CC family,
    * store lifecycles, driver-side loops) measured SLOWER under a
    * blanket floor (extra 32-task stages × many jobs), so they keep the
    * unfloored loader. See OPTIMIZATION_r15.md for the per-query A/B.
    */
  def documentsPar(spark: SparkSession, sfDir: String): DataFrame =
    parFloor(documents(spark, sfDir))

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
