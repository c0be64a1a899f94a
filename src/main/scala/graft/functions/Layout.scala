package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout clustering — the physical-layout lever for
  * multi-dimensional data skipping at 100 TB: sort a table by the
  * interleaved bits of two key columns and every written file covers a
  * BOUNDED range in BOTH dimensions, so parquet min/max row-group stats
  * prune scans filtering on either key (the Delta/Iceberg
  * `OPTIMIZE ZORDER` idea, built from plain codegen'd bit arithmetic —
  * no UDF, no custom expression).
  *
  * The bit-spread is the classic 2D magic-mask sequence (Morton 1966;
  * the constants are the standard interleave masks, e.g. Hacker's
  * Delight §7-2): each step doubles the gap between payload bits. All
  * operations are exact Long bitwise ops, so any engine computing the
  * same chain gets the same codes — the layout (and its oracle) is
  * engine-portable by construction.
  */
object Layout {

  /** Spread the low 31 bits of `x` to even bit positions (0, 2, 4, …).
    * Inputs are masked to 31 bits so two interleaved values stay inside
    * a positive signed Long.
    */
  def spreadBits(x: Column): Column = {
    var v = x.cast("long").bitwiseAND(lit(0x7FFFFFFFL))
    v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
    v = v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
    v
  }

  /** Morton code of `(a, b)`: a's bits at even positions, b's at odd.
    * Nearby (a, b) points get nearby codes, so a sort by the code
    * clusters both dimensions at once.
    */
  def morton2(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** The OPTIMIZE ZORDER write itself: range-partition by the morton code
    * (sampled range exchange — scalable, never a single-partition sort),
    * sort within partitions, write one file per partition. Every output
    * file then carries tight parquet min/max stats in BOTH dimensions, so
    * scans filtering on either column skip files (LayoutSpec measures the
    * per-file bounding boxes to prove it).
    */
  def writeZOrdered(df: org.apache.spark.sql.DataFrame, aCol: String,
      bCol: String, path: String, numFiles: Int): Unit =
    df.withColumn("__z", morton2(col(aCol), col(bCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Compaction bin-packing — the small-files answer, in ONE pass: an AQE
    * `REBALANCE` exchange packs the input into evenly-sized partitions at
    * runtime (coalescing small-file fragments, splitting skewed ones —
    * no separate count() job), and `maxRecordsPerFile` caps every written
    * file at the target, so output files are bounded above with at most
    * one short tail file per task. This is exactly the Delta/Iceberg
    * OPTIMIZE shape: target size + remainder file, decided from the write
    * job's own runtime statistics. At 100 TB the binding cap is bytes —
    * AQE's `advisoryPartitionSizeInBytes` — and the row cap rides along
    * unchanged. Compaction cadence is the store's (VectorStore.compact);
    * this is the generic form for any table that accretes small files.
    */
  def writeBinPacked(df: org.apache.spark.sql.DataFrame, path: String,
      targetRowsPerFile: Long): Unit = {
    require(targetRowsPerFile > 0, s"targetRowsPerFile $targetRowsPerFile must be positive")
    df.hint("rebalance")
      .write.option("maxRecordsPerFile", targetRowsPerFile)
      .mode("overwrite").parquet(path)
  }

  /** Deterministic global corpus shuffle — the epoch-shuffle write of a
    * training pipeline: order rows by `md5(salt ‖ key)` so the written
    * layout is a reproducible pseudo-random permutation (new salt → new
    * epoch order; same salt → byte-identical layout, auditable). Shape:
    * one sampled range exchange + per-partition sort — the same scalable
    * sort-write as [[writeZOrdered]], never a single-partition
    * `row_number`. Readers consuming files in name order see the
    * permuted sequence.
    */
  def writeShuffled(df: org.apache.spark.sql.DataFrame, keyCol: String,
      path: String, numFiles: Int, salt: String = ""): Unit = {
    require(numFiles >= 1, s"numFiles $numFiles must be >= 1")
    df.withColumn("__sh", md5(concat(lit(salt), col(keyCol).cast("string"))))
      .repartitionByRange(numFiles, col("__sh"))
      .sortWithinPartitions(col("__sh"))
      .drop("__sh")
      .write.mode("overwrite").parquet(path)
  }
}
