package graft.store

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Constants, Schemas}
import graft.functions.VectorFunctions
import graft.operators.Knn

/** Parquet/JSON-backed keyed vector table — the reference's whole datanode
  * storage engine (`src/datanode/handler.py:20-428` + WAL
  * `src/utils/wal_manager.py`) re-expressed as an immutable-files design:
  *
  *   - WAL  = append-only JSON-lines dir (`wal/`), one op per line, exactly
  *     the reference's line shape (`wal_manager.py:90-98`) plus a
  *     `batch_seq` that makes replay order deterministic (FIXTURES.md §3
  *     strengthens the reference's dict-overwrite order).
  *   - Snapshot = compacted parquet (`snapshot_<seq>/`) — the checkpoint
  *     (`datanode/handler.py:156-179`); `wal_pos.txt` holds the covered
  *     batch_seq, so recovery = snapshot ∪ WAL-rows-after-pos, the
  *     incremental replay of `wal_manager.py:185-246`.
  *   - Tombstones are DELETE rows compacted away by a last-writer-wins
  *     window — no mutable `deleted_ids` set (`datanode/handler.py:43`)
  *     needed; compaction (`compact()`) IS the index rebuild
  *     (`_rebuild_hnsw_index`, `datanode/handler.py:91-120`).
  *
  * Scale: `compacted` shuffles once on `key` (the LWW window); at cluster
  * scale the snapshot would be written bucketed by `key` so recurring
  * compactions and point lookups co-locate. Dim validation (R8) splits the
  * batch instead of aborting it, mirroring the reference's per-op reject
  * (`datanode/handler.py:228-232`).
  */
class VectorStore(spark: SparkSession, baseDir: String, dim: Int = Constants.Dim) {
  private val walDir      = s"$baseDir/wal"
  private val posFile     = Paths.get(s"$baseDir/wal_pos.txt")
  private val snapDirBase = s"$baseDir/snapshot"

  private def now(): Long = System.currentTimeMillis()

  /** Monotonic append sequence (driver-side; one writer per store). */
  private var lastSeq: Long = readPos().max(0L)

  private def nextSeq(): Long = { lastSeq = (now() * 1000).max(lastSeq + 1); lastSeq }

  private def readPos(): Long =
    if (Files.exists(posFile)) new String(Files.readAllBytes(posFile)).trim.toLong else -1L

  private def writePos(seq: Long): Unit = {
    Files.createDirectories(posFile.getParent)
    Files.write(posFile, seq.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Append PUT ops. Rows failing dim validation are rejected (returned),
    * not written — reference error semantics (`datanode/handler.py:228-232`).
    * Returns (accepted, rejected) counts.
    */
  def put(batch: DataFrame): (Long, Long) = {
    val seq = nextSeq()
    val ok  = batch.where(VectorFunctions.dimOk(col("vector"), dim))
    val bad = batch.count() // total; rejected = total - accepted
    val accepted = ok.count()
    ok.select(
        lit("PUT").as("op_type"), col("key"),
        col("vector").cast("array<double>").as("vector"),
        col("metadata"), col("ts").as("timestamp"),
        lit("spark").as("node_id"), lit(seq).as("batch_seq"))
      .write.partitionBy("batch_seq").mode("append").json(walDir)
    (accepted, bad - accepted)
  }

  /** Append DELETE tombstones with per-row timestamps: `ops` must carry
    * (key STRING, ts LONG). Event-time LWW then interleaves deletes and
    * puts correctly regardless of batch arrival order.
    */
  def delete(ops: DataFrame): Unit = {
    val seq = nextSeq()
    ops.select(
        lit("DELETE").as("op_type"), col("key"),
        lit(null).cast("array<double>").as("vector"),
        lit(null).cast("map<string,string>").as("metadata"),
        col("ts").as("timestamp"),
        lit("spark").as("node_id"), lit(seq).as("batch_seq"))
      .write.partitionBy("batch_seq").mode("append").json(walDir)
  }

  /** Append DELETE tombstones (null vector/metadata, reference WAL shape). */
  def delete(keys: Seq[String], ts: Long): Unit = {
    val seq = nextSeq()
    import spark.implicits._
    keys.toDF("key").select(
        lit("DELETE").as("op_type"), col("key"),
        lit(null).cast("array<double>").as("vector"),
        lit(null).cast("map<string,string>").as("metadata"),
        lit(ts).as("timestamp"),
        lit("spark").as("node_id"), lit(seq).as("batch_seq"))
      .write.partitionBy("batch_seq").mode("append").json(walDir)
  }

  private def walSchema = Schemas.wal.add("batch_seq", "long")

  /** All WAL ops newer than the snapshot position. PERMISSIVE mode skips
    * corrupt lines — the reference's replay semantics
    * (`wal_manager.py:142-146`).
    *
    * The WAL dir is PARTITIONED by `batch_seq` (one dir per append), so
    * the `batch_seq > afterSeq` predicate is partition pruning: an
    * incremental replay never opens pre-checkpoint files — the
    * reference's file-name-timestamp pruning (`wal_manager.py:189-195`)
    * at the storage layer, not a row filter.
    */
  def walOps(afterSeq: Long = readPos()): DataFrame = {
    val p = Paths.get(walDir)
    if (!Files.exists(p)) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], walSchema)
    else spark.read.schema(walSchema).option("mode", "PERMISSIVE").json(walDir)
      .where(col("batch_seq") > afterSeq)
      .where(col("op_type").isNotNull && col("key").isNotNull)
  }

  private def latestSnapshot: Option[String] = {
    val base = Paths.get(baseDir)
    if (!Files.exists(base)) return None
    val snaps = Files.list(base).toArray.map(_.toString)
      .filter(_.matches(".*/snapshot_\\d+$")).sorted
    snaps.lastOption
  }

  /** The live table: snapshot ∪ newer WAL, last-writer-wins by
    * (timestamp, batch_seq), tombstones dropped. One shuffle on `key`.
    */
  def compacted: DataFrame = {
    val snap = latestSnapshot.map(spark.read.parquet(_)).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(walSchema.filter(_.name != "node_id"))))
    val delta = walOps().drop("node_id")
    val w = Window.partitionBy(col("key"))
      .orderBy(col("timestamp").desc, col("batch_seq").desc)
    snap.unionByName(delta)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("op_type") === "PUT")
      .select(col("key"), col("vector"), col("metadata"), col("timestamp").as("ts"))
  }

  /** Point lookup (S1): pushes the key predicate into the scans. */
  def get(key: String): DataFrame = compacted.where(col("key") === key)

  /** Full export (S3 / `get_all_vectors`, declared but unimplemented in the
    * reference — implemented here for real).
    */
  def scan: DataFrame = compacted

  /** KNN over the live table with the full SearchRequest surface. */
  def search(req: Knn.SearchRequest): DataFrame = Knn.searchStore(compacted, req)

  /** Materialize the compaction (checkpoint, S5): write a new snapshot
    * covering everything up to the current WAL tip, then advance
    * `wal_pos.txt`. Old snapshots/WAL files stay for time travel; a real
    * deployment would GC them by retention (reference: 7 days,
    * `wal_manager.py:23`).
    */
  def compact(): Unit = {
    val tip = lastSeq.max(
      walOps(-1L).agg(max(col("batch_seq"))).head().getAs[Any](0) match {
        case null       => -1L
        case l: Long    => l
        case other      => other.toString.toLong
      })
    val snapDf = {
      val w = Window.partitionBy(col("key"))
        .orderBy(col("timestamp").desc, col("batch_seq").desc)
      val snap = latestSnapshot.map(spark.read.parquet(_)).getOrElse(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(walSchema.filter(_.name != "node_id"))))
      snap.unionByName(walOps().drop("node_id"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1 && col("op_type") === "PUT")
        .drop("rn")
    }
    snapDf.write.mode("overwrite").parquet(s"${snapDirBase}_$tip")
    writePos(tip)
  }
}
