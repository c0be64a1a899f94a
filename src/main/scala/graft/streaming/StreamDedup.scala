package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Deduplication over a LIVE document stream — the ingest-time face of the
  * batch [[graft.operators.Dedup]] suite. A 100-TB training-data pipeline
  * dedups twice: exact/near-dup filters at ingest (here, per micro-batch,
  * against bounded state) and the full batch pass over the corpus
  * (Dedup.*) at snapshot time; same discipline as the reference's
  * WAL-then-compact split (`wal_manager.py` + `datanode/handler.py:91-120`).
  */
object StreamDedup {

  /** Exact streaming dedup: keep only the FIRST arrival of each normalized
    * text within watermark bounds (`dropDuplicatesWithinWatermark` — state
    * for a key is dropped once the watermark passes it, so state is
    * bounded by the dup-arrival horizon, not corpus size). Emitted rows
    * carry the normalization key for downstream audit.
    *
    * `tsCol` must be event-time millis (long).
    */
  def exactKeepFirst(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String): DataFrame =
    docs
      .withColumn("event_time", timestamp_millis(col(tsCol)))
      .withWatermark("event_time", watermark)
      .withColumn("norm_text", lower(trim(col(textCol))))
      .dropDuplicatesWithinWatermark("norm_text")
      .select(col(idCol), col("norm_text"), col("event_time"))

  /** A near-dup candidate: `b` arrived while `a` (the band bucket's
    * representative — first arrival wins) was already in state.
    */
  case class Candidate(a: Long, b: Long, bandIdx: Int)

  /** Streaming MinHash+LSH candidate-pair generation: shingle → minhash →
    * band keys (the batch [[Dedup.minhashed]] pipeline — stateless, so it
    * runs unchanged on a stream), then one stateful op keyed by
    * (band_idx, band_key) whose state is the bucket's REPRESENTATIVE doc id
    * (first arrival). Every later doc landing in the bucket emits a
    * (representative, newcomer) candidate — the streaming face of the
    * batch band self-join, with state one long per occupied bucket rather
    * than the corpus.
    *
    * Emitted pairs are CANDIDATES (same contract as the batch band join
    * before its Jaccard verify): a pair colliding in several bands emits
    * once per band, and exact verification belongs downstream — batch
    * Jaccard over the flagged ids in `foreachBatch`, exactly where
    * [[QueryStream]] puts its exact re-rank.
    *
    * State never expires here (NoTimeout) — the honest production form
    * bounds it with `GroupStateTimeout.EventTimeTimeout` at the dedup
    * horizon, trading cross-horizon recall for bounded state, the same
    * trade [[graft.store.VectorStore.compact]] documents for tombstone GC.
    */
  /** INFINITE-horizon exact dedup with BOUNDED state — the bloom-state
    * complement to [[exactKeepFirst]]: where the watermark variant drops
    * state past the horizon (and so re-admits a duplicate arriving after
    * it), this keeps a per-shard bloom BITMAP forever — `shards ×
    * bitsPerShard/8` bytes total (512 KiB at 64 × 2^16 defaults), at ANY
    * stream length — and drops every row whose normalized text was ever
    * seen. The price is the bloom trade: a false positive drops a NOVEL
    * document (rate ≈ (inserted·k/bits)^k per shard — size bits to the
    * expected corpus; the standard production trade for never-forget
    * dedup, vs. state growing with the distinct corpus forever).
    *
    * Bit positions come from the SAME [[graft.operators.Bloom.positions]]
    * slices as the batch bloom artifacts (computed in-plan, codegen);
    * rows process in ascending `idCol` order within a (micro-batch,
    * shard), so within-batch duplicates also collapse deterministically.
    * Emits only surviving rows: (idCol, norm_text), Append mode.
    */
  def bloomKeepFirst(docs: DataFrame, idCol: String, textCol: String,
      shards: Int = 64, bitsPerShard: Int = 1 << 16, k: Int = 5): DataFrame = {
    require(shards >= 1, s"shards $shards must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = bitsPerShard / 64
    val norm = lower(trim(col(textCol)))
    val pos = array(graft.operators.Bloom.positions(norm, bitsPerShard, k): _*)
    docs
      .select(col(idCol).cast("long"),
        graft.functions.TextFunctions.md5Bucket(norm, shards, salt = "bd:")
          .cast("int").as("__shard"),
        pos.as("__pos"), norm.as("norm_text"))
      .as[(Long, Int, Seq[Long], String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Array[Long], (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          val bm = state.getOption.getOrElse(new Array[Long](words))
          val out = rows.toSeq.sortBy(_._1).iterator.flatMap {
            case (id, _, ps, text) =>
              val seen = ps.forall(p =>
                (bm((p >> 6).toInt) & (1L << (p & 63L))) != 0L)
              if (seen) Iterator.empty
              else {
                ps.foreach(p => bm((p >> 6).toInt) |= 1L << (p & 63L))
                Iterator.single((id, text))
              }
          }.toVector
          state.update(bm)
          out.iterator
      }
      .toDF(idCol, "norm_text")
  }

  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, numHashes: Int = 16, bands: Int = 4,
      keyForm: String = "raw"): Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // keyForm = Dedup.textKeyFor's forms (row-local, stream-safe): the
    // streaming candidates inherit the batch fold dispatch, so a
    // folded-key batch pass and its live twin can never drift
    Dedup.minhashed(docs, idCol, textCol, shingleN, numHashes, bands,
        keyForm)
      // plain posexplode (NOT the _outer batch variant): a null bands
      // array must not inject a null-keyed row into the typed groupByKey
      // state; the inferred-size-filter cost it avoids is a batch
      // parquet-scan concern, not a streaming one
      .select(col(idCol), posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      .as[(Long, Int, String)]
      .groupByKey { case (_, bandIdx, bandKey) => (bandIdx, bandKey) }
      .flatMapGroupsWithState[Long, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((bandIdx, _), rows, state: GroupState[Long]) =>
          // deterministic within a micro-batch: smallest id claims an
          // empty bucket, everyone else pairs against the representative
          val ids = rows.map(_._1).toSeq.sorted
          if (ids.isEmpty) Iterator.empty
          else {
            val rep = state.getOption.getOrElse {
              state.update(ids.head); ids.head
            }
            ids.iterator.filter(_ != rep)
              .map(id => Candidate(math.min(rep, id), math.max(rep, id), bandIdx))
          }
      }
  }
}
