package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.l2SqFold

/** SQ8 scalar quantization — the 4×-compression ANN memory tier between
  * exact floats and PQ (the FAISS `SQ8` index): each dimension is mapped
  * to a byte against per-dimension [lo, hi] ranges learned from the
  * corpus. Search scores the DEQUANTIZED codes asymmetrically against the
  * full-precision query (like [[Pq]] ADC, but per-scalar), so the scan
  * reads 1/4 the bytes of the float corpus while the query loses no
  * precision on its side.
  *
  * Everything is built from codegen'd array lambdas over broadcast-able
  * literal range arrays — zero UDFs, zero shuffles at query time; the
  * only shuffle is the one-time per-dimension min/max training agg (and
  * min/max are EXACT, order-free aggregations, so the artifact is
  * engine-portable — the oracle replicates the whole tier bit-for-bit,
  * unlike any float-sum training).
  *
  * The reference serves only full-precision vectors (its HNSW keeps
  * floats, `datanode/handler.py:86`); quantized tiers are part of this
  * engine's scale extension alongside [[Pq]].
  */
object Sq {

  /** Per-dimension quantization ranges: (pos, lo, hi) — one row per
    * dimension, the training artifact (persist like any index; tiny).
    */
  def trainMinMax(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      .groupBy("pos").agg(min("v").as("lo"), max("v").as("hi"))

  /** Driver-side range arrays (index = dimension). Like PQ codebooks, the
    * collect reads `dim` rows — an index artifact, not corpus data.
    */
  case class Ranges(lo: Array[Double], hi: Array[Double])

  def collectRanges(ranges: DataFrame): Ranges = {
    val rows = ranges.orderBy("pos").collect()
    val pos = rows.map(_.getInt(0)).toSeq
    require(pos == (0 until rows.length),
      s"ranges must cover dimensions 0..${rows.length - 1} densely, got ${pos.take(8).mkString(",")}…")
    Ranges(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Byte codes for a vector: floor((x - lo) * 255 / (hi - lo) + 0.5),
    * degenerate (hi = lo) dimensions code to 0. Codes are CLAMPED to
    * 0..255 (FAISS SQ8 behavior): on the documented range-reuse path
    * (sq8TopK/ivfSq8TopK with caller-supplied `ranges`) new data may fall
    * outside the trained [lo, hi], and an unclamped code would silently
    * break the byte-code contract.
    */
  def encodeSq8(vec: Column, r: Ranges): Column =
    transform(vec.cast("array<double>"), (x, i) => {
      val lo = element_at(typedLit(r.lo.toSeq), i + 1)
      val hi = element_at(typedLit(r.hi.toSeq), i + 1)
      when(hi === lo, lit(0L))
        .otherwise(greatest(lit(0L),
          least(lit(255L), floor((x - lo) * lit(255.0) / (hi - lo) + lit(0.5)))))
    })

  /** Reconstructed values: lo + code * (hi - lo) / 255. */
  def dequantSq8(codes: Column, r: Ranges): Column =
    transform(codes, (c, i) => {
      val lo = element_at(typedLit(r.lo.toSeq), i + 1)
      val hi = element_at(typedLit(r.hi.toSeq), i + 1)
      when(hi === lo, lo)
        .otherwise(lo + c.cast("double") * (hi - lo) / lit(255.0))
    })

  /** IVF-SQ8 composition (the FAISS `IVF..,SQ8` index): partition-prune
    * to the query's `nprobe` nearest cells, then score SQ8-dequantized
    * codes inside them — reads ≈ nprobe/K of a corpus already 4×
    * smaller. Both stages are deterministic given deterministic
    * centroids (assignment tie-breaks on cid; min/max ranges are
    * order-free), so unlike PQ/KMeans tiers this composition is fully
    * oracle-checkable. At nprobe = numCells the probed cells cover the
    * corpus and the result equals [[sq8TopK]] exactly (spec-pinned).
    */
  def ivfSq8TopK(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queryId: Long, k: Int, nprobe: Int = 1,
      ranges: Option[Ranges] = None): DataFrame = {
    val r = ranges.getOrElse(collectRanges(trainMinMax(df, vecCol)))
    val assigned = SimilaritySearch.ivfAssign(df, idCol, vecCol, centroids)
    val qEmb = df.where(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>").as("qe"))
    val probeCids = centroids.crossJoin(broadcast(qEmb))
      .select(col("cid"), col("qe"),
        graft.functions.VectorFunctions.l2Sq(col("ce"), col("qe")).as("d"))
      .orderBy(col("d").asc, col("cid").asc)
      .limit(nprobe)
      .select(col("cid").as("qcid"), col("qe"))
    assigned.join(broadcast(probeCids), col("cid") === col("qcid"))
      .select(col(idCol),
        l2SqFold(dequantSq8(encodeSq8(col("emb"), r), r), col("qe")).as("score"))
      .orderBy(col("score").asc, col(idCol).asc)
      .limit(k)
  }

  /** Asymmetric top-k over the quantized corpus: train (or pass) ranges,
    * encode in-plan, score dequantized codes against the full-precision
    * query row, heap-merge top-k. `filter` pre-restricts the candidate
    * corpus; `threshold` bounds the (quantized) score — the same
    * SearchRequest surface as the other tiers.
    */
  def sq8TopK(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int, ranges: Option[Ranges] = None,
      filter: Option[Column] = None, threshold: Option[Double] = None): DataFrame = {
    val r = ranges.getOrElse(collectRanges(trainMinMax(df, vecCol)))
    val qEmb = df.where(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>").as("qe"))
    val corpus = filter.map(df.where).getOrElse(df)
    val scored = corpus
      .select(col(idCol), encodeSq8(col(vecCol), r).as("codes"))
      .crossJoin(broadcast(qEmb))
      .select(col(idCol), l2SqFold(dequantSq8(col("codes"), r), col("qe")).as("score"))
    threshold.map(t => scored.where(col("score") <= lit(t))).getOrElse(scored)
      .orderBy(col("score").asc, col(idCol).asc)
      .limit(k)
  }
}
