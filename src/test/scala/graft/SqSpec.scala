package graft

import org.apache.spark.sql.functions._

import graft.operators.Sq

class SqSpec extends SparkSpec {
  import spark.implicits._

  private val toy = Seq(
    (0L, Seq(0.0, 10.0, 5.0)),
    (1L, Seq(1.0, 20.0, 5.0)),
    (2L, Seq(2.0, 30.0, 5.0)),
    (3L, Seq(0.5, 15.0, 5.0))).toDF("vec_id", "embedding")

  test("codes stay in 0..255; range endpoints map to 0 and 255") {
    val r = Sq.collectRanges(Sq.trainMinMax(toy, "embedding"))
    val codes = toy.select(col("vec_id"), Sq.encodeSq8(col("embedding"), r).as("c"))
      .orderBy("vec_id").as[(Long, Seq[Long])].collect().toMap
    codes.values.flatten.foreach(c => assert(c >= 0L && c <= 255L))
    assert(codes(0L)(0) === 0L)   // min of dim 0
    assert(codes(2L)(0) === 255L) // max of dim 0
    assert(codes(0L)(1) === 0L && codes(2L)(1) === 255L)
  }

  test("degenerate (constant) dimension codes to 0 and dequantizes to lo") {
    val r = Sq.collectRanges(Sq.trainMinMax(toy, "embedding"))
    val deq = toy.select(
      Sq.dequantSq8(Sq.encodeSq8(col("embedding"), r), r).as("d"))
      .as[Seq[Double]].collect()
    deq.foreach(ds => assert(ds(2) === 5.0)) // hi==lo dim reconstructs exactly
  }

  test("reconstruction error is bounded by half a quantization step") {
    val r = Sq.collectRanges(Sq.trainMinMax(toy, "embedding"))
    val rows = toy.select(col("embedding"),
        Sq.dequantSq8(Sq.encodeSq8(col("embedding"), r), r).as("d"))
      .as[(Seq[Double], Seq[Double])].collect()
    rows.foreach { case (orig, deq) =>
      orig.zip(deq).zipWithIndex.foreach { case ((o, q), i) =>
        val step = (r.hi(i) - r.lo(i)) / 255.0
        assert(math.abs(o - q) <= step / 2 + 1e-12, s"dim $i: $o vs $q")
      }
    }
  }

  test("sq8 top-k agrees with exact KNN on well-separated data") {
    // separation >> quantization step, so the quantized order must match
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val got = Sq.sq8TopK(emb, "vec_id", "embedding", queryId = 0L, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    val exact = graft.operators.Knn.search(emb, "vec_id", "embedding",
      emb.where(col("vec_id") === 0).select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toArray, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    // the query row itself (score 0) must rank first in both
    assert(got.head === 0L && exact.head === 0L)
  }

  test("ivfSq8TopK at full probe equals the full-scan SQ8 ranking") {
    // probing every cell covers the corpus, and both paths rank by the
    // same quantized score — outputs must be identical
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val ivf = Sq.ivfSq8TopK(emb, "vec_id", "embedding", cents,
        queryId = 0L, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Sq.sq8TopK(emb, "vec_id", "embedding", queryId = 0L, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf === full)
  }

  test("filter and threshold honor the SearchRequest surface") {
    val r = Sq.collectRanges(Sq.trainMinMax(toy, "embedding"))
    val filtered = Sq.sq8TopK(toy, "vec_id", "embedding", queryId = 0L, k = 4,
      ranges = Some(r), filter = Some(col("vec_id") =!= 1L))
      .select("vec_id").as[Long].collect().toSeq
    assert(!filtered.contains(1L) && filtered.head === 0L)
    val thresholded = Sq.sq8TopK(toy, "vec_id", "embedding", queryId = 0L,
      k = 4, ranges = Some(r), threshold = Some(0.5))
      .as[(Long, Double)].collect()
    thresholded.foreach { case (_, s) => assert(s <= 0.5) }
    assert(thresholded.map(_._1).contains(0L))
  }
}
