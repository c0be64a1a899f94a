package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch
import graft.queries.CoreQueries

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val q   = CoreQueries.queryVec(spark, sf0001)

  test("cosine top-k: the query row itself ranks first with cos 1.0") {
    val got = SimilaritySearch.cosineTopK(emb, "vec_id", "embedding", q, 5).collect()
    assert(got.head.getLong(0) === 0L)
    assert(math.abs(got.head.getDouble(1) - 1.0) < 1e-12)
    val sims = got.map(_.getDouble(1))
    assert(sims.sliding(2).forall(p => p(0) >= p(1))) // descending
  }

  test("IVF: query's own row first at score 0; results within one cluster") {
    val got = SimilaritySearch.ivfTopK(emb, "vec_id", "embedding",
      col("vec_id") < 8, queryId = 0L, k = 5).collect()
    assert(got.head.getLong(0) === 0L && got.head.getDouble(1) === 0.0)
    assert(got.length === 5)
  }

  test("IVF nprobe widens the candidate set monotonically") {
    def ids(nprobe: Int) = SimilaritySearch.ivfTopK(emb, "vec_id", "embedding",
      col("vec_id") < 8, queryId = 0L, k = 10, nprobe = nprobe)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val one = ids(1); val four = ids(4)
    assert(one.head._1 === 0L && four.head._1 === 0L)
    // more probes can only improve (lower or equal) the k-th best score
    assert(four.last._2 <= one.last._2)
  }

  test("RP-LSH: candidates share the query bucket; exact re-rank ascending") {
    val got = SimilaritySearch.rpLshTopK(emb, "vec_id", "embedding",
      col("vec_id").between(1, 6), queryId = 0L, k = 5).collect()
    assert(got.head.getLong(0) === 0L && got.head.getDouble(1) === 0.0)
    val scores = got.map(_.getDouble(1))
    assert(scores.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("multi-probe RP-LSH: flips=0 == single-probe; more flips never hurt") {
    def ids(flips: Int) = SimilaritySearch.rpLshTopKMultiProbe(emb, "vec_id",
      "embedding", col("vec_id").between(1, 6), numPlanes = 6,
      queryId = 0L, k = 5, flips = flips)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val single = SimilaritySearch.rpLshTopK(emb, "vec_id", "embedding",
      col("vec_id").between(1, 6), queryId = 0L, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ids(0).toSeq === single.toSeq)
    val f0 = ids(0); val f1 = ids(1); val f2 = ids(2)
    assert(f1.head._1 === 0L && f2.head._1 === 0L)
    // wider probe sets can only improve (lower or equal) the k-th score
    assert(f1.last._2 <= f0.last._2)
    assert(f2.last._2 <= f1.last._2)
    // <=2-flip recall vs exact must beat-or-match single-probe
    val exact = graft.operators.Knn.search(emb, "vec_id", "embedding", q, 5)
      .collect().map(_.getLong(0)).toSet
    def recall(got: Array[(Long, Double)]) =
      (exact intersect got.map(_._1).toSet).size.toDouble / exact.size
    info(f"recall@5: single=${recall(f0)}%.2f flips1=${recall(f1)}%.2f flips2=${recall(f2)}%.2f")
    assert(recall(f2) >= recall(f0))
  }

  test("multi-probe honors filter and threshold") {
    val got = SimilaritySearch.rpLshTopKMultiProbe(emb, "vec_id", "embedding",
      $"vec_id".between(1, 6), numPlanes = 6, queryId = 0L, k = 10, flips = 1,
      filter = Some($"vec_id" % 2 === 0), threshold = Some(2.0)).collect()
    got.foreach { r =>
      assert(r.getLong(0) % 2 === 0L)
      assert(r.getDouble(1) <= 2.0)
    }
  }

  test("MLlib BucketedRandomProjectionLSH path: query first, recall reported") {
    val got = SimilaritySearch.mllibLshTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 5).collect()
    assert(got.head.getLong(0) === 0L && got.head.getDouble(1) === 0.0)
    val exact = graft.operators.Knn.search(emb, "vec_id", "embedding", q, 5)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect got.map(_.getLong(0)).toSet).size.toDouble / exact.size
    info(f"recall@5 of MLlib LSH (2k over-fetch) vs exact: $recall%.2f")
    assert(recall >= 0.2)
  }

  test("trainCentroids is deterministic and save/load roundtrips") {
    val a = SimilaritySearch.trainCentroids(emb, "embedding", k = 4)
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val b = SimilaritySearch.trainCentroids(emb, "embedding", k = 4)
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(a.zip(b).forall { case ((i1, c1), (i2, c2)) => i1 == i2 && c1 == c2 })
    val dir = java.nio.file.Files.createTempDirectory("graft-cent-").toString
    SimilaritySearch.saveCentroids(
      SimilaritySearch.trainCentroids(emb, "embedding", k = 4), dir)
    val loaded = SimilaritySearch.loadCentroids(spark, dir)
      .orderBy("cid").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.zip(loaded).forall { case ((i1, c1), (i2, c2)) => i1 == i2 && c1 == c2 })
  }

  test("ivfSearch with trained centroids: query row first; nprobe=K == exact") {
    val cent = SimilaritySearch.trainCentroids(emb, "embedding", k = 4)
    val got = SimilaritySearch.ivfSearch(emb, "vec_id", "embedding", cent,
      queryId = 0L, k = 5, nprobe = 1).collect()
    assert(got.head.getLong(0) === 0L && got.head.getDouble(1) === 0.0)
    // probing every cell degenerates to the exact scan
    val all = SimilaritySearch.ivfSearch(emb, "vec_id", "embedding", cent,
      queryId = 0L, k = 5, nprobe = 4).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = graft.operators.Knn.search(emb, "vec_id", "embedding", q, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(all.toSeq === exact.toSeq)
  }

  test("ivfSearch filter prunes pre-rank; threshold bounds the score") {
    val cent = emb.where($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("ce"))
    val filtered = SimilaritySearch.ivfSearch(emb, "vec_id", "embedding", cent,
      queryId = 0L, k = 10, nprobe = 2,
      filter = Some($"vec_id" % 2 === 0), threshold = Some(1.45)).collect()
    assert(filtered.nonEmpty)
    filtered.foreach { r =>
      assert(r.getLong(0) % 2 === 0L, "filter must hold on every result")
      assert(r.getDouble(1) <= 1.45, "threshold must bound every score")
    }
    // filtered results are a subset of the unfiltered candidate set
    val unfiltered = SimilaritySearch.ivfSearch(emb, "vec_id", "embedding", cent,
      queryId = 0L, k = 100, nprobe = 2).collect().map(_.getLong(0)).toSet
    assert(filtered.map(_.getLong(0)).toSet.subsetOf(unfiltered))
  }

  test("ivfSearchVec by literal query vector matches ivfSearch by row id") {
    val cent = SimilaritySearch.trainCentroids(emb, "embedding", k = 4)
    val byId = SimilaritySearch.ivfSearch(emb, "vec_id", "embedding", cent,
      queryId = 0L, k = 5, nprobe = 2).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val byVec = SimilaritySearch.ivfSearchVec(emb, "vec_id", "embedding", cent,
      q, k = 5, nprobe = 2).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(byId.toSeq === byVec.toSeq)
  }

  test("rpLsh and mllibLsh honor filter and threshold") {
    val lsh = SimilaritySearch.rpLshTopK(emb, "vec_id", "embedding",
      $"vec_id".between(1, 6), queryId = 0L, k = 10,
      filter = Some($"vec_id" % 2 === 0), threshold = Some(2.0)).collect()
    lsh.foreach { r =>
      assert(r.getLong(0) % 2 === 0L)
      assert(r.getDouble(1) <= 2.0)
    }
    val ml = SimilaritySearch.mllibLshTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 10,
      filter = Some($"vec_id" % 2 === 0), threshold = Some(2.0)).collect()
    ml.foreach { r =>
      assert(r.getLong(0) % 2 === 0L)
      assert(r.getDouble(1) <= 2.0)
    }
  }

  test("codegen NearestCell == declarative fold, bit for bit (float + double)") {
    import graft.functions.expressions.NearestCell
    // float corpus vectors (the parquet reality) against the normalized
    // double centroid array — every row must agree between the generated
    // loop and the fold spec
    val cents = SimilaritySearch.centArray(
      emb.where($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"embedding".as("ce")))
    val both = emb.crossJoin(broadcast(cents))
      .select($"vec_id",
        NearestCell($"embedding", $"__cents").as("gen"),
        SimilaritySearch.nearestCellFold($"embedding", $"__cents").as("fold"))
    assert(both.where($"gen" =!= $"fold" ||
      $"gen".isNull =!= $"fold".isNull).count() === 0L)
    // double path agrees too
    val bothD = emb.crossJoin(broadcast(cents))
      .select(
        NearestCell($"embedding".cast("array<double>"), $"__cents").as("gen"),
        SimilaritySearch.nearestCellFold(
          $"embedding".cast("array<double>"), $"__cents").as("fold"))
    assert(bothD.where($"gen" =!= $"fold").count() === 0L)
    // dimension-mismatched centroids are skipped; all-mismatch -> null
    val badCents = SimilaritySearch.centArray(
      Seq((0L, Array(1.0, 2.0, 3.0))).toDF("cid", "ce"))
    val r = emb.limit(1).crossJoin(broadcast(badCents))
      .select(NearestCell($"embedding", $"__cents")).head()
    assert(r.isNullAt(0))
  }

  test("assignCells stays inside whole-stage codegen (no fallback argmin)") {
    val cents = emb.where($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("ce"))
    val plan = SimilaritySearch.assignCells(
        emb.select($"vec_id", $"embedding".as("emb")), "vec_id", "emb", cents)
      .queryExecution.executedPlan.toString
    // the argmin projects inside a codegen stage — the HOF fold it
    // replaced printed as a non-codegen Project over `aggregate(...)`
    assert(plan.contains("nearest_cell"), plan.take(3000))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
  }

  test("codegen RpBucket == declarative fold on every row") {
    import graft.functions.expressions.RpBucket
    val planes = emb.where($"vec_id".between(1, 6))
      .agg(array_sort(collect_list(struct($"vec_id".cast("long").as("pid"),
        $"embedding".cast("array<double>").as("pe")))).as("__planes"))
    val both = emb.crossJoin(broadcast(planes))
      .select($"vec_id",
        RpBucket($"embedding", $"__planes").as("gen"),
        SimilaritySearch.rpBucketFold($"embedding", $"__planes").as("fold"))
    assert(both.where($"gen" =!= $"fold").count() === 0L)
    // empty plane array -> bucket 0 (every row in one bucket, degenerate)
    val none = emb.where($"vec_id" < 0)
      .agg(array_sort(collect_list(struct($"vec_id".cast("long").as("pid"),
        $"embedding".cast("array<double>").as("pe")))).as("__planes"))
    val b0 = emb.limit(3).crossJoin(broadcast(none))
      .select(RpBucket($"embedding", $"__planes"))
      .collect().map(_.getLong(0))
    assert(b0.forall(_ === 0L))
  }

  test("rpLshBuckets fails fast on an empty plane set (would collapse to 1 bucket)") {
    val e = intercept[Throwable] {
      SimilaritySearch.rpLshBuckets(emb, "vec_id", "embedding",
        col("vec_id") < 0).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("planePred matched no rows"), messages(e))
  }

  test("ANN quality: report recall@5 of RP-LSH vs exact (not hash-matched)") {
    val exact = graft.operators.Knn.search(emb, "vec_id", "embedding", q, 5)
      .collect().map(_.getLong(0)).toSet
    val approx = SimilaritySearch.rpLshTopK(emb, "vec_id", "embedding",
      col("vec_id").between(1, 6), queryId = 0L, k = 5)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@5 of RP-LSH vs exact: $recall%.2f")
    assert(recall >= 0.2) // query row itself always recalls
  }
}
