package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Knn, SimilaritySearch}
import graft.queries.CoreQueries

/** ANN quality report (BASELINE.md: recall is REPORTED, not hash-matched —
  * approximate indexes are model-dependent by nature, like the reference's
  * HNSW). Measures recall@k of each approximate tier against the exact
  * path over a set of query rows, and writes ANN_QUALITY.md.
  *
  * Usage: runMain graft.AnnQuality [sfDir] [k] [nQueries]
  */
object AnnQuality {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val k     = args.lift(1).map(_.toInt).getOrElse(5)
    val nq    = args.lift(2).map(_.toInt).getOrElse(20)
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queryIds = emb.select("vec_id").orderBy("vec_id").limit(nq)
      .collect().map(_.getLong(0))

    def recallOf(tier: String, approx: Long => Array[Long]): (String, Double) = {
      val recalls = queryIds.map { qid =>
        val qv = emb.where(col("vec_id") === qid).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble).toArray
        val exact = Knn.search(emb, "vec_id", "embedding", qv, k)
          .collect().map(_.getLong(0)).toSet
        val got = approx(qid).toSet
        (exact intersect got).size.toDouble / exact.size
      }
      tier -> recalls.sum / recalls.length
    }

    val results = Seq(
      recallOf("ivf (8 centroids, nprobe=1)", qid =>
        SimilaritySearch.ivfTopK(emb, "vec_id", "embedding",
          col("vec_id") < 8, qid, k).collect().map(_.getLong(0))),
      recallOf("ivf (8 centroids, nprobe=2)", qid =>
        SimilaritySearch.ivfTopK(emb, "vec_id", "embedding",
          col("vec_id") < 8, qid, k, nprobe = 2).collect().map(_.getLong(0))),
      recallOf("ivf (8 centroids, nprobe=4)", qid =>
        SimilaritySearch.ivfTopK(emb, "vec_id", "embedding",
          col("vec_id") < 8, qid, k, nprobe = 4).collect().map(_.getLong(0))),
      recallOf("rp-lsh (6 planes, 1 probe)", qid =>
        SimilaritySearch.rpLshTopK(emb, "vec_id", "embedding",
          col("vec_id").between(1, 6), qid, k).collect().map(_.getLong(0))),
      recallOf(s"mllib brp-lsh (3 tables, ${2 * k} over-fetch)", qid =>
        SimilaritySearch.mllibLshTopK(emb, "vec_id", "embedding",
          qid, k).collect().map(_.getLong(0))))

    val md = new StringBuilder
    md.append("# ANN_QUALITY — recall of approximate tiers vs the exact path\n\n")
    md.append(s"Measured by `graft.AnnQuality` over the first $nq query rows of\n")
    md.append(s"`$sfDir/embeddings.parquet`, k=$k. The exact scan→score→top-k path\n")
    md.append("is the oracle-checked ground truth; these tiers trade recall for\n")
    md.append("reads (SCALE.md). The reference's own candidate multiplier (fetch\n")
    md.append("2k, `src/datanode/handler.py:364`) is what the MLlib tier applies.\n\n")
    md.append(s"| tier | mean recall@$k |\n|---|---|\n")
    results.foreach { case (t, r) => md.append(f"| $t | $r%.3f |\n") }
    val out = "ANN_QUALITY.md"
    Files.writeString(Paths.get(out), md.toString)
    println(md.toString)
    println(s"written: $out")
    spark.stop()
  }
}
