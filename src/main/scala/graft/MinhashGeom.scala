package graft

/** Dev tool: the q64 minhash-cluster family at a CHOSEN band geometry —
  * the evidence runner behind SCALE.md's "retune bands as the corpus
  * grows" adjudication. At fixed geometry the band-join candidate set is
  * quadratic in corpus size (measured: 25.9k → 4.56M → 368M at
  * sf0.1 → 10× → 100×), which is an LSH parameterization fact, not an
  * engine property; the same similarity cut at longer band keys (fewer,
  * wider bands) collapses the candidate volume back to the near-dup
  * pairs that actually exist. Usage:
  *
  *   sbt "runMain graft.MinhashGeom <sfDir> <numHashes> <bands> [reps]"
  *
  * Prints per-rep seconds plus candidate-pair / cluster counts — the
  * output evidence SCALE.md records next to the wall time.
  */
object MinhashGeom {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: MinhashGeom <sfDir> <numHashes> <bands> [reps]")
    val (sfDir, numHashes, bands) = (args(0), args(1).toInt, args(2).toInt)
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sfDir)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val (nPairs, nClusters) =
        graft.operators.Dedup.withMinhashPairs(docs, "doc_id", "text",
          numHashes = numHashes, bands = bands) { pairs =>
          val close = pairs.where(col("jac") >= 0.5)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val np = close.count()
            val nc = graft.operators.Graph
              .dedupClusters(close, "a", "b").count()
            (np, nc)
          } finally close.unpersist()
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[minhashgeom] rep $r H=$numHashes b=$bands: $dt%.2f sec, " +
        s"pairs>=0.5 $nPairs, clusters $nClusters")
    }
    spark.stop()
  }
}
