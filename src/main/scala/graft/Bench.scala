package graft

/** Driver-run benchmark: every registered query against
  * SPARK_GRAFT_SF_DIR, one JSON line out. Results go through the `noop`
  * sink so the full plan executes (a bare count() would let Catalyst prune
  * the very columns being benchmarked).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT + parquet footer caches, outside all measured windows
    SparkEntry.queries.get("q02_knn_exact").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min of 2 passes: a single pass is at the mercy of ambient load
      // (GC, page cache, a neighbor process) — the r5 driver tail showed
      // untouched queries at 2-3x that a clean re-run could not reproduce.
      // The MIN is the honest steady-state figure; transient slowdowns
      // can only inflate a pass, never deflate it.
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val failed =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); false }
          catch { case e: Throwable =>
            System.err.println(s"BENCH ERROR $name: ${e.getClass.getName}: ${e.getMessage}")
            true
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators that persist intermediates (LSH bands, gram index)
        // must not carry cache into the next measurement — each pass
        // (including the second) starts cold
        spark.catalog.clearCache()
        if (failed) -1.0 else dt
      }
      // a failed query must be distinguishable from a fast success
      (name, if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
