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
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators that persist intermediates (LSH bands, gram index) must
      // not carry cache into the next query's measurement
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
