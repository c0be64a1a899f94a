package graft

/** Dev tool: time named queries in isolation (same noop-sink discipline as
  * [[Bench]]) without paying for the whole suite. Usage:
  *
  *   sbt "runMain graft.TimeOne <sfDir> <query> [query ...]"
  *
  * Each query runs `reps` times (default 2, env SPARK_GRAFT_REPS) after the
  * shared q02 warmup; prints per-rep seconds so JIT drift is visible.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeOne <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q02_knn_exact")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        println(s"[timeone] ===== plan: $name =====")
        fn(spark, sfDir).explain("formatted")
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[timeone] $name: ${times.map(t => f"$t%.2f").mkString(" ")} sec")
    }
    spark.stop()
  }
}
