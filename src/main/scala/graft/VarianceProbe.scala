package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Dev measurement: per-repetition TASK-METRIC decomposition of a
  * query's wall time — the tool that turns "q121's 10× leg varies
  * 51–110 s same-code same-day" (SCALE.md) from an observation into a
  * diagnosis. For each rep it sums executor run/CPU time, JVM GC time,
  * shuffle fetch-wait and write time, spill bytes, and records the max
  * single-task duration and the ambient load — so a wall-time swing can
  * be attributed: CPU-time stable + GC swinging → heap/collector; CPU
  * stable + fetch-wait swinging → shuffle service contention; CPU
  * itself swinging → ambient competition or JIT; everything stable but
  * wall swinging → scheduler gaps (stragglers show in max_task).
  *
  * Usage: runMain graft.VarianceProbe <sfDir> <query> [query ...]
  * (env SPARK_GRAFT_REPS, default 6). One JSON line per rep.
  */
object VarianceProbe {

  private class Acc extends SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val runMs, cpuNs, gcMs, fetchWaitMs, writeNs, memSpill, diskSpill,
      tasks, maxTaskMs = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        cpuNs.addAndGet(m.executorCpuTime)
        gcMs.addAndGet(m.jvmGCTime)
        fetchWaitMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
        writeNs.addAndGet(m.shuffleWriteMetrics.writeTime)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        tasks.incrementAndGet()
        maxTaskMs.getAndAccumulate(m.executorRunTime, Math.max(_, _))
      }
    }
    def reset(): Unit = Seq(runMs, cpuNs, gcMs, fetchWaitMs, writeNs,
      memSpill, diskSpill, tasks, maxTaskMs).foreach(_.set(0L))
    def settle(): Unit = {
      var prev = -1L; var rounds = 0
      while (tasks.get != prev && rounds < 50) {
        prev = tasks.get; Thread.sleep(200); rounds += 1
      }
    }
  }

  private def load(): Double =
    scala.util.Try(scala.io.Source.fromFile("/proc/loadavg").mkString
      .split(" ")(0).toDouble).getOrElse(-1.0)

  /** Bytes of accumulated shuffle files in this JVM's blockmgr dirs —
    * the quantity the GC hypothesis is about: shuffle files are deleted
    * only when the driver GCs the ShuffleDependency (ContextCleaner),
    * which a large driver heap may not do for the whole sweep, so a
    * long-lived session's reps run against growing disk/page-cache
    * pressure. (q121's first probe filled 34 GB over 7 reps and
    * crashed the 8th on ENOSPC.)
    */
  private def shuffleDirBytes(): Long = {
    val local = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    Option(local.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("blockmgr-"))
      .map { d =>
        var sum = 0L
        java.nio.file.Files.walkFileTree(d.toPath,
          new java.nio.file.SimpleFileVisitor[java.nio.file.Path] {
            override def visitFile(f: java.nio.file.Path,
                a: java.nio.file.attribute.BasicFileAttributes) = {
              sum += a.size(); java.nio.file.FileVisitResult.CONTINUE
            }
            override def visitFileFailed(f: java.nio.file.Path,
                e: java.io.IOException) =
              java.nio.file.FileVisitResult.CONTINUE
          })
        sum
      }.sum
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: VarianceProbe <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "6").toInt
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    SparkEntry.queries("q02_knn_exact")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      (1 to reps).foreach { rep =>
        acc.settle(); acc.reset()
        val l0 = load()
        val sh0 = shuffleDirBytes()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        acc.settle()
        println(f"""{"probe":"$name","rep":$rep,"wall_s":$wall%.2f,""" +
          f""""run_s":${acc.runMs.get / 1e3}%.1f,"cpu_s":${acc.cpuNs.get / 1e9}%.1f,""" +
          f""""gc_s":${acc.gcMs.get / 1e3}%.1f,"fetch_wait_s":${acc.fetchWaitMs.get / 1e3}%.1f,""" +
          f""""write_s":${acc.writeNs.get / 1e9}%.1f,"mem_spill_mb":${acc.memSpill.get / 1048576},""" +
          f""""disk_spill_mb":${acc.diskSpill.get / 1048576},"tasks":${acc.tasks.get},""" +
          f""""max_task_s":${acc.maxTaskMs.get / 1e3}%.1f,"load":$l0%.2f,""" +
          f""""shuffle_dir_mb_pre":${sh0 / 1048576},""" +
          f""""gc_between":${sys.env.contains("SPARK_GRAFT_PROBE_GC")}}""")
        // GC-hypothesis arm: force a driver GC so ContextCleaner frees
        // the rep's shuffle files before the next rep measures
        if (sys.env.contains("SPARK_GRAFT_PROBE_GC")) {
          System.gc(); Thread.sleep(3000)
        }
      }
    }
    spark.stop()
  }
}
