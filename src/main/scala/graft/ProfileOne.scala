package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev tool (r15 optimization round): per-STAGE attribution for named
  * queries — where inside one query the wall time, input bytes and
  * shuffle traffic actually go, plus the AQE-final executed plan. The
  * stage table is what the Spark UI's stage list would show (guide §7.1)
  * in a UI-less sandbox.
  *
  *   sbt "runMain graft.ProfileOne <sfDir> <query> [query ...]"
  *
  * Prints, per completed stage: stage id, task count, summed task time,
  * input MiB, shuffle read/write MiB, peak single-task time, and the
  * stage's name line (callsite). One warmup (q02) precedes measurement.
  */
object ProfileOne {

  private case class StageRow(id: Int, name: String, tasks: Int,
      taskTimeMs: Long, inputMb: Double, inputRecs: Long, shReadMb: Double,
      shWriteMb: Double, spillMb: Double)

  private class StageAcc extends SparkListener {
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val m = i.taskMetrics
      if (m != null) rows.add(StageRow(
        i.stageId, i.name.linesIterator.next().take(140), i.numTasks,
        m.executorRunTime,
        m.inputMetrics.bytesRead / 1048576.0,
        m.inputMetrics.recordsRead,
        m.shuffleReadMetrics.totalBytesRead / 1048576.0,
        m.shuffleWriteMetrics.bytesWritten / 1048576.0,
        m.diskBytesSpilled / 1048576.0))
    }
    def drain(): Seq[StageRow] = {
      val out = mutable.ArrayBuffer[StageRow]()
      var r = rows.poll()
      while (r != null) { out += r; r = rows.poll() }
      out.toSeq
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileOne <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new StageAcc
    spark.sparkContext.addSparkListener(acc)
    // warmup
    try SparkEntry.queries("q02_knn_exact")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    Thread.sleep(500); acc.drain()
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // let late stage events land
      val rows = acc.drain().sortBy(-_.taskTimeMs)
      println(f"\n===== $name  wall=$wall%.2f s  stages=${rows.size} =====")
      println(f"${"stage"}%6s ${"tasks"}%5s ${"taskTime_s"}%10s ${"in_MiB"}%8s " +
        f"${"in_recs"}%9s ${"shR_MiB"}%8s ${"shW_MiB"}%8s ${"spill"}%6s  name")
      rows.take(24).foreach { r =>
        println(f"${r.id}%6d ${r.tasks}%5d ${r.taskTimeMs / 1000.0}%10.2f " +
          f"${r.inputMb}%8.1f ${r.inputRecs}%9d ${r.shReadMb}%8.1f " +
          f"${r.shWriteMb}%8.1f ${r.spillMb}%6.1f  ${r.name}")
      }
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        println(s"----- executed plan: $name -----")
        println(df.queryExecution.executedPlan.toString.linesIterator
          .take(120).mkString("\n"))
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
