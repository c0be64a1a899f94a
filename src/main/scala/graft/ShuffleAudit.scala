package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev measurement: MEASURED shuffle traffic per query — the empirical
  * check on SCALE.md's plan-shape claims (a "zero-Exchange scan" must
  * show zero shuffle bytes written, a "bounded hash-agg" must shuffle
  * kilobytes at sf0.1, not the corpus). Sums executor task metrics
  * (shuffle write bytes, shuffle read bytes, input bytes) across the
  * stages each query runs.
  *
  * Usage: runMain graft.ShuffleAudit [sfDir] [query ...] (default: a
  * representative set spanning the claimed shapes).
  */
object ShuffleAudit {

  private class Acc extends SparkListener {
    // updated on the listener-bus thread, read from main — atomics, and
    // the main thread polls until the counters are STABLE rather than
    // sleeping a fixed interval (a late-delivered stage event would
    // otherwise land on the NEXT query's row)
    val write = new java.util.concurrent.atomic.AtomicLong
    val read = new java.util.concurrent.atomic.AtomicLong
    val input = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def reset(): Unit = { write.set(0L); read.set(0L); input.set(0L) }
    /** Poll until two consecutive 200 ms snapshots agree (bus drained). */
    def settle(): (Long, Long, Long) = {
      var prev = (-1L, -1L, -1L)
      var cur = (write.get, read.get, input.get)
      var rounds = 0
      while (cur != prev && rounds < 50) {
        prev = cur
        Thread.sleep(200)
        cur = (write.get, read.get, input.get)
        rounds += 1
      }
      cur
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq(
        "q02_knn_exact",          // claimed zero-shuffle scan + TakeOrdered
        "q129_dsir_weights",      // claimed zero-Exchange scoring leg
        "q141_blocklist_scan",    // claimed row-local pass + tiny agg
        "q15_exact_dedup",        // one hash-key shuffle
        "q128_dsir_buckets",      // bounded 4096-bucket agg
        "q17_minhash_lsh_dedup",  // banded candidate join
        "q64_dedup_clusters",     // iterative CC
        "q136_curation_pipeline", // full composition
        "q153_dup_span_scrub",    // one gram hash-key exchange
        "q158_dup_span_incremental", // claimed row-local frozen-index probe
        // round-9 additions
        "q161_maximal_dup_spans", // dup-bounded suffix-slice group sort
        "q162_incremental_clusters", // label-pair collect + broadcast remap
        "q163_kll_sketch",        // tiny count agg + row-local coin filter
        "q165_repetition_rules",  // row-local: expect ~zero shuffle bytes
        // round-10 additions
        "q121_leakage_safe_split", // minhash verify leg — the shingle-payload shuffle (measured after the 10× probe found ~5 GB/rep there)
        "q166_line_dedup",        // three hash/id-key shuffles, line hashes not strings
        "q168_token_tv_drift",    // bounded (source, bucket) state only
        "q169_line_dedup_incremental") // row-local frozen-index probe: ~zero
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    // warmup outside measurement
    SparkEntry.queries.get("q02_knn_exact")
      .foreach(f => f(spark, sfDir).write.format("noop").mode("overwrite").save())
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[shuffle] unknown query $name")
        case Some(fn) =>
          acc.settle() // drain anything still in flight from the last run
          acc.reset()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          val (w, r, in) = acc.settle()
          println(f"[shuffle] $name%-26s write=${w / 1024}%8d KiB " +
            f"read=${r / 1024}%8d KiB input=${in / 1048576}%6d MiB")
      }
    }
    spark.stop()
  }
}
