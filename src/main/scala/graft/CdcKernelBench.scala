package graft

/** Dev tool: A/B the two CDC chunking kernels — the md5 oracle-parity
  * form (one full digest per w-token window, O(tokens·w·digest)) vs the
  * FastCDC-style gear/rolling form (token bytes gear-hashed once, O(1)
  * per position) — on the documents table, isolated from the dedup
  * shuffles so the row measures the KERNEL. Usage:
  *
  *   sbt "runMain graft.CdcKernelBench <sfDir> [w] [divisor] [reps]"
  *
  * Prints per-rep seconds per kernel plus total chunk counts (the gear
  * form cuts at different positions by design, so counts are close but
  * not equal — the parity contract is chunk-partitioning, pinned in
  * TextHashExpressionsSpec). Larger `w` widens the md5 form's per-window
  * cost while the rolling form stays flat — the FastCDC claim, measured.
  */
object CdcKernelBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: CdcKernelBench <sfDir> [w] [divisor] [reps]")
    val sfDir = args(0)
    val w = args.lift(1).map(_.toInt).getOrElse(8)
    val divisor = args.lift(2).map(_.toInt).getOrElse(8)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.functions.expressions.TextHashExpressions
    val toks = graft.functions.TextFunctions.wsTokens(col("text"))
    val docs = graft.core.Tables.documents(spark, sfDir)
    def time(kernel: String): Unit = (1 to reps).foreach { r =>
      val chunks =
        if (kernel == "gear") TextHashExpressions.cdcChunksGear(toks, w, divisor)
        else TextHashExpressions.cdcChunks(toks, w, divisor)
      val t0 = System.nanoTime()
      val n = docs.select(sum(size(chunks))).head().getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[cdckernel] $kernel w=$w div=$divisor rep $r: $dt%.2f sec, " +
        s"$n chunks")
    }
    time("md5")
    time("gear")
    spark.stop()
  }
}
