package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

/** Dev tool closing VERDICT r11 #6: the gear kernel measured END TO END
  * at scale — `CdcKernelBench` A/Bs the chunking kernel alone; this runs
  * the FULL q174 (cdcChunkDedup) and q178 (frozen cdcChunkIndex + inline
  * gate, index built AND probed under the same kernel — the artifact's
  * kernel bit) flows under BOTH kernels on the base and scaled fixtures,
  * with the ScaleBench discipline (interleaved reps, min-of-reps,
  * noop-sink full-plan execution, one GC per observation).
  *
  *   sbt "runMain graft.CdcGearScale [baseDir] [scaledDir] [factor]"
  *
  * Output: SCALE.r12gear.json (override with SPARK_GRAFT_SCALE_OUT) with
  * per-(flow, kernel) {base, scaled, ratio} — the done-bar is gear
  * ratios ≤ the md5 rows, i.e. the kernel's O(1)-per-position win holds
  * inside the operator, not just in isolation.
  */
object CdcGearScale {

  /** The q174 synthetic corpus — same planted passage, same shape. */
  private def passage: String = (0 until 30).map(i => s"cdc$i").mkString(" ")
  private def newPassage: String = (0 until 30).map(i => s"new$i").mkString(" ")

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val scaled = args.lift(1).getOrElse(s"/tmp/sf0.1x$factor")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE.r12gear.json")
    if (!Files.isDirectory(Paths.get(scaled))) {
      println(s"[cdcgear] generating $factor× fixture at $scaled ...")
      import scala.sys.process._
      val rc = Seq("python3", "tools/make_scale_fixture.py",
        base, scaled, factor.toString).!
      require(rc == 0, s"make_scale_fixture.py failed with exit $rc")
    }
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("WARN")

    def synth(dir: String, withNew: Boolean) = {
      val did = col("doc_id")
      val cols = Seq(col("text"), when(did % 6 === 0, lit(passage))) ++
        (if (withNew) Seq(when(did >= 250 && did % 9 === 0, lit(newPassage)))
         else Nil) :+ concat(lit("tail"), did.cast("string"))
      Tables.documents(spark, dir).select(did,
        concat_ws(" ", cols: _*).as("text"))
    }
    // flow 1: the q174 shape — whole-corpus CDC chunk dedup
    def dedupFlow(kernel: String)(dir: String) =
      Dedup.cdcChunkDedup(synth(dir, withNew = false), "doc_id", "text",
        w = 3, divisor = 4, kernel = kernel).orderBy("doc_id")
    // flow 2: the q178 shape — frozen index over the old half, row-local
    // inline gate over the arriving half, SAME kernel on both sides
    def inlineFlow(kernel: String)(dir: String) = {
      val s = synth(dir, withNew = true)
      val did = col("doc_id")
      val index = Dedup.cdcChunkIndex(s.where(did < 250), "doc_id", "text",
        w = 3, divisor = 4, kernel = kernel)
      Dedup.cdcChunkDedupInline(s.where(did >= 250 && did < 500),
        "doc_id", "text", w = 3, divisor = 4, index, kernel = kernel)
        .orderBy("doc_id")
    }
    val flows: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "cdc_dedup_md5" -> dedupFlow("md5"),
      "cdc_dedup_gear" -> dedupFlow("gear"),
      "cdc_inline_md5" -> inlineFlow("md5"),
      "cdc_inline_gear" -> inlineFlow("gear"))

    def run(fn: String => org.apache.spark.sql.DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      fn(dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      dt
    }
    // shared warmup (JIT + parquet footers) on both dirs
    run(dedupFlow("md5"), base)
    run(dedupFlow("md5"), scaled)

    val rows = flows.map { case (name, fn) =>
      var (b, s) = (Double.MaxValue, Double.MaxValue)
      (1 to reps).foreach { _ =>
        b = math.min(b, run(fn, base))
        s = math.min(s, run(fn, scaled))
      }
      val ratio = s / b
      println(f"[cdcgear] $name base=$b%.2f scaled=$s%.2f ratio=$ratio%.2f")
      f""""$name":{"base":$b%.3f,"scaled":$s%.3f,"ratio":$ratio%.2f}"""
    }
    // paths are interpolated into a committed evidence artifact — escape
    // them (a quote or backslash in a dir name must not produce invalid
    // JSON; ADVICE r12)
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val json = rows.mkString(
      s"""{"factor":$factor,"base_dir":${jstr(base)},"scaled_dir":${jstr(scaled)},"reps":$reps,"flows":{""",
      ",", "}}")
    Files.write(Paths.get(outPath), json.getBytes(StandardCharsets.UTF_8))
    println(s"[cdcgear] wrote $outPath")
    spark.stop()
  }
}
