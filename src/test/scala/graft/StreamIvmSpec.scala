package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Ivm
import graft.streaming.StreamIvm

class StreamIvmSpec extends SparkSpec {
  import spark.implicits._

  test("streamed view == batch recompute over base ∪ all micro-batches") {
    val base = Seq(("a", 5L), ("b", 2L), ("a", 1L)).toDF("g", "v")
    val delta = Seq(("a", 100L), ("c", 7L), ("b", -3L), ("c", 9L))
      .toDF("g", "v")
    val viewDir = Files.createTempDirectory("ivm-view").toString
    Ivm.buildAggView(base, Seq("g"), "v", viewDir)

    // several files → several micro-batches
    val deltaDir = Files.createTempDirectory("ivm-delta").toString
    delta.repartition(3).write.mode("overwrite").parquet(deltaDir)
    val ckpt = Files.createTempDirectory("ivm-ckpt").toString
    val q = StreamIvm.maintain(
      spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1").parquet(deltaDir),
      Seq("g"), "v", viewDir, ckpt)
    q.awaitTermination(120000)

    val got = Ivm.readAggView(spark, viewDir)
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    val full = Ivm.aggState(base.unionByName(delta), Seq("g"), "v")
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === full)
  }

  test("streamed view with trend sums: Ivm.trendOf == batch trendExact") {
    val base = Seq(("a", 0L, 10L), ("a", 1L, 13L), ("b", 0L, 9L))
      .toDF("g", "x", "v")
    val delta = Seq(("a", 2L, 16L), ("a", 3L, 19L), ("b", 5L, 4L),
      ("b", 10L, -1L)).toDF("g", "x", "v")
    val viewDir = Files.createTempDirectory("ivm-tview").toString
    Ivm.buildAggView(base, Seq("g"), "v", viewDir, xCol = Some("x"))
    val deltaDir = Files.createTempDirectory("ivm-tdelta").toString
    delta.repartition(2).write.mode("overwrite").parquet(deltaDir)
    val q = StreamIvm.maintain(
      spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1").parquet(deltaDir),
      Seq("g"), "v", viewDir,
      Files.createTempDirectory("ivm-tckpt").toString, xCol = Some("x"))
    q.awaitTermination(120000)
    val got = Ivm.trendOf(Ivm.readAggView(spark, viewDir), Seq("g"))
      .select(col("g"), col("n"), col("slope_num").cast("long"),
        col("slope_den").cast("long"))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    val want = graft.operators.Profile.trendExact(
        base.unionByName(delta), "g", "x", "v")
      .select(col("g"), col("n"), col("slope_num").cast("long"),
        col("slope_den").cast("long"))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("streamed view with histogram column == batch recompute") {
    val base = Seq(("a", 5L), ("b", 2L), ("a", 1L)).toDF("g", "v")
    val delta = Seq(("a", 15L), ("c", 7L), ("b", 3L)).toDF("g", "v")
    val spec = Some((0L, 16L, 4))
    val viewDir = Files.createTempDirectory("ivm-hview").toString
    Ivm.buildAggView(base, Seq("g"), "v", viewDir, histSpec = spec)
    val deltaDir = Files.createTempDirectory("ivm-hdelta").toString
    delta.repartition(2).write.mode("overwrite").parquet(deltaDir)
    val q = StreamIvm.maintain(
      spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1").parquet(deltaDir),
      Seq("g"), "v", viewDir,
      Files.createTempDirectory("ivm-hckpt").toString, histSpec = spec)
    q.awaitTermination(120000)
    val got = Ivm.readAggView(spark, viewDir).orderBy("g")
      .as[(String, Long, Long, Long, Long, Seq[Long])].collect().toSeq
    val full = Ivm.aggState(base.unionByName(delta), Seq("g"), "v",
        histSpec = spec).orderBy("g")
      .as[(String, Long, Long, Long, Long, Seq[Long])].collect().toSeq
    assert(got === full)
  }

  test("mergeBatch replay of a committed batch id is a no-op") {
    val dir = Files.createTempDirectory("ivm-replay").toString
    Ivm.buildAggView(Seq(("g", 1L)).toDF("g", "v"), Seq("g"), "v", dir)
    val d = Seq(("g", 10L)).toDF("g", "v")
    Ivm.mergeBatch(d, Seq("g"), "v", dir, batchId = 0L)
    val once = Ivm.readAggView(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    Ivm.mergeBatch(d, Seq("g"), "v", dir, batchId = 0L) // at-least-once replay
    val twice = Ivm.readAggView(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(once === twice)
    assert(once === Seq(("g", 2L, 11L, 1L, 10L)))
  }
}
