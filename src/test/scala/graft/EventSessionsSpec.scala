package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventSessions

/** Streaming sessionization == the same session_window plan run in batch,
  * for every session the watermark has finalized. Multiple input files →
  * multiple micro-batches → the watermark actually advances (a single
  * batch would leave it at 0 and append mode would emit nothing).
  */
class EventSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming session windows match batch for watermark-finalized sessions") {
    // time-ranged files fed oldest-first — mirroring a real time-ordered
    // ingest; a random split would look like unboundedly-late data and
    // the watermark would (correctly) drop it. The file source orders by
    // MODIFICATION TIME, not name, so the staged copies get strictly
    // ascending mod times.
    val stage = java.nio.file.Files.createTempDirectory("graft-sessions-stage-").toString
    spark.read.parquet(s"$sf0001/events.parquet")
      .repartitionByRange(4, col("ts")).write.mode("overwrite").parquet(stage)
    val dir = java.nio.file.Files.createTempDirectory("graft-sessions-").toString
    val sorted = scala.jdk.CollectionConverters.IteratorHasAsScala(
        java.nio.file.Files.list(java.nio.file.Paths.get(stage)).iterator()).asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
      .sortBy(_.getFileName.toString)
    sorted.zipWithIndex.foreach { case (p, i) =>
      val tgt = java.nio.file.Paths.get(dir, p.getFileName.toString)
      java.nio.file.Files.copy(p, tgt)
      java.nio.file.Files.setLastModifiedTime(tgt,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val schema = spark.read.parquet(dir).schema

    val streamed = EventSessions.sessionize(graft.core.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)))
    val q = streamed.writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val batch = EventSessions.sessionize(
      graft.core.Tables.normalizeTs(spark.read.parquet(dir)))
    // append emits only sessions the final watermark closed; compare that
    // region (final watermark = max event time - 1 hour)
    val cutoff = graft.core.Tables.normalizeTs(spark.read.parquet(dir))
      .select(timestamp_micros(expr("max(ts div 1000) - 3600000000")))
      .head().getTimestamp(0)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .where(col("session_end") < lit(cutoff))
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
      .toSet

    val got = key(spark.table("sessions"))
    val want = key(batch)
    assert(got === want)
    assert(want.nonEmpty)
    // sanity: sessions merge events (some session has more than one)
    assert(want.exists(_._4 > 1L))
  }
}
