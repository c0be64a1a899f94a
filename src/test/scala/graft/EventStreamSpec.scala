package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Event-time streaming over the events table itself (not the WAL):
  * parquet file source → watermark → sliding window counts, checked
  * against the equivalent batch aggregation — streaming and batch must
  * tell the same story about the same files.
  */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("windowed event counts: streaming over parquet == batch") {
    // the streaming file source wants a directory; stage the events file
    val dir = java.nio.file.Files.createTempDirectory("graft-events-stream-")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val eventsStream = graft.core.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString))
    val counts = eventsStream
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win"), col("event_type"), col("n"))
    val q = counts.writeStream.format("memory").queryName("ev_win")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("ev_win")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.core.Tables.events(spark, sf0001)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
