package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Charset-transcoding text ingest — reference S11, the GBK→UTF-8 file
  * converter (`Scripts/trasfer_gbk.py:1-5`) as a native reader: whole
  * files arrive as binary, `decode(content, charset)` transcodes inside
  * the plan (a codegen expression — no UDF, no driver loop), and the
  * UTF-8 result is a normal string column ready for any downstream
  * operator or a `write` back out.
  *
  * Scale shape: one binaryFile scan + a narrow projection; transcoding
  * 100 TB is embarrassingly parallel and shuffle-free.
  */
object Transcode {

  /** (key, text): each matched file decoded from `charset` to a UTF-8
    * string column. `asLines` explodes to (key, line_no, line) instead,
    * mirroring the reference script's line orientation.
    */
  def readTextDir(spark: SparkSession, dir: String, charset: String = "GBK",
      glob: String = "*.txt", asLines: Boolean = false): DataFrame = {
    val docs = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.[^.]+$", 1).as("key"),
        decode(col("content"), charset).as("text"))
    if (!asLines) docs
    else docs.select(col("key"),
      posexplode(split(col("text"), "\r?\n")).as(Seq("line_no", "line")))
  }
}
