package graft

import java.nio.charset.Charset
import java.nio.file.Files

import graft.core.Transcode

/** S11: GBK→UTF-8 transcode ingest over real GBK-encoded bytes. */
class TranscodeSpec extends SparkSpec {

  private val zh = "向量数据库 引擎\n第二行 text"

  test("GBK bytes decode to the exact UTF-8 string in-plan") {
    val dir = Files.createTempDirectory("graft-gbk-")
    Files.write(dir.resolve("doc1.txt"), zh.getBytes(Charset.forName("GBK")))
    Files.write(dir.resolve("skip.bin"), Array[Byte](1, 2, 3))
    val got = Transcode.readTextDir(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("doc1", zh))) // glob filtered, bytes transcoded
  }

  test("line orientation mirrors the reference script") {
    val dir = Files.createTempDirectory("graft-gbk-lines-")
    Files.write(dir.resolve("doc.txt"), zh.getBytes(Charset.forName("GBK")))
    val lines = Transcode.readTextDir(spark, dir.toString, asLines = true)
      .orderBy("line_no")
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(lines.toSeq === Seq((0, "向量数据库 引擎"), (1, "第二行 text")))
  }

  test("transcode is a narrow scan-side projection — no shuffle, no UDF") {
    val dir = Files.createTempDirectory("graft-gbk-plan-")
    Files.write(dir.resolve("doc.txt"), zh.getBytes(Charset.forName("GBK")))
    val plan = Transcode.readTextDir(spark, dir.toString)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(!plan.contains("BatchEvalPython"), plan.take(2000))
  }
}
