package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Curriculum

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, 2L), (2L, 0L), (3L, 1L), (4L, 2L), (5L, 0L),
    (6L, 1L), (7L, 1L), (8L, 3L), (9L, 0L), (10L, 2L))
    .toDF("id", "band")

  test("two-level index equals the naive global row_number exactly") {
    val got = Curriculum.globalOrderIndex(rows.repartition(4), "band", "id")
      .select("id", "ord").orderBy("id")
      .as[(Long, Long)].collect().toSeq
    val naive = rows
      .withColumn("ord", row_number()
        .over(Window.orderBy(col("band").asc, col("id").asc)).cast("long"))
      .select("id", "ord").orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(got === naive)
  }

  test("a NULL bucket fails loud instead of silently dropping rows") {
    val withNull = rows.withColumn("band",
      when(col("id") === 5L, lit(null).cast("long")).otherwise(col("band")))
    val ex = intercept[Exception] {
      Curriculum.globalOrderIndex(withNull, "band", "id").count()
    }
    assert(ex.getMessage.contains("NULL band"), ex.getMessage)
  }

  test("ord is a 1..n permutation regardless of partitioning") {
    val ords = Curriculum.globalOrderIndex(rows.repartition(7), "band", "id")
      .select("ord").as[Long].collect().sorted.toSeq
    assert(ords === (1L to 10L).toSeq)
  }

  test("plan: no global-order Exchange of the data — ranks partition by band") {
    val plan = Curriculum.globalOrderIndex(rows, "band", "id")
      .queryExecution.executedPlan.toString
    // the data-side window must be hash-partitioned by band, never a
    // single-partition total sort of the corpus
    assert(plan.contains("hashpartitioning(band"), plan.take(3000))
  }

  test("real corpus: curriculum is monotone in band along ord") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        expr("CAST(size(split(trim(text), '\\\\s+')) AS BIGINT) div 50")
          .as("band"))
    val seq = Curriculum.globalOrderIndex(docs, "band", "doc_id")
      .orderBy("ord").select("band").as[Long].collect().toSeq
    assert(seq === seq.sorted, "bands must be non-decreasing along ord")
    assert(seq.length == docs.count())
  }
}
