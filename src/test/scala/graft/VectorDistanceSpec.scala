package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.functions.expressions.VectorDistance

class VectorDistanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val q   = graft.queries.CoreQueries.queryVec(spark, sf0001)

  test("codegen l2Sq is bit-identical to the fold form on real embeddings") {
    val diff = emb.select(
        l2Sq(col("embedding"), typedLit(q)).as("native"),
        l2SqFold(col("embedding"), typedLit(q)).as("fold"))
      .where(col("native") =!= col("fold")) // exact bit compare via !=
      .count()
    assert(diff === 0)
  }

  test("codegen dot is bit-identical to the fold form (float x float)") {
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val diff = a.join(b, col("a") === col("b") - 1)
      .select(dot(col("ea"), col("eb")).as("native"),
        dotFold(col("ea"), col("eb")).as("fold"))
      .where(col("native") =!= col("fold"))
      .count()
    assert(diff === 0)
  }

  test("null semantics: length mismatch and null element give null") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f)),          // length mismatch
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f))     // ok
    ).toDF("a", "b")
    val got = df.select(l2Sq($"a", $"b")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0) === 0.0)
    val withNull = spark.sql("SELECT cast(array(1.0, null) as array<double>) a, cast(array(1.0, 2.0) as array<double>) b")
    VectorDistance.register(spark)
    assert(withNull.selectExpr("vec_l2sq(a, b)").head().isNullAt(0))
  }

  test("SQL registration works: vec_l2sq / vec_dot") {
    VectorDistance.register(spark)
    val r = spark.sql(
      "SELECT vec_l2sq(array(0.0d, 3.0d), array(4.0d, 0.0d)) l2, " +
      "vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) d").head()
    assert(r.getDouble(0) === 25.0 && r.getDouble(1) === 11.0)
  }

  test("scoring stays inside WholeStageCodegen (no fallback)") {
    val exec = emb.select(l2Sq(col("embedding"), typedLit(q)).as("s"))
      .queryExecution.executedPlan
    val spans = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"no codegen span in:\n$exec")
    // and the scoring Project sits inside a span ('*' prefix in the string)
    assert(exec.toString.contains("*(1) Project"))
  }
}
