package graft
import org.apache.spark.sql.SparkSession
/** Prints executed-plan summaries for plan-quality review (pushdown,
  * broadcast choice, codegen spans, partial top-k). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_point_lookup", "q02_knn_exact", "q12_join_customer_orders",
      "q19_ngram_jaccard", "q30_topn_per_group", "q17_minhash_lsh_dedup")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      val df = SparkEntry.queries(n)(spark, d)
      df.write.format("noop").mode("overwrite").save()   // let AQE finalize
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.length < 400).take(45).mkString("\n"))
    }
    spark.stop()
  }
}
