package graft
import org.apache.spark.sql.SparkSession
/** Local smoke runner for SparkEntry.entry (the driver's rows>0 check). */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY ROWS=" + df.count())
    df.show(false)
    spark.stop()
  }
}
