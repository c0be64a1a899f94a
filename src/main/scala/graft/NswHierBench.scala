package graft

import org.apache.spark.sql.functions._

/** Dev measurement: does a 2-layer NSW hierarchy beat the flat √n-stride
  * entry seeding (recall at fewer distance evals)? Flat seeding pays √n
  * evals per query to find a near-query entry; the hierarchy beams a
  * once-built upper graph over the SAME stride sample at ~constant evals.
  * Run at two corpus sizes to see the crossover direction; numbers land
  * in ANN_QUALITY.md (static section — refresh by re-running this).
  *
  * Usage: runMain graft.NswHierBench [sfDir] [nQueries]
  */
object NswHierBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nq    = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .orderBy("vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // spread queries across the id space, deterministic
    val qStride = math.max(1, rows.length / nq)
    val queries = rows.indices.by(qStride).take(nq).map(i => rows(i)._2)
    val res = graft.operators.Nsw.seedingExperiment(rows, queries,
      k = 5, m = 8, efConstruction = 32,
      efSearch = Seq(16, 64), efUpper = Seq(4, 8))
    println(f"[nswhier] n=${rows.length} queries=${queries.length}")
    res.foreach { case (mode, ef, recall, evals) =>
      println(f"[nswhier] ef=$ef%3d $mode%-22s recall@5=$recall%.3f evals/q=$evals%.0f")
    }
    spark.stop()
  }
}
