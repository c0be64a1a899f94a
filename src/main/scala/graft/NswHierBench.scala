package graft

import org.apache.spark.sql.functions._

/** Dev measurement: does a 2-layer NSW hierarchy beat the flat √n-stride
  * entry seeding (recall at fewer distance evals)? Flat seeding pays √n
  * evals per query to find a near-query entry; the hierarchy beams a
  * once-built upper graph over the SAME stride sample at ~constant evals.
  * Run at two corpus sizes to see the crossover direction; numbers land
  * in ANN_QUALITY.md (static section — refresh by re-running this).
  *
  * Usage: runMain graft.NswHierBench [sfDir] [nQueries] [mode]
  *
  * mode `clustered` replaces the near-uniform fixture with a CLUSTERED
  * corpus derived deterministically from it (every ~n/C-th real vector
  * becomes a cluster center; members = center + md5-seeded jitter) —
  * the geometry real embedding models produce, where greedy graph
  * navigation has a gradient to follow. This answers the open question
  * from the flat-fixture negative result: does the 2-layer entry win
  * once the corpus has structure?
  */
object NswHierBench {

  /** Deterministic uniform [0,1) from a seed string (md5 low 32). */
  private def h01(s: String): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(24, 32), 16).toDouble / 4294967296.0
  }

  /** center + per-(tag,dim) jitter of component scale `eps`. */
  private def jitter(c: Array[Double], tag: String, eps: Double): Array[Double] =
    Array.tabulate(c.length)(i => c(i) + (h01(s"$tag:$i") - 0.5) * 2.0 * eps)

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nq    = args.lift(1).map(_.toInt).getOrElse(32)
    val mode  = args.lift(2).getOrElse("flat")
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("ERROR")
    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .orderBy("vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val (rows, queries) =
      if (mode != "clustered") {
        val qStride = math.max(1, real.length / nq)
        (real, real.indices.by(qStride).take(nq).map(i => real(i)._2))
      } else {
        // C centers from the real corpus, perC members each at component
        // jitter eps = 20% of the mean |component| (intra-cluster distance
        // << inter-center distance, the planted-cluster geometry)
        val c = math.max(8, real.length / 100)
        val perC = real.length / c
        val meanAbs = real.iterator.take(256)
          .flatMap(_._2.iterator.map(math.abs)).sum / (256.0 * real.head._2.length)
        val eps = 0.2 * meanAbs * math.sqrt(real.head._2.length)
        val centers = Array.tabulate(c)(i => real(i * (real.length / c))._2)
        val rws = (0 until c).flatMap { ci =>
          (0 until perC).map { r =>
            ((ci.toLong * perC + r),
              jitter(centers(ci), s"m:$ci:$r", eps / math.sqrt(centers(ci).length)))
          }
        }.toArray
        val qs = (0 until nq).map { qi =>
          val ci = qi * math.max(1, c / nq) % c
          jitter(centers(ci), s"q:$ci:$qi", eps / math.sqrt(centers(ci).length))
        }
        (rws, qs)
      }
    println(s"[nswhier] mode=$mode")
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
