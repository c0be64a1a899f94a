package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Measurement main for the SKEW TOOLING (`Skew.saltedJoin`): manufactures
  * a heavy-hitter key over the lineitem fixture (half the rows collapse to
  * key 0 — the "one boilerplate doc repeated 10^8 times" shape from
  * SCALE.md) and times a non-broadcast inner join under three plans:
  *
  *   1. plain sort-merge join, AQE skew split ON  (the reactive fix)
  *   2. plain sort-merge join, AQE skew split OFF (the stalled-reducer
  *      baseline a mis-tuned or non-splittable stage degenerates to)
  *   3. `Skew.saltedJoin` (the explicit, plannable form)
  *
  * Broadcast is disabled so the join actually shuffles both sides — at
  * 100 TB the right side of this shape (10k keys x wide payload) may be
  * far past broadcast range; that is the regime saltedJoin exists for.
  * Numbers land in SCALE.md.
  *
  *   sbt "runMain graft.SkewBench [sfDir] [replicate] [salts]"
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicate = args.lift(1).map(_.toInt).getOrElse(8)
    val salts = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = graft.core.GraftSession.fromEnv()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)

    val base = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    // replicate with shifted orderkeys so the hot key stays ~50% of rows
    val big0 = (0 until replicate).map { c =>
      base.select((col("l_orderkey") + lit(c.toLong * 100000000L)).as("ok"),
        col("l_partkey"), col("l_quantity"))
    }.reduce(_ union _)
    // heavy hitter: every even orderkey collapses to key 0; odd keys spread
    val big = big0.select(
      when(pmod(col("ok"), lit(2)) === 0, lit(0L))
        .otherwise(pmod(col("ok"), lit(10000)) + 1).as("k"),
      col("ok"), col("l_quantity"))
      .cache()
    val nBig = big.count() // materialize so the scans don't dominate
    val hot = big.where(col("k") === 0).count()

    val right = spark.range(0, 10001).select(col("id").as("k"),
      (col("id") * 7 % 97).as("payload"))

    // min of 2 so one JIT/GC-noisy pass can't masquerade as a difference
    def timed(label: String)(f: => Long): Unit = {
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[skew] $label%-28s $t%6.2f s")
    }

    println(s"[skew] big=$nBig rows, hot key 0 = $hot rows, salts=$salts")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", true)
    timed("plain SMJ, AQE skew ON") {
      big.join(right, Seq("k")).count()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", false)
    timed("plain SMJ, AQE skew OFF") {
      big.join(right, Seq("k")).count()
    }
    timed(s"saltedJoin(salts=$salts)") {
      Skew.saltedJoin(big, right, "k", col("ok"), salts).count()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", true)
    spark.stop()
  }
}
