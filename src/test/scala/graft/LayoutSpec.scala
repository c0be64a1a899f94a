package graft

import org.apache.spark.sql.functions._

import graft.functions.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // scalar reference: the same magic-mask chain, computed on the driver
  private def spreadRef(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | v << 16) & 0x0000FFFF0000FFFFL
    v = (v | v << 8) & 0x00FF00FF00FF00FFL
    v = (v | v << 4) & 0x0F0F0F0F0F0F0F0FL
    v = (v | v << 2) & 0x3333333333333333L
    v = (v | v << 1) & 0x5555555555555555L
    v
  }
  private def mortonRef(a: Long, b: Long): Long = spreadRef(a) | spreadRef(b) << 1

  private val sweep = Seq(0L, 1L, 2L, 3L, 7L, 1023L, 12345L, 65535L,
    1000000L, 0x7FFFFFFFL)

  test("morton2 matches the scalar reference across the sweep") {
    val pairs = for (a <- sweep; b <- sweep) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.morton2(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z === mortonRef(a, b), s"morton($a, $b)")
      assert(z >= 0L, s"morton($a, $b) must stay positive")
    }
  }

  test("the interleave is injective on the sweep grid") {
    val pairs = for (a <- sweep; b <- sweep) yield (a, b)
    val codes = pairs.toDF("a", "b")
      .select(Layout.morton2(col("a"), col("b")).as("z"))
      .distinct().count()
    assert(codes === pairs.length.toLong)
  }

  test("writeZOrdered files carry tight min/max boxes in BOTH dimensions") {
    // 64×64 grid written z-ordered into 16 files: each file should cover
    // ~1/16 of the AREA (a compact tile), while a single-dimension sort
    // would give every file the full range of the other dimension
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-").toString
    Layout.writeZOrdered(grid, "a", "b", dir, numFiles = 16)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getAbsolutePath)
    assert(parts.length === 16)
    val globalArea = 64.0 * 64.0
    parts.foreach { p =>
      val s = spark.read.parquet(p)
        .agg(min("a"), max("a"), min("b"), max("b"), count(lit(1)))
        .head()
      val area = (s.getLong(1) - s.getLong(0) + 1).toDouble *
        (s.getLong(3) - s.getLong(2) + 1).toDouble
      // a perfect tiling gives area = globalArea/16; allow 4x slack for
      // range-boundary straddle. A one-dim sort would give area ≥ 64·4.
      assert(area <= 4 * globalArea / 16, s"file box area $area too wide")
      assert(s.getLong(4) > 0L)
    }
  }

  test("writeBinPacked compacts to capped files in a single pass") {
    val rows = (1L to 1000L).toDF("v")
    val dir = java.nio.file.Files.createTempDirectory("graft-binpack-").toString
    Layout.writeBinPacked(rows, dir, targetRowsPerFile = 300L)
    val counts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getAbsolutePath)
      .map(p => spark.read.parquet(p).count()).sorted.toSeq
    // AQE rebalance coalesces this tiny input to one partition; the
    // per-file row cap then cuts 300/300/300 + the one tail file —
    // the OPTIMIZE contract: every file ≤ target, one remainder
    assert(counts === Seq(100L, 300L, 300L, 300L), counts.mkString(","))
    // nothing lost in the rewrite
    assert(spark.read.parquet(dir).count() === 1000L)
  }

  test("writeShuffled is a reproducible md5-order permutation; salt changes it") {
    val rows = (1L to 500L).toDF("k")
    def readInOrder(dir: String): Seq[Long] = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getAbsolutePath).sorted
      files.toSeq.flatMap(f =>
        spark.read.parquet(f).collect().map(_.getLong(0)))
    }
    val d1 = java.nio.file.Files.createTempDirectory("graft-shuf-").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-shuf-").toString
    val d3 = java.nio.file.Files.createTempDirectory("graft-shuf-").toString
    Layout.writeShuffled(rows, "k", d1, numFiles = 4, salt = "ep1")
    Layout.writeShuffled(rows.repartition(7), "k", d2, numFiles = 4, salt = "ep1")
    Layout.writeShuffled(rows, "k", d3, numFiles = 4, salt = "ep2")
    val o1 = readInOrder(d1); val o2 = readInOrder(d2); val o3 = readInOrder(d3)
    assert(o1 === o2)                       // partitioning-invariant permutation
    assert(o1.sorted === (1L to 500L))      // lossless
    assert(o1 !== (1L to 500L).toSeq)       // actually shuffled
    assert(o3 !== o1)                       // a new epoch reorders
    assert(o3.sorted === o1.sorted)
    // and it matches the declared order: ascending md5(salt || key)
    val expect = (1L to 500L).sortBy(k =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"ep1$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(o1 === expect)
  }

  test("bit-prefix buckets bound BOTH dimensions (the data-skipping property)") {
    // full 32×32 grid, 10-bit codes; the top-4-bit bucket is exactly an
    // 8×8 tile, so every bucket's min/max box is 7 wide in each dim —
    // the reason z-ordered files prune on either predicate
    val grid = (for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)).toDF("a", "b")
    val stats = grid
      .withColumn("bucket", shiftright(Layout.morton2(col("a"), col("b")), 6))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        (max("a") - min("a")).as("aw"), (max("b") - min("b")).as("bw"))
      .as[(Long, Long, Long, Long)].collect()
    assert(stats.length === 16)
    stats.foreach { case (bk, n, aw, bw) =>
      assert(n === 64L, s"bucket $bk size")
      assert(aw === 7L && bw === 7L, s"bucket $bk box $aw x $bw")
    }
  }
}
