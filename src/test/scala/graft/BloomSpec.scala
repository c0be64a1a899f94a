package graft

import org.apache.spark.sql.functions._

import graft.operators.Bloom

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key passes") {
    val keys = (1 to 500).map(i => s"k$i")
    val bloom = Bloom.buildBitmap(keys.toDF("k"), "k", bits = 4096, k = 5)
    val pass = keys.toDF("k")
      .where(Bloom.mightContain(bloom, col("k"), k = 5)).count()
    assert(pass === 500L)
  }

  test("false-positive rate is small at light load and zero bits reject") {
    val bloom = Bloom.buildBitmap(
      (1 to 100).map(i => s"in$i").toDF("k"), "k", bits = 4096, k = 5)
    // 100 keys * 5 bits / 4096 = 12% load -> fp ~ 0.12^5 ~ 2.5e-5
    val fp = (1 to 10000).map(i => s"out$i").toDF("k")
      .where(Bloom.mightContain(bloom, col("k"), k = 5)).count()
    assert(fp <= 10L, s"$fp false positives of 10000")
    val empty = Bloom.buildBitmap(Seq.empty[String].toDF("k"), "k", 4096, 5)
    assert((1 to 100).map(i => s"x$i").toDF("k")
      .where(Bloom.mightContain(empty, col("k"), 5)).count() === 0L)
  }

  test("bitmap is partition-invariant (bit-or is order-free)") {
    val df = (1 to 300).map(i => s"k$i").toDF("k")
    val a = Bloom.buildBitmap(df.coalesce(1), "k", 2048, 4).toSeq
    val b = Bloom.buildBitmap(df.repartition(17), "k", 2048, 4).toSeq
    assert(a === b)
  }

  test("filteredJoin equals the plain join (false positives die in the join)") {
    val big = (1 to 5000).map(i => (i.toLong % 700, i.toLong)).toDF("key", "payload")
    val small = (1 to 50).map(i => (i.toLong * 13 % 700, s"dim$i")).toDF("key", "dim")
    val got = Bloom.filteredJoin(big, small, "key", bits = 1024, k = 4)
      .orderBy("key", "payload", "dim")
      .collect().map(_.toSeq).toSeq
    val want = big.join(small, Seq("key"))
      .orderBy("key", "payload", "dim")
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("codegen expression and declarative twin agree bit-for-bit") {
    val bloom = Bloom.buildBitmap(
      (1 to 200).map(i => s"in$i").toDF("k"), "k", bits = 2048, k = 7)
    val probes = ((1 to 200).map(i => s"in$i") ++
      (1 to 3000).map(i => s"out$i")).toDF("k")
    val fast = probes.where(Bloom.mightContain(bloom, col("k"), 7))
      .collect().map(_.getString(0)).toSet
    val decl = probes.where(Bloom.mightContainDecl(bloom, col("k"), 7))
      .collect().map(_.getString(0)).toSet
    assert(fast === decl)
    assert((1 to 200).map(i => s"in$i").toSet.subsetOf(fast))
    // null keys are dropped by the filter, not crashed on
    val withNull = spark.sql("SELECT CAST(NULL AS STRING) AS k")
      .union(Seq("in1").toDF("k"))
    assert(withNull.where(Bloom.mightContain(bloom, col("k"), 7))
      .count() === 1L)
  }

  test("artifact lifecycle: save/load round-trip; append == rebuild bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-").toString
    val a = (1 to 150).map(i => s"a$i").toDF("k")
    val b = (1 to 90).map(i => s"b$i").toDF("k")
    val built = Bloom.buildBitmap(a, "k", bits = 2048, k = 5)
    Bloom.saveBitmap(spark, built, k = 5, dir)
    val (loaded, k) = Bloom.loadBitmap(spark, dir)
    assert(k === 5 && loaded.toSeq === built.toSeq)
    // bit-OR semilattice: append(B) over build(A) == build(A ∪ B)
    Bloom.appendToBitmap(b, "k", dir)
    val (merged, _) = Bloom.loadBitmap(spark, dir)
    val direct = Bloom.buildBitmap(a.union(b), "k", bits = 2048, k = 5)
    assert(merged.toSeq === direct.toSeq)
    // and the appended keys are now members (no false negatives)
    assert(b.where(Bloom.mightContain(merged, col("k"), 5)).count() === 90L)
  }

  test("generated code compiles — probe runs with codegen fallback disabled") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val bloom = Bloom.buildBitmap(
        (1 to 50).map(i => s"k$i").toDF("k"), "k", bits = 1024, k = 5)
      val n = (1 to 500).map(i => s"k$i").toDF("k")
        .where(Bloom.mightContain(bloom, col("k"), 5)).count()
      assert(n >= 50L) // the 50 members pass; fps may add a few
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("numeric keys hash via their canonical string form") {
    val bloom = Bloom.buildBitmap(
      (1L to 100L).toDF("k"), "k", bits = 2048, k = 4)
    val pass = (1L to 100L).toDF("k")
      .where(Bloom.mightContain(bloom, col("k"), 4)).count()
    assert(pass === 100L)
  }
}
