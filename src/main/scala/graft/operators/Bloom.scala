package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.md5Bucket

/** Bloom-filter semi-join pruning — the EXPLICIT, plannable form of
  * runtime filter pushdown (Spark's `InjectRuntimeFilter` does this
  * opportunistically; this is the form you can deploy deliberately, the
  * way [[Skew.saltedJoin]] is the deliberate form of AQE's skew split).
  * The 100 TB shape: joining a fact table to a SELECTIVE dimension subset
  * that is past broadcast range still shuffles EVERY fact row under
  * sort-merge — the shuffle, not the join, is the bottleneck. A bloom
  * bitmap of the dimension keys (`bits/8` bytes total, k salted-md5 bit
  * positions per key) rides to the mappers as a plan literal and drops
  * non-matching fact rows BEFORE the exchange, row-locally, inside
  * whole-stage codegen; the surviving superset (false positives only —
  * a bloom has NO false negatives) is resolved exactly by the join
  * itself. Measured shuffle reduction in SCALE.md (`graft.BloomBench`).
  *
  * Bit positions are salted md5 ([[graft.functions.TextFunctions
  * .md5Bucket]], salts `bf<i>:`) — deterministic and engine-portable, so
  * the PASS SET (true matches + false positives) is bit-identical in a
  * DuckDB replica and the driver oracle hash-matches it (q91), the same
  * discipline as the count-min grid and the HLL registers.
  */
object Bloom {

  /** The k bit positions in [0, bits) for one key. ONE md5 per 5
    * positions, not one per position: the 128-bit digest splits into
    * five 24-bit slices (hex chars 1-6, 7-12, …, 25-30), each reduced
    * mod bits — position i reads slice i%5 of md5("bf<i/5>:" + key).
    * The hash, not the bit test, is the probe side's per-row cost, so
    * at the default k = 5 the filter costs exactly one digest per row.
    * Requires bits ≤ 2^24 (a slice must cover the position space).
    */
  def positions(key: Column, bits: Int, k: Int): Seq[Column] = {
    require(bits <= (1 << 24), s"bits $bits past a 24-bit digest slice")
    (0 until k).map { i =>
      val digest = md5(concat(lit(s"bf${i / 5}:"), key.cast("string")))
      pmod(conv(substring(digest, 1 + 6 * (i % 5), 6), 16, 10).cast("long"),
        lit(bits.toLong))
    }
  }

  /** Build the bitmap over the build side's keys: bits/64 longs,
    * driver-collected (artifact-sized — 128 KiB at 2^20 bits, 2 MiB at
    * the 2^24 gate; past that keep the (word, bits) rows distributed and
    * probe via equi-join on the word index instead of a mapper-resident
    * bitmap).
    */
  def buildBitmap(df: DataFrame, keyCol: String, bits: Int, k: Int): Array[Long] = {
    require(bits >= 64 && bits % 64 == 0, s"bits $bits must be a positive multiple of 64")
    // 2^24 = the digest-slice ceiling in positions(); the 2 MiB bitmap it
    // implies is also comfortably within reference-object range (Spark's
    // own runtime bloom caps at 2^26 bits for the same reason)
    require(bits <= (1 << 24), s"bits $bits past the 24-bit digest slice")
    require(k >= 1 && k <= 16, s"k $k outside 1..16")
    val pos = positions(col(keyCol), bits, k)
    val words = df.select(explode(array(pos: _*)).as("p"))
      .select(shiftright(col("p"), 6).as("w"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64L)).cast("int")).as("m"))
      .groupBy("w").agg(bit_or(col("m")).as("word"))
      .collect()
    val arr = new Array[Long](bits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Row-local membership test against a built bitmap: every one of the
    * k bits set — the codegen [[graft.functions.expressions
    * .BloomContains]] expression (one md5 per row, bitmap as a codegen
    * reference object). No shuffle, no UDF, no plan-literal blowup.
    * False positives possible, false negatives not.
    */
  def mightContain(bloom: Array[Long], key: Column, k: Int): Column = {
    require(bloom.nonEmpty, "empty bloom bitmap")
    graft.functions.expressions.BloomContains.column(key, bloom, k)
  }

  /** Declarative twin of [[mightContain]] — same bits from the same
    * digest slices via built-in functions only (parity-pinned in
    * BloomSpec). Costs ~k digests per row inside a Filter (FilterExec
    * does not subexpression-eliminate); exists as the oracle-shaped
    * specification of the codegen expression, not the serving path.
    */
  def mightContainDecl(bloom: Array[Long], key: Column, k: Int): Column = {
    require(bloom.nonEmpty, "empty bloom bitmap")
    val bits = bloom.length * 64
    val arr = typedLit(bloom.toSeq)
    positions(key, bits, k).map { p =>
      element_at(arr, (shiftright(p, 6) + 1).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(p, lit(64L)).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** Inner join with the big side bloom-pruned before its shuffle. The
    * result EQUALS the plain join (false positives are eliminated by the
    * join; a bloom never drops a true match) — only the exchanged volume
    * changes. Build cost is one scan of the small side + a bits/8-byte
    * collect; worth it whenever the small side is selective against the
    * big side's key space and past broadcast range.
    */
  def filteredJoin(big: DataFrame, small: DataFrame, keyCol: String,
      bits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val bloom = buildBitmap(small, keyCol, bits, k)
    big.where(mightContain(bloom, col(keyCol), k)).join(small, Seq(keyCol))
  }

  // ---- persisted artifact lifecycle (build once / append / serve) ----
  // The same discipline as the IVF and NSW artifacts: membership state
  // built at write time, maintained INCREMENTALLY at ingest (bit-OR is a
  // semilattice — append(A);append(B) is bit-identical to build(A∪B),
  // property-pinned in BloomSpec), loaded cheaply at serve time. The
  // deployable form of "have we seen this key/hash/benchmark-gram
  // before" for continuous-ingest dedup and decontamination.

  private def metaFile(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_bloom_meta.json")

  /** Persist a bitmap as (w, word) rows + a (bits, k) sidecar. */
  def saveBitmap(spark: org.apache.spark.sql.SparkSession,
      bitmap: Array[Long], k: Int, path: String): Unit = {
    import spark.implicits._
    bitmap.zipWithIndex.collect { case (w, i) if w != 0L => (i, w) }
      .toSeq.toDF("w", "word")
      .repartition(1).write.mode("overwrite").parquet(path)
    val p = metaFile(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"""{"bits":${bitmap.length * 64},"k":$k}"""
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** Load a persisted bitmap: (bitmap, k). */
  def loadBitmap(spark: org.apache.spark.sql.SparkSession,
      path: String): (Array[Long], Int) = {
    val p = metaFile(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"bloom artifact at $path has no ${p.getName} " +
      "sidecar — was it written by saveBitmap?")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def field(name: String): Int = {
      val m = s""""$name"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(text)
      require(m.isDefined, s"bloom meta sidecar at $p is missing '$name'")
      m.get.group(1).toInt
    }
    val bits = field("bits")
    val arr = new Array[Long](bits / 64)
    spark.read.parquet(path).collect()
      .foreach(r => arr(r.getInt(0)) = r.getLong(1))
    (arr, field("k"))
  }

  /** OR a new batch's keys into a persisted bitmap — incremental
    * membership maintenance at ingest, no rebuild: the bitmap of A∪B is
    * exactly bitmap(A) | bitmap(B).
    */
  def appendToBitmap(df: DataFrame, keyCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val (existing, k) = loadBitmap(spark, path)
    val delta = buildBitmap(df, keyCol, existing.length * 64, k)
    var i = 0
    while (i < existing.length) { existing(i) |= delta(i); i += 1 }
    saveBitmap(spark, existing, k, path)
  }
}
