package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.md5Bucket

/** Count-min sketch — fixed-memory frequency estimation (Cormode &
  * Muthukrishnan 2005), the one-pass profiling answer at 100 TB: exact
  * token counts need a full-vocabulary shuffle whose reduce side grows
  * with the corpus, while the sketch is a constant `depth × width` grid
  * of counters no matter how many items stream through. Build is one
  * hash-agg over (row, bucket) — map-side partial counting does almost
  * all the work, and the shuffled state is AT MOST depth×width rows per
  * mapper. Estimates are upper bounds: `est(x) = min_r counter[r][h_r(x)]`
  * overcounts only by hash collisions (≤ εN with ε = e/width at the
  * standard depth = ln(1/δ)).
  *
  * Hashing is the salted-md5 row hash ([[graft.functions.TextFunctions
  * .md5Bucket]], salt `cm<r>:`) — deterministic and engine-portable, so
  * a DuckDB replica of the grid is bit-identical and the driver oracle
  * can hash-match both the sketch and the estimates (no RNG, no JVM
  * hashCode).
  *
  * The reference has no sketch structures; this is part of the
  * training-pipeline extension suite (heavy-hitter detection over a
  * corpus too large to count exactly).
  */
object Sketch {

  private def bucket(key: Column, row: Int, width: Int): Column =
    md5Bucket(key, width, salt = s"cm$row:")

  /** Build the sketch: one (r, b, cnt) row per non-empty counter cell —
    * the sparse form of the depth×width grid (a dense grid is the
    * degenerate case; sparse keeps the build a plain hash-agg). `items`
    * rows each contribute 1 to one bucket per hash row.
    */
  def countMin(items: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"depth $depth / width $width must be >= 1")
    val buckets = (0 until depth).map(r => bucket(col(keyCol), r, width))
    items.select(posexplode(array(buckets: _*)).as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each distinct key in `probes`:
    * min over hash rows of the matching counter (absent cell = 0). The
    * sketch side is tiny (≤ depth×width rows) → broadcast; the probe
    * scan never shuffles more than one row per (probe, hash-row).
    */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val pb = (0 until depth).map(r => bucket(col(keyCol), r, width))
    probes.select(col(keyCol), posexplode(array(pb: _*)).as(Seq("r", "b")))
      .join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Linear-counting distinct estimation (Whang et al. 1990) — the
    * bounded-memory COUNT(DISTINCT) answer: hash each value into one of
    * `buckets` cells and count BUSY cells per group; the estimate is
    * `-B·ln(1 − busy/B)`. The sketch state per group is at most `buckets`
    * (bucket-id) rows regardless of cardinality, vs an exact distinct
    * whose reduce side grows with the value universe. Output: (groupCol,
    * busy LONG) — exact integers, engine-portable (salted-md5 bucket ids,
    * like the count-min grid), so the SKETCH STATE itself is
    * oracle-checkable; the ln() estimate is [[linearCountEstimate]],
    * driver-side, because transcendental libm results are NOT bit-stable
    * across engines (the same reason q81 uses integer shifts, not exp).
    */
  def linearCountBuckets(df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets $buckets must be >= 2")
    df.select(col(groupCol),
        md5Bucket(col(valueCol), buckets, salt = "lc:").as("b"))
      .distinct()
      .groupBy(groupCol)
      .agg(count(lit(1)).as("busy"))
  }

  /** The linear-counting formula over a collected (group, busy) row:
    * distinct ≈ -B·ln(1 − busy/B); saturated sketches (busy = B) have no
    * finite estimate — widen `buckets`.
    */
  def linearCountEstimate(busy: Long, buckets: Int): Double = {
    require(busy >= 0 && busy <= buckets, s"busy $busy outside 0..$buckets")
    require(busy < buckets, s"sketch saturated (busy = buckets = $buckets): widen it")
    -buckets.toDouble * math.log1p(-busy.toDouble / buckets.toDouble)
  }

  /** HyperLogLog register state (Flajolet et al. 2007) — the distinct
    * sketch that stays accurate PAST linear counting's saturation point:
    * where a busy-bucket sketch loses resolution as busy → B, HLL's
    * per-bucket max-rank registers keep a ~1.04/√m relative error at ANY
    * cardinality, with m = 2^p registers of state per group, forever.
    *
    * Hash layout: the 60-bit salted-md5 value ([[graft.functions
    * .TextFunctions.md5Low60]] convention, salt `hll:`) splits into the
    * low p bits (register index, `h % m`) and the high 60−p bits `w`
    * (`h >> p`); the register records the max over values of
    * rank(w) = (60−p) − bitLength(w) + 1, the 1-based position of w's
    * leftmost set bit (w = 0 → 60−p+1). Both halves are pure integer
    * arithmetic — `bin()` string length is the engine-portable bitLength —
    * so the register STATE itself hash-matches a DuckDB replica (the q85
    * discipline: sketch state exact-integer and oracle-checked, the
    * transcendental estimate driver-side in [[hllEstimate]]).
    *
    * Scale shape: one hash-agg over (group, b) — map-side partial MAX
    * does almost all the work and the shuffled state is ≤ m rows per
    * group per mapper. Registers MERGE by bucket-wise max (max is
    * associative-commutative), so per-shard sketches union losslessly —
    * the property that makes HLL the cross-partition COUNT(DISTINCT) at
    * 100 TB; [[hllMerge]] is that union, property-pinned in SketchSpec
    * against a direct build of the combined input.
    *
    * Output: (groupCol, b LONG, reg LONG) — sparse: buckets no value
    * hashed into are absent (reg 0 in the dense view).
    */
  /** The (bucket, rank) pair for one value — the single definition both
    * the batch aggregation and the streaming state update hash through,
    * so their register states agree by construction. Pure codegen'd
    * integer/string arithmetic; no UDF.
    */
  def hllBucketRank(value: Column, p: Int): (Column, Column) = {
    require(p >= 2 && p <= 16, s"p $p outside 2..16 (m = 2^p registers)")
    val m = 1L << p
    val wBits = 60 - p
    val h = conv(substring(md5(concat(lit("hll:"), value)), 18, 15),
      16, 10).cast("long")
    val w = shiftright(h, p)
    (pmod(h, lit(m)),
      when(w === 0, lit(wBits + 1))
        .otherwise(lit(wBits) - length(bin(w)) + 1).cast("long"))
  }

  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
      p: Int): DataFrame = {
    val (b, r) = hllBucketRank(col(valueCol), p)
    df.select(col(groupCol), b.as("b"), r.as("r"))
      .groupBy(col(groupCol), col("b"))
      .agg(max(col("r")).as("reg"))
  }

  /** Union of two register sets over the same (groupCol, p): bucket-wise
    * max. Lossless — HLL's defining property (registers are a max
    * semilattice), so shard-local sketches combine into exactly the
    * sketch of the combined input.
    */
  def hllMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(groupCol), col("b"))
      .agg(max(col("reg")).as("reg"))

  /** The HLL estimate over one group's collected sparse registers:
    * E = α_m·m²/Σ 2^(−reg) (absent buckets contribute 2^0), with the
    * standard small-range linear-counting correction when E ≤ 2.5m and
    * empty buckets remain. Driver-side: transcendental, not bit-stable
    * cross-engine (same rule as [[linearCountEstimate]]).
    */
  def hllEstimate(regs: Seq[(Long, Long)], p: Int): Double = {
    require(p >= 2 && p <= 16, s"p $p outside 2..16")
    val m = 1 << p
    require(regs.size <= m, s"${regs.size} registers for m = $m")
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val sum = regs.map { case (_, r) => math.pow(2.0, -r.toDouble) }.sum +
      (m - regs.size).toDouble // absent buckets: 2^0 each
    val e = alpha * m * m / sum
    val zeros = m - regs.count { case (_, r) => r > 0 }
    if (e <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else e
  }

  /** Equi-width histogram sketch of a LONG column over a declared
    * [lo, hi) domain: per-group bucket counts. The quantile companion to
    * the distinct sketches above — state is at most `buckets` rows per
    * group whatever the data volume, counts are Long monoids (bucket
    * counts ADD, so the sketch rides [[Ivm]] merges and streaming
    * refresh unchanged), and everything is integer arithmetic:
    * bucket = (clamped(v)−lo)·B div (hi−lo) — the VALUE is clamped into
    * [lo, hi−1] BEFORE the multiply, so domain stragglers land in the
    * edge buckets without the (v−lo)·B product ever leaving
    * [0, (hi−lo−1)·B]; clamping after the multiply would let a value far
    * outside the declared domain overflow Long first (error under ANSI,
    * silent wrap otherwise). The only overflow surface left is the
    * domain declaration itself, checked eagerly. Output:
    * (groupCol, bucket, n).
    */
  def histogramBuckets(df: DataFrame, groupCol: String, valueCol: String,
      lo: Long, hi: Long, buckets: Int): DataFrame = {
    require(hi > lo, s"domain [$lo, $hi) is empty")
    require(buckets >= 1, s"buckets $buckets must be >= 1")
    require(hi - lo > 0 && (hi - lo) <= Long.MaxValue / buckets,
      s"domain width ${hi - lo} * $buckets buckets overflows Long")
    df.select(col(groupCol),
        expr(s"((greatest(${lo}L, least(${hi - 1}L, ${valueCol})) - ${lo}L)" +
          s" * ${buckets}L) div ${hi - lo}L").as("bucket"))
      .groupBy(groupCol, "bucket")
      .agg(count(lit(1)).as("n"))
  }

  /** Percentile read off the histogram sketch: the smallest bucket whose
    * cumulative count reaches fraction pNum/pDen of the group, reported
    * as the bucket's UPPER edge — the conservative bound "at least p of
    * the group is ≤ this value", error ≤ one bucket width. The rational
    * p and the integer cumulative comparison (cum·pDen ≥ pNum·total)
    * make the answer bit-portable; a float p·n cutoff could flip a
    * boundary bucket between engines. One windowed cumsum over the
    * |groups|·B sketch rows — the corpus is never re-read. Output:
    * (groupCol, p_edge).
    */
  def histogramPercentile(hist: DataFrame, groupCol: String,
      lo: Long, hi: Long, buckets: Int, pNum: Int, pDen: Int): DataFrame = {
    require(pNum >= 0 && pDen > 0 && pNum <= pDen,
      s"percentile $pNum/$pDen must be a rational in [0, 1]")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col(groupCol))
    hist
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(tot))
      .where(col("cum") * pDen >= col("total") * pNum)
      .groupBy(groupCol)
      .agg(min(col("bucket")).as("bucket"))
      .select(col(groupCol),
        (lit(lo) + expr(s"((bucket + 1L) * ${hi - lo}L) div ${buckets}L"))
          .as("p_edge"))
  }

  /** KLL-style quantile sketch (after Karnin, Lang & Liberty 2016) with
    * DETERMINISTIC NESTED compaction — the rank sketch the histogram
    * percentile ([[histogramBuckets]]/[[histogramPercentile]]) cannot
    * be: no pre-chosen [lo, hi) domain, no bucket-width error floor.
    *
    * KLL's core idea is kept: a surviving item at level ℓ represents
    * 2^ℓ inputs (its weight), and the level grows just enough that the
    * survivor set stays ≤ k per group. KLL's BUFFER-ORDER compaction
    * (fill a level, sort, keep every other) is replaced by a nested
    * per-item coin: item `id` survives to level ℓ iff its 32-bit salted
    * md5 is ≡ 0 (mod 2^ℓ) — survive(ℓ+1) ⟹ survive(ℓ), so levels nest.
    * That trade costs KLL's O((1/ε)·√log(1/δ)) space optimality (this is
    * sample-quantile error, ~O(√(1/k)) rank error) and buys the three
    * properties a distributed, auditable engine actually needs:
    *   - PARTITION-ORDER INDEPENDENCE: the state is a pure function of
    *     the input multiset (buffer compaction depends on arrival order
    *     — its state could never hash-match an oracle);
    *   - EXACT MERGE: survivorship is a per-id predicate and levels
    *     nest, so merge(shardA, shardB) re-levels for the combined count
    *     and re-filters — bit-identical to a direct build of the union
    *     ([[kllMerge]], property-pinned in SketchSpec);
    *   - ORACLE-REPLAYABLE STATE *and* ESTIMATE: everything is integer
    *     arithmetic (level = bitLength((n−1) div k), weights are shifts,
    *     the quantile is a rational-compare cumulative rank) — no
    *     transcendental driver-side step at all, stronger than the
    *     HLL/LC split.
    *
    * Shape: one count per group (tiny agg) broadcast back over one
    * corpus scan with a row-local coin filter — survivors ≤ ~k rows per
    * group forever. Output state: one META row per group (u, v NULL —
    * it carries the group's exact `n` even when every coin loses, so
    * merges always see true counts) plus the survivor rows
    * (groupCol, level, n, u, v) — `level`/`n` group-constant, `u` the
    * item's coin (kept: it IS the re-subsampling capability that makes
    * merge exact), `v` the value.
    *
    * CONTRACT: `df` must be DETERMINISTIC over re-evaluation — the state
    * is two passes over it (the count agg, then the survivor coin
    * filter), so a non-deterministic lineage (`sample()`, a non-stable
    * shuffle sample, a re-read of mutating files) can yield a meta `n`
    * that disagrees with the survivor set, breaking the pure-function-
    * of-the-multiset property and the merge/oracle pins. Persist such an
    * input first (the VectorStore.put observe rationale — same hazard
    * class; not persisted here because the returned state is lazy and an
    * operator-owned persist would leak past it).
    */
  def kllState(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kllState: k $k must be >= 2")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .withColumn("level", levelFor("n", k))
    val surv = df.select(col(groupCol),
        graft.functions.TextFunctions.md5Low32(
          concat(lit("kll:"), col(idCol).cast("string"))).as("u"),
        col(valueCol).cast("long").as("v"))
      .join(broadcast(counts), Seq(groupCol))
      .where(expr("u % shiftleft(1L, level)") === 0)
      .select(col(groupCol), col("level"), col("n"), col("u"), col("v"))
    counts.select(col(groupCol), col("level"), col("n"),
        lit(null).cast("long").as("u"), lit(null).cast("long").as("v"))
      .unionByName(surv)
  }

  /** Smallest ℓ with n ≤ k·2^ℓ, as engine-portable integer arithmetic:
    * bitLength((n−1) div k) — n ≤ k·2^ℓ ⟺ (n−1) div k < 2^ℓ — with
    * bitLength(0) = 0 (bin() length is the bit count on both Spark and
    * DuckDB; the ≤ k branch handles the bin(0) = "0" edge).
    */
  private def levelFor(nCol: String, k: Int): Column =
    when(col(nCol) <= k, lit(0))
      .otherwise(length(bin(expr(s"($nCol - 1) div $k")))).cast("int")

  /** Merge two KLL states over the same (groupCol, k) — for DISJOINT
    * underlying inputs (shards of one corpus): the combined group count
    * re-derives the level, and each surviving item's kept coin `u`
    * re-filters it in place. Because survive(ℓ') ⟹ survive(ℓ ≤ ℓ'),
    * the result is bit-identical to [[kllState]] over the unioned input
    * — the defining mergeability property, spec-pinned.
    */
  def kllMerge(a: DataFrame, b: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kllMerge: k $k must be >= 2")
    val all = a.unionByName(b)
    // combined counts from the META rows (one per group per side — true
    // n even for a side whose every coin lost); the combined level is
    // >= each side's (levelFor is monotone in n), so re-filtering the
    // nested survivor coins is exactly a direct build over the union
    val counts = all.where(col("u").isNull)
      .groupBy(col(groupCol)).agg(sum(col("n")).as("n2"))
      .select(col(groupCol), col("n2"), levelFor("n2", k).as("level2"))
    val surv = all.where(col("u").isNotNull)
      .join(broadcast(counts), Seq(groupCol))
      .where(expr("u % shiftleft(1L, level2)") === 0)
      .select(col(groupCol), col("level2").as("level"), col("n2").as("n"),
        col("u"), col("v"))
    counts.select(col(groupCol), col("level2").as("level"),
        col("n2").as("n"), lit(null).cast("long").as("u"),
        lit(null).cast("long").as("v"))
      .unionByName(surv)
  }

  /** Rank-quantile read off the state, fully engine-side and integer:
    * survivors sort by (v, u), each carrying weight 2^level; the
    * p-quantile is the smallest v whose cumulative weight reaches
    * fraction pNum/pDen of the total (rational cross-compare — no float
    * cutoff to flip a boundary between engines). Output: (groupCol, q).
    */
  def kllQuantile(state: DataFrame, groupCol: String,
      pNum: Int, pDen: Int): DataFrame = {
    require(pNum >= 0 && pDen > 0 && pNum <= pDen,
      s"quantile $pNum/$pDen must be a rational in [0, 1]")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("v").asc, col("u").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col(groupCol))
    state
      .where(col("u").isNotNull) // meta rows carry no sample point
      .withColumn("wt", expr("shiftleft(1L, level)"))
      .withColumn("cum", sum(col("wt")).over(w))
      .withColumn("total", sum(col("wt")).over(tot))
      .where(col("cum") * pDen >= col("total") * pNum)
      .groupBy(groupCol)
      .agg(min(col("v")).as("q"))
  }

  /** KMV / Theta sketch sample (Beyer et al. 2007; the DataSketches
    * Theta family): per group, the k MINIMUM distinct md5-hash values of
    * the keys — the sketch for SET OPERATIONS. Linear counting and HLL
    * answer "how many distinct", but neither can answer "how many
    * distinct IN BOTH groups"; the KMV sample can, because the bottom-k
    * of a uniform hash is a uniform random sample of the distinct keys.
    * State is ≤ k rows per group forever; merge of shards = bottom-k of
    * the union (same total order, so shard-merge ≡ direct build).
    *
    * Shape: distinct (group, h) — one hash-agg — then a per-group ranked
    * window that WindowGroupLimit prunes to k rows below the sort.
    * Deterministic md5 everywhere: the SAMPLE ITSELF is the
    * oracle-checkable artifact. Output: (group, pos, h), pos 1..k
    * ascending h.
    */
  def kmvSample(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2 (got $k)")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h").asc)
    df.select(col(groupCol),
        graft.functions.TextFunctions.md5Low32(col(keyCol).cast("string"))
          .as("h"))
      .distinct()
      .withColumn("pos", row_number().over(w))
      .where(col("pos") <= k)
  }

  /** Distinct-INTERSECTION estimate for every group pair from one KMV
    * sample relation (the Theta-sketch a-and-b estimator): with
    * θ = min(kth_A, kth_B), every common sample value below θ is a
    * uniform sample point of A∩B at inclusion probability θ/2³², so
    * est(|A∩B|) = n_common · 2³² / θ. All integers until the one final
    * division. Groups smaller than k degrade gracefully (their whole
    * key set is the sample). Output: (ga, gb, theta, n_common,
    * est_inter) for ga < gb.
    */
  def kmvIntersect(sample: DataFrame, groupCol: String): DataFrame = {
    val kth = sample.groupBy(groupCol).agg(max(col("h")).as("kth"))
    val pairs = kth.as("x").join(kth.as("y"),
        col(s"x.$groupCol") < col(s"y.$groupCol"))
      .select(col(s"x.$groupCol").as("ga"), col(s"y.$groupCol").as("gb"),
        least(col("x.kth"), col("y.kth")).as("theta"))
    val common = sample.as("sa").join(sample.as("sb"),
        col("sa.h") === col("sb.h") &&
          col(s"sa.$groupCol") < col(s"sb.$groupCol"))
      .select(col(s"sa.$groupCol").as("ga"), col(s"sb.$groupCol").as("gb"),
        col("sa.h").as("h"))
    pairs.join(common, Seq("ga", "gb"), "left")
      .groupBy("ga", "gb", "theta")
      .agg(count(when(col("h") < col("theta"), lit(1))).as("n_common"))
      .select(col("ga"), col("gb"), col("theta"), col("n_common"),
        (col("n_common").cast("double") * lit(4294967296.0) /
          col("theta").cast("double")).as("est_inter"))
  }
}
