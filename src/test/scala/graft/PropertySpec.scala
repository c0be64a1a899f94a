package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.VectorStore

/** SURVEY §5(c) property-style invariants, seeded-random so they're
  * reproducible without a scalatest-scalacheck bridge.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  private def randomOps(n: Int, keys: Int) = (0 until n).map { i =>
    val key = s"k${rnd.nextInt(keys)}"
    val del = rnd.nextDouble() < 0.3
    (key, if (del) "DELETE" else "PUT",
      Array(rnd.nextFloat(), rnd.nextFloat()), (i + 1) * 10L)
  }

  test("LWW compaction is insensitive to op arrival order") {
    val ops = randomOps(200, 25)
    def runStore(sequence: Seq[(String, String, Array[Float], Long)]): Map[String, Seq[Double]] = {
      val store = new VectorStore(spark, Files.createTempDirectory("graft-prop-").toString, dim = 2)
      sequence.grouped(40).foreach { chunk =>
        val puts = chunk.filter(_._2 == "PUT")
        if (puts.nonEmpty) store.put(puts.map(o =>
          (o._1, o._3, Map.empty[String, String], o._4)).toDF("key", "vector", "metadata", "ts"))
        val dels = chunk.filter(_._2 == "DELETE")
        if (dels.nonEmpty) store.delete(dels.map(o => (o._1, o._4)).toDF("key", "ts"))
      }
      store.scan.collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    }
    val inOrder  = runStore(ops)
    val shuffled = runStore(rnd.shuffle(ops))
    assert(inOrder === shuffled) // event-time LWW, not arrival-time
    assert(inOrder.nonEmpty)
  }

  test("put then delete (later ts) of every key replays to empty") {
    val store = new VectorStore(spark, Files.createTempDirectory("graft-prop-").toString, dim = 2)
    val keys = (0 until 30).map(i => s"k$i")
    store.put(keys.map(k => (k, Array(1f, 2f), Map.empty[String, String], 10L))
      .toDF("key", "vector", "metadata", "ts"))
    store.delete(keys.map(k => (k, 20L)).toDF("key", "ts"))
    assert(store.scan.count() === 0)
  }

  test("KNN with k >= n returns exactly the live rows") {
    val n = 40
    val df = (0 until n).map(i => (s"k$i", Array(rnd.nextFloat(), rnd.nextFloat())))
      .toDF("key", "vector")
    val got = graft.operators.Knn.search(df, "key", "vector", Array(0.0, 0.0), k = 500)
    assert(got.count() === n)
    assert(got.select("key").distinct().count() === n)
  }

  test("md5 curation coins: bounds, determinism, salt independence, split totality") {
    import graft.functions.TextFunctions.{md5Bucket, md5Unit}
    val keys = (0 until 500).map(i => s"key-$i").toDF("k")
    val r = keys.select(
        md5Unit(col("k")).as("u"),
        md5Unit(col("k"), salt = "s1:").as("u1"),
        md5Bucket(col("k"), 100).as("b"),
        md5Bucket(col("k"), 100, salt = "split:").as("bs"))
      .collect()
    // bounds: u in [0,1), b in [0,100)
    assert(r.forall(x => x.getDouble(0) >= 0.0 && x.getDouble(0) < 1.0))
    assert(r.forall(x => x.getLong(2) >= 0L && x.getLong(2) < 100L))
    // salting decorrelates: the salted coin must differ for most keys
    assert(r.count(x => x.getDouble(0) != x.getDouble(1)) > 450)
    assert(r.count(x => x.getLong(2) != x.getLong(3)) > 400)
    // determinism: a second evaluation is bit-identical
    val again = keys.select(md5Unit(col("k")).as("u")).collect().map(_.getDouble(0))
    assert(r.map(_.getDouble(0)).toSeq === again.toSeq)
    // rough uniformity: each decile of u gets 5-15% of 500 keys
    val deciles = r.map(x => (x.getDouble(0) * 10).toInt).groupBy(identity)
    assert(deciles.size === 10)
    assert(deciles.values.forall(g => g.length > 25 && g.length < 75))
  }

  test("dedup pair operators are empty-safe and single-row-safe") {
    import graft.operators.Dedup
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val one = Seq((1L, "just one document here")).toDF("doc_id", "text")
    for (df <- Seq(empty, one)) {
      assert(Dedup.minhashPairs(df, "doc_id", "text",
        persistIntermediates = false).count() === 0)
      assert(Dedup.simhashPairsBucketed(df, "doc_id", "text",
        maxHamming = 4).count() === 0)
      assert(Dedup.ngramJaccardPairs(df, "doc_id", "text",
        persistIntermediates = false).count() === 0)
    }
  }

  test("charWindows reconstructs any random text at any stride (seeded sweep)") {
    // windows must cover every character in order: concatenating each
    // window's NON-OVERLAPPED prefix (first `stride` chars) plus the last
    // window's tail rebuilds the input exactly
    val alphabet = "abcdefgh \n"
    for (_ <- 1 to 12) {
      val len = rnd.nextInt(60)
      val s = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val size = 1 + rnd.nextInt(12)
      val stride = 1 + rnd.nextInt(size)
      val ws = Seq(s).toDF("text")
        .select(explode(graft.functions.TextFunctions.charWindows(
          $"text", size, stride)).as("w"))
        .select($"w.idx", $"w.chunk")
        .as[(Long, String)].collect().sortBy(_._1)
      val rebuilt = ws.dropRight(1).map(_._2.take(stride)).mkString + ws.last._2
      assert(rebuilt === s, s"len=$len size=$size stride=$stride")
      // indices are dense from 0
      assert(ws.map(_._1).toSeq === ws.indices.map(_.toLong))
    }
  }

  test("saltedJoin equals the plain join on seeded random relations") {
    for (trial <- 1 to 3) {
      val big = (1 to 400).map(_ => (s"k${rnd.nextInt(12)}", rnd.nextInt(1000).toLong))
        .toDF("key", "v")
      val right = (0 until 15).map(i => (s"k$i", rnd.nextInt(100).toLong))
        .toDF("key", "w")
      val plain = big.join(right, "key").select("key", "v", "w")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(identity).toSeq
      val salted = graft.operators.Skew.saltedJoin(big, right, "key",
          saltSource = col("v"), salts = 1 + rnd.nextInt(7))
        .select("key", "v", "w")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(identity).toSeq
      assert(salted === plain, s"trial $trial")
    }
  }

  test("minhash similarity tracks jaccard on generated near-dups") {
    // pairs with controlled overlap: more shared words -> more equal minhashes
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val near = (0 until 40).map(i => if (i < 36) s"w$i" else s"x$i").mkString(" ")
    val far  = (0 until 40).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.minhashed(df, "doc_id", "text")
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count(p => p._1 == p._2)
    assert(agree(sigs(1L), sigs(2L)) > agree(sigs(1L), sigs(3L)))
  }

  test("bloom membership: no false negatives on seeded random key sets, any (bits, k)") {
    import graft.operators.Bloom
    (1 to 4).foreach { trial =>
      val bits = 64 << rnd.nextInt(6)            // 64..2048
      val k = 1 + rnd.nextInt(7)                 // 1..7
      val n = 1 + rnd.nextInt(300)
      val keys = (0 until n).map(_ => rnd.alphanumeric.take(3 + rnd.nextInt(12)).mkString)
      val df = keys.toDF("k")
      val bloom = Bloom.buildBitmap(df, "k", bits, k)
      val pass = df.where(Bloom.mightContain(bloom, col("k"), k)).count()
      assert(pass === keys.distinct.length.toLong || pass === n.toLong,
        s"trial $trial (bits=$bits k=$k n=$n): members failed membership")
      assert(df.distinct()
        .where(Bloom.mightContain(bloom, col("k"), k)).count()
        === keys.distinct.length.toLong,
        s"trial $trial: a member key tested negative — impossible for a bloom")
    }
  }

  test("hll merge is commutative, associative-shaped, and idempotent on random shards") {
    import graft.operators.Sketch
    val shards = (0 until 3).map { s =>
      (0 until 150).map(_ => ("g", s"v${rnd.nextInt(400)}-$s")).toDF("g", "v")
    }
    val regs = shards.map(df => Sketch.hllRegisters(df, "g", "v", p = 7))
    def collectRegs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val ab = collectRegs(Sketch.hllMerge(regs(0), regs(1), "g"))
    val ba = collectRegs(Sketch.hllMerge(regs(1), regs(0), "g"))
    assert(ab === ba) // commutative
    val abc1 = collectRegs(Sketch.hllMerge(
      Sketch.hllMerge(regs(0), regs(1), "g"), regs(2), "g"))
    val abc2 = collectRegs(Sketch.hllMerge(
      regs(0), Sketch.hllMerge(regs(1), regs(2), "g"), "g"))
    assert(abc1 === abc2) // associative
    val aa = collectRegs(Sketch.hllMerge(regs(0), regs(0), "g"))
    assert(aa === collectRegs(regs(0))) // idempotent
  }

  test("spaceSaving invariant holds for EVERY tracked item on a seeded random stream") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamSketch
    val dir = Files.createTempDirectory("graft-prop-ss-").toString
    // zipfish stream: item j with frequency ~ 1/(j+1)
    val rows = (0 until 2000).map { _ =>
      val j = math.min(39, (math.pow(rnd.nextDouble(), 2.0) * 40).toInt)
      s"""{"g":"g","v":"item$j"}"""
    }
    Files.write(java.nio.file.Paths.get(s"$dir/all.json"),
      rows.mkString("", "\n", "\n").getBytes)
    val truth = rows.groupBy(identity).map { case (r, rs) =>
      (r.split("\"")(7), rs.size.toLong) } // {"g":"g","v":"itemJ"} -> itemJ
    val out = StreamSketch.spaceSaving(
      spark.readStream.schema("g STRING, v STRING").json(dir),
      "g", "v", capacity = 12, emitK = 12)
    val q = out.writeStream.format("memory").queryName("prop_ss")
      .outputMode(StreamSketch.outputMode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-prop-ss-ckpt-").toString)
      .start()
    q.awaitTermination(60000)
    val tracked = spark.table("prop_ss").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(tracked.nonEmpty && tracked.length <= 12)
    tracked.foreach { case (item, cnt, err) =>
      val t = truth.getOrElse(item, 0L)
      assert(cnt >= t, s"$item: cnt $cnt below true $t (upper bound broken)")
      assert(cnt - err <= t, s"$item: cnt-err ${cnt - err} above true $t")
    }
    // the guaranteed-resident heavy hitter: freq > N/capacity
    val n = rows.size
    truth.filter(_._2 > n / 12).keys.foreach { heavy =>
      assert(tracked.exists(_._1 == heavy), s"$heavy exceeded N/capacity but is absent")
    }
  }

  test("trendExact: slope denominator is non-negative on any random data (Cauchy-Schwarz)") {
    val rows = (0 until 400).map { _ =>
      (s"g${rnd.nextInt(6)}", rnd.nextInt(1000).toLong,
        rnd.nextInt(2000000).toLong - 1000000L)
    }
    val got = graft.operators.Profile.trendExact(
        rows.toDF("g", "x", "y"), "g", "x", "y")
      .select(col("g"), col("slope_den").cast("long"))
      .as[(String, Long)].collect()
    got.foreach { case (g, den) =>
      assert(den >= 0L, s"group $g: n·Σx²−(Σx)² = $den < 0")
    }
    // and the driver-side recomputation agrees exactly, per group
    val byG = rows.groupBy(_._1)
    val gotFull = graft.operators.Profile.trendExact(
        rows.toDF("g", "x", "y"), "g", "x", "y")
      .select(col("g"), col("n"), col("slope_num").cast("long"),
        col("slope_den").cast("long"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    byG.foreach { case (g, rs) =>
      val n = rs.size.toLong
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxy = rs.map(r => r._2 * r._3).sum; val sxx = rs.map(r => r._2 * r._2).sum
      assert(gotFull(g) === ((g, n, n * sxy - sx * sy, n * sxx - sx * sx)))
    }
  }

  test("zipfCoverage: coverage is monotone in k and reaches 1.0 at full vocab") {
    val words = (0 until 30).map(i => s"w$i")
    val docs = (0 until 50).map { i =>
      (i.toLong, Seq.fill(20)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val ks = Seq(1L, 3L, 10L, 30L, 1000L)
    val got = graft.operators.Profile.zipfCoverage(docs, "text", ks)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._4 <= b._4, s"coverage not monotone: $a then $b")
    }
    assert(got.last._4 === 1.0)
    assert(got.forall(r => r._2 <= r._3)) // top mass never exceeds total
  }

  test("quality gates are monotone: loosening any threshold never drops a survivor") {
    val docs = (0 until 120).map { i =>
      val toks = Seq.fill(3 + rnd.nextInt(30))(
        Seq("the", "a", "uno", "verylongwordindeed", "x!", "ok")(rnd.nextInt(6)))
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    def passSet(minTok: Long, hiLen: Long, symPermille: Long, minStop: Long) =
      graft.operators.Quality.ruleFlags(docs, "text", minTok = minTok,
          hiLen = hiLen, symPermille = symPermille, minStop = minStop)
        .where(col("pass")).select("doc_id").as[Long].collect().toSet
    val strict = passSet(5L, 6L, 50L, 1L)
    val loose = passSet(2L, 12L, 300L, 0L)
    assert(strict.subsetOf(loose),
      s"loosening lost survivors: ${strict -- loose}")
  }

  test("kmv intersect estimate is exact when both samples cover their sets") {
    // tiny sets (< k): the sample IS the set, theta = max hash of the
    // smaller-max group, and every common value below theta is counted —
    // for nested sets A ⊂ B the estimate denominator-cancels to truth
    // only statistically; what IS exact: n_common counts true common
    // hashes below theta, never more than min(|A|, |B|)
    val a = (0L until 40L).map(("A", _))
    val b = (20L until 60L).map(("B", _))
    val s = graft.operators.Sketch.kmvSample(
      (a ++ b).toDF("g", "k"), "g", "k", k = 256)
    val r = graft.operators.Sketch.kmvIntersect(s, "g")
      .as[(String, String, Long, Long, Double)].collect().head
    assert(r._4 <= 40L) // bounded by the smaller set
    assert(r._4 >= 1L)  // the 20-key overlap must surface below theta
    assert(r._5 >= 0.0)
  }

  test("keep-first span dedup: content preserved exactly once on random corpora") {
    import graft.functions.TextFunctions._
    import graft.operators.Dedup
    val vocab = Vector("aa", "bb", "cc", "dd")
    for (trial <- 1 to 3) {
      val docs = (0 until 20).map { id =>
        (id.toLong, (0 until 2 + rnd.nextInt(9))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val cleaned = Dedup.chunkDedupKeepFirst(docs, "doc_id", "text", k = 2)
      val survivors = cleaned.where(col("clean_text") =!= "")
        .select(explode(chunksOfTokens(wsTokens(col("clean_text")), 2)).as("c"))
        .groupBy("c").count().collect()
      val want = docs
        .select(explode(chunksOfTokens(wsTokens(col("text")), 2)).as("c"))
        .distinct().count()
      assert(survivors.length.toLong == want, s"trial $trial")
      survivors.foreach(r => assert(r.getLong(1) == 1L, s"trial $trial: $r"))
    }
  }

  test("funnel counts are non-increasing down the funnel on random streams") {
    import graft.operators.Temporal
    val types = Vector("A", "B", "C", "D")
    val ev = (0 until 400).map { i =>
      (rnd.nextInt(30).toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(1000).toLong)
    }.toDF("user_id", "event_type", "ts")
    val got = Temporal.funnel(ev, "user_id", "event_type", "ts",
        Seq("A", "B", "C", "D"))
      .orderBy("step").select("users").as[Long].collect().toSeq
    assert(got.size == 4)
    got.sliding(2).foreach(p =>
      assert(p.head >= p.last, s"funnel must shrink: $got"))
  }

  test("funnelExists is monotone in the window: wider maxGap never loses users") {
    import graft.operators.Temporal
    val types = Vector("A", "B", "C")
    val ev = (0 until 300).map { _ =>
      (rnd.nextInt(25).toLong, types(rnd.nextInt(3)), rnd.nextInt(500).toLong)
    }.toDF("user_id", "event_type", "ts")
    val counts = Seq(20L, 60L, 200L).map { g =>
      Temporal.funnelExists(ev, "user_id", "event_type", "ts",
          Seq("A", "B", "C"), maxGap = g)
        .orderBy("step").select("users").as[Long].collect().toSeq
    }
    counts.sliding(2).foreach { case Seq(narrow, wide) =>
      narrow.zip(wide).foreach { case (n, w) =>
        assert(w >= n, s"widening the window lost users: $counts")
      }
    }
  }

  test("temperature quotas: sum <= total, every nonempty group sampled deterministically") {
    import graft.operators.Sampling
    val df = (0 until 500).map { i =>
      (s"g${rnd.nextInt(6)}", i.toLong)
    }.toDF("g", "id")
    val a = Sampling.temperatureAllocation(df, "g", total = 50L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a.values.sum <= 50L)
    val sampled = Sampling.temperatureSample(df, "g", "id", 50L, salt = "p:")
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { case (g, q) =>
      assert(sampled.getOrElse(g, 0L) == q, s"group $g quota $q vs $sampled")
    }
  }

  test("DSIR weights are bounded by the extreme bucket scores") {
    import graft.operators.Dsir
    val docs = (0 until 30).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(12))
        .map(_ => s"w${rnd.nextInt(40)}").mkString(" "),
        if (rnd.nextBoolean()) "t" else "n")
    }.toDF("doc_id", "text", "kind")
    val table = Dsir.bucketScoreTable(docs, "text", col("kind") === "t",
      buckets = 128, scale = 10000L)
    val scores = Dsir.collectScores(table, 128, 10000L)
    val (lo, hi) = (scores.min, scores.max)
    Dsir.importanceWeights(docs, "doc_id", "text", scores)
      .collect().foreach { r =>
        val (n, mean) = (r.getLong(1), r.getLong(3))
        assert(n >= 1L)
        assert(mean >= lo - 1 && mean <= hi, s"mean $mean outside [$lo, $hi]")
      }
  }

  test("dupSpanScrub: partition invariance + token conservation on a seeded corpus") {
    import spark.implicits._
    import graft.operators.Dedup
    val rnd = new scala.util.Random(99)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (0L until 40L).map { id =>
      (id, Vector.fill(5 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    def run(parts: Int) = Dedup.dupSpanScrub(
        docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
        n = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    val one = run(1)
    assert(one === run(7), "result must not depend on partitioning")
    // conservation: clean token count == n_tokens - removed, spans bounded
    one.foreach { case (id, nTok, nSpans, removed, clean) =>
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(kept === (nTok - removed), s"doc $id: $kept != $nTok-$removed")
      assert(nSpans <= removed && removed <= nTok, s"doc $id bounds")
    }
    // the FIRST occurrence of every duplicated window survives somewhere:
    // total kept tokens > 0 on a corpus this small over a 6-word vocab
    assert(one.map(t => t._2 - t._4).sum > 0)
  }
}
