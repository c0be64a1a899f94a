package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Knn
import graft.store.VectorStore

class VectorStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-store-").toString

  private def rec(key: String, v: Array[Float], ts: Long, tag: String = "t") =
    (key, v, Map("tag" -> tag), ts)

  private def batch(rows: (String, Array[Float], Map[String, String], Long)*) =
    rows.toDF("key", "vector", "metadata", "ts")

  test("put then get round-trips; dim validation rejects bad rows") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    val (ok, rejected) = store.put(batch(
      rec("a", Array(1f, 2f), 10),
      rec("bad", Array(1f), 20))) // wrong dim
    assert(ok === 1 && rejected === 1)
    val got = store.get("a").collect()
    assert(got.length === 1)
    assert(got.head.getAs[Seq[Double]]("vector") === Seq(1.0, 2.0))
    assert(store.get("bad").count() === 0)
  }

  test("last writer wins on key overwrite (R1)") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(rec("k", Array(1f, 1f), 10)))
    store.put(batch(rec("k", Array(9f, 9f), 20)))
    val got = store.scan.collect()
    assert(got.length === 1)
    assert(got.head.getAs[Seq[Double]]("vector") === Seq(9.0, 9.0))
  }

  test("delete tombstones a key; error-free re-put revives it (R2)") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(rec("k", Array(1f, 1f), 10), rec("m", Array(2f, 2f), 10)))
    store.delete(Seq("k"), ts = 20)
    assert(store.scan.select("key").collect().map(_.getString(0)).toSeq === Seq("m"))
    store.put(batch(rec("k", Array(3f, 3f), 30)))
    assert(store.scan.count() === 2)
  }

  test("compaction snapshot + incremental replay == full replay (S6≡S7)") {
    val dir = tmpDir()
    val store = new VectorStore(spark, dir, dim = 2)
    store.put(batch(rec("a", Array(1f, 1f), 10), rec("b", Array(2f, 2f), 10)))
    store.delete(Seq("a"), ts = 20)
    store.compact() // snapshot covers everything so far
    store.put(batch(rec("c", Array(3f, 3f), 30), rec("b", Array(4f, 4f), 40)))
    val got = store.scan.orderBy("key").collect()
      .map(r => (r.getString(0), r.getAs[Seq[Double]]("vector")))
    assert(got === Array(("b", Seq(4.0, 4.0)), ("c", Seq(3.0, 3.0))))
    // fresh store object over the same dir recovers identically
    val store2 = new VectorStore(spark, dir, dim = 2)
    assert(store2.scan.orderBy("key").collect()
      .map(r => (r.getString(0), r.getAs[Seq[Double]]("vector"))) === got)
  }

  test("corrupt WAL lines are skipped, valid ops survive (PERMISSIVE)") {
    val dir = tmpDir()
    val store = new VectorStore(spark, dir, dim = 2)
    store.put(batch(rec("a", Array(1f, 1f), 10)))
    // a torn/corrupt WAL file inside its own batch partition dir: one
    // valid op line, one garbage line (a separate file — appending to a
    // Spark-written one would only trip the Hadoop CRC checksum, a
    // different failure than corrupt JSON)
    val valid = """{"op_type":"PUT","key":"b","vector":[2.0,2.0],""" +
      s""""metadata":{},"timestamp":15,"node_id":"n1"}"""
    val tornDir = Paths.get(s"$dir/wal/batch_seq=${Long.MaxValue - 1}")
    Files.createDirectories(tornDir)
    Files.write(tornDir.resolve("torn-manual.json"),
      (valid + "\n{this is not json\n").getBytes)
    assert(store.scan.count() === 2) // a + b survive, garbage skipped
  }

  test("compact() is idempotent; snapshot remembers tombstones (no resurrection)") {
    val dir = tmpDir()
    val store = new VectorStore(spark, dir, dim = 2)
    store.put(batch(rec("k", Array(1f, 1f), 100)))
    store.delete(Seq("k"), ts = 200)
    store.compact()
    store.compact() // second call with no new ops must be a clean no-op
    assert(store.scan.count() === 0)
    // a late backfill PUT with an OLDER event time must stay dead: the
    // snapshot keeps the ts=200 tombstone even though wal_pos passed it
    store.put(batch(rec("k", Array(9f, 9f), 150)))
    assert(store.scan.count() === 0, "older-ts backfill resurrected a deleted key")
    // and a genuinely newer PUT revives it
    store.put(batch(rec("k", Array(5f, 5f), 300)))
    assert(store.scan.collect().map(_.getString(0)).toSeq === Seq("k"))
  }

  test("same-batch equal-ts duplicate keys resolve deterministically") {
    def winner(): Seq[Double] = {
      val store = new VectorStore(spark, tmpDir(), dim = 2)
      store.put(batch(
        rec("k", Array(1f, 0f), 100),
        rec("k", Array(0f, 1f), 100))) // same key, same ts, same batch
      store.scan.select("vector").head().getSeq[Double](0).toList
    }
    assert(winner() === winner()) // content-hash tie-break, not partition luck
  }

  test("incremental replay prunes WAL partitions (S8 file-level pruning)") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(rec("a", Array(1f, 1f), 10)))
    store.put(batch(rec("b", Array(2f, 2f), 20)))
    store.compact()
    store.put(batch(rec("c", Array(3f, 3f), 30)))
    val delta = store.walOps()
    // only the post-checkpoint batch survives...
    assert(delta.select("key").collect().map(_.getString(0)).toSeq === Seq("c"))
    // ...and it does so via partition pruning, not a row filter
    val plan = delta.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("batch_seq"),
      s"expected batch_seq partition pruning in:\n$plan")
  }

  test("search over the live store honors filter + threshold") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(
      rec("near", Array(0f, 1f), 10, tag = "keep"),
      rec("far", Array(9f, 9f), 10, tag = "keep"),
      rec("other", Array(0f, 0.5f), 10, tag = "drop")))
    val got = store.search(Knn.SearchRequest(Array(0.0, 0.0), topK = 5,
      filter = Map("tag" -> "keep"), threshold = Some(5.0)))
      .collect().map(_.getString(0))
    assert(got === Array("near"))
  }

  test("appendToIvfIndex: inserts served without rebuild; LWW + soft-delete") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(
      rec("near", Array(0f, 1f), 10),
      rec("mid", Array(0f, 3f), 10),
      rec("far", Array(9f, 9f), 10),
      rec("stale", Array(0f, 2f), 10),
      rec("gone", Array(0f, 4f), 10)))
    store.buildIvfIndex(k = 2)
    // live inserts after the build: a NEW key + an UPDATE that moves an
    // existing key right next to the query
    store.put(batch(
      rec("fresh", Array(0f, 0.5f), 20),
      rec("stale", Array(0f, 0.25f), 20)))
    store.appendToIvfIndex(batch(
      rec("fresh", Array(0f, 0.5f), 20),
      rec("stale", Array(0f, 0.25f), 20)).select(
        col("key"), col("vector").cast("array<double>").as("vector"),
        col("metadata"), col("ts")))
    // and a delete the index has not seen (soft-delete discipline)
    store.delete(Seq("gone"), ts = 30)
    val got = store.searchIvf(
        Knn.SearchRequest(Array(0.0, 0.0), topK = 4), nprobe = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // fresh served; stale served at its NEW position (0.0625, not the
    // old 4.0); gone absent despite its index row
    assert(got.map(_._1).toSeq === Seq("stale", "fresh", "near", "mid"),
      got.mkString(","))
    assert(math.abs(got.head._2 - 0.0625) < 1e-12)
    assert(!got.map(_._1).contains("gone"))
  }

  test("searchIvf never serves a stale version: re-put into an UNPROBED cell") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(
      rec("n1", Array(0f, 1f), 10),
      rec("n2", Array(0f, 2f), 10),
      rec("mover", Array(0f, 1.5f), 10),
      rec("f1", Array(9f, 9f), 10),
      rec("f2", Array(9f, 8f), 10)))
    store.buildIvfIndex(k = 2)
    // mover relocates to the FAR cluster; the append indexes the new
    // version into the far cell, leaving the old near-cell row in place
    store.put(batch(rec("mover", Array(9f, 8.5f), 20)))
    store.appendToIvfIndex(batch(rec("mover", Array(9f, 8.5f), 20)).select(
      col("key"), col("vector").cast("array<double>").as("vector"),
      col("metadata"), col("ts")))
    // probe ONLY the near cell: mover's old row is the newest INDEXED row
    // there, but it is not the live version — it must be an honest miss,
    // never a stale (0, 1.5) serve
    val near = store.searchIvf(
        Knn.SearchRequest(Array(0.0, 0.0), topK = 5), nprobe = 1)
      .collect().map(_.getString(0))
    assert(near.toSeq === Seq("n1", "n2"), near.mkString(","))
    // probing both cells serves mover at its NEW position/score
    val both = store.searchIvf(
        Knn.SearchRequest(Array(0.0, 0.0), topK = 5), nprobe = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val mover = both.find(_._1 == "mover")
    assert(mover.isDefined, both.mkString(","))
    assert(math.abs(mover.get._2 - (81.0 + 72.25)) < 1e-9, mover.toString)
  }

  test("IVF write path fails loudly when a vector gets no cell (null cid)") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(rec("a", Array(0f, 1f), 10), rec("b", Array(5f, 5f), 10)))
    store.buildIvfIndex(k = 2)
    // a dim-mismatched record can reach appendToIvfIndex directly (no put
    // validation on this path): it must ERROR at index write, not vanish
    val bad = Seq(("ghost", Array(1.0, 2.0, 3.0),
      Map.empty[String, String], 20L)).toDF("key", "vector", "metadata", "ts")
    val e = intercept[Throwable] { store.appendToIvfIndex(bad) }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("got no cell"), messages(e))
  }

  test("searchNswLive honors the full request; exhaustive beam equals exact") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(
      rec("near", Array(0f, 1f), 10, tag = "keep"),
      rec("mid", Array(0f, 3f), 10, tag = "keep"),
      rec("far", Array(9f, 9f), 10, tag = "keep"),
      rec("dropme", Array(0f, 0.5f), 10, tag = "drop")))
    // beam >= table size -> exact; filter pre-rank, threshold post-rank
    val req = Knn.SearchRequest(Array(0.0, 0.0), topK = 3,
      filter = Map("tag" -> "keep"), threshold = Some(10.0))
    val got = store.searchNswLive(req, efSearch = 1 << 20)
      .collect().map(_.getString(0))
    assert(got === Array("near", "mid"))
    // same rows and scores as the exact tier at the degenerate setting
    val exact = store.search(req).collect().map(r => (r.getString(0), r.getDouble(1)))
    val nsw = store.searchNswLive(req, efSearch = 1 << 20)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(nsw.toSeq === exact.toSeq)
  }

  test("NSW artifact serves bit-identical to the live build (approx + exact)") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    // 16 keys over 4 partitions: partitions larger than the approx beam
    val rows = (0 until 16).map { i =>
      rec(f"k$i%02d", Array(i.toFloat, (i % 5).toFloat), 10,
        tag = if (i % 2 == 0) "even" else "odd")
    }
    store.put(batch(rows: _*))
    store.buildNswIndex(m = 4, efConstruction = 16, numPartitions = 4)
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val req = Knn.SearchRequest(Array(3.0, 2.0), topK = 3)
    // same partitioning, same insertion order -> same graphs -> the
    // served beam must equal the live build's beam EXACTLY, approximate
    // (ef = 3 < partition size) and exhaustive alike
    Seq(3, 1 << 20).foreach { ef =>
      assert(collectPairs(store.searchNsw(req, efSearch = ef)) ===
        collectPairs(store.searchNswLive(req, m = 4, efConstruction = 16,
          efSearch = ef, numPartitions = 4)), s"ef=$ef")
    }
    // filtered + threshold at the exactness invariant: beam-internal
    // filtering is exhaustive-over-allowed, so all three tiers agree
    val freq = Knn.SearchRequest(Array(3.0, 2.0), topK = 4,
      filter = Map("tag" -> "odd"), threshold = Some(50.0))
    val served = collectPairs(store.searchNsw(freq, efSearch = 1 << 20))
    assert(served === collectPairs(store.searchNswLive(freq,
      efSearch = 1 << 20)))
    assert(served === collectPairs(store.search(freq)))
  }

  test("scanAsOf: time travel to any append point, across compaction and reopen") {
    val dir = tmpDir()
    val store = new VectorStore(spark, dir, dim = 2)
    store.put(batch(rec("a", Array(1f, 0f), 10), rec("b", Array(0f, 1f), 10)))
    val s1 = store.currentSeq
    store.put(batch(rec("a", Array(9f, 9f), 20))) // overwrite a
    val s2 = store.currentSeq
    store.delete(Seq("b"), ts = 30)
    val s3 = store.currentSeq
    store.compact()
    store.put(batch(rec("c", Array(5f, 5f), 40)))
    val s4 = store.currentSeq
    def view(s: Long) = store.scanAsOf(s).collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).head)).toMap
    assert(view(s1) === Map("a" -> 1.0, "b" -> 0.0))
    assert(view(s2) === Map("a" -> 9.0, "b" -> 0.0))
    assert(view(s3) === Map("a" -> 9.0))
    assert(view(s4) === Map("a" -> 9.0, "c" -> 5.0))
    // the present as-of equals the live scan
    assert(store.scanAsOf(store.currentSeq).collect().map(_.getString(0)).toSet
      === store.scan.collect().map(_.getString(0)).toSet)
    // history is a pure function of the files: a cold reopen agrees,
    // including for seqs OLDER than the snapshot position (WAL replay)
    val re = new VectorStore(spark, dir, dim = 2)
    assert(re.scanAsOf(s2).collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).head)).toMap
      === Map("a" -> 9.0, "b" -> 0.0))
  }

  test("diff: added/deleted/updated classification; unchanged keys silent") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(
      rec("upd", Array(1f, 0f), 10), rec("del", Array(0f, 1f), 10),
      rec("same", Array(2f, 2f), 10)))
    val sA = store.currentSeq
    store.put(batch(rec("upd", Array(9f, 9f), 20), rec("new", Array(3f, 3f), 20)))
    store.delete(Seq("del"), ts = 30)
    val got = store.diff(sA, store.currentSeq).collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(got === Map(
      "new" -> (("added", None, Some(20L))),
      "del" -> (("deleted", Some(10L), None)),
      "upd" -> (("updated", Some(10L), Some(20L)))))
    // 'same' never appears — the diff is a delta, not a join dump
    assert(!got.contains("same"))
    // diff at identical positions is empty
    assert(store.diff(store.currentSeq, store.currentSeq).count() === 0)
    // an OLDER tombstone does not delete a newer put (event-time LWW
    // carries into the diff): put wins, key shows as updated not deleted
    store.put(batch(rec("upd", Array(7f, 7f), 50)))
    store.delete(Seq("upd"), ts = 40) // late tombstone, older event time
    val d2 = store.diff(sA, store.currentSeq).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(d2("upd") === "updated")
  }

  test("NSW fresh-index fast path: shuffle-free plan, parity with the full discipline") {
    val dir = tmpDir()
    val store = new VectorStore(spark, dir, dim = 2)
    store.put(batch((0 until 12).map(i =>
      rec(f"k$i%02d", Array(i.toFloat, (i % 3).toFloat), 10)): _*))
    store.buildNswIndex(m = 4, efConstruction = 16, numPartitions = 4)
    val req = Knn.SearchRequest(Array(2.0, 1.0), topK = 3)
    // fresh build: the newest-version window and liveness semi-join are
    // provably no-ops — the plan must not contain either shuffle
    val freshPlan = store.searchNsw(req, efSearch = 1 << 20)
      .queryExecution.executedPlan.toString
    assert(!freshPlan.contains("Window") && !freshPlan.contains("Join"),
      freshPlan)
    val fresh = store.searchNsw(req, efSearch = 1 << 20)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // cold reopen: same on-disk state, but freshness is driver state →
    // conservative full-discipline path; results must be bit-identical
    val reopened = new VectorStore(spark, dir, dim = 2)
    val slowPlan = reopened.searchNsw(req, efSearch = 1 << 20)
      .queryExecution.executedPlan.toString
    assert(slowPlan.contains("Window") && slowPlan.contains("Join"), slowPlan)
    assert(reopened.searchNsw(req, efSearch = 1 << 20)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq === fresh)
    // any store write invalidates the fast path (a re-put key's stale
    // indexed version must fail liveness, which needs the semi-join)
    store.put(batch(rec("k00", Array(9f, 9f), 20)))
    val afterWrite = store.searchNsw(req, efSearch = 1 << 20)
      .queryExecution.executedPlan.toString
    assert(afterWrite.contains("Join"), afterWrite)
  }

  test("NSW artifact append: LWW + soft-delete discipline, routing stable") {
    val dir = tmpDir()
    val store = new VectorStore(spark, dir, dim = 2)
    store.put(batch(
      rec("a", Array(0f, 1f), 10), rec("b", Array(0f, 2f), 10),
      rec("c", Array(5f, 5f), 10), rec("d", Array(7f, 7f), 10)))
    store.buildNswIndex(m = 4, efConstruction = 16, numPartitions = 4)
    // 1) new key via append becomes searchable without a rebuild
    val add = batch(rec("e", Array(0f, 0.5f), 20))
    store.put(add); store.appendToNswIndex(add)
    val req = Knn.SearchRequest(Array(0.0, 0.0), topK = 3)
    val got1 = store.searchNsw(req, efSearch = 1 << 20)
      .collect().map(_.getString(0)).toSeq
    assert(got1 === Seq("e", "a", "b"))
    // 2) re-put + append: BOTH versions are indexed; the newer ts must
    //    win (LWW over index rows), never the stale-but-closer one
    val reput = batch(rec("a", Array(9f, 9f), 30))
    store.put(reput); store.appendToNswIndex(reput)
    val got2 = store.searchNsw(req, efSearch = 1 << 20)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got2 === Seq(("e", 0.25), ("b", 4.0), ("c", 50.0)))
    // 3) re-put WITHOUT append: the stale indexed version fails (key, ts)
    //    liveness — honest miss, never a stale score
    store.put(batch(rec("b", Array(0f, 0.1f), 40)))
    val got3 = store.searchNsw(req, efSearch = 1 << 20)
      .collect().map(_.getString(0)).toSeq
    assert(!got3.contains("b"), got3.toString)
    // 4) deleted key drops out of the served index
    store.delete(Seq("e"), ts = 50)
    val got4 = store.searchNsw(req, efSearch = 1 << 20)
      .collect().map(_.getString(0)).toSeq
    assert(!got4.contains("e") && !got4.contains("b"), got4.toString)
    // 5) appended rows landed in the SAME partition the build would use
    val placed = spark.read.parquet(s"$dir/nsw_index")
      .select(col("pid").cast("int"),
        pmod(hash(col("key")), lit(4)).cast("int").as("want"))
      .where(col("pid") =!= col("want"))
    assert(placed.isEmpty, "append routed a key off its build partition")
  }

  test("tombstone GC: horizon drops old tombstones; retained ones still block late puts") {
    val dir = tmpDir()
    val store = new VectorStore(spark, dir, dim = 2)
    store.put(batch(rec("gone", Array(1f, 1f), 10), rec("kept", Array(2f, 2f), 10)))
    store.delete(Seq("gone"), ts = 20)
    store.delete(Seq("kept"), ts = 90)
    // horizon 50: the ts=20 tombstone is GC'd, the ts=90 one survives
    store.compact(gcTombstonesBefore = Some(50L))
    val snap = spark.read.parquet(s"$dir/snapshot_${new String(
      java.nio.file.Files.readAllBytes(Paths.get(s"$dir/wal_pos.txt"))).trim}")
    val tombs = snap.where(col("op_type") === "DELETE")
      .select("key").collect().map(_.getString(0)).toSeq
    assert(tombs === Seq("kept"))
    // the retained tombstone still wins over a late put with older ts
    store.put(batch(rec("kept", Array(3f, 3f), 80)))
    assert(store.scan.count() === 0)
    // watermark trade, locked in: a put OLDER than the GC horizon for a
    // GC'd key resurrects it — the caller's no-older-writes assertion
    store.put(batch(rec("gone", Array(4f, 4f), 15)))
    assert(store.scan.select("key").collect().map(_.getString(0)).toSeq === Seq("gone"))
  }

  test("PQ index artifact: ADC candidates re-ranked exactly, full request honored") {
    val store = new VectorStore(spark, tmpDir(), dim = 4)
    store.put(batch(
      ("q", Array(0f, 0f, 0f, 0f), Map("tag" -> "keep"), 10L),
      ("near", Array(0.1f, 0f, 0f, 0f), Map("tag" -> "keep"), 10L),
      ("mid", Array(1f, 1f, 0f, 0f), Map("tag" -> "keep"), 10L),
      ("far", Array(5f, 5f, 5f, 5f), Map("tag" -> "keep"), 10L),
      ("dropme", Array(0.2f, 0f, 0f, 0f), Map("tag" -> "drop"), 10L)))
    store.buildPqIndex(numSub = 2, numWords = 4)
    // rerankFrom >= corpus size -> exact results; filter/threshold honored
    val got = store.searchPq(Knn.SearchRequest(Array(0.0, 0.0, 0.0, 0.0),
        topK = 3, filter = Map("tag" -> "keep"), threshold = Some(10.0)),
      rerankFrom = 10)
      .collect().map(_.getString(0))
    assert(got === Array("q", "near", "mid"))
    // filter must apply PRE-rank: with a candidate budget of 2, the
    // filtered-out 'dropme' (2nd-nearest overall) must not consume a
    // slot — 'near' still surfaces
    val tight = store.searchPq(Knn.SearchRequest(Array(0.0, 0.0, 0.0, 0.0),
        topK = 2, filter = Map("tag" -> "keep")), rerankFrom = 2)
      .collect().map(_.getString(0))
    assert(tight === Array("q", "near"))
  }

  test("PQ search after deletes: stale codes don't consume the candidate budget") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(
      ("q", Array(0f, 0f), Map.empty[String, String], 10L),
      ("dead1", Array(0.1f, 0f), Map.empty[String, String], 10L),
      ("dead2", Array(0.2f, 0f), Map.empty[String, String], 10L),
      ("live", Array(1f, 0f), Map.empty[String, String], 10L)))
    store.buildPqIndex(numSub = 2, numWords = 4)
    store.delete(Seq("dead1", "dead2"), ts = 20) // index NOT rebuilt
    // budget 2 with no filter: the two nearest stale codes must not eat
    // both slots and shrink the result below topK — live keys surface
    val got = store.searchPq(Knn.SearchRequest(Array(0.0, 0.0), topK = 2),
      rerankFrom = 2).collect().map(_.getString(0))
    assert(got === Array("q", "live"))
  }

  test("WAL GC drops covered partitions only; state and cold reopen unchanged") {
    val dir = tmpDir()
    val store = new VectorStore(spark, dir, dim = 2)
    store.put(batch(rec("a", Array(1f, 1f), 10), rec("b", Array(2f, 2f), 10)))
    store.delete(Seq("b"), ts = 20)
    store.compact()
    store.put(batch(rec("c", Array(3f, 3f), 30))) // NOT covered by snapshot
    val before = store.scan.orderBy("key").collect().map(_.getString(0)).toSeq

    def parts() = Files.list(Paths.get(s"$dir/wal")).toArray.map(_.toString)
      .filter(_.split('/').last.startsWith("batch_seq="))
    store.gcWal() // drop everything the snapshot covers
    assert(parts().length === 1,
      s"un-snapshotted partition must survive: ${parts().toSeq}")

    assert(store.scan.orderBy("key").collect().map(_.getString(0)).toSeq === before)
    // cold reopen replays snapshot + surviving WAL to the same state
    val reopened = new VectorStore(spark, dir, dim = 2)
    assert(reopened.scan.orderBy("key").collect().map(_.getString(0)).toSeq === before)
    // an explicit keepAfter beyond the snapshot pos must be clamped:
    // the c partition is newer than the snapshot and must never be GCed
    store.gcWal(keepAfter = Long.MaxValue)
    assert(parts().length === 1)
  }

  test("garbled wal_pos falls back to full replay, losing nothing") {
    val dir = tmpDir()
    val store = new VectorStore(spark, dir, dim = 2)
    store.put(batch(rec("a", Array(1f, 1f), 10)))
    store.compact()
    store.put(batch(rec("b", Array(2f, 2f), 20)))
    // simulate a crash that tore the pointer file mid-write
    Files.write(Paths.get(s"$dir/wal_pos.txt"), Array.emptyByteArray)
    val reopened = new VectorStore(spark, dir, dim = 2)
    assert(reopened.scan.select("key").orderBy("key")
      .collect().map(_.getString(0)).toSeq === Seq("a", "b"))
  }

  test("IVF index artifact: built over the live table, served with the full request") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(
      rec("near", Array(0f, 1f), 10, tag = "keep"),
      rec("mid", Array(0f, 3f), 10, tag = "keep"),
      rec("far", Array(9f, 9f), 10, tag = "keep"),
      rec("dropme", Array(0f, 0.5f), 10, tag = "drop")))
    store.buildIvfIndex(k = 2)
    // probing every cell == exact search, so the exact ordering must hold
    val got = store.searchIvf(Knn.SearchRequest(Array(0.0, 0.0), topK = 3,
        filter = Map("tag" -> "keep"), threshold = Some(10.0)), nprobe = 2)
      .collect().map(_.getString(0))
    assert(got === Array("near", "mid"))
    // a single-cell probe must hit the cid-partitioned layout as a
    // PARTITION filter (directory pruning), not a row filter over a scan
    val probe1 = store.searchIvf(Knn.SearchRequest(Array(0.0, 0.0), topK = 3),
      nprobe = 1)
    val plan = probe1.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^]]*cid".r.findFirstIn(plan).isDefined,
      plan.take(2000))
    assert(probe1.collect().nonEmpty)
  }

  test("compactIfNeeded: op-count and tombstone-ratio triggers, no-op otherwise") {
    val dir = tmpDir()
    val store = new VectorStore(spark, dir, dim = 2)
    store.put(batch(rec("a", Array(1f, 1f), 10), rec("b", Array(2f, 2f), 10)))
    // below both thresholds → no compaction
    assert(!store.compactIfNeeded(minWalOps = 100, tombstoneRatio = 0.9))
    assert(!Files.exists(Paths.get(s"$dir/snapshot_${store.currentSeq}")))
    // op-count trigger
    assert(store.compactIfNeeded(minWalOps = 2, tombstoneRatio = 0.9))
    val posAfter = store.currentSeq
    assert(Files.exists(Paths.get(s"$dir/snapshot_$posAfter")))
    // nothing new → not due again
    assert(!store.compactIfNeeded(minWalOps = 1, tombstoneRatio = 0.9))
    // tombstone-ratio trigger: delete 1 of 2 keys → ratio 1/3 of winners
    store.delete(Seq("a"), ts = 20)
    assert(store.compactIfNeeded(minWalOps = 1000, tombstoneRatio = 0.3))
    // state unchanged by compaction
    assert(store.scan.select("key").collect().map(_.getString(0)).toSeq === Seq("b"))
  }

  test("BQ index artifact: full-overfetch equals exact; request surface honored") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(
      rec("near", Array(0.5f, 1f), 10, tag = "keep"),
      rec("mid", Array(0.5f, 3f), 10, tag = "keep"),
      rec("far", Array(9f, 9f), 10, tag = "keep"),
      rec("dropme", Array(0.5f, 0.6f), 10, tag = "drop")))
    store.buildBqIndex()
    // rerankFrom covering the corpus → exact ordering must hold
    val req = Knn.SearchRequest(Array(0.5, 0.0), topK = 3,
      filter = Map("tag" -> "keep"), threshold = Some(20.0))
    val got = store.searchBq(req, rerankFrom = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val exact = store.search(req)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got === exact)
    // far (score 153.25) exceeds the threshold; dropme is filtered out
    assert(got.map(_._1) === Array("near", "mid"))
    // dim-mismatched query fails loudly
    val e = intercept[IllegalArgumentException] {
      store.searchBq(Knn.SearchRequest(Array(1.0), topK = 1))
    }
    assert(e.getMessage.contains("dim"))
  }

  test("BQ append + LWW + soft-delete: stale packed rows never served") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(rec("a", Array(1f, 0f), 10), rec("b", Array(0f, 1f), 10)))
    store.buildBqIndex()
    // re-put a with a new vector, append the batch to the index
    store.put(batch(rec("a", Array(-5f, -5f), 20)))
    store.appendToBqIndex(batch(rec("a", Array(-5f, -5f), 20)))
    // delete b entirely (index still holds its packed row)
    store.delete(Seq("b"), ts = 30)
    val got = store.searchBq(Knn.SearchRequest(Array(0.0, 0.0), topK = 5),
        rerankFrom = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // only live `a`, scored from its NEW vector (50.0), b gone
    assert(got === Array(("a", 50.0)))
  }

  test("artifact manifest: one verifyFresh catches a stale tier; searches " +
      "fail loud before any tier is built; external tiers register") {
    val dir = tmpDir()
    val store = new VectorStore(spark, dir, dim = 2)
    store.put(batch(rec("a", Array(1f, 0f), 10), rec("b", Array(0f, 1f), 10)))
    // serving before any build: ONE uniform check, not a tier-specific
    // file-not-found deep in a reader
    val q = Knn.SearchRequest(Array(0.0, 0.0), topK = 5)
    Seq(() => store.searchBq(q), () => store.searchIvf(q),
        () => store.searchPq(q), () => store.searchNsw(q)).foreach { f =>
      val ex = intercept[IllegalArgumentException](f())
      assert(ex.getMessage.contains("artifact"), ex.getMessage)
    }
    intercept[IllegalArgumentException](store.verifyFresh()) // nothing registered
    // build two tiers: both cover the current seq
    store.buildBqIndex()
    store.buildIvfIndex(k = 2)
    assert(store.artifactManifest.keySet === Set("bq", "ivf"))
    store.verifyFresh() // all registered tiers fresh
    store.verifyFresh(tiers = Seq("bq")) // named-tier form
    // a new write makes BOTH stale — the single check names them
    store.put(batch(rec("c", Array(1f, 1f), 20)))
    val stale = intercept[IllegalArgumentException](store.verifyFresh())
    assert(stale.getMessage.contains("stale") &&
      stale.getMessage.contains("bq") && stale.getMessage.contains("ivf"),
      stale.getMessage)
    // an append WITHOUT a coverage claim serves the new rows but never
    // advances freshness — the store can't verify what the frame covered
    store.appendToBqIndex(batch(rec("c", Array(1f, 1f), 20)))
    val afterAppend = intercept[IllegalArgumentException](
      store.verifyFresh(tiers = Seq("bq")))
    assert(afterAppend.getMessage.contains("stale"), afterAppend.getMessage)
    // WAL-verified catch-up: indexPending reads the uncovered WAL window
    // itself, so its freshness claim is sound by construction (the re-
    // appended duplicate collapses under the serve-time (key, ts) LWW)
    assert(store.indexPending("bq") === 1L)
    store.verifyFresh(tiers = Seq("bq"))
    val got = store.searchBq(Knn.SearchRequest(Array(1.0, 1.0), topK = 1))
      .collect()
    assert(got.head.getString(0) === "c")
    val still = intercept[IllegalArgumentException](
      store.verifyFresh(tiers = Seq("ivf")))
    assert(still.getMessage.contains("ivf"), still.getMessage)
    // an append WITH an explicit claim advances (the put-then-append
    // loop's contract — the caller asserts the batch covers the tip)
    store.put(batch(rec("d", Array(2f, 2f), 30)))
    store.appendToBqIndex(batch(rec("d", Array(2f, 2f), 30)),
      coversSeq = Some(store.currentSeq))
    store.verifyFresh(tiers = Seq("bq"))
    // an artifact built OUTSIDE the store (dsir scores, bpe vocab, ivm
    // view over this corpus) joins the same catalog
    store.registerArtifact("dsir")
    store.verifyFresh(tiers = Seq("dsir"))
    // asking about a never-registered tier fails loud, not silently-fresh
    val missing = intercept[IllegalArgumentException](
      store.verifyFresh(tiers = Seq("bloom")))
    assert(missing.getMessage.contains("bloom"), missing.getMessage)
    // manifest survives a cold reopen (it's a file, not driver state)
    val reopened = new VectorStore(spark, dir, dim = 2)
    assert(reopened.artifactManifest.keySet === Set("bq", "ivf", "dsir"))
  }

  test("append freshness can't be laundered: put A, put B, append B-only " +
      "leaves the manifest honest; indexPending absorbs the real window") {
    val store = new VectorStore(spark, tmpDir(), dim = 2)
    store.put(batch(rec("base", Array(0f, 0f), 10)))
    store.buildBqIndex()
    store.put(batch(rec("a", Array(1f, 0f), 20)))
    val bBatch = batch(rec("b", Array(0f, 1f), 30))
    store.put(bBatch)
    store.appendToBqIndex(bBatch) // indexes b — A was NEVER indexed
    // the old behavior claimed coverage of A here; the manifest must not
    val e = intercept[IllegalArgumentException](
      store.verifyFresh(tiers = Seq("bq")))
    assert(e.getMessage.contains("stale"), e.getMessage)
    // WAL-verified catch-up absorbs the truly-uncovered window: A and B
    // (B's re-append collapses under the serve-time (key, ts) LWW)
    assert(store.indexPending("bq") === 2L)
    store.verifyFresh(tiers = Seq("bq"))
    val keys = store.searchBq(Knn.SearchRequest(Array(0.5, 0.5), topK = 10),
        rerankFrom = 10)
      .collect().map(_.getString(0)).toSet
    assert(keys === Set("base", "a", "b"))
    // a delete-only tail is vacuously absorbed (soft delete needs no
    // index write): indexPending finds 0 puts but still advances
    store.delete(Seq("base"), ts = 40)
    assert(store.indexPending("bq") === 0L)
    store.verifyFresh(tiers = Seq("bq"))
    // tiers without an append path fail loud with the fix in the message
    val noPath = intercept[IllegalArgumentException](
      store.indexPending("pq"))
    assert(noPath.getMessage.contains("buildPqIndex"), noPath.getMessage)
  }
}
