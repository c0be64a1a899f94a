package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("chain propagates the min label across the full diameter") {
    // 1-2-3-4-5 is ONE component; needs several rounds, not one
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b", smallGraphEdges = 0L)
      .orderBy("id").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("disjoint components keep separate minima; direction is irrelevant") {
    val edges = Seq((7L, 2L), (2L, 9L), (30L, 10L), (40L, 30L)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b", smallGraphEdges = 0L)
      .orderBy("id").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((2L, 2L), (7L, 2L), (9L, 2L),
      (10L, 10L), (30L, 10L), (40L, 10L)))
  }

  test("self-loops and nulls are ignored; empty edges yield empty labels") {
    val edges = Seq((Some(1L), Some(1L)), (Some(2L), None), (None, Some(3L)),
      (Some(4L), Some(5L))).toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b", smallGraphEdges = 0L)
      .orderBy("id").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((4L, 4L), (5L, 4L)))
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.connectedComponents(empty, "a", "b", smallGraphEdges = 0L).count() === 0L)
  }

  test("result is invariant to input partitioning") {
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 8L), (3L, 4L)).toDF("a", "b")
    val one = Graph.connectedComponents(edges.coalesce(1), "a", "b", smallGraphEdges = 0L)
      .orderBy("id").collect().toSeq
    val many = Graph.connectedComponents(edges.repartition(7), "a", "b", smallGraphEdges = 0L)
      .orderBy("id").collect().toSeq
    assert(one === many)
  }

  test("maxIter too small for the diameter fails loudly, not silently wrong") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Graph.connectedComponents(chain, "a", "b", maxIter = 1, smallGraphEdges = 0L).count()
    }
  }

  test("dedupClusters summarizes components; keepClusterSurvivors drops losers") {
    // clusters {1,2,3} and {10,11}; 20 untouched by any pair
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val clusters = Graph.dedupClusters(pairs, "a", "b")
      .orderBy("component").as[(Long, Long, Long)].collect()
    assert(clusters.toSeq === Seq((1L, 3L, 3L), (10L, 2L, 11L)))

    val corpus = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val kept = Graph.keepClusterSurvivors(corpus, "doc_id", pairs, "a", "b")
      .orderBy("doc_id").as[Long].collect()
    assert(kept.toSeq === Seq(1L, 10L, 20L))
  }

  test("union-find fast path labels exactly like the distributed loop") {
    // chains, a cycle, a clique, and isolated pairs — both paths must
    // produce the identical min-id labeling
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L),
      (11L, 12L), (12L, 10L), (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L)).toDF("a", "b")
    val fast = Graph.connectedComponents(edges, "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val dist = Graph.connectedComponents(edges, "a", "b", smallGraphEdges = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(fast === dist)
  }

  test("large-star/small-star agrees with propagation on random graphs") {
    // property-style: seeded random graphs of several shapes — sparse,
    // denser, and a long chain grafted to a clique (the high-diameter
    // case star contraction exists for)
    val rnd = new scala.util.Random(7L)
    for (trial <- 1 to 4) {
      val n = 30 + trial * 10
      val m = n + rnd.nextInt(2 * n)
      val rand = (1 to m).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val chain = (100L to 140L).sliding(2).map(p => (p(0), p(1))).toSeq
      val edges = (rand ++ chain :+ (0L, 100L)).toDF("a", "b")
      val prop = Graph.connectedComponents(edges, "a", "b",
        maxIter = 60, smallGraphEdges = 0L)
        .orderBy("id").as[(Long, Long)].collect().toSeq
      val star = Graph.connectedComponentsStar(edges, "a", "b")
        .orderBy("id").as[(Long, Long)].collect().toSeq
      assert(star === prop, s"trial $trial (n=$n m=$m)")
    }
  }

  test("star CC handles the degenerate shapes: empty, self-loop, one pair") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.connectedComponentsStar(empty, "a", "b").count() === 0L)
    val selfOnly = Seq((3L, 3L)).toDF("a", "b")
    assert(Graph.connectedComponentsStar(selfOnly, "a", "b").count() === 0L)
    val pair = Seq((9L, 4L)).toDF("a", "b")
    assert(Graph.connectedComponentsStar(pair, "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq === Seq((4L, 4L), (9L, 4L)))
  }

  test("reliable-checkpoint path (checkpointDir) matches localCheckpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L),
      (20L, 21L), (21L, 22L)).toDF("a", "b")
    val local = Graph.connectedComponents(edges, "a", "b", smallGraphEdges = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val reliable = Graph.connectedComponents(edges, "a", "b",
      smallGraphEdges = 0L, checkpointDir = Some(dir))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(reliable === local)
    // the checkpoint blocks really went to the shared dir, not executor mem
    def rddFiles(d: java.io.File): Seq[java.io.File] =
      if (!d.isDirectory) Nil
      else d.listFiles().toSeq.flatMap(f =>
        if (f.isDirectory) rddFiles(f) else Seq(f))
    assert(rddFiles(new java.io.File(dir)).nonEmpty, "no checkpoint files written")

    val pr = Graph.pageRankInt(edges, "a", "b", iters = 3)
      .orderBy("id").collect().toSeq
    val prReliable = Graph.pageRankInt(edges, "a", "b", iters = 3,
      checkpointDir = Some(dir))
      .orderBy("id").collect().toSeq
    assert(prReliable === pr)
  }

  test("long iteration with checkpointDir: plan depth stays O(1) across rounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-long-").toString
    // diameter-11 chain: min-label CC needs ~11 propagation rounds
    val edges = (1L to 11L).map(i => (i, i + 1)).toDF("a", "b")
    def planNodes(df: org.apache.spark.sql.DataFrame): Int = {
      var n = 0
      df.queryExecution.optimizedPlan.foreach(_ => n += 1)
      n
    }
    val labels = Graph.connectedComponents(edges, "a", "b", maxIter = 15,
      smallGraphEdges = 0L, checkpointDir = Some(dir))
    // >= 11 materialized rounds later the returned plan must still be a
    // scan of the last checkpoint plus a projection — not 11 chained
    // joins (the O(1)-per-round contract of the frontier materialize)
    assert(planNodes(labels) <= 5, labels.queryExecution.optimizedPlan.toString)
    assert(labels.orderBy("id").as[(Long, Long)].collect().toSeq ===
      (1L to 12L).map(i => (i, 1L)))

    val pr = Graph.pageRankInt(edges, "a", "b", iters = 10,
      checkpointDir = Some(dir))
    assert(planNodes(pr) <= 5, pr.queryExecution.optimizedPlan.toString)
    // and the reliable-checkpoint run computes the same ranks as the
    // localCheckpoint run at the same depth
    assert(pr.orderBy("id").as[(Long, Long)].collect().toSeq ===
      Graph.pageRankInt(edges, "a", "b", iters = 10)
        .orderBy("id").as[(Long, Long)].collect().toSeq)
  }

  test("pageRankInt symmetric=true: identical ranks, no nodes join in the plan") {
    // x ∪ reverse(x) is its own reversal -> symmetric contract holds
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
    val edges = (base ++ base.map(_.swap)).toDF("a", "b")
    val generic = Graph.pageRankInt(edges, "a", "b", iters = 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val sym = Graph.pageRankInt(edges, "a", "b", iters = 3, symmetric = true)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(sym === generic)
  }

  test("pageRankInt: hand-computed 3-node star, 3 rounds, exact Longs") {
    // symmetric star 2—1—3; every step is integer arithmetic, so the
    // expected values are derivable by hand:
    //   r1: hub 1,850,000 / leaves 575,000
    //   r2: hub 1,127,500 / leaves 936,250
    //   r3: hub 1,741,625 / leaves 629,187  (floor at the 85% step)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("a", "b")
    val got = Graph.pageRankInt(edges, "a", "b", iters = 3)
      .orderBy("id").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 1741625L), (2L, 629187L), (3L, 629187L)))
  }

  test("pageRankInt: dangling sink keeps base rank flowing, never NaNs") {
    // 1 → 2 only: node 2 has no out-edges (contributes nothing back);
    // node 1 settles at the base 150,000, node 2 at 150,000 + 85% of it
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val got = Graph.pageRankInt(edges, "a", "b", iters = 3)
      .orderBy("id").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 150000L), (2L, 277500L)))
  }

  test("pageRankInt is invariant to input partitioning (exact-integer sums)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("a", "b")
    val one = Graph.pageRankInt(edges.coalesce(1), "a", "b")
      .orderBy("id").collect().toSeq
    val many = Graph.pageRankInt(edges.repartition(7), "a", "b")
      .orderBy("id").collect().toSeq
    assert(one === many)
  }

  /** Plain-Scala mirror of synchronous LPA with the (cnt desc, label asc)
    * tie-break, for parity checks on arbitrary graphs.
    */
  private def lpaNaive(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = sym.groupBy(_._2).map { case (n, es) => n -> es.map(_._1) }
    var labels = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = nbrs.map { case (n, ns) =>
        val counts = ns.map(labels).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    labels
  }

  test("labelPropagation: bridged cliques keep distinct labels (density, " +
      "not connectivity)") {
    // two triangles {1,2,3} and {10,11,12} joined by bridge 3-10: one
    // component, but LPA keeps two communities (the bridge is outvoted)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("a", "b")
    val got = Graph.labelPropagation(edges, "a", "b", rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(10L) === got(11L) && got(11L) === got(12L))
    assert(got(1L) !== got(10L))
    // CC on the same graph: ONE component — the contrast that makes LPA
    assert(Graph.connectedComponents(edges, "a", "b")
      .select("component").distinct().count() === 1L)
  }

  test("labelPropagation matches the naive synchronous mirror on random graphs") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    for (rounds <- Seq(1, 2, 3)) {
      val got = Graph.labelPropagation(edges.toDF("a", "b"), "a", "b", rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === lpaNaive(edges, rounds), s"rounds=$rounds")
    }
  }

  test("kCore: fixpoint peels the pendant chain, keeps K4; cascade works") {
    // K4 {1,2,3,4} + chain 4-5-6: peeling 6 (deg 1) drops 5 to deg 1 →
    // the cascade removes both; fixpoint 2-core = K4
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val core = Graph.kCore(edges, "a", "b", k = 2, maxRounds = 10)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(core === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    assert(core.forall(_._2 >= 2)) // the k-core invariant
  }

  test("kCore: bounded rounds stop mid-cascade (the unrolled-oracle form)") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val oneRound = Graph.kCore(edges, "a", "b", k = 2, maxRounds = 1)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // only 6 peeled so far; 5 survives this round with in-subgraph deg 1
    assert(oneRound === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 4L), (5L, 1L)))
  }

  test("kCore: k above the densest core yields empty; self-loops/dups ignored") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L)).toDF("a", "b")
    assert(Graph.kCore(edges, "a", "b", k = 3, maxRounds = 5).count() === 0L)
    val two = Graph.kCore(edges, "a", "b", k = 1, maxRounds = 5)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(two === Seq((1L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("triangleCounts: known graph, exact per-node counts") {
    // K4 on {1,2,3,4} = 4 triangles, each node in 3; pendant 5-1 in none
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 :+ (5L, 1L)).toDF("a", "b")
    val got = Graph.triangleCounts(edges, "a", "b")
      .orderBy("id").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("triangleCounts: duplicates, reversed edges and self-loops collapse") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L)).toDF("a", "b")
    val got = Graph.triangleCounts(edges, "a", "b")
      .orderBy("id").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("triangleCounts: degree-ordered orientation matches a naive " +
      "id-ordered count on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(160)((rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
      .toDF("a", "b")
    val got = Graph.triangleCounts(edges, "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // naive: canonical a<b edges, triangles by a<b<c three-way join
    val und = edges.where($"a" =!= $"b")
      .select(least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))
      .distinct().as[(Long, Long)].collect().toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val naive = (for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (id, xs) => (id, xs.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(got === naive)
  }

  test("no cached blocks remain after the run") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    Graph.connectedComponents(edges, "a", "b").collect()
    // the symmetrized edge relation is unpersisted in finally;
    // localCheckpoint RDDs are owned by the returned frame's lineage
    val leaked = spark.sparkContext.getPersistentRDDs.values
      .filter(_.name != null)
      .filter(_.name.contains("sym"))
    assert(leaked.isEmpty)
  }

  test("iterative loops free each round's checkpoint blocks") {
    // a path graph forces MANY rounds: without per-round cleanup the
    // persistent-RDD count grows with rounds; with it, at most the
    // final frame (owned by the returned lineage) stays
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    def persisted(): Int = spark.sparkContext.getPersistentRDDs.size
    val base = persisted()
    Graph.kCore(chain, "a", "b", k = 2, maxRounds = 30).collect()
    val afterKcore = persisted()
    assert(afterKcore - base <= 1,
      s"kCore leaked ${afterKcore - base} round frames")
    Graph.labelPropagation(chain, "a", "b", rounds = 8).collect()
    val afterLpa = persisted()
    assert(afterLpa - afterKcore <= 1,
      s"labelPropagation leaked ${afterLpa - afterKcore} round frames")
  }

  // ---- appendToComponents (incremental label maintenance) ----

  test("appendToComponents: append == full recompute, including " +
      "cross-component merges, new nodes, and a new global minimum") {
    val e0 = Seq((5L, 6L), (6L, 7L), (20L, 21L), (30L, 31L)).toDF("a", "b")
    val labels0 = Graph.connectedComponents(e0, "a", "b", smallGraphEdges = 0L)
    // batch merges {5,6,7} with {20,21} via a chain THROUGH a new node,
    // adds a brand-new pair, and hands {30,31} a smaller minimum (2)
    val e1 = Seq((7L, 100L), (100L, 20L), (50L, 51L), (2L, 31L)).toDF("a", "b")
    val inc = Graph.appendToComponents(labels0, e1, "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val full = Graph.connectedComponents(e0.union(e1), "a", "b",
        smallGraphEdges = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(inc === full, s"inc=$inc full=$full")
    assert(inc.contains((31L, 2L)) && inc.contains((100L, 5L)) &&
      inc.contains((51L, 50L)))
  }

  test("appendToComponents: two appends == one-shot; empty and no-op " +
      "batches are identities") {
    val e0 = Seq((1L, 2L), (8L, 9L)).toDF("a", "b")
    val e1 = Seq((2L, 3L), (9L, 1L)).toDF("a", "b") // second merges both
    val e2 = Seq((3L, 8L), (1L, 2L)).toDF("a", "b") // redundant by then
    val l0 = Graph.connectedComponents(e0, "a", "b", smallGraphEdges = 0L)
    val l1 = Graph.appendToComponents(l0, e1, "a", "b")
    val l2 = Graph.appendToComponents(l1, e2, "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val oneShot = Graph.connectedComponents(e0.union(e1).union(e2), "a", "b",
        smallGraphEdges = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(l2 === oneShot)
    // an edge inside one existing component changes nothing
    val noop = Graph.appendToComponents(l0,
        Seq((1L, 2L)).toDF("a", "b"), "a", "b")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(noop === l0.orderBy("id").as[(Long, Long)].collect().toSeq)
  }

  test("appendToComponents fails loud past maxLabelPairs instead of an " +
      "unbounded driver collect") {
    val e0 = Seq((1L, 2L)).toDF("a", "b")
    val l0 = Graph.connectedComponents(e0, "a", "b", smallGraphEdges = 0L)
    val big = (0L until 10L).map(i => (100L + 2 * i, 101L + 2 * i)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      Graph.appendToComponents(l0, big, "a", "b", maxLabelPairs = 5L)
    }
    assert(ex.getMessage.contains("connectedComponents"), ex.getMessage)
  }

  test("persisted labels gate through the store's artifact manifest: a " +
      "stale label artifact fails verifyFresh before it can under-merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_store").toString
    val store = new graft.store.VectorStore(spark, dir, dim = 2)
    def rec(k: String): org.apache.spark.sql.DataFrame =
      Seq((k, Seq(1.0, 0.0), Map.empty[String, String], 10L))
        .toDF("key", "vector", "metadata", "ts")
    store.put(rec("a"))
    // labels computed over the corpus as of now -> register the claim
    store.registerArtifact("cc_labels")
    store.verifyFresh(tiers = Seq("cc_labels"))
    // corpus moves on; the label artifact is now stale and the gate says so
    store.put(rec("b"))
    val ex = intercept[IllegalArgumentException](
      store.verifyFresh(tiers = Seq("cc_labels")))
    assert(ex.getMessage.contains("cc_labels"), ex.getMessage)
    // appendToComponents over the new batch's pairs + re-register = fresh
    store.registerArtifact("cc_labels")
    store.verifyFresh(tiers = Seq("cc_labels"))
  }
}
