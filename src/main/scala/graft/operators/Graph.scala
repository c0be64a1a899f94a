package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an edge list — the stage the dedup suite was
  * missing: pair detectors (minhash q17, simhash q18/q33, jaccard q19,
  * chunk q52) emit PAIRS, but near-duplication is transitive in practice
  * (A~B, B~C ⇒ {A,B,C} is one duplicate GROUP), so cluster formation +
  * one-survivor-per-cluster is what actually removes rows from a corpus.
  * The reference deduplicates only by exact id overwrite
  * (`src/datanode/handler.py:300` upsert); grouping near-dup candidates
  * is the corpus-curation extension of that idea.
  *
  * Algorithm: iterative min-label propagation — every node starts
  * labeled with its own id; each round every node takes the min of its
  * own label and its neighbors' labels; fixpoint when no label changes.
  * Rounds = graph diameter, and dedup-cluster diameters are tiny (a
  * near-dup cluster is almost a clique), so 3–5 rounds is typical. Each
  * round is ONE shuffle (join on node id + min-agg); the frontier is
  * materialized each round so the plan does not grow with the iteration
  * count — `localCheckpoint` locally, a reliable checkpoint dir at
  * cluster scale (the `checkpointDir` parameter). For high-diameter
  * graphs the O(log n)-round large-star/small-star variant is
  * [[connectedComponentsStar]]; for near-dup graphs (tiny diameters)
  * plain propagation wins.
  *
  * Determinism: min over Long labels — no floats, no randomness; the
  * component id IS the smallest node id in the component, which doubles
  * as the canonical survivor for dedup.
  */
object Graph {

  /** Eager materialization that truncates lineage: a RELIABLE
    * `checkpoint` into `checkpointDir` when one is given (cluster-grade —
    * blocks live on the shared filesystem, survive executor loss, and the
    * plan holds no lineage to re-run), `localCheckpoint` otherwise (the
    * right local/dev tool: executor-storage blocks, zero fs round-trip).
    * Shared with [[Dedup]]'s winnow-verify candidate materialization
    * (r15) — same local-vs-cluster contract there.
    */
  private[operators] def materialize(df: DataFrame,
      checkpointDir: Option[String]): DataFrame = checkpointDir match {
    case Some(dir) =>
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir appends a fresh UUID subdir — only (re)set when
      // the context is not already pointed under this directory
      if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
      df.checkpoint(eager = true)
    case None => df.localCheckpoint(eager = true)
  }

  /** Free the block-manager storage behind a [[materialize]]d frame once
    * the NEXT round's frame is materialized — without this every round of
    * an iterative loop leaves its localCheckpoint blocks cached for the
    * session's lifetime (the executor-storage twin of a lineage leak).
    * A checkpointed Dataset's plan is a single [[LogicalRDD]] leaf whose
    * `rdd` holds the persisted blocks; reliable checkpoints live in
    * checkpoint FILES, for which unpersisting the RDD handle is a no-op
    * on the data — harmless either way. Only call on frames no LIVE frame
    * derives from lazily (i.e. after the successor was eagerly copied).
    */
  private[operators] def freeMaterialized(df: DataFrame,
      blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking)
      case _ => ()
    }

  /** (id, component) for every node incident to an edge; `component` is
    * the minimum node id reachable from `id`. Nodes not mentioned in
    * `edges` are absent (singletons are their own component trivially).
    *
    * Size-adaptive (the AQE philosophy applied to the iteration): when
    * the deduped edge set is at most `smallGraphEdges`, the closure is
    * computed as driver union-find — near-dup candidate graphs are tiny
    * by construction (pairs above a similarity cut), and k propagation
    * rounds of Spark-job overhead dwarf the actual work. Larger graphs
    * take the distributed min-label loop. Both paths produce the
    * identical min-id labeling.
    *
    * `checkpointDir`: reliable-checkpoint directory for the iteration
    * frontier (see [[materialize]]) — pass one on a real cluster.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, smallGraphEdges: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter >= 1, s"maxIter $maxIter must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("s"),
      col(dstCol).cast("long").as("d"))
    // symmetrize once; propagation then only needs one join direction
    val sym = e.union(e.select(col("d").as("s"), col("s").as("d")))
      .where(col("s").isNotNull && col("d").isNotNull && col("s") =!= col("d"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (sym.count() <= smallGraphEdges) return ccUnionFind(sym)
      var labels = materialize(
        sym.select(col("s").as("id")).distinct()
          .select(col("id"), col("id").as("component")),
        checkpointDir)
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIter) {
        // neighbor-label minimum per node, one shuffle
        val nbrMin = sym.join(labels, sym("s") === labels("id"))
          .groupBy(sym("d").as("id"))
          .agg(min(col("component")).as("nbr"))
        val next = materialize( // truncate lineage: plan stays O(1) per round
          labels.withColumnRenamed("component", "old")
            .join(nbrMin, Seq("id"), "left")
            .select(col("id"), col("old"),
              least(col("old"), coalesce(col("nbr"), col("old"))).as("component")),
          checkpointDir)
        changed = next.where(col("component") =!= col("old")).count()
        freeMaterialized(labels) // next is an eager copy — old blocks are dead
        labels = next.select("id", "component")
        iter += 1
      }
      require(changed == 0L,
        s"connectedComponents did not converge in $maxIter rounds " +
          "(diameter exceeds maxIter — raise it)")
      labels
    } finally sym.unpersist()
  }

  /** Driver union-find (union-by-min, path compression) over a collected
    * edge list. Root selection always keeps the SMALLER id, so the final
    * root of every set is the component minimum — bit-identical output to
    * the distributed min-label loop. Collects only when the caller
    * established the edge set is small.
    */
  private def ccUnionFind(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    val es = sym.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val labeled = parent.keysIterator.map(id => (id, find(id))).toSeq
    spark.createDataFrame(labeled).toDF("id", "component")
  }

  /** INCREMENTAL component maintenance — merge a NEW edge batch into
    * PERSISTED component labels without recomputing from scratch: the
    * q61/q158 incremental discipline one level up, and what a daily
    * 100-TB ingest actually wants (the full corpus's pair graph never
    * re-forms; only the day's edges move).
    *
    * Semantics: given `labels` = [[connectedComponents]] over edge set
    * E₀ and `newEdges` = E₁, returns the min-id labeling of E₀ ∪ E₁ —
    * append ≡ full recompute, bit-identical (spec- and oracle-pinned).
    *
    * Shape: each new edge maps its endpoints to their CURRENT labels
    * (two equi-joins against the label table; new nodes label
    * themselves), producing LABEL-PAIR merge edges — bounded by touched
    * components (≤ 2·|batch| distinct labels), never corpus size. Those
    * collect to a driver union-find (union-by-min — the same closure
    * [[ccUnionFind]] runs) whose root map broadcasts back over the label
    * table as one small-side join. `maxLabelPairs` fails loud before any
    * unbounded collect (a batch that touches more components than the
    * cap should go through the full [[connectedComponents]] instead).
    *
    * Trust note: `labels` must be a COMPLETE labeling of E₀ — feeding a
    * stale or partial label artifact silently under-merges; persist
    * labels with the store's artifact manifest and gate reads with
    * `verifyFresh` (the discipline GraphSpec pins).
    */
  def appendToComponents(labels: DataFrame, newEdges: DataFrame,
      srcCol: String, dstCol: String,
      maxLabelPairs: Long = 1000000L): DataFrame = {
    require(maxLabelPairs >= 1, s"maxLabelPairs $maxLabelPairs must be >= 1")
    val spark = labels.sparkSession
    val e = newEdges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("d"))
      .where(col("s").isNotNull && col("d").isNotNull && col("s") =!= col("d"))
      .distinct()
    val lab = labels.select(col("id").cast("long").as("id"),
      col("component").cast("long").as("component"))
    // endpoint -> current label (own id when previously unseen)
    val withLs = e
      .join(lab.select(col("id").as("s"), col("component").as("cs")),
        Seq("s"), "left")
      .join(lab.select(col("id").as("d"), col("component").as("cd")),
        Seq("d"), "left")
      .select(coalesce(col("cs"), col("s")).as("la"),
        coalesce(col("cd"), col("d")).as("lb"))
      .where(col("la") =!= col("lb"))
      .select(least(col("la"), col("lb")).as("x"),
        greatest(col("la"), col("lb")).as("y"))
      .distinct()
    val capInt = (maxLabelPairs + 1).min(Int.MaxValue.toLong).toInt
    val lp = withLs.limit(capInt).collect().map(r => (r.getLong(0), r.getLong(1)))
    require(lp.length <= maxLabelPairs,
      s"appendToComponents: batch touches more than $maxLabelPairs " +
        "distinct component pairs — run the full connectedComponents " +
        "over the unioned edge set instead")
    // driver union-find by min over the label graph (labels are min node
    // ids, so the merged root is the min node id of the merged component)
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    lp.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val remap = parent.keysIterator.map(l => (l, find(l)))
      .filter { case (l, r) => l != r }.toSeq
    val remapDf =
      if (remap.isEmpty)
        spark.createDataFrame(Seq.empty[(Long, Long)])
          .toDF("component", "nc")
      else spark.createDataFrame(remap).toDF("component", "nc")
    val relabeled = lab.join(broadcast(remapDf), Seq("component"), "left")
      .select(col("id"),
        coalesce(col("nc"), col("component")).as("component"))
    // endpoints never seen before enter labeled by (remapped) own id
    val newNodes = e.select(col("s").as("id"))
      .union(e.select(col("d").as("id"))).distinct()
      .join(lab.select("id"), Seq("id"), "left_anti")
      .join(broadcast(remapDf.withColumnRenamed("component", "id")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("nc"), col("id")).as("component"))
    relabeled.unionByName(newNodes)
  }

  /** Large-star/small-star connected components (Kiveris et al. 2014,
    * "Connected Components in MapReduce and Beyond") — the O(log n)-round
    * alternative for HIGH-DIAMETER graphs, where plain min-label
    * propagation needs diameter rounds. Near-dup graphs are near-cliques
    * (diameter ≈ 2), so [[connectedComponents]] stays the default; this
    * variant is for path-shaped graphs (citation chains, linked crawls).
    *
    * Invariant: edges always point large→small. Each round,
    *   large-star: connect every strictly-larger neighbor of a node to
    *     its neighborhood minimum;
    *   small-star: connect a node and all its smaller neighbors to that
    *     set's minimum.
    * Fixpoint = the edge set is a star forest (v → component-min root).
    * Output contract identical to [[connectedComponents]]: (id,
    * component = min reachable id), nodes in no edge absent —
    * property-pinned equal in GraphSpec.
    */
  def connectedComponentsStar(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50, checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter >= 1, s"maxIter $maxIter must be >= 1")
    val e0 = edges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("d"))
      .where(col("s").isNotNull && col("d").isNotNull && col("s") =!= col("d"))
    var e = materialize(
      e0.select(greatest(col("s"), col("d")).as("s"),
        least(col("s"), col("d")).as("d")).distinct(),
      checkpointDir)
    var eCount = e.count()
    var converged = eCount == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star over the symmetrized set: m ≤ s < v keeps large→small
      val sym = e.union(e.select(col("d").as("s"), col("s").as("d")))
      val mN = sym.groupBy("s").agg(min(col("d")).as("mn"))
        .select(col("s").as("u"), least(col("s"), col("mn")).as("m"))
      val large = sym.join(mN, sym("s") === col("u"))
        .where(col("d") > col("s"))
        .select(col("d").as("s"), col("m").as("d"))
        .distinct()
      // small-star on large's output (already large→small): every anchor
      // and its non-min smaller neighbors re-point at the minimum
      val withM = large.join(
        large.groupBy("s").agg(min(col("d")).as("m")), "s")
      val next = materialize(
        withM.select(col("s"), col("m").as("d"))
          .union(withM.where(col("d") =!= col("m"))
            .select(col("d").as("s"), col("m").as("d")))
          .distinct(),
        checkpointDir)
      val nextCount = next.count()
      converged = nextCount == eCount &&
        next.join(e, Seq("s", "d"), "left_anti").isEmpty
      freeMaterialized(e) // after the convergence join — e's last live use
      e = next
      eCount = nextCount
      iter += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds")
    // star forest → labels: each non-root points at its root once; roots
    // label themselves
    e.select(col("s").as("id"), col("d").as("component"))
      .union(e.select(col("d").as("id"), col("d").as("component")).distinct())
  }

  /** Integer-exact PageRank over an edge list — importance weighting for
    * corpus curation (the web-scale precedent: rank crawl domains by link
    * centrality, then sample high-rank domains preferentially). The
    * reference has no graph stage; this extends its data model the same
    * way [[connectedComponents]] does.
    *
    * Arithmetic is ENTIRELY Long so every engine computes bit-identical
    * ranks (float PageRank is order-of-summation dependent and can never
    * hash-match): ranks are scaled by `scale` (1e6 = micro-ranks); a
    * node's contribution is `rank div out_degree` (floor division);
    * the damping update is `(100-damp)/100 * scale + (damp * Σcontrib)
    * div 100`. Σ of Longs is exact under any re-association, so the
    * result is deterministic across partitionings and engines.
    *
    * Each of the `iters` rounds is one join + one hash-agg shuffle on
    * node id — the canonical distributed PageRank shape. The frontier is
    * `localCheckpoint`ed so the plan stays O(1) per round (reliable
    * checkpoint dir at cluster scale). Dangling nodes (no out-edges)
    * contribute nothing, as in the classic formulation.
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damp: Long = 85L, scale: Long = 1000000L,
      checkpointDir: Option[String] = None, dedupe: Boolean = true,
      symmetric: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters $iters must be >= 1")
    require(damp >= 0 && damp <= 100, s"damp $damp must be a percentage")
    // dedupe = false skips the full-edge distinct shuffle when the caller
    // can prove the edge set is already duplicate-free (e.g. built as
    // distinct-pairs ∪ reversed-pairs over disjoint id ranges) — on a big
    // graph that distinct is the single widest exchange of the whole run
    val e0 = edges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("d"))
      .where(col("s").isNotNull && col("d").isNotNull)
    val e = if (dedupe) e0.distinct() else e0
    // out-degree rides WITH the edge (joined once, not once per round).
    // The degree join leaves the relation HASH-PARTITIONED ON s, and the
    // cache preserves that: every round's rank-join reuses the
    // partitioning — only the tiny rank frame (one row per node) moves
    // per iteration, never the edges.
    val eDeg = e.join(e.groupBy("s").agg(count(lit(1)).as("deg")), "s")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // symmetric = true: the caller asserts every node has an in-edge
    // (e.g. the edge set is its own reversal, as any  x ∪ reverse(x)  is)
    // — then each round's contribution aggregation already covers EVERY
    // node and the per-round nodes left-join (plus the nodes distinct and
    // its cache) disappears from the plan. The generic path keeps it for
    // dangling-sink correctness.
    // Node set from the CACHED relation (sources ∪ sinks) — deriving it
    // from `e` would re-run the edge distinct from the source tables.
    val nodes =
      if (symmetric) null
      else eDeg.select(col("s").as("id"))
        .union(eDeg.select(col("d").as("id"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val base = scale * (100L - damp) / 100L
      var rank: DataFrame = null
      var lastMat: DataFrame = null
      for (i <- 1 to iters) {
        // round 1's rank is the CONSTANT `scale` for every node, so the
        // first rank-join is algebraically a projection of eDeg — one
        // join per run saved in both paths
        val contrib =
          if (i == 1) eDeg.select(col("d").as("id"),
            expr(s"CAST($scale AS BIGINT) div deg").as("c"))
          else eDeg.join(rank, eDeg("s") === rank("id"))
            .select(col("d").as("id"), expr("rank div deg").as("c"))
        val cs = contrib.groupBy("id").agg(sum(col("c")).as("cs"))
        rank =
          if (symmetric) cs.select(col("id"),
            (lit(base) + expr(s"($damp * cs) div 100")).as("rank"))
          else nodes.join(cs, Seq("id"), "left")
            .select(col("id"),
              (lit(base) + expr(s"($damp * coalesce(cs, 0L)) div 100")).as("rank"))
        // rounds CHAIN LAZILY into one job (each round references the
        // previous exactly once, so the plan grows linearly); checkpoint
        // eagerly only every 8th round — plan-depth guard for long runs —
        // and at the END, which both truncates lineage and frees the
        // returned frame from the eDeg cache before the finally unpersists
        if (i % 8 == 0 || i == iters) {
          val m = materialize(rank, checkpointDir)
          // only frames THIS run materialized are freed (never the lazy
          // chain — its leaves include the caller's input plan, whose
          // storage the caller owns)
          if (lastMat != null) freeMaterialized(lastMat)
          lastMat = m
          rank = m
        }
      }
      rank
    } finally { eDeg.unpersist(); if (nodes != null) nodes.unpersist() }
  }

  /** Bounded k-core peeling (Seidman 1983; the distributed peel loop is
    * the standard iterated-filter form): each round drops every node
    * whose CURRENT degree is below `k` and restricts the graph to the
    * survivors — cascades included, because a neighbor's removal lowers
    * your degree next round. Run to `maxRounds`; at fixpoint the result
    * is THE k-core (maximal induced subgraph with all degrees ≥ k), and
    * a bounded run is the "r peels" prefix — deterministic, so an
    * unrolled fixed-round SQL oracle matches exactly (q104's hook, the
    * q88 unrolling trick applied to graphs). Each round is two shuffles
    * (degree hash-agg + survivor semi-joins) with the frontier
    * materialized — plan stays O(1) per round, [[connectedComponents]]'
    * discipline; rounds stop early when a peel removes nothing (further
    * rounds would be no-ops on both engines).
    *
    * Output: (id, deg) for every node with ≥1 edge in the peeled
    * subgraph — the degree is IN-CORE degree, the standard coreness
    * evidence. Why a curation engine carries this: k-core is the
    * community-density filter (link-farm detection, seed-set selection)
    * that triangle counts approximate locally.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int, checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(maxRounds >= 0, s"maxRounds $maxRounds must be >= 0")
    val und = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    var sym = materialize(
      und.select(col("a").as("s"), col("b").as("d"))
        .union(und.select(col("b").as("s"), col("a").as("d"))),
      checkpointDir)
    var nEdges = sym.count()
    var r = 0
    var stable = nEdges == 0L
    while (!stable && r < maxRounds) {
      val keep = sym.groupBy("s").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select("s")
      val next = materialize(
        sym.join(keep, Seq("s"), "left_semi")
          .join(keep.select(col("s").as("d")), Seq("d"), "left_semi"),
        checkpointDir)
      val n2 = next.count()
      stable = n2 == nEdges // nothing peeled → fixpoint
      freeMaterialized(sym) // next is an eager copy — the old round's blocks are dead
      sym = next
      nEdges = n2
      r += 1
    }
    sym.groupBy(col("s").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007, the LPA
    * community detector): every node starts labeled with its own id;
    * each round every node adopts the MOST FREQUENT label among its
    * neighbors' previous-round labels (ties → smallest label — the
    * determinism the async/random variant gives up). Where
    * [[connectedComponents]]' min-label finds CONNECTIVITY, the
    * mode-label finds DENSITY: a bridge edge between two near-cliques
    * cannot outvote either clique's internal majority, so the cliques
    * keep distinct labels — communities, not components.
    *
    * Bounded `rounds` (LPA has no convergence guarantee — labels can
    * oscillate on bipartite-ish structures; fixed rounds is the
    * deterministic contract, and lets an unrolled-CTE oracle hash-pin
    * the loop, q106). Each round = one join + one count hash-agg + one
    * argmax window, all keyed on node id; frontier materialized (O(1)
    * plan per round). Output: (id, label) after `rounds` rounds; nodes
    * with no edges absent.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"rounds $rounds must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("d"))
      .where(col("s").isNotNull && col("d").isNotNull && col("s") =!= col("d"))
    val sym = e.union(e.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = materialize(
        sym.select(col("s").as("id")).distinct()
          .select(col("id"), col("id").as("label")),
        checkpointDir)
      for (_ <- 1 to rounds) {
        val counts = sym.join(labels, sym("s") === labels("id"))
          .groupBy(sym("d").as("id"), col("label"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("id"))
          .orderBy(col("cnt").desc, col("label").asc)
        val next = materialize(
          counts.withColumn("__rn", row_number().over(w))
            .where(col("__rn") === 1)
            .select(col("id"), col("label")),
          checkpointDir)
        freeMaterialized(labels) // next is an eager copy — old blocks are dead
        labels = next
      }
      labels
    } finally sym.unpersist()
  }

  /** Per-node triangle counts over an undirected edge list — the local
    * clustering signal (spam rings and boilerplate mirror-farms show up
    * as abnormally triangle-dense neighborhoods in a co-occurrence
    * graph; the reference has no graph stage at all, see
    * [[connectedComponents]]).
    *
    * Algorithm: degree-ordered orientation (Suri & Vassilvitskii 2011,
    * "Counting Triangles and the Curse of the Last Reducer"). Every
    * undirected edge {u,v} is directed from the endpoint with the
    * smaller (degree, id) rank to the larger, turning the graph into a
    * DAG in which each triangle survives as EXACTLY ONE wedge
    * u→v, v→w closed by u→w. The wedge join therefore fans out from
    * each node's OUT-neighborhood only — bounded by the lower degree of
    * every edge — which is the whole trick: a hub with degree 10⁶
    * produces no 10¹²-wedge explosion because all its edges point INTO
    * it, giving the O(m^{3/2}) bound instead of Σdeg². Three shuffles
    * total (orient, wedge join, closing semi-join); per-node counts are
    * one more hash-agg over the exploded triangle corners.
    *
    * Output: (id, triangles) for every node in ≥1 triangle. Counting is
    * orientation-invariant, so an id-ordered oracle (a<b<c three-way
    * self-join) produces identical counts — the correctness hook.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): lower rank → higher rank
    val o = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("s"),
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("d"))
    // wedges u→v→w, closed by the oriented edge u→w
    val tris = o.as("e1")
      .join(o.as("e2"), col("e1.d") === col("e2.s"))
      .select(col("e1.s").as("x"), col("e1.d").as("y"), col("e2.d").as("z"))
      .join(o.select(col("s").as("x"), col("d").as("z")), Seq("x", "z"),
        "left_semi")
    tris.select(col("x").as("id"))
      .union(tris.select(col("y").as("id")))
      .union(tris.select(col("z").as("id")))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
  }

  /** Duplicate-cluster summary from a pair list: one row per component
    * with ≥2 members — (component, n_members, max_id). `component` is the
    * canonical survivor (smallest id); everything else in the cluster is
    * droppable.
    */
  def dedupClusters(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame =
    connectedComponents(pairs, aCol, bCol, maxIter)
      .groupBy("component")
      .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))

  /** Drop all non-canonical members of every duplicate cluster: rows of
    * `df` whose `idCol` appears in a component but is not its minimum are
    * removed (the survivors-plus-untouched corpus, the actual dedup
    * DELETE). One broadcast-able anti-join against the loser set.
    */
  def keepClusterSurvivors(df: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol, maxIter)
      .where(col("id") =!= col("component"))
      .select(col("id").as("__loser_id"))
    df.join(losers, df(idCol) === col("__loser_id"), "left_anti")
  }
}
