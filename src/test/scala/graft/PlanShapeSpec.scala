package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions for the round-2 scale paths — SCALE.md's
  * claims, pinned: the capped dedup indexes must prune via hash-aggregate +
  * semi-join (never a windowed sort of the full index), and no dedup scale
  * path may degrade to a nested-loop/cartesian pair join.
  */
class PlanShapeSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** The statically-compiled physical plan (pre-AQE, like the other plan
    * specs): the asserted shapes are structural — join strategy/keys,
    * exchange count, codegen stage — and AQE only upgrades them (e.g.
    * SMJ→broadcast), never introduces a nested loop or a new shuffle.
    * Asserting here keeps the tests cheap (no query execution).
    */
  private def executed(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, d)
    try df.queryExecution.executedPlan.toString
    finally spark.catalog.clearCache()
  }

  test("q36 capped ngram index prunes with a semi-join, not a window sort") {
    val plan = executed("q36_ngram_jaccard_capped")
    assert(plan.contains("LeftSemi"), plan.take(3000))
    assert(!plan.contains("RunningWindowFunction"), plan.take(3000))
    // the only Window in this plan would be the old count().over(gram) cap
    assert(!plan.contains("windowspecdefinition"), plan.take(3000))
  }

  test("q33 pigeonhole simhash never plans a nested-loop or cartesian join") {
    val plan = executed("q33_simhash_bucketed")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(3000))
  }

  test("q37 blocked cosine simjoin pairs via an equi-join on the cell id") {
    val plan = executed("q37_cosine_simjoin_bucketed")
    // the PAIR join must be keyed on cid — never an unkeyed nested loop.
    // (The broadcast-centroid ASSIGNMENT cross join is intended: tiny
    // build side, the ivfAssign shape.)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cid".r
      .findFirstIn(plan).isDefined, plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin BuildRight, Inner") &&
      !plan.contains("BroadcastNestedLoopJoin BuildLeft, Inner"), plan.take(3000))
  }

  test("q40 PQ ADC is one codegen scan pass with zero exchanges") {
    val plan = executed("q40_ann_pq")
    // encode + ADC scoring fuse into whole-stage codegen over the scan
    // ("*(1)" marks the codegen stage in toString) and nothing shuffles:
    // TakeOrderedAndProject merges per-partition heaps at the driver
    assert(plan.contains("*(1) Project"), plan.take(3000))
    assert(!plan.contains("Exchange"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("q45 dim chain broadcasts every dim table and pushes the region filter") {
    val plan = executed("q45_dim_join")
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 3, plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(plan.contains("EqualTo(r_name,ASIA)"), plan.take(3000)) // pushed to scan
  }

  test("q47 bucketed series join pairs via an equi-join on the bucket id") {
    val plan = executed("q47_series_simjoin_bucketed")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[bucket".r
      .findFirstIn(plan).isDefined, plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q48 as-of join is one window pass — no join node at all") {
    val plan = executed("q48_asof_join")
    // the merge-as-of shape: tagged Union -> per-key Window; a Join node
    // would mean the non-equi fallback crept back in
    assert(!plan.contains("Join"), plan.take(3000))
    assert(plan.contains("Window"), plan.take(3000))
    assert(plan.contains("Union"), plan.take(3000))
  }

  test("q49 range join pairs via the binned equi-join, never a nested loop") {
    val plan = executed("q49_range_join")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(3000))
    // the bucketed pair join keys on (user_id, bucket)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[user_id".r
      .findFirstIn(plan).isDefined, plan.take(3000))
  }

  test("q50 decontamination broadcasts the bench gram set") {
    val plan = executed("q50_decontaminate")
    // the corpus-side probe must be a broadcast hash join (bench side is
    // tiny by nature); a shuffled join here would shuffle the corpus grams
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("q52 chunk dedup: hash/id-keyed shuffles only, no pair join") {
    val plan = executed("q52_chunk_dedup")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(3000))
    // the hot-chunk cut is a left-anti on the hash key
    assert(plan.contains("LeftAnti"), plan.take(3000))
  }

  test("q53 scrub is scan-side only — no join, no shuffle before the sort") {
    val plan = executed("q53_pii_scrub")
    assert(!plan.contains("Join"), plan.take(3000))
    // exactly the output sort's exchange, nothing from the scrub itself
    assert("Exchange".r.findAllIn(plan).size <= 1, plan.take(3000))
  }

  test("q54 SAX blocking pairs via an equi-join on the word") {
    val plan = executed("q54_series_sax_blocked")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[sax".r
      .findFirstIn(plan).isDefined, plan.take(3000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(3000))
  }

  test("q41/q42 curation coins stay scan-side (no join, no extra shuffle)") {
    val p41 = executed("q41_stratified_sample")
    assert(!p41.contains("Join"), p41.take(3000))
    val p42 = executed("q42_split_assign")
    assert(!p42.contains("Join"), p42.take(3000))
  }

  test("q67 pricing summary combines map-side before the one group exchange") {
    val plan = executed("q67_pricing_summary")
    // partial_sum below the exchange = the shuffle carries O(tasks) rows
    assert(plan.contains("partial_sum"), plan.take(3000))
    assert("Exchange hashpartitioning\\(l_returnflag".r.findFirstIn(plan).isDefined,
      plan.take(3000))
  }

  test("q68 revenue top-n merges per-partition heaps, never a global sort") {
    val plan = executed("q68_shipping_priority")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(plan.contains("partial_sum"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q69 snowflake dims collapse to broadcasts; fact side never cartesian") {
    val plan = executed("q69_local_supplier_volume")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan.take(3000))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("q78 deletion-neighborhood typo join is equi-keyed, never nested-loop") {
    val plan = executed("q78_typo_pairs")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // candidates must pair on the variant key (a constant block column
    // constant-folds out of the join keys — fine)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) [^\\n]*variant".r
      .findFirstIn(plan).isDefined, plan.take(3000))
  }

  test("q74 SQ8 scan scores without shuffling the corpus") {
    val plan = executed("q74_ann_sq8")
    // the only exchanges belong to the tiny min/max TRAINING agg and the
    // broadcast of the query row — the scored corpus scan itself ends in
    // a TakeOrderedAndProject heap merge, not a sort or shuffle
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q25 IVF assignment leg is row-local — no hash exchange, no window rank") {
    val plan = executed("q25_ann_ivf")
    // the old assignCells crossJoin + row_number shuffled n×K rows on id;
    // the fold form moves NOTHING: the only exchanges left are the one-row
    // centroid-array agg (SinglePartition) and broadcasts
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
    assert(!plan.contains("row_number"), plan.take(3000))
  }

  test("q26 RP-LSH bucket leg is row-local — no hash exchange on the corpus") {
    val plan = executed("q26_ann_lsh_rp")
    // the old rpLshBuckets grouped by (id, emb) — the 512-dim embedding as
    // a shuffle KEY; the fold form keeps bucketing inside the scan project
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
  }

  test("q71 count-min estimate probes the grid via broadcast equi-join") {
    val plan = executed("q71_countmin_heavy_hitters")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("q91 bloom probe is a row-local codegen filter — no join, no exchange before the agg") {
    val plan = executed("q91_bloom_semijoin")
    // the probe is the BloomContains expression inside the scan's filter —
    // NOT a join against the dimension and NOT a shuffle of lineitem; the
    // only exchange is the final 3-group aggregate's
    assert(plan.contains("Filter bloom_contains"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("q90 hll register build is one hash-agg — no distinct pre-shuffle of values") {
    val plan = executed("q90_hll_registers")
    // one partial_max + final max over (lang, b): shuffled state is
    // bounded by groups×m, never one row per distinct token
    assert(plan.contains("partial_max") || plan.contains("partial max"),
      plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("q89 bigram counts combine map-side before the score join") {
    val plan = executed("q89_bigram_novelty")
    // corpus counts must partial-aggregate (shuffle bounded by vocabulary,
    // not corpus) and pair via equi-join on bigram — never a nested loop
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      plan.take(3000))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("q93 triangle wedges pair via equi-joins only — never a nested loop") {
    val plan = executed("q93_triangle_counts")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // the closing step is the semi-join against oriented edges
    assert(plan.contains("LeftSemi"), plan.take(3000))
  }

  test("q94 weighted sample prunes below the per-group sort (WindowGroupLimit)") {
    val plan = executed("q94_weighted_sample")
    // rk <= 5 must push into the window sort as a group limit, so each
    // task keeps 5-row heaps instead of sorting whole groups
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("q96 BQ hamming leg is one codegen scan into a top-k heap merge") {
    val plan = executed("q96_ann_binary")
    // pack + XOR/popcount fuse into whole-stage codegen over the scan;
    // the candidate cut is TakeOrderedAndProject (per-partition heaps),
    // never a global sort exchange
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q98 prefix-filter join is token-equi-keyed, never quadratic") {
    val plan = executed("q98_jaccard_prefix")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("q99 histogram percentile aggregates map-side; state ≤ groups×buckets") {
    val plan = executed("q99_hist_percentile")
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("q112 triplet mining broadcasts anchors; corpus never shuffles whole") {
    val plan = executed("q112_triplet_mining")
    // both legs pair corpus×anchors via a broadcast, never a shuffled join
    assert(plan.contains("BroadcastExchange"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan.take(3000))
    // the positive leg's max(struct) combines map-side
    assert(plan.contains("partial_max") || plan.contains("partial max"),
      plan.take(3000))
  }

  test("q114 quality gates are scan-side; only the report's tiny agg shuffles") {
    val plan = executed("q114_quality_rules")
    assert(!plan.contains("Join"), plan.take(3000))
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      plan.take(3000))
  }

  test("q115 padding audit: per-lang windows, never a corpus-wide sort") {
    val plan = executed("q115_padding_waste")
    // every Sort in the plan is window-local (per-lang partitions); the
    // final 5-row orderBy is fine — what must NOT appear is a rangepartition
    // of the corpus relation feeding a window (global sort)
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q130 DSIR selection ranks via TakeOrderedAndProject, never a global window") {
    val plan = executed("q130_dsir_select")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("q139 temperature sample: data-side windows partition by lang, quotas broadcast") {
    val plan = executed("q139_temperature_sample")
    assert(plan.contains("hashpartitioning(lang"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan.take(3000))
  }

  test("q141 blocklist scan is scan -> codegen expression -> one hash-agg") {
    val plan = executed("q141_blocklist_scan")
    assert(plan.contains("blocklist_matches") || plan.contains("BlocklistMatches"),
      plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q135 MaxSim: one doc exchange, no join, TakeOrdered ranking") {
    val plan = executed("q135_late_interaction")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("q153 dup-span scrub: hash-keyed shuffled joins only, no nested loop") {
    val plan = executed("q153_dup_span_scrub")
    // every join is equi-keyed: gram hash (first-occ back-join) or doc id
    // (island rejoin) — a nested-loop/cartesian here would be the n² pair
    // join the operator exists to avoid
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // the corpus-scale relations are pinned off size-estimate broadcasts
    assert(plan.contains("ShuffledHashJoin"), plan.take(3000))
  }

  test("q155 SemDeDup: pair gen is an equi-join on the cell id") {
    val plan = executed("q155_semantic_dedup")
    // the only cross shape allowed is the tiny broadcast centroid assign
    // (the q25/q37 discipline); the PAIR join itself must be cell-keyed
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      plan.take(3000))
  }

  test("q186 PSL domain cap: the PSL probe is scan-side codegen, the cap " +
      "is the ONE domain-key window — no join anywhere") {
    val plan = executed("q186_psl_domain_cap")
    // registered_domain_psl evaluates inside the scan projection (the
    // 11.5k-rule arrays ride as reference objects, not a join relation)
    assert(plan.contains("registered_domain_psl"), plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    // exactly one windowspec: the domain_rank cap window
    assert("windowspecdefinition".r.findAllIn(plan).size >= 1, plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("q187 unicode-folded dedup: the fold is scan-side codegen feeding " +
      "ONE hash-aggregate exchange — no window, no join") {
    val plan = executed("q187_unicode_dedup")
    assert(plan.contains("strip_accents") && plan.contains("nfc_normalize"),
      plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("windowspecdefinition"), plan.take(3000))
    // partial_count before the exchange = map-side combine on the fold key
    assert(plan.contains("partial_count") || plan.contains("partial"),
      plan.take(3000))
  }
}
