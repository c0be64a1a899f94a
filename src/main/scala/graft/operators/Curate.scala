package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The curation PIPELINE as one configurable call — the library face a
  * reference user actually drives: every stage is an independently
  * oracle-pinned operator (q15/q131, q50, q141, q114-shape, q128–q130,
  * q134), and this wires them in the canonical order with each stage
  * optional. The composition itself is pinned end-to-end by q136 (the
  * explicit form of `Config(...)` with dedup/decontaminate/gate/select/
  * order all on).
  *
  * Stage order (each narrows the corpus the next stage sees — filters
  * first, the expensive selection last):
  *   0. C4 page cleaning (row-local rule-pack, optional — raw-web
  *      hygiene precedes dedup, as in Raffel et al. §2.2)
  *   1. exact dedup (keep min-id survivor per normalized text)
  *   2. line dedup, then C4 sentence-span dedup (coarse-to-fine,
  *      both optional)
  *   2b. first-occurrence span dedup (Lee et al. keep-first, optional)
  *   3. duplicated-span scrub (OVERLAPPING-window ExactSubstr, optional)
  *   4. benchmark decontamination (n-gram collision vs a bench table)
  *   5. blocklist gate (Aho-Corasick, drop any-hit docs)
  *   6. repetition rule-pack (Gopher §A1.1 within-doc gates, optional —
  *      [[Quality.repetitionFlags]], row-local)
  *   7. token-count quality gate
  *   8. DSIR selection (top-N most target-like, integer scorer)
  *   9. curriculum ordering (global `ord` by token band)
  *  10. epoch-weighted recipe expansion (per-source token budgets)
  * Output: surviving documents + `n_tok` (+ `mean_score` and `ord` when
  * selection/ordering ran).
  */
object Curate {

  case class Config(
      c4MinSentences: Option[Int] = None,
      c4MinWords: Int = 3,
      c4BadWords: Seq[String] = Nil,
      c4SpanDedupN: Option[Int] = None,
      exactDedup: Boolean = true,
      lineDedupMinDocs: Option[Int] = None,
      spanDedupK: Option[Int] = None,
      dupSpanN: Option[Int] = None,
      decontaminateBench: Option[DataFrame] = None,
      decontaminateN: Int = 8,
      blocklist: Seq[String] = Nil,
      repetitionRules: Boolean = false,
      minTokens: Long = 1L,
      maxTokens: Long = Long.MaxValue,
      dsirTarget: Option[Column] = None,
      dsirTopN: Int = 1000,
      dsirBuckets: Int = 4096,
      dsirScale: Long = 10000L,
      curriculumBandWidth: Option[Long] = None,
      epochBudgets: Map[String, Long] = Map.empty,
      epochSourceCol: String = "source",
      // NEW fields are appended, never inserted mid-list: an existing
      // positional Config(...) caller must keep compiling with every
      // argument meaning what it meant (ADVICE r11 — the r11 additions
      // originally landed mid-list and shifted c4SpanDedupN and friends)
      htmlExtract: Boolean = false,
      piiRedact: Boolean = false,
      domainCap: Option[(String, Int)] = None,
      // (urlCol, cap): derive the registered domain IN-PIPELINE from a
      // raw URL column — canonicalizeUrl → hostOf → the full-PSL
      // registeredDomainPsl — then cap on it. The production form of
      // `domainCap`, which takes a caller-prepared domain column;
      // mutually exclusive with it. JUNK-DOMAIN POLICY (ADVICE r12,
      // narrowed r13): canonicalizeUrl fail-softs non-URL input to an
      // EMPTY host, so a malformed/null-URL doc's derived key is '' —
      // NOT a real shared domain. Exactly those empty-key rows are
      // EXEMPT from the cap (passed through uncapped) instead of being
      // lumped into one capped '' bucket that would silently drop docs
      // with fine text and junk URL metadata. A dot-less but NON-empty
      // key (single-label host: localhost, an intranet name, a bare
      // TLD) IS a real host and stays capped as its own bucket — the
      // crawl-skew rule must bind there. The caller-prepared
      // `domainCap` form keeps delegating that filter to the caller
      // (its column, its policy).
      domainCapFromUrl: Option[(String, Int)] = None,
      // which normalization the exactDedup stage keys on:
      // "byte" (lower+trim), "canonical" (ASCII CCNet fold), or
      // "folded" (NFC + accent fold + lower — the multilingual key);
      // one dispatch (Dedup.exactKeyFor) shared with the streaming twin
      exactDedupKey: String = "byte",
      // which normalization the lineDedup stage KEYS on (output lines
      // stay the original bytes) — Dedup.textKeyFor's forms; "folded"
      // makes NFC/NFD-variant boilerplate collide (VERDICT r12 #2).
      // Appended, never inserted mid-list (the r11 invariant). The
      // streaming twin's frozen lineIndex gate reads this same field.
      lineDedupKey: String = "byte")

  /** Scoped-cache form — the `withMinhashPairs` discipline: the filtered
    * corpus is persisted before the multi-pass tail (DSIR reads it twice,
    * curriculum twice more; without a cache the dedup/decontaminate
    * lineage re-executes per pass), `use` runs against the result, and
    * the cache is released in `finally`. Prefer this entry point for a
    * one-shot pipeline run; at real scale, stage outputs to parquet
    * between phases instead (each stage output is a natural checkpoint).
    */
  def withCurated[T](docs: DataFrame, idCol: String, textCol: String,
      cfg: Config)(use: DataFrame => T): T = {
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try use(run(docs, idCol, textCol, cfg, cached))
    finally cached.foreach(_.unpersist())
  }

  /** Lazy form — see [[withCurated]] for the cached one-shot variant.
    * Each downstream action re-executes the stage lineage (the
    * document-the-cost contract of a purely declarative result).
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config): DataFrame =
    run(docs, idCol, textCol, cfg, null)

  private def run(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config,
      cached: scala.collection.mutable.ArrayBuffer[DataFrame],
      trace: scala.collection.mutable.ArrayBuffer[(String, DataFrame)] = null)
      : DataFrame = {
    var cur = docs
    // survivor snapshot after a REJECTION stage — [[explain]]'s raw
    // material; `cur.select(idCol)` is a lazy plan, nothing runs here
    def mark(stage: String): Unit =
      if (trace != null) trace += stage -> cur.select(col(idCol))

    // shared rewrite-and-rejoin contract of every text-rewriting stage:
    // the operator rewrites text, emptied docs drop, the rewritten text
    // rejoins the surviving metadata columns
    def rewriteStage(rewrittenAll: DataFrame, fate: String): Unit = {
      val rewritten = rewrittenAll
        .where(col("clean_text") =!= "")
        .select(col(idCol), col("clean_text"))
      cur = cur.drop(textCol)
        .join(rewritten, Seq(idCol))
        .withColumnRenamed("clean_text", textCol)
      mark(fate)
    }

    if (cfg.htmlExtract) {
      // markup extraction FIRST — ahead even of the C4 rules: every
      // downstream stage (sentence counts, token gates, dedup keys)
      // assumes prose, not tag soup; a page that is ALL markup extracts
      // to '' and drops with its own fate. Row-local, zero shuffles.
      rewriteStage(cur.select(col(idCol),
        Markup.stripHtml(col(textCol)).as("clean_text")), "html_empty")
    }

    if (cfg.piiRedact) {
      // PII redaction right after extraction, BEFORE any dedup/hash
      // stage: redaction rewrites text, so keys computed earlier would
      // be stale; placeholders (<EMAIL>, <URL>, <IP>, <PHONE>) also
      // make re-published pages with rotated tracking URLs dedup
      // together, which the raw text would miss. Pure rewrite — no doc
      // ever drops here (a row-local projection, no fate entry).
      cur = cur.withColumn(textCol, Scrub.redact(col(textCol)))
    }

    require(cfg.domainCap.isEmpty || cfg.domainCapFromUrl.isEmpty,
      "Curate: set domainCap OR domainCapFromUrl, not both — they are " +
        "the same stage with the domain column prepared by the caller " +
        "vs derived in-pipeline")
    // per-domain cap before dedup: bound any single registered domain's
    // contribution (the crawl-skew rule); deterministic preference =
    // longest text first, id tie-break (quality proxies belong to the
    // caller via Web.domainCap directly). Rejection stage -> its own
    // fate. The FromUrl form derives the key first: canonical URL →
    // host → full-PSL eTLD+1, all row-local codegen, so the stage still
    // costs exactly one window shuffle on the domain key.
    val capStage: Option[(DataFrame, String, Int, Boolean)] =
      cfg.domainCap.map { case (c, k) => (cur, c, k, false) }.orElse(
        cfg.domainCapFromUrl.map { case (urlCol, k) =>
          (cur.withColumn("__psl_domain", Web.registeredDomainPsl(
            Web.hostOf(Web.canonicalizeUrl(col(urlCol))))),
            "__psl_domain", k, true)
        })
    capStage.foreach { case (keyed, domainCol, cap, exemptJunk) =>
      require(cap >= 1, s"Curate: domainCap $cap must be >= 1")
      // junk = the EMPTY derived key only (canonicalizeUrl's fail-soft
      // output for unparseable/null URLs) — those rows share no real
      // domain and must not be lumped into one capped '' bucket
      // (ADVICE r12). A dot-less but NON-empty key (a single-label
      // host: localhost, an intranet name, a bare TLD) IS a real host
      // and stays capped as its own bucket (ADVICE r13 — exempting it
      // would let one flood-y single-label host bypass the crawl-skew
      // rule entirely).
      val junk = coalesce(col(domainCol), lit("")) === ""
      val capped = if (exemptJunk) keyed.where(!junk) else keyed
      val kept = Web.domainCap(capped, domainCol, cap,
          length(col(textCol)).desc, col(idCol).asc)
        .where(col("kept") === 1L)
        .select(col(idCol))
      val keptAll =
        if (exemptJunk) kept.unionByName(keyed.where(junk).select(col(idCol)))
        else kept
      cur = cur.join(keptAll, Seq(idCol), "left_semi")
      mark("domain_capped")
    }

    cfg.c4MinSentences.foreach { m =>
      // C4 page cleaning next — raw-web hygiene precedes dedup in the
      // published pipeline (Raffel et al. §2.2 cleans, then dedups); a
      // page failing any rule has clean_text = '' and drops here (with
      // minSentences >= 1 kept_page and nonempty clean_text coincide)
      require(m >= 1, s"Curate: c4MinSentences $m must be >= 1")
      rewriteStage(C4.clean(cur, idCol, textCol, m, cfg.c4MinWords,
        cfg.c4BadWords), "c4_rules")
    }

    if (cfg.exactDedup) {
      val survivors = (cfg.exactDedupKey match {
        case "byte" => Dedup.exact(cur, idCol, textCol)
        case "canonical" => Dedup.exactCanonical(cur, idCol, textCol)
        case "folded" => Dedup.exactFolded(cur, idCol, textCol)
        case other => throw new IllegalArgumentException(
          s"Curate: exactDedupKey '$other' must be byte|canonical|folded")
      }).select(idCol)
      cur = cur.join(survivors, Seq(idCol), "left_semi")
      mark("exact_dup")
    }

    cfg.lineDedupMinDocs.foreach { m =>
      // LINE-level boilerplate scrub first (coarse-to-fine: whole
      // repeated lines before chunk- and window-level spans); a doc
      // that was ALL boilerplate drops with its own fate
      rewriteStage(Dedup.lineDedup(cur, idCol, textCol, m,
        cfg.lineDedupKey), "line_dedup_empty")
    }

    cfg.c4SpanDedupN.foreach { n =>
      // C4's three-sentence-span corpus dedup — sentence granularity
      // sits between whole-line scrub above and token chunks below
      rewriteStage(C4.spanDedup(cur, idCol, textCol, n), "c4_span_empty")
    }

    cfg.spanDedupK.foreach { k =>
      rewriteStage(Dedup.chunkDedupKeepFirst(cur, idCol, textCol, k),
        "span_dedup_empty")
    }

    cfg.dupSpanN.foreach { n =>
      // the OVERLAPPING-window ExactSubstr cut (Dedup.dupSpanScrub):
      // catches passages re-quoted at unaligned offsets that the
      // chunk-aligned stage above cannot see
      rewriteStage(Dedup.dupSpanScrub(cur, idCol, textCol, n),
        "dup_span_empty")
    }

    cfg.decontaminateBench.foreach { bench =>
      cur = Decontaminate.cleanCorpus(cur, bench, idCol, textCol,
        cfg.decontaminateN)
      mark("contaminated")
    }

    if (cfg.blocklist.nonEmpty) {
      cur = cur.where(graft.functions.expressions.BlocklistMatches
        .column(col(textCol), cfg.blocklist) === 0)
      mark("blocklisted")
    }

    if (cfg.repetitionRules) {
      // Gopher repetition gate at the defaults — row-local, so the
      // stage costs one scan; evidence columns are a diagnostic
      // (Quality.repetitionFlags directly), not pipeline output
      cur = Quality.repetitionFlags(cur, idCol, textCol)
        .where(col("pass_rep"))
        .select(cur.columns.map(col).toSeq: _*)
      mark("repetition")
    }

    cur = cur.withColumn("n_tok",
        size(TextFunctions.wsTokens(col(textCol))).cast("long"))
      .where(col("n_tok") >= cfg.minTokens && col("n_tok") <= cfg.maxTokens)
    mark("token_gate")

    cfg.dsirTarget.foreach { target =>
      if (cached != null) {
        cur = cur.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached += cur
      }
      val table = Dsir.bucketScoreTable(cur, textCol, target,
        cfg.dsirBuckets, cfg.dsirScale)
      val scores = Dsir.collectScores(table, cfg.dsirBuckets, cfg.dsirScale)
      val sel = Dsir.importanceWeights(cur, idCol, textCol, scores)
        .orderBy(col("mean_score").desc, col(idCol).asc)
        .limit(cfg.dsirTopN)
        .select(col(idCol), col("mean_score"))
      cur = cur.join(sel, Seq(idCol))
      mark("not_selected")
    }

    cfg.curriculumBandWidth.foreach { w =>
      require(w >= 1, s"curriculumBandWidth $w must be >= 1")
      val banded = cur.withColumn("band", expr(s"n_tok div ${w}L"))
      cur = Curriculum.globalOrderIndex(banded, "band", idCol)
    }

    // the recipe is the LAST stage: repeat the curated corpus per-source
    // to hit token budgets (rows gain copy_idx; unbudgeted sources drop)
    if (cfg.epochBudgets.nonEmpty) {
      cur = Sampling.epochExpand(cur, idCol, "n_tok", cfg.epochSourceCol,
        cfg.epochBudgets)
    }

    cur
  }

  /** Per-document FATE through the rejection stages of [[run]] — the
    * curator's audit ("why is doc X not in my training set?"): for every
    * input document, the FIRST stage that dropped it, or `kept`. Stage
    * predicates are NOT re-implemented here — run itself executes with a
    * survivor-snapshot trace, so this can never drift from the pipeline
    * it explains. The curriculum ordering stage never rejects a document
    * and is out of scope.
    *
    * Epoch-recipe configs: the fate covers the REJECTION stages (up to
    * the selection boundary) — `Sampling.epochExpand` legitimately emits
    * zero copies of a document (unbudgeted source, or a budget below one
    * full epoch with a losing fractional coin), which is an EMISSION
    * decision, not a rejection, so it gets its own column instead of a
    * fate value: `emitted_copies` = the exact number of copies the
    * recipe emits for each doc (0 for pre-recipe rejects; can be 0 for a
    * `kept` doc — precisely the zero-copy case that made a single fate
    * ill-defined). Computed by running the REAL `epochExpand` over the
    * pre-recipe corpus and counting copy rows — no re-implemented math
    * to drift.
    *
    * Cost: one id-only left join per configured rejection stage (each
    * survivor relation is ids-only, SHUFFLE_HASH-pinned off size-estimate
    * broadcasts) — the fate CASE is row-local; a recipe config adds the
    * expansion + one id hash-agg. A diagnostic, priced like
    * [[Quality.rejectionReport]]. Output: (idCol, fate) — plus
    * `emitted_copies` when `epochBudgets` is configured — every input row.
    */
  def explain(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config): DataFrame = {
    val trace =
      scala.collection.mutable.ArrayBuffer.empty[(String, DataFrame)]
    val pre = run(docs, idCol, textCol, cfg.copy(epochBudgets = Map.empty),
      null, trace)
    val flagged = trace.zipWithIndex.foldLeft(docs.select(col(idCol))) {
      case (acc, ((_, ids), i)) =>
        acc.join(ids.withColumn(s"__s$i", lit(true)).hint("SHUFFLE_HASH"),
          Seq(idCol), "left")
    }
    val fate = trace.zipWithIndex.foldRight(lit("kept"): Column) {
      case (((stage, _), i), els) =>
        when(col(s"__s$i").isNull, lit(stage)).otherwise(els)
    }
    val base = flagged.select(col(idCol), fate.as("fate"))
    if (cfg.epochBudgets.isEmpty) base
    else {
      val copies = Sampling.epochExpand(pre, idCol, "n_tok",
          cfg.epochSourceCol, cfg.epochBudgets)
        .groupBy(col(idCol)).agg(count(lit(1)).as("emitted_copies"))
      base.join(copies.hint("SHUFFLE_HASH"), Seq(idCol), "left")
        .select(col(idCol), col("fate"),
          coalesce(col("emitted_copies"), lit(0L)).as("emitted_copies"))
    }
  }
}
