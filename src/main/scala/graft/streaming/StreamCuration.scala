package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.{Decontaminate, Quality, Scrub}

/** Streaming faces of the curation operators — the continuous-ingest
  * deployment: documents arrive as a stream (crawl drops, WAL CDC) and
  * are scrubbed/decontaminated on the way into the corpus.
  */
object StreamCuration {

  /** PII scrub of a streaming document table. Stateless narrow
    * projections are streaming-compatible as-is, so this IS
    * [[Scrub.scrub]] — the method exists to document that contract and
    * pin it with a spec (no state, no watermark, works in append mode).
    */
  def scrubStream(docs: DataFrame, textCol: String): DataFrame =
    Scrub.scrub(docs, textCol)

  /** Quality rule-pack gate on a streaming document table: only rows
    * passing every Gopher-style gate flow on. Like [[scrubStream]], the
    * gates are stateless row-local integer comparisons
    * ([[Quality.ruleFlags]]), so the same plan runs in append mode with
    * no state and no watermark — this method pins that contract.
    */
  def qualityGateStream(docs: DataFrame, textCol: String,
      minTok: Long = 15L, maxTok: Long = 500L,
      loLen: Long = 3L, hiLen: Long = 8L,
      symPermille: Long = 100L, minStop: Long = 1L): DataFrame = {
    import org.apache.spark.sql.functions.col
    Quality.ruleFlags(docs, textCol, minTok, maxTok, loLen, hiLen,
        symPermille, minStop)
      .where(col("pass"))
      .drop("n_tok", "sum_len", "n_sym", "c_stop",
        "pass_len", "pass_wordlen", "pass_symbol", "pass_stop", "pass")
  }

  /** DSIR importance gate on a streaming document table: score each
    * arriving doc against a FROZEN score artifact (trained batch-side by
    * [[graft.operators.Dsir.bucketScoreTable]]/`collectScores`, or read
    * off the streaming-maintained Ivm view via `scoresFromState`) and
    * pass docs whose integer `mean_score` clears `minMeanScore`. The
    * scorer is the same zero-shuffle row-local literal-array fold as the
    * batch path, so it is streaming-compatible as-is — stateless, no
    * watermark, append mode; stream ≡ batch is spec-pinned. The
    * freshness loop: [[StreamIvm.maintain]] keeps the score VIEW
    * trailing the corpus while serving gates read a frozen snapshot of
    * it — scores update per refresh, not per row, which is the
    * reproducibility contract a training run wants.
    */
  def dsirGateStream(docs: DataFrame, idCol: String, textCol: String,
      scores: Array[Long], minMeanScore: Long,
      salt: String = "dsir:"): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    // inline projections, NOT a self-semi-join — joining the stream with
    // its own derived frame would be a stateful stream-stream join; the
    // scorer is the SAME codegen DsirWeight kernel as the batch path
    // (one shared implementation, so stream == batch can't drift)
    docs
      .withColumn("__toks", TextFunctions.wsTokens(col(textCol)))
      .withColumn("__nw", graft.functions.expressions.DsirWeightUtil
        .column(col("__toks"), scores, salt))
      .withColumn("mean_score", expr("__nw.weight div __nw.n_grams"))
      .where(col("mean_score") >= minMeanScore)
      .drop("__toks", "__nw")
  }

  /** Blocklist gate on a streaming document table: drop docs containing
    * any blocklist term ([[graft.functions.expressions.BlocklistMatches]]
    * — one Aho-Corasick pass per doc, the automaton compiled once and
    * shipped with the plan). Stateless row-local scan, append mode, no
    * watermark; stream ≡ batch is spec-pinned.
    */
  def blocklistGateStream(docs: DataFrame, textCol: String,
      patterns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    docs.where(graft.functions.expressions.BlocklistMatches
      .column(col(textCol), patterns) === 0)
  }

  /** The Config-driven streaming pipeline — ONE [[graft.operators.Curate.Config]]
    * drives both the batch pipeline (`Curate.run`) and the
    * continuous-ingest one, so the two can never drift stage-by-stage.
    * The stateless stages run inline in the batch pipeline's canonical
    * order (dedup → decontaminate → blocklist → repetition gate → token
    * gate → DSIR gate), each through the SAME underlying implementation
    * as its batch twin (`repetitionRules` → the row-local
    * [[graft.operators.Quality.repetitionFlags]] — one projection, no
    * state, streams unchanged):
    *
    *   - `exactDedup` → `dropDuplicatesWithinWatermark` on the
    *     normalized text (the [[StreamDedup.exactKeepFirst]] contract:
    *     FIRST ARRIVAL survives — the only causal choice on a stream,
    *     where batch keeps min-id; the two agree whenever duplicates
    *     arrive id-ordered). Requires `keepFirst = (tsCol, watermark)`.
    *   - `decontaminateBench` → the bench table is frozen driver-side to
    *     its gram-hash artifact ([[graft.operators.Decontaminate.benchGramSet]])
    *     and applied as the ROW-LOCAL inline gate — no join, no state;
    *     stream ≡ batch join form is spec-pinned.
    *   - `blocklist` / token gates → the same codegen expressions.
    *   - `dsirTarget` → TRAINING is batch-side by contract; the stream
    *     applies the FROZEN `dsirScores` artifact with a
    *     `dsirMinMeanScore` threshold gate ([[dsirGateStream]]) — a
    *     top-N selection is a corpus-shape operation and cannot hold on
    *     an unbounded stream.
    *
    *   - `c4MinSentences` → [[graft.operators.C4.clean]] is one
    *     row-local codegen pass, so the rule-pack streams unchanged
    *     (keepCols projection instead of the batch rejoin).
    *
    * Corpus-SHAPE stages (`spanDedupK`, `dupSpanN`, `lineDedupMinDocs`,
    * `c4SpanDedupN`, `curriculumBandWidth`, `epochBudgets`) raise: they
    * belong at
    * snapshot time, after the stream lands — silently skipping them
    * would let one config mean two different pipelines. The streaming
    * twin of `lineDedupMinDocs` is the frozen `lineIndex`/`lineIndexDir`
    * gate below, the q158 discipline at line granularity; the twin of a
    * batch cdcChunkDedup pass is the frozen `cdcIndex`/`cdcIndexDir`
    * gate (chunk granularity, the ladder's middle rung).
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
      cfg: graft.operators.Curate.Config,
      keepFirst: Option[(String, String)] = None,
      dsirScores: Option[Array[Long]] = None,
      dsirMinMeanScore: Long = 0L,
      spanIndex: Option[Array[Long]] = None,
      spanIndexN: Int = 8,
      spanIndexDir: Option[String] = None,
      // keyForm of the LITERAL spanIndex's build (Dedup.dupSpanIndex's
      // keyForm); the dir form reads it from the artifact's sidecar
      // and this param must stay at its default there (fail-loud below)
      spanKeyForm: String = "raw",
      lineIndex: Option[Array[Long]] = None,
      lineIndexDir: Option[String] = None,
      // the literal form takes the FULL (w, divisor, kernel, keyForm,
      // index) tuple — exactly what Dedup.loadCdcChunkIndex returns —
      // so neither chunk geometry NOR the key form can be defaulted
      // independently of the artifact: an index built under w=5 probed
      // with a defaulted w=3 (or folded-built probed raw) would cut or
      // key differently and silently miss everything (ADVICE r11/r13)
      cdcIndex: Option[(Int, Int, String, String, Array[Long])] = None,
      cdcIndexDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    require(cfg.spanDedupK.isEmpty && cfg.dupSpanN.isEmpty &&
      cfg.lineDedupMinDocs.isEmpty && cfg.c4SpanDedupN.isEmpty &&
      cfg.curriculumBandWidth.isEmpty && cfg.epochBudgets.isEmpty &&
      cfg.domainCap.isEmpty && cfg.domainCapFromUrl.isEmpty,
      "StreamCuration.run: spanDedupK/dupSpanN/lineDedupMinDocs/" +
        "c4SpanDedupN/curriculumBandWidth/epochBudgets/domainCap(FromUrl) are " +
        "corpus-shape stages — run them batch-side at snapshot time " +
        "(the stream twin of lineDedupMinDocs is the frozen " +
        "lineIndex/lineIndexDir gate)")
    require(spanIndex.isEmpty || spanIndexDir.isEmpty,
      "StreamCuration.run: pass EITHER spanIndex (a literal array) OR " +
        "spanIndexDir (a persisted Dedup.saveSpanIndex artifact), not both")
    require(lineIndex.isEmpty || lineIndexDir.isEmpty,
      "StreamCuration.run: pass EITHER lineIndex (a literal array) OR " +
        "lineIndexDir (a persisted Dedup.saveLineIndex artifact), not both")
    require(cdcIndex.isEmpty || cdcIndexDir.isEmpty,
      "StreamCuration.run: pass EITHER cdcIndex (a literal array) OR " +
        "cdcIndexDir (a persisted Dedup.saveCdcChunkIndex artifact), not both")
    // dir form: resolved at PLAN-BUILD time through the mtime-keyed
    // registry (Dedup.loadSpanIndex) and carrying its own window size
    // AND key form — a RESTARTED stream picks up a regenerated
    // artifact, a RUNNING one keeps the snapshot it started with
    // (per-run frozen), and neither geometry nor key form can silently
    // mismatch the artifact (ADVICE r13)
    require(spanKeyForm == "raw" || spanIndexDir.isEmpty,
      "StreamCuration.run: spanKeyForm is the LITERAL spanIndex's form; " +
        "the dir form reads it from the artifact's sidecar — don't pass " +
        "both")
    val resolvedIndex: Option[(Int, String, Array[Long])] =
      spanIndex.map(a => (spanIndexN, spanKeyForm, a))
        .orElse(spanIndexDir.map(dir =>
          graft.operators.Dedup.loadSpanIndex(docs.sparkSession, dir)))
    var cur = docs

    if (cfg.htmlExtract) {
      // markup extraction first (the batch Curate stage order) — one
      // row-local rewrite, no rejoin needed since the text is replaced
      // in place; all-markup docs extract to '' and drop
      cur = cur
        .withColumn(textCol,
          graft.operators.Markup.stripHtml(col(textCol)))
        .where(col(textCol) =!= "")
    }

    if (cfg.piiRedact) {
      // pure row-local rewrite (batch Curate stage order: after
      // extraction, before every hash/dedup stage) — streams unchanged
      cur = cur.withColumn(textCol,
        graft.operators.Scrub.redact(col(textCol)))
    }

    cfg.c4MinSentences.foreach { m =>
      // C4 page cleaning is one row-local codegen pass (every rule a
      // per-line/per-page string predicate), so it streams unchanged —
      // same stage position as batch Curate.run (hygiene before dedup);
      // failed pages have clean_text = '' and drop exactly as there.
      // Non-text columns ride the keepCols projection (no rejoin — a
      // stream-stream self-join would be stateful).
      require(m >= 1, s"StreamCuration.run: c4MinSentences $m must be >= 1")
      val others = cur.columns.filter(c => c != idCol && c != textCol).toSeq
      val reserved = Set("n_lines", "kept_lines", "n_sentences",
        "has_lorem", "has_brace", "has_bad_word", "kept_page",
        "clean_text", "__retained")
      val clash = others.filter(reserved)
      require(clash.isEmpty,
        s"StreamCuration.run c4 stage: column(s) ${clash.mkString(", ")} " +
          "collide with C4.clean's output names — rename them upstream")
      cur = graft.operators.C4
        .clean(cur, idCol, textCol, m, cfg.c4MinWords, cfg.c4BadWords,
          keepCols = others)
        .where(col("clean_text") =!= "")
        .withColumnRenamed("clean_text", textCol)
        .select((idCol +: textCol +: others).map(col): _*)
    }

    if (cfg.exactDedup) {
      if (cur.isStreaming) {
        val (tsCol, watermark) = keepFirst.getOrElse(sys.error(
          "StreamCuration.run: cfg.exactDedup needs keepFirst = (tsCol, " +
            "watermark) — streaming dedup state must be horizon-bounded"))
        cur = cur
          .withColumn("__event_time", timestamp_millis(col(tsCol)))
          .withWatermark("__event_time", watermark)
          // the SAME key dispatch as batch Curate — shared so the
          // normalization (incl. the "folded"/"canonical" forms, both
          // row-local and so stream-safe) can never drift between the
          // two pipelines
          .withColumn("__norm_text",
            graft.operators.Dedup.exactKeyFor(cfg.exactDedupKey,
              col(textCol)))
          .dropDuplicatesWithinWatermark("__norm_text")
          .drop("__event_time", "__norm_text")
      } else {
        // on a batch frame this entry IS the batch pipeline for the
        // stateless subset — min-id survivor, the Curate.run discipline
        val survivors = cur
          .select(col(idCol), graft.operators.Dedup.exactKeyFor(
            cfg.exactDedupKey, col(textCol)).as("__k"))
          .groupBy("__k").agg(min(col(idCol)).as(idCol))
          .select(idCol)
        cur = cur.join(survivors, Seq(idCol), "left_semi")
      }
    }

    // literal form: the probe key is cfg.lineDedupKey (the batch-stage
    // config field). Dir form: the artifact's sidecar names the form it
    // was BUILT under — it must agree with the config, or this one
    // config would mean two different pipelines (fail loud, the
    // mismatched-probe rule — ADVICE r13's silent-miss class).
    val resolvedLineIndex: Option[Array[Long]] =
      lineIndex.orElse(lineIndexDir.map { dir =>
        val (_, artifactForm, arr) =
          graft.operators.Dedup.loadLineIndex(docs.sparkSession, dir)
        require(artifactForm == cfg.lineDedupKey,
          s"StreamCuration.run: line index at $dir was built with " +
            s"keyForm '$artifactForm' but cfg.lineDedupKey is " +
            s"'${cfg.lineDedupKey}' — probing with a different form " +
            "silently misses every duplicate; rebuild the index or fix " +
            "the config")
        arr
      })
    resolvedLineIndex.foreach { index =>
      // incremental boilerplate-LINE scrub against a frozen reference
      // index (Dedup.lineDedupIndex, built batch-side) — the same
      // row-local PositionsInSortedSet discipline as the span stage,
      // run FIRST (coarse line-level boilerplate before token-level
      // spans); fully-boilerplate docs drop like the span stage's
      // emptied docs
      val others = cur.columns.filter(c => c != idCol && c != textCol).toSeq
      val reserved = Set("n_lines", "removed_lines", "clean_text",
        "lines", "__hits")
      val clash = others.filter(reserved)
      require(clash.isEmpty,
        s"StreamCuration.run lineIndex stage: column(s) ${clash.mkString(", ")} " +
          "collide with the line scrub's output names — rename them " +
          "upstream of the gate")
      cur = graft.operators.Dedup
        .lineDedupInline(cur, idCol, textCol, index, keepCols = others,
          keyForm = cfg.lineDedupKey)
        .where(col("clean_text") =!= "")
        .withColumnRenamed("clean_text", textCol)
        .select((idCol +: textCol +: others).map(col): _*)
    }

    // dir form resolves at plan-build through the mtime-keyed registry
    // and carries its own (w, divisor, kernel, keyForm) — neither the
    // geometry nor the key form can silently mismatch the artifact
    // (the spanIndexDir contract; keyForm read-from-artifact since r14)
    val resolvedCdc: Option[(Int, Int, String, String, Array[Long])] =
      cdcIndex.orElse(cdcIndexDir.map(dir =>
        graft.operators.Dedup.loadCdcChunkIndex(docs.sparkSession, dir)))
    resolvedCdc.foreach { case (w, divisor, kernel, cdcKeyForm, index) =>
      // incremental CDC-chunk scrub against a frozen reference hot-chunk
      // index (Dedup.cdcChunkIndex, built batch-side) — the granularity
      // ladder's middle rung: after the coarse line gate, before the
      // token-level span gate. Same row-local PositionsInSortedSet
      // discipline; fully-boilerplate docs drop like the other gates.
      val others = cur.columns.filter(c => c != idCol && c != textCol).toSeq
      val reserved = Set("n_chunks", "n_dropped", "clean_text",
        "chunks", "__hits")
      val clash = others.filter(reserved)
      require(clash.isEmpty,
        s"StreamCuration.run cdcIndex stage: column(s) ${clash.mkString(", ")} " +
          "collide with the chunk scrub's output names — rename them " +
          "upstream of the gate")
      cur = graft.operators.Dedup
        .cdcChunkDedupInline(cur, idCol, textCol, w, divisor, index,
          keepCols = others, kernel = kernel, keyForm = cdcKeyForm)
        .where(col("clean_text") =!= "")
        .withColumnRenamed("clean_text", textCol)
        .select((idCol +: textCol +: others).map(col): _*)
    }

    resolvedIndex.foreach { case (idxN, idxForm, index) =>
      // incremental dup-span scrub against a FROZEN reference-corpus
      // gram index (Dedup.dupSpanIndex, built batch-side): row-local
      // PositionsInSortedSet probe + in-row island fold — stateless, no
      // join/agg/state, streaming-compatible as-is; emptied docs drop
      // like the batch dupSpanN stage. Non-text columns ride the scrub
      // projection (keepCols), so this stays a pure row-local map.
      val others = cur.columns.filter(c => c != idCol && c != textCol).toSeq
      // the scrub's own output/working names would collide with a
      // same-named rider column and fail ambiguously downstream — fail
      // loud here with the fix in the message
      val reserved = Set("n_tokens", "n_spans", "removed_tokens",
        "clean_text", "toks", "__hits", "__isl")
      val clash = others.filter(reserved)
      require(clash.isEmpty,
        s"StreamCuration.run spanIndex stage: column(s) ${clash.mkString(", ")} " +
          "collide with the span scrub's output names — rename them " +
          "upstream of the gate")
      cur = graft.operators.Dedup
        .dupSpanScrubInline(cur, idCol, textCol, idxN, index,
          keepCols = others, keyForm = idxForm)
        .where(col("clean_text") =!= "")
        .withColumnRenamed("clean_text", textCol)
        .select((idCol +: textCol +: others).map(col): _*)
    }

    cfg.decontaminateBench.foreach { bench =>
      val grams = graft.operators.Decontaminate.benchGramSet(
        bench, idCol, textCol, cfg.decontaminateN)
      cur = graft.operators.Decontaminate.cleanCorpusInline(
        cur, grams, textCol, cfg.decontaminateN)
    }

    if (cfg.blocklist.nonEmpty)
      cur = blocklistGateStream(cur, textCol, cfg.blocklist)

    if (cfg.repetitionRules) {
      // the SAME Quality.repetitionFlags as batch Curate.run — row-local
      // (one projection, no state), so it streams unchanged; evidence
      // columns are dropped exactly as in the batch stage
      cur = graft.operators.Quality.repetitionFlags(cur, idCol, textCol)
        .where(col("pass_rep"))
        .select(cur.columns.map(col).toSeq: _*)
    }

    cur = cur.withColumn("n_tok",
        size(graft.functions.TextFunctions.wsTokens(col(textCol))).cast("long"))
      .where(col("n_tok") >= cfg.minTokens && col("n_tok") <= cfg.maxTokens)

    cfg.dsirTarget.foreach { _ =>
      val scores = dsirScores.getOrElse(sys.error(
        "StreamCuration.run: cfg.dsirTarget is set but no frozen " +
          "dsirScores artifact was given — train batch-side " +
          "(Dsir.bucketScoreTable + collectScores) and pass the scores"))
      cur = dsirGateStream(cur, idCol, textCol, scores, dsirMinMeanScore)
    }

    cur
  }

  /** Decontaminate a streaming corpus against a STATIC benchmark table:
    * each micro-batch drops docs sharing >= minShared word-n-grams with
    * the bench set ([[Decontaminate.cleanCorpus]] per batch — the gram
    * aggregation needs a batch context; the bench gram set broadcasts
    * exactly as in the batch path).
    */
  def decontaminate(
      docs: DataFrame,          // streaming: (idCol, textCol, ...)
      bench: DataFrame,         // static benchmark table
      idCol: String, textCol: String, n: Int, minShared: Int = 1,
      trigger: Trigger = Trigger.ProcessingTime(0L))(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          sink(Decontaminate.cleanCorpus(batch, bench, idCol, textCol, n, minShared),
            epochId)
        }
      }
}
