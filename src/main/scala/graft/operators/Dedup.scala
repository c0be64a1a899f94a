package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for a large-scale training-data pipeline.
  *
  * Scale design: every variant except the quadratic baselines goes through
  * candidate generation (hash-groupBy or LSH band bucketing) so the pair
  * join touches only colliding keys — never the O(n²) cross product. Band
  * keys are the shuffle keys; at 100 TB the skew concern is a degenerate
  * band (e.g., millions of identical boilerplate docs) — the `maxBucketSize`
  * / `maxDocFreq` caps drop those buckets/grams before the self-join
  * (identical docs belong to [[exact]] dedup first).
  */
object Dedup {

  /** Keep only rows whose key-group has size in [2, cap]: a singleton
    * group can never produce an (a, b) pair in the self-join that follows,
    * and an over-cap group is the declared skew drop (boilerplate bucket /
    * stop-gram). Group sizes come from a hash aggregate (map-side
    * combinable — the shuffle carries one partial count per distinct key
    * per task, not the full relation) + a semi-join back; the window form
    * (`count().over(partitionBy(keys))`) shuffles AND sorts the entire
    * relation for the same answer, which is why it lost its spot here.
    */
  private def sizeBounded(df: DataFrame, keys: Seq[String],
      cap: Option[Int]): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("gsz"))
      .where(col("gsz") >= 2)
    val keep = cap.fold(counts)(c => counts.where(col("gsz") <= c))
      .select(keys.map(col): _*)
    // `keep` is |buckets|-scale — unbounded at 100 TB, so never leave it
    // to a size-estimate broadcast (the cached upstream's pre-
    // materialization stats can look tiny). SHUFFLE_HASH build on the
    // UNIQUE-key side is bounded per partition, and the exchange of `df`
    // by `keys` it forces is reused by the pair join that follows on the
    // same keys.
    df.join(keep.hint("SHUFFLE_HASH"), keys, "left_semi")
  }

  /** THE exact-dedup normalization key — the one definition both the
    * batch groupBy ([[exact]]) and the streaming
    * `dropDuplicatesWithinWatermark` twin
    * ([[graft.streaming.StreamCuration.run]]) key on, so a future change
    * (e.g. switching to [[canonicalText]]) can never silently diverge the
    * two pipelines.
    */
  def exactKey(text: Column): Column = lower(trim(text))

  /** The three exact-dedup key forms by name — the ONE dispatch both
    * [[Curate.Config.exactDedupKey]] and the streaming twin resolve
    * through, so a form name can never mean different normalizations in
    * the two pipelines. All three are row-local (stream-safe):
    * "byte" = [[exactKey]] (lower+trim), "canonical" =
    * [[canonicalText]] (ASCII lower/punct-fold), "folded" =
    * [[graft.functions.TextFunctions.foldedText]] (NFC + accent fold +
    * lower — the multilingual key).
    */
  def exactKeyFor(form: String, text: Column): Column = form match {
    case "byte" => exactKey(text)
    case "canonical" => canonicalText(text)
    case "folded" => graft.functions.TextFunctions.foldedText(text)
    case other => throw new IllegalArgumentException(
      s"exactKeyFor: key form '$other' must be byte|canonical|folded")
  }

  /** [[exactKeyFor]] extended with the identity form — the dispatch the
    * FUZZY ladder's hash inputs go through (VERDICT r12 #2): minhash
    * shingles, line keys, CDC chunk keys and winnow grams historically
    * hashed the RAW text, so an NFC-vs-NFD republication that
    * [[exactFolded]] catches still evaded every fuzzy rung (CCNet
    * normalizes BEFORE hashing for exactly this reason — Wenzek et al.
    * 2019 §3.1). "raw" keeps each operator's historical bytes (and its
    * historical plan — the dispatch costs nothing unless asked for);
    * the other three forms are [[exactKeyFor]]'s, row-local and
    * stream-safe, so batch and streaming twins inherit identically.
    */
  def textKeyFor(form: String, text: Column): Column = form match {
    case "raw" => text
    case "byte" | "canonical" | "folded" => exactKeyFor(form, text)
    case other => throw new IllegalArgumentException(
      s"textKeyFor: key form '$other' must be raw|byte|canonical|folded")
  }

  /** Exact dedup by normalized text (hash-groupBy): one shuffle on the
    * group key; keeps the smallest id as the canonical representative.
    * Output: (id, norm_text, group_size) for every KEPT row of a dup group.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exactBy(df, idCol, exactKey(col(textCol)), "norm_text")

  /** The shared min-id-survivor pipeline both exact variants use: one
    * hash shuffle on the key, (survivor id, key, group_size) out.
    */
  private def exactBy(df: DataFrame, idCol: String, keyExpr: Column,
      keyName: String): DataFrame =
    df.select(col(idCol), keyExpr.as(keyName))
      .groupBy(keyName)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("group_size"))
      .select(col(idCol), col(keyName), col("group_size"))

  /** Chunk-level exact substring dedup — the within/cross-document
    * repeated-passage removal of published LLM pipelines (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * approximated on non-overlapping `k`-token chunks so each token
    * belongs to exactly one droppable unit): a chunk whose text appears
    * in MORE THAN `maxDocFreq` distinct documents is boilerplate and is
    * cut from every document; survivors are reassembled in original order.
    *
    * Scale shape: chunks shuffle as 60-bit md5 hashes, not strings; the
    * hot-chunk set comes from a map-side-combinable hash aggregate and the
    * drop is a left-anti on the already-shuffled hash key; reassembly is
    * one groupBy(id). Three shuffles total, all on hash/id keys — no
    * all-pairs anything. Output: (id, n_chunks, n_dropped, clean_text),
    * one row per input document (fully-boilerplate docs keep an empty
    * clean_text rather than vanishing).
    */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String, k: Int,
      maxDocFreq: Int = 1, keyForm: String = "raw"): DataFrame = {
    val toks = df.select(col(idCol), wsTokens(col(textCol)).as("toks"))
    val base = toks.select(col(idCol),
      greatest(((size(col("toks")) + (k - 1)) / k).cast("long"), lit(1L))
        .as("n_chunks"))
    val chunks = chunkExplode(toks, idCol, k, keyForm)
    val hot = chunks.groupBy(col("ch"))
      .agg(countDistinct(col(idCol)).as("dfreq"))
      .where(col("dfreq") > maxDocFreq)
      .select("ch")
    val kept = chunks.join(hot, Seq("ch"), "left_anti")
    // pos is unique per doc, so the struct sort is total (tie-break rule)
    val reassembled = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
        s => s.getField("chunk")), " ").as("clean_text"))
    base.join(reassembled, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** (pos, chunk, ch) rows for the fixed-k chunk family: `ch` hashes
    * the `keyForm`-folded chunk (per-token fold, [[cdcTokenKey]] — the
    * [[cdcKeyedChunks]] key-vs-output discipline at fixed-k
    * granularity; fold preserves token arity so the keyed slices align
    * with the original slices position for position) while `chunk`
    * keeps the ORIGINAL tokens for the rebuild. "raw" takes the
    * historical single-array plan (zero plan change — the
    * cdcChunkDedup r14 rule). The folded array is projected as an
    * ATTRIBUTE before slicing (chunksOfTokens slices inside a
    * per-chunk lambda — an inline fold would re-run the whole
    * per-token fold once per chunk position, the ngramsOfTokens trap).
    */
  private def chunkExplode(toks: DataFrame, idCol: String, k: Int,
      keyForm: String): DataFrame = {
    if (keyForm == "raw")
      toks.select(col(idCol),
          posexplode(chunksOfTokens(col("toks"), k)).as(Seq("pos", "chunk")))
        .withColumn("ch", md5Low60(col("chunk")))
    else
      toks.select(col(idCol), col("toks"),
          cdcKeyToks(col("toks"), keyForm).as("ktoks"))
        .select(col(idCol), posexplode(arrays_zip(
          chunksOfTokens(col("toks"), k).as("c"),
          chunksOfTokens(col("ktoks"), k).as("kc")))
          .as(Seq("pos", "zc")))
        .select(col(idCol), col("pos"),
          col("zc").getField("c").as("chunk"),
          md5Low60(col("zc").getField("kc")).as("ch"))
  }

  /** LINE-level exact dedup — the RefinedWeb / MassiveText boilerplate
    * scrub (Penedo et al. 2023 §4.2 line-wise corrections; Rae et al.
    * 2021 §A1.1 repetition context): a line whose normalized form
    * ([[exactKey]]) appears in >= `minDocs` DISTINCT documents is
    * boilerplate (nav bars, cookie banners, copyright footers) and is
    * removed from EVERY document. Within-doc repetition is deliberately
    * untouched (that is [[graft.operators.Quality.repetitionFlags]]'s
    * axis — a line repeated 50× inside one doc but nowhere else is a
    * quality problem, not corpus boilerplate), and whitespace-only lines
    * never count as duplicates (every doc has them; removing them would
    * destroy paragraph structure).
    *
    * Scale shape = [[chunkDedup]]: lines shuffle as 60-bit md5 hashes of
    * the normalized key (never the strings), the hot set comes from a
    * map-side-combinable distinct-doc aggregate, the drop is a left-anti
    * on the already-shuffled hash key, and reassembly is one
    * groupBy(id). Three hash/id-key shuffles, no all-pairs anything.
    * Output: (id, n_lines, removed_lines, clean_text), one row per input
    * document (a fully-boilerplate doc keeps an empty clean_text).
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2, keyForm: String = "byte"): DataFrame = {
    require(minDocs >= 2, s"lineDedup: minDocs $minDocs must be >= 2")
    // null text coalesces to one blank line so the one-row-per-input-doc
    // contract holds (posexplode of a null array would drop the doc).
    // keyForm folds the line KEY only (historical default: "byte" =
    // lower+trim); output lines stay the ORIGINAL bytes — "folded"
    // makes NFC/NFD-variant boilerplate collide (q189, VERDICT r12 #2)
    val lines = df
      .select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("pos", "line")))
      .withColumn("lh", md5Low60(textKeyFor(keyForm, col("line"))))
    val base = lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
    val hot = lines.where(trim(col("line")) =!= "")
      .groupBy(col("lh")).agg(countDistinct(col(idCol)).as("dfreq"))
      .where(col("dfreq") >= minDocs).select("lh")
    val kept = lines.join(hot, Seq("lh"), "left_anti")
    // pos is unique per doc, so the struct sort is total (tie-break rule)
    val reassembled = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
        s => s.getField("line")), "\n").as("clean_text"))
    base.join(reassembled, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("removed_lines"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Frozen BOILERPLATE-LINE index from a reference corpus — the
    * [[dupSpanIndex]] discipline at line granularity: the sorted 60-bit
    * hashes of every normalized line in >= `minDocs` distinct reference
    * documents, for gating NEW data row-locally ([[lineDedupInline]]).
    * Engine-sorted (TakeOrdered via orderBy+limit, never a driver
    * sort), capped fail-loud: the inline gate is for a bounded
    * boilerplate set (and real boilerplate IS bounded — it is the
    * text that repeats verbatim across a corpus); past the cap, run
    * [[lineDedup]] on the unioned corpus instead.
    */
  def lineDedupIndex(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2, maxLines: Int = 1 << 20,
      keyForm: String = "byte"): Array[Long] = {
    require(minDocs >= 2, s"lineDedupIndex: minDocs $minDocs must be >= 2")
    val lhs = df
      .select(col(idCol), explode(split(col(textCol), "\n")).as("line"))
      .where(trim(col("line")) =!= "")
      .select(col(idCol), md5Low60(textKeyFor(keyForm, col("line"))).as("lh"))
      .groupBy(col("lh")).agg(countDistinct(col(idCol)).as("dfreq"))
      .where(col("dfreq") >= minDocs)
      .select("lh").orderBy("lh").limit(maxLines + 1)
      .collect().map(_.getLong(0))
    require(lhs.length <= maxLines,
      s"lineDedupIndex: more than $maxLines boilerplate lines — too big " +
        "for the inline gate; run lineDedup on the unioned corpus instead")
    lhs
  }

  /** Incremental line scrub of NEW data against a frozen
    * [[lineDedupIndex]]: every line whose normalized-key hash is IN the
    * index is known reference-corpus boilerplate and is removed (the
    * delete-everywhere policy of [[lineDedup]], applied across the
    * corpus boundary). ROW-LOCAL — the probe is the same
    * `PositionsInSortedSet` codegen gate as [[dupSpanScrubInline]] (the
    * index lives once per executor and rides the expression), the
    * rebuild an indexed filter — no join, no aggregation, no state, so
    * the SAME plan runs batch and inside a streaming query. Lines
    * duplicated only WITHIN the new batch are not removed (they are not
    * in the frozen index — the q158 B-internal-dup contract; catch them
    * with a periodic [[lineDedup]] over the union). Output:
    * (id, n_lines, removed_lines, clean_text) — [[lineDedup]]'s
    * contract.
    */
  def lineDedupInline(df: DataFrame, idCol: String, textCol: String,
      index: Array[Long], keepCols: Seq[String] = Nil,
      keyForm: String = "byte"): DataFrame = {
    require(index.nonEmpty, "lineDedupInline: empty index")
    import graft.functions.expressions.TextHashExpressions
    val keep = keepCols.map(col)
    val linesDf = df.select(
      col(idCol) +: split(coalesce(col(textCol), lit("")), "\n").as("lines") +:
        keep: _*)
    // keyForm must match the index build's (the SigMeta discipline is
    // the caller's here: the line-index artifact predates the dispatch)
    val hashes = transform(col("lines"), l => md5Low60(textKeyFor(keyForm, l)))
    linesDf
      .withColumn("__hits",
        TextHashExpressions.positionsInSortedSet(hashes, index))
      .select(col(idCol) +:
        size(col("lines")).cast("long").as("n_lines") +:
        size(col("__hits")).cast("long").as("removed_lines") +:
        array_join(filter(col("lines"), (l: Column, i: Column) =>
          !array_contains(col("__hits"), i)), "\n").as("clean_text") +:
        keep: _*)
  }

  /** [[exact]] on the CANONICAL key ([[canonicalText]] — lowercase,
    * punctuation/whitespace-insensitive): the CCNet normalization step
    * before exact dedup, catching re-punctuated/re-cased republications
    * a byte-level key misses. Same one-hash-shuffle shape. Output:
    * (idCol = min-id survivor, canon, group_size).
    */
  def exactCanonical(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exactBy(df, idCol, canonicalText(col(textCol)), "canon")

  /** [[exact]] on the UNICODE-FOLDED key
    * ([[graft.functions.TextFunctions.foldedText]] — NFC, accents
    * dropped, lowercased): the multilingual-crawl rung of the exact
    * ladder, catching composed-vs-decomposed republications ("café" in
    * NFC vs NFD are byte-different) and diacritic-stripped mirrors that
    * both the byte key ([[exact]]) and the ASCII canonical key
    * ([[exactCanonical]] — which DELETES non-ASCII letters outright,
    * collapsing unrelated CJK text) mishandle. Same one-hash-shuffle
    * shape; the fold is row-local codegen with an ASCII fast path, so
    * the rung costs nothing on English-dominant corpora. Output:
    * (idCol = min-id survivor, folded, group_size).
    */
  def exactFolded(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exactBy(df, idCol,
      graft.functions.TextFunctions.foldedText(col(textCol)), "folded")

  /** FIRST-OCCURRENCE-KEPT span dedup — the other half of the Lee et al.
    * (2022) exact-substring policy: where [[chunkDedup]] deletes a
    * boilerplate chunk from EVERY document, this keeps each duplicated
    * k-token chunk's EARLIEST corpus occurrence (minimum (id, pos)) and
    * removes only the later copies — corpus content survives exactly
    * once, so no text is lost, only repetition (the RefinedWeb /
    * dedup-before-training discipline).
    *
    * Same scale shape as [[chunkDedup]]: chunk hash → one hash-key
    * shuffle for the min-occurrence agg, an equi-join back on the same
    * key, one groupBy(id) reassembly — never all-pairs. The occurrence
    * order is the exact integer `id·posCap + pos` (`idCol` must be a
    * non-negative integral id); the row-path guard fails loud on
    * `pos >= posCap` or an id large enough to overflow the composite,
    * rather than silently mis-ranking. Output: (id, n_chunks,
    * n_dropped, clean_text) — [[chunkDedup]]'s contract.
    */
  def chunkDedupKeepFirst(df: DataFrame, idCol: String, textCol: String,
      k: Int, posCap: Long = 1L << 20, keyForm: String = "raw"): DataFrame = {
    require(k >= 1, s"chunkDedupKeepFirst: k $k must be >= 1")
    require(posCap >= 2, s"chunkDedupKeepFirst: posCap $posCap must be >= 2")
    val toks = df.select(col(idCol), wsTokens(col(textCol)).as("toks"))
    val base = toks.select(col(idCol),
      greatest(((size(col("toks")) + (k - 1)) / k).cast("long"), lit(1L))
        .as("n_chunks"))
    val idL = col(idCol).cast("long")
    val chunks = chunkExplode(toks, idCol, k, keyForm)
      .withColumn("occ",
        when(col("pos") < lit(posCap) && idL >= 0 &&
            idL < lit(Long.MaxValue / posCap),
          idL * lit(posCap) + col("pos"))
          .otherwise(raise_error(concat(
            lit(s"chunkDedupKeepFirst: (id, pos) = ("), idL.cast("string"),
            lit(", "), col("pos").cast("string"),
            lit(s") outside the posCap=$posCap composite-order domain")))))
    val first = chunks.groupBy(col("ch")).agg(min(col("occ")).as("first_occ"))
    val kept = chunks.join(first, Seq("ch"))
      .where(col("occ") === col("first_occ"))
    val reassembled = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
        s => s.getField("chunk")), " ").as("clean_text"))
    base.join(reassembled, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** CONTENT-DEFINED chunking dedup — the rsync / LBFS discipline
    * (Muthitacharoen et al. 2001; FastCDC, Xia et al. 2016) applied to
    * token streams: a chunk boundary falls after token `i` whenever the
    * 60-bit hash of the `w`-token window ENDING at `i` lands in the
    * divisor-0 residue class (expected chunk length ≈ `divisor`
    * tokens), plus a forced final cut. Because boundaries depend only
    * on LOCAL content, an insertion or a variable-length prefix shifts
    * only the chunk containing it — downstream boundaries resynchronize
    * within `w` tokens, so a passage repeated at ARBITRARY unaligned
    * offsets still yields identical interior chunks corpus-wide.
    * Fixed-`k` [[chunkDedup]] misses exactly that case (boundaries are
    * position-aligned; DedupSpec pins the contrast); [[dupSpanScrub]]
    * catches it at n× token blowup — CDC catches it at 1× (each token
    * in one chunk), the cheap middle of the dedup-granularity ladder.
    *
    * Policy and output match [[chunkDedup]]: a chunk in more than
    * `maxDocFreq` distinct docs is boilerplate and cut from EVERY doc;
    * survivors reassemble in order → (id, n_chunks, n_dropped,
    * clean_text). Scale shape: boundary detection and chunk building
    * are ROW-LOCAL higher-order expressions (no explode of grams);
    * then [[chunkDedup]]'s three hash/id-key shuffles.
    */
  def cdcChunkDedup(df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, divisor: Int = 8, maxDocFreq: Int = 1,
      kernel: String = "md5", keyForm: String = "raw"): DataFrame = {
    require(w >= 1, s"cdcChunkDedup: w $w must be >= 1")
    require(divisor >= 2, s"cdcChunkDedup: divisor $divisor must be >= 2")
    require(kernel == "md5" || kernel == "gear",
      s"cdcChunkDedup: kernel '$kernel' must be 'md5' or 'gear'")
    val toks = df.select(col(idCol), wsTokens(col(textCol)).as("toks"))
    // chunk building is a NATIVE kernel (one pass: token bytes once) —
    // the declarative zip_with twin (TextFunctions.cdcChunksFold,
    // bit-parity-pinned) re-inlines the token split per gram in the
    // interpreted higher-order path, which measured as ONE 10× scan
    // task pinning a core for 15+ minutes. kernel="md5" (default) is
    // the oracle-parity form (one digest per window, q174's DuckDB twin
    // replays it); kernel="gear" is the FastCDC rolling-hash scale form
    // (O(1) per position — different cut positions, same chunk
    // contract; SCALE.md carries the A/B). keyForm != "raw" computes
    // boundaries AND chunk identity on per-token-folded tokens while
    // output text keeps the ORIGINAL tokens — see [[cdcKeyedChunks]].
    // raw keeps the pre-r13 direct-explode plan (key == chunk — no
    // struct duplication of the chunk bytes through the explode;
    // VERDICT r13 #4); keyed forms pay the (key, chunk) pairing only
    // when asked for
    val (base, ex) = if (keyForm == "raw") {
      val withChunks = toks.select(col(idCol),
        cdcKernelChunks(col("toks"), w, divisor, kernel).as("chunks"))
      (withChunks.select(col(idCol),
        size(col("chunks")).cast("long").as("n_chunks")),
        withChunks
          .select(col(idCol), posexplode(col("chunks")).as(Seq("pos", "chunk")))
          .select(col(idCol), col("pos"),
            md5Low60(col("chunk")).as("ch"), col("chunk")))
    } else {
      val withChunks = toks.select(col(idCol),
        cdcKeyedChunks(col("toks"), w, divisor, kernel, keyForm).as("chunks"))
      (withChunks.select(col(idCol),
        size(col("chunks")).cast("long").as("n_chunks")),
        withChunks
          .select(col(idCol), posexplode(col("chunks")).as(Seq("pos", "kc")))
          .select(col(idCol), col("pos"),
            md5Low60(col("kc").getField("key")).as("ch"),
            col("kc").getField("chunk").as("chunk")))
    }
    val hot = ex.groupBy(col("ch"))
      .agg(countDistinct(col(idCol)).as("dfreq"))
      .where(col("dfreq") > maxDocFreq)
      .select("ch")
    val kept = ex.join(hot, Seq("ch"), "left_anti")
    val reassembled = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
        s => s.getField("chunk")), " ").as("clean_text"))
    base.join(reassembled, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Frozen HOT-CDC-CHUNK index from a reference corpus — the
    * [[lineDedupIndex]] discipline at content-defined-chunk granularity,
    * the missing middle rung of the q158/q169 incremental ladder (span →
    * line → chunk): the sorted 60-bit hashes of every CDC chunk
    * appearing in more than `maxDocFreq` distinct reference documents
    * ([[cdcChunkDedup]]'s delete-everywhere boilerplate policy), for
    * gating NEW data row-locally ([[cdcChunkDedupInline]]) without
    * re-running the corpus-wide pass. Geometry (`w`, `divisor`) is the
    * probe contract — persist with [[saveCdcChunkIndex]] so a loader can
    * never chunk new data under a different geometry than the index was
    * built with. Engine-sorted, capped fail-loud: real cross-document
    * boilerplate is bounded; past the cap, run [[cdcChunkDedup]] on the
    * unioned corpus instead.
    */
  def cdcChunkIndex(df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, divisor: Int = 8, maxDocFreq: Int = 1,
      maxChunks: Int = 1 << 20, kernel: String = "md5",
      keyForm: String = "raw"): Array[Long] = {
    require(w >= 1, s"cdcChunkIndex: w $w must be >= 1")
    require(divisor >= 2, s"cdcChunkIndex: divisor $divisor must be >= 2")
    require(maxDocFreq >= 1, s"cdcChunkIndex: maxDocFreq $maxDocFreq must be >= 1")
    require(kernel == "md5" || kernel == "gear",
      s"cdcChunkIndex: kernel '$kernel' must be 'md5' or 'gear'")
    // index build needs KEY chunks only (no text rebuild): fold tokens,
    // chunk, hash — the gate probing it must use the same keyForm
    val chunks = df
      .select(col(idCol), cdcKernelChunks(
          cdcKeyToks(wsTokens(col(textCol)), keyForm), w, divisor, kernel)
        .as("chunks"))
      .select(col(idCol), explode(col("chunks")).as("chunk"))
      .select(col(idCol), md5Low60(col("chunk")).as("ch"))
      .groupBy(col("ch")).agg(countDistinct(col(idCol)).as("dfreq"))
      .where(col("dfreq") > maxDocFreq)
      .select("ch").orderBy("ch").limit(maxChunks + 1)
      .collect().map(_.getLong(0))
    require(chunks.length <= maxChunks,
      s"cdcChunkIndex: more than $maxChunks hot chunks — too big for " +
        "the inline gate; run cdcChunkDedup on the unioned corpus instead")
    chunks
  }

  /** Incremental CDC-chunk scrub of NEW data against a frozen
    * [[cdcChunkIndex]]: new data is chunked under the SAME (w, divisor)
    * geometry (content-defined boundaries resynchronize regardless of
    * surrounding offsets — that is the point of CDC), and every chunk
    * whose hash is IN the index is known reference-corpus boilerplate
    * and removed ([[cdcChunkDedup]]'s delete-everywhere policy across
    * the corpus boundary). ROW-LOCAL — the native [[CdcChunks]] kernel
    * plus the PositionsInSortedSet codegen probe; no join, no
    * aggregation, no state, so the SAME plan runs batch and inside a
    * streaming query ([[graft.streaming.StreamCuration]]'s cdc stage).
    * Chunks duplicated only WITHIN the new batch are not removed (not
    * in the frozen index — the q158/q169 B-internal-dup contract; a
    * periodic [[cdcChunkDedup]] over the union catches them). Output:
    * (id, n_chunks, n_dropped, clean_text) — [[cdcChunkDedup]]'s
    * contract.
    */
  /** The kernel dispatch every CDC entry point shares — chunks must be
    * built under the SAME kernel as the index that gates them.
    */
  private def cdcKernelChunks(toks: Column, w: Int, divisor: Int,
      kernel: String): Column =
    if (kernel == "gear")
      graft.functions.expressions.TextHashExpressions
        .cdcChunksGear(toks, w, divisor)
    else graft.functions.expressions.TextHashExpressions
      .cdcChunks(toks, w, divisor)

  /** The per-token key the CDC fold path hashes — [[textKeyFor]] with
    * any whitespace the form could mint stripped ("canonical" maps a
    * punctuation run INSIDE a token to a space; a key token containing
    * a space would break the chunk→token-count recovery below, so
    * within-token punctuation drops instead — byte/folded are
    * whitespace-free already and unaffected).
    */
  private def cdcTokenKey(form: String, tok: Column): Column =
    if (form == "raw") tok
    else regexp_replace(textKeyFor(form, tok), "\\s+", "")

  /** The folded token stream ("raw" passes the array through untouched —
    * zero plan change on the default path).
    */
  private def cdcKeyToks(toks: Column, keyForm: String): Column =
    if (keyForm == "raw") toks
    else transform(toks, t => cdcTokenKey(keyForm, t))

  /** (key, chunk) pairs for the CDC family: boundaries and chunk
    * IDENTITY are computed on the `keyForm`-folded token stream (fold
    * preserves token arity, so NFC/NFD-variant documents produce
    * byte-identical key streams → identical cut positions → identical
    * chunk keys — the whole point), while `chunk` keeps the ORIGINAL
    * tokens (the rewrite stages must emit the document's own text, the
    * [[lineDedup]] key-vs-output discipline). Token counts per key
    * chunk are recovered from the kernel's space-join contract
    * (separators between ALL written tokens, so `split(key, " ", -1)`
    * is exact even for empty folded tokens), and the original chunk is
    * the matching token-index slice.
    */
  private def cdcKeyedChunks(toks: Column, w: Int, divisor: Int,
      kernel: String, keyForm: String): Column = {
    // KEYED FORMS ONLY (r14): the "raw" path lives at the call sites as
    // the pre-r13 direct-explode plan (key == chunk — wrapping raw
    // chunks in struct(c, c) here rode every chunk's bytes twice
    // through the explode, the VERDICT r13 #4 plan regression)
    require(keyForm != "raw",
      "cdcKeyedChunks: raw takes the direct cdcKernelChunks path")
    val kchunks = cdcKernelChunks(cdcKeyToks(toks, keyForm), w, divisor,
      kernel)
    // start offsets: running sum of per-chunk token counts (offs has
    // size n+1; slice keeps the n starts)
    val offs = aggregate(
      transform(kchunks, c => size(split(c, " ", -1))),
      array(lit(0)),
      (acc, x) => concat(acc, array(element_at(acc, -1) + x)))
    zip_with(kchunks, slice(offs, lit(1), size(kchunks)),
      (kc, o) => struct(kc.as("key"),
        array_join(slice(toks, o + 1, size(split(kc, " ", -1))), " ")
          .as("chunk")))
  }

  def cdcChunkDedupInline(df: DataFrame, idCol: String, textCol: String,
      w: Int, divisor: Int, index: Array[Long],
      keepCols: Seq[String] = Nil, kernel: String = "md5",
      keyForm: String = "raw"): DataFrame = {
    require(index.nonEmpty, "cdcChunkDedupInline: empty index")
    require(kernel == "md5" || kernel == "gear",
      s"cdcChunkDedupInline: kernel '$kernel' must be 'md5' or 'gear'")
    import graft.functions.expressions.TextHashExpressions
    val keep = keepCols.map(col)
    // keyForm (and w/divisor/kernel) must match the index build's —
    // probe keys, rebuild from the original-token halves of the pairs.
    // raw keeps the pre-r13 direct plan (key == chunk, no struct
    // duplication — VERDICT r13 #4).
    val (chunksCol, hashesOf, chunkOf) =
      if (keyForm == "raw")
        (cdcKernelChunks(wsTokens(col(textCol)), w, divisor, kernel),
          (c: Column) => transform(c, x => md5Low60(x)),
          (c: Column) => c)
      else
        (cdcKeyedChunks(wsTokens(col(textCol)), w, divisor, kernel, keyForm),
          (c: Column) => transform(c, x => md5Low60(x.getField("key"))),
          (c: Column) => c.getField("chunk"))
    val chunksDf = df.select(
      col(idCol) +: chunksCol.as("chunks") +: keep: _*)
    chunksDf
      .withColumn("__hits",
        TextHashExpressions.positionsInSortedSet(hashesOf(col("chunks")), index))
      .select(col(idCol) +:
        size(col("chunks")).cast("long").as("n_chunks") +:
        size(col("__hits")).cast("long").as("n_dropped") +:
        array_join(transform(filter(col("chunks"), (c: Column, i: Column) =>
          !array_contains(col("__hits"), i)), c => chunkOf(c)), " ")
          .as("clean_text") +:
        keep: _*)
  }

  /** Duplicated-SPAN scrub — Lee et al. 2022 ("Deduplicating Training
    * Data Makes Language Models Better") ExactSubstr semantics at token
    * granularity: every OVERLAPPING n-token window occurring >= 2 times
    * anywhere in the corpus (any doc, any offset, including elsewhere in
    * the SAME doc) is removed at every occurrence EXCEPT its earliest
    * (minimum exact-integer id·posCap + pos, the [[chunkDedupKeepFirst]]
    * composite order), and a document's removed windows are union-merged
    * into covering token intervals — each duplicated passage survives
    * exactly once corpus-wide.
    *
    * This is the overlapping-window twin of [[chunkDedupKeepFirst]]:
    * chunk dedup only sees duplication ALIGNED to k-token chunk
    * boundaries, so a long passage re-quoted at offset +3 is invisible
    * to it and caught here (DedupSpec pins that exact case). Removal is
    * coverage-union: a token inside ANY removed window goes, even where
    * that window overlaps a kept first-occurrence span — the aggressive
    * cut of the paper's policy, deterministic under the composite order.
    *
    * Scale shape: positioned grams (row-local transform — n× token
    * blowup, the q98 gram-generation cost) → ONE hash-key shuffle for
    * the (min-occurrence, count) agg + an equi-join back on the same key
    * (exchange reused; unique-key side SHUFFLE_HASH-pinned off
    * size-estimate broadcasts), then a per-doc window over only the
    * REMOVED occurrences (duplication-bounded, not corpus-bounded) and a
    * row-local interval-filter rebuild via an indexed higher-order
    * filter — never all-pairs, never a corpus-wide sort, no token
    * re-explode for the rebuild.
    * Output: (id, n_tokens, n_spans, removed_tokens, clean_text).
    */
  def dupSpanScrub(df: DataFrame, idCol: String, textCol: String, n: Int,
      posCap: Long = 1L << 20, keyForm: String = "raw"): DataFrame = {
    require(n >= 1, s"dupSpanScrub: n $n must be >= 1")
    require(posCap >= 2, s"dupSpanScrub: posCap $posCap must be >= 2")
    val toks = df.select(col(idCol), wsTokens(col(textCol)).as("units"))
    spanScrubUnits(toks, idCol, n, posCap, " ", "dupSpanScrub", keyForm)
      .withColumnRenamed("n_units", "n_tokens")
      .withColumnRenamed("removed_units", "removed_tokens")
  }

  /** The unit-generic keep-first overlapping-span scrub engine behind
    * [[dupSpanScrub]] (units = whitespace tokens) and
    * [[C4.spanDedup]] (units = sentences). `units` must carry
    * (`idCol`, `units` array<string>); output is (id, n_units, n_spans,
    * removed_units, clean_text) with removed unit intervals
    * union-merged per doc and survivors rejoined with `sep`. One
    * hash-key shuffle for the (min-occurrence, count) agg, an equi-join
    * back on the same key (SHUFFLE_HASH off size-estimate broadcasts),
    * a duplication-bounded per-doc window, row-local interval rebuild.
    *
    * `keyForm` (r14, the [[cdcKeyedChunks]] discipline): gram KEYS are
    * hashed over the per-unit-folded stream ([[cdcTokenKey]] — fold
    * preserves unit arity, so window positions in the folded stream
    * index the ORIGINAL units 1:1), while the rebuild keeps each doc's
    * own bytes — an NFC/NFD-variant passage now collides at every
    * offset, and the output text is untouched. "raw" short-circuits to
    * the historical grams and plan.
    */
  private[operators] def spanScrubUnits(units: DataFrame, idCol: String,
      n: Int, posCap: Long, sep: String, opName: String,
      keyForm: String = "raw"): DataFrame = {
    val idL = col(idCol).cast("long")
    // Project the folded units as an ATTRIBUTE before gram building:
    // overlappingGrams references its array inside a per-element lambda,
    // so an inline fold would re-run the NFC+strip+lower pipeline once
    // per gram position — O(L^2) per doc (the ngramsOfTokens trap,
    // TextFunctions.scala; same shape as [[dupSpanIndex]]). "raw" keeps
    // the historical single-select plan untouched.
    val gramSrc =
      if (keyForm == "raw") units
      else units.select(col(idCol),
        cdcKeyToks(col("units"), keyForm).as("units"))
    val grams = gramSrc
      .select(col(idCol),
        posexplode(overlappingGrams(col("units"), n))
          .as(Seq("pos", "gram")))
      .withColumn("gh", md5Low60(col("gram")))
      .withColumn("occ",
        when(col("pos") < lit(posCap) && idL >= 0 &&
            idL < lit(Long.MaxValue / posCap),
          idL * lit(posCap) + col("pos"))
          .otherwise(raise_error(concat(
            lit(s"$opName: (id, pos) = ("), idL.cast("string"),
            lit(", "), col("pos").cast("string"),
            lit(s") outside the posCap=$posCap composite-order domain")))))
      .select(col(idCol), col("pos"), col("gh"), col("occ"))
    val firstOcc = grams.groupBy(col("gh"))
      .agg(min(col("occ")).as("first_occ"), count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2)
    val removed = grams
      .join(firstOcc.hint("SHUFFLE_HASH"), Seq("gh"))
      .where(col("occ") > col("first_occ"))
      .select(col(idCol), col("pos"), (col("pos") + n).as("end"))
    // Union-merge the removed windows per doc: an island starts where a
    // window's start clears every earlier window's max end (contiguity,
    // pos == pmax, continues the covered run — no gap, same island).
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val islands = removed
      .withColumn("pmax", max(col("end")).over(wPrev))
      .withColumn("ni",
        when(col("pmax").isNull || col("pos") > col("pmax"), 1L).otherwise(0L))
      .withColumn("isl", sum(col("ni")).over(wOrd))
      .groupBy(col(idCol), col("isl"))
      .agg(min(col("pos")).as("s"), max(col("end")).as("e"))
    val perDoc = islands.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_spans"),
      sum(col("e") - col("s")).cast("long").as("removed_units"),
      array_sort(collect_list(struct(col("s"), col("e")))).as("spans"))
    val emptySpans = array().cast("array<struct<s:int,e:int>>")
    units.join(perDoc.hint("SHUFFLE_HASH"), Seq(idCol), "left")
      .select(col(idCol),
        size(col("units")).cast("long").as("n_units"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("removed_units"), lit(0L)).as("removed_units"),
        array_join(filter(col("units"), (t: Column, i: Column) =>
          !exists(coalesce(col("spans"), emptySpans),
            s => i >= s.getField("s") && i < s.getField("e"))), sep)
          .as("clean_text"))
  }

  /** Frozen dup-span gram INDEX of a reference corpus: the SORTED
    * distinct md5-low-60 hashes of every overlapping n-token window —
    * the artifact an incremental/streaming span-dedup gate probes NEW
    * data against ([[dupSpanScrubInline]]; q61's incremental-minhash
    * discipline at gram granularity). Sorted by the engine
    * (TakeOrdered, never a driver sort), capped fail-loud like
    * `Decontaminate.benchGramSet`: the inline gate is for a bounded
    * reference window (a frozen snapshot shard, a day's partition); a
    * full corpus-vs-corpus pass is [[dupSpanScrub]] on the union.
    */
  def dupSpanIndex(df: DataFrame, textCol: String, n: Int,
      maxGrams: Int = 1 << 20, keyForm: String = "raw"): Array[Long] = {
    require(n >= 1, s"dupSpanIndex: n $n must be >= 1")
    // keyForm: grams hash the per-token-folded stream (the
    // [[spanScrubUnits]] r14 discipline) — the gate probing this index
    // must use the same form (persist with [[saveSpanIndex]] so the
    // artifact carries it)
    val ghs = df.select(cdcKeyToks(wsTokens(col(textCol)), keyForm).as("toks"))
      .select(explode(overlappingGrams(col("toks"), n)).as("gram"))
      .select(md5Low60(col("gram")).as("gh"))
      .distinct()
      .orderBy(col("gh"))
      .limit(maxGrams + 1)
      .collect().map(_.getLong(0))
    require(ghs.length <= maxGrams,
      s"dupSpanIndex: more than $maxGrams distinct grams — too big for " +
        "the inline gate; run dupSpanScrub on the unioned corpus instead")
    ghs
  }

  /** Persist a [[dupSpanIndex]] artifact: magic + window size `n` +
    * the sorted gram hashes, committed with a `_SUCCESS` marker (the
    * embedder-artifact discipline) — a partially written index must
    * never silently gate. Carrying `n` INSIDE the artifact means a
    * loader can never probe with a mismatched window geometry (the
    * signature-index SigMeta rule).
    */
  def saveSpanIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      n: Int, index: Array[Long], keyForm: String = "raw"): Unit = {
    require(n >= 1, s"saveSpanIndex: n $n must be >= 1")
    saveLongIndex(spark, dir, SpanIndexMagic, "span_index.bin", n, index,
      keyForm)
  }

  private val SpanIndexMagic = 0x5350414e // "SPAN"
  private val LineIndexMagic = 0x4c494e45 // "LINE"

  /** Shared writer for the hash-index artifact family (span/line/cdc):
    * magic + one meta int + the sorted hashes, PLUS an
    * `index_meta.json` sidecar carrying the key form (the minhash
    * SigMeta discipline, r14 — ADVICE r13: a folded-built index probed
    * with a defaulted "raw" silently misses every duplicate, so the
    * form must ride the artifact, not the caller), committed with a
    * `_SUCCESS` marker (the embedder-artifact discipline) — a partially
    * written index must never silently gate. `keyForm` is validated
    * against the [[textKeyFor]] vocabulary BEFORE any byte is written
    * (it is also interpolated into JSON — the enum check makes escaping
    * moot).
    */
  private def saveLongIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, magic: Int, file: String, meta: Int,
      index: Array[Long], keyForm: String): Unit = {
    textKeyFor(keyForm, lit("")) // fail-loud on an unknown form, pre-write
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p)
    val out = new java.io.DataOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(p, file), true))
    try {
      out.writeInt(magic)
      out.writeInt(meta)
      out.writeInt(index.length)
      index.foreach(out.writeLong)
    } finally out.close()
    val metaOut = fs.create(
      new org.apache.hadoop.fs.Path(p, "index_meta.json"), true)
    try metaOut.write(
      s"""{"keyForm":"$keyForm"}""".getBytes("UTF-8"))
    finally metaOut.close()
    fs.create(new org.apache.hadoop.fs.Path(p, "_SUCCESS"), true).close()
  }

  /** Shared loader — fail-loud `_SUCCESS`/magic checks, per-JVM cache
    * keyed by (magic, dir) on the marker mtime with ONE entry per dir
    * (re-saved artifact replaces its stale predecessor; a RESTARTED
    * stream rebuilding its plan picks up a regenerated artifact while a
    * RUNNING query keeps the snapshot it started with).
    */
  private def loadLongIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, magic: Int, file: String, what: String,
      defaultForm: String,
      assumeForm: Option[String] = None): (Int, String, Array[Long]) = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
    require(fs.exists(marker),
      s"no complete $what artifact at $dir (missing _SUCCESS)")
    val mtime = fs.getFileStatus(marker).getModificationTime
    val key = s"$magic:$dir"
    val v = spanIndexCache.get(key) match {
      case Some((m, cached)) if m == mtime => cached
      case _ =>
        val in = new java.io.DataInputStream(
          fs.open(new org.apache.hadoop.fs.Path(p, file)))
        val (meta, arr) = try {
          require(in.readInt() == magic,
            s"$dir/$file is not a graft $what artifact (bad magic)")
          val meta = in.readInt()
          val len = in.readInt()
          val arr = new Array[Long](len)
          var i = 0
          while (i < len) { arr(i) = in.readLong(); i += 1 }
          (meta, arr)
        } finally in.close()
        // pre-r14 artifacts have no sidecar and load as the key form
        // their builder defaulted to at the time (the SigMeta
        // missing-field rule: absence means "what the old code did",
        // never "whatever the caller says") — UNLESS the caller asserts
        // the build form (assumeForm, the loadLineIndex r15 escape
        // hatch for pre-r14 line artifacts built non-default)
        val metaPath = new org.apache.hadoop.fs.Path(p, "index_meta.json")
        val form = if (fs.exists(metaPath)) {
          val src = scala.io.Source.fromInputStream(fs.open(metaPath), "UTF-8")
          val txt = try src.mkString finally src.close()
          """"keyForm"\s*:\s*"([a-z]+)"""".r.findFirstMatchIn(txt)
            .map(_.group(1))
            .getOrElse(throw new IllegalArgumentException(
              s"$dir/index_meta.json has no keyForm field"))
        } else assumeForm.getOrElse(defaultForm)
        textKeyFor(form, lit("")) // fail-loud on a corrupt form, pre-use
        val fresh = (meta, form, arr)
        spanIndexCache.put(key, (mtime, fresh))
        fresh
    }
    // a caller ASSERTING the build form must agree with the resolved one
    // (sidecar, a prior caller's assertion now cached, or the default) —
    // a disagreement means the caller's config drifted from the
    // artifact, the silent-miss class the sidecar exists to kill. The
    // check sits OUTSIDE the mtime cache so a cache hit cannot skip it.
    assumeForm.filter(_ != v._2).foreach(a =>
      throw new IllegalArgumentException(
        s"$dir resolves to keyForm '${v._2}' but the caller asserted " +
          s"'$a' — rebuild the artifact or fix the caller"))
    v
  }

  /** Load a persisted span index: (n, keyForm, sorted hashes). Fails
    * loud on a missing `_SUCCESS` or wrong magic. Cached per JVM keyed
    * by the `_SUCCESS` modification time with ONE entry per dir (a
    * re-saved artifact replaces its stale predecessor — the
    * Embedder.Registry residency rule), so a RESTARTED stream rebuilding
    * its plan picks up a regenerated artifact while a RUNNING query
    * keeps the snapshot it started with (per-run frozen — the
    * reproducibility contract). A pre-r14 artifact (no sidecar) loads
    * as "raw" — the only form [[dupSpanIndex]] could build back then.
    */
  def loadSpanIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Int, String, Array[Long]) =
    loadLongIndex(spark, dir, SpanIndexMagic, "span_index.bin", "span-index",
      defaultForm = "raw")

  /** Persist a [[lineDedupIndex]] artifact — the [[saveSpanIndex]]
    * discipline with minDocs carried inside as the meta int (a loader
    * can report the policy the index was built under).
    */
  def saveLineIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      minDocs: Int, index: Array[Long], keyForm: String = "byte"): Unit = {
    require(minDocs >= 2, s"saveLineIndex: minDocs $minDocs must be >= 2")
    saveLongIndex(spark, dir, LineIndexMagic, "line_index.bin", minDocs,
      index, keyForm)
  }

  /** Load a persisted line index: (minDocs, keyForm, sorted hashes).
    * Same fail-loud + mtime-cache contract as [[loadSpanIndex]].
    *
    * CAVEAT (r15, unlike span/cdc): sidecar ABSENCE does NOT uniquely
    * determine a line index's build form — [[lineDedupIndex]] accepted
    * `keyForm` (byte/canonical/folded) BEFORE the r14 sidecar existed,
    * so a pre-r14 artifact built non-byte is indistinguishable from a
    * byte one. Absent a sidecar this loads as "byte" (the builder
    * default — right for the overwhelmingly common case); a caller who
    * KNOWS the pre-r14 build form must assert it via `assumeForm`
    * (`Some("folded")` etc.), which also cross-checks against the
    * RESOLVED form — the sidecar when one exists, or a prior caller's
    * cached resolution — and fails loud on disagreement. The
    * durable fix is re-saving the artifact once with the current
    * [[saveLineIndex]], which writes the sidecar.
    */
  def loadLineIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String,
      assumeForm: Option[String] = None): (Int, String, Array[Long]) =
    loadLongIndex(spark, dir, LineIndexMagic, "line_index.bin", "line-index",
      defaultForm = "byte", assumeForm = assumeForm)

  private val CdcIndexMagic = 0x43444349 // "CDCI"

  /** Persist a [[cdcChunkIndex]] artifact — the [[saveSpanIndex]]
    * discipline with the chunking GEOMETRY carried inside: `w` and
    * `divisor` pack into the shared writer's one meta int (16 bits
    * each), so [[cdcChunkDedupInline]] via [[loadCdcChunkIndex]] can
    * never probe with boundaries the index wasn't built under — the
    * SigMeta rule at chunk granularity.
    */
  def saveCdcChunkIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, w: Int, divisor: Int, index: Array[Long],
      kernel: String = "md5", keyForm: String = "raw"): Unit = {
    require(w >= 1 && w < (1 << 15),
      s"saveCdcChunkIndex: w $w must be in [1, 32767]")
    require(divisor >= 2 && divisor < (1 << 16),
      s"saveCdcChunkIndex: divisor $divisor must be in [2, 65535]")
    require(kernel == "md5" || kernel == "gear",
      s"saveCdcChunkIndex: kernel '$kernel' must be 'md5' or 'gear'")
    // kernel rides bit 31 of the meta int (0 = md5, so pre-kernel
    // artifacts load as the md5 form they were built with); keyForm
    // rides the JSON sidecar (r14 — no free meta bits, and the SigMeta
    // string form reads better than a packed enum anyway)
    val kBit = if (kernel == "gear") 1 << 31 else 0
    saveLongIndex(spark, dir, CdcIndexMagic, "cdc_chunk_index.bin",
      kBit | (w << 16) | divisor, index, keyForm)
  }

  /** Load a persisted CDC-chunk index: (w, divisor, kernel, keyForm,
    * sorted hashes). Same fail-loud + mtime-cache contract as
    * [[loadSpanIndex]]; kernel AND keyForm feed straight into
    * [[cdcChunkDedupInline]] so a gear-built or folded-built index can
    * never be probed under md5/raw chunking (different cut positions or
    * keys => silent misses — ADVICE r13). A pre-r14 artifact (no
    * sidecar) loads as "raw" — the only form [[cdcChunkIndex]] could
    * build before the sidecar existed.
    */
  def loadCdcChunkIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Int, Int, String, String, Array[Long]) = {
    val (meta, form, arr) = loadLongIndex(spark, dir, CdcIndexMagic,
      "cdc_chunk_index.bin", "cdc-chunk-index", defaultForm = "raw")
    val kernel = if ((meta & (1 << 31)) != 0) "gear" else "md5"
    ((meta >>> 16) & 0x7fff, meta & 0xffff, kernel, form, arr)
  }

  private val spanIndexCache =
    scala.collection.concurrent.TrieMap
      .empty[String, (Long, (Int, String, Array[Long]))]

  /** Incremental dup-span scrub of NEW data against a frozen
    * [[dupSpanIndex]]: every overlapping n-token window whose hash is IN
    * the index already exists in the reference corpus, so ALL its
    * occurrences here are removed (the reference copy is the kept one —
    * [[dupSpanScrub]]'s keep-first policy across the corpus boundary);
    * removed windows union-merge per doc exactly as in the batch form.
    *
    * ROW-LOCAL: the probe is the `PositionsInSortedSet` codegen sibling
    * of the q147 gate (the index lives once per executor and rides the
    * expression as a reference object), the island count/size is an
    * in-row fold over the ascending hit positions, and the rebuild is
    * the q153 indexed filter — no join, no aggregation, no state, so the
    * SAME plan runs batch and inside a streaming query. Output:
    * (id, n_tokens, n_spans, removed_tokens, clean_text) —
    * [[dupSpanScrub]]'s contract.
    *
    * `index` MUST be strictly ascending (the binary-search contract —
    * [[dupSpanIndex]] output satisfies it by construction); a hand-built
    * or concatenated array is asserted at plan-build time, driver-side,
    * rather than silently missing dup spans.
    */
  def dupSpanScrubInline(df: DataFrame, idCol: String, textCol: String,
      n: Int, index: Array[Long], keepCols: Seq[String] = Nil,
      keyForm: String = "raw"): DataFrame = {
    require(n >= 1, s"dupSpanScrubInline: n $n must be >= 1")
    require(index.nonEmpty, "dupSpanScrubInline: empty index")
    import graft.functions.expressions.TextHashExpressions
    val keep = keepCols.map(col)
    val toksDf0 = df.select(
      col(idCol) +: wsTokens(col(textCol)).as("toks") +: keep: _*)
    // keyForm must match the index build's ([[dupSpanIndex]]) — probe
    // hashes fold per token (arity preserved), the rebuild below keeps
    // the ORIGINAL tokens at the hit positions' complement. The folded
    // array is projected as an attribute FIRST (overlappingGrams
    // references it per gram position — an inline fold re-evaluates
    // O(L^2) per doc, the ngramsOfTokens trap); "raw" keeps the
    // historical plan with no extra projection.
    val (toksDf, gramToks) =
      if (keyForm == "raw") (toksDf0, col("toks"))
      else (toksDf0.withColumn("__ktoks", cdcKeyToks(col("toks"), keyForm)),
        col("__ktoks"))
    val hashes = transform(overlappingGrams(gramToks, n), g => md5Low60(g))
    // ascending hit positions (PositionsInSortedSet contract) fold to
    // (island count, union-covered size, running max end): p > me opens
    // an island (p == me touches the covered run — q153's merge rule);
    // covered tokens added = max(0, p+n - max(me, p)), exact under any
    // overlap because positions arrive sorted
    val folded = aggregate(col("__hits"),
      struct(lit(0L).as("ns"), lit(0L).as("rm"), lit(-1).as("me")),
      (acc, p) => struct(
        (acc.getField("ns") +
          when(acc.getField("me") < 0 || p > acc.getField("me"), 1L)
            .otherwise(0L)).as("ns"),
        (acc.getField("rm") +
          greatest(lit(0),
            (p + lit(n)) - greatest(acc.getField("me"), p)).cast("long"))
          .as("rm"),
        greatest(acc.getField("me"), p + lit(n)).as("me")))
    toksDf
      .withColumn("__hits",
        TextHashExpressions.positionsInSortedSet(hashes, index))
      .withColumn("__isl", folded)
      .select(col(idCol) +:
        size(col("toks")).cast("long").as("n_tokens") +:
        col("__isl.ns").as("n_spans") +:
        col("__isl.rm").as("removed_tokens") +:
        array_join(filter(col("toks"), (t: Column, i: Column) =>
          !exists(col("__hits"), p => i >= p && i < p + lit(n))), " ")
          .as("clean_text") +: keep: _*)
  }

  /** MAXIMAL duplicated substrings ≥ `minLen` tokens — the true
    * ExactSubstr policy of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better", §4.1: suffix-array maximal matches),
    * where [[dupSpanScrub]] is the fixed-n overlapping-window
    * approximation: a span [s, e) is emitted iff the token string
    * t[s..e) occurs ≥ 2 times in the corpus AND no extension of it does
    * — exact boundaries with one row per maximal match, not 43
    * overlapping windows for a 50-token duplicate.
    *
    * ALGORITHM (suffix-array semantics without building one): let R(i) =
    * the longest duplicated prefix of the suffix starting at i. Then the
    * maximal duplicated substrings are exactly
    * `[i, i+R(i)) where R(i) >= minLen and R(i-1) < R(i)+1`
    * (right-maximal by definition of R; left-extendable iff the previous
    * position reaches over it). R(i) only matters at SEED positions
    * (those whose `minLen`-gram is duplicated — every witness of a
    * longer duplicate is itself a seed), and equals the max
    * common-prefix with any other seed sharing the gram, which lex-sort
    * puts ADJACENT (the suffix-array neighbor property, applied per
    * gram-hash group): sort each group by its suffix slice, take
    * max(LCP(prev), LCP(next)) — never all-pairs.
    *
    * Scale shape: gram hash-agg (corpus-bounded, the q153 shuffle) →
    * seed join → island merge per doc (duplication-bounded) → ONE
    * lex-sort per gram group carrying suffix slices capped at
    * `min(maxSpan, island end − pos)` (R(i) provably never exceeds its
    * island, so the cap is lossless below `maxSpan`) → per-doc
    * left-maximality window. All equi-key; work ∝ duplicated content ×
    * slice cap. LCPs compare REAL tokens, so a 60-bit gram-hash
    * collision can add a group member but never a wrong span (the
    * `r >= minLen` filter drops it) — the span output is
    * collision-immune, stronger than the count-based scrubs.
    *
    * Caveats, both explicit: (1) matches longer than `maxSpan` report as
    * runs of maxSpan-capped spans (coverage unchanged — set `maxSpan`
    * above the longest duplication you care to delimit); (2) a
    * boilerplate gram repeated millions of times makes ONE sort group
    * (one task) — at corpus scale scrub boilerplate first
    * ([[chunkDedup]]), raise `minLen`, or set `maxGramFreq`: seed grams
    * occurring more than the cap leave the pipeline entirely (the
    * [[jaccardPairsPrefix]] hot-token discipline), WARN-logged with the
    * dropped-group count. The cap is LOSSY by declaration — spans
    * witnessed only by over-cap boilerplate grams are missed, and a
    * surviving span that STARTS inside a dropped hot run can report a
    * shorter extent (its left-maximality witness left with the hot
    * gram) — the explicit trade for bounding the largest sort group at
    * `maxGramFreq` rows.
    * Output: (id, s, e, len), one row per maximal span.
    */
  def maximalDupSpans(df: DataFrame, idCol: String, textCol: String,
      minLen: Int, maxSpan: Int = 256,
      maxGramFreq: Option[Long] = None, keyForm: String = "raw"): DataFrame = {
    require(minLen >= 1, s"maximalDupSpans: minLen $minLen must be >= 1")
    require(maxSpan >= minLen,
      s"maximalDupSpans: maxSpan $maxSpan must be >= minLen $minLen")
    require(maxGramFreq.forall(_ >= 2),
      s"maximalDupSpans: maxGramFreq $maxGramFreq must be >= 2")
    // keyForm (r14): BOTH the seed grams and the LCP suffix slices run
    // over the per-token-folded stream — the LCP must compare folded
    // tokens or an NFC-vs-NFD pair's equality breaks at every position
    // and r < minLen kills the span. Output is positions only, and the
    // fold preserves token arity, so folded positions index the
    // original text 1:1; "raw" is the identity (zero plan change).
    val toks = df.select(col(idCol),
      cdcKeyToks(wsTokens(col(textCol)), keyForm).as("toks"))
    val grams = toks
      .select(col(idCol),
        posexplode(overlappingGrams(col("toks"), minLen)).as(Seq("pos", "gram")))
      .withColumn("gh", md5Low60(col("gram")))
      .select(col(idCol), col("pos"), col("gh"))
    val dupAll = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("cnt")).where(col("cnt") >= 2)
    // skew cap (opt-in): the WARN evidence costs one extra gram-agg pass
    // (eager action, no cache left behind) — charged only when the
    // caller asked for the 100-TB skew cap; the cap-free default pays
    // nothing.
    val dup = maxGramFreq match {
      case None => dupAll.select("gh")
      case Some(cap) =>
        val hot = dupAll.where(col("cnt") > cap)
          .agg(count(lit(1)).as("n_hot"),
            coalesce(sum(col("cnt")), lit(0L)).as("occ"))
          .collect()(0)
        if (hot.getLong(0) > 0)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"maximalDupSpans: dropped ${hot.getLong(0)} hot grams " +
              s"(cnt > $cap, ${hot.getLong(1)} occurrences) — spans " +
              "witnessed only by boilerplate grams are MISSED " +
              "(losslessness broken by cap)")
        dupAll.where(col("cnt") <= cap).select("gh")
    }
    val seeds = grams.join(dup.hint("SHUFFLE_HASH"), Seq("gh"))
    // island merge (the q153 union rule) — R(i) <= its island's end, so
    // the suffix slice below never needs to reach past it
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val seeded = seeds
      .withColumn("end", col("pos") + minLen)
      .withColumn("pmax", max(col("end")).over(wPrev))
      .withColumn("ni",
        when(col("pmax").isNull || col("pos") > col("pmax"), 1L).otherwise(0L))
      .withColumn("isl", sum(col("ni")).over(wOrd))
      .withColumn("isl_end",
        max(col("end")).over(Window.partitionBy(col(idCol), col("isl"))))
      .select(col(idCol), col("pos"), col("gh"), col("isl_end"))
    val sliced = seeded.join(toks.hint("SHUFFLE_HASH"), Seq(idCol))
      .select(col(idCol), col("pos"), col("gh"),
        slice(col("toks"), col("pos") + 1,
          least(lit(maxSpan), col("isl_end") - col("pos"))).as("sfx"))
    // exact LCP on real tokens; zip_with pads the shorter side with
    // nulls -> false, array_position = 0 means "no mismatch" (equal up
    // to the shorter length)
    def lcp(a: Column, b: Column): Column = {
      val eq = zip_with(a, b, (x, y) => coalesce(x === y, lit(false)))
      val p = array_position(eq, lit(false))
      when(b.isNull, lit(0))
        .otherwise(when(p === 0, least(size(a), size(b)))
          .otherwise((p - 1).cast("int")))
    }
    val wG = Window.partitionBy(col("gh"))
      .orderBy(col("sfx"), col(idCol), col("pos"))
    val withR = sliced.withColumn("r",
      greatest(lcp(col("sfx"), lag(col("sfx"), 1).over(wG)),
        lcp(col("sfx"), lead(col("sfx"), 1).over(wG))))
      .where(col("r") >= minLen) // collision-immunity gate
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    withR
      .withColumn("ppos", lag(col("pos"), 1).over(wDoc))
      .withColumn("pr", lag(col("r"), 1).over(wDoc))
      .where(col("ppos").isNull || col("ppos") =!= col("pos") - 1 ||
        col("pr") < col("r") + 1)
      .select(col(idCol), col("pos").cast("long").as("s"),
        (col("pos") + col("r")).cast("long").as("e"),
        col("r").cast("long").as("len"))
  }

  /** MinHash signatures + LSH band keys for each row.
    * Output: (id, shingles, sig, bands). The signature is the codegen
    * [[graft.functions.expressions.MinHashSig]] — bit-identical to the
    * declarative `minhashSignature` fold (cross-checked in tests) at a
    * native H×n loop instead of H×n interpreted lambdas. `keyForm`
    * ([[textKeyFor]]) normalizes the text BEFORE shingling — "folded"
    * makes NFC/NFD and diacritic-variant republications shingle
    * identically (q188); the "raw" default keeps the historical bytes
    * and plan.
    */
  def minhashed(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, numHashes: Int = 16, bands: Int = 4,
      keyForm: String = "raw"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val r = numHashes / bands
    df.select(col(idCol),
        graft.functions.expressions.CharShinglesExpr(
          textKeyFor(keyForm, col(textCol)), shingleN).as("shingles"))
      .withColumn("sig", graft.functions.expressions.TextHashExpressions
        .minhashSigFromStrings(col("shingles"), numHashes))
      .withColumn("bands", bandKeys(col("sig"), bands, r))
  }

  /** MinHash+LSH near-dup pairs: shingle → minhash → band → bucket-join.
    * Only rows sharing a band key are ever paired; the distinct() collapses
    * pairs that collide in several bands. Output: (a, b, jac) with the
    * *exact* Jaccard of the distinct shingle sets, a < b.
    *
    * `persistIntermediates`: the signature relation feeds four plan legs
    * (two band-join sides, two shingle-verify sides); persisting computes
    * it once but the cached blocks live until the caller clears the cache
    * — use [[withMinhashPairs]] for owned cache lifetime.
    *
    * BATCH-ONLY EAGER since r15: the duplication-bounded candidate list
    * materializes at call time (`localCheckpoint`; the winnow-verify
    * contract) so the shingle-verify legs can be semi-joined down to
    * candidate endpoints instead of shuffling every doc's shingle array.
    * Streaming pipelines use [[minhashed]] /
    * [[graft.streaming.StreamDedup]], never this entry point.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, numHashes: Int = 16, bands: Int = 4,
      persistIntermediates: Boolean = true,
      maxBucketSize: Option[Int] = None,
      keyForm: String = "raw"): DataFrame =
    minhashPairsImpl(df, idCol, textCol, shingleN, numHashes, bands,
      persistIntermediates, maxBucketSize, keyForm)._1

  /** [[minhashPairs]] with OWNED cache lifetime: persists the signature
    * relation, runs `use`, and unpersists in finally — nothing stays
    * cached after the call (long-lived sessions / bench loops should use
    * this form; VERDICT r1 flagged the leaked blocks).
    */
  def withMinhashPairs[T](df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, numHashes: Int = 16, bands: Int = 4,
      maxBucketSize: Option[Int] = None, keyForm: String = "raw")
      (use: DataFrame => T): T = {
    val (pairs, cached) = minhashPairsImpl(df, idCol, textCol, shingleN,
      numHashes, bands, persistIntermediates = true, maxBucketSize, keyForm)
    // the r15 candidate materialization's blocks are owned here too:
    // freed with the signature cache, so `use` must CONSUME pairs inside
    // the block (the long-standing contract of this form)
    try use(pairs)
    finally {
      cached.foreach(_.unpersist(blocking = true))
      Graph.freeMaterialized(pairs, blocking = true)
    }
  }

  /** MinHash ESTIMATOR CALIBRATION — the report that justifies the
    * signature size before anyone trusts LSH verdicts at 100 TB: over
    * the band-join candidate pairs, a 2-D INTEGER histogram of
    * (estimated similarity = # agreeing signature slots of `numHashes`)
    * × (true Jaccard bucket = ⌊jac·numHashes⌋, exact set arithmetic).
    * A well-behaved estimator concentrates near the diagonal; mass far
    * off-diagonal at a given corpus says "spend more hashes" — measured,
    * not assumed. All-integer (slot-agreement counts, cross-multiplied
    * bucket), so the whole table is oracle-hashable. Both-null slots
    * (empty shingle sets) count as non-matching on both engines.
    * Output: (est_matches, jac_bucket, n_pairs), ordered.
    *
    * SCALE GUARD: wall time is linear in band-join CANDIDATES, which grow
    * superlinearly when band parameters are held fixed as the corpus
    * grows — this is a calibration TOOL (the thing that tells you to
    * retune), not a corpus-wide pass. At 100 TB run it on a sample
    * (`sampleFraction` — the histogram's diagonal shape is what matters,
    * and it is sampling-stable) or retune bands first; `maxCandidates`
    * fails loud (the [[dupSpanIndex]] cap discipline) instead of letting
    * a scheduled corpus-wide run quietly quadratic. The cap bounds
    * band-join pair SLOTS (Σ C(bucket, 2) over band buckets — the join's
    * actual output size, with band multiplicity), checked from bucket
    * sizes alone so a failing run never starts the join it guards.
    */
  def minhashCalibration(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, numHashes: Int = 16, bands: Int = 4,
      sampleFraction: Option[Double] = None,
      maxCandidates: Option[Long] = None, seed: Long = 42L): DataFrame = {
    sampleFraction.foreach(f => require(f > 0 && f <= 1,
      s"minhashCalibration: sampleFraction $f must be in (0, 1]"))
    val base = sampleFraction.map(f => df.sample(withReplacement = false,
      f, seed)).getOrElse(df)
    val mh = minhashed(base, idCol, textCol, shingleN, numHashes, bands).persist()
    val banded = mh.select(col(idCol),
      posexplode_outer(col("bands")).as(Seq("band_idx", "band_key")))
    val cand = banded.as("x").join(banded.as("y").hint("MERGE"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_key") === col("y.band_key") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .distinct()
    maxCandidates.foreach { cap =>
      require(cap >= 1, s"minhashCalibration: maxCandidates $cap must be >= 1")
      // guard BEFORE the join, from bucket sizes alone: Σ C(size, 2)
      // over band buckets counts candidate pair SLOTS — the band join's
      // actual output (with band multiplicity, ≥ distinct pairs), i.e.
      // the work the cap exists to bound — in one corpus-bounded
      // aggregation over |docs|·bands rows. (A limit-then-count over the
      // joined-then-distinct candidates could not short-circuit: the
      // dedup aggregate below the limit forces the full join first, and
      // an unpersisted pass would re-run it for the histogram.)
      // defensive null-key exclusion: a null band_key could never
      // satisfy the equality join below, so it is not a slot. (In
      // practice minhashed's bands are non-null even for null text —
      // empty shingles give all-null signature slots whose band keys
      // STILL equal each other, i.e. null-text docs are genuine
      // candidates and DO count; pinned in the guard spec.)
      val slots = banded.where(col("band_key").isNotNull)
        .groupBy("band_idx", "band_key")
        .agg(count(lit(1)).as("sz"))
        .agg(coalesce(sum(expr("sz * (sz - 1L) div 2L")), lit(0L)))
        .head().getLong(0)
      if (slots > cap) { mh.unpersist()
        throw new IllegalArgumentException(
          s"minhashCalibration: $slots band-join candidate pair slots " +
            s"exceed maxCandidates $cap " +
            "— run on a sample (sampleFraction) or retune bands first")
      }
    }
    val sides = mh.select(col(idCol), col("shingles"), col("sig"))
      .hint("SHUFFLE_HASH") // unique-key build side; never broadcast
    val j = cand
      .join(sides.toDF("a", "sha", "siga"), "a")
      .join(sides.toDF("b", "shb", "sigb"), "b")
    val inter = size(array_intersect(col("sha"), col("shb"))).cast("long")
    val out = j.select(
        aggregate(zip_with(col("siga"), col("sigb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("long").as("est_matches"),
        inter.as("inter"),
        (size(col("sha")) + size(col("shb"))).cast("long").as("szsum"))
      // integer div (never float-then-truncate): bucket = ⌊inter·H/union⌋.
      // DEGENERATE pairs — two docs whose shingle sets are BOTH empty
      // (text shorter than shingleN) band-join on equal all-null band
      // keys, giving inter = szsum = 0 and a 0-div-0 NULL bucket; they
      // are "identical empty sets", so they land in the TOP bucket
      // (jac = 1) instead of a null row that would NPE the retune's
      // histogram collect (ADVICE r11). The oracle twin coalesces the
      // same way.
      .select(col("est_matches"),
        coalesce(expr(s"(inter * $numHashes) div (szsum - inter)"),
          lit(numHashes.toLong)).as("jac_bucket"))
      .groupBy("est_matches", "jac_bucket")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("est_matches", "jac_bucket")
    out.persist().count() // bounded histogram; free the big input
    mh.unpersist()
    out
  }

  /** A retuned LSH band geometry: `bands` × `rowsPerBand` =
    * the signature's hash count; `recallPpm` = 1 − (1 − t^r)^b at the
    * target similarity, in ppm; `expectedCandidates` = the importance-
    * reweighted candidate-pair estimate under this geometry (see
    * [[minhashRetune]]).
    */
  case class LshGeometry(bands: Int, rowsPerBand: Int,
      recallPpm: Long, expectedCandidates: Long)

  /** CLOSE THE CALIBRATION LOOP — from a [[minhashCalibration]]
    * histogram to the (bands, rowsPerBand) to USE. SCALE.md measured the
    * problem this solves: at fixed band geometry the band-join candidate
    * set is ~quadratic in corpus size (25.9k → 4.56M → 368M at
    * 1×/10×/100×), and retuning 4×4 → 2×8 collapses the 10× candidates
    * −99.5%; until now that retune was a human reading the calibration
    * table. This operator does the reading:
    *
    *  1. The histogram's (jac_bucket, n_pairs) rows are OBSERVED
    *     candidates under the CURRENT geometry — biased toward pairs
    *     the current bands catch. Importance-reweight each bucket by
    *     1/p_cur(s) (s = the bucket's true-Jaccard midpoint,
    *     p_geom(s) = 1 − (1 − s^r)^b, the standard LSH S-curve) to
    *     estimate the underlying pair POPULATION — the denominator is
    *     never 0 because an observed bucket's midpoint is > 0.
    *  2. For every divisor geometry b·r = numHashes, estimate recall at
    *     `targetJaccard` and the expected candidate count
    *     Σ pop(s)·p_new(s).
    *  3. Pick the TIGHTEST recall-feasible geometry (min expected
    *     candidates among recall ≥ minRecall) — raising the target only
    *     grows the feasible set (recall is increasing in t), so the
    *     selected candidate load is monotone non-increasing in the
    *     target (spec-pinned). Fail LOUD if even that geometry exceeds
    *     `candidateBudget` (the maxCandidates discipline): no geometry
    *     at this signature size meets both constraints — spend more
    *     hashes.
    *
    * If the calibration ran on a `sampleFraction` f, pass
    * `populationScale` = 1/f² (pair counts scale quadratically in the
    * sampled fraction) so the budget comparison is in CORPUS units.
    * Float arithmetic is fine here: this is a bounded driver-side
    * decision procedure (≤ (H+1)² histogram rows), ScalaTest-pinned,
    * not an oracle-hashed corpus operator.
    */
  def minhashRetune(calib: DataFrame, numHashes: Int, curBands: Int,
      targetJaccard: Double, candidateBudget: Long,
      minRecall: Double = 0.8, populationScale: Double = 1.0)
      : LshGeometry = {
    require(numHashes >= 2, s"minhashRetune: numHashes $numHashes must be >= 2")
    require(numHashes % curBands == 0,
      s"minhashRetune: curBands $curBands must divide numHashes $numHashes")
    require(targetJaccard > 0 && targetJaccard < 1,
      s"minhashRetune: targetJaccard $targetJaccard must be in (0, 1)")
    require(candidateBudget >= 1,
      s"minhashRetune: candidateBudget $candidateBudget must be >= 1")
    require(minRecall > 0 && minRecall <= 1,
      s"minhashRetune: minRecall $minRecall must be in (0, 1]")
    require(populationScale >= 1.0,
      s"minhashRetune: populationScale $populationScale must be >= 1")
    def pCatch(s: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    val curR = numHashes / curBands
    // bounded histogram -> population estimate per true-jaccard bucket.
    // Null buckets are dropped defensively: minhashCalibration now
    // coalesces degenerate 0-div-0 pairs to the top bucket, but a
    // PERSISTED pre-fix calibration table (or an external one) may still
    // carry null rows, and Row.getLong on a null would NPE the retune.
    val hist = calib.where(col("jac_bucket").isNotNull)
      .groupBy(col("jac_bucket"))
      .agg(sum(col("n_pairs")).as("n"))
      .collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    require(hist.nonEmpty, "minhashRetune: empty calibration histogram")
    val pop = hist.map { case (bucket, n) =>
      val s = math.min((bucket + 0.5) / numHashes, 1.0)
      (s, n * populationScale / pCatch(s, curBands, curR))
    }
    val geoms = (1 to numHashes).filter(numHashes % _ == 0).map { b =>
      val r = numHashes / b
      val recall = pCatch(targetJaccard, b, r)
      val cand = pop.map { case (s, p) => p * pCatch(s, b, r) }.sum
      LshGeometry(b, r, math.round(recall * 1000000L),
        math.ceil(cand).toLong)
    }
    val feasible = geoms.filter(_.recallPpm >= minRecall * 1000000L)
    require(feasible.nonEmpty,
      s"minhashRetune: no b×r = $numHashes geometry reaches recall " +
        s"$minRecall at target $targetJaccard (best: " +
        s"${geoms.maxBy(_.recallPpm)}) — spend more hashes")
    val chosen = feasible.minBy(g => (g.expectedCandidates, g.bands))
    require(chosen.expectedCandidates <= candidateBudget,
      s"minhashRetune: tightest recall-feasible geometry $chosen still " +
        s"exceeds candidateBudget $candidateBudget — spend more hashes " +
        "or relax the budget/recall")
    chosen
  }

  /** [[minhashPairs]] under AUTO-RETUNED band geometry: calibrate on a
    * sample at the current geometry, [[minhashRetune]] to the tightest
    * budget-feasible bands for the target similarity, then run the full
    * pairs pass under the chosen geometry. The calibration sample is
    * cheap by construction (sampleFraction² of the candidate load); the
    * returned geometry is also handed back for logging/persistence.
    */
  def minhashPairsRetuned(df: DataFrame, idCol: String, textCol: String,
      targetJaccard: Double, candidateBudget: Long,
      shingleN: Int = 5, numHashes: Int = 16, curBands: Int = 4,
      sampleFraction: Double = 0.1, minRecall: Double = 0.8,
      seed: Long = 42L): (DataFrame, LshGeometry) = {
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"minhashPairsRetuned: sampleFraction $sampleFraction not in (0, 1]")
    val calib = minhashCalibration(df, idCol, textCol, shingleN,
      numHashes, curBands, sampleFraction = Some(sampleFraction),
      seed = seed)
    val geometry = minhashRetune(calib, numHashes, curBands,
      targetJaccard, candidateBudget, minRecall,
      populationScale = 1.0 / (sampleFraction * sampleFraction))
    (minhashPairs(df, idCol, textCol, shingleN, numHashes,
      geometry.bands), geometry)
  }

  /** [[minhashPairsRetuned]] with OWNED cache lifetime (the
    * [[withMinhashPairs]] contract): nothing stays cached after the
    * call — the form long-lived sessions and multi-leg consumers
    * should use.
    */
  def withMinhashPairsRetuned[T](df: DataFrame, idCol: String,
      textCol: String, targetJaccard: Double, candidateBudget: Long,
      shingleN: Int = 5, numHashes: Int = 16, curBands: Int = 4,
      sampleFraction: Double = 0.1, minRecall: Double = 0.8,
      seed: Long = 42L)(use: (DataFrame, LshGeometry) => T): T = {
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"withMinhashPairsRetuned: sampleFraction $sampleFraction not in (0, 1]")
    val calib = minhashCalibration(df, idCol, textCol, shingleN,
      numHashes, curBands, sampleFraction = Some(sampleFraction),
      seed = seed)
    val geometry = minhashRetune(calib, numHashes, curBands,
      targetJaccard, candidateBudget, minRecall,
      populationScale = 1.0 / (sampleFraction * sampleFraction))
    withMinhashPairs(df, idCol, textCol, shingleN, numHashes,
      geometry.bands)(pairs => use(pairs, geometry))
  }

  /** INCREMENTAL near-dup check — a NEW batch band-joined against the
    * EXISTING corpus (the continuous-ingest shape, vs the self-join
    * above): output (a = new id, b = old id, jac), only cross pairs —
    * new-vs-new dups are deliberately not reported (they belong to the
    * batch's own [[minhashPairs]] pass). At 100 TB the corpus side's
    * signatures are precomputed at write time and band-partitioned, and
    * the arriving batch's band keys broadcast — checking a batch costs
    * |batch|·bands lookups, never a corpus scan.
    */
  def minhashPairsAgainst(newDf: DataFrame, oldDf: DataFrame,
      idCol: String, textCol: String,
      shingleN: Int = 5, numHashes: Int = 16, bands: Int = 4,
      keyForm: String = "raw"): DataFrame = {
    val newMh = minhashed(newDf, idCol, textCol, shingleN, numHashes, bands,
      keyForm)
    val oldMh = minhashed(oldDf, idCol, textCol, shingleN, numHashes, bands,
      keyForm)
    val ob = oldMh.select(col(idCol).as("b"), col("shingles").as("shb"),
      posexplode_outer(col("bands")).as(Seq("band_idx", "band_key")))
    crossPairsAgainst(newMh, ob, idCol)
  }

  /** The batch-vs-corpus band join both [[minhashPairsAgainst]] and
    * [[pairsAgainstIndex]] share: the CORPUS side's shingles ride through
    * the band join (it streams against the broadcast batch band keys, so
    * the corpus is scanned exactly once and its shingles never re-join);
    * the broadcast stays lean — band keys only. Only the small BATCH side
    * pays a second shingle pass, joined back broadcast over the few
    * candidates.
    */
  private def crossPairsAgainst(newMh: DataFrame, ob: DataFrame,
      idCol: String): DataFrame = {
    val nb = newMh.select(col(idCol).as("a"),
      posexplode_outer(col("bands")).as(Seq("band_idx", "band_key")))
    val cand = ob.join(broadcast(nb), Seq("band_idx", "band_key"))
      .select(col("a"), col("b"), col("shb"))
      .dropDuplicates("a", "b")
    val sa = newMh.select(col(idCol).as("a"), col("shingles").as("sha"))
    cand.join(broadcast(sa), "a")
      .select(col("a"), col("b"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          (size(col("sha")) + size(col("shb")) -
            size(array_intersect(col("sha"), col("shb"))))).as("jac"))
  }

  // ---- persisted signature index (build once / append / check) ----
  // The write-time half the incremental check's scaladoc promises: at
  // 100 TB, checking an arriving batch against the corpus must not
  // re-shingle the corpus — its banded signature rows are computed ONCE
  // at ingest and persisted, and every later check is a scan of hash
  // rows (never corpus text). Same artifact discipline as the IVF/NSW/
  // bloom index families; append is trivially exact (signature rows are
  // per-document — no cross-row state to maintain).

  private def sigMetaFile(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_minhash_meta.json")

  private case class SigMeta(shingleN: Int, numHashes: Int, bands: Int,
      keyForm: String = "raw")

  private def writeSigMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, m: SigMeta): Unit = {
    val p = sigMetaFile(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(
      (s"""{"shingleN":${m.shingleN},"numHashes":${m.numHashes},""" +
        s""""bands":${m.bands},"keyForm":"${m.keyForm}"}""")
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def readSigMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): SigMeta = {
    val p = sigMetaFile(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"signature index at $path has no ${p.getName} " +
      "sidecar — was it written by buildSignatureIndex?")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def field(name: String): Int = {
      val m = s""""$name"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(text)
      require(m.isDefined, s"signature-index meta at $p is missing '$name'")
      m.get.group(1).toInt
    }
    // keyForm landed in r13: a pre-r13 sidecar has no field and means
    // the historical raw-byte shingles — NOT an error, the default
    val keyForm = """"keyForm"\s*:\s*"([a-z]+)"""".r
      .findFirstMatchIn(text).map(_.group(1)).getOrElse("raw")
    SigMeta(field("shingleN"), field("numHashes"), field("bands"), keyForm)
  }

  /** Persist the corpus's banded signature rows — (id, shingles,
    * band_idx, band_key), one row per (document, band), partitioned by
    * `band_idx`. Shingle/hash parameters land in a sidecar so appends
    * and checks can never silently mix geometries.
    */
  def buildSignatureIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, shingleN: Int = 5, numHashes: Int = 16,
      bands: Int = 4, keyForm: String = "raw"): Unit = {
    textKeyFor(keyForm, lit("")) // fail-loud on an unknown form, pre-write
    minhashed(df, idCol, textCol, shingleN, numHashes, bands, keyForm)
      .select(col(idCol).as("id"), col("shingles"),
        posexplode_outer(col("bands")).as(Seq("band_idx", "band_key")))
      .write.partitionBy("band_idx").mode("overwrite").parquet(path)
    writeSigMeta(df.sparkSession, path,
      SigMeta(shingleN, numHashes, bands, keyForm))
  }

  /** Index a NEW batch into the persisted signature index at ingest —
    * per-document rows, so append IS exact: check-after-append equals a
    * full rebuild over the union (spec-pinned).
    */
  def appendToSignatureIndex(df: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val m = readSigMeta(df.sparkSession, path)
    minhashed(df, idCol, textCol, m.shingleN, m.numHashes, m.bands, m.keyForm)
      .select(col(idCol).as("id"), col("shingles"),
        posexplode_outer(col("bands")).as(Seq("band_idx", "band_key")))
      .write.partitionBy("band_idx").mode("append").parquet(path)
  }

  /** RE-BAND a persisted signature index under a NEW band geometry —
    * the [[minhashRetune]] follow-through at index scale: when the
    * calibration loop decides the bands are wrong (e.g. 4×4 → 2×8 as
    * the corpus grows), the expensive artifact — per-document shingles
    * + minhash signatures, one corpus scan + H hashes per doc — is
    * still valid; only the band keys are geometry-bound. A band key is
    * the colon-joined signature slots in slot order ([[bandKeys]]), so
    * the FULL signature reconstructs exactly from one pass over the
    * index rows (group per doc, order by band_idx, split+concat;
    * empty-shingle docs round-trip through their all-null-slot empty
    * keys), and the re-banded index is written WITHOUT touching corpus
    * text. Output layout + sidecar match [[buildSignatureIndex]]; the
    * new geometry must tile the same `numHashes`.
    */
  def rebandSignatureIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, newBands: Int, outPath: String): Unit = {
    require(outPath != path,
      "rebandSignatureIndex: write the re-banded index to a NEW path " +
        "(readers of the old geometry must not see mixed bands)")
    val m = readSigMeta(spark, path)
    require(newBands >= 1 && m.numHashes % newBands == 0,
      s"rebandSignatureIndex: newBands $newBands must divide " +
        s"numHashes ${m.numHashes}")
    val newR = m.numHashes / newBands
    // one row per doc: band keys back to signature slots (band_idx
    // orders the fragments; '' keys are the all-null signature of an
    // empty-shingle doc — concat_ws drops null slots, and minhash slots
    // are all-null or all-present, never mixed)
    val perDoc = spark.read.parquet(path)
      .groupBy(col("id"))
      .agg(first(col("shingles")).as("shingles"),
        sort_array(collect_list(struct(col("band_idx"), col("band_key"))))
          .as("bk"))
    val sig = when(element_at(col("bk"), 1).getField("band_key") === "",
        array((0 until m.numHashes).map(_ => lit(null).cast("long")): _*))
      .otherwise(flatten(transform(col("bk"),
        b => transform(split(b.getField("band_key"), ":"),
          s => s.cast("long")))))
    val rebanded = perDoc
      .select(col("id"), col("shingles"),
        graft.functions.TextFunctions.bandKeys(sig, newBands, newR)
          .as("bands"))
      .select(col("id"), col("shingles"),
        posexplode_outer(col("bands")).as(Seq("band_idx", "band_key")))
    // fail-loud geometry guard: a malformed key (hand-edited index)
    // must never silently re-band — verified via the slot count
    val bad = perDoc.where(
      element_at(col("bk"), 1).getField("band_key") =!= "" &&
        size(flatten(transform(col("bk"),
          b => split(b.getField("band_key"), ":")))) =!= m.numHashes)
      .limit(1).count()
    require(bad == 0L,
      s"rebandSignatureIndex: index rows at $path do not parse back to " +
        s"${m.numHashes} signature slots (geometry drift or a corrupt key)")
    rebanded.write.partitionBy("band_idx").mode("overwrite").parquet(outPath)
    writeSigMeta(spark, outPath,
      SigMeta(m.shingleN, m.numHashes, newBands, m.keyForm))
  }

  /** [[minhashPairsAgainst]] served from the PERSISTED index: the corpus
    * side is a scan of precomputed signature rows — no corpus text is
    * read, no shingling or hashing re-runs; the arriving batch is the
    * only thing hashed. Output contract identical to
    * [[minhashPairsAgainst]] (a = new id, b = indexed id, exact jac).
    */
  def pairsAgainstIndex(newDf: DataFrame, idCol: String, textCol: String,
      path: String): DataFrame = {
    val spark = newDf.sparkSession
    val m = readSigMeta(spark, path)
    val newMh = minhashed(newDf, idCol, textCol, m.shingleN, m.numHashes,
      m.bands, m.keyForm)
    val ob = spark.read.parquet(path)
      .select(col("id").as("b"), col("shingles").as("shb"),
        col("band_idx"), col("band_key"))
    crossPairsAgainst(newMh, ob, idCol)
  }

  private def minhashPairsImpl(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int,
      persistIntermediates: Boolean,
      maxBucketSize: Option[Int],
      keyForm: String = "raw"): (DataFrame, Option[DataFrame]) = {
    val mh0 = minhashed(df, idCol, textCol, shingleN, numHashes, bands, keyForm)
    val mh = if (persistIntermediates) mh0.persist() else mh0
    val banded0 = mh.select(col(idCol),
      posexplode_outer(col("bands")).as(Seq("band_idx", "band_key")))
    // skew cap: a degenerate band bucket (millions of boilerplate docs
    // sharing a band key) would cost |bucket|² in the self-join; drop
    // over-cap buckets entirely — truly identical docs belong to exact
    // dedup, and genuine near-dups still collide in their other bands.
    // Singleton buckets drop whenever the bound runs (they pair with
    // nothing); the bound itself runs when its input is cached (extra agg
    // leg reads the `mh` cache) or when a cap was explicitly requested.
    val banded =
      if (persistIntermediates || maxBucketSize.isDefined)
        sizeBounded(banded0, Seq("band_idx", "band_key"), maxBucketSize)
      else banded0
    // SHUFFLE_HASH only when maxBucketSize actually bounds the buckets:
    // a capped build side keeps per-partition hash maps small and skips
    // the SMJ sort pass; UNCAPPED, a degenerate band bucket would build
    // an unspillable hash map where SMJ spills to disk — so the uncapped
    // form pins MERGE instead: still spill-safe, but never a broadcast
    // of the |docs|·bands banded relation on a stats misestimate (the
    // 10× driver-OOM watch item).
    val bandedBuild =
      if (maxBucketSize.isDefined) banded.hint("SHUFFLE_HASH")
      else banded.hint("MERGE")
    val cand0 = banded.as("x").join(bandedBuild.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_key") === col("y.band_key") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .distinct()
    // r15 (guide §2.3 "shuffle fewer bytes", the r14 candidateShingleSets
    // discipline applied to THIS family): the verify joins below used to
    // shuffle EVERY doc's shingle array even though only candidate-pair
    // endpoints are ever joined — at sf0.1 that full-corpus array
    // exchange was most of q64/q121/q148's 84 MiB shuffle, and at 100 TB
    // it re-shuffles the corpus to verify a duplication-bounded pair
    // list. Materialize the bounded candidates once (the winnowCandidates
    // shape; makes this a BATCH-ONLY EAGER operator — streaming uses
    // [[minhashed]]/[[graft.streaming.StreamDedup]], never this), then
    // semi-join the shingle relation down to candidate endpoints before
    // it crosses an exchange. The broadcast id set is bounded by
    // 2·|candidates| — a corpus whose candidate endpoints outgrow a
    // broadcast is one being asked to verify corpus-scale duplication;
    // retune bands first (minhashRetune) or run the scrub family.
    val cand = Graph.materialize(cand0, None)
    val candIds = cand.select(col("a").as(idCol))
      .unionByName(cand.select(col("b").as(idCol)))
      .distinct()
    // The shingle relation is |docs| rows of shingle ARRAYS — never
    // broadcast-safe at scale, but it reads from the cached `mh` whose
    // in-memory stats can come in under autoBroadcastJoinThreshold and
    // tempt the planner into a driver broadcast (observed once as a
    // non-reproducible driver OOM at 10× — SCALE.md watch item, closed
    // here). Pin both verify joins SHUFFLE_HASH: the build side has
    // UNIQUE keys (one row per doc), so per-partition hash maps are
    // bounded by |docs|/partitions — the capped-band-join discipline.
    val sh = mh.select(col(idCol), col("shingles"))
      .join(broadcast(candIds), Seq(idCol), "left_semi")
      .hint("SHUFFLE_HASH")
    val inter = size(array_intersect(col("sa"), col("sb")))
    val pairs = cand
      .join(sh.withColumnRenamed(idCol, "a").withColumnRenamed("shingles", "sa"), "a")
      .join(sh.withColumnRenamed(idCol, "b").withColumnRenamed("shingles", "sb"), "b")
      .select(col("a"), col("b"),
        (inter.cast("double") / (size(col("sa")) + size(col("sb")) - inter)).as("jac"))
    (pairs, if (persistIntermediates) Some(mh) else None)
  }

  /** Character-edit near-dup pairs (levenshtein ≤ `maxDist`, maxDist ≤ 2)
    * via DELETION-NEIGHBORHOOD blocking (the SymSpell/FastSS family): if
    * lev(a, b) ≤ k, deleting the ≤ k edited positions from each side
    * leaves a common string, so a and b always share a ≤ k-deletion
    * variant — candidate generation is an equi-join on (block, variant),
    * never an all-pairs scan, and the exact levenshtein verifies. The
    * variant fan-out is 1 + L + C(L, 2) keys per row (L = string length)
    * — built from codegen array lambdas, worthwhile whenever blocks are
    * big enough that quadratic within-block pairing dominates.
    * `maxBucketSize` drops degenerate variant keys (identical
    * boilerplate strings belong to [[exact]] dedup first) — the minhash
    * cap discipline. Without a cap the candidates are LOSSLESS, so
    * output = every within-block pair at lev ≤ maxDist.
    * Output: (ak, bk, lev), ak < bk.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      blockCol: String, maxDist: Int = 2,
      maxBucketSize: Option[Int] = None): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, s"maxDist $maxDist must be 1 or 2")
    def del1(c: Column): Column =
      when(length(c) > 0,
        transform(sequence(lit(1), length(c)), i =>
          concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))
        .otherwise(array())
    def variants(c: Column): Column =
      if (maxDist == 1) array_distinct(concat(array(c), del1(c)))
      else array_distinct(concat(array(c), del1(c),
        flatten(transform(del1(c), v => del1(v)))))
    val v = df.select(col(idCol).as("k"), col(blockCol).as("blk"),
      col(strCol).as("n"), explode(variants(col(strCol))).as("variant"))
    val capped = sizeBounded(v, Seq("blk", "variant"), maxBucketSize)
    capped.as("x").join(capped.as("y"),
        col("x.blk") === col("y.blk") &&
          col("x.variant") === col("y.variant") &&
          col("x.k") < col("y.k"))
      .select(col("x.k").as("ak"), col("x.n").as("an"),
        col("y.k").as("bk"), col("y.n").as("bn"))
      .dropDuplicates("ak", "bk")
      .select(col("ak"), col("bk"), levenshtein(col("an"), col("bn")).as("lev"))
      .where(col("lev") <= maxDist)
  }

  /** SimHash values per row (60-bit, from whitespace-token md5s). Codegen
    * [[graft.functions.expressions.SimHash64]] — bit-identical to the
    * declarative `simhashFromHashes` SQL-lambda (cross-checked in tests).
    * `keyForm` ([[textKeyFor]]) folds the text BEFORE tokenizing (the
    * minhashed discipline, r14): simhash only reads the token stream —
    * no positional rebuild — so the whole-text fold is the right grain;
    * "raw" keeps the historical bytes and plan.
    */
  def simhashed(df: DataFrame, idCol: String, textCol: String,
      keyForm: String = "raw"): DataFrame =
    df.select(col(idCol),
      transform(wsTokens(textKeyFor(keyForm, col(textCol))),
        t => md5Low60(t)).as("hv"))
      .withColumn("sh", graft.functions.expressions.TextHashExpressions.simhash64(col("hv")))
      .drop("hv")

  /** SimHash near-dup pairs with hamming(a,b) <= maxHamming, a < b —
    * quadratic all-pairs form. Exact but O(n²): kept as the small-data
    * oracle / test cross-check for [[simhashPairsBucketed]], which is the
    * path to use at scale.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, keyForm: String = "raw"): DataFrame = {
    val sh = simhashed(df, idCol, textCol, keyForm)
    val a = sh.select(col(idCol).as("a"), col("sh").as("sha"))
    val b = sh.select(col(idCol).as("b"), col("sh").as("shb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), hamming(col("sha"), col("shb")).cast("int").as("ham"))
      .where(col("ham") <= maxHamming)
  }

  /** SimHash near-dup pairs via pigeonhole bit-chunk bucketing — the scale
    * path, same output set as [[simhashPairs]] (lossless): split the 60-bit
    * simhash into maxHamming+1 disjoint chunks; hamming(a,b) <= maxHamming
    * means at most maxHamming bits differ, so by pigeonhole at least one
    * chunk is bit-identical — an EQUI-join on (chunk_idx, chunk_key) finds
    * every qualifying pair, and the exact hamming re-check inside buckets
    * removes false candidates. Shuffle is proportional to chunk collisions
    * (near-dups + random 60/(d+1)-bit coincidences), never O(n²).
    *
    * At 100 TB: a degenerate chunk value (millions of boilerplate docs
    * sharing a chunk) is the skew risk — `maxBucketSize` drops buckets
    * bigger than the cap before the self-join (pairs inside an over-cap
    * bucket can still be found through their other d chunks; truly
    * identical docs belong in exact dedup first).
    */
  def simhashPairsBucketed(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, maxBucketSize: Option[Int] = None,
      keyForm: String = "raw"): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 60, "maxHamming must be in [0, 60)")
    hammingPairsBucketed(simhashed(df, idCol, textCol, keyForm), idCol, "sh",
      bits = 60, maxHamming = maxHamming, maxBucketSize = maxBucketSize)
  }

  /** The pigeonhole Hamming join, factored over ANY precomputed
    * `bits`-wide hash column (text SimHash, image dHash, audio chroma
    * prints): split the hash into maxHamming+1 disjoint chunks — two
    * hashes within distance d must agree on at least one chunk — equi-
    * join on (chunk index, chunk value), verify the exact distance.
    * Lossless for ≤ `maxHamming`; `maxBucketSize` caps pathological
    * buckets (all-identical corpora). 64-bit hashes may be negative —
    * chunk extraction uses the UNSIGNED shift, so the sign bit is just
    * bit 63.
    */
  def hammingPairsBucketed(hashes: DataFrame, idCol: String, hashCol: String,
      bits: Int, maxHamming: Int,
      maxBucketSize: Option[Int] = None): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits $bits out of [1, 64]")
    require(maxHamming >= 0 && maxHamming < bits,
      s"maxHamming $maxHamming must be in [0, $bits)")
    val nChunks = maxHamming + 1
    // chunk j covers bits [bits·j/n, bits·(j+1)/n) — disjoint, exhaustive
    val chunks = (0 until nChunks).map { j =>
      val lo = bits * j / nChunks
      val width = bits * (j + 1) / nChunks - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(j).as("cidx"),
        (shiftrightunsigned(col(hashCol), lo).bitwiseAND(lit(mask)))
          .as("ckey"))
    }
    val exploded = hashes
      .select(col(idCol), col(hashCol).as("__hh"),
        explode(array(chunks: _*)).as("c"))
      .select(col(idCol), col("__hh"), col("c.cidx").as("cidx"),
        col("c.ckey").as("ckey"))
    val bucketed = boundedOrAll(exploded, Seq("cidx", "ckey"), maxBucketSize)
    val a = bucketed.select(col(idCol).as("a"), col("__hh").as("sha"),
      col("cidx"), col("ckey"))
    val b = bucketed.select(col(idCol).as("b"), col("__hh").as("shb"),
      col("cidx"), col("ckey"))
    a.join(b, Seq("cidx", "ckey"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("sha"), col("shb"))
      .distinct() // a pair may collide in several chunks
      .select(col("a"), col("b"),
        hamming(col("sha"), col("shb")).cast("int").as("ham"))
      .where(col("ham") <= maxHamming)
  }

  /** Word n-gram Jaccard similarity join via an inverted index: explode
    * distinct grams, self-join on the gram (only co-occurring pairs ever
    * materialize), count shared grams per pair — |A∩B| by construction —
    * then Jaccard from the per-doc set sizes. Pairs sharing NO gram (jac
    * 0) are never emitted, which is what a dedup caller wants and turns
    * the O(n²)·|set| cross product into a shuffle proportional to real
    * overlap. At 100 TB, cap the gram doc-frequency (drop boilerplate
    * grams) to bound the hottest posting lists.
    * Output: (a, b, jac), jac > 0 only.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, persistIntermediates: Boolean = true,
      maxDocFreq: Option[Int] = None, keyForm: String = "raw"): DataFrame =
    ngramJaccardPairsImpl(df, idCol, textCol, n, persistIntermediates,
      maxDocFreq, keyForm)._1

  /** [[ngramJaccardPairs]] with OWNED cache lifetime — see
    * [[withMinhashPairs]].
    */
  def withNgramJaccardPairs[T](df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxDocFreq: Option[Int] = None)(use: DataFrame => T): T = {
    val (pairs, cached) = ngramJaccardPairsImpl(df, idCol, textCol, n,
      persistIntermediates = true, maxDocFreq)
    try use(pairs) finally cached.foreach(_.unpersist())
  }

  /** SimHash bucket self-join input with the size bound applied only when a
    * cap was requested: unlike the minhash/ngram paths there is no cached
    * upstream here, so the bound costs a second evaluation of the simhash
    * pipeline — charged only when the caller asked for the 100-TB skew cap.
    * Singleton buckets then also drop (free, same pass).
    */
  private def boundedOrAll(exploded: DataFrame, keys: Seq[String],
      cap: Option[Int]): DataFrame = cap match {
    case Some(_) => sizeBounded(exploded, keys, cap)
    case None    => exploded
  }

  private def ngramJaccardPairsImpl(df: DataFrame, idCol: String, textCol: String,
      n: Int, persistIntermediates: Boolean,
      maxDocFreq: Option[Int],
      keyForm: String = "raw"): (DataFrame, Seq[DataFrame]) = {
    // keyForm folds the text BEFORE tokenizing (the jaccardPairsPrefix
    // r14 grain: no rebuild, whole-text fold)
    val g0 = df.select(col(idCol),
      wsTokens(textKeyFor(keyForm, col(textCol))).as("toks"))
      .select(col(idCol), ngramsOfTokens(col("toks"), n).as("grams"))
      .withColumn("sz", size(col("grams")))
    // persisted by default: the regex tokenize + shingle pipeline feeds
    // three plan legs (doc-frequency aggregate, semi-join probe, and the
    // pair join via `e`) — without the cache it runs once per leg (no
    // cross-leg CSE).
    val g = if (persistIntermediates) g0.persist() else g0
    val e0 = g.select(col(idCol), col("sz"), explode(col("grams")).as("gram"))
    // skew cap: a stop-gram present in every doc makes its posting list
    // O(n) and the join on it O(n²); drop grams over the doc-frequency
    // cap from the index. Set sizes (sa/sb) stay UNCAPPED, so dropped
    // grams only shrink the measured intersection — Jaccard of affected
    // pairs is underestimated, never inflated (no false positives).
    // df=1 grams join only with themselves (a < b kills the pair), so
    // dropping them shrinks the posting index without touching the output
    // — but the bound's extra aggregate+semi-join legs are only free when
    // `g` is cached; uncached-and-uncapped callers keep the direct path
    // (same gating as the minhash/simhash bounds).
    val indexed =
      if (persistIntermediates || maxDocFreq.isDefined)
        sizeBounded(e0, Seq("gram"), maxDocFreq)
      else e0
    val e = if (persistIntermediates) indexed.persist() else indexed
    val a = e.select(col(idCol).as("a"), col("sz").as("sa"), col("gram"))
    val b = e.select(col(idCol).as("b"), col("sz").as("sb"), col("gram"))
    // SHUFFLE_HASH only when maxDocFreq actually bounds the posting
    // lists (~30-40% of the capped query's time is the skipped SMJ sort);
    // uncapped, a stop-gram's posting list would build an unspillable
    // hash map where SMJ spills — pin MERGE there: spill-safe AND never
    // a size-estimate broadcast of the unbounded posting relation.
    val bBuild =
      if (maxDocFreq.isDefined) b.hint("SHUFFLE_HASH") else b.hint("MERGE")
    val pairs = a.join(bBuild, Seq("gram"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("sa"), col("sb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("sa") + col("sb") - col("inter"))).as("jac"))
    (pairs, if (persistIntermediates) Seq(g, e) else Nil)
  }

  /** For every row, its single most-similar other row by cosine (embedding
    * near-dup detection). Quadratic all-pairs baseline — the small-data
    * oracle / recall ground truth for [[nearestNeighborPerRowLsh]], which
    * is the path to use at scale. Output: (id, nn_id, cos_sim).
    */
  def nearestNeighborPerRow(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = df.select(col(idCol), col(vecCol).as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val a = v.select(col(idCol).as("a"), col("emb").as("ea"), col("nrm").as("na"))
    val b = v.select(col(idCol).as("b"), col("emb").as("eb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("a")).orderBy(col("cos_sim").desc, col("b").asc)
    a.join(b, col("a") =!= col("b"))
      .select(col("a"), col("b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("a").as(idCol), col("b").as("nn_id"), col("cos_sim"))
  }

  /** Embedding near-dup at scale: candidates from random-hyperplane LSH
    * buckets (sign-bit buckets are literally the angular/cosine LSH family,
    * so near-dup vectors land in near-identical buckets), multi-probed —
    * each row probes every bucket within `numFlips` sign-bit flips of its
    * own — then EXACT cosine re-rank inside the candidate set. The join is
    * an equi-join on bucket id: shuffle ∝ (probes+1)·n + collisions, never
    * O(n²). Recall vs [[nearestNeighborPerRow]] is a reported metric
    * (ANN_QUALITY.md), tunable via planes/flips — the same recall/reads
    * dial as IVF nprobe.
    *
    * `planePred` selects the hyperplane rows (ids must be contiguous 1..P,
    * as in [[SimilaritySearch.rpLshBuckets]]); `numPlanes` = P.
    * Output: (id, nn_id, cos_sim) — rows whose probes found no non-self
    * candidate are absent (at sane plane counts this means an empty
    * neighborhood, which a dedup caller treats as "no near-dup").
    */
  def nearestNeighborPerRowLsh(df: DataFrame, idCol: String, vecCol: String,
      planePred: Column, numPlanes: Int, numFlips: Int = 1): DataFrame = {
    require(numPlanes > 0 && numPlanes < 63, "numPlanes must be in (0, 63)")
    // all XOR masks with popcount <= numFlips (1 + P + P(P-1)/2 + ... keys),
    // generated combinatorially — never enumerates the 2^P bucket space
    val masks: Seq[Long] = (0 to numFlips).flatMap(k =>
      (0 until numPlanes).combinations(k)
        .map(_.foldLeft(0L)((acc, j) => acc | (1L << j))).toSeq)
    val bucketed = SimilaritySearch.rpLshBuckets(df, idCol, vecCol, planePred)
      .withColumn("nrm", norm(col("emb")))
    val probes = bucketed.select(col(idCol).as("a"), col("emb").as("ea"),
      col("nrm").as("na"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("pb"))
    val cands = probes.join(
        bucketed.select(col(idCol).as("b"), col("emb").as("eb"),
          col("nrm").as("nb"), col("bucket").as("pb")),
        Seq("pb"))
      .where(col("a") =!= col("b"))
    val w = Window.partitionBy(col("a")).orderBy(col("cos_sim").desc, col("b").asc)
    cands
      .select(col("a"), col("b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos_sim"))
      .distinct() // a candidate can arrive through several probe masks
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("a").as(idCol), col("b").as("nn_id"), col("cos_sim"))
  }

  /** Cosine similarity JOIN at scale: pairs are generated only WITHIN IVF
    * cells (equi-join on the assigned cell id — shuffle ∝ Σ|cell|², never
    * n² across the corpus), exact cosine inside. The blocked counterpart
    * of the q16 cartesian simjoin: with deterministic centroids the output
    * is fully deterministic (oracle-checkable); pairs straddling a cell
    * boundary are missed by construction — that's the candidate-gen trade,
    * measured in ANN_QUALITY.md for the same geometry.
    * Output: (a, b, cos_sim), a < b, same cell only.
    */
  def cosinePairsInCells(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    cosinePairsInBlocks(
      SimilaritySearch.ivfAssign(df, idCol, vecCol, centroids),
      idCol, "emb", "cid")

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): embedding-space near-dup
    * PRUNING. Vectors are assigned to their nearest centroid cell, pairs
    * with cosine >= tau are generated ONLY within a cell
    * ([[cosinePairsInCells]] — shuffle ∝ Σ|cell|², never n²), duplicate
    * groups are the connected components of that pair graph, and each
    * group keeps exactly one representative — the member with the LOWEST
    * cosine similarity to its cell centroid (the paper's keep-the-
    * outlier policy, maximizing retained diversity), ties to the
    * smallest id. Unpaired vectors survive trivially.
    *
    * Scale shape: the cell-assign scan (centroids broadcast — consumed
    * by three plan legs; [[withSemanticDedup]] persists it once when
    * that scan dominates), the blocked pair join, CC over the PAIR
    * graph only (duplication-bounded, not corpus-bounded —
    * [[graft.operators.Graph]]'s size-gated union-find / min-label
    * propagation), a ≤|components|-row argmin agg, one broadcast-scale
    * join back. Floats are safe to hash: cosine
    * folds in index order and the representative is chosen via an exact
    * (sim, id) struct-min whose ID is what the keep test compares.
    * Output: (idCol, cid, comp, cent_sim, keep) — comp = min member id
    * of the duplicate group (own id for singletons).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, tau: Double,
      checkpointDir: Option[String] = None): DataFrame =
    semanticDedupFrom(
      SimilaritySearch.ivfAssign(df, idCol, vecCol, centroids),
      idCol, centroids, tau, checkpointDir)

  /** Scoped-cache form — the [[withMinhashPairs]] discipline: the cell
    * assignment (the corpus × centroids argmin scan) feeds THREE plan
    * legs — the centroid-sim projection and both sides of the in-cell
    * pair join — so the declarative [[semanticDedup]] recomputes that
    * scan per leg (fine for a one-shot run; wasteful in a loop or when
    * the assignment dominates). Persists the assignment for the
    * duration of `use` and releases it in finally.
    */
  def withSemanticDedup[T](df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, tau: Double,
      checkpointDir: Option[String] = None)(use: DataFrame => T): T = {
    val asg = SimilaritySearch.ivfAssign(df, idCol, vecCol, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try use(semanticDedupFrom(asg, idCol, centroids, tau, checkpointDir))
    finally asg.unpersist()
  }

  private def semanticDedupFrom(asg: DataFrame, idCol: String,
      centroids: DataFrame, tau: Double,
      checkpointDir: Option[String]): DataFrame = {
    val withSim = asg
      .join(broadcast(centroids.select(col("cid"), col("ce"))), Seq("cid"))
      .select(col(idCol), col("cid"),
        (dot(col("emb"), col("ce")) / (norm(col("emb")) * norm(col("ce"))))
          .as("cent_sim"))
    val pairs = cosinePairsInBlocks(asg, idCol, "emb", "cid")
      .where(col("cos_sim") >= tau)
      .select(col("a"), col("b"))
    val comp = Graph.connectedComponents(pairs, "a", "b",
        checkpointDir = checkpointDir)
      .withColumnRenamed("id", "__m")
    val labeled = withSim.join(comp.hint("SHUFFLE_HASH"),
        withSim(idCol) === comp("__m"), "left")
      .drop("__m")
    val rep = labeled.where(col("component").isNotNull)
      .groupBy(col("component"))
      .agg(min(struct(col("cent_sim"), col(idCol).cast("long").as("__i")))
        .as("__rep"))
      .select(col("component"), col("__rep.__i").as("__rep_id"))
    labeled.join(rep.hint("SHUFFLE_HASH"), Seq("component"), "left")
      .select(col(idCol), col("cid"),
        coalesce(col("component"), col(idCol).cast("long")).as("comp"),
        col("cent_sim"),
        (col("component").isNull || col(idCol).cast("long") === col("__rep_id"))
          .as("keep"))
  }

  /** The shared core of every blocked cosine simjoin: (a, b, cos_sim)
    * pairs, a < b, generated only within equal values of `blockCol`
    * (equi-join — shuffle ∝ Σ|block|², never n²), exact cosine of
    * `vecCol` inside. Input must carry (idCol, vecCol, blockCol).
    */
  def cosinePairsInBlocks(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String): DataFrame = {
    val v = df.select(col(blockCol), col(idCol), col(vecCol).as("__emb"))
      .withColumn("__nrm", norm(col("__emb")))
    val a = v.select(col(blockCol), col(idCol).as("a"),
      col("__emb").as("ea"), col("__nrm").as("na"))
    val b = v.select(col(blockCol), col(idCol).as("b"),
      col("__emb").as("eb"), col("__nrm").as("nb"))
    a.join(b, Seq(blockCol))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos_sim"))
  }

  /** Cosine similarity JOIN at scale via sign-LSH blocks: pairs are
    * generated only within a shared random-hyperplane bucket (equi-join
    * on the bucket id — shuffle ∝ Σ|bucket|², never n²), exact cosine
    * inside. The LSH counterpart of [[cosinePairsInCells]] for corpora
    * without trained centroids; with deterministic planes the output is
    * fully deterministic (oracle-checkable). Cross-bucket pairs are
    * missed by construction — the same candidate-gen trade as every
    * blocked simjoin, dialable via plane count.
    *
    * `blockVecCol`: the vector the SIGN BITS come from, when it should
    * differ from the similarity vector — e.g. MEAN-CENTERED copies of
    * all-nonnegative vectors. Sign-LSH is uninformative on a nonnegative
    * orthant (every dot against nonnegative planes is positive ⇒ one
    * giant bucket = the n² product back again); centering restores
    * discriminating signs while cosine still ranks the raw vectors.
    */
  def cosinePairsInLshBuckets(df: DataFrame, idCol: String, vecCol: String,
      planePred: Column, blockVecCol: Option[String] = None): DataFrame = {
    val bcol = blockVecCol.getOrElse(vecCol)
    val planes = df.where(planePred)
      .select(col(idCol).as("pid"), col(bcol).as("pe"))
    val keep = Seq(idCol, vecCol, bcol).distinct.map(col)
    val bucketed = df.select(keep: _*)
      .crossJoin(broadcast(planes))
      .groupBy(keep: _*)
      .agg(sum(when(dot(col(bcol), col("pe")) > 0,
          expr("shiftleft(1L, cast(pid - 1 as int))")).otherwise(lit(0L)))
        .as("bucket"))
    cosinePairsInBlocks(bucketed, idCol, vecCol, "bucket")
  }

  /** Embedding near-dup at scale via IVF cells: every row probes its
    * `nprobe` nearest (trained, broadcast) centroids and re-ranks exactly
    * against only the rows ASSIGNED to those cells — an equi-join on cell
    * id, shuffle ∝ n·nprobe/K of the corpus, never O(n²). nprobe/K is the
    * recall/reads dial; candidates come from [[SimilaritySearch.ivfAssign]]
    * so at cluster scale the cell id is the partition column and each
    * probe is partition pruning. Recall vs [[nearestNeighborPerRow]] is
    * reported in ANN_QUALITY.md.
    * Output: (id, nn_id, cos_sim).
    */
  def nearestNeighborPerRowIvf(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, nprobe: Int): DataFrame = {
    val assigned = SimilaritySearch.ivfAssign(df, idCol, vecCol, centroids)
      .select(col(idCol).as("b"), col("emb").as("eb"),
        norm(col("emb")).as("nb"), col("cid"))
    val wProbe = Window.partitionBy(col("a")).orderBy(col("d").asc, col("cid").asc)
    val probes = df.select(col(idCol).as("a"), col(vecCol).as("ea"))
      .crossJoin(broadcast(centroids))
      .withColumn("d", l2Sq(col("ea"), col("ce")))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= nprobe)
      .select(col("a"), col("ea"), norm(col("ea")).as("na"), col("cid"))
    val wTop = Window.partitionBy(col("a")).orderBy(col("cos_sim").desc, col("b").asc)
    probes.join(assigned, Seq("cid")) // cells are disjoint: no dup candidates
      .where(col("a") =!= col("b"))
      .select(col("a"), col("b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos_sim"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") === 1)
      .select(col("a").as(idCol), col("b").as("nn_id"), col("cos_sim"))
  }

  /** Prefix-filtered set-similarity self-join (AllPairs / PPJoin family:
    * Bayardo et al. 2007; the MapReduce form is Vernica, Carey & Li
    * 2010): all document pairs with word-set Jaccard ≥ tNum/tDen. The
    * LOSSLESS index-shrinking trick: order every document's tokens by
    * GLOBAL document frequency ascending (rarest first, token
    * tie-break), and index only each document's first
    * |x| − ⌈t·|x|⌉ + 1 tokens — any pair meeting the threshold is
    * guaranteed to collide on at least one prefix token, so candidates
    * come from an inverted index over a small fraction of the corpus
    * tokens (at t=0.8, ~1/5th) whose postings are SHORT by construction
    * (prefix tokens are the rare ones — the n-gram cap's goal achieved
    * without dropping recall). Verification is per-pair array
    * intersection over collected token sets — no token-level re-join.
    *
    * The threshold is a RATIONAL tNum/tDen and every comparison is
    * integer (⌈t·sz⌉ = (tNum·sz + tDen − 1) div tDen; the output filter
    * is inter·tDen ≥ tNum·union), so prefix lengths and the qualifying
    * pair set are bit-portable — a float t·sz could round the prefix a
    * token short and silently lose a pair. Output: (a, b, jac) with
    * a < b, jac ≥ t exact-division double.
    *
    * `gramN`: the set element — 1 = word sets, n>1 = word n-gram sets
    * (the q19 unit). MATCH THE ELEMENT TO THE CORPUS: on a templated
    * corpus where most documents share most of their VOCABULARY, every
    * pair passes any word-set threshold and the join's output is
    * inherently quadratic no matter how good the candidate filter is —
    * n-grams (n ≥ 3) separate true near-dups from vocabulary overlap.
    *
    * `maxPrefixFreq`: skew guard (the q36 `maxDocFreq` / winnowing-cap
    * discipline). Rarest-first prefix selection makes hot prefix tokens
    * unlikely on a natural corpus, but a pathological one (thousands of
    * IDENTICAL documents) puts the same gram in every prefix and the
    * candidate self-join goes quadratic in that one bucket. Prefix
    * tokens appearing in more than `maxPrefixFreq` documents' prefixes
    * are dropped from the index, bounding any bucket's candidate
    * contribution at maxPrefixFreq²/2; the number of capped tokens and
    * the upper bound on skipped candidate pairs are WARN-logged, because
    * capping (unlike the prefix filter itself) breaks the losslessness
    * contract — near-dup pairs whose ONLY shared prefix tokens are hot
    * ones are missed. The default is far above any natural prefix
    * frequency (q98 stays hash-identical to the full quadratic oracle)
    * while still bounding the adversarial corpus.
    *
    * Lifetime: the hashed-token relation feeds five plan legs, so it is
    * persisted for the computation and UNPERSISTED before return; the
    * returned pair list (bounded by construction) is persisted eagerly
    * instead — callers own `result.unpersist()` when done.
    */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      tNum: Int, tDen: Int, gramN: Int = 1,
      maxPrefixFreq: Int = 10000, keyForm: String = "raw"): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold $tNum/$tDen must be a rational in (0, 1]")
    require(gramN >= 1, s"gramN $gramN must be >= 1")
    require(maxPrefixFreq >= 1, s"maxPrefixFreq $maxPrefixFreq must be >= 1")
    // keyForm ([[textKeyFor]]) folds the text BEFORE the set elements
    // are built (the minhashed discipline, r14): the join's output is
    // (a, b, jac) — no text rebuild — so the whole-text fold is the
    // right grain, and an NFC/NFD republication shares its full gram
    // set instead of none. "raw" keeps the historical bytes and plan.
    val keyed = textKeyFor(keyForm, col(textCol))
    val elems =
      if (gramN == 1) array_distinct(wsTokens(keyed))
      else array_distinct(ngramsOfTokens(wsTokens(keyed), gramN))
    // elements shuffle as 60-bit md5 hashes, never strings (the
    // chunkDedup discipline): every downstream join/window/intersect
    // keys on longs. The oracle mirrors the hash, so set sizes and
    // intersections agree by construction (a 60-bit in-doc collision
    // would merge two elements on BOTH engines identically).
    // persisted: the hashed-element relation feeds FIVE plan legs
    // (size, doc-frequency, prefix base, and both verification sides) —
    // without the cache each leg re-runs tokenize+gram+md5 over the
    // corpus. Bench/driver clear the cache between queries; callers
    // wanting owned lifetime wrap in their own persist scope.
    val toks = df.select(col(idCol),
        explode(filter(elems, _ =!= "")).as("tokS"))
      .select(col(idCol), md5Low60(col("tokS")).as("tok"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sized = toks.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("dfreq"))
    val wOrd = Window.partitionBy(col(idCol))
      .orderBy(col("dfreq").asc, col("tok").asc)
    // persisted (r15): the prefix relation feeds THREE legs — both sides
    // of the candidate self-join and the hot-token aggregate — and the
    // rank window + two joins behind it were measured running once PER
    // LEG (AQE materializes independent subtrees through the cache race,
    // no cross-leg exchange reuse). The hotStats collect below doubles as
    // the cache materializer, so the legs always read a populated cache.
    val prefixAll = toks.join(dfreq, "tok").join(sized, idCol)
      .withColumn("pos", row_number().over(wOrd))
      .where(col("pos") <=
        col("sz") - expr(s"($tNum * sz + ${tDen - 1}) div $tDen") + 1)
      .select(col(idCol), col("tok"), col("sz"), col("pos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // skew cap: tokens in too many PREFIXES leave the index. The hot set
    // is tiny by pigeonhole (≤ total-prefix-rows / maxPrefixFreq), so the
    // anti-join broadcasts; the count is an eager action over the already
    // persisted token relation — it doubles as the cache materializer.
    val pfreq = prefixAll.groupBy("tok")
      .agg(count(lit(1)).as("pfreq"))
      .where(col("pfreq") > maxPrefixFreq)
    val hotStats = pfreq
      .agg(count(lit(1)).as("n_hot"),
        coalesce(sum(expr("pfreq * (pfreq - 1) div 2")), lit(0L)).as("skipped"))
      .collect()(0)
    if (hotStats.getLong(0) > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"jaccardPairsPrefix: capped ${hotStats.getLong(0)} hot prefix " +
          s"tokens (pfreq > $maxPrefixFreq); up to ${hotStats.get(1)} " +
          "candidate pairs skipped — pairs whose only shared prefix " +
          "tokens were hot may be MISSED (losslessness broken by cap)")
    val prefix =
      if (hotStats.getLong(0) == 0) prefixAll
      else prefixAll.join(broadcast(pfreq.select("tok")), Seq("tok"), "left_anti")
    // length filter (also lossless): jac ≥ t forces t·|x| ≤ |y| ≤ |x|/t,
    // so size-mismatched collisions drop before the distinct.
    // POSITIONAL filter (the PPJoin upgrade over plain AllPairs,
    // Xiao et al. 2008): a collision at ordered positions (px, py) can
    // contribute at most 1 + min(|x|−px, |y|−py) common tokens, so it
    // only WITNESSES the pair if that bound reaches the required
    // overlap α = ⌈tNum·(|x|+|y|) / (tNum+tDen)⌉ (jac ≥ t ⟺ inter ≥
    // t/(1+t)·(|x|+|y|)). Lossless per-collision: for any qualifying
    // pair, its FIRST shared token in the global order sits in both
    // prefixes and satisfies the bound (all other shared tokens come
    // after it on both sides), so at least one collision always
    // survives. Integer form: (1+min)·(tNum+tDen) ≥ tNum·(sx+sy) avoids
    // the ceil. Cuts candidates that collide only deep in their
    // prefixes — exactly the near-threshold false positives whose
    // verification dominated q98.
    val cand = Graph.materialize(
      prefix.as("x").join(prefix.as("y"),
        col("x.tok") === col("y.tok") &&
          col(s"x.$idCol") < col(s"y.$idCol") &&
          col("y.sz") * tDen >= col("x.sz") * tNum &&
          col("x.sz") * tDen >= col("y.sz") * tNum &&
          (lit(1L) + least(col("x.sz") - col("x.pos"),
              col("y.sz") - col("y.pos"))) * (tNum + tDen) >=
            (col("x.sz") + col("y.sz")) * tNum)
        .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
        .distinct(),
      None)
    // r15 (the minhashPairsImpl/candidateShingleSets discipline): the
    // candidate list is duplication-bounded and already paid for —
    // materialize it once, then build the sorted verification sets ONLY
    // for candidate endpoints instead of collect_set-ing every doc in
    // the corpus (the verify count stage dominated q98's bill; at 100 TB
    // an all-docs set build is a corpus-wide sort to verify a bounded
    // pair list). Output unchanged: non-candidate sets could never join.
    val candIds = cand.select(col("a").as(idCol))
      .unionByName(cand.select(col("b").as(idCol)))
      .distinct()
    val sets = toks.join(broadcast(candIds), Seq(idCol), "left_semi")
      .groupBy(idCol)
      .agg(sort_array(collect_set(col("tok"))).as("set"))
    val out = cand
      .join(sets.select(col(idCol).as("a"), col("set").as("sa")), "a")
      .join(sets.select(col(idCol).as("b"), col("set").as("sb")), "b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("union", size(col("sa")) + size(col("sb")) - col("inter"))
      .where(col("inter") * tDen >= col("union") * tNum)
      .select(col("a"), col("b"),
        (col("inter").cast("double") / col("union")).as("jac"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize the bounded pair list, then free the big input
    toks.unpersist()
    prefixAll.unpersist()
    out
  }

  /** Overlap-span ATTRIBUTION — the explainability report behind a
    * near-dup verdict: for each winnow-candidate pair, WHERE the shared
    * material sits in each document, as the covering character span
    * [lo, hi] (1-based, inclusive) of the shared fingerprints' grams.
    * The evidence a curator reads before believing a dedup DELETE, and
    * the input to span-level redaction ("cut the quoted block, keep the
    * rest").
    *
    * Positions ride the fingerprints the winnowing already carries
    * (fp = hash·2²⁰ + pos — zero extra passes over the text); a hash
    * occurring at several positions pins its FIRST occurrence per doc
    * (min pos — deterministic, oracle-expressible). Same maxDocFreq
    * boilerplate cap and long-only shuffles as [[winnowOverlapPairs]].
    * Output: (a, b, n_shared, a_lo, a_hi, b_lo, b_hi), a < b.
    */
  def overlapSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, maxDocFreq: Int = 20,
      minShared: Long = 2L): DataFrame = {
    val fps = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol), expr("fp div 1048576").as("h"),
        expr("fp % 1048576").as("pos"))
      .groupBy(idCol, "h").agg(min(col("pos")).as("pos"))
    val cool = fps.groupBy("h")
      .agg(countDistinct(col(idCol)).as("dfreq"))
      .where(col("dfreq") <= maxDocFreq)
      .select("h")
    val kept = fps.join(cool, Seq("h"))
    kept.as("x").join(kept.as("y"),
        col("x.h") === col("y.h") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .agg(count(lit(1)).as("n_shared"),
        min(col("x.pos")).as("a_lo"),
        (max(col("x.pos")) + (k - 1)).as("a_hi"),
        min(col("y.pos")).as("b_lo"),
        (max(col("y.pos")) + (k - 1)).as("b_hi"))
      .where(col("n_shared") >= minShared)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS algorithm): hash every positional character k-gram, slide a
    * window of `w` consecutive hashes, keep each window's MINIMUM — the
    * guarantee is that any shared substring of length ≥ w+k−1 between
    * two documents yields at least one SHARED fingerprint, at ~2/(w+1)
    * the density of full k-gram hashing. The copy-detection primitive
    * between exact chunk dedup (alignment-sensitive) and minhash
    * (whole-document).
    *
    * Determinism: the selected value is the single integer
    * `hash·2²⁰ + pos` (md5-low-32 k-gram hash, leftmost-minimum
    * tie-break via the pos low bits — one total order, no argmin
    * ambiguity), so both engines pick identical fingerprints; texts
    * longer than 2²⁰ chars are rejected rather than silently aliased.
    * Shape (r8): the WHOLE per-document selection is ONE codegen
    * expression ([[graft.functions.expressions.WinnowFps]] — per-position
    * hashes + monotonic-deque sliding min, O(len) per doc) followed by a
    * single explode of the ~len/w distinct fingerprints. The previous
    * declarative form ([[winnowFingerprintsFold]], kept as the parity
    * twin) exploded EVERY position and paid a per-doc window SHUFFLE of
    * the full gram relation — at 10× that shuffle was most of the
    * q97/q111/q118/q122 bill. Row-local ⇒ embarrassingly parallel at
    * any corpus size. Output: (id, fp) distinct pairs; fp still carries
    * the position bits — the paper's document-positioned form.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, keyForm: String = "raw"): DataFrame = {
    require(k >= 1 && w >= 1, s"winnowing needs k >= 1, w >= 1 (got $k, $w)")
    // keyForm folds the text BEFORE gram hashing (the minhashed
    // discipline) — fingerprint positions then index the FOLDED text,
    // fine for content matching (overlap pairs divide positions out);
    // [[overlapSpans]] stays raw-only because its spans are offsets
    // into the caller's original text
    df.select(col(idCol),
      explode(graft.functions.expressions.TextHashExpressions
        .winnowFps(textKeyFor(keyForm, col(textCol)), k, w)).as("fp"))
  }

  /** The declarative fold twin of [[winnowFingerprints]] — posexplode →
    * windowed min → full-window filter → distinct; parity-pinned in
    * TextHashExpressionsSpec/DedupSpec and the shape the oracle mirrors.
    */
  def winnowFingerprintsFold(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"winnowing needs k >= 1, w >= 1 (got $k, $w)")
    val n0 = greatest(length(col(textCol)).cast("long") - (k - 1), lit(1L))
    // guard in the row path (q70 discipline): pos bits alias past 2^20.
    // Condition phrased as ">= raises" so a NULL text falls through to
    // the null n0 and DROPS at the posexplode (the native form's
    // null-propagation semantics) instead of null-tripping the guard.
    val n = when(length(col(textCol)) >= lit(1 << 20),
        raise_error(concat(lit("winnowing: doc "),
          col(idCol).cast("string"),
          lit(" exceeds 2^20 chars — pos bits would alias"))))
      .otherwise(n0)
    val grams = df
      // a null text has no grams: drop the doc (the native form's
      // null-propagation; without this, greatest(null−k, 1) = 1 would
      // fabricate one null fingerprint for it)
      .where(col(textCol).isNotNull)
      .select(col(idCol), n.as("n"), col(textCol).as("__t"))
      .select(col(idCol), col("n"),
        posexplode(transform(sequence(lit(1L), col("n")), p =>
          md5Low32(col("__t").substr(p.cast("int"), lit(k)))))
          .as(Seq("pos0", "h")))
      .select(col(idCol), col("n"), (col("pos0") + 1).cast("long").as("pos"),
        (col("h") * lit(1L << 20) + col("pos0").cast("long") + 1L).as("hp"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos").asc)
      .rowsBetween(0, w - 1)
    grams.withColumn("fp", min(col("hp")).over(win))
      // keep only FULL windows (the last w-1 positions start short ones);
      // docs with fewer than w grams keep their single truncated window
      .where(col("pos") <= greatest(col("n") - (w - 1), lit(1L)))
      .select(col(idCol), col("fp"))
      .distinct()
  }

  /** IDF-weighted shared-term similarity pairs — the "rare words in
    * common" signal BM25 (operators/Rank.scala) applies query-side,
    * here as a document-pair join: score(a, b) = Σ over shared terms of
    * w(t)², with w(t) = N div df(t) — an INTEGER idf surrogate
    * (deliberately not log-idf: log() is not bit-stable cross-engine,
    * and any monotone-decreasing-in-df weight ranks rare-term overlap
    * the same way; the divergence from textbook tf-idf is the price of
    * a hash-checkable oracle and is documented here, not hidden).
    *
    * Scale shape is the q36/q97 cap discipline: only terms with
    * df ≤ maxDocFreq enter the inverted-index self-join — exactly the
    * terms that carry idf weight anyway, so the cap cuts cost where the
    * signal is weakest; hot terms contribute near-zero weight and are
    * dropped with the candidate explosion. Terms shuffle as 60-bit
    * hashes. Output: (a, b, score) with a < b, score > 0.
    */
  def idfOverlapPairs(df: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Int = 20): DataFrame = {
    require(maxDocFreq >= 2, s"maxDocFreq $maxDocFreq must be >= 2")
    val toks = df.select(col(idCol),
        explode(filter(array_distinct(wsTokens(col(textCol))), _ =!= ""))
          .as("tokS"))
      .select(col(idCol), md5Low60(col("tokS")).as("tok"))
      .distinct()
    val n = df.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val rare = toks.groupBy("tok")
      .agg(count(lit(1)).as("dfreq"))
      .where(col("dfreq") <= maxDocFreq && col("dfreq") >= 2)
      .crossJoin(broadcast(n))
      .select(col("tok"), expr("(n_docs div dfreq) * (n_docs div dfreq)").as("w2"))
    val indexed = toks.join(rare, "tok")
    indexed.as("x").join(indexed.as("y"),
        col("x.tok") === col("y.tok") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .agg(sum(col("x.w2")).as("score"))
  }

  /** Set-F1 verification over winnowing candidates: for every pair
    * sharing ≥ `minShared` winnow fingerprint hashes, the exact k-gram
    * set overlap as F1 = 2·|A∩B| / (|A|+|B|) — the dedup-REPORT metric
    * (how much do they overlap) where the pair joins above answer only
    * whether they do. Candidates come from [[winnowOverlapPairs]]'s
    * capped fingerprint join (never all pairs); verification joins each
    * candidate to two collected gram-hash sets, the q98 shape. F1 is one
    * exact division of exact Long counts — portable. Output:
    * (a, b, inter, f1).
    *
    * BATCH-ONLY EAGER: the candidate list materializes at call time
    * ([[winnowCandidates]]); pass `checkpointDir` on a real cluster so
    * the materialized candidates survive executor loss.
    */
  def winnowF1Pairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, maxDocFreq: Int = 20,
      minShared: Long = 2L, keyForm: String = "raw",
      checkpointDir: Option[String] = None): DataFrame = {
    val cand = winnowCandidates(df, idCol, textCol, k, w, maxDocFreq,
      minShared, keyForm, checkpointDir)
    val sets = candidateShingleSets(df, idCol, textCol, cand, k, keyForm)
    cand
      .join(sets.select(col(idCol).as("a"), col("set").as("sa")), "a")
      .join(sets.select(col(idCol).as("b"), col("set").as("sb")), "b")
      .withColumn("inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .select(col("a"), col("b"), col("inter"),
        (col("inter") * 2 / (size(col("sa")) + size(col("sb"))).cast("double"))
          .as("f1"))
  }

  /** The winnow-candidate pair list shared by the verify-stage callers
    * ([[winnowF1Pairs]], [[containmentPairs]]): overlap pairs at
    * `n_shared >= minShared`, MATERIALIZED eagerly — the list is
    * duplication-bounded, and both downstream legs (the candidate-doc
    * semi-join and the verification join) read it, so without the
    * checkpoint the whole fingerprint pipeline would run once per leg.
    *
    * Materialization is [[Graph.materialize]] (r15): `checkpointDir`
    * routes to a RELIABLE `checkpoint` whose blocks live on the shared
    * filesystem and survive executor decommission — the cluster
    * contract; `None` keeps the local default (`localCheckpoint` —
    * executor-storage blocks, zero fs round-trip, lost with a lost
    * executor, which on `local[n]` means lost with the JVM). Either way
    * the eager cut makes the verify entry points BATCH-ONLY EAGER
    * operators: they run the fingerprint job at call time, so they are
    * not lazy plan builders and cannot be applied to streaming frames.
    */
  private def winnowCandidates(df: DataFrame, idCol: String,
      textCol: String, k: Int, w: Int, maxDocFreq: Int, minShared: Long,
      keyForm: String, checkpointDir: Option[String]): DataFrame =
    Graph.materialize(
      winnowOverlapPairs(df, idCol, textCol, k, w, maxDocFreq, keyForm)
        .where(col("n_shared") >= minShared)
        .select("a", "b"),
      checkpointDir)

  /** Exact char-k-gram shingle sets for CANDIDATE DOCS ONLY — the r14
    * verify-leg fix (VERDICT r13 #2): the pre-r14 form built the
    * shingle array (one md5 per character position) for EVERY corpus
    * doc and let the candidate join discard all but the ~|cand| rows —
    * at 10× that full-corpus pass WAS most of the q118 bill, and at
    * 100 TB it re-scans the corpus to verify a duplication-bounded pair
    * list. The candidate ids broadcast into a semi-join (bounded: the
    * `maxDocFreq` cap bounds pairs per fingerprint bucket at
    * C(cap, 2); a corpus whose candidate set outgrows a broadcast is
    * one where verification itself is corpus-scale — run the batch
    * scrub family instead), so the expensive per-char shingle transform
    * touches only docs that actually need verifying. Sets fold under
    * the SAME `keyForm` as the candidates.
    */
  private def candidateShingleSets(df: DataFrame, idCol: String,
      textCol: String, cand: DataFrame, k: Int,
      keyForm: String): DataFrame = {
    val candIds = cand.select(col("a").as(idCol))
      .unionByName(cand.select(col("b").as(idCol)))
      .distinct()
    val count = greatest(length(col("__kt")).cast("long") - (k - 1), lit(1L))
    df.join(broadcast(candIds), Seq(idCol), "left_semi")
      .select(col(idCol), textKeyFor(keyForm, col(textCol)).as("__kt"))
      .select(col(idCol),
        array_distinct(transform(sequence(lit(1L), count),
          p => md5Low32(col("__kt").substr(p.cast("int"), lit(k))))).as("set"))
      .select(col(idCol), sort_array(col("set")).as("set"))
  }

  /** Winnowing overlap pairs — MOSS's actual report: documents ranked by
    * how many distinct fingerprint HASHES they share. Matching divides
    * the position bits back out of the selected fingerprints (matching
    * on content, not layout — a copy shifted by any offset still
    * matches, which is the point of the w+k−1 guarantee). Hashes hotter
    * than `maxDocFreq` docs (site boilerplate) are dropped BEFORE the
    * pair join — the same cap discipline as the n-gram Jaccard capped
    * join; the join key is a long, so the shuffle never carries text.
    * Output: (a, b, n_shared) with a < b.
    */
  def winnowOverlapPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, maxDocFreq: Int = 20,
      keyForm: String = "raw"): DataFrame = {
    // NOT persisted, unlike the q98 element relation: measured at sf0.1
    // the cache write of the ~3M-row fingerprint frame costs more than
    // the recompute it saves (the gram pipeline here is one explode +
    // one windowed min — cheap; q98's five-leg tokenize+gram+md5 isn't)
    val hs = winnowFingerprints(df, idCol, textCol, k, w, keyForm)
      .select(col(idCol), expr("fp div 1048576").as("h"))
      .distinct()
    val cool = hs.groupBy("h")
      .agg(countDistinct(col(idCol)).as("dfreq"))
      .where(col("dfreq") <= maxDocFreq)
      .select("h")
    val kept = hs.join(cool, Seq("h"))
    kept.as("x").join(kept.as("y"),
        col("x.h") === col("y.h") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** DIRECTED containment (quote/excerpt detection): winnow candidates
    * verified as exact k-gram-set containment |src ∩ dst| / |src| — the
    * asymmetric twin of [[winnowF1Pairs]]'s symmetric F1. A short doc
    * pasted inside a long one scores ~1.0 as src→dst while the reverse
    * direction stays low, which is exactly what F1 (normalized by BOTH
    * sizes) washes out — this is the "which side is the quote" report.
    *
    * Each unordered candidate pair is judged in both directions; a
    * direction survives when 1000·inter >= minMille·|src| — the
    * threshold as a cross-multiplied Long comparison, no float in the
    * gate. `containment` itself is the one exact division at the end.
    * Candidates come from the capped fingerprint join (never all
    * pairs); both directions reuse ONE verification join. Output:
    * (src, dst, inter, n_src, containment).
    *
    * BATCH-ONLY EAGER: the candidate list materializes at call time
    * ([[winnowCandidates]]); pass `checkpointDir` on a real cluster so
    * the materialized candidates survive executor loss.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, maxDocFreq: Int = 20,
      minShared: Long = 2L, minMille: Long = 500L,
      keyForm: String = "raw",
      checkpointDir: Option[String] = None): DataFrame = {
    val cand = winnowCandidates(df, idCol, textCol, k, w, maxDocFreq,
      minShared, keyForm, checkpointDir)
    // candidate-docs-only verify sets (the winnowF1Pairs r14 shape);
    // keyForm folds candidates AND verify sets identically (r14 — this
    // entry point was the one winnow verifier still raw-only)
    val sets = candidateShingleSets(df, idCol, textCol, cand, k, keyForm)
    val verified = cand
      .join(sets.select(col(idCol).as("a"), col("set").as("sa")), "a")
      .join(sets.select(col(idCol).as("b"), col("set").as("sb")), "b")
      .select(col("a"), col("b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
        size(col("sa")).cast("long").as("na"),
        size(col("sb")).cast("long").as("nb"))
    // both directions from ONE row via explode — a unionAll of two
    // selects would plan the whole candidate+verification subtree twice
    verified.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst"),
          col("inter"), col("na").as("n_src")),
        struct(col("b").as("src"), col("a").as("dst"),
          col("inter"), col("nb").as("n_src")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.inter").as("inter"), col("e.n_src").as("n_src"))
      .where(lit(1000L) * col("inter") >= lit(minMille) * col("n_src"))
      .select(col("src"), col("dst"), col("inter"), col("n_src"),
        (col("inter").cast("double") / col("n_src").cast("double"))
          .as("containment"))
  }
}
