package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dsir

/** DSIR data-selection queries (Xie et al. 2023) — the importance-
  * resampling curation stage, oracle-checked end-to-end in exact integer
  * arithmetic. Target distribution = English documents (`lang = 'en'`,
  * the corpus's dominant coherent subset); raw = the whole corpus. Three
  * queries pin the three passes independently: the bounded score table
  * (q128), the row-local per-document weights (q129), and the priority
  * resample (q130). The paper-faithful log-ratio scorer is float-typed
  * and therefore ScalaTest-pinned (DsirSpec), per FIXTURES.md §3.
  */
object SelectionQueries {

  private val B = 4096
  private val SCALE = 10000L

  /** DuckDB twin of [[Dsir.grams]] + [[TextFunctions.md5Bucket]]: every
    * unigram + bigram occurrence (multiplicity kept) hashed to a bucket.
    * Yields relation (doc_id, lang, bucket).
    */
  private def duckGramBucketsFrom(src: String) =
    s"""t AS (SELECT doc_id, lang,
      |  regexp_split_to_array(trim(text), '\\s+') AS toks FROM $src),
      |g AS (SELECT doc_id, lang, unnest(list_concat(toks,
      |    CASE WHEN len(toks) >= 2
      |         THEN list_transform(range(1, len(toks)),
      |                i -> toks[i] || ' ' || toks[i+1])
      |         ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM t),
      |b AS (SELECT doc_id, lang,
      |  CAST('0x' || substr(md5('dsir:' || gram), 25, 8) AS BIGINT) % $B
      |    AS bucket FROM g)""".stripMargin

  private val duckGramBuckets = duckGramBucketsFrom("documents")

  /** Score table CTE on top of `b`: add-1-smoothed integer frequency
    * ratio per bucket — DuckDB `//` and Spark `div` agree on positives.
    */
  private val duckScores =
    s"""sc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS rc,
      |  CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS tc,
      |  ((CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) + 1)
      |    * $SCALE) // (CAST(COUNT(*) AS BIGINT) + 1) AS score
      |  FROM b GROUP BY bucket)""".stripMargin

  /** Per-doc weight CTE on top of `b` + `sc`. */
  private val duckWeights =
    """w AS (SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(sc.score) AS BIGINT) AS weight
      |  FROM b JOIN sc USING (bucket) GROUP BY b.doc_id)""".stripMargin


  /** DuckDB twin of [[graft.functions.TextFunctions.charShingles]] —
    * kept in lockstep with PipelineQueries' copy.
    */
  private val duckShingles =
    "list_distinct(list_transform(range(0, greatest(length(text)-4, 1)), i -> substr(text, CAST(i+1 AS INT), 5)))"

  val all: Seq[QueryDef] = Seq(

    // DSIR pass 1+2: the bounded per-bucket statistics — raw count,
    // target count, smoothed integer ratio. Top-20 most target-
    // distinctive buckets; state is <= 4096 rows at ANY corpus size.
    QueryDef("q128_dsir_buckets",
      (s, d) => Dsir.bucketScoreTable(Tables.documentsPar(s, d), "text",
          col("lang") === "en", buckets = B, scale = SCALE)
        .orderBy(col("score").desc, col("bucket").asc)
        .limit(20),
      Some(s"""WITH $duckGramBuckets,
        |$duckScores
        |SELECT bucket, rc, tc, score FROM sc
        |ORDER BY score DESC, bucket ASC LIMIT 20""".stripMargin)),

    // DSIR pass 3: row-local per-document importance weights (sum of
    // bucket scores over the doc's own gram occurrences, mean-normalized
    // by length). Top-20 most English-like documents. The Spark side
    // carries the score table as ONE literal array — the scoring scan
    // has zero Exchange (plan-pinned in DsirSpec).
    QueryDef("q129_dsir_weights",
      (s, d) => {
        val docs = Tables.documentsPar(s, d)
        val table = Dsir.bucketScoreTable(docs, "text",
          col("lang") === "en", buckets = B, scale = SCALE)
        val scores = Dsir.collectScores(table, B, SCALE)
        Dsir.importanceWeights(docs, "doc_id", "text", scores)
          .orderBy(col("mean_score").desc, col("doc_id").asc)
          .limit(20)
      },
      Some(s"""WITH $duckGramBuckets,
        |$duckScores,
        |$duckWeights
        |SELECT doc_id, n_grams, weight, weight // n_grams AS mean_score
        |FROM w ORDER BY mean_score DESC, doc_id ASC LIMIT 20""".stripMargin)),

    // End-to-end DSIR selection: importance weights -> priority RESAMPLE
    // (Duffield-Lund-Thorup with the exact-integer md5 coin — the
    // reproducible Gumbel-top-k step). 10 winners; `priority` is the
    // selection evidence, reproduced bit-for-bit by the oracle.
    QueryDef("q130_dsir_select",
      (s, d) => Dsir.select(Tables.documentsPar(s, d), "doc_id", "text",
          col("lang") === "en", n = 10, buckets = B, scale = SCALE)
        .orderBy(col("priority").desc, col("doc_id").asc),
      Some(s"""WITH $duckGramBuckets,
        |$duckScores,
        |$duckWeights,
        |m AS (SELECT doc_id, n_grams, weight,
        |  weight // n_grams AS mean_score FROM w),
        |p AS (SELECT *, (mean_score * 4294967296)
        |  // (CAST('0x' || substr(md5('dsir:rs:' ||
        |       CAST(doc_id AS VARCHAR)), 25, 8) AS BIGINT) + 1) AS priority
        |  FROM m)
        |SELECT doc_id, n_grams, weight, mean_score, priority FROM p
        |ORDER BY priority DESC, doc_id ASC LIMIT 10""".stripMargin)),

    // THE WHOLE CURATION PIPELINE as one declarative oracle-checked
    // plan — the q55/q87 composition discipline at full pipeline width:
    //   exact dedup (keep-min survivor)
    //   -> n-gram benchmark decontamination (bench = doc_id%10==7)
    //   -> quality gate (>= 30 tokens)
    //   -> DSIR selection (top-50 most-English by integer mean_score,
    //      score table computed over the GATED corpus — self-contained)
    //   -> curriculum order (two-level exact global index by token band).
    // Every stage is individually oracle-pinned (q15/q50/q114/q128-130/
    // q134); this pins their COMPOSITION — filters feeding filters,
    // score tables trained on filtered corpora, ranks over selections.
    QueryDef("q136_curation_pipeline",
      (s, d) => {
        import graft.operators.{Curriculum, Decontaminate, Dedup}
        import graft.functions.TextFunctions
        val docs = Tables.documents(s, d)
        val bench = docs.where(col("doc_id") % 10 === 7)
        val corpus0 = docs.where(col("doc_id") % 10 =!= 7)
        val survivors = Dedup.exact(corpus0, "doc_id", "text")
          .select("doc_id")
        val dd = docs.join(survivors, Seq("doc_id"))
        val clean = Decontaminate.cleanCorpus(dd, bench, "doc_id", "text",
          n = 8)
        // the dedup+decontamination lineage feeds several passes below;
        // an explicit persist measured NO faster (Catalyst's
        // ReusedExchange already shares the shuffle subtrees), so the
        // plan stays declarative — Curate.withCurated is the cached form
        val gated = clean
          .withColumn("n_tok",
            size(TextFunctions.wsTokens(col("text"))).cast("long"))
          .where(col("n_tok") >= 30)
        val table = Dsir.bucketScoreTable(gated, "text",
          col("lang") === "en", buckets = B, scale = SCALE)
        val sel = Dsir.importanceWeights(gated, "doc_id", "text",
            Dsir.collectScores(table, B, SCALE))
          .orderBy(col("mean_score").desc, col("doc_id").asc).limit(50)
          .select("doc_id", "mean_score")
        val withBand = sel.join(
          gated.select(col("doc_id"), expr("n_tok div 50").as("band")),
          Seq("doc_id"))
        Curriculum.globalOrderIndex(withBand, "band", "doc_id")
          .select(col("ord"), col("doc_id"), col("band"), col("mean_score"))
          .orderBy("ord")
      },
      Some(s"""WITH c0 AS (SELECT * FROM documents WHERE doc_id % 10 != 7),
        |ded AS (SELECT min(doc_id) AS doc_id FROM c0 GROUP BY lower(trim(text))),
        |dd AS (SELECT d.* FROM documents d JOIN ded USING (doc_id)),
        |cg AS (SELECT doc_id, CAST('0x'||substr(md5(unnest(grams)),18,15) AS BIGINT) AS gh FROM
        |  (SELECT doc_id, list_distinct(list_transform(
        |     range(0, greatest(length(toks)-7, 1)),
        |     i -> array_to_string(list_slice(toks, CAST(i+1 AS INT), CAST(i+8 AS INT)), ' '))) AS grams
        |   FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM dd))),
        |bg AS (SELECT DISTINCT CAST('0x'||substr(md5(unnest(grams)),18,15) AS BIGINT) AS gh FROM
        |  (SELECT list_distinct(list_transform(
        |     range(0, greatest(length(toks)-7, 1)),
        |     i -> array_to_string(list_slice(toks, CAST(i+1 AS INT), CAST(i+8 AS INT)), ' '))) AS grams
        |   FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks
        |         FROM documents WHERE doc_id % 10 = 7))),
        |flagged AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gh)),
        |gated AS (SELECT dd.*,
        |    CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
        |  FROM dd
        |  WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
        |    AND length(regexp_split_to_array(trim(text), '\\s+')) >= 30),
        |${duckGramBucketsFrom("gated")},
        |$duckScores,
        |$duckWeights,
        |sel AS (SELECT doc_id, weight // n_grams AS mean_score FROM w
        |        ORDER BY mean_score DESC, doc_id ASC LIMIT 50),
        |fin AS (SELECT s.doc_id, s.mean_score, g2.n_tok // 50 AS band
        |        FROM sel s JOIN gated g2 USING (doc_id))
        |SELECT CAST(row_number() OVER (ORDER BY band, doc_id) AS BIGINT) AS ord,
        |  doc_id, band, mean_score
        |FROM fin ORDER BY ord""".stripMargin)),

    // Epoch-weighted source mixing (the LLaMA data-recipe table): three
    // sources get absolute token budgets; each document emits
    // floor(budget/avail) full copies + one more on an exact-integer
    // md5 coin with P = frac(budget/avail) — expected emitted tokens hit
    // the budget exactly, every copy decision reproducible on any
    // engine (DECIMAL(38,0) cross-multiplied compare, no float ratio).
    // Output = per-source emitted totals (bounded rows at any scale).
    QueryDef("q145_epoch_mix",
      (s, d) => {
        import graft.functions.TextFunctions
        val docs = Tables.documents(s, d).select(col("source"), col("doc_id"),
          size(TextFunctions.wsTokens(col("text"))).cast("long").as("n_tok"))
        graft.operators.Sampling.epochExpand(docs, "doc_id", "n_tok",
            "source",
            Map("src1" -> 30000L, "src2" -> 4000L, "src3" -> 10000L))
          .groupBy("source")
          .agg(count(lit(1)).as("rows_out"), sum("n_tok").as("toks_out"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source, doc_id,
        |  CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok FROM documents),
        |b(source, budget) AS (VALUES ('src1', CAST(30000 AS BIGINT)),
        |  ('src2', CAST(4000 AS BIGINT)), ('src3', CAST(10000 AS BIGINT))),
        |a AS (SELECT source, SUM(n_tok) AS avail FROM t GROUP BY source),
        |p AS (SELECT a.source, budget // avail AS fullc, budget % avail AS rem, avail
        |      FROM a JOIN b USING (source)),
        |x AS (SELECT t.source, t.n_tok, p.fullc +
        |    CASE WHEN CAST(CAST('0x'||substr(md5('epoch:'||CAST(t.doc_id AS VARCHAR)),25,8) AS BIGINT) AS DECIMAL(38,0))
        |             * CAST(p.avail AS DECIMAL(38,0))
        |           < CAST(p.rem AS DECIMAL(38,0)) * CAST(4294967296 AS DECIMAL(38,0))
        |         THEN 1 ELSE 0 END AS copies
        |  FROM t JOIN p USING (source))
        |SELECT source, CAST(SUM(copies) AS BIGINT) AS rows_out,
        |  CAST(SUM(copies * n_tok) AS BIGINT) AS toks_out
        |FROM x WHERE copies > 0 GROUP BY source ORDER BY source""".stripMargin)),

    // Recipe -> batches, the actual LAST MILE: the epoch-expanded corpus
    // (q145's exact copies, per-copy rows) packed into 512-token
    // training bins per source (q44's exclusive-running-sum packer) —
    // "how many batches does this data recipe actually yield". All
    // integer arithmetic end to end.
    QueryDef("q146_recipe_pack",
      (s, d) => {
        import graft.functions.TextFunctions
        val docs = Tables.documents(s, d).select(col("source"), col("doc_id"),
          size(TextFunctions.wsTokens(col("text"))).cast("long").as("n_tok"))
        val expanded = graft.operators.Sampling.epochExpand(docs, "doc_id",
          "n_tok", "source",
          Map("src1" -> 30000L, "src2" -> 4000L, "src3" -> 10000L))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("doc_id"), col("copy_idx"))
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        expanded
          .withColumn("cum", coalesce(sum(col("n_tok")).over(w), lit(0L)))
          .withColumn("bin", expr("cum div 512"))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_seqs"), sum(col("n_tok")).as("sum_tok"))
          .orderBy("source", "bin")
      },
      Some("""WITH t AS (SELECT source, doc_id,
        |  CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok FROM documents),
        |b(source, budget) AS (VALUES ('src1', CAST(30000 AS BIGINT)),
        |  ('src2', CAST(4000 AS BIGINT)), ('src3', CAST(10000 AS BIGINT))),
        |a AS (SELECT source, SUM(n_tok) AS avail FROM t GROUP BY source),
        |p AS (SELECT a.source, budget // avail AS fullc, budget % avail AS rem, avail
        |      FROM a JOIN b USING (source)),
        |x AS (SELECT t.source, t.doc_id, t.n_tok, p.fullc +
        |    CASE WHEN CAST(CAST('0x'||substr(md5('epoch:'||CAST(t.doc_id AS VARCHAR)),25,8) AS BIGINT) AS DECIMAL(38,0))
        |             * CAST(p.avail AS DECIMAL(38,0))
        |           < CAST(p.rem AS DECIMAL(38,0)) * CAST(4294967296 AS DECIMAL(38,0))
        |         THEN 1 ELSE 0 END AS copies
        |  FROM t JOIN p USING (source)),
        |e AS (SELECT source, doc_id, n_tok, unnest(range(0, CAST(copies AS BIGINT))) AS copy_idx
        |      FROM x WHERE copies > 0),
        |c AS (SELECT source, n_tok, COALESCE(SUM(n_tok) OVER (PARTITION BY source
        |  ORDER BY doc_id, copy_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM e)
        |SELECT source, CAST(CAST(cum AS BIGINT) // 512 AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n_seqs,
        |  CAST(SUM(n_tok) AS BIGINT) AS sum_tok
        |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin)),

    // Temperature-rebalanced multilingual sampling (XLM/mC4 alpha=1/2):
    // each language's quota grows like sqrt(its size) — low-resource
    // langs over-sampled relative to share, the head capped. Quotas are
    // exact integers (floor(sqrt(n*1e6)) — IEEE sqrt is correctly
    // rounded, identical on both engines); the within-lang pick is the
    // q57 md5-coin reservoir. Output is quota-bounded (<= 100 rows) at
    // ANY corpus size.
    QueryDef("q139_temperature_sample",
      (s, d) => graft.operators.Sampling.temperatureSample(
          Tables.documents(s, d).select(col("lang"), col("doc_id")),
          "lang", "doc_id", total = 100L, salt = "temp:")
        .select(col("lang"), col("doc_id"), col("rk"))
        .orderBy("lang", "rk"),
      Some("""WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n, CAST(floor(sqrt(CAST(n AS DOUBLE) * 1000000)) AS BIGINT) AS w FROM c),
        |t AS (SELECT SUM(w) AS sw FROM w),
        |a AS (SELECT lang, (100 * w) // sw AS alloc FROM w, t),
        |r AS (SELECT lang, doc_id, CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST('0x'||substr(md5('temp:'||CAST(doc_id AS VARCHAR)),25,8) AS BIGINT) ASC,
        |             doc_id ASC) AS BIGINT) AS rk
        |  FROM documents)
        |SELECT r.lang, r.doc_id, r.rk FROM r JOIN a USING (lang)
        |WHERE r.rk <= a.alloc ORDER BY lang, rk""".stripMargin)),

    // ROW-LOCAL decontamination (the streaming-compatible inline form,
    // r8): the bench gram set frozen driver-side, applied as one literal
    // array-intersect per doc — no join, no aggregation, so the SAME
    // plan serves a batch frame and a stream. The oracle recomputes the
    // join form; the hash match proves the inline gate selects the
    // identical survivor set (same md5-low60 gram space as q50).
    QueryDef("q147_inline_decontam",
      (s, d) => {
        val docs = Tables.documentsPar(s, d)
        // the eval set is FIXED-SIZE by nature (the whole premise of the
        // inline literal gate): pin it to the base id range so a scaled
        // fixture grows the CORPUS, not the benchmark — without the cap
        // the 10x sweep's bench hit 225k grams and correctly tripped
        // the benchGramSet guard
        val bench = docs.where(col("doc_id") % 10 === 7 &&
          col("doc_id") < 5000)
        val grams = graft.operators.Decontaminate.benchGramSet(
          bench, "doc_id", "text", n = 8)
        graft.operators.Decontaminate.cleanCorpusInline(
            docs.where(col("doc_id") % 10 =!= 7), grams, "text",
            n = 8, minShared = 2)
          .select(col("doc_id")).orderBy("doc_id")
      },
      Some("""WITH g AS (SELECT doc_id, list_distinct(list_transform(
        |  range(0, greatest(length(regexp_split_to_array(trim(text), '\s+'))-7, 1)),
        |  i -> array_to_string(list_slice(regexp_split_to_array(trim(text), '\s+'), CAST(i+1 AS INT), CAST(i+8 AS INT)), ' '))) AS grams
        |  FROM documents),
        |h AS (SELECT doc_id, CAST('0x'||substr(md5(unnest(grams)),18,15) AS BIGINT) AS gh FROM g),
        |bench AS (SELECT DISTINCT gh FROM h WHERE doc_id % 10 = 7 AND doc_id < 5000),
        |f AS (SELECT h.doc_id FROM h JOIN bench USING (gh)
        |  WHERE h.doc_id % 10 != 7 GROUP BY h.doc_id
        |  HAVING count(DISTINCT h.gh) >= 2)
        |SELECT doc_id FROM documents WHERE doc_id % 10 != 7
        |  AND doc_id NOT IN (SELECT doc_id FROM f)
        |ORDER BY doc_id""".stripMargin)),

    // Cluster REPRESENTATIVE selection by quality (r8): q64's near-dup
    // components, but instead of a min-label summary the pipeline keeps
    // the BEST member per cluster — highest n_chars, ties to the lowest
    // id (what a curator actually deploys: dedup keeps the richest copy,
    // not an arbitrary one). The oracle re-derives the components with
    // the recursive CTE and picks the same representative.
    QueryDef("q148_cluster_best_rep",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Dedup.withMinhashPairs(docs, "doc_id", "text") { pairs =>
          val cc = graft.operators.Graph.connectedComponents(
            pairs.where(col("jac") >= 0.5), "a", "b")
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("component"))
            .orderBy(col("n_chars").desc, col("id").asc)
          cc.join(docs.select(col("doc_id").as("id"),
              col("n_chars").cast("long").as("n_chars")), "id")
            .withColumn("rn", row_number().over(w))
            .groupBy(col("component"))
            .agg(max(when(col("rn") === 1, col("id"))).as("rep_id"),
              max(when(col("rn") === 1, col("n_chars"))).as("rep_chars"),
              count(lit(1)).as("n_members"))
            .orderBy("component")
        }
      },
      Some(s"""WITH RECURSIVE sh AS (SELECT doc_id, $duckShingles AS shingles FROM documents),
        |hv AS (SELECT doc_id, shingles, list_transform(shingles, s -> CAST('0x'||substr(md5(s),25,8) AS BIGINT)) AS hs FROM sh),
        |sig AS (SELECT doc_id, list_transform(range(0,16), k -> list_min(list_transform(hs, x -> (x*(2*k+1) + (1000000007*k+17)) % 4294967311))) AS sg FROM hv),
        |bands AS (SELECT doc_id, j AS band_idx,
        |  CAST(sg[4*CAST(j AS INT)+1] AS VARCHAR)||':'||CAST(sg[4*CAST(j AS INT)+2] AS VARCHAR)||':'||CAST(sg[4*CAST(j AS INT)+3] AS VARCHAR)||':'||CAST(sg[4*CAST(j AS INT)+4] AS VARCHAR) AS band_key
        |  FROM sig, range(0,4) t(j)),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x JOIN bands y
        |  ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
        |pairs AS (SELECT c.a, c.b,
        |  CAST(length(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
        |    (length(sa.shingles) + length(sb.shingles) - length(list_intersect(sa.shingles, sb.shingles))) AS jac
        |  FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b),
        |pr AS (SELECT a, b FROM pairs WHERE jac >= 0.5),
        |e AS (SELECT a, b FROM pr UNION SELECT b AS a, a AS b FROM pr),
        |reach(id, r) AS (
        |  SELECT a AS id, a AS r FROM e
        |  UNION
        |  SELECT e.a AS id, reach.r FROM e JOIN reach ON reach.id = e.b),
        |cc AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |m AS (SELECT cc.component, cc.id, CAST(d.n_chars AS BIGINT) AS n_chars,
        |  row_number() OVER (PARTITION BY cc.component
        |    ORDER BY d.n_chars DESC, cc.id ASC) AS rn
        |  FROM cc JOIN documents d ON d.doc_id = cc.id)
        |SELECT component,
        |  MAX(CASE WHEN rn = 1 THEN id END) AS rep_id,
        |  MAX(CASE WHEN rn = 1 THEN n_chars END) AS rep_chars,
        |  CAST(COUNT(*) AS BIGINT) AS n_members
        |FROM m GROUP BY component ORDER BY component""".stripMargin)),

    // Two-sample KS drift monitor (r8): the distribution-shift check a
    // continuous-ingest pipeline runs between a reference source and a
    // new one. Integer-exact: bucketed cumulative counts and the
    // cross-multiplied CDF gap |cumA·nB − cumB·nA| (the KS numerator) —
    // no float CDFs, so the whole drift table hash-matches. State is
    // ≤ buckets rows at any corpus size.
    QueryDef("q149_ks_drift",
      (s, d) => graft.operators.Profile.ksDrift(
        Tables.documents(s, d), "source", "n_chars",
        "src0", "src1", bucketWidth = 64L, buckets = 16),
      Some("""WITH two AS (SELECT source AS g,
        |  LEAST(CAST(n_chars AS BIGINT) // 64, 15) AS bucket
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |pb AS (SELECT bucket,
        |  CAST(COUNT(*) FILTER (WHERE g = 'src0') AS BIGINT) AS n_a,
        |  CAST(COUNT(*) FILTER (WHERE g = 'src1') AS BIGINT) AS n_b
        |  FROM two GROUP BY bucket),
        |c AS (SELECT bucket, n_a, n_b,
        |  CAST(SUM(n_a) OVER (ORDER BY bucket) AS BIGINT) AS cum_a,
        |  CAST(SUM(n_b) OVER (ORDER BY bucket) AS BIGINT) AS cum_b FROM pb),
        |t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta,
        |  CAST(SUM(n_b) AS BIGINT) AS tb FROM pb)
        |SELECT bucket, n_a, n_b, cum_a, cum_b,
        |  CAST(abs(cum_a * tb - cum_b * ta) AS BIGINT) AS gap_num
        |FROM c, t ORDER BY bucket""".stripMargin)),

    // (tvDriftOracle — the shared from-scratch recompute — is defined
    // below the list; q168 and q170 must stay bit-identical to it.)
    //
    // Token-distribution drift across ALL source pairs (r10): q149's
    // twin one level up — not one numeric column between two named
    // samples, but the whole unigram distribution over every pair.
    // Total-variation distance needs no logs (KL/JS do), so the whole
    // statistic is exact integer/decimal arithmetic: tokens hash into
    // 4096 md5 buckets (bounded state), numerator Σ|c_A·N_B − c_B·N_A|
    // on denominator 2·N_A·N_B; one-sided buckets fold in via the
    // S_A/S_B decomposition so only a bucket equi-join of the bounded
    // count relation runs. tv_permille is the 0..1000 headline.
    QueryDef("q168_token_tv_drift",
      (s, d) => graft.operators.Profile.tokenTvDrift(
          Tables.documents(s, d), "source", "text")
        .orderBy("src_a", "src_b"),
      Some(tvDriftOracle)),

    // IVM-served TV drift (r10): q127's refresh discipline applied to
    // q168 — the (source, bucket) count state is an additive monoid, so
    // it maintains in O(delta): base state ⊕ delta state, merged by
    // key-wise sum, read through tokenTvDriftFromCounts. The oracle is
    // q168's from-scratch recompute VERBATIM — the hash match proves
    // merge == recompute on the full drift table.
    QueryDef("q170_ivm_tv_drift",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val base = graft.operators.Profile.tokenBucketCounts(
          docs.where(col("doc_id") < 250), "source", "text")
        val delta = graft.operators.Profile.tokenBucketCounts(
          docs.where(col("doc_id") >= 250), "source", "text")
        graft.operators.Profile.tokenTvDriftFromCounts(
            graft.operators.Profile.mergeTokenBucketCounts(Seq(base, delta)))
          .orderBy("src_a", "src_b")
      },
      Some(tvDriftOracle)),

    // Majority-vote label aggregation (r8): N raters / weak classifiers
    // per item → one consolidated training label, deterministic
    // tie-break to the smallest label. total_votes rides along so a
    // caller can gate on agreement ratio in integers.
    QueryDef("q150_majority_label",
      (s, d) => graft.operators.Rank.majorityVote(
          Tables.events(s, d), "user_id", "event_type")
        .orderBy("user_id"),
      Some("""WITH c AS (SELECT user_id, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_votes FROM events GROUP BY 1, 2),
        |r AS (SELECT user_id, event_type, n_votes,
        |  CAST(SUM(n_votes) OVER (PARTITION BY user_id) AS BIGINT) AS total_votes,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY n_votes DESC, event_type ASC) AS rn FROM c)
        |SELECT user_id, event_type, n_votes, total_votes
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // Curation FATE attribution — q136's pipeline config, answered per
    // document: the first stage that rejected it (exact_dup /
    // contaminated / token_gate / not_selected) or 'kept'. Curate.explain
    // does NOT re-implement stage predicates — Curate.run executes with a
    // survivor-snapshot trace, so the audit can't drift from the pipeline
    // it audits; the oracle re-derives every stage set independently and
    // the hash-match pins the full attribution for all 450 input docs.
    QueryDef("q156_curation_fate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bench = docs.where(col("doc_id") % 10 === 7)
        val corpus0 = docs.where(col("doc_id") % 10 =!= 7)
        graft.operators.Curate.explain(corpus0, "doc_id", "text",
          graft.operators.Curate.Config(
            exactDedup = true,
            decontaminateBench = Some(bench),
            minTokens = 30,
            dsirTarget = Some(col("lang") === "en"),
            dsirTopN = 50))
          .orderBy("doc_id")
      },
      Some(s"""WITH c0 AS (SELECT * FROM documents WHERE doc_id % 10 != 7),
        |ded AS (SELECT min(doc_id) AS doc_id FROM c0 GROUP BY lower(trim(text))),
        |dd AS (SELECT d.* FROM c0 d JOIN ded USING (doc_id)),
        |cg AS (SELECT doc_id, CAST('0x'||substr(md5(unnest(grams)),18,15) AS BIGINT) AS gh FROM
        |  (SELECT doc_id, list_distinct(list_transform(
        |     range(0, greatest(length(toks)-7, 1)),
        |     i -> array_to_string(list_slice(toks, CAST(i+1 AS INT), CAST(i+8 AS INT)), ' '))) AS grams
        |   FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM dd))),
        |bg AS (SELECT DISTINCT CAST('0x'||substr(md5(unnest(grams)),18,15) AS BIGINT) AS gh FROM
        |  (SELECT list_distinct(list_transform(
        |     range(0, greatest(length(toks)-7, 1)),
        |     i -> array_to_string(list_slice(toks, CAST(i+1 AS INT), CAST(i+8 AS INT)), ' '))) AS grams
        |   FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks
        |         FROM documents WHERE doc_id % 10 = 7))),
        |flagged AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gh)),
        |gated AS (SELECT dd.*,
        |    CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
        |  FROM dd
        |  WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
        |    AND length(regexp_split_to_array(trim(text), '\\s+')) >= 30),
        |${duckGramBucketsFrom("gated")},
        |$duckScores,
        |$duckWeights,
        |sel AS (SELECT doc_id FROM w
        |        ORDER BY weight // n_grams DESC, doc_id ASC LIMIT 50)
        |SELECT c0.doc_id,
        |  CASE
        |    WHEN c0.doc_id NOT IN (SELECT doc_id FROM dd) THEN 'exact_dup'
        |    WHEN c0.doc_id IN (SELECT doc_id FROM flagged) THEN 'contaminated'
        |    WHEN c0.doc_id NOT IN (SELECT doc_id FROM gated) THEN 'token_gate'
        |    WHEN c0.doc_id NOT IN (SELECT doc_id FROM sel) THEN 'not_selected'
        |    ELSE 'kept'
        |  END AS fate
        |FROM c0 ORDER BY c0.doc_id""".stripMargin)),

    // Eval-item leakage report — q50's decontamination flipped to the
    // benchmark side: which EVAL items are burned (share an 8-gram with
    // any training doc) and must be discarded before the benchmark can
    // measure anything. Whole-benchmark coverage, zero-collision rows
    // included. One corpus gram scan + broadcast bench grams + a
    // <=|bench|-key agg.
    QueryDef("q157_eval_leakage",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // eval sets are FIXED-SIZE by nature (the report's broadcast
        // premise): pin the benchmark to the base id range — the q147
        // discipline — so a scaled fixture grows the CORPUS, never the
        // broadcast side
        graft.operators.Decontaminate.evalLeakageReport(
            docs.where(col("doc_id") % 10 =!= 7),
            docs.where(col("doc_id") % 10 === 7 && col("doc_id") < 5000),
            "doc_id", "text", n = 8)
          .orderBy("doc_id")
      },
      Some("""WITH bgr AS (SELECT doc_id AS bid, CAST('0x'||substr(md5(unnest(grams)),18,15) AS BIGINT) AS gh FROM
        |  (SELECT doc_id, list_distinct(list_transform(
        |     range(0, greatest(length(toks)-7, 1)),
        |     i -> array_to_string(list_slice(toks, CAST(i+1 AS INT), CAST(i+8 AS INT)), ' '))) AS grams
        |   FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |         FROM documents WHERE doc_id % 10 = 7 AND doc_id < 5000))),
        |cgr AS (SELECT doc_id AS cid, CAST('0x'||substr(md5(unnest(grams)),18,15) AS BIGINT) AS gh FROM
        |  (SELECT doc_id, list_distinct(list_transform(
        |     range(0, greatest(length(toks)-7, 1)),
        |     i -> array_to_string(list_slice(toks, CAST(i+1 AS INT), CAST(i+8 AS INT)), ' '))) AS grams
        |   FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |         FROM documents WHERE doc_id % 10 != 7))),
        |tot AS (SELECT bid, CAST(count(DISTINCT gh) AS BIGINT) AS n_grams FROM bgr GROUP BY bid),
        |hit AS (SELECT b.bid, CAST(count(DISTINCT c.cid) AS BIGINT) AS n_leaking_docs,
        |        CAST(count(DISTINCT b.gh) AS BIGINT) AS n_leaked_grams
        |        FROM bgr b JOIN cgr c USING (gh) GROUP BY b.bid)
        |SELECT t.bid AS doc_id, t.n_grams,
        |  coalesce(h.n_leaking_docs, CAST(0 AS BIGINT)) AS n_leaking_docs,
        |  coalesce(h.n_leaked_grams, CAST(0 AS BIGINT)) AS n_leaked_grams,
        |  (coalesce(h.n_leaking_docs, 0) > 0) AS leaked
        |FROM tot t LEFT JOIN hit h USING (bid)
        |ORDER BY doc_id""".stripMargin)),

    // Fate audit UNDER an epoch recipe (r9): q156's per-doc fate, now
    // with the recipe configured — fates cover the rejection stages up
    // to the selection boundary, and the recipe's EMISSION decision gets
    // its own exact `emitted_copies` column (0 for an unbudgeted-source
    // survivor: a kept doc the recipe emits zero copies of — the case
    // that made a single fate ill-defined). The copies come from running
    // the real epochExpand and counting rows; the oracle replays the
    // q145 integer coin over the post-gate corpus.
    QueryDef("q164_fate_with_recipe",
      (s, d) => graft.operators.Curate.explain(Tables.documents(s, d),
          "doc_id", "text",
          graft.operators.Curate.Config(exactDedup = true, minTokens = 30,
            epochBudgets = Map("src1" -> 30000L, "src3" -> 10000L)))
        .orderBy("doc_id"),
      Some("""WITH c0 AS (SELECT * FROM documents),
        |ded AS (SELECT min(doc_id) AS doc_id FROM c0 GROUP BY lower(trim(text))),
        |dd AS (SELECT d.* FROM c0 d JOIN ded USING (doc_id)),
        |gated AS (SELECT dd.*, CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM dd WHERE length(regexp_split_to_array(trim(text), '\s+')) >= 30),
        |b(source, budget) AS (VALUES ('src1', CAST(30000 AS BIGINT)),
        |  ('src3', CAST(10000 AS BIGINT))),
        |a AS (SELECT source, SUM(n_tok) AS avail FROM gated GROUP BY source),
        |p AS (SELECT a.source, budget // avail AS fullc, budget % avail AS rem, avail
        |      FROM a JOIN b USING (source)),
        |x AS (SELECT g.doc_id, p.fullc +
        |    CASE WHEN CAST(CAST('0x'||substr(md5('epoch:'||CAST(g.doc_id AS VARCHAR)),25,8) AS BIGINT) AS DECIMAL(38,0))
        |             * CAST(p.avail AS DECIMAL(38,0))
        |           < CAST(p.rem AS DECIMAL(38,0)) * CAST(4294967296 AS DECIMAL(38,0))
        |         THEN 1 ELSE 0 END AS copies
        |  FROM gated g JOIN p USING (source))
        |SELECT c0.doc_id,
        |  CASE WHEN c0.doc_id NOT IN (SELECT doc_id FROM dd) THEN 'exact_dup'
        |       WHEN c0.doc_id NOT IN (SELECT doc_id FROM gated) THEN 'token_gate'
        |       ELSE 'kept' END AS fate,
        |  CAST(coalesce(x.copies, 0) AS BIGINT) AS emitted_copies
        |FROM c0 LEFT JOIN x USING (doc_id) ORDER BY c0.doc_id""".stripMargin)),

    // Gopher repetition rules (Rae et al. 2021 §A1.1): top n-gram
    // fraction (n=2..4) and duplicated-n-gram union coverage (n=5..10),
    // token-granularity exact integers. The fixture's docs carry dup
    // 2-grams but zero dup 5-grams, so — the q151 synthesis precedent —
    // every 5th doc gets a 6-token phrase appended 2..7 times in-plan
    // (same expression both engines), putting real mass on every rule's
    // pass AND fail side. Per-doc evidence integers + failed-rule count
    // hash-match the oracle's nine independently re-derived relations.
    QueryDef("q165_repetition_rules",
      (s, d) => {
        val synth = Tables.documentsPar(s, d).select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" "), expr(
              "repeat('rpt0 rpt1 rpt2 rpt3 rpt4 rpt5 ', CAST(2 + doc_id % 6 AS INT))")))
            .otherwise(col("text")).as("text"))
        val flags = graft.operators.Quality.repetitionFlags(
          synth, "doc_id", "text", RepTop, RepDup)
        val failCount = (RepTop.map { case (n, _) => s"pass_top$n" } ++
          RepDup.map { case (n, _) => s"pass_dup$n" })
          .map(c => when(col(c), 0L).otherwise(1L)).reduce(_ + _)
        flags.select(
          col("doc_id") +: col("n_tok") +:
            (RepTop.map { case (n, _) => col(s"top${n}_cnt") } ++
              RepDup.map { case (n, _) => col(s"dup${n}_cov") } ++
              Seq(failCount.as("n_rules_failed"),
                when(col("pass_rep"), 1L).otherwise(0L).as("pass_rep"))): _*)
          .orderBy("doc_id")
      },
      Some(repetitionOracle)),

    // DoReMi-style domain reweighting (Xie et al. 2023) via exact-integer
    // multiplicative weights (r10): per-source clipped excess loss
    // (proxy − reference), normalized to ppm, then 5 MW rounds
    // w ← w·(2P + excess̃ − mix-weighted mean)/2P — the full (round,
    // domain, weight, mixture) trajectory hash-matched against a
    // 5-stage unrolled-CTE oracle (the q56/q88 discipline). Loss
    // surrogates are synthesized in-plan from (n_chars, source index)
    // with per-domain offsets so some domains clip to 0 excess and
    // decay while others grow — both MW branches exercised. One
    // map-side-combinable corpus aggregate; the loop is a bounded
    // driver artifact (Bpe merge-loop discipline, fail-loud cap).
    QueryDef("q173_domain_reweight",
      (s, d) => graft.operators.Mixture.domainReweight(
          doremiPerDoc(Tables.documents(s, d)),
          "domain", "proxy_loss", "ref_loss", iters = 5, invEta = 2)
        .orderBy("round", "domain"),
      Some(doremiOracle(5))),

    // IVM-served domain reweighting (r10): q170's refresh discipline
    // applied to q173 — the per-domain (n, Σproxy, Σref) loss-stat
    // state is an additive monoid, so a daily ingest maintains it in
    // O(delta) (base ⊕ delta, key-wise sum) and the MW trajectory is
    // served off the bounded state. The oracle is q173's from-scratch
    // unrolled CTE VERBATIM — the hash match proves merge == recompute
    // through the full trajectory.
    QueryDef("q175_ivm_domain_reweight",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val M = graft.operators.Mixture
        val base = M.domainStats(doremiPerDoc(docs.where(col("doc_id") < 250)),
          "domain", "proxy_loss", "ref_loss")
        val delta = M.domainStats(doremiPerDoc(docs.where(col("doc_id") >= 250)),
          "domain", "proxy_loss", "ref_loss")
        M.domainReweightFromStats(M.mergeDomainStats(Seq(base, delta)),
            iters = 5, invEta = 2)
          .orderBy("round", "domain")
      },
      Some(doremiOracle(5))),

    // Token budgets FROM the optimized mixture (r10): the DoReMi →
    // recipe bridge — the q173 final-round mix apportioned over a
    // 1,000,003-token budget by largest-remainder (Hamilton), exact by
    // construction (budgets sum to the total; a float rounding pass is
    // off by ±|domains|). The odd total forces a nonzero leftover so
    // the remainder-ranked +1 pass is actually exercised. The output
    // feeds Sampling.epochExpand (q145's budget map) unchanged.
    QueryDef("q177_mixture_budgets",
      (s, d) => {
        val M = graft.operators.Mixture
        val traj = M.domainReweight(doremiPerDoc(Tables.documents(s, d)),
          "domain", "proxy_loss", "ref_loss", iters = 5, invEta = 2)
        M.budgetsFromMix(
            traj.where(col("round") === 5).select("domain", "mix_ppm"),
            totalTokens = 1000003L)
          .orderBy("domain")
      },
      Some(doremiBudgetOracle(5, 1000003L))),

    // The DoReMi → recipe bridge END TO END (r11): the OPTIMIZED mixture
    // actually drives emission — domainReweight's final-round mix →
    // largest-remainder token budgets (q177) → Curate.explain's fate
    // audit with those budgets as the epoch recipe (q164's machinery,
    // budgets computed instead of hand-configured). Per-doc output:
    // (fate through exact-dedup + token gate, emitted_copies from the
    // exact-integer epoch coin over the apportioned budgets). The
    // budget table is a bounded |domains|-row driver artifact between
    // the two corpus passes (the codebook discipline). Zero-budget
    // domains are dropped from the recipe on both sides (emitting
    // nothing ≡ not budgeted; keeps epochExpand's absent-source
    // fail-loud contract meaningful for funded sources only).
    QueryDef("q179_doremi_recipe",
      (s, d) => {
        val M = graft.operators.Mixture
        val docs = Tables.documents(s, d)
        val traj = M.domainReweight(doremiPerDoc(docs),
          "domain", "proxy_loss", "ref_loss", iters = 5, invEta = 2)
        val budgets = M.budgetsFromMix(
            traj.where(col("round") === 5).select("domain", "mix_ppm"),
            totalTokens = 1000003L)
          .collect()
          .map(r => r.getAs[String]("domain") -> r.getAs[Long]("budget"))
          .filter(_._2 > 0).toMap
        graft.operators.Curate.explain(docs, "doc_id", "text",
            graft.operators.Curate.Config(exactDedup = true, minTokens = 30,
              epochBudgets = budgets))
          .orderBy("doc_id")
      },
      Some(doremiRecipeOracle(5, 1000003L))))

  /** q173/q175's shared in-plan loss-surrogate synthesis: per-domain
    * offsets from the source index so some domains clip to zero excess
    * (decay) and others grow — one definition, two queries. */
  private def doremiPerDoc(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val idx = substring(col("source"), 4, 10).cast("long")
    docs.select(
      col("source").as("domain"),
      ((col("n_chars") % 191) + (idx * 37 % 29) * 10).as("proxy_loss"),
      ((col("n_chars") % 191) + (idx * 17 % 23) * 10).as("ref_loss"))
  }

  /** Generate the `iters`-stage unrolled multiplicative-weights oracle
    * for q173 — each stage w{t} recomputes the mix-weighted mean excess
    * over w{t-1} with scalar subqueries and applies the exact-integer
    * update `Mixture.domainReweight` performs (all operands nonnegative,
    * so DuckDB `//` floor == JVM `/` truncation; sums CAST from HUGEINT
    * back to BIGINT).
    */
  // `final val` with a literal and no type ascription is a Scala
  // compile-time constant: the compiler inlines it at every use site,
  // so it is immune to the object-init-order trap (`val all` at line 63
  // initializes before later plain vals — the q148 lesson, hit again in
  // round 10 when this was a plain `private val` and the q173/q175/q177
  // oracle SQL shipped with P=0). OracleLintSpec guards the output.
  private final val DoremiP = 1000000L

  /** The shared q173/q175/q177 CTE chain: per-doc synthesis → per-domain
    * stats → normalized excess → the `iters`-stage unrolled MW loop,
    * ending at relation `w{iters}(domain, exn, w)`. */
  private def doremiCtePrefix(iters: Int): String = {
    val P = DoremiP
    val stages = (1 to iters).map { t =>
      val p = t - 1
      s"""w$t AS (SELECT domain, exn,
         |  (w * (${2 * P} + exn -
         |    CAST((SELECT sum(w*exn) FROM w$p) AS BIGINT)
         |      // CAST((SELECT sum(w) FROM w$p) AS BIGINT))) // ${2 * P} AS w
         |  FROM w$p)""".stripMargin
    }.mkString(",\n")
    s"""WITH perdoc AS (SELECT source AS domain,
       |  (n_chars % 191) + ((CAST(substr(source, 4) AS BIGINT) * 37) % 29) * 10 AS proxy_loss,
       |  (n_chars % 191) + ((CAST(substr(source, 4) AS BIGINT) * 17) % 23) * 10 AS ref_loss
       |  FROM documents),
       |s AS (SELECT domain, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(proxy_loss) AS BIGINT) AS sp,
       |  CAST(sum(ref_loss) AS BIGINT) AS sr FROM perdoc GROUP BY domain),
       |e0 AS (SELECT domain, greatest((sp*$P)//n - (sr*$P)//n, 0) AS ex FROM s),
       |ex AS (SELECT domain,
       |  (ex*$P)//greatest((SELECT max(ex) FROM e0), 1) AS exn FROM e0),
       |w0 AS (SELECT domain, exn, CAST($P AS BIGINT) AS w FROM ex),
       |$stages""".stripMargin
  }

  private def doremiOracle(iters: Int): String = {
    val P = DoremiP
    val unions = (0 to iters).map(t =>
      s"SELECT $t AS round, domain, exn, w FROM w$t").mkString("\n  UNION ALL ")
    s"""${doremiCtePrefix(iters)},
       |trail AS ($unions)
       |SELECT CAST(round AS BIGINT) AS round, domain,
       |  CAST(exn AS BIGINT) AS excess_ppm, CAST(w AS BIGINT) AS w,
       |  CAST((w*$P)//CAST(SUM(w) OVER (PARTITION BY round) AS BIGINT) AS BIGINT) AS mix_ppm
       |FROM trail ORDER BY round, domain""".stripMargin
  }

  /** q177: the final-round mix apportioned over `total` tokens by
    * largest remainder — floors off the ACTUAL share sum, leftover +1s
    * by (remainder desc, domain asc). */
  private def doremiBudgetOracle(iters: Int, total: Long): String = {
    val P = DoremiP
    s"""${doremiCtePrefix(iters)},
       |mix AS (SELECT domain,
       |  CAST((w*$P)//CAST((SELECT sum(w) FROM w$iters) AS BIGINT) AS BIGINT) AS mix_ppm
       |  FROM w$iters),
       |ss AS (SELECT CAST(sum(mix_ppm) AS BIGINT) AS s FROM mix),
       |fl AS (SELECT domain, mix_ppm, (mix_ppm*$total)//ss.s AS fl,
       |  (mix_ppm*$total) % ss.s AS rem FROM mix, ss),
       |lo AS (SELECT $total - CAST(sum(fl) AS BIGINT) AS leftover FROM fl),
       |r AS (SELECT domain, mix_ppm, fl, rem,
       |  row_number() OVER (ORDER BY rem DESC, domain ASC) AS rk FROM fl)
       |SELECT domain, mix_ppm,
       |  CAST(fl + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END AS BIGINT) AS budget
       |FROM r, lo ORDER BY domain""".stripMargin
  }

  /** q179: the full bridge oracle — [[doremiBudgetOracle]]'s CTE chain
    * through the apportioned budgets, feeding q164's fate/epoch-coin
    * replay with the COMPUTED budget table in place of hand-written
    * VALUES. Zero-budget domains filtered on both sides.
    */
  private def doremiRecipeOracle(iters: Int, total: Long): String = {
    val P = DoremiP
    s"""${doremiCtePrefix(iters)},
       |mix AS (SELECT domain,
       |  CAST((w*$P)//CAST((SELECT sum(w) FROM w$iters) AS BIGINT) AS BIGINT) AS mix_ppm
       |  FROM w$iters),
       |ss AS (SELECT CAST(sum(mix_ppm) AS BIGINT) AS s FROM mix),
       |fl AS (SELECT domain, mix_ppm, (mix_ppm*$total)//ss.s AS fl,
       |  (mix_ppm*$total) % ss.s AS rem FROM mix, ss),
       |lo AS (SELECT $total - CAST(sum(fl) AS BIGINT) AS leftover FROM fl),
       |r AS (SELECT domain, mix_ppm, fl, rem,
       |  row_number() OVER (ORDER BY rem DESC, domain ASC) AS rk FROM fl),
       |b AS (SELECT domain AS source,
       |  CAST(fl + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END AS BIGINT) AS budget
       |  FROM r, lo
       |  WHERE fl + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END > 0),
       |c0 AS (SELECT * FROM documents),
       |ded AS (SELECT min(doc_id) AS doc_id FROM c0 GROUP BY lower(trim(text))),
       |dd AS (SELECT d.* FROM c0 d JOIN ded USING (doc_id)),
       |gated AS (SELECT dd.*, CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
       |  FROM dd WHERE length(regexp_split_to_array(trim(text), '\\s+')) >= 30),
       |a AS (SELECT source, SUM(n_tok) AS avail FROM gated GROUP BY source),
       |p AS (SELECT a.source, budget // avail AS fullc, budget % avail AS rem, avail
       |      FROM a JOIN b USING (source)),
       |x AS (SELECT g.doc_id, p.fullc +
       |    CASE WHEN CAST(CAST('0x'||substr(md5('epoch:'||CAST(g.doc_id AS VARCHAR)),25,8) AS BIGINT) AS DECIMAL(38,0))
       |             * CAST(p.avail AS DECIMAL(38,0))
       |           < CAST(p.rem AS DECIMAL(38,0)) * CAST(4294967296 AS DECIMAL(38,0))
       |         THEN 1 ELSE 0 END AS copies
       |  FROM gated g JOIN p USING (source))
       |SELECT c0.doc_id,
       |  CASE WHEN c0.doc_id NOT IN (SELECT doc_id FROM dd) THEN 'exact_dup'
       |       WHEN c0.doc_id NOT IN (SELECT doc_id FROM gated) THEN 'token_gate'
       |       ELSE 'kept' END AS fate,
       |  CAST(coalesce(x.copies, 0) AS BIGINT) AS emitted_copies
       |FROM c0 LEFT JOIN x USING (doc_id) ORDER BY c0.doc_id""".stripMargin
  }

  /** Gopher thresholds (permille) the engine call above defaults to —
    * named here so the oracle generator and the query share one list.
    */
  private def RepTop = Seq(2 -> 200L, 3 -> 180L, 4 -> 160L)
  private def RepDup = Seq(5 -> 150L, 6 -> 140L, 7 -> 130L, 8 -> 120L,
    9 -> 110L, 10 -> 100L)

  /** q168/q170 shared oracle — the from-scratch TV-drift recompute (a
    * `def`, not a val: this object initializes `all` first, and a val
    * defined after it would interpolate as null — the q148 lesson).
    * q170 reading a merged incremental state through the SAME oracle is
    * the merge == recompute proof.
    */
  private def tvDriftOracle: String =
    """WITH t AS (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents),
      |b AS (SELECT source, CAST('0x'||substr(md5('tvd:'||tok),25,8) AS BIGINT) % 4096 AS bucket FROM t),
      |c AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY source, bucket),
      |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY source),
      |p AS (SELECT a.source AS src_a, bb.source AS src_b, a.n AS n_a, bb.n AS n_b
      |  FROM n a JOIN n bb ON a.source < bb.source),
      |i AS (SELECT ca.source AS src_a, cb.source AS src_b,
      |    CAST(SUM(ca.c) AS BIGINT) AS sa, CAST(SUM(cb.c) AS BIGINT) AS sb,
      |    SUM(abs(CAST(ca.c AS DECIMAL(38,0)) * CAST(nb.n AS DECIMAL(38,0))
      |          - CAST(cb.c AS DECIMAL(38,0)) * CAST(na.n AS DECIMAL(38,0)))) AS inner_num
      |  FROM c ca JOIN c cb ON ca.bucket = cb.bucket AND ca.source < cb.source
      |  JOIN n na ON na.source = ca.source JOIN n nb ON nb.source = cb.source
      |  GROUP BY 1, 2),
      |f AS (SELECT p.src_a, p.src_b, p.n_a, p.n_b,
      |    coalesce(i.inner_num, CAST(0 AS DECIMAL(38,0)))
      |      + CAST(p.n_a - coalesce(i.sa, 0) AS DECIMAL(38,0)) * CAST(p.n_b AS DECIMAL(38,0))
      |      + CAST(p.n_b - coalesce(i.sb, 0) AS DECIMAL(38,0)) * CAST(p.n_a AS DECIMAL(38,0)) AS num
      |  FROM p LEFT JOIN i ON i.src_a = p.src_a AND i.src_b = p.src_b)
      |SELECT src_a, src_b, n_a, n_b, CAST(num AS BIGINT) AS tv_num,
      |  CAST(CAST(num * 1000 AS HUGEINT) //
      |    (CAST(2 AS HUGEINT) * CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)) AS BIGINT) AS tv_permille
      |FROM f ORDER BY src_a, src_b""".stripMargin

  /** q165 oracle: nine per-n CTE chains, each re-deriving grams →
    * per-doc counts → (top) max count or (dup) the q153 island-union
    * coverage window, joined wide with coalesce-0 and the same
    * cross-multiplied permille gates.
    */
  private def repetitionOracle: String = {
    def gramChain(n: Int) =
      s"""c$n AS (SELECT doc_id, list_transform(range(0, greatest(length(toks)-${n - 1}, 0)),
         |  i -> array_to_string(list_slice(toks, CAST(i+1 AS INT), CAST(i+$n AS INT)), ' ')) AS grams FROM t),
         |e$n AS (SELECT doc_id, CAST(generate_subscripts(grams, 1) - 1 AS INT) AS pos, unnest(grams) AS gram FROM c$n),
         |f$n AS (SELECT doc_id, gram, count(*) AS cnt FROM e$n GROUP BY doc_id, gram)""".stripMargin
    def topChain(n: Int) =
      s"""${gramChain(n)},
         |t$n AS (SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top${n}_cnt FROM f$n GROUP BY doc_id)""".stripMargin
    def dupChain(n: Int) =
      s"""${gramChain(n)},
         |r$n AS (SELECT e.doc_id, e.pos, e.pos + $n AS en FROM e$n e
         |  JOIN f$n f ON e.doc_id = f.doc_id AND e.gram = f.gram WHERE f.cnt >= 2),
         |w$n AS (SELECT doc_id, pos, en, max(en) OVER (PARTITION BY doc_id ORDER BY pos
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM r$n),
         |v$n AS (SELECT doc_id, CAST(SUM(greatest(0, en - greatest(coalesce(pmax, pos), pos))) AS BIGINT)
         |  AS dup${n}_cov FROM w$n GROUP BY doc_id)""".stripMargin
    val chains = (RepTop.map { case (n, _) => topChain(n) } ++
      RepDup.map { case (n, _) => dupChain(n) }).mkString(",\n")
    val evid = RepTop.map { case (n, _) =>
      s"coalesce(t$n.top${n}_cnt, CAST(0 AS BIGINT)) AS top${n}_cnt" } ++
      RepDup.map { case (n, _) =>
        s"coalesce(v$n.dup${n}_cov, CAST(0 AS BIGINT)) AS dup${n}_cov" }
    val joins = (RepTop.map { case (n, _) => s"LEFT JOIN t$n USING (doc_id)" } ++
      RepDup.map { case (n, _) => s"LEFT JOIN v$n USING (doc_id)" }).mkString(" ")
    val failTerms = (RepTop.map { case (n, pm) =>
      s"(CASE WHEN 1000 * top${n}_cnt * $n <= $pm * n_tok THEN 0 ELSE 1 END)" } ++
      RepDup.map { case (n, pm) =>
        s"(CASE WHEN 1000 * dup${n}_cov <= $pm * n_tok THEN 0 ELSE 1 END)" })
      .mkString(" + ")
    s"""WITH synth AS (SELECT doc_id,
       |  CASE WHEN doc_id % 5 = 0 THEN text || ' ' ||
       |    repeat('rpt0 rpt1 rpt2 rpt3 rpt4 rpt5 ', CAST(2 + doc_id % 6 AS INT))
       |  ELSE text END AS text FROM documents),
       |t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM synth),
       |base AS (SELECT doc_id, CAST(length(toks) AS BIGINT) AS n_tok FROM t),
       |$chains,
       |wide AS (SELECT base.doc_id, base.n_tok, ${evid.mkString(", ")}
       |  FROM base $joins)
       |SELECT doc_id, n_tok, ${(RepTop.map(p => s"top${p._1}_cnt") ++
          RepDup.map(p => s"dup${p._1}_cov")).mkString(", ")},
       |  CAST($failTerms AS BIGINT) AS n_rules_failed,
       |  CAST(CASE WHEN $failTerms = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass_rep
       |FROM wide ORDER BY doc_id""".stripMargin
  }
}
