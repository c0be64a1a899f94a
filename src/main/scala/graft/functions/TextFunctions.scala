package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for the text-analysis / dedup surface of a training-data
  * pipeline: tokenization, shingling, portable hashing, rolling-hash
  * fingerprints, language-ID marker scoring, quality ratios.
  *
  * Portability contract: every hash used for cross-engine-checked dedup is
  * derived from md5 hex (identical in any engine) — never from engine-native
  * `hash()` functions. All integer arithmetic stays within Long range.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text (reference F7 string ops family). */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword segmentation: letter runs, digit runs, single
    * punctuation — a deterministic stand-in for a real BPE vocab.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Low 32 bits of md5 as a non-negative Long — the portable hash primitive
    * (same value via `CAST('0x'||substr(md5(s),25,8) AS BIGINT)` in DuckDB).
    */
  def md5Low32(s: Column): Column =
    conv(substring(md5(s), 25, 8), 16, 10).cast("long")

  /** Low 60 bits of md5 (15 hex chars → always fits a positive Long) —
    * the hash under every gram/chunk shuffle. Native codegen expression
    * (digest bytes directly, no hex-string round trip);
    * [[md5Low60Fold]] is the declarative twin it is bit-parity-pinned
    * against (TextHashExpressionsSpec).
    */
  def md5Low60(s: Column): Column =
    graft.functions.expressions.TextHashExpressions.md5Low60(s)

  /** The declarative fold twin of [[md5Low60]] — kept for the parity pin
    * and as the reference semantics (DuckDB mirror:
    * `CAST('0x'||substr(md5(s),18,15) AS BIGINT)`).
    */
  def md5Low60Fold(s: Column): Column =
    conv(substring(md5(s), 18, 15), 16, 10).cast("long")

  /** ALL overlapping n-token windows of an already-materialized tokens
    * attribute, position i = window start. sequence(0, size-n) would
    * DESCEND for size < n (negative-step default) — guarded to an empty
    * list: a too-short doc has no n-windows. (Shared by the span-dedup
    * family and [[graft.operators.Quality.repetitionFlags]].)
    */
  def overlappingGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct character n-gram shingles. Short texts (< n chars) yield the
    * whole text as the single shingle — mirrored exactly by the oracle.
    */
  def charShingles(text: Column, n: Int): Column = {
    val count = greatest(length(text) - (n - 1), lit(1))
    array_distinct(transform(sequence(lit(0), count - 1), i => text.substr(i + 1, lit(n))))
  }

  /** Distinct word n-grams from an ALREADY-MATERIALIZED tokens column.
    * Pass an attribute (a projected column), not `wsTokens(text)` inline:
    * expressions referenced inside a higher-order-function lambda re-evaluate
    * per element, so an inline split would tokenize the row once per n-gram
    * position (measured 6.7s of pure re-splitting at sf0.1).
    */
  def ngramsOfTokens(toks: Column, n: Int): Column = {
    val count = greatest(size(toks) - (n - 1), lit(1))
    array_distinct(transform(sequence(lit(0), count - 1),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Convenience single-expression form — fine for small data / tests; hot
    * paths should project `wsTokens` first and use [[ngramsOfTokens]].
    */
  def tokenNgrams(text: Column, n: Int): Column =
    ngramsOfTokens(wsTokens(text), n)

  /** Declarative twin of the native
    * [[graft.functions.expressions.CdcChunks]] kernel (content-defined
    * chunking: cut after any `w`-token window whose md5-low-60 hash ≡ 0
    * mod `divisor`, final token always cuts, chunks space-joined) —
    * kept ONLY as the bit-parity oracle shape
    * (TextHashExpressionsSpec); never use on a hot path: the
    * interpreted higher-order lambdas re-inline the upstream token
    * split per gram (measured at 10×: one scan task, 460+ s).
    */
  def cdcChunksFold(toks: Column, w: Int, divisor: Int): Column = {
    val n = size(toks)
    val contentCuts = filter(
      transform(overlappingGrams(toks, w), (g, p) =>
        when(md5Low60(g) % divisor === 0, p + lit(w - 1)).otherwise(lit(-1))),
      c => c >= 0 && c < n - 1)
    val cuts = concat(contentCuts, array(n - 1))
    zip_with(
      cuts,
      concat(array(lit(-1)), slice(cuts, lit(1), size(cuts) - 1)),
      (c, p) => array_join(slice(toks, p + 2, c - p), " "))
  }

  /** NON-overlapping `k`-token chunks of an already-materialized tokens
    * column (same lambda-re-evaluation rule as [[ngramsOfTokens]]): chunk i
    * = tokens [i·k, i·k+k). The last chunk may be shorter; a short/empty
    * text yields one chunk (possibly the whole text) — `ceil(size/k) >= 1`.
    */
  def chunksOfTokens(toks: Column, k: Int): Column = {
    // ceil(size/k) via double division is exact here: the true quotient has
    // denominator k, so it sits >= 1/k away from any other integer — one
    // ulp of rounding cannot bridge that; cast truncates = floor for >= 0
    val count = greatest(((size(toks) + (k - 1)) / k).cast("int"), lit(1))
    transform(sequence(lit(0), count - 1),
      i => concat_ws(" ", slice(toks, i * k + 1, lit(k))))
  }

  /** MinHash prime (smallest prime > 2^32). */
  val MinHashP = 4294967311L

  /** k-th universal hash over a pre-hashed shingle value:
    * h_k(x) = ((2k+1)·x + 1000000007·k + 17) mod P. Coefficients are small
    * enough that (2k+1)·x stays far below Long overflow for k < 2^29.
    */
  def minhashAt(hashes: Column, k: Int): Column =
    array_min(transform(hashes,
      x => (x * lit(2L * k + 1) + lit(1000000007L * k + 17L)) % lit(MinHashP)))

  /** Full MinHash signature (array of `h` minima) over distinct shingles. */
  def minhashSignature(shingles: Column, h: Int): Column = {
    val hashes = transform(shingles, s => md5Low32(s))
    array((0 until h).map(k => minhashAt(hashes, k)): _*)
  }

  /** LSH band keys: the signature split into `bands` groups of `rowsPerBand`,
    * each group joined into one string key.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat_ws(":", (1 to rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r)): _*)
    }: _*)

  /** 60-bit SimHash from a pre-hashed token array column (array<long>,
    * e.g. md5Low60 of each token): bit j is set iff the signed count of
    * tokens with bit j set is positive. Built as a SQL-lambda expression
    * because shifts by a *column* amount have no Scala-API form; the SQL
    * text is Catalyst all the same.
    */
  def simhashFromHashes(hashesCol: String): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, 59), j ->
       |    IF(aggregate($hashesCol, 0L,
       |         (acc, h) -> acc + IF((shiftright(h, j) & 1L) = 1L, 1L, -1L)) > 0,
       |       shiftleft(1L, j), 0L)),
       |  0L, (a, x) -> a + x)""".stripMargin)

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling polynomial fingerprint over characters:
    * fold(acc·31 + codepoint) mod 1e9+7 — document identity that survives
    * storage layout, computable identically in any SQL engine. Codegen
    * expression; bit-identical to [[fingerprintFold]] (cross-checked in
    * tests), one native loop instead of a lambda call per character.
    */
  def fingerprint(text: Column): Column =
    graft.functions.expressions.RollingHash(text)

  /** Declarative form of [[fingerprint]] — the executable spec mirrored by
    * the DuckDB oracle's `list_reduce`.
    */
  def fingerprintFold(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31L + c) % 1000000007L)

  /** Count of tokens contained in a fixed marker/stopword set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(markers.toArray), t)))

  /** Language marker sets for the heuristic n-gram language-ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Ratio of non-alphanumeric-non-space chars to total length. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") / length(text)

  /** Deterministic uniform [0,1) from a key: md5 low 32 bits / 2^32 —
    * the sampling coin of a reproducible curation pipeline (same rows
    * survive on every run/engine; the md5-low-bits discipline of
    * [[graft.functions.VectorFunctions.shardId]]). `salt` decorrelates
    * independent decisions on the same key (sampling vs split
    * assignment). Exact in double (a 32-bit integer over a power of two).
    */
  def md5Unit(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), key)), 25, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Deterministic bucket in [0, n) from a key (salted like [[md5Unit]]) —
    * split assignment, shard routing, A/B cohorts. Exact for n dividing
    * 2^32 or any n (mod of the low-32 value is deterministic parity with
    * any engine computing the same low-32 md5 integer).
    */
  /** Fixed-size character windows with overlap — the RAG / long-document
    * chunking stage: window i covers characters [i·stride, i·stride+size),
    * so consecutive windows overlap by (size − stride) characters and
    * every character lands in at least one window. Output:
    * ARRAY<STRUCT<idx BIGINT, chunk STRING>> in window order; empty text
    * yields one empty window (mirror `greatest(1, …)` in SQL — Spark's
    * floor(−1/stride) and an engine's truncating division would otherwise
    * disagree on the zero-length row). Pure substring arithmetic — no
    * regex, no UDF — so any engine computing the same windows matches
    * byte-for-byte (codepoint `substr` semantics on both sides).
    */
  def charWindows(text: Column, size: Int, stride: Int): Column = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"charWindows: need 1 <= stride <= size, got size=$size stride=$stride")
    val len = length(text).cast("long")
    val n = greatest(lit(1L),
      floor((len.cast("double") - 1.0) / lit(stride.toDouble)).cast("long") + 1L)
    transform(sequence(lit(0L), n - 1L), i =>
      struct(i.as("idx"),
        text.substr((i * lit(stride.toLong) + 1L).cast("int"), lit(size))
          .as("chunk")))
  }

  /** CCNet-style canonical dedup key: lowercase, every non-alphanumeric
    * run becomes one space, trimmed — so casing, punctuation and
    * whitespace variants of the same content collide ("Hello, World!"
    * == "hello world"). One global regex pass, engine-portable (ASCII
    * character class; mirror with regexp_replace(..., 'g') in DuckDB —
    * its default replaces only the FIRST match).
    */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  def md5Bucket(key: Column, n: Int, salt: String = ""): Column =
    pmod(conv(substring(md5(concat(lit(salt), key)), 25, 8), 16, 10)
      .cast("long"), lit(n.toLong))

  /** Unicode NFC normalization (composed canonical form) — see
    * [[graft.functions.expressions.NfcNormalize]]. DuckDB twin:
    * `nfc_normalize`.
    */
  def nfcNormalize(text: Column): Column =
    graft.functions.expressions.NfcNormalize.column(text)

  /** Accent folding (NFD → drop nonspacing marks → NFC) — see
    * [[graft.functions.expressions.StripAccents]]. DuckDB twin:
    * `strip_accents`.
    */
  def stripAccents(text: Column): Column =
    graft.functions.expressions.StripAccents.column(text)

  /** THE multilingual dedup key: NFC, accents folded, lowercased —
    * composed/decomposed forms, diacritic variants, and case variants
    * of the same text all collide, while distinct base letters
    * (ø/æ/ß/Hangul) stay distinct. DuckDB twin:
    * `lower(strip_accents(nfc_normalize(text)))`.
    */
  def foldedText(text: Column): Column =
    lower(stripAccents(nfcNormalize(text)))
}
