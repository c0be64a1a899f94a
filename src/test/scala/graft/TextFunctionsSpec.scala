package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("charShingles: full n-grams, distinct, short-text fallback") {
    val df = Seq("abcde", "ab").toDF("text")
    val got = df.select(charShingles($"text", 3)).collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("abc", "bcd", "cde"))
    assert(got(1) === Seq("ab")) // shorter than n -> whole text
  }

  test("charShingles deduplicates repeats") {
    val got = Seq("aaaa").toDF("text")
      .select(charShingles($"text", 2)).head().getSeq[String](0)
    assert(got === Seq("aa"))
  }

  test("tokenNgrams builds word n-grams") {
    val got = Seq("a b c d").toDF("text")
      .select(tokenNgrams($"text", 3)).head().getSeq[String](0)
    assert(got === Seq("a b c", "b c d"))
  }

  test("fingerprint: known rolling-hash value") {
    // "ab" -> ((0*31+97) % M)*31 + 98 = 3105
    val got = Seq("ab").toDF("text").select(fingerprint($"text")).head().getLong(0)
    assert(got === 3105L)
  }

  test("fingerprint differs on order (not a bag hash)") {
    val got = Seq("ab", "ba").toDF("text")
      .select(fingerprint($"text")).collect().map(_.getLong(0))
    assert(got(0) !== got(1))
  }

  test("minhash signature: identical texts agree, length = numHashes") {
    val df = Seq("the quick brown fox", "the quick brown fox", "zzz totally other")
      .toDF("text")
    val sigs = df.select(minhashSignature(charShingles($"text", 5), 16))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0).length === 16)
    assert(sigs(0) === sigs(1))
    assert(sigs(0) !== sigs(2))
  }

  test("simhash: identical token multisets agree; hamming 0") {
    val df = Seq(("x", "alpha beta gamma"), ("y", "alpha beta gamma"))
      .toDF("id", "text")
    val sh = graft.operators.Dedup.simhashed(df, "id", "text")
      .collect().map(_.getLong(1))
    assert(sh(0) === sh(1))
  }

  test("markerCount counts duplicate tokens") {
    val got = Seq("the the a of x").toDF("text")
      .select(markerCount(wsTokens($"text"), Seq("the", "a", "is", "of", "and")))
      .head().getInt(0)
    assert(got === 4)
  }

  test("charWindows: coverage, overlap, tail, and degenerate cases") {
    def windows(s: String, size: Int, stride: Int): Seq[(Long, String)] =
      Seq(s).toDF("text")
        .select(explode(charWindows($"text", size, stride)).as("w"))
        .select($"w.idx", $"w.chunk")
        .as[(Long, String)].collect().toSeq

    // 10 chars, size 4, stride 3: starts 0,3,6,9 — overlap 1, short tail
    assert(windows("abcdefghij", 4, 3) ===
      Seq((0L, "abcd"), (1L, "defg"), (2L, "ghij"), (3L, "j")))
    // every character covered; consecutive windows overlap by size-stride
    val w = windows("abcdefghij", 5, 3)
    assert(w.map(_._2).mkString.toSet === "abcdefghij".toSet)
    assert(w.sliding(2).forall { case Seq((_, a), (_, b)) =>
      a.takeRight(2) == b.take(2) || b.length < 2 })
    // exact fit: no spurious tail window
    assert(windows("abcdef", 3, 3) === Seq((0L, "abc"), (1L, "def")))
    // shorter than one window: single chunk
    assert(windows("ab", 200, 150) === Seq((0L, "ab")))
    // empty text: one empty window (the SQL greatest(1, ...) mirror)
    assert(windows("", 4, 3) === Seq((0L, "")))
    // non-overlapping mode (stride == size) partitions the text
    assert(windows("abcdefgh", 2, 2).map(_._2).mkString === "abcdefgh")
  }

  test("nfcNormalize / stripAccents / foldedText: DuckDB-twin semantics " +
      "on the probe cases, recomposition, fast paths, null safety") {
    def one(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        s: String): String =
      Seq(s).toDF("t").select(f(col("t"))).as[String].head()
    // NFC: decomposed composes; angstrom sign maps to Å; NFC input unchanged
    assert(one(nfcNormalize, "Cafe\u0301") === "Caf\u00e9")
    assert(one(nfcNormalize, "\u212b") === "\u00c5")
    assert(one(nfcNormalize, "Caf\u00e9") === "Caf\u00e9")
    // accent fold: marks drop, non-decomposables survive
    assert(one(stripAccents, "mühleisen") === "muhleisen")
    assert(one(stripAccents, "naïve") === "naive")
    assert(one(stripAccents, "ø æ ß") === "ø æ ß")
    // Cyrillic ё folds to е; Turkish İ loses its dot
    assert(one(stripAccents, "ё") === "е")
    assert(one(stripAccents, "İstanbul") === "Istanbul")
    // RECOMPOSITION (the DuckDB strip_accents contract): Hangul output
    // is composed syllables, not jamo — U+D55C, length 1
    assert(one(stripAccents, "한") === "한")
    assert(one(stripAccents, "한").length === 1)
    // kana dakuten (a nonspacing mark) folds, recomposed: が -> か
    assert(one(stripAccents, "が") === "か")
    // ASCII fast path: byte-identical passthrough
    assert(one(stripAccents, "plain ascii!") === "plain ascii!")
    // the composed dedup key: NFC + fold + lower collide all variants
    val folds = Seq("Caf\u00e9 X", "Cafe\u0301 X", "cafe x", "caf\u00e9 x")
      .toDF("t").select(foldedText(col("t"))).as[String].collect().toSet
    assert(folds === Set("cafe x"))
    // distinct base letters stay distinct under the fold
    assert(one(foldedText, "rød") !== one(foldedText, "rod"))
    // null-safe end to end
    assert(Seq[Option[String]](None).toDF("t")
      .select(foldedText(col("t"))).head().isNullAt(0))
  }

  test("exactFolded groups unicode variants; exact and exactCanonical " +
      "demonstrate the gap it closes") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "Caf\u00e9 review"),   // NFC
      (2L, "Cafe\u0301 review"),  // NFD of the same text
      (3L, "cafe review"),        // accent-stripped republication
      (4L, "caf\u00e9 review"),   // lowercase NFC
      (5L, "other doc entirely"),
      (6L, "한국")        // CJK text: must NOT collapse into Latin
    ).toDF("doc_id", "text")
    val folded = Dedup.exactFolded(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(folded.map(r => (r._1, r._3)).toSeq ===
      Seq((1L, 4L), (5L, 1L), (6L, 1L)))
    // the byte-level key (lower+trim) catches ONLY the case variant
    // (1 ≡ 4); the NFD and stripped forms stay separate -> 5 groups
    assert(Dedup.exact(docs, "doc_id", "text").count() === 5L)
    // the ASCII canonical key DELETES the non-ASCII letters: é vanishes
    // ("caf review") and the CJK doc collapses to an empty key — the
    // failure mode exactFolded exists to fix
    val canon = Dedup.exactCanonical(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(canon.contains("caf review"))
  }
}
