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
}
