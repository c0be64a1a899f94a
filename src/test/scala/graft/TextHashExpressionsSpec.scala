package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.expressions.TextHashExpressions
import graft.functions.expressions.TextHashExpressions.{minhashSig, minhashSigFromStrings, simhash64}

/** The codegen text-hash expressions must be bit-identical to the
  * declarative fold forms they replace (which the DuckDB oracle mirrors).
  */
class TextHashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("MinHashSig == declarative minhashSignature on real documents") {
    val shingles = charShingles(col("text"), 5)
    val diff = docs.select(
        minhashSig(transform(shingles, s => md5Low32(s)), 16).as("native"),
        minhashSignature(shingles, 16).as("fold"))
      .where(to_json(col("native")) =!= to_json(col("fold")))
      .count()
    assert(diff === 0)
  }

  test("CharShinglesExpr == declarative charShingles on real documents") {
    val diff = docs.select(
        graft.functions.expressions.CharShinglesExpr(col("text"), 5).as("native"),
        charShingles(col("text"), 5).as("fold"))
      .where(to_json(col("native")) =!= to_json(col("fold")))
      .count()
    assert(diff === 0)
  }

  test("CharShinglesExpr: short-text fallback and unicode code points") {
    val df = Seq("ab", "aaaa", "日本語テキスト").toDF("text")
    val native = df.select(graft.functions.expressions.CharShinglesExpr(col("text"), 3))
      .collect().map(_.getSeq[String](0))
    val fold = df.select(charShingles(col("text"), 3))
      .collect().map(_.getSeq[String](0))
    assert(native.toSeq.map(_.toList) === fold.toSeq.map(_.toList))
    assert(native(0) === Seq("ab"))
  }

  test("MinHashSigFromStrings == declarative pipeline on real documents") {
    val shingles = charShingles(col("text"), 5)
    val diff = docs.select(
        minhashSigFromStrings(shingles, 16).as("native"),
        minhashSignature(shingles, 16).as("fold"))
      .where(to_json(col("native")) =!= to_json(col("fold")))
      .count()
    assert(diff === 0)
  }

  test("SimHash64 == declarative simhashFromHashes on real documents") {
    val diff = docs
      .select(transform(wsTokens(col("text")), t => md5Low60(t)).as("hv"))
      .select(simhash64(col("hv")).as("native"),
        simhashFromHashes("hv").as("fold"))
      .where(col("native") =!= col("fold"))
      .count()
    assert(diff === 0)
  }

  test("RollingHash == declarative fingerprintFold on real documents") {
    val diff = docs.select(
        fingerprint(col("text")).as("native"),
        fingerprintFold(col("text")).as("fold"))
      .where(col("native") =!= col("fold"))
      .count()
    assert(diff === 0)
  }

  test("null input yields the fold-form shape: h null slots, not a null array") {
    val df = spark.sql("SELECT cast(null as array<string>) ns, cast(null as array<bigint>) nh")
    val r = df.select(
      minhashSigFromStrings(col("ns"), 4).as("a"),
      minhashSig(col("nh"), 4).as("b")).head()
    assert(!r.isNullAt(0) && r.getSeq[Any](0) === Seq(null, null, null, null))
    assert(!r.isNullAt(1) && r.getSeq[Any](1) === Seq(null, null, null, null))
    // and parity with the declarative pipeline holds on a null-text row
    val docsWithNull = Seq((1L, "hello world there"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val diff = docsWithNull.select(
        minhashSigFromStrings(charShingles(col("text"), 5), 4).as("native"),
        minhashSignature(charShingles(col("text"), 5), 4).as("fold"))
      .where(to_json(struct(col("native").as("x"))) =!= to_json(struct(col("fold").as("x"))))
      .count()
    assert(diff === 0)
  }

  test("empty and null-element inputs behave like the fold forms") {
    val df = spark.sql(
      "SELECT cast(array() as array<bigint>) empty, cast(array(5, null) as array<bigint>) holed")
    val mh = df.select(
      minhashSig(col("empty"), 4).as("m_empty"),
      minhashSig(col("holed"), 4).as("m_holed"),
      simhash64(col("empty")).as("s_empty"))
    val r = mh.head()
    assert(r.getSeq[Any](0) === Seq(null, null, null, null)) // no values -> null mins
    assert(r.getSeq[Any](1).forall(_ != null))               // null skipped
    assert(r.getLong(2) === 0L)                              // empty -> all bits 0
  }

  test("Md5Low60 == declarative conv(substr(md5)) twin on real grams, " +
      "unicode, empty, and NULL") {
    // every word n-gram of the real corpus — the exact value space the
    // dedup/decontamination shuffles key on
    val grams = docs.select(explode(
      ngramsOfTokens(wsTokens(col("text")), 3)).as("g"))
    val diff = grams.select(TextHashExpressions.md5Low60(col("g")).as("native"),
        md5Low60Fold(col("g")).as("fold"))
      .where(col("native") =!= col("fold") ||
        col("native").isNull =!= col("fold").isNull)
      .count()
    assert(diff === 0)
    // edge values: unicode (multi-byte UTF-8), empty string, NULL
    val edge = Seq(Some("日本語テキスト"), Some(""), Some("a b c"), None)
      .toDF("s")
    val rows = edge.select(TextHashExpressions.md5Low60(col("s")).as("native"),
      md5Low60Fold(col("s")).as("fold")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
    assert(rows.last.isNullAt(0)) // null propagates like conv(null)
    // the SQL registration serves the same expression
    assert(spark.sql("SELECT md5_low60('abc')").head().getLong(0) ===
      edge.sparkSession.range(1).select(TextHashExpressions.md5Low60(lit("abc"))).head().getLong(0))
  }

  test("WinnowFps == declarative fold pipeline on real documents and edges") {
    import graft.operators.Dedup
    val native = Dedup.winnowFingerprints(docs, "doc_id", "text")
      .orderBy("doc_id", "fp").as[(Long, Long)].collect().toSeq
    val fold = Dedup.winnowFingerprintsFold(docs, "doc_id", "text")
      .orderBy("doc_id", "fp").as[(Long, Long)].collect().toSeq
    assert(native === fold)
    assert(native.nonEmpty)
    // edges: shorter than k, shorter than w windows, unicode, empty,
    // null (doc absent from BOTH), single char
    val edge = Seq((1L, "ab"), (2L, "abcdefg"), (3L, "日本語テキストです"),
      (4L, ""), (5L, null.asInstanceOf[String]), (6L, "x"))
      .toDF("doc_id", "text")
    val en = Dedup.winnowFingerprints(edge, "doc_id", "text", k = 5, w = 4)
      .orderBy("doc_id", "fp").as[(Long, Long)].collect().toSeq
    val ef = Dedup.winnowFingerprintsFold(edge, "doc_id", "text", k = 5, w = 4)
      .orderBy("doc_id", "fp").as[(Long, Long)].collect().toSeq
    assert(en === ef)
    assert(!en.exists(_._1 == 5L), "null text drops the doc both ways")
    assert(en.count(_._1 == 1L) === 1, "short text = one truncated gram")
    // the guard still fires on >= 2^20 chars
    val big = Seq((9L, "x" * (1 << 20))).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.winnowFingerprints(big, "doc_id", "text").count()
    }
    assert(ex.getMessage.contains("2^20"), ex.getMessage)
  }

  test("simhash64 of a NULL array is 0, matching the fold form (nullable=false)") {
    val df = spark.sql("SELECT cast(null as array<bigint>) nh")
    val r = df.select(simhash64(col("nh")).as("a"),
      graft.functions.TextFunctions.simhashFromHashes("nh").as("b")).head()
    assert(!r.isNullAt(0) && r.getLong(0) === 0L)
    assert(r.getLong(0) === r.getLong(1)) // codegen == declarative twin
  }

  test("PositionsInSortedSet: ascending hit indices, count-sibling parity") {
    import spark.implicits._
    val set = Array(3L, 7L, 11L, 99L).sorted
    val rows = Seq(
      Seq(7L, 1L, 3L, 3L, 99L),     // hits at 0, 2, 3, 4
      Seq(1L, 2L),                  // no hits
      Seq.empty[Long]
    ).toDF("arr")
    val got = rows.select(
        graft.functions.expressions.TextHashExpressions
          .positionsInSortedSet(col("arr"), set).as("pos"),
        graft.functions.expressions.TextHashExpressions
          .countInSortedSet(col("arr"), set).as("cnt"))
      .as[(Seq[Int], Int)].collect().toSeq
    assert(got === Seq((Seq(0, 2, 3, 4), 4), (Seq(), 0), (Seq(), 0)))
    got.foreach { case (pos, cnt) =>
      assert(pos.length === cnt && pos === pos.sorted)
    }
  }

  test("CdcChunks == declarative cdcChunksFold on real documents, " +
      "plus edge shapes") {
    val toks = wsTokens(col("text"))
    val diff = docs.select(
        TextHashExpressions.cdcChunks(toks, 3, 4).as("native"),
        cdcChunksFold(toks, 3, 4).as("fold"))
      .where(to_json(col("native")) =!= to_json(col("fold")))
      .count()
    assert(diff === 0)
    // w > tokens (no content window), single token, empty-string token
    val edges = Seq(Seq("a", "b"), Seq("solo"), Seq(""), Seq("x", null, "y"))
      .toDF("toks")
    val pairs = edges.select(
        TextHashExpressions.cdcChunks(col("toks"), 3, 4).as("native"),
        cdcChunksFold(col("toks"), 3, 4).as("fold"))
      .as[(Seq[String], Seq[String])].collect()
    pairs.foreach { case (n, f) => assert(n === f) }
    // the fold's divisor residue drives real cuts at divisor 2 on the
    // fixture (probability 1/2 per window) — parity must hold there too
    val diff2 = docs.select(
        TextHashExpressions.cdcChunks(toks, 2, 2).as("native"),
        cdcChunksFold(toks, 2, 2).as("fold"))
      .where(to_json(col("native")) =!= to_json(col("fold")))
      .count()
    assert(diff2 === 0)
  }

  test("CdcChunksGear: same chunk contract as the md5 kernel " +
      "(concatenation, null-skip, edges), content-defined cuts that " +
      "resynchronize, real cut mass on the fixture") {
    val toks = wsTokens(col("text"))
    // CONTRACT parity: whatever the cut positions, the chunks partition
    // the token stream — space-rejoined chunks == the md5 kernel's
    // rejoined chunks == the normalized token stream, on every doc
    val diff = docs.select(
        array_join(TextHashExpressions.cdcChunksGear(toks, 3, 4), " ").as("g"),
        array_join(TextHashExpressions.cdcChunks(toks, 3, 4), " ").as("m"))
      .where(col("g") =!= col("m")).count()
    assert(diff === 0)
    // edge shapes behave like the md5 kernel: short/solo/empty/null
    val edges = Seq(Seq("a", "b"), Seq("solo"), Seq(""), Seq("x", null, "y"))
      .toDF("toks")
    edges.select(
        TextHashExpressions.cdcChunksGear(col("toks"), 3, 4).as("g"),
        TextHashExpressions.cdcChunks(col("toks"), 3, 4).as("m"))
      .as[(Seq[String], Seq[String])].collect()
      .foreach { case (g, m) =>
        // below w no window exists, so BOTH kernels emit the forced
        // final chunk only — bitwise equal on the edge shapes
        assert(g === m, s"edge shape drift: $g vs $m")
      }
    // the rolling hash actually CUTS on the fixture (divisor 4 -> ~1/4
    // of positions), i.e. this isn't the degenerate one-chunk kernel
    val counts = docs.select(
        size(TextHashExpressions.cdcChunksGear(toks, 3, 4)).as("n"),
        size(wsTokens(col("text"))).as("t"))
      .as[(Int, Int)].collect()
    assert(counts.exists(_._1 > 1), "gear kernel never cut on the fixture")
    val totalChunks = counts.map(_._1.toLong).sum.toDouble
    val totalToks = counts.map(_._2.toLong).sum.toDouble
    assert(totalChunks / totalToks > 0.1 && totalChunks / totalToks < 0.5,
      s"cut rate ${totalChunks / totalToks} far from the 1/divisor design")
    // CONTENT-DEFINED: the same passage after different-length prefixes
    // yields identical interior chunks (the resynchronization property
    // the kernel exists for)
    val passage = (0 until 40).map(i => s"p$i")
    val a = ("a0" +: "a1" +: passage) ++ Seq("aEnd")
    val b = ("b0" +: "b1" +: "b2" +: "b3" +: "b4" +: "b5" +: "b6" +: passage) ++ Seq("bEnd")
    val two = Seq(a, b).toDF("toks")
      .select(TextHashExpressions.cdcChunksGear(col("toks"), 3, 4).as("c"))
      .as[Seq[String]].collect()
    val interiorA = two(0).filter(c => c.split(" ").forall(_.startsWith("p")))
    val interiorB = two(1).filter(c => c.split(" ").forall(_.startsWith("p")))
    // cuts at windows still straddling the prefix (the first w−1
    // in-passage positions) may differ, so the FIRST interior chunk can
    // differ; every later cut is content-identical — the aligned tails
    // must agree exactly
    val tails = interiorA.reverse.zip(interiorB.reverse)
    assert(tails.nonEmpty,
      s"no pure-interior chunks to compare: ${two(0)} vs ${two(1)}")
    tails.zipWithIndex.foreach { case ((x, y), i) =>
      assert(x === y || i === tails.length - 1,
        s"interior chunks must resynchronize: $interiorA vs $interiorB")
    }
    // and the operator accepts the kernel flag end to end
    val viaOp = graft.operators.Dedup.cdcChunkDedup(
        Seq((0L, a.mkString(" ")), (1L, b.mkString(" "))).toDF("id", "text"),
        "id", "text", w = 3, divisor = 4, kernel = "gear")
      .select("id", "n_dropped").as[(Long, Long)].collect().sortBy(_._1)
    assert(viaOp.forall(_._2 >= 1),
      s"gear-kernel dedup must scrub the shared interior: ${viaOp.toSeq}")
  }
}
