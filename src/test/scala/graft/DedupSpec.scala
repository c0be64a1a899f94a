package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),       // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),       // near dup of 1
    (4L, "completely different words about spark and shuffles"),
    (5L, "  The Quick Brown Fox Jumps Over The Lazy Dog  ")    // case/space dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups by normalized text, keeps min id") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // 1,2,5 collapse (lower+trim); 3 and 4 singletons
    assert(got === Array((1L, 3L), (3L, 1L), (4L, 1L)))
  }

  test("minhash LSH finds exact dup pair with jaccard 1.0") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((1L, 2L)))
    assert(pairs((1L, 2L)) === 1.0)
  }

  test("minhash verify legs bounded to candidate endpoints (r15): " +
      "unique fillers change no pair and no jac") {
    // the r15 semi-join restricts the shingle-verify joins to candidate
    // endpoints; the pair set and every exact jac must be byte-identical
    // with and without a sea of non-candidate docs around the dups
    val fillers = (100L until 160L)
      .map(i => (i, s"unique filler document number $i with its own " +
        s"content ${i * 37} and nothing shared ${i * 101}"))
    val mixed = docs.union(fillers.toDF("doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val base = rows(Dedup.minhashPairs(docs, "doc_id", "text",
      persistIntermediates = false))
    val withFillers = rows(Dedup.minhashPairs(mixed, "doc_id", "text",
      persistIntermediates = false))
    // every base pair survives with identical jac (fillers may add their
    // own accidental band collisions, so compare on the base keys)
    base.foreach { case (k, jac) =>
      assert(withFillers.get(k).contains(jac), s"pair $k drifted")
    }
    assert(withFillers.contains((1L, 2L)) && withFillers((1L, 2L)) === 1.0)
  }

  test("minhashPairs keyForm=folded: an NFC-vs-NFD republication pairs " +
      "at jaccard 1.0 where the raw byte form misses it (VERDICT r12 #2)") {
    val nfc = "séance résumé café crème " +
      "brûlée déjà vu encore une fois ce soir"
    val nfd = java.text.Normalizer.normalize(nfc,
      java.text.Normalizer.Form.NFD)
    assert(nfc != nfd, "fixture must be byte-different")
    val df = Seq((1L, nfc), (2L, nfd),
      (3L, "totally unrelated text about spark shuffles and joins"))
      .toDF("doc_id", "text")
    val folded = Dedup.minhashPairs(df, "doc_id", "text",
        persistIntermediates = false, keyForm = "folded")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(folded.get((1L, 2L)).contains(1.0), folded.toString)
    // the raw form shingles different bytes: the pair is absent or < 1.0
    val raw = Dedup.minhashPairs(df, "doc_id", "text",
        persistIntermediates = false)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(raw.get((1L, 2L)).forall(_ < 1.0), raw.toString)
    // unknown form fails loud at plan build
    val ex = intercept[IllegalArgumentException] {
      Dedup.minhashPairs(df, "doc_id", "text", keyForm = "nfkc")
    }
    assert(ex.getMessage.contains("raw|byte|canonical|folded"), ex.getMessage)
  }

  test("lineDedup keyForm=folded: NFC/NFD-variant boilerplate lines " +
      "collide on the folded KEY while output lines keep original bytes") {
    val bp = "Abonnez-vous à notre newsletter dès maintenant"
    val bpNfd = java.text.Normalizer.normalize(bp,
      java.text.Normalizer.Form.NFD)
    val df = Seq(
      (1L, "alpha body\n" + bp),
      (2L, "beta body\n" + bpNfd),
      (3L, "gamma body"))
      .toDF("doc_id", "text")
    val folded = Dedup.lineDedup(df, "doc_id", "text", minDocs = 2,
        keyForm = "folded")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(folded(1L) === ((1L, "alpha body")), folded.toString)
    assert(folded(2L) === ((1L, "beta body")), folded.toString)
    assert(folded(3L) === ((0L, "gamma body")), folded.toString)
    // the byte default sees two distinct keys — nothing removed
    val byte = Dedup.lineDedup(df, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byte === Map(1L -> 0L, 2L -> 0L, 3L -> 0L), byte.toString)
  }

  test("cdcChunkDedup keyForm=folded: NFC/NFD variants of a shared " +
      "passage chunk identically (boundaries + identity on folded " +
      "tokens) while clean_text keeps each doc's ORIGINAL bytes") {
    val passage = (0 until 30).map(i => s"café$i").mkString(" ")
    val passageNfd = java.text.Normalizer.normalize(passage,
      java.text.Normalizer.Form.NFD)
    val df = Seq(
      (1L, "intro1 unique1 opener1 " + passage),
      (2L, "different2 caféA2 words2 also2 " + passageNfd),
      (3L, "unrelated3 filler3 tokens3 here3 now3 more3"))
      .toDF("id", "text")
    val folded = Dedup.cdcChunkDedup(df, "id", "text", w = 3, divisor = 4,
        keyForm = "folded")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getString(3))).toMap
    // interior passage chunks matched cross-doc and were cut from BOTH
    assert(folded(1L)._1 > 0L, folded.toString)
    assert(folded(2L)._1 > 0L, folded.toString)
    assert(folded(3L)._1 === 0L, folded.toString)
    // output text is the doc's own original bytes (NFD survives for
    // doc 2's unique token; no folded/lowercased text leaks out)
    assert(folded(2L)._2.contains("caféA2"), folded(2L)._2)
    assert(folded(1L)._2.startsWith("intro1 unique1 opener1"), folded(1L)._2)
    // the raw form sees byte-different chunks: nothing cut anywhere
    val raw = Dedup.cdcChunkDedup(df, "id", "text", w = 3, divisor = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw === Map(1L -> 0L, 2L -> 0L, 3L -> 0L), raw.toString)
  }

  test("cdcChunkIndex + cdcChunkDedupInline keyForm=folded: a frozen " +
      "NFC reference index gates arriving NFD republications row-locally") {
    val passage = (0 until 30).map(i => s"théme$i").mkString(" ")
    val passageNfd = java.text.Normalizer.normalize(passage,
      java.text.Normalizer.Form.NFD)
    val ref = Seq((1L, "refA " + passage), (2L, "refB " + passage))
      .toDF("id", "text")
    val index = Dedup.cdcChunkIndex(ref, "id", "text", w = 3, divisor = 4,
      keyForm = "folded")
    assert(index.nonEmpty)
    val incoming = Seq((10L, "new10 fresh10 " + passageNfd),
      (11L, "clean11 doc11 tokens11 only11 here11"))
      .toDF("id", "text")
    val got = Dedup.cdcChunkDedupInline(incoming, "id", "text",
        w = 3, divisor = 4, index, keyForm = "folded")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(10L)._1 > 0L, got.toString)   // NFD copy gated by NFC index
    assert(got(11L)._1 === 0L, got.toString) // clean doc untouched
    assert(got(10L)._2.startsWith("new10 fresh10"), got(10L)._2)
  }

  test("winnowOverlapPairs keyForm=folded: NFC/NFD copies share " +
      "fingerprints; the raw form sees none") {
    val nfc = "le café près du musée est déjà " +
      "fermé depuis hier soir malheureusement pour nous tous"
    val nfd = java.text.Normalizer.normalize(nfc,
      java.text.Normalizer.Form.NFD)
    val df = Seq((1L, nfc), (2L, nfd)).toDF("doc_id", "text")
    val folded = Dedup.winnowOverlapPairs(df, "doc_id", "text",
        keyForm = "folded")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(folded.get((1L, 2L)).exists(_ >= 2L), folded.toString)
    // the raw form loses every fingerprint whose gram touches an accent
    // (accent-free runs may still share) — strictly weaker evidence
    val raw = Dedup.winnowOverlapPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(raw.getOrElse((1L, 2L), 0L) < folded((1L, 2L)),
      s"raw $raw vs folded $folded")
  }

  test("simhashPairsBucketed keyForm=folded: an NFC-vs-NFD republication " +
      "lands at hamming 0 where the raw byte form finds no pair (r14)") {
    val nfc = "séance déjà café crème brûlée élève " +
      "fenêtre hôtel théâtre où ça très près"
    val nfd = java.text.Normalizer.normalize(nfc,
      java.text.Normalizer.Form.NFD)
    assert(nfc != nfd, "fixture must be byte-different")
    val df = Seq((1L, nfc), (2L, nfd)).toDF("doc_id", "text")
    val folded = Dedup.simhashPairsBucketed(df, "doc_id", "text",
        maxHamming = 4, keyForm = "folded")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(folded.get((1L, 2L)).contains(0), folded.toString)
    // every token carries an accent, so the raw token md5 sets are
    // disjoint — no bucket collision survives the hamming re-check
    val raw = Dedup.simhashPairsBucketed(df, "doc_id", "text",
        maxHamming = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(!raw.contains((1L, 2L)), raw.toString)
    // quadratic and bucketed forms agree under the fold
    val quad = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 4,
        keyForm = "folded")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(quad === folded, s"quad $quad vs bucketed $folded")
  }

  test("jaccardPairsPrefix keyForm=folded: NFC/NFD copies qualify at " +
      "jaccard 1.0 where the raw form generates no candidate (r14)") {
    val nfc = "séance déjà café crème brûlée élève " +
      "fenêtre hôtel théâtre où ça très près"
    val nfd = java.text.Normalizer.normalize(nfc,
      java.text.Normalizer.Form.NFD)
    val df = Seq((1L, nfc), (2L, nfd),
      (3L, "entièrement différent détaché apré unrelated möglich"))
      .toDF("doc_id", "text")
    val folded = Dedup.jaccardPairsPrefix(df, "doc_id", "text",
        tNum = 1, tDen = 2, keyForm = "folded")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(folded.get((1L, 2L)).contains(1.0), folded.toString)
    // all-accented vocabulary: the raw word sets are disjoint, so the
    // prefix index yields no candidate for the pair at all
    val raw = Dedup.jaccardPairsPrefix(df, "doc_id", "text",
        tNum = 1, tDen = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(!raw.contains((1L, 2L)), raw.toString)
  }

  test("dupSpanScrub keyForm=folded: an NFD re-quote of an NFC passage " +
      "is cut (keep-first) while clean_text keeps original bytes (r14)") {
    val passage = "café crème brûlée déjà vu ce soir là"  // 8 tokens
    val passageNfd = java.text.Normalizer.normalize(passage,
      java.text.Normalizer.Form.NFD)
    val df = Seq(
      (1L, "intro one two three " + passage),
      (2L, "other words here " + passageNfd + " tail9"))
      .toDF("doc_id", "text")
    val folded = Dedup.dupSpanScrub(df, "doc_id", "text", n = 8,
        keyForm = "folded")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    // doc 1 holds the first occurrence (min id·posCap+pos) and keeps it
    assert(folded(1L)._1 === 0L, folded.toString)
    assert(folded(2L) === ((8L, "other words here tail9")), folded.toString)
    // the raw form hashes byte-different windows — nothing is cut
    val raw = Dedup.dupSpanScrub(df, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(raw === Map(1L -> 0L, 2L -> 0L), raw.toString)
  }

  test("dupSpanIndex + dupSpanScrubInline keyForm=folded: a frozen NFC " +
      "gram index gates arriving NFD republications row-locally (r14)") {
    val passage = "café crème brûlée déjà vu ce soir là"
    val passageNfd = java.text.Normalizer.normalize(passage,
      java.text.Normalizer.Form.NFD)
    val ref = Seq((1L, "refA starts here " + passage)).toDF("doc_id", "text")
    val index = Dedup.dupSpanIndex(ref, "text", n = 8, keyForm = "folded")
    assert(index.nonEmpty)
    val incoming = Seq(
      (10L, "fresh new doc " + passageNfd + " ending"),
      (11L, "clean eleven tokens only here now"))
      .toDF("doc_id", "text")
    val got = Dedup.dupSpanScrubInline(incoming, "doc_id", "text", n = 8,
        index, keyForm = "folded")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(4))).toMap
    assert(got(10L) === ((8L, "fresh new doc ending")), got.toString)
    assert(got(11L)._1 === 0L, got.toString)
    // raw probe of the folded index misses (the silent-miss class the
    // artifact sidecar exists to prevent — ADVICE r13)
    val rawProbe = Dedup.dupSpanScrubInline(incoming, "doc_id", "text",
        n = 8, index)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rawProbe(10L) === 0L, rawProbe.toString)
  }

  test("maximalDupSpans keyForm=folded: the full NFC/NFD-shared run is " +
      "reported with exact boundaries; raw reports none (r14)") {
    val run = (0 until 10).map(i => s"café$i").mkString(" ")  // 10 tokens
    val runNfd = java.text.Normalizer.normalize(run,
      java.text.Normalizer.Form.NFD)
    val df = Seq(
      (1L, "aA bB cC " + run + " dD"),
      (2L, "xX yY " + runNfd))
      .toDF("doc_id", "text")
    val folded = Dedup.maximalDupSpans(df, "doc_id", "text", minLen = 8,
        maxSpan = 64, keyForm = "folded")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
      .sortBy(x => (x._1, x._2))
    assert(folded === Seq((1L, 3L, 10L), (2L, 2L, 10L)), folded.toString)
    val raw = Dedup.maximalDupSpans(df, "doc_id", "text", minLen = 8,
      maxSpan = 64).count()
    assert(raw === 0L, s"raw form must see no duplicated run, got $raw")
  }

  test("span/cdc index artifacts carry keyForm in the sidecar; a " +
      "pre-r14 artifact (no sidecar) loads as its historical default") {
    val passage = "café crème brûlée déjà vu ce soir là"
    val ref = Seq((1L, "refA starts here " + passage)).toDF("doc_id", "text")
    val idx = Dedup.dupSpanIndex(ref, "text", n = 8, keyForm = "folded")
    val tmp = java.nio.file.Files.createTempDirectory("graft-spanform-")
    Dedup.saveSpanIndex(spark, tmp.toString, n = 8, idx, keyForm = "folded")
    val (n1, f1, a1) = Dedup.loadSpanIndex(spark, tmp.toString)
    assert(n1 === 8 && f1 === "folded" && a1.toSeq === idx.toSeq)
    // unknown form fails loud BEFORE any byte is written
    val ex = intercept[IllegalArgumentException] {
      Dedup.saveSpanIndex(spark, tmp.toString, n = 8, idx, keyForm = "nfkc")
    }
    assert(ex.getMessage.contains("raw|byte|canonical|folded"), ex.getMessage)
    // pre-r14 compat: strip the sidecar, bust the mtime cache — the
    // loader must fall back to the historical default ("raw" for span)
    java.nio.file.Files.delete(tmp.resolve("index_meta.json"))
    java.nio.file.Files.setLastModifiedTime(tmp.resolve("_SUCCESS"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 2000))
    val (n2, f2, a2) = Dedup.loadSpanIndex(spark, tmp.toString)
    assert(n2 === 8 && f2 === "raw" && a2.toSeq === idx.toSeq)
    // cdc family: keyForm rides next to the packed (w, divisor, kernel)
    val cdcIdx = Dedup.cdcChunkIndex(
      Seq((1L, passage), (2L, passage)).toDF("doc_id", "text"),
      "doc_id", "text", w = 3, divisor = 4, keyForm = "folded")
    val tmpC = java.nio.file.Files.createTempDirectory("graft-cdcform-")
    Dedup.saveCdcChunkIndex(spark, tmpC.toString, w = 3, divisor = 4,
      cdcIdx, keyForm = "folded")
    val (wC, dC, kC, fC, aC) = Dedup.loadCdcChunkIndex(spark, tmpC.toString)
    assert(wC === 3 && dC === 4 && kC === "md5" && fC === "folded" &&
      aC.toSeq === cdcIdx.toSeq)
  }

  test("chunkDedup keyForm=folded: aligned NFC/NFD boilerplate chunks " +
      "collide on the folded key; clean_text keeps original bytes (r14)") {
    val passage = (0 until 8).map(i => s"caf\u00e9$i").mkString(" ")
    val passageNfd = java.text.Normalizer.normalize(passage,
      java.text.Normalizer.Form.NFD)
    // k = 4 and the passage starts at pos 0 in both docs, so its two
    // fixed-k chunks are position-ALIGNED — the fixed-k family's
    // requirement (unaligned offsets are the CDC family's job)
    val df = Seq(
      (1L, passage + " tail1a tail1b tail1c tail1d"),
      (2L, passageNfd + " tail2a tail2b tail2c tail2d"),
      (3L, "other3a other3b other3c other3d other3e other3f other3g other3h"))
      .toDF("id", "text")
    val folded = Dedup.chunkDedup(df, "id", "text", k = 4, maxDocFreq = 1,
        keyForm = "folded")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(folded(1L) === ((2L, "tail1a tail1b tail1c tail1d")), folded.toString)
    assert(folded(2L) === ((2L, "tail2a tail2b tail2c tail2d")), folded.toString)
    assert(folded(3L)._1 === 0L, folded.toString)
    val raw = Dedup.chunkDedup(df, "id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw === Map(1L -> 0L, 2L -> 0L, 3L -> 0L), raw.toString)
  }

  test("chunkDedupKeepFirst keyForm=folded: the NFD copy is cut, the " +
      "NFC first occurrence survives with its own bytes (r14)") {
    val passage = (0 until 4).map(i => s"th\u00e9me$i").mkString(" ")
    val passageNfd = java.text.Normalizer.normalize(passage,
      java.text.Normalizer.Form.NFD)
    val df = Seq(
      (1L, passage + " u1a u1b u1c u1d"),
      (2L, passageNfd + " u2a u2b u2c u2d"))
      .toDF("id", "text")
    val folded = Dedup.chunkDedupKeepFirst(df, "id", "text", k = 4,
        keyForm = "folded")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(folded(1L)._1 === 0L, folded.toString)
    assert(folded(1L)._2 startsWith "th\u00e9me0", folded.toString)
    assert(folded(2L) === ((1L, "u2a u2b u2c u2d")), folded.toString)
    val raw = Dedup.chunkDedupKeepFirst(df, "id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw === Map(1L -> 0L, 2L -> 0L), raw.toString)
  }

  test("ngramJaccardPairs keyForm=folded: NFC/NFD copies score jac 1.0 " +
      "where raw shares no gram (r14)") {
    val nfc = "s\u00e9ance d\u00e9j\u00e0 caf\u00e9 cr\u00e8me " +
      "br\u00fbl\u00e9e tr\u00e8s pr\u00e8s voil\u00e0"
    val nfd = java.text.Normalizer.normalize(nfc,
      java.text.Normalizer.Form.NFD)
    val df = Seq((1L, nfc), (2L, nfd)).toDF("doc_id", "text")
    val folded = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3,
        persistIntermediates = false, keyForm = "folded")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(folded.get((1L, 2L)).contains(1.0), folded.toString)
    // every token is accented, so raw 3-gram sets are disjoint and the
    // inverted index emits no pair at all (jac > 0 contract)
    val raw = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3,
        persistIntermediates = false)
      .collect()
    assert(raw.isEmpty, raw.mkString("; "))
  }

  test("minhash LSH candidate pairs never include self or reversed pairs") {
    val got = Dedup.minhashPairs(docs, "doc_id", "text").collect()
    got.foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }

  test("simhash: identical docs at hamming 0, unrelated docs far") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 60)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 2L)) === 0)
    assert(pairs((3L, 4L)) > 10) // unrelated
    assert(pairs((1L, 3L)) < pairs((3L, 4L))) // near dup closer than unrelated
  }

  test("simhash bucketed == quadratic (pigeonhole losslessness, real docs)") {
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    for (d <- Seq(0, 2, 4, 7)) {
      val quad = key(Dedup.simhashPairs(real, "doc_id", "text", maxHamming = d))
      val buck = key(Dedup.simhashPairsBucketed(real, "doc_id", "text", maxHamming = d))
      assert(buck === quad, s"bucketed != quadratic at maxHamming=$d")
    }
  }

  test("simhash bucketed plan is equi-join only — no nested-loop/cartesian") {
    val real = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = Dedup.simhashPairsBucketed(real, "doc_id", "text", maxHamming = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("simhash bucketed maxBucketSize drops degenerate buckets, keeps normal pairs") {
    import spark.implicits._
    // 40 identical boilerplate docs = one degenerate bucket per chunk
    val boiler = (100L until 140L).map(i => (i, "identical boilerplate row that floods every bucket"))
    val mixed = docs.union(boiler.toDF("doc_id", "text"))
    val uncapped = Dedup.simhashPairsBucketed(mixed, "doc_id", "text", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.simhashPairsBucketed(mixed, "doc_id", "text", maxHamming = 4,
        maxBucketSize = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val boilerPairs = uncapped.filter { case (a, b) => a >= 100L && b >= 100L }
    assert(boilerPairs.size === 40 * 39 / 2)          // uncapped pays the quadratic bucket
    assert(capped.intersect(boilerPairs).isEmpty)      // capped never materializes it
    assert(capped.contains((1L, 2L)))                  // normal dup pair survives the cap
    // away from the degenerate bucket, capped == uncapped
    assert(uncapped -- boilerPairs === capped)
  }

  test("minhash maxBucketSize drops degenerate band buckets, keeps normal pairs") {
    import spark.implicits._
    val boiler = (100L until 140L).map(i => (i, "same boilerplate text in every single row here"))
    val mixed = docs.union(boiler.toDF("doc_id", "text"))
    def pairsOf(cap: Option[Int]) =
      Dedup.minhashPairs(mixed, "doc_id", "text", persistIntermediates = false,
          maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairsOf(None)
    val capped = pairsOf(Some(10))
    val boilerPairs = uncapped.filter { case (a, b) => a >= 100L && b >= 100L }
    assert(boilerPairs.size === 40 * 39 / 2)
    assert(capped.intersect(boilerPairs).isEmpty)
    assert(capped.contains((1L, 2L)))
    assert(uncapped -- boilerPairs === capped)
  }

  test("ngram maxDocFreq drops stop-grams; normal-data output is unchanged") {
    import spark.implicits._
    val boiler = (100L until 140L).map(i => (i, "same boilerplate text in every single row here"))
    val mixed = docs.union(boiler.toDF("doc_id", "text"))
    def pairsOf(df: org.apache.spark.sql.DataFrame, cap: Option[Int]) =
      Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3,
          persistIntermediates = false, maxDocFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pathological fixture: the 40-doc boilerplate grams exceed the cap,
    // so no pair materializes through them — bounded join, no quadratic
    val capped = pairsOf(mixed, Some(10))
    assert(capped.count { case (a, b) => a >= 100L && b >= 100L } === 0)
    assert(capped.contains((1L, 2L)))
    // normal data: no gram reaches the cap -> capped == uncapped, with
    // identical Jaccard values (cap affects the index, not set sizes)
    val normalCapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        persistIntermediates = false, maxDocFreq = Some(100))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val normalUncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        persistIntermediates = false)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(normalCapped === normalUncapped)
  }

  test("withMinhashPairs / withNgramJaccardPairs leave no cached blocks behind") {
    // earlier tests in this suite use the unscoped form (which leaks its
    // candidate checkpoint until the ContextCleaner GCs it — by design);
    // compare ID SETS, not sizes: a stale leak may be cleaned mid-test
    // (shrinking the map), so the leak-free invariant is "this test's own
    // calls registered NO id that outlives them"
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val n1 = Dedup.withMinhashPairs(docs, "doc_id", "text") { pairs =>
      val c = pairs.count() // materializes the pinned cache
      assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty)
      c
    }
    assert(n1 > 0)
    val n2 = Dedup.withNgramJaccardPairs(docs, "doc_id", "text") { _.count() }
    assert(n2 > 0)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"scoped forms leaked persistent RDDs: $leaked")
  }

  test("ngram jaccard: exact dup at 1.0, near-dup partial, disjoint absent") {
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(jac((1L, 2L)) === 1.0)
    assert(jac((1L, 3L)) > 0.0 && jac((1L, 3L)) < 1.0)
    assert(!jac.contains((1L, 4L))) // zero-overlap pairs never materialize
  }

  test("nearest neighbor per row on real embeddings is symmetric-sane") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val nn = Dedup.nearestNeighborPerRow(emb, "vec_id", "embedding")
    assert(nn.count() === 50)
    // no row is its own neighbor
    assert(nn.where($"vec_id" === $"nn_id").count() === 0)
  }

  test("LSH and IVF candidate near-dup paths both find a planted duplicate") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val asDouble = transform($"embedding", x => x.cast("double"))
    // vec_id 9000 = copy of vec_id 7, element 0 perturbed 1% (cos ~0.9999)
    val planted = emb.where($"vec_id" === 7)
      .select(lit(9000L).as("vec_id"),
        transform($"embedding",
          (x, i) => when(i === 0, x.cast("double") * 1.01).otherwise(x.cast("double")))
          .as("embedding"))
    val data = emb.select($"vec_id", asDouble.as("embedding")).unionByName(planted)

    val lsh = Dedup.nearestNeighborPerRowLsh(data, "vec_id", "embedding",
        $"vec_id".between(1, 6), numPlanes = 6, numFlips = 1)
      .where($"vec_id" === 9000L).collect()
    assert(lsh.length === 1 && lsh.head.getLong(1) === 7L)
    assert(lsh.head.getDouble(2) > 0.999)

    val cent = graft.operators.SimilaritySearch.trainCentroids(data, "embedding", k = 4)
    val ivf = Dedup.nearestNeighborPerRowIvf(data, "vec_id", "embedding",
        cent, nprobe = 1)
      .where($"vec_id" === 9000L).collect()
    assert(ivf.length === 1 && ivf.head.getLong(1) === 7L)
    assert(ivf.head.getDouble(2) > 0.999)
  }

  test("cosinePairsInCells: co-cell pairs only, exact cosine, equi-join plan") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cent = emb.where($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("ce"))
    val pairs = Dedup.cosinePairsInCells(emb, "vec_id", "embedding", cent)
    assert(!pairs.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val got = pairs.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    got.keys.foreach { case (a, b) => assert(a < b) }
    // cosine inside a cell matches the exact all-pairs computation
    val assigned = graft.operators.SimilaritySearch
      .ivfAssign(emb, "vec_id", "embedding", cent)
      .select($"vec_id", $"cid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sample = got.take(20)
    val v = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    sample.foreach { case ((a, b), cos) =>
      assert(assigned(a) === assigned(b), "pairs must share a cell")
      val (va, vb) = (v(a), v(b))
      val dotp = va.indices.foldLeft(0.0)((s, i) => s + va(i) * vb(i))
      val exact = dotp / (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
      assert(math.abs(cos - exact) < 1e-9)
    }
  }

  test("candidate near-dup paths: the pair join is an equi-join, not a cross product") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cent = graft.operators.SimilaritySearch.trainCentroids(emb, "embedding", k = 4)
    // the only nested-loop allowed is the broadcast of the tiny centroid /
    // plane table; the candidate self-join must never be a cross product
    // of the corpus with itself — CartesianProduct is the smoking gun
    val ivfPlan = Dedup.nearestNeighborPerRowIvf(emb, "vec_id", "embedding", cent, 2)
      .queryExecution.executedPlan.toString
    assert(!ivfPlan.contains("CartesianProduct"), ivfPlan.take(2000))
    val lshPlan = Dedup.nearestNeighborPerRowLsh(emb, "vec_id", "embedding",
        $"vec_id".between(1, 6), numPlanes = 6)
      .queryExecution.executedPlan.toString
    assert(!lshPlan.contains("CartesianProduct"), lshPlan.take(2000))
  }

  test("editDistancePairs: deletion-neighborhood candidates find exactly the lev<=2 truth") {
    val words = Seq(
      (1L, "g", "lavender"), (2L, "g", "lavendar"),   // substitution, lev 1
      (3L, "g", "lavnder"),                           // deletion of 1, lev 1
      (4L, "g", "slavender"),                         // insertion, lev 1
      (5L, "g", "navy"), (6L, "g", "wavy"),           // lev 1 pair
      (7L, "g", "chartreuse"),                        // no partner
      (8L, "h", "lavender")                           // other block: no cross pair
    ).toDF("id", "blk", "w")
    val got = Dedup.editDistancePairs(words, "id", "w", "blk", maxDist = 2)
      .orderBy("ak", "bk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // quadratic ground truth within block
    val rows = words.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, ba, wa) <- rows; (ib, bb, wb) <- rows
      if ia < ib && ba == bb && lev(wa, wb) <= 2
    } yield (ia, ib, lev(wa, wb))).sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty && got.forall(_._3 <= 2))
  }

  test("editDistancePairs maxBucketSize drops degenerate variant keys only") {
    // 'aaaa' x4 is boilerplate (its variant keys all have count 4);
    // cap 3 drops those keys, so the boilerplate pairs vanish while the
    // independent (x, y) typo pair survives
    val words = (Seq.tabulate(4)(i => (i.toLong, "aaaa")) ++
      Seq((10L, "xyzw"), (11L, "xyzq"))).map { case (i, w) => (i, 0, w) }
      .toDF("id", "blk", "w")
    val capped = Dedup.editDistancePairs(words, "id", "w", "blk",
      maxDist = 2, maxBucketSize = Some(3))
      .select("ak", "bk").as[(Long, Long)].collect().toSet
    assert(capped === Set((10L, 11L)))
    val uncapped = Dedup.editDistancePairs(words, "id", "w", "blk", maxDist = 2)
      .count()
    assert(uncapped === 7L) // C(4,2) boilerplate pairs + the typo pair
  }

  test("incremental minhash: new-vs-corpus cross pairs only") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val oldDocs = Seq(
      (1L, base),
      (2L, "completely different corpus content nothing shared with anything here")
    ).toDF("doc_id", "text")
    val newDocs = Seq(
      (10L, base + " x"),  // near-dup of old doc 1
      (11L, base + " y"),  // ALSO near-dup of old 1 AND of new 10
      (12L, "fresh novel text with zero overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashPairsAgainst(newDocs, oldDocs, "doc_id", "text")
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // both near-dup NEW docs flag against old 1; new-vs-new (10,11) is
    // NOT reported (that's the batch's own self-dedup pass)
    assert(got.map(t => (t._1, t._2)).toSeq === Seq((10L, 1L), (11L, 1L)))
    assert(got.forall(_._3 > 0.8), got.mkString(", "))
  }

  test("signature index: check from the artifact == live check; append == rebuild") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpusA = Seq(
      (1L, base),
      (2L, "completely different corpus content nothing shared with anything here")
    ).toDF("doc_id", "text")
    val corpusB = Seq(
      (3L, "a second ingest wave with its own unique phrasing throughout")
    ).toDF("doc_id", "text")
    val newDocs = Seq(
      (10L, base + " x"),
      (11L, "a second ingest wave with its own unique phrasing throughout ok"),
      (12L, "fresh novel text with zero overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-sigidx-").toString
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    Dedup.buildSignatureIndex(corpusA, "doc_id", "text", dir)
    // artifact check == live check, exactly (incl. jac values)
    assert(rows(Dedup.pairsAgainstIndex(newDocs, "doc_id", "text", dir))
      === rows(Dedup.minhashPairsAgainst(newDocs, corpusA, "doc_id", "text")))
    // append wave B at ingest: check == live check against the UNION
    Dedup.appendToSignatureIndex(corpusB, "doc_id", "text", dir)
    val fromIndex = rows(Dedup.pairsAgainstIndex(newDocs, "doc_id", "text", dir))
    assert(fromIndex ===
      rows(Dedup.minhashPairsAgainst(newDocs, corpusA.union(corpusB), "doc_id", "text")))
    // the wave-B near-dup is actually found through the artifact
    assert(fromIndex.map(t => (t._1, t._2)).contains((11L, 3L)))
    // a pathless dir fails fast with a real message
    val e = intercept[IllegalArgumentException] {
      Dedup.pairsAgainstIndex(newDocs, "doc_id", "text",
        java.nio.file.Files.createTempDirectory("graft-sigidx-none-").toString)
    }
    assert(e.getMessage.contains("buildSignatureIndex"))
  }

  test("rebandSignatureIndex: re-banded artifact == fresh build at the " +
      "new geometry, no corpus re-scan; empty-shingle docs round-trip") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different corpus content nothing shared elsewhere"),
      (3L, "a third document with its own phrasing all the way through"),
      (4L, "")) // empty shingles -> all-null signature -> '' band keys
      .toDF("doc_id", "text")
    val newDocs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again x"),
      (11L, "")) // empty-shingle probe pairs with the empty-shingle doc
      .toDF("doc_id", "text")
    val oldDir = java.nio.file.Files.createTempDirectory("graft-rb-old-").toString
    val newDir = java.nio.file.Files.createTempDirectory("graft-rb-new-").toString + "/idx"
    val freshDir = java.nio.file.Files.createTempDirectory("graft-rb-fresh-").toString
    Dedup.buildSignatureIndex(corpus, "doc_id", "text", oldDir,
      numHashes = 16, bands = 4)
    Dedup.rebandSignatureIndex(spark, oldDir, newBands = 2, newDir)
    Dedup.buildSignatureIndex(corpus, "doc_id", "text", freshDir,
      numHashes = 16, bands = 2)
    // the re-banded index IS the fresh 2-band build: identical rows
    def idx(dir: String) = spark.read.parquet(dir)
      .select("id", "band_idx", "band_key")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(1 + 1)))
      .toSet
    assert(idx(newDir) === idx(freshDir))
    // and identical pair verdicts through the serving path
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(Dedup.pairsAgainstIndex(newDocs, "doc_id", "text", newDir))
      === rows(Dedup.pairsAgainstIndex(newDocs, "doc_id", "text", freshDir)))
    // geometry misuse fails loud
    val exDiv = intercept[IllegalArgumentException] {
      Dedup.rebandSignatureIndex(spark, oldDir, newBands = 3,
        newDir + "-bad")
    }
    assert(exDiv.getMessage.contains("divide"), exDiv.getMessage)
    val exSame = intercept[IllegalArgumentException] {
      Dedup.rebandSignatureIndex(spark, oldDir, newBands = 2, oldDir)
    }
    assert(exSame.getMessage.contains("NEW path"), exSame.getMessage)
  }

  /** JVM mirror of winnowing selection: md5-low-32 k-gram hashes,
    * hp = hash·2²⁰ + pos, window minima over full windows, distinct.
    */
  private def winnowNaive(text: String, k: Int, w: Int): Set[Long] = {
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(24, 32), 16)
    }
    val n = math.max(text.length - (k - 1), 1)
    val hps = (1 to n).map(p =>
      h32(text.substring(p - 1, math.min(p - 1 + k, text.length))) *
        1048576L + p)
    val full = math.max(n - (w - 1), 1)
    (1 to full).map(p => hps.slice(p - 1, p - 1 + w).min).toSet
  }

  test("winnowFingerprints matches a driver-side recomputation") {
    val d = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "abc"), (3L, "")).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(d, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set(1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "abc", 3L -> "").flatMap { case (id, t) =>
      winnowNaive(t, 5, 4).map(id -> _)
    }
    assert(got === want)
    // short docs still yield exactly one fingerprint
    assert(got.count(_._1 == 2L) === 1)
    assert(got.count(_._1 == 3L) === 1)
  }

  test("winnowing guarantee: a shifted copy of a long run still pairs") {
    val base = "conclusions are drawn from the replicated paragraph body"
    val d = Seq(
      (1L, s"AAAA $base"),
      (2L, s"zzzzzzzzzzzz $base"), // same run at a different offset
      (3L, "entirely unrelated content with no overlap at all whatsoever"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(d, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccardPairsPrefix is lossless vs the naive quadratic join") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),     // jac 4/6 with 1
      (3L, "alpha beta unrelated words here"), // jac 2/8 with 1
      (4L, "gamma delta epsilon alpha beta"),  // same set as 1 → jac 1
      (5L, "totally disjoint vocabulary document"),
      (6L, "   "), (7L, "")).toDF("doc_id", "text")
    val got = Dedup.jaccardPairsPrefix(d, "doc_id", "text", tNum = 1, tDen = 3)
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // naive: all pairs over distinct word sets
    val sets = Map(1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta zeta", 3L -> "alpha beta unrelated words here",
      4L -> "gamma delta epsilon alpha beta",
      5L -> "totally disjoint vocabulary document")
      .map { case (k, v) => k -> v.split("\\s+").toSet }
    val naive = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      uni = (sets(a) | sets(b)).size
      if inter * 3 >= uni * 1
    } yield (a, b, inter.toDouble / uni)).toSeq.sorted
    assert(got === naive)
    assert(got.contains((1L, 4L, 1.0))) // permuted copy found at jac 1
  }

  test("jaccardPairsPrefix: boundary pair exactly at the threshold is kept") {
    val d = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    // inter 2, union 4 → jac exactly 1/2
    val at = Dedup.jaccardPairsPrefix(d, "doc_id", "text", 1, 2).collect()
    assert(at.length === 1 && at.head.getDouble(2) === 0.5)
    val above = Dedup.jaccardPairsPrefix(d, "doc_id", "text", 51, 100).collect()
    assert(above.isEmpty)
  }

  test("idfOverlapPairs: rare shared terms outweigh many common ones") {
    // docs 1,2 share ONE rare term (df=2); docs 3,4 share three common
    // terms (df=4 each, present in every doc) — but common terms are
    // also in 1,2, so the rare pair must score strictly higher
    val d = Seq(
      (1L, "zebra common1 common2 common3"),
      (2L, "zebra common1 common2 common3"),
      (3L, "common1 common2 common3 other1"),
      (4L, "common1 common2 common3 other2"))
      .toDF("doc_id", "text")
    val got = Dedup.idfOverlapPairs(d, "doc_id", "text", maxDocFreq = 20)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // n=4; zebra df=2 w=2 w2=4; common df=4 w=1 w2=1 each
    assert(got((1L, 2L)) === 4L + 3L) // zebra + 3 commons
    assert(got((3L, 4L)) === 3L)      // 3 commons only
    assert(got((1L, 2L)) > got((3L, 4L)))
  }

  test("idfOverlapPairs: singleton and hot terms never generate candidates") {
    val d = Seq(
      (1L, "unique1 hot"), (2L, "unique2 hot"), (3L, "unique3 hot"))
      .toDF("doc_id", "text")
    // df=1 terms can't pair; 'hot' df=3 > cap=2 → no pairs at all
    assert(Dedup.idfOverlapPairs(d, "doc_id", "text", maxDocFreq = 2)
      .count() === 0L)
  }

  test("winnowF1Pairs: identical docs verify at f1 = 1.0, partial copies below") {
    val shared = "the winnowing fingerprints select shared substrings reliably"
    val d = Seq(
      (1L, shared),
      (2L, shared),
      (3L, s"prefix text then $shared and then a long unrelated tail of words"))
      .toDF("doc_id", "text")
    val got = Dedup.winnowF1Pairs(d, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(got((1L, 2L)) === 1.0) // identical gram sets
    assert(got.get((1L, 3L)).exists(f => f > 0.0 && f < 1.0))
  }

  test("winnowF1Pairs/containmentPairs accept a reliable checkpointDir " +
      "(r15): same answers, candidate blocks on the shared filesystem") {
    val shared = "the winnowing fingerprints select shared substrings reliably"
    val d = Seq(
      (1L, shared),
      (2L, shared),
      (3L, s"prefix text then $shared and then a long unrelated tail of words"))
      .toDF("doc_id", "text")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-winnow-ckpt-").toString
    val got = Dedup.winnowF1Pairs(d, "doc_id", "text",
        checkpointDir = Some(ckpt))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(got((1L, 2L)) === 1.0, got.toString)
    assert(got.get((1L, 3L)).exists(f => f > 0.0 && f < 1.0), got.toString)
    // the candidate materialization actually landed in the dir (the
    // cluster contract: blocks survive executor loss)
    def filesUnder(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(p => java.nio.file.Files.isRegularFile(p)).count()
      finally s.close()
    }
    assert(filesUnder(java.nio.file.Paths.get(ckpt)) > 0,
      s"no checkpoint files under $ckpt")
    val cont = Dedup.containmentPairs(d, "doc_id", "text",
        checkpointDir = Some(ckpt))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(cont((1L, 2L)) === 1.0, cont.toString)
  }

  test("overlapSpans: identical docs report identical covering spans") {
    val t = "the winnowing fingerprints select shared substrings reliably"
    val d = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val rows = Dedup.overlapSpans(d, "doc_id", "text").collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getLong(3) === r.getLong(5) && r.getLong(4) === r.getLong(6))
    assert(r.getLong(4) <= t.length.toLong) // span inside the document
  }

  test("overlapSpans: a planted shared block is localized in BOTH docs") {
    // disjoint vocabularies around the shared middle, so every shared
    // fingerprint gram lies strictly inside the planted block
    val shared = "common duplicated sentence material that winnowing must localize"
    val a = s"alpha beta gamma delta epsilon $shared zeta eta theta iota kappa"
    val b = s"uno dos tres cuatro $shared cinco seis siete ocho nueve diez"
    // the spaces flanking the block are themselves shared content, so a
    // gram may legitimately extend one char past either edge
    val startA = a.indexOf(shared); val endA = startA + shared.length + 1L
    val startB = b.indexOf(shared); val endB = startB + shared.length + 1L
    val d = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val rows = Dedup.overlapSpans(d, "doc_id", "text").collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(2) >= 2L) // several shared fingerprints
    assert(r.getLong(3) >= startA && r.getLong(4) <= endA,
      s"A span [${r.getLong(3)}, ${r.getLong(4)}] outside planted [$startA, $endA]")
    assert(r.getLong(5) >= startB && r.getLong(6) <= endB,
      s"B span [${r.getLong(5)}, ${r.getLong(6)}] outside planted [$startB, $endB]")
  }

  test("containmentPairs: a quoted short doc scores 1.0 one way only") {
    val short = "the winnowing fingerprints select shared substrings reliably"
    val d = Seq(
      (1L, short),
      (2L, s"$short followed by a very long unrelated tail that keeps going " +
        "with many more words than the quoted fragment itself contains here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // every 5-gram of the short doc appears in the long one: src=1 → 1.0
    val (inter, nSrc, c) = got((1L, 2L))
    assert(c === 1.0 && inter === nSrc)
    // the reverse direction (long contained in short) fails the 0.5 gate
    assert(!got.contains((2L, 1L)))
  }

  test("containmentPairs: identical docs pass both directions; gate is inclusive") {
    val t = "identical fingerprint content in both of these documents"
    val d = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val both = Dedup.containmentPairs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(both.toSet === Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
    // minMille = 1000 keeps exact-full containment (1000·inter >= 1000·n)
    assert(Dedup.containmentPairs(d, "doc_id", "text", minMille = 1000L)
      .count() === 2L)
    // an impossible gate (> 100%) drops everything
    assert(Dedup.containmentPairs(d, "doc_id", "text", minMille = 1001L)
      .count() === 0L)
  }

  test("jaccardPairsPrefix: hot-prefix cap bounds the pathological corpus") {
    // 200 IDENTICAL documents — rarest-first prefix selection degenerates
    // (every doc's prefix is the same gram, pfreq = corpus size) and the
    // uncapped candidate join would be 200²/2 in one bucket
    val d = (0L until 200L).map(i => (i, "aaa bbb ccc ddd eee fff"))
      .toDF("doc_id", "text")
    val capped = Dedup.jaccardPairsPrefix(d, "doc_id", "text",
      tNum = 4, tDen = 5, gramN = 3, maxPrefixFreq = 20)
    // every prefix token is hot → the capped index is empty: candidates
    // bounded (losslessness knowingly broken, WARN-logged with counts)
    assert(capped.count() === 0L)
    capped.unpersist()
    // a cap above the corpus size keeps the operator lossless: all pairs
    val full = Dedup.jaccardPairsPrefix(d, "doc_id", "text",
      tNum = 4, tDen = 5, gramN = 3, maxPrefixFreq = 10000)
    assert(full.count() === 200L * 199L / 2L)
    full.unpersist()
  }

  test("winnowing hot-fingerprint cap drops boilerplate from pairing") {
    val boiler = "this exact boilerplate sentence appears everywhere"
    val d = (1L to 6L).map(i => (i, s"doc $i says $boiler")).toDF("doc_id", "text")
    // cap below the corpus size: every shared hash is 6-doc-hot → no pairs
    val capped = Dedup.winnowOverlapPairs(d, "doc_id", "text",
      k = 5, w = 4, maxDocFreq = 3)
    assert(capped.where(col("n_shared") > 0).count() === 0L)
  }

  test("minhash shingle-verify joins never broadcast the shingle relation " +
      "even when the planner would love to") {
    // Regression for the 10× driver-broadcast OOM (SCALE.md watch item):
    // the shingle relation reads from the cached signature frame, whose
    // stats can come in under autoBroadcastJoinThreshold — with a
    // generous threshold the planner WOULD broadcast it; the
    // SHUFFLE_HASH pin must win.
    val conf = spark.conf
    val (aqe, bro) = (conf.get("spark.sql.adaptive.enabled"),
      conf.get("spark.sql.autoBroadcastJoinThreshold"))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", (256 << 20).toString)
    try {
      val docs = graft.core.Tables.documents(spark, sf0001)
      Dedup.withMinhashPairs(docs, "doc_id", "text") { pairs =>
        val plan = pairs.queryExecution.executedPlan.toString
        // both verify joins pinned to shuffled-hash on the shingle side
        assert("ShuffledHashJoin \\[a".r.findFirstIn(plan).isDefined &&
          "ShuffledHashJoin \\[b".r.findFirstIn(plan).isDefined,
          plan.take(4000))
        // the only broadcasts are the r15 candidate-endpoint id sets
        // feeding the LeftSemi restriction — bounded long ids, never
        // shingle arrays. Every INNER join on the shingle relation must
        // stay shuffled-hash; a BuildRight/BuildLeft inner broadcast
        // would be the 10× OOM shape again.
        assert(!"BroadcastHashJoin .*Inner".r.findFirstIn(plan).isDefined,
          plan.take(4000))
        // the pin must not change results: pairs still find the planted
        // near-dups this fixture's q17/q64 rely on
        assert(pairs.where(col("jac") >= 0.5).count() > 0L)
      }
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bro)
    }
  }

  test("exactCanonical: case/punct/whitespace variants collide, distinct content survives") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!"), (2L, "hello   world"), (3L, "HELLO-WORLD"),
      (4L, "goodbye world")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.exactCanonical(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "hello world", 3L), (4L, "goodbye world", 1L)))
  }

  // ---- dupSpanScrub (Lee et al. ExactSubstr, overlapping windows) ----

  private def scrubRows(df: org.apache.spark.sql.DataFrame, n: Int) =
    Dedup.dupSpanScrub(df, "doc_id", "text", n).orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)](
        org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long, String)])
      .collect().toSeq

  test("dupSpanScrub catches an UNALIGNED re-quote that chunk dedup cannot see") {
    import spark.implicits._
    val w = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, w),                        // 12 tokens, the original passage
      (2L, s"p1 p2 p3 $w q1")         // same passage at offset +3
    ).toDF("doc_id", "text")
    // chunk-aligned keep-first at k=8 is blind to the offset copy
    val chunked = Dedup.chunkDedupKeepFirst(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").select("n_dropped").as[Long].collect().toSeq
    assert(chunked === Seq(0L, 0L), "chunk dedup should miss the unaligned copy")
    // overlapping windows catch it: doc 2 loses exactly tokens [3, 15)
    val got = scrubRows(docs, 8)
    assert(got(0) === ((1L, 12L, 0L, 0L, w)))
    assert(got(1) === ((2L, 16L, 1L, 12L, "p1 p2 p3 q1")))
  }

  test("dupSpanScrub removes a self-repeat within one doc, keeping the first copy") {
    import spark.implicits._
    val run = (1 to 8).map(i => s"a$i").mkString(" ")
    val docs = Seq((7L, s"$run X $run")).toDF("doc_id", "text")
    val got = scrubRows(docs, 8)
    assert(got === Seq((7L, 17L, 1L, 8L, s"$run X")))
  }

  test("dupSpanScrub union-merges overlapping removal windows into one island") {
    import spark.implicits._
    val xs = (1 to 12).map(i => s"x$i")
    val docs = Seq(
      (1L, xs.take(8).mkString(" ")),          // x1..x8
      (2L, xs.drop(4).mkString(" ")),          // x5..x12
      (3L, xs.mkString(" "))                   // contains both windows, overlapping
    ).toDF("doc_id", "text")
    val got = scrubRows(docs, 8)
    // doc 3's removed windows [0,8) and [4,12) merge: whole doc removed
    assert(got(2) === ((3L, 12L, 1L, 12L, "")))
    // the first occurrences survive untouched
    assert(got(0)._4 === 0L && got(1)._4 === 0L)
  }

  test("dupSpanScrub merges TOUCHING islands (contiguous coverage, no gap)") {
    import spark.implicits._
    val ys = (1 to 16).map(i => s"y$i")
    val docs = Seq(
      (1L, ys.take(8).mkString(" ")),                  // y1..y8
      (2L, ys.drop(8).mkString(" ")),                  // y9..y16
      (3L, (ys :+ "tail").mkString(" "))               // y1..y16 tail
    ).toDF("doc_id", "text")
    val got = scrubRows(docs, 8)
    // spans [0,8) and [8,16) touch at 8: ONE island, 16 tokens removed
    assert(got(2) === ((3L, 17L, 1L, 16L, "tail")))
  }

  test("dupSpanScrub: duplicate-free corpus and short docs pass through whole") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "one two three"),                            // shorter than n=8
      (3L, "kappa lambda mu nu xi omicron pi rho sigma tau")
    ).toDF("doc_id", "text")
    val got = scrubRows(docs, 8)
    assert(got.map(_._3).sum === 0L && got.map(_._4).sum === 0L)
    assert(got(0)._5 === "alpha beta gamma delta epsilon zeta eta theta iota")
    assert(got(1) === ((2L, 3L, 0L, 0L, "one two three")))
  }

  test("dupSpanScrub matches a driver-side naive recomputation on a mixed corpus") {
    import spark.implicits._
    val n = 4
    val rnd = new scala.util.Random(42)
    val vocab = Vector("data", "spark", "row", "scan", "hash", "join", "sort")
    val base = (0 until 24).map { id =>
      (id.toLong, Vector.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // plant explicit cross-doc and offset copies on top of the random base
    val planted = base ++ Seq(
      (24L, base(3)._2),
      (25L, "pre " + base(5)._2 + " post"))
    val docs = planted.toDF("doc_id", "text")

    val naive = planted.map { case (id, text) =>
      val tk = text.trim.split("\\s+").toVector
      (id, tk)
    }
    val occs = for {
      (id, tk) <- naive
      p <- 0 to tk.length - n
    } yield (id, p, tk.slice(p, p + n).mkString(" "))
    val removedOccs = occs.groupBy(_._3).values.filter(_.size >= 2).flatMap { os =>
      os.sortBy(o => o._1 * (1L << 20) + o._2).tail
    }.toSeq
    val covByDoc = removedOccs.groupBy(_._1).map { case (id, rs) =>
      id -> rs.flatMap(r => r._2 until r._2 + n).toSet
    }
    val expected = naive.map { case (id, tk) =>
      val cov = covByDoc.getOrElse(id, Set.empty[Int])
      val sortedCov = cov.toSeq.sorted
      val islands = sortedCov.zipWithIndex.count { case (p, i) =>
        i == 0 || sortedCov(i - 1) != p - 1
      }
      (id, tk.length.toLong, islands.toLong, cov.size.toLong,
        tk.zipWithIndex.collect { case (t, i) if !cov(i) => t }.mkString(" "))
    }.sortBy(_._1)

    assert(scrubRows(docs, n) === expected)
  }

  // ---- dupSpanScrubInline (incremental gate vs a frozen index) ----

  test("dupSpanScrubInline removes reference passages; B-internal dups stay") {
    import spark.implicits._
    val w = (1 to 12).map(i => s"w$i").mkString(" ")
    val run8 = (1 to 8).map(i => s"r$i").mkString(" ")
    val refCorpus = Seq((1L, w)).toDF("doc_id", "text")
    val index = Dedup.dupSpanIndex(refCorpus, "text", n = 8)
    val incoming = Seq(
      (10L, w),                         // exact copy of the reference doc
      (11L, s"p1 p2 p3 $w q1"),         // reference passage at offset +3
      (12L, s"$run8 X $run8"),          // B-INTERNAL repeat, NOT in ref
      (13L, "u1 u2 u3 u4 u5 u6 u7 u8 u9") // clean
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanScrubInline(incoming, "doc_id", "text", 8, index)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got(0) === ((10L, 12L, 1L, 12L, "")))
    assert(got(1) === ((11L, 16L, 1L, 12L, "p1 p2 p3 q1")))
    // the inline gate's CONTRACT: it only knows the frozen reference —
    // duplication internal to the new data is dupSpanScrub's job
    assert(got(2) === ((12L, 17L, 0L, 0L, s"$run8 X $run8")))
    assert(got(3)._4 === 0L)
  }

  test("dupSpanScrubInline is row-local: no join, no exchange, no aggregate") {
    import spark.implicits._
    val index = Dedup.dupSpanIndex(
      Seq((1L, (1 to 8).map("a" + _).mkString(" "))).toDF("doc_id", "text"),
      "text", n = 8)
    val plan = Dedup.dupSpanScrubInline(
        Seq((2L, "b1 b2 b3 b4 b5 b6 b7 b8 b9")).toDF("doc_id", "text"),
        "doc_id", "text", 8, index)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange") &&
      !plan.contains("HashAggregate"), plan.take(2000))
  }

  test("dupSpanScrubInline fold agrees with the batch island arithmetic") {
    import spark.implicits._
    // reference owns two OVERLAPPING windows of doc 20 ([0,8) and [4,12))
    // and a TOUCHING pair in doc 21 ([0,8) and [8,16))
    val xs = (1 to 12).map(i => s"x$i")
    val ys = (1 to 16).map(i => s"y$i")
    val ref = Seq(
      (1L, xs.take(8).mkString(" ")), (2L, xs.drop(4).mkString(" ")),
      (3L, ys.take(8).mkString(" ")), (4L, ys.drop(8).mkString(" ")))
      .toDF("doc_id", "text")
    val index = Dedup.dupSpanIndex(ref, "text", n = 8)
    val got = Dedup.dupSpanScrubInline(
        Seq((20L, xs.mkString(" ")), (21L, (ys :+ "tail").mkString(" ")))
          .toDF("doc_id", "text"),
        "doc_id", "text", 8, index)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got(0) === ((20L, 12L, 1L, 12L, "")),
      "overlap [0,8)+[4,12) must union to ONE 12-token island")
    assert(got(1) === ((21L, 17L, 1L, 16L, "tail")),
      "touching [0,8)+[8,16) must merge to ONE 16-token island")
  }

  test("dupSpanIndex caps fail loud, sorted ascending") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 30).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val idx = Dedup.dupSpanIndex(docs, "text", n = 8)
    assert(idx.toSeq === idx.sorted.toSeq && idx.length === 23)
    val ex = intercept[IllegalArgumentException] {
      Dedup.dupSpanIndex(docs, "text", n = 8, maxGrams = 10)
    }
    assert(ex.getMessage.contains("distinct grams"), ex.getMessage)
  }

  test("dupSpanScrubInline asserts the binary-search contract: an " +
      "unsorted hand-built index fails loud, not silently wrong") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.dupSpanScrubInline(docs, "doc_id", "text", 8,
        Array(5L, 3L, 9L)) // descending pair — Arrays.binarySearch UB
    }
    assert(ex.getMessage.contains("ascending"), ex.getMessage)
    // duplicates violate STRICT ascent too (same UB class)
    val dup = intercept[IllegalArgumentException] {
      Dedup.dupSpanScrubInline(docs, "doc_id", "text", 8, Array(3L, 3L))
    }
    assert(dup.getMessage.contains("ascending"), dup.getMessage)
  }

  test("minhashCalibration guards: maxCandidates fails loud on a " +
      "band-join blow-up; sampleFraction bounds the input") {
    import spark.implicits._
    // 6 identical docs → C(6,2)=15 candidate pairs in every band
    val docs = (1L to 6L).map(i => (i, "the same text shingles everywhere"))
      .toDF("doc_id", "text")
    // the cap is on pair SLOTS (Σ C(bucket,2) with band multiplicity,
    // checked pre-join): 6 identical docs → 4 bands × C(6,2) = 60 slots
    val ex = intercept[IllegalArgumentException] {
      Dedup.minhashCalibration(docs, "doc_id", "text",
        maxCandidates = Some(10L))
    }
    assert(ex.getMessage.contains("maxCandidates") ||
      ex.getMessage.contains("band-join candidate"), ex.getMessage)
    // exactly at the slot count it runs (≤, not <); the full diagonal
    // slot (16,16+) dominates
    val ok = Dedup.minhashCalibration(docs, "doc_id", "text",
      maxCandidates = Some(60L)).collect()
    assert(ok.map(_.getLong(2)).sum === 15L)
    // sampling shrinks the input, so the guard sees fewer slots and the
    // histogram fewer pairs — C(m,2) ≤ 15 for the m ≤ 6 sampled docs
    val sampled = Dedup.minhashCalibration(docs, "doc_id", "text",
      sampleFraction = Some(0.5), maxCandidates = Some(60L), seed = 7L)
      .collect()
    assert(sampled.map(_.getLong(2)).sum <= 15L)
    val badF = intercept[IllegalArgumentException] {
      Dedup.minhashCalibration(docs, "doc_id", "text",
        sampleFraction = Some(1.5))
    }
    assert(badF.getMessage.contains("sampleFraction"), badF.getMessage)
    // null-text docs are NOT phantoms: their empty shingle sets yield
    // identical (all-null-slot) signatures, so they share every band
    // key and genuinely collide in the band join — the guard must count
    // that work. 5 nulls + 2 identical docs = 4·(C(5,2)+C(2,2)) = 44
    // slots: a cap of 8 trips on real work, a cap of 44 runs and the
    // histogram carries C(5,2)+1 = 11 pairs
    val withNulls = (Seq((10L, "same near dup text"),
        (11L, "same near dup text")) ++
      (1L to 5L).map(i => (i, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    val trip = intercept[IllegalArgumentException] {
      Dedup.minhashCalibration(withNulls, "doc_id", "text",
        maxCandidates = Some(8L))
    }
    assert(trip.getMessage.contains("44"), trip.getMessage)
    val hist = Dedup.minhashCalibration(withNulls, "doc_id", "text",
      maxCandidates = Some(44L)).collect()
    assert(hist.map(_.getLong(2)).sum === 11L)
  }

  // ---- maximalDupSpans (Lee et al. 2022 true ExactSubstr policy) ----

  /** tokens "w<a>".."w<b>" joined — distinct synthetic token streams. */
  private def ws(prefix: String, a: Int, b: Int): String =
    (a until b).map(prefix + _).mkString(" ")

  test("maximalDupSpans: true boundaries where fixed-n islands merge — " +
      "two overlapping matches with DIFFERENT witnesses stay two spans") {
    import spark.implicits._
    // doc1[0,30) == doc2's payload; doc1[20,50) == doc3's payload; the
    // overlap [20,30) belongs to both, but doc1[0,50) occurs nowhere
    // else. Fixed-n dupSpanScrub merges the coverage into one island
    // [0,50); the maximal-match policy must report TWO spans with the
    // true boundaries.
    val shared1 = ws("a", 0, 30)                    // 30 tokens
    val tail    = ws("a", 20, 50)                   // doc1[20,50)
    val doc1 = shared1 + " " + ws("a", 30, 50)      // a0..a49
    val docs = Seq(
      (1L, doc1),
      (2L, ws("x", 0, 7) + " " + shared1 + " " + ws("y", 0, 7)),
      (3L, ws("z", 0, 7) + " " + tail + " " + ws("q", 0, 7)))
      .toDF("doc_id", "text")
    val got = Dedup.maximalDupSpans(docs, "doc_id", "text", minLen = 8)
      .orderBy("doc_id", "s")
      .select("doc_id", "s", "e", "len")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.filter(_._1 == 1L) === Seq((1L, 0L, 30L, 30L),
      (1L, 20L, 50L, 30L)), got.mkString(", "))
    // witnesses report their mirrored spans too (policy removes
    // non-first occurrences downstream; the span table reports all)
    assert(got.filter(_._1 == 2L) === Seq((2L, 7L, 37L, 30L)))
    assert(got.filter(_._1 == 3L) === Seq((3L, 7L, 37L, 30L)))
  }

  test("maximalDupSpans: span coverage union == dupSpanScrub's island " +
      "union, and every fixed-n removed window lies inside a span") {
    import spark.implicits._
    // mixed corpus: a 3-way repeat, a 50-token 2-way repeat, unique noise
    val big = ws("b", 0, 50)
    val tri = ws("t", 0, 12)
    val docs = Seq(
      (1L, big + " " + ws("u", 0, 20)),
      (2L, ws("v", 0, 9) + " " + big),
      (3L, tri + " " + ws("w", 0, 15) + " " + tri),
      (4L, tri + " " + ws("k", 0, 25)))
      .toDF("doc_id", "text")
    val spans = Dedup.maximalDupSpans(docs, "doc_id", "text", minLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def covered(id: Long, p: Long): Boolean =
      spans.exists(s => s._1 == id && p >= s._2 && p < s._3)
    // fixed-n scrub on the same corpus: removed windows = non-first
    // occurrences of duplicated 8-grams; each must be span-covered
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.wsTokens(col("text")).as("toks"))
    val grams = toks.select(col("doc_id"),
      posexplode(expr("transform(sequence(0, size(toks) - 8), " +
        "i -> concat_ws(' ', slice(toks, i + 1, 8)))")).as(Seq("pos", "gram")))
    val dupPos = grams.as("g").join(
        grams.groupBy("gram").count().where(col("count") >= 2), Seq("gram"))
      .select(col("doc_id"), col("pos")).as[(Long, Int)].collect()
    assert(dupPos.nonEmpty, "fixture must exercise duplication")
    dupPos.foreach { case (id, pos) =>
      (pos until pos + 8).foreach { p =>
        assert(covered(id, p.toLong),
          s"dup 8-window token (doc $id, pos $p) not covered by any span")
      }
    }
    // and nothing outside the window union is covered (exact identity)
    val winCov = dupPos.flatMap { case (id, pos) =>
      (pos until pos + 8).map(p => (id, p.toLong)) }.toSet
    spans.foreach { case (id, s, e) =>
      (s until e).foreach { p =>
        assert(winCov.contains((id, p)),
          s"span token (doc $id, pos $p) outside the dup-window union")
      }
    }
  }

  test("maximalDupSpans maxSpan cap: a long duplicate degrades to capped " +
      "spans with identical coverage, never lost tokens") {
    import spark.implicits._
    val long = ws("m", 0, 40)
    val docs = Seq((1L, long), (2L, long)).toDF("doc_id", "text")
    val full = Dedup.maximalDupSpans(docs, "doc_id", "text", minLen = 8)
      .where(col("doc_id") === 1).orderBy("s")
      .select("s", "e", "len").as[(Long, Long, Long)].collect().toSeq
    assert(full === Seq((0L, 40L, 40L)), full.mkString(", "))
    val capped = Dedup.maximalDupSpans(docs, "doc_id", "text", minLen = 8,
        maxSpan = 16)
      .where(col("doc_id") === 1).orderBy("s")
      .select("s", "e", "len").as[(Long, Long, Long)].collect().toSeq
    // every r caps at 16 -> every seed is "left-maximal": overlapping
    // 16-token spans, coverage [0, 40) intact
    assert(capped.forall(_._3 <= 16L))
    val cov = capped.flatMap(s => s._1 until s._2).toSet
    assert(cov === (0L until 40L).toSet)
  }

  test("maximalDupSpans maxGramFreq cap: boilerplate-witnessed spans drop, " +
      "genuine low-frequency duplicates survive untouched") {
    import spark.implicits._
    // one 8-token boilerplate phrase in 6 docs (its single 8-gram has
    // cnt=6) + a genuine 12-token 2-way duplicate (every gram cnt=2)
    val hot = ws("h", 0, 8)
    val pair = ws("p", 0, 12)
    val docs = ((1 to 6).map(i => (i.toLong, ws(s"n$i", 0, 10) + " " + hot)) ++
      Seq((7L, pair + " " + ws("s", 0, 10)), (8L, ws("r", 0, 10) + " " + pair)))
      .toDF("doc_id", "text")
    val un = Dedup.maximalDupSpans(docs, "doc_id", "text", minLen = 8)
      .select("doc_id", "s", "e").as[(Long, Long, Long)].collect().toSeq
    assert(un.count(_._1 <= 6L) === 6, un.mkString(", "))  // hot spans present
    val capped = Dedup.maximalDupSpans(docs, "doc_id", "text", minLen = 8,
        maxGramFreq = Some(4L))
      .select("doc_id", "s", "e").as[(Long, Long, Long)].collect().toSeq
    assert(capped.forall(_._1 >= 7L), capped.mkString(", ")) // hot spans gone
    // the genuine duplicate's spans are IDENTICAL to the uncapped run
    assert(capped.toSet === un.filter(_._1 >= 7L).toSet)
    assert(capped.toSet === Set((7L, 0L, 12L), (8L, 10L, 22L)))
    intercept[IllegalArgumentException] {
      Dedup.maximalDupSpans(docs, "doc_id", "text", minLen = 8,
        maxGramFreq = Some(1L))
    }
  }

  // ---- lineDedup (RefinedWeb boilerplate-line scrub) ----

  test("lineDedup: cross-doc boilerplate lines removed everywhere, " +
      "case-normalized keys match, unique and blank lines survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha body one\nSubscribe to our newsletter\nunique tail 1"),
      (2L, "beta body two\nsubscribe TO OUR newsletter\n\nunique tail 2"),
      (3L, "gamma\n\ngamma second paragraph"),
      (4L, "Subscribe to our newsletter"), // fully-boilerplate doc
      (5L, "delta\nrepeat me\nrepeat me")) // within-doc repeat: KEPT
      .toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 1L, "alpha body one\nunique tail 1"),
      (2L, 4L, 1L, "beta body two\n\nunique tail 2"), // blank line survives
      (3L, 3L, 0L, "gamma\n\ngamma second paragraph"),
      (4L, 1L, 1L, ""),                               // empty, not vanished
      (5L, 3L, 0L, "delta\nrepeat me\nrepeat me")),   // within-doc untouched
      got.mkString("; "))
    // minDocs raised past the hottest line -> nothing removed
    val loose = Dedup.lineDedup(docs, "doc_id", "text", minDocs = 4)
      .agg(sum("removed_lines")).collect()(0).getLong(0)
    assert(loose === 0L)
    intercept[IllegalArgumentException] {
      Dedup.lineDedup(docs, "doc_id", "text", minDocs = 1)
    }
  }

  test("lineDedupIndex + lineDedupInline: frozen-index line gate — " +
      "reference boilerplate cut row-locally, new-batch-internal dups kept") {
    import spark.implicits._
    val ref = Seq(
      (1L, "body a\nSubscribe to our newsletter"),
      (2L, "body b\nsubscribe TO OUR newsletter"), // same normalized key
      (3L, "body c\nonly once here"))              // dfreq 1 -> NOT hot
      .toDF("doc_id", "text")
    val index = Dedup.lineDedupIndex(ref, "doc_id", "text")
    assert(index.length === 1, index.mkString(", ")) // just the newsletter
    val incoming = Seq(
      (10L, "new body\nSUBSCRIBE to our NEWSLETTER\ntail"),
      (11L, "Subscribe to our newsletter"),  // fully boilerplate -> empty
      (12L, "batch dup\nclean"),
      (13L, "batch dup\nclean2"),            // new-internal dup: KEPT
      (14L, "only once here"))               // non-hot ref line: KEPT
      .toDF("doc_id", "text")
    val got = Dedup.lineDedupInline(incoming, "doc_id", "text", index)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (10L, 3L, 1L, "new body\ntail"),
      (11L, 1L, 1L, ""),
      (12L, 2L, 0L, "batch dup\nclean"),
      (13L, 2L, 0L, "batch dup\nclean2"),
      (14L, 1L, 0L, "only once here")), got.mkString("; "))
    // row-local: the inline gate's plan has no join/aggregate/exchange
    val plan = Dedup.lineDedupInline(incoming, "doc_id", "text", index)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange") &&
      !plan.contains("Aggregate"), plan.take(2000))
    // artifact round-trip: minDocs rides inside, hashes bit-identical
    val tmp = java.nio.file.Files.createTempDirectory("graft-lineidx-").toString
    Dedup.saveLineIndex(spark, tmp, minDocs = 2, index)
    val (md, lform, loaded) = Dedup.loadLineIndex(spark, tmp)
    assert(md === 2 && lform === "byte" && loaded.toSeq === index.toSeq)
    assertThrows[Exception] {
      Dedup.loadSpanIndex(spark, tmp) // wrong family: no span_index.bin here
    }
  }

  test("loadLineIndex assumeForm (r15): cross-checks the sidecar, fails " +
      "loud on disagreement, and resolves a sidecar-less pre-r14 artifact") {
    val lines = Seq((1L, "shared line\na"), (2L, "shared line\nb"))
      .toDF("doc_id", "text")
    val index = Dedup.lineDedupIndex(lines, "doc_id", "text", minDocs = 2,
      keyForm = "folded")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-lineform-")
    Dedup.saveLineIndex(spark, tmp.toString, minDocs = 2, index,
      keyForm = "folded")
    // sidecar present: agreeing assertion is a no-op, disagreement fails
    val (_, f1, _) = Dedup.loadLineIndex(spark, tmp.toString,
      assumeForm = Some("folded"))
    assert(f1 === "folded")
    val ex = intercept[IllegalArgumentException] {
      Dedup.loadLineIndex(spark, tmp.toString, assumeForm = Some("byte"))
    }
    assert(ex.getMessage.contains("asserted"), ex.getMessage)
    // sidecar-less (pre-r14): absence does NOT determine a LINE index's
    // form (the builder accepted keyForm before the sidecar existed) —
    // the caller's assertion wins; no assertion falls back to "byte"
    java.nio.file.Files.delete(tmp.resolve("index_meta.json"))
    java.nio.file.Files.setLastModifiedTime(tmp.resolve("_SUCCESS"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 2000))
    val (_, f2, a2) = Dedup.loadLineIndex(spark, tmp.toString,
      assumeForm = Some("folded"))
    assert(f2 === "folded" && a2.toSeq === index.toSeq)
    // bust the mtime cache again so the no-assertion load re-reads
    java.nio.file.Files.setLastModifiedTime(tmp.resolve("_SUCCESS"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 4000))
    val (_, f3, _) = Dedup.loadLineIndex(spark, tmp.toString)
    assert(f3 === "byte")
  }

  test("semanticDedup keeps the LEAST-centroid-similar member of each dup group") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(10f, 0f)),     // cell 100, cent_sim 1.0
      (2L, Seq(10f, 0.5f)),   // cell 100, near-dup of 1, slightly off-axis
      (3L, Seq(9.9f, 0.7f)),  // cell 100, near-dup, FARTHEST from centroid
      (4L, Seq(0f, 7f)),      // cell 101, singleton
      (5L, Seq(-7f, 0.1f))    // cell 101, orthogonal-ish singleton
    ).toDF("vec_id", "embedding")
    val cents = Seq((100L, Seq(1f, 0f)), (101L, Seq(0f, 1f)))
      .toDF("cid", "ce")
    val got = Dedup.semanticDedup(vecs, "vec_id", "embedding", cents, tau = 0.9)
      .orderBy("vec_id")
      .select("vec_id", "cid", "comp", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 100L, 1L, false),   // highest cent_sim of the {1,2,3} group
      (2L, 100L, 1L, false),
      (3L, 100L, 1L, true),    // the outlier representative survives
      (4L, 101L, 4L, true),
      (5L, 101L, 5L, true)))
  }

  test("semanticDedup: exact-duplicate vectors tie-break to the smallest id") {
    import spark.implicits._
    val vecs = Seq(
      (6L, Seq(0f, 5f)), (7L, Seq(0f, 5f)), (8L, Seq(3f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("cid", "ce")
    val got = Dedup.semanticDedup(vecs, "vec_id", "embedding", cents, tau = 0.99)
      .orderBy("vec_id")
      .select("vec_id", "comp", "keep")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got === Seq((6L, 6L, true), (7L, 6L, false), (8L, 8L, true)))
  }

  test("semanticDedup runs on TRAINED centroids (the q35 KMeans path)") {
    import spark.implicits._
    val emb = graft.core.Tables.embeddings(spark, sf0001).limit(200)
    val cents = graft.operators.SimilaritySearch
      .trainCentroids(emb, "embedding", k = 4)
    val rows = Dedup.semanticDedup(emb, "vec_id", "embedding", cents,
        tau = 0.4)
      .select("vec_id", "comp", "keep")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(rows.length === 200, "every input vector is reported")
    rows.groupBy(_._2).foreach { case (compId, members) =>
      assert(members.count(_._3) === 1,
        s"component $compId must keep exactly one of ${members.map(_._1)}")
    }
  }

  test("semanticDedup keeps exactly one representative per duplicate group") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map { i =>
      val base = Array.fill(4)(rnd.nextFloat() * 2 - 1)
      (i, base.map(x => (x + rnd.nextFloat() * 0.05f)).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f, 0f))).toDF("cid", "ce")
    val rows = Dedup.semanticDedup(vecs, "vec_id", "embedding", cents, tau = 0.8)
      .select("vec_id", "comp", "keep")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(rows.map(_._1).sorted === (0L until 40L))
    rows.groupBy(_._2).foreach { case (compId, members) =>
      assert(members.count(_._3) === 1,
        s"component $compId must keep exactly one of ${members.map(_._1)}")
    }
  }

  test("cdcChunkDedup: boundaries resynchronize across unaligned offsets " +
      "(the fixed-k blind spot)") {
    // the same 24-token passage after prefixes of DIFFERENT lengths (5
    // vs 11 tokens — offsets differ by 6, NOT a multiple of k=4, so
    // fixed-k chunk boundaries never line up; CDC's resynchronize)
    val passage = (0 until 24).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (0L, "u0 u1 u2 u3 u4 " + passage + " t0end"),
      (1L, "v0 v1 v2 v3 v4 v5 v6 v7 v8 v9 v10 " + passage + " t1end"))
      .toDF("id", "text")
    val cdc = Dedup.cdcChunkDedup(docs, "id", "text", w = 3, divisor = 4)
      .select("id", "n_dropped", "clean_text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // CDC scrubs the shared interior from BOTH docs...
    assert(cdc.forall(_._2 >= 1), s"cdc dropped nothing: ${cdc.toSeq}")
    // ...and never touches the unique prefixes/tails
    assert(cdc(0)._3.startsWith("u0 u1 u2 u3 u4") && cdc(0)._3.endsWith("t0end"))
    assert(cdc(1)._3.startsWith("v0 v1") && cdc(1)._3.endsWith("t1end"))
    // the resynchronized interior is gone from both: no shared token
    // survives in one doc but not the other
    val surv0 = cdc(0)._3.split(" ").filter(_.startsWith("p")).toSet
    val surv1 = cdc(1)._3.split(" ").filter(_.startsWith("p")).toSet
    assert(surv0 === surv1, "interior survivors must agree across offsets")
    assert(surv0.size < 24, "some interior chunks must be scrubbed")
    // fixed-k chunking at the same granularity sees NO duplication:
    // every 4-token chunk straddles different passage offsets
    val fixed = Dedup.chunkDedup(docs, "id", "text", k = 4)
      .select("n_dropped").as[Long].collect()
    assert(fixed.forall(_ === 0L),
      "fixed-k chunking must be blind to the unaligned duplicate")
  }

  test("cdcChunkDedup: a one-token insertion perturbs only its chunk") {
    val base = (0 until 40).map(i => s"w$i").mkString(" ")
    val edited = (0 until 40).map(i => s"w$i").patch(20, Seq("INS"), 0)
      .mkString(" ")
    def chunksOf(text: String): Seq[String] = {
      // divisor=1 never cuts mid-stream... use the operator's own cut
      // logic by deduping a single doc against itself: maxDocFreq high
      // so nothing drops, then chunk count via n_chunks
      val df = Seq((0L, text)).toDF("id", "text")
      Dedup.cdcChunkDedup(df, "id", "text", w = 3, divisor = 4,
          maxDocFreq = 99).select("clean_text").as[String].head()
        .split(" ").toSeq
      // clean_text == original text when nothing drops
    }
    assert(chunksOf(base).mkString(" ") === base)
    // cross-doc: base and edited share everything but INS's chunk —
    // dedup drops the shared chunks from both (delete-everywhere), and
    // what SURVIVES in the edited doc is a bounded neighborhood of INS
    val docs = Seq((0L, base), (1L, edited)).toDF("id", "text")
    val out = Dedup.cdcChunkDedup(docs, "id", "text", w = 3, divisor = 4)
      .select("id", "n_chunks", "n_dropped", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val survivors = out(1)._4.split(" ").filterNot(_ == "INS")
    assert(survivors.length <= 12,
      s"insertion must perturb O(1) chunks, got ${survivors.length} " +
        s"surviving neighbors: ${out(1)._4}")
    // most chunks of the base doc were shared and dropped
    assert(out(0)._3 >= out(0)._2 - 3,
      s"base doc must lose all but the boundary chunks: ${out(0)}")
  }

  test("minhashRetune: tightest recall-feasible geometry; candidate load " +
      "monotone non-increasing in the target; budget and recall fail loud") {
    import spark.implicits._
    // synthetic calibration histogram under the default 16-hash, 4-band
    // geometry: heavy low-similarity mass (random band collisions — the
    // measured 10× blow-up shape), a mid bump, a thin true-dup tail
    val calib = Seq(
      (2L, 1L, 100000L), (6L, 8L, 500L), (15L, 15L, 50L))
      .toDF("est_matches", "jac_bucket", "n_pairs")
    def tune(t: Double, budget: Long = Long.MaxValue / 4) =
      Dedup.minhashRetune(calib, numHashes = 16, curBands = 4,
        targetJaccard = t, candidateBudget = budget)
    // at target 0.5 the 4×4 S-curve has recall 0.23 — infeasible; 8
    // bands × r=2 reaches 0.90 and is tighter than 16×1
    val g05 = tune(0.5)
    assert(g05.bands === 8 && g05.rowsPerBand === 2, g05.toString)
    assert(g05.recallPpm >= 800000L)
    // at target 0.9, 4×4 is feasible (recall 0.986) and MUCH tighter
    val g09 = tune(0.9)
    assert(g09.bands === 4 && g09.rowsPerBand === 4, g09.toString)
    // raising the target only tightens: candidate load non-increasing
    val loads = Seq(0.3, 0.5, 0.7, 0.9, 0.95).map(tune(_).expectedCandidates)
    assert(loads.sliding(2).forall(p => p(0) >= p(1)),
      s"candidate load must be monotone non-increasing in target: $loads")
    // budget respected: an impossible budget fails loud, not silently over
    val exB = intercept[IllegalArgumentException] { tune(0.9, budget = 1L) }
    assert(exB.getMessage.contains("candidateBudget"), exB.getMessage)
    // recall infeasible at this signature size fails loud
    val exR = intercept[IllegalArgumentException] {
      Dedup.minhashRetune(calib, 16, 4, targetJaccard = 0.05,
        candidateBudget = Long.MaxValue / 4, minRecall = 0.999)
    }
    assert(exR.getMessage.contains("more hashes"), exR.getMessage)
  }

  test("minhashPairsRetuned: auto-tuned pass still finds the planted " +
      "near-dups and reports its geometry") {
    import spark.implicits._
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    val docs = ((1L, base) +: (2L, base) +: // exact dup pair
      (3L to 40L).map(i => (i, (0 until 60).map(j => s"u${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    val (pairs, g) = Dedup.minhashPairsRetuned(docs, "doc_id", "text",
      targetJaccard = 0.9, candidateBudget = 1000000L,
      sampleFraction = 1.0)
    assert(g.bands * g.rowsPerBand === 16, g.toString)
    assert(g.expectedCandidates <= 1000000L)
    val got = pairs.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) === 1.0,
      s"exact dup must survive any geometry: $got")
  }

  test("minhashPairsRetuned survives sub-shingleN docs: two empty shingle " +
      "sets band-join as a degenerate 0-div-0 pair — top-bucketed, never " +
      "a null histogram row (ADVICE r11 NPE)") {
    import spark.implicits._
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    // 'ab' / 'cd': shorter than shingleN = 5 chars -> EMPTY shingle
    // sets; their all-null signatures share every band key, so the
    // calibration counts the (degenerate) candidate pair
    val docs = ((1L, base) +: (2L, base) +: (90L, "ab") +: (91L, "cd") +:
      (3L to 30L).map(i => (i, (0 until 60).map(j => s"v${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    val (pairs, g) = Dedup.minhashPairsRetuned(docs, "doc_id", "text",
      targetJaccard = 0.9, candidateBudget = 1000000L,
      sampleFraction = 1.0)
    assert(g.bands * g.rowsPerBand === 16, g.toString)
    val got = pairs.collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(got.contains((1L, 2L)), s"planted dup lost: $got")
    // and the calibration table itself carries the degenerate pair in
    // the TOP bucket, not a null row
    val calib = Dedup.minhashCalibration(docs, "doc_id", "text")
    val buckets = calib.select("jac_bucket").collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0L && b <= 16L))
    assert(buckets.contains(16L), // the empty-pair mass
      s"degenerate pair must land in the top bucket: ${buckets.toSeq}")
  }

  test("cdcChunkIndex + cdcChunkDedupInline: frozen gate == batch verdicts " +
      "across the corpus boundary; batch-internal dups survive; artifact " +
      "round-trips with its geometry") {
    val passage = (0 until 24).map(i => s"p$i").mkString(" ")
    val newOnly = (0 until 18).map(i => s"q$i").mkString(" ")
    // reference corpus: the passage recurs at unaligned offsets -> its
    // interior chunks are hot
    val ref = Seq(
      (0L, "u0 u1 u2 u3 u4 " + passage + " t0end"),
      (1L, "v0 v1 v2 v3 v4 v5 v6 v7 v8 v9 v10 " + passage + " t1end"))
      .toDF("id", "text")
    val index = Dedup.cdcChunkIndex(ref, "id", "text", w = 3, divisor = 4)
    assert(index.nonEmpty)
    assert(index.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "index must be strictly ascending")
    // new batch: doc 10 repeats the reference passage at yet another
    // offset (gated out); docs 11+12 share a NEW-batch-only passage
    // (NOT in the frozen index -> survives: the B-internal contract)
    val fresh = Seq(
      (10L, "x0 x1 x2 " + passage + " t10end"),
      (11L, "y0 " + newOnly + " t11end"),
      (12L, "z0 z1 z2 z3 " + newOnly + " t12end"))
      .toDF("id", "text")
    val out = Dedup.cdcChunkDedupInline(fresh, "id", "text",
        w = 3, divisor = 4, index)
      .select("id", "n_chunks", "n_dropped", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // doc 10: reference passage interior scrubbed, unique edges survive
    assert(out(0)._3 >= 1, s"doc 10 must lose hot chunks: ${out(0)}")
    assert(out(0)._4.startsWith("x0") && out(0)._4.endsWith("t10end"))
    assert(!out(0)._4.split(" ").toSet.equals(
      ("x0 x1 x2 " + passage + " t10end").split(" ").toSet))
    // docs 11/12: zero drops — their shared passage is batch-internal
    assert(out(1)._3 === 0L && out(2)._3 === 0L,
      s"batch-internal dups must survive the frozen gate: ${out.toSeq}")
    assert(out(1)._4 === "y0 " + newOnly + " t11end")
    // the inline verdicts agree with the batch operator run over the
    // UNION for the cross-boundary doc: same surviving token set
    val union = Dedup.cdcChunkDedup(ref.union(fresh), "id", "text",
        w = 3, divisor = 4)
      .where(col("id") === 10L).select("clean_text").as[String].head()
    assert(out(0)._4.split(" ").toSet === union.split(" ").toSet,
      "inline gate and unioned batch pass must agree on doc 10")
    // artifact round-trip: the (w, divisor, kernel) geometry rides inside
    val tmp = java.nio.file.Files.createTempDirectory("graft-cdcidx-").toString
    Dedup.saveCdcChunkIndex(spark, tmp, w = 3, divisor = 4, index)
    val (w2, d2, k2, f2, idx2) = Dedup.loadCdcChunkIndex(spark, tmp)
    assert(w2 === 3 && d2 === 4 && k2 === "md5" && f2 === "raw" &&
      idx2.toSeq === index.toSeq)
    // gear-kernel end to end: index, persist, load, gate — the kernel
    // travels with the artifact so the probe can never mismatch the cuts
    val gearIdx = Dedup.cdcChunkIndex(ref, "id", "text", w = 3,
      divisor = 4, kernel = "gear")
    val tmpG = java.nio.file.Files.createTempDirectory("graft-cdcidxg-").toString
    Dedup.saveCdcChunkIndex(spark, tmpG, w = 3, divisor = 4, gearIdx,
      kernel = "gear")
    val (wg, dg, kg, fg, idxG) = Dedup.loadCdcChunkIndex(spark, tmpG)
    assert(wg === 3 && dg === 4 && kg === "gear" && fg === "raw" &&
      idxG.toSeq === gearIdx.toSeq)
    val gearOut = Dedup.cdcChunkDedupInline(fresh, "id", "text",
        wg, dg, idxG, kernel = kg)
      .select("id", "n_dropped").as[(Long, Long)].collect().sortBy(_._1)
    assert(gearOut(0)._2 >= 1,
      s"gear gate must scrub the reference passage: ${gearOut.toSeq}")
    assert(gearOut(1)._2 === 0L && gearOut(2)._2 === 0L)
  }
}
