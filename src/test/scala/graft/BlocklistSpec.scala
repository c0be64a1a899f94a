package graft

import org.apache.spark.sql.functions._

import graft.functions.expressions.{AhoCorasick, BlocklistMatches}

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  test("automaton == naive contains on seeded random texts and patterns") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abc"
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (trial <- 1 to 5) {
      val patterns = (0 until 12).map(_ => randStr(1 + rnd.nextInt(4)))
        .distinct
      val ac = AhoCorasick.compile(patterns)
      (0 until 50).foreach { _ =>
        val text = randStr(rnd.nextInt(40))
        val want = patterns.count(text.contains)
        assert(ac.countDistinct(text) == want,
          s"trial $trial text='$text' patterns=$patterns")
      }
    }
  }

  test("overlapping, nested and suffix patterns all surface") {
    val ac = AhoCorasick.compile(Seq("ab", "abc", "bc", "c", "abcd"))
    assert(ac.countDistinct("abc") == 4)   // ab, abc, bc, c
    assert(ac.countDistinct("abcd") == 5)
    assert(ac.countDistinct("xyz") == 0)
    assert(ac.countDistinct("") == 0)
    // fail-chain inheritance: pattern ending inside another's match
    val ac2 = AhoCorasick.compile(Seq("she", "he", "hers"))
    assert(ac2.countDistinct("shers") == 3)
  }

  test("expression: distinct-count column, null-safe, codegen row-local") {
    val df = Seq(
      (1L, "the slow red fox"), (2L, "clean text"),
      (3L, "slow slow slow"), (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val bl = Seq("slow", "red fox")
    val got = df.select(col("id"),
        BlocklistMatches.column(col("text"), bl).as("hits"))
      .orderBy("id").as[(Long, Int)].collect().toSeq
    // distinct patterns, not occurrences: doc 3 counts 1
    assert(got === Seq((1L, 2), (2L, 0), (3L, 1), (4L, 0)))
    val plan = df.select(BlocklistMatches.column(col("text"), bl))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("compile rejects empty and duplicate patterns") {
    intercept[IllegalArgumentException] {
      BlocklistMatches.column(lit("x"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      BlocklistMatches.column(lit("x"), Seq("a", ""))
    }
    intercept[IllegalArgumentException] {
      BlocklistMatches.column(lit("x"), Seq("a", "a"))
    }
  }
}
