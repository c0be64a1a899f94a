package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard against the object-init-order trap that has now fired twice
  * (q148 round 7; q173/q175/q177 round 10): a Scala `val` constant
  * declared after `val all` in a queries object is still 0/null while
  * the oracle SQL strings interpolate it, so the DRIVER's DuckDB oracle
  * is degenerate (`// 0`, `* 0`, `null`) even though the engine and the
  * intended oracle are both correct.
  *
  * This spec lints the RENDERED `SparkEntry.oracleSql` strings — the
  * exact bytes the driver will hand to DuckDB — for the degenerate
  * interpolations that trap produces. It runs without a SparkSession,
  * so it is cheap enough to never skip.
  */
class OracleLintSpec extends AnyFunSuite {

  // Division / modulo / multiplication by a bare literal 0 (not 0.4,
  // 0x.., 01): `w // 0`, `x / 0`, `y % 0`, `* 0)`. An intentional
  // `* 0` in an oracle would be pointless anyway — write the folded
  // constant instead.
  private val zeroArith = """(//|/|%|\*)\s*0(?![0-9.xX])""".r

  // A bare `null` token outside the legit SQL forms (IS [NOT] NULL,
  // NULLS FIRST/LAST, NULLIF/IFNULL, typed `CAST(NULL AS t)`). A null
  // Scala reference interpolates as the 4 chars `null`, which in SQL
  // position becomes the literal NULL — silently nulling a column.
  private val bareNull = """(?i)(?<![a-z_])null(?![a-z_(])""".r
  private val legitNullCtx =
    ("""(?i)(is\s+(not\s+)?null|nulls\s+(first|last)|null\s*::""" +
      """|(null)?if\s*\(\s*null|cast\s*\(\s*null\s+as\s+\w+)""").r

  // `CAST(0 AS BIGINT) AS col` — a zeroed interpolated constant emitted
  // directly as an output column, the exact q177 failure shape. The
  // trailing `AS <alias>` requirement keeps legit zero casts (coalesce
  // defaults, reduce seeds, `= CAST(0 AS DOUBLE)` comparisons) clean.
  private val zeroCast = """(?i)CAST\s*\(\s*0\s+AS\s+\w+\s*\)\s+AS\s""".r

  // Hand-written literal zero output columns, reviewed legit (the funnel
  // family's `CAST(0 AS INT) AS step` entry anchor). Anything new lands
  // here only after a human confirms the zero is written in the source,
  // not interpolated.
  private val allowZeroCast = Set(
    "q137_funnel", "q140_funnel_windowed", "q143_funnel_exists")

  private def violations(sql: String, skipZeroCast: Boolean = false)
      : Seq[String] = {
    // Mask the legit NULL contexts, then scan.
    val masked = legitNullCtx.replaceAllIn(sql, m => "_" * m.matched.length)
    val hits = Seq.newBuilder[String]
    zeroArith.findAllMatchIn(masked).foreach { m =>
      hits += s"arith-by-zero `${snippet(masked, m.start)}`"
    }
    bareNull.findAllMatchIn(masked).foreach { m =>
      hits += s"bare-null `${snippet(masked, m.start)}`"
    }
    if (!skipZeroCast) zeroCast.findAllMatchIn(masked).foreach { m =>
      hits += s"zero-cast `${snippet(masked, m.start)}`"
    }
    hits.result()
  }

  private def snippet(s: String, at: Int): String =
    s.slice(math.max(0, at - 25), math.min(s.length, at + 25))
      .replaceAll("\\s+", " ")

  test("no rendered oracle SQL contains degenerate interpolations") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val v = violations(sql, skipZeroCast = allowZeroCast(name))
        if (v.isEmpty) Nil else Seq(s"$name: ${v.mkString("; ")}")
    }
    assert(bad.isEmpty,
      s"\nDegenerate oracle SQL (init-order trap? see SelectionQueries" +
        s".DoremiP scaladoc):\n  ${bad.mkString("\n  ")}")
  }

  test("lint catches the round-10 DoremiP failure shape") {
    // The exact degenerate fragments the P=0 bug emitted.
    assert(violations("(w * (0 + exn - s // 0)) // 0 AS w").nonEmpty)
    assert(violations("CAST(0 AS BIGINT) AS w").nonEmpty)
    assert(violations("SELECT null AS w FROM t").nonEmpty)
    // And does NOT flag legit SQL.
    assert(violations("WHERE x IS NOT NULL ORDER BY y NULLS LAST").isEmpty)
    assert(violations("SELECT x * 0.4, y % 100, z // 7 FROM t").isEmpty)
    assert(violations("SELECT CAST(0.5 AS DOUBLE), CAST(x AS BIGINT)").isEmpty)
    assert(violations("coalesce(t.cnt, CAST(0 AS BIGINT)) AS top2").isEmpty)
    assert(violations("SELECT CAST(NULL AS BIGINT) AS u FROM t").isEmpty)
    assert(violations("list_prepend(CAST(0 AS BIGINT), xs)").isEmpty)
    assert(violations("CASE WHEN nrm = CAST(0 AS DOUBLE) THEN 1 END").isEmpty)
  }
}
