package graft.operators

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets

import graft.functions.expressions.PslRules

/** Loader for the Mozilla Public Suffix List — the versioned artifact
  * behind [[Web.registeredDomain]]'s documented swap seam (VERDICT r11
  * #4). The list itself is PUBLIC data (publicsuffix.org, MPL 2.0 —
  * the file's own header carries the license); it ships as the
  * classpath resource `public_suffix_list.dat`, pinned by copying, so
  * the eTLD+1 decision is reproducible per build rather than whatever
  * the host OS happens to have installed.
  *
  * Format (https://publicsuffix.org/list/): one rule per line; `//`
  * comments and blank lines skipped; a rule is read up to the first
  * whitespace; `!` marks an exception rule, `*.` a wildcard rule.
  * BOTH the ICANN and PRIVATE sections load — a per-domain cap wants
  * `user.github.io`-class boundaries exactly as much as `co.uk`.
  *
  * IDN rules are stored in the list in UNICODE form (`公司.cn` — the
  * file carries no `xn--` duplicates for them), but the host a crawl
  * pipeline probes is normally the POST-URL Punycode form
  * (`a.xn--55qx5d.cn`), which would otherwise never match and fall to
  * the implicit `*` rule — collapsing an entire IDN suffix space into
  * one "registered domain" (ADVICE r12). The parser therefore stores
  * BOTH forms of every non-ASCII rule: the Unicode original and its
  * `java.net.IDN.toASCII` (RFC 3490 ToASCII, the spec's own
  * canonicalization step) twin, so Unicode and punycoded hosts resolve
  * identically. A host MIXING Unicode and Punycode labels within one
  * suffix is out of contract (no crawl canonicalizer emits one) and
  * fail-softs like any unmatched host. Rules whose ToASCII conversion
  * fails (none in the shipped list) keep their Unicode form only.
  */
object Psl {

  /** The build-pinned list, parsed once per JVM. ~11.5k rules / ~250 KB
    * of sorted strings — rides query plans as codegen reference
    * objects, never per-row state.
    */
  lazy val default: PslRules = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null,
      "public_suffix_list.dat missing from the classpath — the PSL " +
        "artifact must ship with the build")
    try parse(in) finally in.close()
  }

  /** A rule and, when it carries non-ASCII labels, its Punycode twin —
    * lowercased like every stored rule (IDN.toASCII upper-cases
    * nothing for valid input, but the invariant is cheap to enforce).
    * ASCII rules (the overwhelming majority) skip the IDN call.
    */
  private def withAscii(rule: String): Seq[String] = {
    var ascii = true
    var i = 0
    while (ascii && i < rule.length) {
      if (rule.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) Seq(rule)
    else try {
      val a = java.net.IDN.toASCII(rule, java.net.IDN.ALLOW_UNASSIGNED)
        .toLowerCase(java.util.Locale.ROOT)
      if (a == rule) Seq(rule) else Seq(rule, a)
    } catch { case _: IllegalArgumentException => Seq(rule) }
  }

  def parse(in: InputStream): PslRules = {
    val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
    val exact = Vector.newBuilder[String]
    val wild = Vector.newBuilder[String]
    val exc = Vector.newBuilder[String]
    var line = r.readLine()
    while (line != null) {
      val t0 = line.trim
      if (t0.nonEmpty && !t0.startsWith("//")) {
        // "each line is only read up to the first whitespace"
        val rule = t0.takeWhile(c => !Character.isWhitespace(c))
          .toLowerCase(java.util.Locale.ROOT)
        if (rule.startsWith("!")) exc ++= withAscii(rule.substring(1))
        else if (rule.startsWith("*.")) wild ++= withAscii(rule.substring(2))
        else if (rule != "*") exact ++= withAscii(rule)
      }
      line = r.readLine()
    }
    def sorted(b: collection.mutable.Builder[String, Vector[String]]) = {
      val a = b.result().distinct.toArray
      java.util.Arrays.sort(a.asInstanceOf[Array[AnyRef]])
      a
    }
    PslRules(sorted(exact), sorted(wild), sorted(exc))
  }
}
