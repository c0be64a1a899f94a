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
        if (rule.startsWith("!")) exc += rule.substring(1)
        else if (rule.startsWith("*.")) wild += rule.substring(2)
        else if (rule != "*") exact += rule
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
