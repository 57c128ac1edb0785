package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import graft.sources.ZValue
import graft.sources.ZType

/** Go-flavored regexp surface for zed's regexp()/regexp_replace()
  * (reference function/regexp.go): Go named-group and replacement syntax
  * translated to Java, and Go's error-message wording reproduced for the
  * common syntax failures so error values match the reference.
  */
object GoRe {

  /** Go `(?P<name>…)` → Java `(?<name>…)`. */
  def toJavaPattern(re: String): String =
    re.replace("(?P<", "(?<")

  /** Go `$X` named replacement → Java `${X}` (single-letter/word names). */
  def toJavaReplacement(nw: String): String =
    nw.replaceAll("""\$([A-Za-z_][A-Za-z0-9_]*)""", """\$\{$1\}""")

  /** Go regexp/syntax wording for a pattern that fails to compile; None
    * when it compiles.
    */
  def goError(re: String): Option[String] = {
    try { java.util.regex.Pattern.compile(toJavaPattern(re)); None }
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        val d = Option(e.getDescription).getOrElse("")
        val msg =
          if (d.contains("Unclosed group")) s"missing closing ): `$re`"
          else if (d.contains("Unmatched closing")) s"unexpected ): `$re`"
          else if (d.contains("Unclosed character class")) s"missing closing ]: `$re`"
          else if (d.contains("Dangling meta character"))
            s"missing argument to repetition operator: `${re.take(1)}`"
          else s"invalid syntax: `$re`"
        Some(s"error parsing regexp: $msg")
    }
  }

  /** regexp(re, s) with reference semantics: submatch array, null on no
    * match, error value on a bad pattern. Codegen'd (GoReExpr) — no
    * ScalaUDF on the search hot path.
    */
  def regexpMatch(re: Column, s: Column): Column = {
    import org.apache.spark.sql.types.StringType
    Bridge.column(GoReMatch(
      Bridge.expression(re.cast(StringType)),
      Bridge.expression(s.cast(StringType))))
  }

  /** regexp_replace(s, re, new) with reference error semantics. Null re /
    * new → error("…cannot be null"); bad pattern → Go-worded error.
    */
  def regexpReplace(s: Column, re: Column, nw: Column): Column = {
    import org.apache.spark.sql.types.StringType
    Bridge.column(GoReReplace(
      Bridge.expression(s.cast(StringType)),
      Bridge.expression(re.cast(StringType)),
      Bridge.expression(nw.cast(StringType))))
  }
}
