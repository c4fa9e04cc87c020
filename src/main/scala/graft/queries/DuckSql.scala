package graft.queries

import graft.functions.TextFunctions._

/** Shared DuckDB SQL fragments mirroring [[graft.functions.TextFunctions]]
  * — kept in ONE place so the Spark column functions and their oracle SQL
  * cannot drift apart. (Explicit whitespace class — see
  * [[graft.functions.TextFunctions.WS]] for why not `\s`/`\S`: Java counts
  * vertical tab as whitespace, RE2 does not.)
  */
private[queries] object DuckSql {
  val ws = """[ \t\n\x0B\f\r]"""
  val nonWs = """[^ \t\n\x0B\f\r]"""
  val tokens = s"len(regexp_extract_all(text, '$nonWs+'))"
  val punct =
    """CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / greatest(length(text), 1)"""
  def hits(langKey: String): String = {
    val words = stopwords(langKey).mkString("|")
    s"""len(regexp_extract_all(lower(text), '\\b($words)\\b'))"""
  }
  val langCase =
    s"""CASE WHEN he = 0 AND hd = 0 AND hf = 0 AND hs = 0 THEN 'und'
       |     WHEN he >= hd AND he >= hf AND he >= hs THEN 'en'
       |     WHEN hd >= hf AND hd >= hs THEN 'de'
       |     WHEN hf >= hs THEN 'fr' ELSE 'es' END""".stripMargin
  val subwords =
    s"len(regexp_extract_all(text, '${BpePattern.replace("'", "''")}'))"
  val quality =
    s"""0.5 * least(1.0, $tokens / 50.0)
       |    + 0.25 * (1.0 - $punct)
       |    + 0.25 * least(1.0, 5.0 * (CAST(${hits("en")} AS DOUBLE)
       |        / greatest($tokens, 1)))""".stripMargin
  // PII patterns, shared verbatim with TextFunctions (RE2-safe by design)
  val email = EmailPattern
  val ip = Ipv4Pattern
  val phone = PhonePattern
}
