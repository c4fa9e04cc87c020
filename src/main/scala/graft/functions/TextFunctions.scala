package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-pipeline tier (SURVEY.md
  * §2.6 extension table). All are compositions of codegen'd built-ins —
  * no UDFs — so they inline into whole-stage codegen and push work to
  * executors; every one has an exact DuckDB-SQL mirror used by the oracle.
  */
object TextFunctions {

  /** Public stopword lists driving the language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "es" -> Seq("el", "que", "los", "las", "una", "y"))

  /** Explicit whitespace class: Java regex `\s` counts vertical tab as
    * whitespace, RE2 (DuckDB) does not — spelling the class out keeps both
    * engines identical on any input.
    */
  val WS = "[ \\t\\n\\x0B\\f\\r]"
  val NonWS = "[^ \\t\\n\\x0B\\f\\r]"

  /** Whitespace-token count (non-whitespace runs). */
  def tokenCount(c: Column): Column = regexp_count(c, lit(NonWS + "+")).cast("long")

  /** BPE-style pre-token classes (the GPT-2 pretokenizer shape:
    * contractions, optional-leading-space letter runs, digit runs,
    * punctuation runs). Both Java regex and RE2 support `\p{L}`/`\p{N}`
    * identically, and the whitespace class is spelled out (see [[WS]]),
    * so the count mirrors exactly in DuckDB.
    */
  val BpePattern =
    """'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+"""

  /** BPE-ish pre-token count — approximates LLM token counts far better
    * than whitespace splitting on punctuation-heavy text (whitespace
    * counts "end." as one token; a BPE pretokenizer sees two).
    */
  def subwordCount(c: Column): Column = regexp_count(c, lit(BpePattern)).cast("long")

  /** Hashes of every k-character gram of `textCol` (one per position; a
    * short document yields its single truncated gram). The hash is the
    * first 8 md5 hex chars — chosen over a Karp–Rabin rolling hash
    * because it mirrors EXACTLY in DuckDB; the O(1)-update "rolling"
    * trick only matters in an imperative scan, and vectorized evaluation
    * computes all positions in parallel anyway. Feed to [[winnow]].
    */
  def kgramHashes(textCol: String, k: Int = 8): Column =
    expr(s"""transform(sequence(1, greatest(length($textCol) - ${k - 1}, 1)),
            |  i -> substring(md5(substring($textCol, i, $k)), 1, 8))""".stripMargin)

  /** Engine-only fast variant of [[kgramHashes]]: xxhash64 of each k-gram
    * (bigint fingerprints). ~2× cheaper than the md5+substring form on the
    * fingerprinting scan and shuffles 8 bytes instead of an 8-char string
    * per gram — but it has no DuckDB mirror, so use it when the consumer
    * is this engine end-to-end and keep [[kgramHashes]] where an external
    * oracle must replay the selection. [[winnow]] accepts either (its
    * array_min orders bigints numerically, fixed-width hex strings
    * lexicographically — both uniform over grams, so selection density
    * and the shared-run guarantee are identical).
    */
  def kgramHashesFast(textCol: String, k: Int = 8): Column =
    expr(s"""transform(sequence(1, greatest(length($textCol) - ${k - 1}, 1)),
            |  i -> xxhash64(substring($textCol, i, $k)))""".stripMargin)

  /** Winnowed document fingerprints (Schleimer et al., SIGMOD'03): the
    * minimum gram hash of each sliding window of `w` positions, distinct.
    * Guarantees any shared run of w+k-1 chars between two documents
    * shares a fingerprint, at expected density 2/(w+1) — the standard
    * local-fingerprinting scheme for plagiarism/near-dup detection.
    */
  def winnow(kgCol: String, w: Int = 4): Column =
    expr(s"""array_distinct(transform(sequence(1, greatest(size($kgCol) - ${w - 1}, 1)),
            |  j -> array_min(slice($kgCol, j, $w))))""".stripMargin)

  // ---- PII scrubbing (the C4-style pre-training redaction pass).
  // Patterns are RE2-safe (no backrefs/lookarounds) and unambiguous under
  // both leftmost-first (Java) and leftmost-longest (RE2) matching, so
  // redaction mirrors exactly in the DuckDB oracle.

  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val Ipv4Pattern = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  /** International-format numbers only (`+` then 7-15 digits): fixed-shape
    * on purpose — free-form phone regexes backtrack ambiguously across
    * engines and eat unrelated digit runs.
    */
  val PhonePattern = """\+\d{7,15}"""

  /** Redact emails → [EMAIL], IPv4s → [IP], +phones → [PHONE], in that
    * order (emails first, so an address with an IP-shaped domain redacts
    * as one email, not an email wrapping an [IP]).
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "[EMAIL]"),
        Ipv4Pattern, "[IP]"),
      PhonePattern, "[PHONE]")

  /** Redacted-span count, tallied stepwise on the progressively redacted
    * text (so an email is never double-counted by the IP pass).
    */
  def piiCount(c: Column): Column = {
    val t1 = regexp_replace(c, EmailPattern, "[EMAIL]")
    val t2 = regexp_replace(t1, Ipv4Pattern, "[IP]")
    (regexp_count(c, lit(EmailPattern)) +
      regexp_count(t1, lit(Ipv4Pattern)) +
      regexp_count(t2, lit(PhonePattern))).cast("long")
  }

  /** lowercase + trim + collapse internal whitespace. */
  def normalize(c: Column): Column =
    regexp_replace(lower(trim(c)), WS + "+", " ")

  /** Deterministic document fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Fraction of word occurrences that are repeats of an earlier word —
    * the cheap per-row repetition signal (Gopher-style quality filters
    * gate on it): 0 for all-distinct text, → 1 for degenerate loops.
    */
  def dupWordFraction(c: Column): Column = {
    val words = split(trim(c), WS + "+")
    lit(1.0) - size(array_distinct(words)).cast("double") /
      greatest(size(words), lit(1)).cast("double")
  }

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[^.!?,;:]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** Stopword hits for one language (word-boundary regex count). */
  def stopwordHits(c: Column, lang: String): Column =
    regexp_count(lower(c), lit("\\b(" + stopwords(lang).mkString("|") + ")\\b")).cast("long")

  /** English stopword density per token. */
  def stopwordRatio(c: Column): Column =
    stopwordHits(c, "en").cast("double") /
      greatest(tokenCount(c), lit(1)).cast("double")

  /** Composite quality score in [0,1]: length share + punctuation sanity +
    * stopword density (a standard cheap text-quality proxy).
    */
  def qualityScore(c: Column): Column =
    lit(0.5) * least(lit(1.0), tokenCount(c).cast("double") / lit(50.0)) +
      lit(0.25) * (lit(1.0) - punctRatio(c)) +
      lit(0.25) * least(lit(1.0), lit(5.0) * stopwordRatio(c))

  /** Stopword-based language ID over the supported set; `und` when no list
    * matches. Deterministic tie-break order: en, de, fr, es.
    */
  def langId(c: Column): Column = {
    val he = stopwordHits(c, "en")
    val hd = stopwordHits(c, "de")
    val hf = stopwordHits(c, "fr")
    val hs = stopwordHits(c, "es")
    when(he === 0 && hd === 0 && hf === 0 && hs === 0, lit("und"))
      .when(he >= hd && he >= hf && he >= hs, lit("en"))
      .when(hd >= hf && hd >= hs, lit("de"))
      .when(hf >= hs, lit("fr"))
      .otherwise(lit("es"))
  }
}
