package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus processing: token
  * extraction, normalization, portable hashing, language-ID scoring and
  * quality features. The reference (affo/ssp) has no text functions —
  * its users call Go `strings.*` inside node callbacks
  * (reference engine_test.go:549,555); here every primitive is a
  * codegen'd Catalyst expression chain (no UDFs), so it runs inside
  * WholeStageCodegen and scales linearly with the scan.
  *
  * Each Column builder has a matching SQL-fragment builder (used both by
  * the Spark `expr` and the DuckDB oracle) so the two engines evaluate
  * the *same* formula; where dialects differ (regexp_replace 'g' flag,
  * hex parsing) there are dialect-specific variants.
  */
object TextFns {

  /** Canonical token pattern: maximal runs of ASCII alphanumerics over
    * the lowercased text. Same RE2/Java semantics in both engines.
    */
  val TokenPattern = "[a-z0-9]+"

  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(TokenPattern), lit(0))

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** Lowercase, strip non-alphanumerics, collapse whitespace — the
    * normalization used for near-duplicate fingerprinting.
    */
  def normalize(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** DuckDB fragment equivalent to [[normalize]] (needs the 'g' flag). */
  def normalizeSql(col: String): String =
    s"trim(regexp_replace(regexp_replace(lower($col), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** DuckDB fragment: list of `window`-char rolling hashes
    * ((acc·257 + c) mod 2^31−1) over a string column — the oracle twin
    * of the codegen RollingHashes expression. The char codes are
    * extracted ONCE per row (bound through a 1-element list_transform
    * lambda) and each window reduces an int-list slice; the earlier
    * per-window `ascii(substr(...))` form re-scanned the string per
    * window element and was the hot CTE of every winnow/CDC oracle at
    * the sf1 scale (measured 900 s+ → ~5 s on q128's chain).
    */
  def rollingHashesSql(normCol: String, window: Int): String =
    s"""list_transform([list_transform(range(length($normCol)),
       |    k -> CAST(ascii(substr($normCol, CAST(k+1 AS INT), 1)) AS BIGINT))],
       |  codes -> list_transform(range(greatest(len(codes) - ${window - 1}, 0)),
       |    i -> list_reduce(codes[CAST(i+1 AS INT):CAST(i+$window AS INT)],
       |      (acc, c) -> (acc * 257 + c) % 2147483647)))[1]""".stripMargin

  /** Portable deterministic 60-bit hash: the top 15 hex chars of md5,
    * parsed as an unsigned integer. Identical in Spark
    * (`conv(substr(md5(x),1,15),16,10)`) and DuckDB
    * (`('0x'||substr(md5(x),1,15))::BIGINT`), which makes hash-driven
    * operators (MinHash, fingerprints) oracle-checkable. For pure-Spark
    * hot paths prefer [[hash64Fast]] (xxhash64, one pass, no hex
    * round-trip).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hash60Sql(col: String): String =
    s"('0x'||substr(md5($col),1,15))::BIGINT"

  /** Non-portable but faster 64-bit hash for production-scale paths. */
  def hash64Fast(c: Column): Column = xxhash64(c)

  /** Small multilingual stopword/marker sets for language ID scoring.
    * Public corpora use the same top-stopword heuristic; sets kept tiny
    * so they stay literal in both SQL dialects.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "es", "de", "y", "que", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu"),
    "fr" -> Seq("le", "la", "est", "de", "et", "que", "dans"),
  )

  /** Count of tokens that appear in `words` (with multiplicity). */
  def markerHits(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t))).cast("long")
  }

  def markerHitsSql(toksCol: String, words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toksCol, t -> list_contains($list, t)))"
  }

  /** English stopword subset used for quality scoring. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "is", "of", "and", "to", "in", "that", "it", "on")
}
