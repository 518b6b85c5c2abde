package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text cleaning + analysis functions.
  *
  * Part 1 re-expresses the reference's wrangling kernel
  * (/root/reference/ProjectCodeUsed/data.py:89-118 street normalization,
  * /root/reference/Lesson6Quizes/tags.py:21-38 key classification,
  * /root/reference/Lesson6Quizes/audit.py:18 street-type extraction) as
  * pure column expressions — every one stays inside whole-stage codegen;
  * no UDFs.
  *
  * Part 2 is the large-scale training-data-pipeline surface: language
  * ID (stopword-overlap heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and document fingerprinting — all
  * built-in-function compositions that distribute trivially (per-row,
  * no shuffle).
  */
object TextFunctions {

  // ---------------------------------------------------------------------
  // Part 1 — the reference's cleaning kernel
  // ---------------------------------------------------------------------

  /** Street-suffix normalization map (behavior spec from
    * /root/reference/ProjectCodeUsed/data.py:98-108 — incl. the three
    * whole-suffix one-offs Arthur/Wellesley/Main). */
  val streetMapping: Map[String, String] = Map(
    "St" -> "Street", "St." -> "Street",
    "Rd" -> "Road", "Rd." -> "Road",
    "Ave" -> "Avenue",
    "Blvd" -> "Boulevard", "Blvd." -> "Boulevard",
    "Arthur" -> "Arthur St",
    "Wellesley" -> "Wellesley Avenue",
    "Main" -> "Main Avenue")

  /** Last whitespace token of a street name — the reference's
    * `street_type_re = r'\b\S+\.?$'` (audit.py:18). On a
    * whitespace-split name the regex always selects the final token. */
  def streetType(name: Column): Column =
    element_at(split(trim(name), "\\s+"), -1)

  /** `update_name` (data.py:110-118): replace the LAST whitespace token
    * iff it is a key of `mapping`; otherwise return the name unchanged.
    * Expressed with split / slice / concat_ws + a literal map lookup —
    * no UDF, so it survives codegen and is usable in SQL.
    */
  def normalizeStreet(name: Column, mapping: Map[String, String] = streetMapping): Column = {
    val parts = split(trim(name), "\\s+")
    val last = element_at(parts, -1)
    val replaced = element_at(typedLit(mapping), last)
    val head = slice(parts, lit(1), size(parts) - lit(1))
    when(replaced.isNotNull,
      concat_ws(" ", concat(head, array(replaced))))
      .otherwise(name)
  }

  /** Street names whose type is not in the expected suffix list —
    * the audit predicate (audit.py:33-38). */
  val expectedStreetTypes: Seq[String] = Seq(
    "Street", "Avenue", "Boulevard", "Drive", "Court", "Place", "Square",
    "Lane", "Road", "Trail", "Parkway", "Commons")

  def isUnexpectedStreetType(name: Column): Column =
    !streetType(name).isin(expectedStreetTypes: _*)

  /** Tag-key classifier (tags.py:26-38). Evaluation order matters and is
    * preserved: problemchars (search anywhere) → lower_colon (anchored)
    * → lower (anchored) → other. */
  def keyType(key: Column): Column =
    when(key.rlike("[=\\+/&<>;'\"\\?%#$@,\\. \\t\\r\\n]"), "problemchars")
      .when(key.rlike("^([a-z]|_)*:([a-z]|_)*$"), "lower_colon")
      .when(key.rlike("^([a-z]|_)*$"), "lower")
      .otherwise("other")

  /** Merged-field splitter for dirty postcodes like "Spokane, WA 99218"
    * (readme.md:43-52,94-103): named-group regex → (city, state, postcode).
    * Returns the three captures; empty string when a group is absent.
    */
  private val mergedPat = "(\\w+)?,? ?([A-Z][A-Z]) (\\d{5})"
  def mergedCity(c: Column): Column = regexp_extract(c, mergedPat, 1)
  def mergedState(c: Column): Column = regexp_extract(c, mergedPat, 2)
  def mergedPostcode(c: Column): Column = regexp_extract(c, mergedPat, 3)

  // ---------------------------------------------------------------------
  // Part 2 — training-data pipeline text analysis
  // ---------------------------------------------------------------------

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer count: letter-runs, digit-runs, and single
    * non-space symbols (a GPT-2-style pretoken split, approximated with
    * a regex). Pattern is RE2-safe (no lookarounds) so the same regex
    * runs in Java and in the DuckDB oracle. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  /** Tiny per-language stopword lists for the n-gram/stopword language
    * ID heuristic. Deliberately small: the point is the distributed
    * shape (per-row set-overlap scoring), not lexicographic quality. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "他", "这", "中"))

  /** Fraction of tokens that are stopwords of `lang`. */
  def stopwordRatio(text: Column, lang: String): Column = {
    val sw = typedLit(stopwords(lang))
    size(filter(tokens(text), t => array_contains(sw, lower(t)))) /
      greatest(tokenCount(text), lit(1)).cast("double")
  }

  /** Language-ID: argmax over per-language stopword ratios; "und"
    * (undetermined) when no list scores > 0. Native one-pass expression
    * (plans.LanguageIdExpr) — the Column form ([[languageIdSpec]])
    * re-tokenizes the text once per language through interpreted HOFs;
    * value parity pinned in TextFunctionsSpec. */
  def languageId(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // coalesce first: the Column spec form maps NULL text to 'und'
    // (null scores → best.score > 0 is null → otherwise branch), and a
    // bare UnaryExpression would null-propagate instead
    ColumnBridge.column(graft.plans.LanguageIdExpr(
      ColumnBridge.expression(coalesce(text, lit(""))),
      stopwords.view.mapValues(_.toSeq).toMap))
  }

  /** Column-form value spec for [[languageId]]: builds a (score, lang)
    * struct array and takes the max. */
  def languageIdSpec(text: Column): Column = {
    val scored = stopwords.keys.toSeq.sorted.map { lang =>
      struct(stopwordRatio(text, lang).as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))) /
      greatest(length(text), lit(1)).cast("double")

  /** Mean whitespace-token length. */
  def meanTokenLen(text: Column): Column =
    (length(regexp_replace(text, "\\s+", ""))) /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Composite quality score in [0,1]: penalizes very short docs, high
    * punctuation density, and degenerate token lengths — the standard
    * cheap pre-filter shape for web-scale corpus cleaning. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    val tokLen = meanTokenLen(text)
    val tokScore = when(tokLen.between(2.0, 12.0), 1.0).otherwise(0.3)
    round(lenScore * 0.4 + punctScore * 0.3 + tokScore * 0.3, 4)
  }

  /** Order-insensitive content fingerprint: sha256 over the sorted token
    * multiset. Equal iff same bag of words — the cheap "shuffled
    * near-dup" catcher. */
  def sortedTokenFingerprint(text: Column): Column =
    sha2(concat_ws(" ", sort_array(tokens(text))), 256)

  /** Rolling (chained) hash over tokens — an order-SENSITIVE
    * fingerprint, computed with `aggregate` over the token array (no
    * UDF). Each step hashes (accumulator, token) together, so token
    * order changes the result. An xxhash64 chain instead of the classic
    * base-31 polynomial: the polynomial's deliberate Long overflow
    * throws under Spark 4's default ANSI mode. */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** Normalized text for exact dedup: lowercase, collapse whitespace,
    * trim. */
  def normalizeForDedup(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))
}
