package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for LLM-training-data pipelines (extension
  * surface, SURVEY §7.3; additions beyond the reference, which has no
  * scalar text ops except whitespace normalization,
  * `src/utils/fake_data.py:34-38`).
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * expressions — no UDFs — so the whole document pipeline stays inside
  * WholeStageCodegen and scales with input bytes (no serialization
  * boundary per row). Each function has an exact DuckDB-SQL mirror used
  * by the oracle queries; expressions are kept structurally identical on
  * both sides so doubles match bitwise.
  */
object TextFunctions {

  /** Canonical text form: lowercase, whitespace runs collapsed, trimmed
    * (reference I2 normalization, generalized with lowercasing).
    */
  def normalText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace token count (= `size(split(trim(c), "\\s+"))`, via the
    * one-pass [[TextStats]] expression; whole-stage codegen
    * subexpression elimination shares one evaluation across the sibling
    * stats in a projection).
    */
  def wsTokenCount(c: Column): Column =
    TextStats.textStats(c).getField("n_ws_tokens")

  /** BPE-ish token count: alpha runs, digit runs, single punctuation —
    * a deterministic stand-in for a real BPE vocab (simplified form of
    * the GPT-2 pre-tokenizer regex `[a-z]+|[0-9]+|[^a-z0-9\s]`).
    */
  def bpeishTokenCount(c: Column): Column =
    TextStats.textStats(c).getField("n_bpe_tokens")

  /** Count of non-alphanumeric, non-space characters. */
  def punctCount(c: Column): Column =
    TextStats.textStats(c).getField("n_punct")

  /** English stopword-token count (small fixed list, shared with the
    * langid markers).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is")

  def stopwordCount(c: Column): Column =
    TextStats.textStats(c).getField("n_stop")

  /** Marker-word language scores: for each language, how many of its
    * marker words occur in the text. Deterministic n-gram-style
    * heuristic; argmax with fixed priority order decides.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " of ", " and ", " is "),
    "es" -> Seq(" el ", " la ", " de ", " que ", " y "),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist "),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " est "),
    "zh" -> Seq("的", "是", "了"))

  /** Predicted language code, or "und" when no marker hits. Ties break
    * by the fixed [[LangMarkers]] order. One-pass [[LangId]] expression
    * (the 23-`contains` column formulation re-normalized the text per
    * marker; semantics unchanged).
    */
  def langId(c: Column): Column = LangId.langId(c)

  /** Heuristic quality score in [0,1]:
    * 0.4·min(tokens/50, 1) + 0.3·(1 − min(5·punctRatio, 1)) +
    * 0.3·(1 − stopRatio). Structure mirrored exactly in the oracle SQL
    * (and re-evaluated with identical double ops inside [[TextStats]])
    * so the doubles agree bitwise.
    */
  def qualityScore(c: Column): Column =
    TextStats.textStats(c).getField("quality")

  /** Repetition signals (Gopher-style quality heuristics): the
    * duplicate fraction among newline-delimited lines and among word
    * bigrams of the canonical text. 0 = all distinct, →1 = highly
    * repetitive. Degenerate inputs (≤1 line / ≤2 tokens) score 0.
    */
  def dupLineFraction(c: Column): Column = {
    val lines = split(c, "\n")
    when(size(lines) <= 1, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(lines)).cast("double") / size(lines).cast("double"))
  }

  def dupBigramFraction(c: Column): Column = {
    val toks = split(normalText(c), " ")
    val total = size(toks) - 1
    when(total <= 1, lit(0.0))
      .otherwise(lit(1.0) -
        size(graft.functions.WordShingles.wordShingles(c, 2)).cast("double") /
          total.cast("double"))
  }

  /** PII scrubbing (training-corpus hygiene): mask email addresses and
    * US-style phone numbers with typed placeholders. Patterns stay in
    * the regex subset Java and RE2 share (character classes, `+`,
    * bounded repeats) so the DuckDB oracle applies byte-identically.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"

  def scrubPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailPattern))

  def phoneCount(c: Column): Column = regexp_count(c, lit(PhonePattern))

  /** Exact-content fingerprint: md5 of the canonical text. */
  def fingerprintExact(c: Column): Column = md5(normalText(c).cast("binary"))

  /** Key fingerprint (OpenRefine-style): md5 of the sorted distinct
    * token set — stable under token reordering and duplication, the
    * cheap near-dup canonical key.
    */
  def fingerprintKey(c: Column): Column =
    md5(concat_ws(" ",
      array_sort(array_distinct(split(normalText(c), " ")))).cast("binary"))
}
