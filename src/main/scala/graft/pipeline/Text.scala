package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, document
  * fingerprinting, shingling.
  *
  * Everything here is built from `org.apache.spark.sql.functions._`
  * (codegen'd, no UDFs) except the character-n-gram language scorer, which
  * is a small deterministic UDF over bounded profiles. All operators are
  * row-local (narrow) — they scale linearly with no shuffle.
  */
object Text {

  /** Whitespace tokenization of trimmed text; empty text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct-token count. */
  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** BPE-ish subword count: each alphanumeric run contributes one unit
    * per 4-char chunk, each other non-space char one unit - a cheap,
    * deterministic proxy for subword token counts. */
  def subwordCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z0-9]{1,4}|[^a-z0-9\\s]"))

  /** Punctuation ratio: punctuation chars / total chars (0 for empty). */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(total === 0, lit(0.0)).otherwise(punct.cast("double") / total.cast("double"))
  }

  /** Ratio of tokens that are in the (small, fixed) English stopword list. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "are", "was", "for", "on", "with", "as", "at", "by", "it")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val stops = size(filter(toks, t => t.isin(Stopwords.map(lit): _*)))
    when(n === 0, lit(0.0)).otherwise(stops.cast("double") / n.cast("double"))
  }

  /** Mean token length (0 for empty). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / n.cast("double"))
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation,
    * moderate stopword presence, vocabulary diversity. Deterministic
    * double arithmetic from exact integer counts (oracle-reproducible). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text)
    val lenScore = when(n >= 20 && n <= 2000, lit(1.0))
      .when(n > 0, lit(0.5)).otherwise(lit(0.0))
    val diversity = when(n === 0, lit(0.0))
      .otherwise(distinctTokenCount(text).cast("double") / n.cast("double"))
    (lenScore * 0.4) + ((lit(1.0) - punctRatio(text)) * 0.2) +
      (stopwordRatio(text) * 0.1) + (diversity * 0.3)
  }

  /** MD5 fingerprint of normalized text (lowercase, trimmed, whitespace
    * collapsed) — the exact-dup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Word n-gram shingles (space-joined), for Jaccard/minhash. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val count = size(toks)
    when(count < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), count - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
  }

  // --- language identification (character-trigram profile heuristic) ---

  /** Tiny per-language marker profiles: common function words. Real systems
    * load trained trigram profiles; the operator shape (broadcastable
    * profiles + row-local scoring) is what matters at scale. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "you", "that", "it"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "et", "que"),
    "es" -> Seq("el", "los", "una", "es", "que", "por", "con", "para"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这"))

  /** Predicted language: the profile with the most marker-token hits;
    * deterministic tiebreak (lexicographically greatest language code wins
    * a tie — struct max over (hits, lang)); "und" when no marker hits. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isin(markers.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
