package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — a mandatory pass of every production
  * training-data pipeline (emails, phone numbers, IP addresses, payment
  * card numbers must not reach the training mix). Everything here is
  * row-local regexp work over built-in codegen'd functions
  * (`regexp_extract_all` for the counts, chained `regexp_replace` for
  * the redaction), so the pass scales linearly with zero shuffle — the
  * operator shape Presidio/CCNet-style scrubbers distribute.
  *
  * The pattern set is the deterministic, cross-engine-portable core
  * (RE2 ∩ java.util.regex: character classes, bounded repetition, `\b`)
  * — production swaps in a wider pattern library behind the same
  * columns. Redaction order is fixed (email → card → ip → phone) so the
  * output is deterministic even if a future pattern pair overlaps.
  *
  * The driver corpus carries no natural PII, so [[syntheticPiiSuffix]]
  * injects a deterministic per-doc sample (the [[Urls.syntheticUrl]]
  * pattern): the DuckDB oracle replicates the injection verbatim and the
  * hashed contract therefore tests DETECTION and REDACTION, not the
  * synthesis.
  */
object Pii {

  /** (name, regex, replacement) triples; order = application order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("card", """\b\d{4} \d{4} \d{4} \d{4}\b""", "<CARD>"),
    ("ip", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "<IP>"),
    ("phone", """\b555-\d{4}\b""", "<PHONE>"))

  /** Deterministic synthetic PII appended to each document: an email on
    * every 3rd doc, an IPv4 on every 4th, a phone on every 5th, a card
    * on every 7th (so docs carry 0-4 PII items in mixed surroundings). */
  def syntheticPiiSuffix: Column = concat(
    when(col("doc_id") % 3 === 0, concat(lit(" contact user"),
      col("doc_id").cast("string"), lit("@mail"), (col("doc_id") % 5).cast("string"),
      lit(".example.com now"))).otherwise(lit("")),
    when(col("doc_id") % 4 === 0, concat(lit(" from 10."),
      (col("doc_id") % 256).cast("string"), lit("."),
      ((col("doc_id") * 7) % 256).cast("string"), lit("."),
      (col("doc_id") % 250).cast("string"), lit(" logged"))).otherwise(lit("")),
    when(col("doc_id") % 5 === 0, concat(lit(" call 555-"),
      (col("doc_id") % 9000 + 1000).cast("string"), lit(" today"))).otherwise(lit("")),
    when(col("doc_id") % 7 === 0, concat(lit(" card 4111 "),
      (col("doc_id") % 9000 + 1000).cast("string"), lit(" 2222 "),
      ((col("doc_id") * 3) % 9000 + 1000).cast("string"))).otherwise(lit("")))

  /** Per-type match count over `text` (0 when none). */
  def countOf(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("bigint")

  /** `text` with every pattern replaced by its placeholder, in the fixed
    * [[Patterns]] order. */
  def redacted(text: Column): Column =
    Patterns.foldLeft(text) { case (c, (_, re, repl)) =>
      regexp_replace(c, lit(re), lit(repl))
    }
}
