package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Pii]] detection/redaction semantics on hand-built rows: per-type
  * counts, placeholder substitution, the fixed application order, and
  * PII-free text passing through byte-identical. */
class PiiSpec extends SparkTestBase {
  import spark.implicits._

  private def run(texts: String*): Seq[(Seq[Long], String)] = {
    val d = texts.toDF("t")
    val counts = array(Pii.Patterns.map { case (_, re, _) => Pii.countOf(col("t"), re) }: _*)
    d.select(counts.as("c"), Pii.redacted(col("t")).as("red"))
      .collect().map(r => (r.getSeq[Long](0), r.getString(1))).toSeq
  }

  test("each pattern class detects and redacts independently") {
    val Seq((counts, red)) = run(
      "mail a.b-c@sub.example.org then 4111 2222 3333 4444 via 192.168.0.1 call 555-0199 end")
    assert(counts === Seq(1L, 1L, 1L, 1L)) // email, card, ip, phone
    assert(red === "mail <EMAIL> then <CARD> via <IP> call <PHONE> end")
  }

  test("pii-free text passes through byte-identical with zero counts") {
    val src = "plain words only, punctuation; 12 numbers 3456 but no pii-shaped runs"
    val Seq((counts, red)) = run(src)
    assert(counts === Seq(0L, 0L, 0L, 0L))
    assert(red === src)
  }

  test("luhn check separates checksum-valid cards from format-only matches") {
    // 4111 1111 1111 1111 is the canonical Luhn-valid test PAN;
    // flipping its last digit breaks the checksum but not the format
    val d = Seq(
      "pay 4111 1111 1111 1111 now",                      // valid
      "pay 4111 1111 1111 1112 now",                      // format-only
      "two: 4111 1111 1111 1111 and 5500 0000 0000 0004", // both valid
      "no cards here").toDF("t")
    val got = d.select(
        Pii.countOf(col("t"), Pii.Patterns.find(_._1 == "card").get._2).as("n_card"),
        Pii.luhnValidCount(col("t")).as("n_luhn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 1L), (1L, 0L), (2L, 2L), (0L, 0L)))
  }

  test("multiple matches of one class all redact; word boundaries hold") {
    val Seq((counts, red)) = run("a@b.co c@d.io and 1555-0199 is NOT a phone but 555-0199 is")
    assert(counts(0) === 2L) // both emails
    assert(counts(3) === 1L) // 1555-0199 must not match (left \b)
    // \b between '1' and '5' is not a boundary, so 1555-0199 survives intact
    assert(red === "<EMAIL> <EMAIL> and 1555-0199 is NOT a phone but <PHONE> is")
  }
}
