package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/host canonicalization — the first operator of every web-corpus
  * training-data pipeline (CommonCrawl-style dedup keys, per-host crawl
  * caps, domain-level filtering). Everything here is row-local string
  * arithmetic over built-in functions (regexp/split/array ops — codegen'd
  * except the tiny per-URL param-list lambdas), so it scales linearly
  * with zero shuffle; only the per-domain cap downstream adds one keyed
  * exchange.
  *
  * Canonical form (the industry-standard normalization set):
  *   1. drop the fragment (`#...`),
  *   2. drop the scheme (case-insensitive),
  *   3. lowercase the authority; drop an explicit port and a leading
  *      `www.`,
  *   4. drop one trailing `/` from the path,
  *   5. drop `utm_*` tracking params and SORT the remaining query params
  *      (query-string order does not affect the resource).
  *
  * Registrable domain ("example.co.uk", not "co.uk" or
  * "cdn.example.co.uk") uses the standard last-two-labels rule with a
  * small second-level-domain allowlist standing in for the public-suffix
  * list (the operator shape — broadcastable suffix rules + row-local
  * label slicing — is what matters at scale; swap in the full PSL as a
  * broadcast map in production).
  */
object Urls {

  /** Second-level labels treated as public suffixes when the TLD is a
    * 2-letter country code (`co.uk`, `com.au`, `ac.jp`, ...). */
  val SecondLevelSuffixes: Seq[String] = Seq("co", "com", "org", "net", "ac", "gov")

  /** Deterministic synthetic URL over the documents table — the driver's
    * tables carry no URL column, so the canon/caps queries derive one
    * from (doc_id, source, lang) with deliberately messy shape variation
    * (mixed-case scheme, www/cdn prefixes, explicit port, trailing slash,
    * unordered + utm-polluted query params, fragment). The DuckDB oracle
    * replicates this construction verbatim, so the hashed contract tests
    * the CANONICALIZATION, not the synthesis. */
  def syntheticUrl: Column = concat(
    when(col("doc_id") % 2 === 0, lit("http")).otherwise(lit("HTTPS")), lit("://"),
    when(col("doc_id") % 4 === 0, lit("www.")).otherwise(lit("")),
    when(col("doc_id") % 5 === 0, lit("cdn.")).otherwise(lit("")),
    col("source"), lit("site."),
    when(col("doc_id") % 3 === 0, lit("com"))
      .when(col("doc_id") % 3 === 1, lit("org")).otherwise(lit("co.uk")),
    when(col("doc_id") % 7 === 0, lit(":8080")).otherwise(lit("")),
    lit("/docs/"), col("lang"), lit("/"), col("doc_id").cast("string"),
    when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
    when(col("doc_id") % 3 === 0, concat(lit("?utm_source=feed&b="),
        (col("doc_id") % 10).cast("string"), lit("&a="), (col("doc_id") % 7).cast("string")))
      .when(col("doc_id") % 3 === 1, concat(lit("?a="), (col("doc_id") % 7).cast("string"),
        lit("&utm_campaign=x&b="), (col("doc_id") % 10).cast("string")))
      .otherwise(lit("")),
    when(col("doc_id") % 6 === 0, lit("#sec2")).otherwise(lit("")))

  /** Output + intermediate column names [[withCanonical]] claims on its
    * input frame; reserved so a caller's pre-existing column is never
    * silently clobbered (ADVICE r11 — the AsOfJoin require() pattern). */
  private val ReservedCanonicalCols = Seq("host", "domain", "url_canon",
    "__rest", "__hostport", "__pq", "__path", "__query", "__params")

  /** Adds `host`, `domain` (registrable) and `url_canon` columns computed
    * from `url`. Intermediate `__`-prefixed columns are dropped. The
    * input must not already carry any of [[ReservedCanonicalCols]]. */
  def withCanonical(df: DataFrame, url: Column): DataFrame = {
    val clash = df.columns.toSet.intersect(ReservedCanonicalCols.toSet)
    require(clash.isEmpty,
      s"withCanonical reserves column names ${clash.mkString(", ")} — rename them on the input")
    val labels = split(col("host"), "\\.")
    val n = size(labels)
    val registrable =
      when(n >= 3 &&
          element_at(labels, n - 1).isin(SecondLevelSuffixes.map(lit): _*) &&
          length(element_at(labels, n)) === 2,
        array_join(slice(labels, n - 2, lit(3)), "."))
        .otherwise(array_join(slice(labels, greatest(n - 1, lit(1)), lit(2)), "."))
    df
      .withColumn("__rest", regexp_replace(split(url, "#").getItem(0),
        "^[A-Za-z][A-Za-z0-9+.-]*://", ""))
      .withColumn("__hostport", regexp_extract(col("__rest"), "^[^/?]+", 0))
      .withColumn("__pq",
        col("__rest").substr(length(col("__hostport")) + lit(1), lit(1 << 30)))
      .withColumn("host",
        regexp_replace(lower(split(col("__hostport"), ":").getItem(0)), "^www\\.", ""))
      .withColumn("__path", regexp_replace(split(col("__pq"), "\\?").getItem(0), "/$", ""))
      .withColumn("__query", when(col("__pq").contains("?"),
        split(col("__pq"), "\\?").getItem(1)).otherwise(lit("")))
      .withColumn("__params", array_join(array_sort(filter(split(col("__query"), "&"),
        x => !x.startsWith("utm_") && x =!= "")), "&"))
      .withColumn("domain", registrable)
      .withColumn("url_canon", concat(col("host"), col("__path"),
        when(col("__params") =!= "", concat(lit("?"), col("__params"))).otherwise(lit(""))))
      .drop("__rest", "__hostport", "__pq", "__path", "__query", "__params")
  }
}
