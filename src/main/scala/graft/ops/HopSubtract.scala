package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** The one genuinely custom sequence algorithm in the reference: given a
  * cable's walk-of-interest (ordered route-element ids) and its utility-
  * network hops (sub-paths where the cable runs inside a parent conduit),
  * compute the cable's directly-occupied route elements
  * (`ProjektorState.cs:178-221`).
  *
  * Semantics cloned exactly from the reference's stack scan, including its
  * edge cases (verified against the C# control flow, *not* "fixed"):
  *   - hops are tried strictly in order; only the top of the stack is
  *     matched against the current element (`:196`);
  *   - on a match the from-node element itself is dropped and the scan
  *     skips forward until the hop's `toNodeId`; the to-node element is
  *     *kept* (the inner search leaves the outer index on the element just
  *     before it, `:201-209`) and is itself eligible to start the next hop;
  *   - if `toNodeId` never appears, the scan skips to the end of the walk;
  *   - a hop whose `fromNodeId` never matches stays on the stack forever;
  *   - `hops == null` returns the walk verbatim (`:182-185`); an empty hop
  *     array also degenerates to the walk verbatim.
  *
  * This is a pure, deterministic scalar function over two array columns, so
  * a Scala UDF is the idiomatic Spark realization (SURVEY.md §2.8): it runs
  * per-row inside executors with no shuffle and no driver involvement, and
  * parallelizes embarrassingly at any scale.
  */
object HopSubtract {

  /** Pure scan; `from(i)`/`to(i)` are the i-th hop's endpoints. */
  def subtract(walk: Seq[String], from: Seq[String], to: Seq[String]): Seq[String] = {
    if (walk == null) return null
    if (from == null || from.isEmpty) return walk
    var hopIdx = 0
    val nHops = from.length
    val out = new ArrayBuffer[String](walk.length)
    var i = 0
    val n = walk.length
    while (i < n) {
      val el = walk(i)
      if (hopIdx < nHops && from(hopIdx) == el) {
        val toNode = to(hopIdx)
        hopIdx += 1
        // skip forward; stop with i positioned just before toNode (or at end)
        var search = i + 1
        var found = false
        while (search < n && !found) {
          if (walk(search) == toNode) found = true
          else { i += 1; search += 1 }
        }
      } else {
        out += el
      }
      i += 1
    }
    out.toSeq
  }

  private val fn = udf((walk: Seq[String], from: Seq[String], to: Seq[String]) => subtract(walk, from, to))

  /** Column form over (walk ARRAY<STRING>, hops ARRAY<STRUCT<fromNodeId, toNodeId, ...>>). */
  def hopSubtract(walk: Column, hops: Column): Column =
    when(hops.isNull, walk).otherwise(
      fn(walk, transform(hops, h => h.getField("fromNodeId")), transform(hops, h => h.getField("toNodeId"))))
}
