package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Last-write-wins fold primitives.
  *
  * The reference folds a globally-ordered event log into per-entity
  * dictionary state with field-wise overwrites
  * (`/root/reference/OpenFTTH.RelationalProjector/State/ProjektorState.cs:20-690`).
  * In Spark we express that fold as a single aggregate per entity key
  * using `max_by` — partial aggregation happens map-side, so the shuffle
  * carries one row per (partition, key) instead of the full event stream.
  * This is deliberately NOT a `Window.partitionBy(id).orderBy(seq)` +
  * `last(...)`: a window must shuffle and sort EVERY event row, while the
  * aggregate folds to O(1) state per key before the exchange. Note:
  * string-typed `max_by` buffers plan as SortAggregate (HashAggregate
  * needs fixed-width mutable buffers) — the per-partition sort is
  * spillable and the partial/final shape is unchanged, which is the
  * property that matters at 100 TB.
  */
object Folds {

  /** Value of `value` at the greatest `seq` among rows where `cond` holds.
    * Rows where `cond` is false contribute a NULL ordering key, which
    * `max_by` ignores. Returns NULL when no row matches.
    */
  def lastWhere(value: Column, seq: Column, cond: Column): Column =
    max_by(value, when(cond, seq))

  /** Last non-NULL value of `value` in `seq` order (field-wise overwrite
    * semantics: an event that does not carry the field leaves it unchanged).
    */
  def lastNonNull(value: Column, seq: Column): Column =
    lastWhere(value, seq, value.isNotNull)

  /** Value of `value` at the greatest `seq` among rows where `cond` holds,
    * *including* NULL values (wholesale overwrite semantics: the latest
    * qualifying event replaces the field even with NULL — e.g. the
    * reference's AddressInfoChanged handlers assign possibly-null GUIDs
    * directly, `ProjektorState.cs:318-320,569-571,636`).
    * Implemented by wrapping in a struct so the ordering row is non-null.
    */
  def lastEvenNull(value: Column, seq: Column, cond: Column): Column =
    max_by(struct(value.as("v")), when(cond, seq)).getField("v")

  /** Merge partial fold frames (same schema) into one row per key.
    *
    * A partial fold row carries, per logical field, the folded value plus a
    * marker: the greatest event `seq` that contributed to it (NULL when no
    * event in that partial touched the field). Because the event log is
    * globally ordered, merging partials from disjoint seq ranges is exact:
    * for each `(value, marker)` pair take the value at the greatest non-null
    * marker (the struct wrap keeps NULL *values* distinct from absent
    * fields), and for each bare `seqs` column take the max. This is the
    * distributive-aggregate property that lets the incremental catch-up
    * fold ONLY the batch and merge onto stored state — the Spark analogue
    * of the reference's per-event dictionary writes
    * (`ProjektorState.cs:23-125`) that stays O(delta) per micro-batch.
    */
  def mergePartials(parts: Seq[org.apache.spark.sql.DataFrame], idCol: String,
      pairs: Seq[(String, String)], seqs: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val all = parts.reduce(_.unionByName(_))
    val aggs = pairs.flatMap { case (v, s) =>
      Seq(max_by(struct(col(v).as("v")), col(s)).getField("v").as(v), max(col(s)).as(s))
    } ++ seqs.map(s => max(col(s)).as(s))
    all.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }
}
