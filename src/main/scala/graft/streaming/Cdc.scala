package graft.streaming

/** CDC row model for incremental mode: the Spark analogue of the
  * reference's `ObjectState.LatestChangeType` (NEW/UPDATED/REMOVED,
  * `State/ObjectState.cs:13-18`). One row per (table, key) per micro-batch
  * — micro-batch granularity is the idiomatic Spark unit; the sink's
  * idempotent upsert/delete collapses intra-batch churn exactly like the
  * reference's last DML wins.
  */
object Cdc {
  val Upsert = "upsert"
  val Delete = "delete"
}

/** Typed per-family event + state + CDC shapes used by the
  * flatMapGroupsWithState processors. */
object Shapes {
  // installation family
  case class InstEvent(seq: Long, event_type: String, id: String,
      installation_id: String, unit_address_id: String, status: String,
      location_remark: String)
  case class InstState(created: Boolean, installation_id: String,
      unit_address_id: Option[String], status: Option[String],
      location_remark: Option[String])
  case class InstCdc(change: String, id: String, installation_id: String,
      unit_address_id: Option[String], status: Option[String],
      location_remark: Option[String])

  // work task family
  case class WtEvent(seq: Long, event_type: String, id: String,
      number: String, status: String)
  case class WtState(number: String, status: String)
  case class WtCdc(change: String, id: String, number: String, status: String)

  // interest family (walk of interest)
  case class WoiEvent(seq: Long, event_type: String, id: String,
      walk: Seq[String])
  case class WoiState(walk: Seq[String])
  case class WoiCdc(change: String, interest_id: String, walk: Seq[String])
}
