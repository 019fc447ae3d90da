package graft.streaming

import graft.projector.EventLog
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import Shapes._

/** Keyed-state streaming processors for the self-contained aggregate
  * families (installation, work task, walk-of-interest): the incremental
  * analogue of the batch folds in [[graft.projector.Derivations]],
  * mirroring the reference's per-event apply loop (`Worker.cs:40-48`,
  * SURVEY.md §2.9) with Spark keyed state.
  *
  * Design: events are keyed by entity id, each micro-batch's events for a
  * key are applied **in seq order** inside `flatMapGroupsWithState`, and
  * one CDC row (upsert/delete with the post-batch state) is emitted per
  * touched key — the sink's idempotent upsert collapses intra-batch churn
  * exactly like the reference's last DML wins. State lives in the Spark
  * state store (per-key, partitioned, checkpointed) — no single-process
  * heap ceiling (`ProjektorState.cs:23-125` holds everything in one
  * dictionary set).
  *
  * The span-equipment family needs cross-key lookups (parents via root
  * segment, walks, container relations) and is handled by the catch-up
  * re-derivation in [[CatchUp]] instead (SURVEY.md §3's fold theorem makes
  * that exact).
  *
  * These functions accept either a batch or a streaming Dataset — the same
  * code path is used by unit tests (batch), replay-equivalence tests, and
  * `readStream`-driven deployments.
  */
object Processors {

  /** Decode + narrow the envelope to the installation family. */
  def installationEvents(decoded: DataFrame): Dataset[InstEvent] = {
    import decoded.sparkSession.implicits._
    decoded.filter(col("event_type").isin("InstallationCreated",
        "InstallationUnitAddressChanged", "InstallationStatusChanged",
        "InstallationLocationRemarkChanged"))
      .select(col("seq"), col("event_type"), col("p.id").as("id"),
        col("p.installationId").as("installation_id"),
        col("p.unitAddressId").as("unit_address_id"),
        col("p.status").as("status"),
        col("p.locationRemark").as("location_remark"))
      .as[InstEvent]
  }

  /** Per-event apply, cloned from `ProjektorState.cs:623-668`:
    * Created resets everything; updates only apply when created. */
  private def applyInst(st: Option[InstState], e: InstEvent): Option[InstState] =
    e.event_type match {
      case "InstallationCreated" =>
        Some(InstState(created = true, e.installation_id,
          Option(e.unit_address_id), Option(e.status), Option(e.location_remark)))
      case "InstallationUnitAddressChanged" =>
        st.map(_.copy(unit_address_id = Option(e.unit_address_id)))
      case "InstallationStatusChanged" =>
        st.map(_.copy(status = Option(e.status)))
      case "InstallationLocationRemarkChanged" =>
        st.map(_.copy(location_remark = Option(e.location_remark)))
      case _ => st
    }

  def installationCdc(events: Dataset[InstEvent]): Dataset[InstCdc] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, evts: Iterator[InstEvent], state: GroupState[InstState]) =>
          val sorted = evts.toSeq.sortBy(_.seq)
          val init = state.getOption
          val fin = sorted.foldLeft(init)(applyInst)
          fin match {
            case Some(s) =>
              state.update(s)
              if (fin != init)
                Iterator.single(InstCdc(Cdc.Upsert, id, s.installation_id,
                  s.unit_address_id, s.status, s.location_remark))
              else Iterator.empty
            case None => Iterator.empty
          }
      }
  }

  def workTaskEvents(decoded: DataFrame): Dataset[WtEvent] = {
    import decoded.sparkSession.implicits._
    decoded.filter(col("event_type").isin("WorkTaskCreated", "WorkTaskStatusChanged"))
      .select(col("seq"), col("event_type"), col("p.workTaskId").as("id"),
        col("p.workTask.number").as("number"),
        coalesce(col("p.workTask.status"), col("p.status")).as("status"))
      .as[WtEvent]
  }

  /** `ProjektorState.cs:591-613`: empty-status create is a full no-op;
    * status change applies only to existing tasks. */
  private def applyWt(st: Option[WtState], e: WtEvent): Option[WtState] =
    e.event_type match {
      case "WorkTaskCreated" =>
        if (e.status == null || e.status.isEmpty) st
        else Some(WtState(e.number, e.status))
      case "WorkTaskStatusChanged" => st.map(_.copy(status = e.status))
      case _ => st
    }

  def workTaskCdc(events: Dataset[WtEvent]): Dataset[WtCdc] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, evts: Iterator[WtEvent], state: GroupState[WtState]) =>
          val init = state.getOption
          val fin = evts.toSeq.sortBy(_.seq).foldLeft(init)(applyWt)
          fin match {
            case Some(s) if fin != init =>
              state.update(s)
              Iterator.single(WtCdc(Cdc.Upsert, id, s.number, s.status))
            case Some(s) => state.update(s); Iterator.empty
            case None => Iterator.empty
          }
      }
  }

  def interestEvents(decoded: DataFrame): Dataset[WoiEvent] = {
    import decoded.sparkSession.implicits._
    decoded.filter(col("event_type").isin("WalkOfInterestRegistered",
        "WalkOfInterestRouteNetworkElementsModified", "InterestUnregistered"))
      .select(col("seq"), col("event_type"),
        coalesce(col("p.interest.id"), col("p.interestId")).as("id"),
        array_distinct(coalesce(col("p.interest.routeNetworkElementRefs"),
          col("p.routeNetworkElementIds"))).as("walk"))
      .as[WoiEvent]
  }

  /** `ProjektorState.cs:99-113`: register/modify overwrite (deduped),
    * unregister deletes; modify after unregister re-creates. Emits a
    * delete CDC (walk replacement is delete-then-reinsert at the sink,
    * `RelationalDatabaseProjection.cs:444-452`). */
  private def applyWoi(st: Option[WoiState], e: WoiEvent): Option[WoiState] =
    e.event_type match {
      case "InterestUnregistered" => None
      case _ => Some(WoiState(e.walk))
    }

  def interestCdc(events: Dataset[WoiEvent]): Dataset[WoiCdc] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, evts: Iterator[WoiEvent], state: GroupState[WoiState]) =>
          val init = state.getOption
          val fin = evts.toSeq.sortBy(_.seq).foldLeft(init)(applyWoi)
          (init, fin) match {
            case (_, Some(s)) if fin != init =>
              state.update(s)
              Iterator.single(WoiCdc(Cdc.Upsert, id, s.walk))
            case (Some(_), None) =>
              state.remove()
              Iterator.single(WoiCdc(Cdc.Delete, id, Seq.empty))
            case _ => Iterator.empty
          }
      }
  }

  /** Decode raw envelopes — shared entry for batch and readStream inputs. */
  def decode(raw: DataFrame): DataFrame = EventLog.decode(raw)
}
