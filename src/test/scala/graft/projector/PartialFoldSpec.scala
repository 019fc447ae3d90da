package graft.projector

import graft.SparkTestBase
import graft.ops.Folds
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

import scala.util.Random

/** Pins the r8 fused-fold property every family merge relies on: merging
  * a PREFIX's aggregated partial with the TAIL's event-level rows
  * ([[Derivations]]' `*PartialRows`) in one
  * [[graft.ops.Folds.mergePartials]] aggregation equals the whole-log
  * partial. This is exactly the shape `Incremental.step` executes
  * (`stored partial ∪ batch event rows`), so a drifted marker expression
  * in a `*PartialRows` projection — the bug class the refactor could
  * introduce — fails here with per-family attribution instead of
  * surfacing as a distant golden-table diff. Exactness argument:
  * markers are event seqs, prefix seqs < tail seqs, and seqs are unique,
  * so max-by-marker is split-point-invariant.
  */
class PartialFoldSpec extends SparkTestBase {

  private val envelopeSchema =
    StructType.fromDDL("seq BIGINT, event_type STRING, payload STRING")

  private def toDf(rows: Seq[Row]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, envelopeSchema)
  }

  private def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case s: Seq[_] => s.toVector
      case v => v
    }).toSet

  test("prefix partial ∪ tail rows folds to the whole-log partial, per family") {
    val events = LogGen.scenario(new Random(29))
    val all = events.zipWithIndex.map { case (e, i) => Row((i + 1).toLong, e.typ, e.payload) }
    // split at 60% — same shape as the seed/catch-up handoff
    val cut = (all.size * 6) / 10
    val whole = EventLog.decode(toDf(all)).cache()
    val prefix = EventLog.decode(toDf(all.take(cut))).cache()
    val tail = EventLog.decode(toDf(all.drop(cut))).cache()
    try {
      // ADVICE r8: the terminal family — the only one with extra plain
      // seq markers (placement_seq/removed_seq) and a two-source
      // placement∪update row union — gets its own case. The placement
      // resolution (container as-of + spec eligibility) is deliberately
      // held split-INVARIANT (whole-log rel timeline + whole-log specs on
      // both sides: the as-of window only looks backward, so later rel
      // rows cannot change a placement's resolution) so the case isolates
      // exactly the fold/marker property: a drifted marker expression in
      // terminalPartialRows fails HERE with attribution instead of as a
      // distant golden-table diff.
      val relWhole = Derivations.containerRelEvents(whole)
      val specsWhole = Derivations.terminalSpecs(whole)
      def termP(ev: DataFrame) = (
        Derivations.terminalPlacementRows(relWhole,
          Derivations.terminalPlacements(ev), specsWhole),
        Derivations.terminalUpdateRows(ev))
      val (wPla, wUpd) = termP(whole)
      val (pPla, pUpd) = termP(prefix)
      val (tPla, tUpd) = termP(tail)
      val cases: Seq[(String, DataFrame, DataFrame, DataFrame, String,
          Seq[(String, String)], Seq[String])] = Seq(
        ("installation", Derivations.installationPartial(whole),
          Derivations.installationPartial(prefix),
          Derivations.installationPartialRows(tail), "id",
          Derivations.installationPartialPairs, Nil),
        ("work_task", Derivations.workTaskPartial(whole),
          Derivations.workTaskPartial(prefix),
          Derivations.workTaskPartialRows(tail), "id",
          Derivations.workTaskPartialPairs, Nil),
        ("node_container", Derivations.nodeContainerPartial(whole),
          Derivations.nodeContainerPartial(prefix),
          Derivations.nodeContainerPartialRows(tail), "id",
          Derivations.nodeContainerPartialPairs, Nil),
        ("interest", Derivations.interestPartial(whole),
          Derivations.interestPartial(prefix),
          Derivations.interestPartialRows(tail), "interest_id",
          Derivations.interestPartialPairs, Nil),
        ("span", Derivations.spanEquipmentPartial(whole),
          Derivations.spanEquipmentPartial(prefix),
          Derivations.spanEquipmentPartialRows(tail), "id",
          Derivations.spanPartialPairs, Nil),
        ("terminal", Derivations.terminalPartial(wPla, wUpd),
          Derivations.terminalPartial(pPla, pUpd),
          Derivations.terminalPartialRows(tPla, tUpd), "id",
          Derivations.terminalPartialPairs, Derivations.terminalPartialSeqs))
      cases.foreach { case (fam, wholeP, prefixP, tailRows, idCol, pairs, seqs) =>
        val merged = Folds.mergePartials(Seq(prefixP, tailRows), idCol, pairs, seqs)
        val got = rowSet(merged)
        val want = rowSet(wholeP)
        assert(got === want, s"family $fam: prefix∪tail fold diverged from whole-log fold")
        assert(want.nonEmpty, s"family $fam parity is vacuous — scenario folds no rows")
      }
    } finally { Seq(whole, prefix, tail).foreach(_.unpersist()); () }
  }
}
