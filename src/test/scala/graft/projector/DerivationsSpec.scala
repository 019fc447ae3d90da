package graft.projector

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}

import scala.util.Random

/** The 8 table derivations vs. the reference-faithful simulator oracle on
  * seeded well-formed event logs (golden equivalence, SURVEY.md §5.2-3).
  */
class DerivationsSpec extends SparkTestBase {

  private def opt(v: Any): Option[String] = Option(v).map(_.toString)

  private def runLog(events: Seq[Sim.Evt]): (Sim.State, Map[String, DataFrame]) = {
    val sim = new Sim.State
    events.foreach(sim.apply)
    import scala.jdk.CollectionConverters._
    val rows = events.zipWithIndex.map { case (e, i) =>
      Row((i + 1).toLong, e.typ, e.payload)
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "seq BIGINT, event_type STRING, payload STRING")
    val raw = spark.createDataFrame(rows.asJava, schema)
    val ev = EventLog.decode(raw).cache()
    (sim, Derivations.deriveAll(ev))
  }

  private def checkAll(seed: Int): Unit = {
    val events = LogGen.scenario(new Random(seed))
    val (sim, tables) = runLog(events)

    val relInterest = tables("rel_interest_to_route_element").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(relInterest === sim.relInterest, s"rel_interest_to_route_element seed=$seed")

    val relCable = tables("rel_fiber_cable_to_route_element").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(relCable === sim.relFiberCable, s"rel_fiber_cable_to_route_element seed=$seed")

    val nc = tables("node_container").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(nc === sim.nodeContainers, s"node_container seed=$seed")

    val se = tables("span_equipment").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getBoolean(3), r.getString(4), r.getString(5), opt(r.get(6)), opt(r.get(7)))).toSet
    assert(se === sim.spanEquipments, s"span_equipment seed=$seed")

    val st = tables("service_termination").collect()
      .map(r => (r.getString(0), r.getString(1), opt(r.get(2)), opt(r.get(3)), opt(r.get(4)))).toSet
    assert(st === sim.serviceTerminations, s"service_termination seed=$seed")

    val slack = tables("conduit_slack").collect()
      .map(r => (r.getString(1), r.getInt(2))).toSet
    assert(slack === sim.conduitSlacks, s"conduit_slack seed=$seed")
    // deterministic UUID-shaped ids
    tables("conduit_slack").collect().foreach { r =>
      assert(r.getString(0).matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    }

    val wt = tables("work_task").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(wt === sim.workTasks, s"work_task seed=$seed")

    val inst = tables("installation").collect()
      .map(r => (r.getString(0), r.getString(1), opt(r.get(2)), opt(r.get(3)), opt(r.get(4)))).toSet
    assert(inst === sim.installations, s"installation seed=$seed")
  }

  test("all 8 tables match the reference simulator (seed 1)") { checkAll(1) }
  test("all 8 tables match the reference simulator (seed 2)") { checkAll(2) }
  test("all 8 tables match the reference simulator (seed 3)") { checkAll(3) }

  /** Property-style bulk check: 30 random scenarios under disjoint id
    * namespaces concatenated into ONE log — a single Spark pass validates
    * 30 independent random interleavings against the simulator (cheap
    * breadth that 3 individual seeds can't give).
    */
  test("30 merged random scenarios match the reference simulator") {
    val events = (0 until 30).flatMap { i =>
      LogGen.scenario(new Random(1000 + i), pfx = s"s$i-")
    }
    val (sim, tables) = runLog(events)
    val relInterest = tables("rel_interest_to_route_element").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(relInterest === sim.relInterest)
    val relCable = tables("rel_fiber_cable_to_route_element").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(relCable === sim.relFiberCable)
    val nc = tables("node_container").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(nc === sim.nodeContainers)
    val se = tables("span_equipment").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getBoolean(3), r.getString(4), r.getString(5), opt(r.get(6)), opt(r.get(7)))).toSet
    assert(se === sim.spanEquipments)
    val st = tables("service_termination").collect()
      .map(r => (r.getString(0), r.getString(1), opt(r.get(2)), opt(r.get(3)), opt(r.get(4)))).toSet
    assert(st === sim.serviceTerminations)
    val slack = tables("conduit_slack").collect()
      .map(r => (r.getString(1), r.getInt(2))).toSet
    assert(slack === sim.conduitSlacks)
    val wt = tables("work_task").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(wt === sim.workTasks)
    val inst = tables("installation").collect()
      .map(r => (r.getString(0), r.getString(1), opt(r.get(2)), opt(r.get(3)), opt(r.get(4)))).toSet
    assert(inst === sim.installations)
  }
}
