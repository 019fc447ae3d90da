package graft.projector

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}

import scala.util.Random

/** Reference-exact conduit_slack compat mode (r1 #8 / r2 #8): the ±1
  * ledger replay must reproduce the simulator — which mirrors the
  * reference's handler code byte for byte, INCLUDING its double-count
  * behaviors (`ProjektorState.cs:398-414`) — on exactly the sequences the
  * default invariant recount declines to follow.
  */
class SlackCompatSpec extends SparkTestBase {

  import Sim._

  private def spark_(events: Seq[Evt], compat: Boolean): Set[(String, Int)] = {
    import scala.jdk.CollectionConverters._
    val rows = events.zipWithIndex.map { case (e, i) => Row((i + 1).toLong, e.typ, e.payload) }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "seq BIGINT, event_type STRING, payload STRING")
    val ev = EventLog.decode(spark.createDataFrame(rows.asJava, schema)).cache()
    val df: DataFrame =
      if (compat) Derivations.conduitSlackCompat(ev) else Derivations.conduitSlack(ev)
    df.collect().map(r => (r.getString(1), r.getInt(2))).toSet
  }

  private def sim_(events: Seq[Evt]): Set[(String, Int)] = {
    val s = new Sim.State
    events.foreach(s.apply)
    s.conduitSlacks
  }

  /** ø12 parent with both ends unconnected at (n1, n2); cable child. */
  private def base(pfx: String): (Vector[Evt], String, String) = {
    val events = Vector(
      SsSpecAdded(s"${pfx}ss", 12),
      SeSpecAdded(s"${pfx}cust", "Ø12 customer conduit", isCable = false, s"${pfx}ss"),
      SeSpecAdded(s"${pfx}cable", "Fiber cable", isCable = true, s"${pfx}ss"),
      WalkRegistered(s"${pfx}woi-p", Vector(s"${pfx}n1", s"${pfx}n2")),
      WalkRegistered(s"${pfx}woi-c", Vector(s"${pfx}n1", s"${pfx}n2")))
    (events, s"${pfx}n1", s"${pfx}n2")
  }

  private def place(pfx: String, id: String, seg: String, woi: String, spec: String,
      nodes: Vector[String]): Evt =
    SePlaced(id, s"SE $id", spec, woi, isCable = spec.endsWith("cable"), nodes,
      Seq(Seq(Seg(seg, 0, nodes.length - 1, EmptyUuid, EmptyUuid))), None, None)

  test("duplicate affix + detach double-counts exactly like the reference") {
    val pfx = "a-"
    val (pre, n1, n2) = base(pfx)
    val hops = Seq(Hop(n1, n2, Seq(s"${pfx}seg-p")))
    val events = pre ++ Vector(
      place(pfx, s"${pfx}P", s"${pfx}seg-p", s"${pfx}woi-p", s"${pfx}cust", Vector(n1, n2)),
      place(pfx, s"${pfx}C", s"${pfx}seg-c", s"${pfx}woi-c", s"${pfx}cable", Vector(n1, n2)),
      SeAffixed(s"${pfx}C", hops),
      SeAffixed(s"${pfx}C", hops), // duplicate — parent re-appended to the list
      SeDetached(s"${pfx}C", hops))
    val sim = sim_(events)
    assert(sim === Set(n1 -> 2, n2 -> 2), s"simulator (reference) behavior changed: $sim")
    assert(spark_(events, compat = true) === sim)
    // the invariant recount reports the defensible answer instead
    assert(spark_(events, compat = false) === Set(n1 -> 1, n2 -> 1))
  }

  test("shared parent, both children detach — second detach double-counts") {
    val pfx = "b-"
    val (pre, n1, n2) = base(pfx)
    val hops = Seq(Hop(n1, n2, Seq(s"${pfx}seg-p")))
    val events = pre ++ Vector(
      WalkRegistered(s"${pfx}woi-c2", Vector(n1, n2)),
      place(pfx, s"${pfx}P", s"${pfx}seg-p", s"${pfx}woi-p", s"${pfx}cust", Vector(n1, n2)),
      place(pfx, s"${pfx}C1", s"${pfx}seg-c1", s"${pfx}woi-c", s"${pfx}cable", Vector(n1, n2)),
      place(pfx, s"${pfx}C2", s"${pfx}seg-c2", s"${pfx}woi-c2", s"${pfx}cable", Vector(n1, n2)),
      SeAffixed(s"${pfx}C1", hops),
      SeAffixed(s"${pfx}C2", hops),
      SeDetached(s"${pfx}C1", hops),
      SeDetached(s"${pfx}C2", hops))
    val sim = sim_(events)
    assert(sim === Set(n1 -> 2, n2 -> 2), s"simulator (reference) behavior changed: $sim")
    assert(spark_(events, compat = true) === sim)
    assert(spark_(events, compat = false) === Set(n1 -> 1, n2 -> 1))
  }

  test("compat mode matches the simulator on pathological random scenarios") {
    Seq(5, 6).foreach { seed =>
      val events = LogGen.scenario(new Random(seed), pfx = s"p$seed-", slackPathologies = true)
      assert(spark_(events, compat = true) === sim_(events), s"seed $seed")
    }
  }

  test("compat mode equals the invariant recount on carve-out scenarios") {
    val events = LogGen.scenario(new Random(41), pfx = "w-")
    val compat = spark_(events, compat = true)
    assert(compat === spark_(events, compat = false))
    assert(compat === sim_(events))
  }
}
