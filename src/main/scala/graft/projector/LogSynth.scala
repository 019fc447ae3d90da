package graft.projector

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import scala.util.Random

/** Deterministic envelope-log synthesizer for ENGINE benchmarking — the
  * input for the BASELINE.md engine-internal regression metrics (backfill
  * wall-clock, sustained catch-up events/sec). Event payload shapes follow
  * FIXTURES.md §2 (the reference's event contracts,
  * `RelationalDatabaseProjection.cs` handlers); semantic CORRECTNESS of the
  * fold is proven elsewhere (DerivationsSpec against the simulator) — this
  * generator's job is a realistic, referentially-ordered mix across all 8
  * projected tables at a size parameterized by `sites`.
  *
  * Deterministic for a (sites, seed) pair, so round-over-round bench
  * numbers compare identical workloads.
  */
object LogSynth {

  private object Js {
    def s(v: String): String = "\"" + v + "\"" // ids only — no escapes needed
    def arr(items: Iterable[String]): String = items.mkString("[", ",", "]")
    def obj(fields: (String, String)*): String =
      fields.filter(_._2 != null).map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
  }
  private def seg(id: String, from: Int, to: Int): String =
    Js.obj("id" -> Js.s(id), "fromNodeOfInterestIndex" -> from.toString,
      "toNodeOfInterestIndex" -> to.toString,
      "fromTerminalId" -> Js.s(EventLog.EmptyUuid), "toTerminalId" -> Js.s(EventLog.EmptyUuid))
  private def hop(from: String, to: String, parentSeg: String): String =
    Js.obj("fromNodeId" -> Js.s(from), "toNodeId" -> Js.s(to),
      "parentAffixes" -> Js.arr(Seq(Js.obj("spanSegmentId" -> Js.s(parentSeg)))))

  /** The full synthetic log: `(seq, event_type, payload)` in seq order —
    * ~13 events per site plus a shared dimension preamble. */
  def events(sites: Int, seed: Long = 42L): Vector[(Long, String, String)] = {
    val rnd = new Random(seed)
    val out = Vector.newBuilder[(String, String)]
    def emit(typ: String, payload: String): Unit = out += ((typ, payload))

    // shared specification dimensions
    emit("NodeContainerSpecificationAdded", Js.obj("specification" ->
      Js.obj("id" -> Js.s("ncs-1"), "name" -> Js.s("Well 1000"), "category" -> Js.s("WELL"))))
    emit("SpanStructureSpecificationAdded", Js.obj("specification" ->
      Js.obj("id" -> Js.s("sss-12"), "outerDiameter" -> "12")))
    emit("SpanStructureSpecificationAdded", Js.obj("specification" ->
      Js.obj("id" -> Js.s("sss-50"), "outerDiameter" -> "50")))
    emit("SpanEquipmentSpecificationAdded", Js.obj("specification" ->
      Js.obj("id" -> Js.s("ses-cond"), "name" -> Js.s("Ø12 customer conduit"),
        "isCable" -> "false", "rootTemplate" -> Js.obj("spanStructureSpecificationId" -> Js.s("sss-12")))))
    emit("SpanEquipmentSpecificationAdded", Js.obj("specification" ->
      Js.obj("id" -> Js.s("ses-cable"), "name" -> Js.s("Fiber cable 48"),
        "isCable" -> "true", "rootTemplate" -> Js.obj("spanStructureSpecificationId" -> Js.s("sss-50")))))
    emit("TerminalEquipmentSpecificationAdded", Js.obj("specification" ->
      Js.obj("id" -> Js.s("tes-cust"), "isCustomerTermination" -> "true")))

    (0 until sites).foreach { k =>
      val nodes = (0 until 4).map(i => s"rn-$k-$i")
      // work task + installation churn
      emit("WorkTaskCreated", Js.obj("workTaskId" -> Js.s(s"wt-$k"),
        "workTask" -> Js.obj("number" -> Js.s(s"N-$k"), "status" -> Js.s("created"))))
      emit("WorkTaskStatusChanged", Js.obj("workTaskId" -> Js.s(s"wt-$k"),
        "status" -> Js.s(if (rnd.nextBoolean()) "in_progress" else "done")))
      emit("InstallationCreated", Js.obj("id" -> Js.s(s"inst-$k"),
        "installationId" -> Js.s(s"I-$k"), "unitAddressId" -> Js.s(s"ua-$k"),
        "status" -> Js.s("planned"), "locationRemark" -> null))
      emit("InstallationStatusChanged", Js.obj("id" -> Js.s(s"inst-$k"),
        "status" -> Js.s("active")))
      // walk + conduit + cable over it
      emit("WalkOfInterestRegistered", Js.obj("interest" -> Js.obj(
        "id" -> Js.s(s"woi-$k"), "routeNetworkElementRefs" -> Js.arr(nodes.map(Js.s)))))
      emit("SpanEquipmentPlacedInRouteNetwork", Js.obj("equipment" -> Js.obj(
        "id" -> Js.s(s"cond-$k"), "name" -> Js.s(s"Conduit $k"),
        "specificationId" -> Js.s("ses-cond"), "walkOfInterestId" -> Js.s(s"woi-$k"),
        "isCable" -> "false", "nodesOfInterestIds" -> Js.arr(Seq(nodes.head, nodes.last).map(Js.s)),
        "spanStructures" -> Js.arr(Seq(Js.obj("spanSegments" -> Js.arr(Seq(seg(s"seg-$k", 0, 1)))))),
        "utilityNetworkHops" -> null, "addressInfo" -> null)))
      if (k % 2 == 0)
        emit("SpanEquipmentMoved", Js.obj("spanEquipmentId" -> Js.s(s"cond-$k"),
          "nodesOfInterestIds" -> Js.arr(Seq(nodes(1), nodes(2)).map(Js.s))))
      emit("SpanEquipmentPlacedInRouteNetwork", Js.obj("equipment" -> Js.obj(
        "id" -> Js.s(s"cab-$k"), "name" -> Js.s(s"Cable $k"),
        "specificationId" -> Js.s("ses-cable"), "walkOfInterestId" -> Js.s(s"woi-$k"),
        "isCable" -> "true", "nodesOfInterestIds" -> Js.arr(Seq(nodes.head, nodes.last).map(Js.s)),
        "spanStructures" -> Js.arr(Seq(Js.obj("spanSegments" -> Js.arr(Seq(seg(s"cseg-$k", 0, 1)))))),
        "utilityNetworkHops" -> Js.arr(Seq(hop(nodes.head, nodes(2), s"seg-$k"))),
        "addressInfo" -> null)))
      if (k % 2 == 1) {
        emit("SpanEquipmentAffixedToParent", Js.obj("spanEquipmentId" -> Js.s(s"cab-$k"),
          "newUtilityHopList" -> Js.arr(Seq(hop(nodes(1), nodes(3), s"seg-$k")))))
        if (k % 4 == 1)
          emit("SpanEquipmentDetachedFromParent", Js.obj("spanEquipmentId" -> Js.s(s"cab-$k"),
            "newUtilityHopList" -> Js.arr(Seq(hop(nodes(1), nodes(3), s"seg-$k")))))
      }
      // node container + customer termination
      emit("NodeContainerPlacedInRouteNetwork", Js.obj("container" -> Js.obj(
        "id" -> Js.s(s"nc-$k"), "routeNodeId" -> Js.s(nodes.head), "specificationId" -> Js.s("ncs-1"))))
      emit("TerminalEquipmentPlacedInNodeContainer", Js.obj("equipment" -> Js.obj(
        "id" -> Js.s(s"te-$k"), "name" -> Js.s(s"Term $k"),
        "specificationId" -> Js.s("tes-cust"), "nodeContainerId" -> Js.s(s"nc-$k"),
        "addressInfo" -> Js.obj("accessAddressId" -> Js.s(s"aa-$k"), "unitAddressId" -> null))))
      if (k % 3 == 0)
        emit("TerminalEquipmentNamingInfoChanged", Js.obj(
          "terminalEquipmentId" -> Js.s(s"te-$k"),
          "namingInfo" -> Js.obj("name" -> Js.s(s"renamed-$k"))))
    }
    out.result().zipWithIndex.map { case ((t, p), i) => ((i + 1).toLong, t, p) }
  }

  /** Update-only events over entities [[events]] created — the
    * steady-state tail a deployed projector actually sees (status changes
    * and moves, 2-3 families per batch, no new entities). Deterministic;
    * seqs start at `seqStart`. */
  def updates(sites: Int, count: Int, seqStart: Long): Vector[(Long, String, String)] = {
    (0 until count).toVector.map { i =>
      val k = i % sites
      val (typ, payload) = i % 3 match {
        case 0 => ("InstallationStatusChanged",
          Js.obj("id" -> Js.s(s"inst-$k"), "status" -> Js.s(s"state-${i % 7}")))
        case 1 => ("WorkTaskStatusChanged",
          Js.obj("workTaskId" -> Js.s(s"wt-$k"), "status" -> Js.s(s"phase-${i % 5}")))
        case _ => ("SpanEquipmentMoved",
          Js.obj("spanEquipmentId" -> Js.s(s"cond-$k"),
            "nodesOfInterestIds" -> Js.arr(Seq(s"rn-$k-${i % 3}", s"rn-$k-3").map(Js.s))))
      }
      (seqStart + i, typ, payload)
    }
  }

  val envelopeSchema: StructType = EventLog.envelopeSchema

  def toDf(spark: SparkSession, evts: Seq[(Long, String, String)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(evts.map { case (s, t, p) => Row(s, t, p) }.asJava, envelopeSchema)
  }

  /** Write the log as `chunks` flat parquet files with contiguous seq
    * ranges — each file becomes one micro-batch under
    * `maxFilesPerTrigger = 1` (flat files, not subdirectories, so the
    * stream source needs no partition discovery). */
  def write(spark: SparkSession, dir: String, evts: Seq[(Long, String, String)],
      chunks: Int): Unit = {
    val target = new java.io.File(dir)
    target.mkdirs()
    val per = math.max(1, math.ceil(evts.size.toDouble / chunks).toInt)
    evts.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-logsynth").toFile
      try {
        toDf(spark, chunk).coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          new java.io.File(target, f"chunk-$i%03d.parquet").toPath)
        ()
      } finally graft.util.Scratch.deleteRecursively(tmp)
    }
  }
}
