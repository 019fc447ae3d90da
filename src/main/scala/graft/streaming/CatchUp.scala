package graft.streaming

import graft.projector.{Derivations, EventLog}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** EP2 — incremental catch-up (SURVEY.md §3): a Structured Streaming query
  * over the event-log directory; each micro-batch is folded into the
  * materialized tables by **affected-key re-derivation**:
  *
  *   1. append the batch to the cumulative log store;
  *   2. compute the touched entity keys per family from the batch
  *      (span-equipment affixes resolve parent ids; placement-time
  *      snapshot semantics mean dimension/walk/container events do NOT
  *      retroactively touch existing entities — SURVEY.md §3's ordering
  *      contract, which the batch fold honors via as-of windows);
  *   3. re-run the batch derivations over the log restricted to touched
  *      keys (dimension + relation timelines kept whole — they are small
  *      relative to the fact log) and merge results into the store
  *      (delete-by-key + insert, the reference's list-replace pattern,
  *      `RelationalDatabaseProjection.cs:444-452`).
  *
  * conduit_slack is an aggregate over *current* span-equipment state, so
  * the touched scope is the union of the old and new from/to route nodes
  * of touched equipment; it is recomputed for exactly those nodes.
  *
  * Store = parquet directories (overwrite-merge). In production the same
  * merge is a Delta/Iceberg MERGE INTO or the JDBC upsert of
  * [[graft.sinks.JdbcSink]]; the derivation logic is identical.
  */
object CatchUp {

  /** Entity-key extraction per family from decoded events (same coalesce
    * chains as the derivations). */
  private def touchedKeys(batch: DataFrame, types: Seq[String], key: org.apache.spark.sql.Column): DataFrame =
    batch.filter(col("event_type").isin(types: _*)).select(key.as("k")).distinct()

  private val seTypes = Seq("SpanEquipmentPlacedInRouteNetwork", "SpanEquipmentMoved",
    "SpanEquipmentMerged", "SpanEquipmentRemoved", "SpanEquipmentSpecificationChanged",
    "SpanEquipmentAddressInfoChanged", "SpanEquipmentAffixedToParent",
    "SpanEquipmentDetachedFromParent")

  /** One incremental step: fold `batchDecoded` into the materialized
    * tables, given the cumulative decoded log `fullLog` (which already
    * includes the batch). Returns the per-table replacement row sets for
    * the touched scope; the caller merges them into its store.
    *
    * Each result pairs (touchedKeys, replacementRows): the store deletes
    * all rows whose key is in touchedKeys, then inserts replacementRows.
    */
  def incrementalStep(fullLog: DataFrame, batchDecoded: DataFrame): Map[String, (DataFrame, DataFrame)] = {
    val b = batchDecoded

    // --- per-entity families: touched ids straight from the batch ---
    val instKeys = touchedKeys(b, Seq("InstallationCreated", "InstallationUnitAddressChanged",
      "InstallationStatusChanged", "InstallationLocationRemarkChanged"), col("p.id"))
    val wtKeys = touchedKeys(b, Seq("WorkTaskCreated", "WorkTaskStatusChanged"), col("p.workTaskId"))
    val ncKeys = touchedKeys(b, Seq("NodeContainerPlacedInRouteNetwork",
      "NodeContainerRemovedFromRouteNetwork", "NodeContainerSpecificationChanged"),
      coalesce(col("p.container.id"), col("p.nodeContainerId")))
    val woiKeys = touchedKeys(b, Seq("WalkOfInterestRegistered",
      "WalkOfInterestRouteNetworkElementsModified", "InterestUnregistered"),
      coalesce(col("p.interest.id"), col("p.interestId")))
    val termKeys = touchedKeys(b, Seq("TerminalEquipmentPlacedInNodeContainer",
      "TerminalEquipmentRemoved", "TerminalEquipmentNamingInfoChanged",
      "TerminalEquipmentAddressInfoChanged"),
      coalesce(col("p.equipment.id"), col("p.terminalEquipmentId")))

    // span equipment: direct events + parents touched via affix/detach
    val directSe = touchedKeys(b, seTypes,
      coalesce(col("p.equipment.id"), col("p.spanEquipmentId")))
    val allSeState = Derivations.spanEquipmentState(fullLog).cache()
    val affixParents = b.filter(col("event_type") === "SpanEquipmentAffixedToParent" ||
        (col("event_type") === "SpanEquipmentPlacedInRouteNetwork" &&
          size(col("p.equipment.utilityNetworkHops")) > 0))
      .select(explode(flatten(coalesce(col("p.newUtilityHopList"),
        col("p.equipment.utilityNetworkHops")).getField("parentAffixes"))).as("a"))
      .select(col("a.spanSegmentId").as("root_segment_id")).distinct()
      .join(allSeState.select(col("root_segment_id"), col("id")), Seq("root_segment_id"))
      .select(col("id").as("k"))
    // detach touches the child's accumulated parents: conservative scope =
    // every equipment the child ever affixed to (derivable from the log)
    val detachChildren = touchedKeys(b, Seq("SpanEquipmentDetachedFromParent"), col("p.spanEquipmentId"))
    val historicParents = fullLog
      .filter(col("event_type") === "SpanEquipmentAffixedToParent")
      .join(detachChildren, col("p.spanEquipmentId") === col("k"))
      .select(explode(flatten(col("p.newUtilityHopList").getField("parentAffixes"))).as("a"))
      .select(col("a.spanSegmentId").as("root_segment_id")).distinct()
      .join(allSeState.select(col("root_segment_id"), col("id")), Seq("root_segment_id"))
      .select(col("id").as("k"))
    val seKeys = directSe.unionByName(affixParents).unionByName(historicParents).distinct()

    // --- re-derive restricted scopes over the full log ---
    def restrict(df: DataFrame, keyCol: String, keys: DataFrame): DataFrame =
      df.join(keys.withColumnRenamed("k", keyCol), Seq(keyCol), "left_semi")

    val inst = restrict(Derivations.installation(fullLog), "id", instKeys)
    val wt = restrict(Derivations.workTask(fullLog), "id", wtKeys)
    val nc = restrict(Derivations.nodeContainer(fullLog), "id", ncKeys)
    val relInterest = restrict(Derivations.relInterestToRouteElement(fullLog), "interest_id", woiKeys)
    val st = restrict(Derivations.serviceTermination(fullLog), "id", termKeys)
    val se = restrict(Derivations.spanEquipment(fullLog), "id", seKeys)
    // cable walks: touched = any touched span equipment (placement/affix/
    // detach re-apply; walk events never retrigger — snapshot semantics)
    val relCable = restrict(Derivations.relFiberCableToRouteElement(fullLog), "fiber_cable_id", seKeys)

    // conduit_slack: touched route nodes = new from/to nodes of touched
    // equipment PLUS their pre-batch (vacated) from/to nodes — a Moved
    // equipment decrements the node it left. Old positions come from a
    // fold of the log as of just before the batch (in production this read
    // comes from a keyed state table instead of re-folding).
    val minBatchSeq = b.agg(min(col("seq"))).head().getLong(0)
    val enriched = Derivations.spanEquipmentEnriched(fullLog)
    val prevEnriched = Derivations.spanEquipmentEnriched(fullLog.filter(col("seq") < minBatchSeq))
    def nodesOf(df: DataFrame) =
      df.join(seKeys.withColumnRenamed("k", "id"), Seq("id"), "left_semi")
        .select(explode(array(col("from_node_id"), col("to_node_id"))).as("k"))
    val touchedNodes = nodesOf(enriched)
      .unionByName(nodesOf(prevEnriched))
      .distinct()
    val slack = restrict(Derivations.conduitSlack(fullLog), "route_node_id", touchedNodes)

    Map(
      "installation" -> (instKeys, inst),
      "work_task" -> (wtKeys, wt),
      "node_container" -> (ncKeys, nc),
      "rel_interest_to_route_element" -> (woiKeys, relInterest),
      "service_termination" -> (termKeys, st),
      "span_equipment" -> (seKeys, se),
      "rel_fiber_cable_to_route_element" -> (seKeys, relCable),
      "conduit_slack" -> (touchedNodes, slack))
  }

  /** Key column per table for the delete-then-insert merge. */
  val mergeKey: Map[String, String] = Map(
    "installation" -> "id", "work_task" -> "id", "node_container" -> "id",
    "rel_interest_to_route_element" -> "interest_id",
    "service_termination" -> "id", "span_equipment" -> "id",
    "rel_fiber_cable_to_route_element" -> "fiber_cable_id",
    "conduit_slack" -> "route_node_id")

  /** Merge a step result into a parquet table store: delete touched keys,
    * insert replacements. (Delta/Iceberg MERGE or JDBC upsert in prod.) */
  def mergeIntoStore(spark: SparkSession, stateDir: String,
      results: Map[String, (DataFrame, DataFrame)]): Unit = {
    results.foreach { case (table, (keys, replacement)) =>
      val path = s"$stateDir/$table"
      val keyCol = mergeKey(table)
      val merged =
        if (new java.io.File(path).exists()) {
          val old = spark.read.parquet(path)
          old.join(keys.withColumnRenamed("k", keyCol), Seq(keyCol), "left_anti")
            .unionByName(replacement)
        } else replacement
      val tmp = s"$stateDir/.tmp_$table"
      merged.write.mode("overwrite").parquet(tmp)
      val target = new java.io.File(path)
      if (target.exists()) {
        val trash = new java.io.File(s"$stateDir/.old_$table")
        deleteRec(trash)
        target.renameTo(trash)
        deleteRec(trash)
      }
      new java.io.File(tmp).renameTo(target)
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  /** The long-running catch-up service: streams the event-log directory
    * (2-second trigger mirroring `Worker.cs:47`) and folds each micro-batch
    * into the parquet store.
    *
    * Usage: runMain graft.streaming.CatchUp <eventsDir> <stateDir>
    */
  def main(args: Array[String]): Unit = {
    val Array(eventsDir, stateDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-catchup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "seq BIGINT, event_type STRING, payload STRING")
    val raw = spark.readStream.schema(schema).parquet(eventsDir)
    val q = raw.writeStream
      .trigger(Trigger.ProcessingTime("2 seconds"))
      .option("checkpointLocation", s"$stateDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        if (!batch.isEmpty) {
          batch.write.mode("append").parquet(s"$stateDir/log")
          val fullLog = EventLog.decode(spark.read.parquet(s"$stateDir/log"))
          val decoded = EventLog.decode(batch)
          mergeIntoStore(spark, stateDir, incrementalStep(fullLog, decoded))
          // health signal after first successful fold (Worker.cs:37-38)
          new java.io.File("/tmp/graft-healthy").createNewFile()
        }
        batch.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
  }
}
