package graft.streaming

import graft.ops.{Folds, Walks}
import graft.projector.{Derivations, EventLog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** O(delta) incremental catch-up: fold ONE micro-batch of events into the
  * materialized tables using only (a) the batch and (b) keyed reads of
  * stored state — never the cumulative log.
  *
  * This is the Spark re-expression of the reference's per-event dictionary
  * apply (`Worker.cs:40-48`, `ProjektorState.cs:23-125`): where the
  * reference holds every entity in one process heap and mutates it per
  * event, this engine keeps per-entity **mergeable partial folds** in a
  * bucket-partitioned parquet [[StateStore]] and, per micro-batch,
  *
  *   1. folds the batch alone into per-family partials (hash aggregates —
  *      O(batch));
  *   2. reads stored partials for exactly the touched keys
  *      ([[StateStore.readKeyed]] — bucket-pruned, O(touched buckets));
  *   3. merges field-wise with [[Folds.mergePartials]] (exact because the
  *      log is globally seq-ordered: the batch's markers always win);
  *   4. finalizes output rows for the touched keys and delete+reinserts
  *      them into the output tables ([[StateStore.mergeReplace]] and the
  *      optional JDBC [[Sink]] — the reference's list-replace pattern,
  *      `RelationalDatabaseProjection.cs:444-452`).
  *
  * Cross-entity state the reference keeps in auxiliary dictionaries gets a
  * state table each, maintained with the same touched-key discipline:
  *
  *   - `st_root_segment`: root-segment id → equipment id (affix parent
  *     resolution, `ProjektorState.cs:349-424`);
  *   - `st_child_affixes`: per child, the parents affixed since the
  *     child's last detach (what a detach must clear);
  *   - `st_has_child`: latest has-child flag per parent (seq-merged);
  *   - `st_eligible_ends`: one row per alive eligible conduit end,
  *     bucketed by ROUTE NODE so the per-node slack recount reads only
  *     touched buckets, while deletes key on equipment id (the
  *     `extraBucketValues` old-position contract of
  *     [[StateStore.mergeReplace]]).
  *
  * As-of semantics across the batch seam (interest walk at cable-apply
  * time, container relation at terminal-placement time) are preserved by
  * injecting the PRE-batch stored state as pseudo-events at their stored
  * marker seqs — strictly below every batch seq — and running the same
  * forward-fill windows as the batch derivation over (pseudo ∪ batch).
  *
  * Replay safety (two layers, both per foreachBatch `batchId`):
  *
  *   1. a COMPLETED step records its batchId in the store
  *      ([[StateStore.setLastAppliedBatch]]); a redelivered batch whose id
  *      is ≤ that is skipped outright — the common crash-between-step-and-
  *      checkpoint-commit case costs one metadata read;
  *   2. a step that crashed MID-way is redelivered and re-run, but every
  *      PRE-merge read it performs (family/dim/affix/has-child snapshots)
  *      was persisted under `_snap/batch=<id>/` before the first merge
  *      ([[StateStore.readKeyedSnap]]), so the replay consumes the true
  *      pre-batch state even from tables the crashed attempt already
  *      merged. Post-merge reads (root map, affix/detach span lookups,
  *      eligible-end recount inputs) re-derive identically because the
  *      merges themselves are deterministic delete+reinserts of
  *      (snapshot, batch) functions. Without the snapshots, a crash after
  *      the st_span merge would lose a moved equipment's vacated route
  *      nodes and permanently overcount conduit_slack there.
  *
  * Batch-mode callers (the [[CatchUp]] stream) pass the foreachBatch id;
  * `batchId = -1` (tests, ad-hoc folds) keeps plain non-snapshotted reads.
  */
object Incremental {

  /** Output tables and their delete/reinsert keys. */
  val outputKey: Map[String, String] = Map(
    "installation" -> "id", "work_task" -> "id", "node_container" -> "id",
    "rel_interest_to_route_element" -> "interest_id",
    "service_termination" -> "id", "span_equipment" -> "id",
    "rel_fiber_cable_to_route_element" -> "fiber_cable_id",
    "conduit_slack" -> "route_node_id")

  /** Output schemas (for reading a table that does not exist yet). */
  val outputSchema: Map[String, StructType] = Map(
    "rel_interest_to_route_element" -> StructType.fromDDL(
      "interest_id STRING, route_network_element_id STRING, seq_no INT"),
    "rel_fiber_cable_to_route_element" -> StructType.fromDDL(
      "fiber_cable_id STRING, route_network_element_id STRING, seq_no INT"),
    "node_container" -> StructType.fromDDL(
      "id STRING, route_node_id STRING, spec_name STRING, spec_category STRING"),
    "span_equipment" -> StructType.fromDDL(
      "id STRING, interest_id STRING, outer_diameter INT, is_cable BOOLEAN, " +
        "name STRING, spec_name STRING, access_address_id STRING, unit_address_id STRING"),
    "service_termination" -> StructType.fromDDL(
      "id STRING, route_node_id STRING, name STRING, access_address_id STRING, unit_address_id STRING"),
    "conduit_slack" -> StructType.fromDDL(
      "id STRING, route_node_id STRING, number_of_ends INT"),
    "work_task" -> StructType.fromDDL("id STRING, number STRING, status STRING"),
    "installation" -> StructType.fromDDL(
      "id STRING, installation_id STRING, unit_address_id STRING, status STRING, location_remark STRING"))

  private val rootSchema = StructType.fromDDL("root_segment_id STRING, id STRING")
  private val childAffixSchema = StructType.fromDDL("child_id STRING, parent_id STRING, seq BIGINT")
  private val hcSchema = StructType.fromDDL("parent_id STRING, has_child BOOLEAN, hc_seq BIGINT")
  private val eligSchema = StructType.fromDDL("id STRING, route_node_id STRING, end_kind STRING")

  /** Per-output-table sink hook, invoked after each table's store merge
    * with (table, deletedKeys, upserts). `deletedKeys` is a one-column
    * frame named after the table's primary delete key; semantics are
    * "delete every row whose key is in deletedKeys, then insert upserts"
    * — exactly the reference's per-row DML contract
    * (`PostgresWriter.cs:72-112`). Frames may be empty. */
  type Sink = (String, DataFrame, DataFrame) => Unit
  val noSink: Sink = (_, _, _) => ()

  /** Dimension table → the single event type that feeds it (used to skip
    * all dim merges in one pass when a batch carries no spec events). */
  private val dimEventType: Map[String, String] = Map(
    "dim_span_equipment_spec" -> "SpanEquipmentSpecificationAdded",
    "dim_node_container_spec" -> "NodeContainerSpecificationAdded",
    "dim_span_structure_spec" -> "SpanStructureSpecificationAdded",
    "dim_terminal_spec" -> "TerminalEquipmentSpecificationAdded")

  // Event types feeding each family section — a batch with none of a
  // section's types skips the section outright (steady-state streams are
  // sparse: a 3-event installation batch must not pay the span chain's
  // ~40 actions). A skipped section's tables cannot change: every derived
  // row is a function of (stored state, family events), and with no family
  // events the delete+reinsert would rewrite identical rows.
  private val instTypes = Seq("InstallationCreated", "InstallationUnitAddressChanged",
    "InstallationStatusChanged", "InstallationLocationRemarkChanged")
  private val wtTypes = Seq("WorkTaskCreated", "WorkTaskStatusChanged")
  private val ncTermTypes = Seq("NodeContainerPlacedInRouteNetwork",
    "NodeContainerRemovedFromRouteNetwork", "NodeContainerSpecificationChanged",
    "TerminalEquipmentPlacedInNodeContainer", "TerminalEquipmentRemoved",
    "TerminalEquipmentNamingInfoChanged", "TerminalEquipmentAddressInfoChanged")
  private val spanTypes = Seq("SpanEquipmentPlacedInRouteNetwork", "SpanEquipmentMoved",
    "SpanEquipmentMerged", "SpanEquipmentRemoved", "SpanEquipmentSpecificationChanged",
    "SpanEquipmentAddressInfoChanged", "SpanEquipmentAffixedToParent",
    "SpanEquipmentDetachedFromParent")
  private val interestTypes = Seq("WalkOfInterestRegistered",
    "WalkOfInterestRouteNetworkElementsModified", "InterestUnregistered")

  // Independent family sections of a step run concurrently (they touch
  // disjoint store tables): a step is ~70 small driver actions whose
  // planning latency, not data volume, bounds the 2-second loop — four
  // section threads overlap that latency. Daemon pool, shared across steps.
  private lazy val stepEc = scala.concurrent.ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newFixedThreadPool(6, (r: Runnable) => {
      val t = new Thread(r, "graft-step"); t.setDaemon(true); t
    }))

  /** Fold one decoded micro-batch into the store. See object doc.
    * `batchId` ≥ 0 enables the two replay-safety layers (skip-if-applied +
    * pre-merge snapshots); pass the foreachBatch id from a stream.
    *
    * Sections for independent table families run on [[stepEc]] threads;
    * sink callbacks are serialized (sink impls need not be thread-safe).
    * Write-write and write-read table sets across concurrent sections are
    * disjoint by construction (the interest/cable section launches only
    * after the st_span merge it reads). */
  def step(store: StateStore, batchDecoded: DataFrame, sink: Sink = noSink,
      batchId: Long = -1L): Unit = {
    if (batchId >= 0 && store.lastAppliedBatch.exists(_ >= batchId)) return
    if (batchId >= 0) store.clearSnapshots(batchId) // drop other batches' leftovers
    val sc = batchDecoded.sparkSession.sparkContext
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val rawSink = sink
    val syncSink: Sink = (t, d, u) => rawSink.synchronized { rawSink(t, d, u) }
    val pending = scala.collection.mutable.ArrayBuffer[Future[Any]]()
    def section(body: => Unit): Unit = { pending += Future(body)(stepEc); () }
    def tracked[T](body: => T): Future[T] = {
      val f = Future(body)(stepEc); pending += f; f
    }
    // Snapshot the persisted-RDD set: every localCheckpoint below caches
    // blocks that outlive the step (ContextCleaner frees them only on GC),
    // and a long-running stream — or a long test suite — accumulates them
    // until the MemoryStore chokes. All step outputs land in the store
    // files, so everything persisted WITHIN the step is garbage at exit.
    val persistedBefore = sc.getPersistentRDDs.keySet
    val b = batchDecoded.persist()
    try {
      // ---------- dimension tables (tiny; merged first — every family
      // finalizer joins them) ----------
      // ONE action decides which dim merges AND which family sections run
      // (instead of per-section isEmpty jobs on the 2-second hot path):
      // the distinct event types present in the batch
      val typesPresent = b
        .select(col("event_type")).distinct().collect().map(_.getString(0)).toSet
      def dimHas(table: String): Boolean = typesPresent(dimEventType(table))
      def has(ts: Seq[String]): Boolean = ts.exists(typesPresent)
      // the four dim merges are independent (disjoint tiny tables) and
      // every family section joins their results — run them concurrently
      // and join before launching the sections. Tracked in `pending` so the
      // finally-block quiesce covers them too: if the main thread throws
      // while a dim merge is still in flight, the step must not return with
      // a zombie write racing a redelivered step on the same dim table
      // (ADVICE r5).
      val fSeSpec = tracked(mergeDim(store, "dim_span_equipment_spec",
        Derivations.spanEquipmentSpecsPartial(b), "spec_id", Seq("s" -> "d_seq"),
        dimHas("dim_span_equipment_spec"), batchId))
      val fNcSpec = tracked(mergeDim(store, "dim_node_container_spec",
        Derivations.nodeContainerSpecsPartial(b), "spec_id", Seq("s" -> "d_seq"),
        dimHas("dim_node_container_spec"), batchId))
      val fStructSpec = tracked(mergeDim(store, "dim_span_structure_spec",
        Derivations.spanStructureSpecsPartial(b), "structure_spec_id",
        Seq("outer_diameter" -> "d_seq"),
        dimHas("dim_span_structure_spec"), batchId))
      val termSpecP = mergeDim(store, "dim_terminal_spec",
        Derivations.terminalSpecsPartial(b), "spec_id",
        Seq("is_customer_termination" -> "d_seq"),
        dimHas("dim_terminal_spec"), batchId)
      val seSpecP = Await.result(fSeSpec, Duration.Inf)
      val ncSpecP = Await.result(fNcSpec, Duration.Inf)
      val structSpecP = Await.result(fStructSpec, Duration.Inf)
      val eqSpecs = Derivations.spanEquipmentSpecsFromPartial(seSpecP)
      val ncSpecs = Derivations.nodeContainerSpecsFromPartial(ncSpecP)
      val structSpecs = structSpecP.drop("d_seq")
      val termSpecs = termSpecP.drop("d_seq")

      // ---------- simple per-entity families (concurrent sections) ----------
      if (has(instTypes)) section {
        val (instKeys, _, instMerged) = mergeFamily(store, "st_installation", "id",
          Derivations.installationPartial(b), Derivations.installationPartialPairs, Nil,
          batchId = batchId, snapshot = false)
        writeOutput(store, syncSink, "installation", instKeys,
          Derivations.installationFromPartial(instMerged))
      }

      if (has(wtTypes)) section {
        val (wtKeys, _, wtMerged) = mergeFamily(store, "st_work_task", "id",
          Derivations.workTaskPartial(b), Derivations.workTaskPartialPairs, Nil,
          batchId = batchId, snapshot = false)
        writeOutput(store, syncSink, "work_task", wtKeys,
          Derivations.workTaskFromPartial(wtMerged))
      }

      // ---------- node containers + service terminations (concurrent; see
      // below — moved ahead of the span chain so the section overlaps it) --
      if (has(ncTermTypes)) section {
        val termPlac = Derivations.terminalPlacements(b) // (seq, container_id, t)
        val contRefs = termPlac.select(col("container_id").as("k")).distinct()
        val (ncKeys, ncStored, ncMerged) = mergeFamily(store, "st_node_container", "id",
          Derivations.nodeContainerPartial(b), Derivations.nodeContainerPartialPairs, Nil,
          extraReadKeys = Some(contRefs), batchId = batchId)
        writeOutput(store, syncSink, "node_container", ncKeys,
          Derivations.nodeContainerFromPartial(ncMerged)
            .join(broadcast(ncSpecs), Seq("spec_id"), "inner")
            .select(col("id"), col("route_node_id"), col("spec_name"), col("spec_category")))

        val pseudoRel = ncStored.select(col("lc_seq").as("seq"),
          col("id").as("container_id"),
          struct(when(col("last_lifecycle") === "NodeContainerPlacedInRouteNetwork",
            col("route_node_id")).as("route_node_id")).as("rel"))
        val relRows = pseudoRel.unionByName(Derivations.containerRelEvents(b))
        val bTerm = Derivations.terminalPartial(
          Derivations.terminalPlacementRows(relRows, termPlac, termSpecs),
          Derivations.terminalUpdateRows(b))
        // st_terminal's own stored partial feeds only its merge (the as-of
        // inputs come from the st_node_container SNAPSHOT above)
        val (termKeys, _, termMerged) = mergeFamily(store, "st_terminal", "id", bTerm,
          Derivations.terminalPartialPairs, Derivations.terminalPartialSeqs,
          batchId = batchId, snapshot = false)
        writeOutput(store, syncSink, "service_termination", termKeys,
          Derivations.serviceTerminationFromPartial(termMerged))
      }

      // ---------- interests + cable walks (concurrent; launched after the
      // st_span merge when the span family is active — affix/detach
      // interest ids resolve from the POST-merge span partials; the as-of
      // resolve reads the PRE-merge interest snapshot) ----------
      val bSpan = Derivations.spanEquipmentPartial(b)
      def launchInterestSection(): Unit = section {
        val adChildren = b.filter(col("event_type") === "SpanEquipmentAffixedToParent" ||
            col("event_type") === "SpanEquipmentDetachedFromParent")
          .select(col("p.spanEquipmentId").as("k")).distinct()
        val adSpan = store.readKeyed("st_span", bSpan.schema, "id", adChildren)
        val interestOf = adSpan.select(col("id").as("cable_id"),
          col("pl").getField("walk_of_interest_id").as("interest_id"))
        val applies = Derivations
          .cablePlacementApplies(b, eqSpecs.select(col("spec_id"), col("spec_is_cable")))
          .unionByName(Derivations.cableAffixDetachApplies(b, interestOf))
        val lastApply = Derivations.lastApplyOf(applies).localCheckpoint(true)
        val applyInterests = lastApply.select(col("interest_id").as("k")).distinct()

        val (intKeys, intStored, intMerged) = mergeFamily(store, "st_interest", "interest_id",
          Derivations.interestPartial(b), Derivations.interestPartialPairs, Nil,
          extraReadKeys = Some(applyInterests), batchId = batchId)
        writeOutput(store, syncSink, "rel_interest_to_route_element", intKeys,
          Walks.explodeOrdered(
            Derivations.interestFromPartial(intMerged).filter(col("alive"))
              .select(col("interest_id"), col("walk")),
            "walk", "route_network_element_id", "seq_no")
            .select(col("interest_id"), col("route_network_element_id"), col("seq_no")))

        // pre-batch interest state as pseudo walk events at the stored seq
        // (strictly below every batch seq); an unregistered interest yields
        // the struct(null) marker that survives forward fill
        val hopsType = EventLog.payloadSchema("newUtilityHopList").dataType
        val pseudoWalk = intStored.select(col("lt_seq").as("seq"), col("interest_id"),
          struct(when(col("last_type") =!= "InterestUnregistered", col("walk")).as("walk")).as("w"),
          lit(null.asInstanceOf[String]).as("cable_id"),
          lit(null).cast(hopsType).as("hops"))
        val walkEvents = Derivations.interestWalkEvents(b).unionByName(pseudoWalk)
        val cableKeys = lastApply.select(col("cable_id").as("k")).distinct().localCheckpoint(true)
        writeOutput(store, syncSink, "rel_fiber_cable_to_route_element", cableKeys,
          Walks.explodeOrdered(Derivations.cableWalkResolve(walkEvents, lastApply),
            "walk", "route_network_element_id", "seq_no")
            .select(col("fiber_cable_id"), col("route_network_element_id"), col("seq_no")))
      }

      // ---------- span equipment chain: partial merge + root-segment
      // index + affix/has-child state + outputs + slack recount ----------
      if (has(spanTypes)) {
      val (seKeys, seStored, seMerged) = mergeFamily(store, "st_span", "id",
        bSpan, Derivations.spanPartialPairs, Nil, batchId = batchId)
      launchInterestSection() // reads POST-merge st_span

      val newRoots = rootIndexOf(seMerged)
      val rootKeys = newRoots.select(col("root_segment_id").as("k"))
        .unionByName(rootIndexOf(seStored).select(col("root_segment_id").as("k")))
        .distinct()
      store.mergeReplace("st_root_segment", "root_segment_id", rootKeys, newRoots)

      // ---------- affix timeline → child-affix + has-child state ----------
      val edges = Derivations.affixEdges(b) // (child_id, seq, root_segment_id)
      val rootIds = edges.select(col("root_segment_id").as("k")).distinct()
      val rootMap = store.readKeyed("st_root_segment", rootSchema, "root_segment_id", rootIds)
      val batchAffixes = edges.join(rootMap, Seq("root_segment_id"))
        .select(col("child_id"), col("seq"), col("id").as("parent_id"),
          lit(false).as("stored"))
      val detaches = b.filter(col("event_type") === "SpanEquipmentDetachedFromParent")
        .select(col("p.spanEquipmentId").as("child_id"), col("seq"))
      val touchedChildren = batchAffixes.select(col("child_id").as("k"))
        .unionByName(detaches.select(col("child_id").as("k")))
        .distinct().localCheckpoint(true)
      val storedAffixes = store
        .readKeyedSnap(batchId, "st_child_affixes", childAffixSchema, "child_id", touchedChildren)
        .withColumn("stored", lit(true))
      val timeline = Derivations
        .affixNextDetach(storedAffixes.unionByName(batchAffixes), detaches)
        .localCheckpoint(true)
      store.mergeReplace("st_child_affixes", "child_id", touchedChildren,
        timeline.filter(col("next_detach_seq").isNull)
          .select(col("child_id"), col("parent_id"), col("seq")).distinct())

      // flag timeline rows: batch affixes set, detaches clear every affix
      // they terminate (stored or batch), re-placements reset
      val setRows = timeline.filter(!col("stored"))
        .select(col("parent_id"), col("seq"), lit(true).as("has_child"))
      val clearRows = timeline.filter(col("next_detach_seq").isNotNull)
        .select(col("parent_id"), col("next_detach_seq").as("seq"), lit(false).as("has_child"))
      val resetRows = b.filter(col("event_type") === "SpanEquipmentPlacedInRouteNetwork")
        .select(col("p.equipment.id").as("parent_id"), col("seq"), lit(false).as("has_child"))
      val batchHc = setRows.unionByName(clearRows).unionByName(resetRows)
        .groupBy(col("parent_id"))
        .agg(max_by(col("has_child"), col("seq")).as("has_child"),
          max(col("seq")).as("hc_seq"))
      val hcKeys = batchHc.select(col("parent_id").as("k")).distinct().localCheckpoint(true)
      // no snapshot: batchHc is replay-stable (derives from the
      // st_child_affixes snapshot) and the hc merge is a max-seq fixpoint
      val hcStored = store.readKeyed("st_has_child", hcSchema, "parent_id", hcKeys)
        .localCheckpoint(true)
      val hcMerged = Folds
        .mergePartials(Seq(hcStored, batchHc), "parent_id", Seq("has_child" -> "hc_seq"))
        .localCheckpoint(true)
      store.mergeReplace("st_has_child", "parent_id", hcKeys, hcMerged)

      // ---------- span_equipment output (concurrent with affix chain) ----
      section {
        writeOutput(store, syncSink, "span_equipment", seKeys,
          Derivations.spanEquipmentFromState(
            Derivations.spanStateFromPartial(seMerged), eqSpecs, structSpecs))
      }

      // ---------- eligible ends + conduit_slack recount ----------
      val eligKeys = seKeys.unionByName(hcKeys).distinct().localCheckpoint(true)
      val spanElig = store.readKeyed("st_span", bSpan.schema, "id", eligKeys)
        .localCheckpoint(true)
      val hcFor = store.readKeyed("st_has_child", hcSchema, "parent_id", eligKeys)
      val enrichedElig = Derivations
        .withSpecDims(Derivations.spanStateFromPartial(spanElig), eqSpecs, structSpecs)
        .join(hcFor.select(col("parent_id").as("id"), col("has_child")), Seq("id"), "left")
        .na.fill(false, Seq("has_child"))
      val endRows = Derivations.eligibleEnds(enrichedElig)
      def nodesOf(df: DataFrame): DataFrame = df.select(explode(array(
          element_at(col("nodes"), 1), element_at(col("nodes"), -1))).as("b"))
        .filter(col("b").isNotNull)
      // old ∪ new positions of every touched equipment: the buckets whose
      // eligible-end rows may change, and the nodes whose count may change
      val touchedNodeVals = nodesOf(seStored).unionByName(nodesOf(spanElig))
        .distinct().localCheckpoint(true)
      store.mergeReplace("st_eligible_ends", "id", eligKeys, endRows,
        bucketSrcCol = Some("route_node_id"), extraBucketValues = Some(touchedNodeVals))
      val touchedNodes = touchedNodeVals.withColumnRenamed("b", "k")
      val slackRows = Derivations.slackFromEnds(
          store.readKeyed("st_eligible_ends", eligSchema, "route_node_id", touchedNodes))
        .localCheckpoint(true)
      store.mergeReplace("conduit_slack", "route_node_id", touchedNodes, slackRows)
      syncSink("conduit_slack",
        touchedNodes.select(Derivations.deterministicUuid(col("k")).as("id")), slackRows)
      } else if (has(interestTypes)) launchInterestSection()
      // join the concurrent sections (first failure propagates) ...
      pending.foreach(f => Await.result(f, Duration.Inf))
      // ... then the commit point: record completion FIRST (a crash between
      // the two leaves a skippable batch with a stale snapshot dir, cleaned
      // by the next step), then drop this batch's snapshots
      if (batchId >= 0) {
        store.setLastAppliedBatch(batchId)
        store.clearSnapshots(batchId, including = true)
      }
      ()
    } finally {
      // a section that crashed must not leave siblings racing the caller's
      // redelivery: quiesce every section before releasing the batch cache
      pending.foreach(f => scala.util.Try(Await.ready(f, Duration.Inf)))
      b.unpersist()
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!persistedBefore.contains(id)) rdd.unpersist(blocking = false)
      }
    }
  }

  /** (root_segment_id, id) index rows of a span partial frame. */
  private def rootIndexOf(spanPartial: DataFrame): DataFrame = spanPartial.select(
    col("pl").getField("structures").getItem(0).getField("spanSegments")
      .getItem(0).getField("id").as("root_segment_id"),
    col("id"))
    .filter(col("root_segment_id").isNotNull)

  /** Seed the store from a FULL decoded event log using the batch
    * derivations — the backfill→catch-up phase handoff the reference gets
    * from `_bulkMode` (`RelationalDatabaseProjection.cs:460-495`,
    * `Worker.cs:32-48`): one fast batch pass dehydrates the whole log into
    * the per-family partial folds, auxiliary state tables, and output
    * tables, in exactly the bucketed layout [[step]] maintains — then the
    * stream continues strictly past the recorded high-water `seq`
    * ([[StateStore.setHighWater]], consumed by [[CatchUp.startQuery]]).
    *
    * Every state table is the full-log value of the same expression the
    * incremental path maintains per batch, so `seed(log[0,k])` followed by
    * `step`s over `(k,n]` equals `seed(log[0,n])` — proven by HandoffSpec.
    *
    * Returns the high-water seq (Long.MinValue on an empty log). */
  def seed(store: StateStore, evDecoded: DataFrame): Long = {
    val ev = evDecoded.persist()
    // released in the finally block (not just the success path — a
    // mid-seed failure must not leak cached frames into the long-lived
    // catch-up session)
    var spanPart: DataFrame = null
    var timeline: DataFrame = null
    var endRows: DataFrame = null
    try {
      // dimension tables
      store.writeSmall("dim_span_equipment_spec", Derivations.spanEquipmentSpecsPartial(ev))
      store.writeSmall("dim_node_container_spec", Derivations.nodeContainerSpecsPartial(ev))
      store.writeSmall("dim_span_structure_spec", Derivations.spanStructureSpecsPartial(ev))
      store.writeSmall("dim_terminal_spec", Derivations.terminalSpecsPartial(ev))
      val eqSpecs = Derivations.spanEquipmentSpecs(ev)
      val structSpecs = Derivations.spanStructureSpecs(ev)

      // per-family partial folds (the state [[step]] merges onto)
      spanPart = Derivations.spanEquipmentPartial(ev).persist()
      store.writeBucketed("st_installation", "id", Derivations.installationPartial(ev))
      store.writeBucketed("st_work_task", "id", Derivations.workTaskPartial(ev))
      store.writeBucketed("st_span", "id", spanPart)
      store.writeBucketed("st_node_container", "id", Derivations.nodeContainerPartial(ev))
      store.writeBucketed("st_interest", "interest_id", Derivations.interestPartial(ev))
      store.writeBucketed("st_terminal", "id", Derivations.terminalPartial(
        Derivations.terminalPlacementRows(Derivations.containerRelEvents(ev),
          Derivations.terminalPlacements(ev), Derivations.terminalSpecs(ev)),
        Derivations.terminalUpdateRows(ev)))

      // auxiliary cross-entity state
      val rootMap = rootIndexOf(spanPart)
      store.writeBucketed("st_root_segment", "root_segment_id", rootMap)
      val affixes = Derivations.affixEdges(ev).join(rootMap, Seq("root_segment_id"))
        .select(col("child_id"), col("seq"), col("id").as("parent_id"))
      val detaches = ev.filter(col("event_type") === "SpanEquipmentDetachedFromParent")
        .select(col("p.spanEquipmentId").as("child_id"), col("seq"))
      timeline = Derivations.affixNextDetach(affixes, detaches).persist()
      store.writeBucketed("st_child_affixes", "child_id",
        timeline.filter(col("next_detach_seq").isNull)
          .select(col("child_id"), col("parent_id"), col("seq")).distinct())
      // has-child flag timeline → final flag + greatest contributing seq
      val setRows = timeline.select(col("parent_id"), col("seq"), lit(true).as("has_child"))
      val clearRows = timeline.filter(col("next_detach_seq").isNotNull)
        .select(col("parent_id"), col("next_detach_seq").as("seq"), lit(false).as("has_child"))
      val resetRows = ev.filter(col("event_type") === "SpanEquipmentPlacedInRouteNetwork")
        .select(col("p.equipment.id").as("parent_id"), col("seq"), lit(false).as("has_child"))
      val hc = setRows.unionByName(clearRows).unionByName(resetRows)
        .groupBy(col("parent_id"))
        .agg(max_by(col("has_child"), col("seq")).as("has_child"),
          max(col("seq")).as("hc_seq"))
      store.writeBucketed("st_has_child", "parent_id", hc)

      // eligible conduit ends (bucketed by route node for the per-node
      // slack recount) + the 8 output tables
      val enriched = Derivations
        .withSpecDims(Derivations.spanStateFromPartial(spanPart), eqSpecs, structSpecs)
        .join(hc.select(col("parent_id").as("id"), col("has_child")), Seq("id"), "left")
        .na.fill(false, Seq("has_child"))
      endRows = Derivations.eligibleEnds(enriched).persist()
      store.writeBucketed("st_eligible_ends", "route_node_id", endRows)

      val outputs = Map(
        "installation" -> Derivations.installation(ev),
        "work_task" -> Derivations.workTask(ev),
        "node_container" -> Derivations.nodeContainer(ev),
        "span_equipment" -> Derivations.spanEquipmentFromState(
          Derivations.spanStateFromPartial(spanPart), eqSpecs, structSpecs),
        "service_termination" -> Derivations.serviceTermination(ev),
        "rel_interest_to_route_element" -> Derivations.relInterestToRouteElement(ev),
        "rel_fiber_cable_to_route_element" -> Derivations.relFiberCableToRouteElement(ev),
        "conduit_slack" -> Derivations.slackFromEnds(endRows))
      outputs.foreach { case (table, df) =>
        store.writeBucketed(table, outputKey(table), df)
      }

      val hwRow = ev.agg(max(col("seq"))).head()
      val hw = if (hwRow.isNullAt(0)) Long.MinValue else hwRow.getLong(0)
      store.setHighWater(hw)
      hw
    } finally {
      Seq(spanPart, timeline, endRows).foreach(df => if (df != null) df.unpersist())
      ev.unpersist()
      ()
    }
  }

  /** Merge a batch partial onto stored state for its touched keys (plus
    * `extraReadKeys`, which are read+rewritten unchanged — used when a
    * downstream as-of resolve needs the pre-batch snapshot of keys the
    * batch itself does not touch). Returns (touchedKeys, storedSnapshot,
    * merged), all eagerly materialized so they survive the state
    * overwrite. */
  private def mergeFamily(store: StateStore, table: String, idCol: String,
      batchPartial: DataFrame, pairs: Seq[(String, String)], seqs: Seq[String],
      extraReadKeys: Option[DataFrame] = None,
      batchId: Long = -1L, snapshot: Boolean = true): (DataFrame, DataFrame, DataFrame) = {
    val keys0 = batchPartial.select(col(idCol).as("k")).distinct()
    val keys = extraReadKeys.map(e => keys0.unionByName(e).distinct()).getOrElse(keys0)
      .localCheckpoint(true)
    // snapshot mode: the read is parquet-backed (its own lineage cut), so
    // no localCheckpoint needed on top. `snapshot = false` is for families
    // whose stored state feeds ONLY the field-wise max-seq merge: merging
    // a batch's markers onto state that already absorbed them is a
    // fixpoint, so a mid-crash replay converges without the pre-merge
    // snapshot round-trip. Families whose PRE-batch state feeds other
    // computations (vacated span positions, container/interest as-of
    // pseudo-events, open affixes) keep their snapshots.
    val stored =
      if (batchId >= 0 && snapshot)
        store.readKeyedSnap(batchId, table, batchPartial.schema, idCol, keys)
      else store.readKeyed(table, batchPartial.schema, idCol, keys).localCheckpoint(true)
    val merged = Folds.mergePartials(Seq(stored, batchPartial), idCol, pairs, seqs)
      .localCheckpoint(true)
    store.mergeReplace(table, idCol, keys, merged)
    (keys, stored, merged)
  }

  /** Delete+reinsert the touched keys' output rows, then notify the sink. */
  private def writeOutput(store: StateStore, sink: Sink, table: String,
      keys: DataFrame, rows: DataFrame): Unit = {
    val keyCol = outputKey(table)
    val out = rows.localCheckpoint(true)
    store.mergeReplace(table, keyCol, keys, out)
    sink(table, keys.withColumnRenamed("k", keyCol), out)
  }

  /** Merge a tiny dimension partial (union + refold + full overwrite);
    * returns the merged frame. `hasEvents` (computed once per step for all
    * four dims) skips the merge when the batch carries no events of this
    * dim's type — no per-dim driver job on the hot path. */
  private def mergeDim(store: StateStore, table: String, batchPartial: DataFrame,
      idCol: String, pairs: Seq[(String, String)], hasEvents: Boolean,
      batchId: Long): DataFrame = {
    if (!hasEvents) store.readSmall(table, batchPartial.schema).localCheckpoint(true)
    else {
      val stored = store.readSmallSnap(batchId, table, batchPartial.schema)
      val merged = Folds.mergePartials(Seq(stored, batchPartial), idCol, pairs)
        .localCheckpoint(true)
      store.writeSmall(table, merged)
      merged
    }
  }
}
