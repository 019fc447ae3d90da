package graft.projector

import graft.ops.{Folds, HopSubtract, Walks}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch derivations of the reference's 8 materialized tables from a
  * decoded event log (see [[EventLog]]), re-expressed as declarative Spark
  * dataflow (SURVEY.md §2, §3).
  *
  * Execution shape per SURVEY.md §3/EP1: one pass extracts the small
  * specification dimensions (broadcast), one hash-aggregate fold per entity
  * family produces final per-entity state, broadcast joins attach dimension
  * attributes, and two derived computations (conduit-slack recount, hop-
  * subtracted cable walks) run over the folded states. Per-entity folds are
  * `max_by` hash aggregates — map-side partial aggregation means the
  * shuffle carries one row per key, so a 100 TB log folds with no global
  * sort and no driver-side state (the reference holds everything in one
  * process heap, `ProjektorState.cs:23-125`).
  *
  * As-of (mid-stream) lookups — interest walk at cable-apply time, node-
  * container relation at terminal-placement time — are resolved exactly
  * with a forward-fill window over the per-key event timeline (SURVEY.md
  * §3 ordering contract), not with final-state joins.
  *
  * Fidelity notes (cloned, not "fixed"):
  *   - `is_customer_conduit`/`is_cable`/root-segment facts freeze at
  *     placement time (`SpanEquipmentState.Create`); a later
  *     SpanEquipmentSpecificationChanged updates only spec_name and
  *     outer_diameter (`ProjektorState.cs:293-310`);
  *   - cable→route-element entries survive equipment removal (no handler
  *     ever removes from `_fiberCableToRouteElementRelations`);
  *   - non-cable equipment placed/affixed with utility hops still lands in
  *     the cable table (`ProcessSpanEquipmentAffixedToParent` always calls
  *     `ProcessCableToRouteElement`, `ProjektorState.cs:388`);
  *   - a WorkTaskCreated with null/empty status is a complete no-op even as
  *     a re-create (`ProjektorState.cs:593-594`);
  *   - an interest Modified after Unregistered re-creates the interest
  *     (dictionary indexer assignment, `ProjektorState.cs:104-107`);
  *   - `conduit_slack.id` is a fresh random Guid in the reference
  *     (`ProjektorState.cs:484`); here it is a deterministic UUID derived
  *     from route_node_id so runs are reproducible — compare on
  *     (route_node_id, number_of_ends);
  *   - the reference's ±1 slack arithmetic DOUBLE-COUNTS in two
  *     pathological sequences (verified against the simulator): (a) the
  *     same child affixed twice to one parent without an intervening
  *     detach, and (b) two children sharing a parent where both detach —
  *     each detach iterates the stored parent list and re-increments after
  *     the flag is already cleared (`ProjektorState.cs:398-414`). The
  *     batch recount here reflects the *invariant* count (alive eligible
  *     ends), which is the defensible semantics; well-formed logs from the
  *     upstream system do not produce these sequences.
  *
  * Specification dimensions are assumed immutable once added (true of
  * well-formed logs; the reference would snapshot attributes at placement
  * time if a spec were re-added with different values).
  */
object Derivations {

  import EventLog.EmptyUuid

  private def ofType(ev: DataFrame, t: String): DataFrame =
    ev.filter(col("event_type") === t)

  private def typeIs(t: String): Column = col("event_type") === t

  // ---------------------------------------------------------------------
  // Specification dimensions (tiny; always broadcast)
  // ---------------------------------------------------------------------

  /** node container spec: id → (name, category). `ProjektorState.cs:30-33`. */
  def nodeContainerSpecs(ev: DataFrame): DataFrame =
    ofType(ev, "NodeContainerSpecificationAdded")
      .groupBy(col("p.specification.id").as("spec_id"))
      .agg(max_by(struct(col("p.specification.name").as("name"),
        col("p.specification.category").as("category")), col("seq")).as("s"))
      .select(col("spec_id"), col("s.name").as("spec_name"), col("s.category").as("spec_category"))

  /** span equipment spec: id → (name, isCable, rootStructureSpecId). `ProjektorState.cs:325-328`. */
  def spanEquipmentSpecs(ev: DataFrame): DataFrame =
    ofType(ev, "SpanEquipmentSpecificationAdded")
      .groupBy(col("p.specification.id").as("spec_id"))
      .agg(max_by(struct(col("p.specification.name").as("name"),
        col("p.specification.isCable").as("is_cable"),
        col("p.specification.rootTemplate.spanStructureSpecificationId").as("structure_spec_id")),
        col("seq")).as("s"))
      .select(col("spec_id"), col("s.name").as("spec_name"),
        col("s.is_cable").as("spec_is_cable"), col("s.structure_spec_id").as("structure_spec_id"))

  /** span structure spec: id → outerDiameter. `ProjektorState.cs:330-333`. */
  def spanStructureSpecs(ev: DataFrame): DataFrame =
    ofType(ev, "SpanStructureSpecificationAdded")
      .groupBy(col("p.specification.id").as("structure_spec_id"))
      .agg(max_by(col("p.specification.outerDiameter"), col("seq")).as("outer_diameter"))

  /** terminal equipment spec: id → isCustomerTermination. `ProjektorState.cs:524-527`. */
  def terminalSpecs(ev: DataFrame): DataFrame =
    ofType(ev, "TerminalEquipmentSpecificationAdded")
      .groupBy(col("p.specification.id").as("spec_id"))
      .agg(max_by(col("p.specification.isCustomerTermination"), col("seq")).as("is_customer_termination"))

  // ---------------------------------------------------------------------
  // Interests (walks of interest)
  // ---------------------------------------------------------------------

  private val interestTypes = Seq("WalkOfInterestRegistered",
    "WalkOfInterestRouteNetworkElementsModified", "InterestUnregistered")

  /** Final per-interest state: (interest_id, walk ARRAY<STRING>, alive).
    * Walks are deduped keeping first occurrence at ingest
    * (`ProjektorState.cs:673-689` via `array_distinct`).
    */
  def interestState(ev: DataFrame): DataFrame = {
    val fam = ev.filter(col("event_type").isin(interestTypes: _*))
      .select(col("seq"), col("event_type"),
        coalesce(col("p.interest.id"), col("p.interestId")).as("interest_id"),
        array_distinct(
          when(typeIs("WalkOfInterestRegistered"), col("p.interest.routeNetworkElementRefs"))
            .when(typeIs("WalkOfInterestRouteNetworkElementsModified"), col("p.routeNetworkElementIds"))
        ).as("walk"))
    fam.groupBy(col("interest_id"))
      .agg(
        Folds.lastNonNull(col("walk"), col("seq")).as("walk"),
        (max_by(col("event_type"), col("seq")) =!= "InterestUnregistered").as("alive"))
  }

  /** Table 1: rel_interest_to_route_element (interest_id, route_network_element_id, seq_no).
    * `PostgresWriter.cs:27-38,42-70` — seq_no is 1-based walk order. */
  def relInterestToRouteElement(ev: DataFrame): DataFrame =
    Walks.explodeOrdered(
      interestState(ev).filter(col("alive")).select(col("interest_id"), col("walk")),
      "walk", "route_network_element_id", "seq_no")
      .select(col("interest_id"), col("route_network_element_id"), col("seq_no"))

  // ---------------------------------------------------------------------
  // Node containers
  // ---------------------------------------------------------------------

  /** Final per-container state incl. route-node relation; join to spec dim
    * for name/category. `ProjektorState.cs:30-84`, `NodeContainerState.cs`. */
  def nodeContainerState(ev: DataFrame): DataFrame = {
    val types = Seq("NodeContainerPlacedInRouteNetwork", "NodeContainerRemovedFromRouteNetwork",
      "NodeContainerSpecificationChanged")
    val placed = typeIs("NodeContainerPlacedInRouteNetwork")
    val lifecycle = placed || typeIs("NodeContainerRemovedFromRouteNetwork")
    val fam = ev.filter(col("event_type").isin(types: _*))
      .select(col("seq"), col("event_type"),
        coalesce(col("p.container.id"), col("p.nodeContainerId")).as("id"),
        when(placed, col("p.container.routeNodeId")).as("route_node_id"),
        when(placed, col("p.container.specificationId"))
          .when(typeIs("NodeContainerSpecificationChanged"), col("p.newSpecificationId")).as("spec_id"))
    fam.groupBy(col("id"))
      .agg(
        Folds.lastNonNull(col("route_node_id"), col("seq")).as("route_node_id"),
        Folds.lastNonNull(col("spec_id"), col("seq")).as("spec_id"),
        (Folds.lastWhere(col("event_type"), col("seq"), lifecycle) === "NodeContainerPlacedInRouteNetwork")
          .as("alive"))
      .filter(col("alive"))
  }

  /** Table 3: node_container (id, route_node_id, spec_name, spec_category).
    * Spec lookup throws on miss in the reference (`ProjektorState.cs:56-58`)
    * → inner broadcast join. */
  def nodeContainer(ev: DataFrame): DataFrame =
    nodeContainerState(ev)
      .join(broadcast(nodeContainerSpecs(ev)), Seq("spec_id"), "inner")
      .select(col("id"), col("route_node_id"), col("spec_name"), col("spec_category"))

  // ---------------------------------------------------------------------
  // Work tasks / installations (pure LWW folds)
  // ---------------------------------------------------------------------

  /** Table 7: work_task (id, number, status). `ProjektorState.cs:591-613`. */
  def workTask(ev: DataFrame): DataFrame = {
    val validCreate = typeIs("WorkTaskCreated") &&
      col("p.workTask.status").isNotNull && col("p.workTask.status") =!= ""
    val statusChanged = typeIs("WorkTaskStatusChanged")
    val fam = ev.filter(typeIs("WorkTaskCreated") || statusChanged)
      .select(col("seq"),
        col("p.workTaskId").as("id"),
        when(validCreate, col("p.workTask.number")).as("number"),
        when(validCreate, col("p.workTask.status"))
          .when(statusChanged, col("p.status")).as("status"),
        (validCreate || statusChanged).as("in_status_family"),
        validCreate.as("is_valid_create"))
    fam.groupBy(col("id"))
      .agg(
        Folds.lastWhere(col("number"), col("seq"), col("is_valid_create")).as("number"),
        Folds.lastEvenNull(col("status"), col("seq"), col("in_status_family")).as("status"),
        max(when(col("is_valid_create"), col("seq"))).as("created_seq"))
      .filter(col("created_seq").isNotNull)
      .select(col("id"), col("number"), col("status"))
  }

  /** Table 8: installation (id, installation_id, unit_address_id, status,
    * location_remark). Field-family wholesale overwrites incl. nulls
    * (`ProjektorState.cs:623-668`, `InstallationState.cs:21-33`). */
  def installation(ev: DataFrame): DataFrame = {
    val created = typeIs("InstallationCreated")
    val types = Seq("InstallationCreated", "InstallationUnitAddressChanged",
      "InstallationStatusChanged", "InstallationLocationRemarkChanged")
    val fam = ev.filter(col("event_type").isin(types: _*))
      .select(col("seq"), col("event_type"), col("p.id").as("id"),
        col("p.installationId").as("installation_id"),
        col("p.unitAddressId").as("unit_address_id"),
        col("p.status").as("status"),
        col("p.locationRemark").as("location_remark"))
    val seq = col("seq")
    fam.groupBy(col("id"))
      .agg(
        Folds.lastWhere(col("installation_id"), seq, typeIs("InstallationCreated")).as("installation_id"),
        Folds.lastEvenNull(col("unit_address_id"), seq,
          created || typeIs("InstallationUnitAddressChanged")).as("unit_address_id"),
        Folds.lastEvenNull(col("status"), seq,
          created || typeIs("InstallationStatusChanged")).as("status"),
        Folds.lastEvenNull(col("location_remark"), seq,
          created || typeIs("InstallationLocationRemarkChanged")).as("location_remark"),
        max(when(created, seq)).as("created_seq"))
      .filter(col("created_seq").isNotNull)
      .select(col("id"), col("installation_id"), col("unit_address_id"),
        col("status"), col("location_remark"))
  }

  // ---------------------------------------------------------------------
  // Span equipment (fold + dimension joins + child-flag timeline)
  // ---------------------------------------------------------------------

  /** Per-equipment folded state with placement-frozen facts and LWW
    * overrides; `alive` reflects the placed/removed lifecycle.
    * Columns: id, alive, placed_seq, name, walk_of_interest_id, is_cable,
    * placement_spec_id, eff_spec_id, nodes (current), placed_nodes,
    * root_segment_id, root_has_from, root_has_to, access_address_id,
    * unit_address_id.
    */
  def spanEquipmentState(ev: DataFrame): DataFrame =
    spanPartialWithFacts(spanEquipmentPartial(ev))
      .filter(col("placed_seq").isNotNull)
      .select(
        col("id"),
        (col("last_lifecycle") === "SpanEquipmentPlacedInRouteNetwork").as("alive"),
        col("placed_seq"), col("name"), col("walk_of_interest_id"), col("is_cable"),
        col("placement_spec_id"), col("eff_spec_id"), col("nodes"),
        element_at(col("nodes"), 1).as("from_node_id"),
        element_at(col("nodes"), -1).as("to_node_id"),
        col("root_segment_id"), col("root_has_from"), col("root_has_to"),
        col("addr").getField("accessAddressId").as("access_address_id"),
        col("addr").getField("unitAddressId").as("unit_address_id"))

  /** Partial (mergeable) span-equipment fold: one row per id with the raw
    * fold accumulators and per-family presence markers — NO placed filter,
    * so the incremental catch-up can merge a batch-only fold onto stored
    * state (all batch seqs are greater than every stored seq, so cross-
    * batch merge is field-wise "batch value if present, else state").
    */
  private[graft] def spanEquipmentPartial(ev: DataFrame): DataFrame = {
    val placed = typeIs("SpanEquipmentPlacedInRouteNetwork")
    val moved = typeIs("SpanEquipmentMoved") || typeIs("SpanEquipmentMerged")
    val removed = typeIs("SpanEquipmentRemoved")
    val specChanged = typeIs("SpanEquipmentSpecificationChanged")
    val addrChanged = typeIs("SpanEquipmentAddressInfoChanged")
    val types = Seq("SpanEquipmentPlacedInRouteNetwork", "SpanEquipmentMoved",
      "SpanEquipmentMerged", "SpanEquipmentRemoved", "SpanEquipmentSpecificationChanged",
      "SpanEquipmentAddressInfoChanged")

    val eq = col("p.equipment")
    val fam = ev.filter(col("event_type").isin(types: _*))
      .select(col("seq"), col("event_type"),
        coalesce(eq.getField("id"), col("p.spanEquipmentId")).as("id"),
        when(placed, struct(
          eq.getField("name").as("name"),
          eq.getField("specificationId").as("spec_id"),
          eq.getField("walkOfInterestId").as("walk_of_interest_id"),
          eq.getField("isCable").as("is_cable"),
          eq.getField("nodesOfInterestIds").as("nodes"),
          eq.getField("spanStructures").as("structures"),
          eq.getField("addressInfo").as("address_info"))).as("pl"),
        when(placed, eq.getField("nodesOfInterestIds"))
          .when(moved, col("p.nodesOfInterestIds")).as("nodes_now"),
        when(placed, eq.getField("specificationId"))
          .when(specChanged, col("p.newSpecificationId")).as("spec_now"),
        when(placed, eq.getField("addressInfo"))
          .when(addrChanged, col("p.addressInfo")).as("addr_now"),
        (placed || addrChanged).as("is_addr_event"),
        (placed || removed).as("is_lifecycle"))

    val seq = col("seq")
    fam.groupBy(col("id"))
      .agg(
        Folds.lastNonNull(col("pl"), seq).as("pl"),
        max(when(placed, seq)).as("placed_seq"),
        Folds.lastNonNull(col("nodes_now"), seq).as("nodes"),
        Folds.lastNonNull(col("spec_now"), seq).as("eff_spec_id"),
        Folds.lastEvenNull(col("addr_now"), seq, col("is_addr_event")).as("addr"),
        max(when(col("is_addr_event"), seq)).as("last_addr_seq"),
        Folds.lastWhere(col("event_type"), seq, col("is_lifecycle")).as("last_lifecycle"))
  }

  /** Projects the placement-frozen facts out of a partial fold's `pl`
    * struct (`SpanEquipmentState.Create`): root-segment id, whether any
    * segment with from-index 0 / to-index len-1 has a real terminal. Null
    * `pl` (no placement among the folded events) yields null facts.
    */
  private[graft] def spanPartialWithFacts(part: DataFrame): DataFrame = {
    val segs = flatten(col("pl.structures").getField("spanSegments"))
    val nPlacedNodes = size(col("pl.nodes"))
    part.select(
      col("id"), col("placed_seq"), col("nodes"), col("eff_spec_id"),
      col("addr"), col("last_addr_seq"), col("last_lifecycle"),
      col("pl.name").as("name"),
      col("pl.walk_of_interest_id").as("walk_of_interest_id"),
      col("pl.is_cable").as("is_cable"),
      col("pl.spec_id").as("placement_spec_id"),
      col("pl.structures").getItem(0).getField("spanSegments").getItem(0).getField("id")
        .as("root_segment_id"),
      exists(segs, s => s.getField("fromNodeOfInterestIndex") === 0 &&
        s.getField("fromTerminalId").isNotNull &&
        s.getField("fromTerminalId") =!= EmptyUuid).as("root_has_from"),
      exists(segs, s => s.getField("toNodeOfInterestIndex") === (nPlacedNodes - 1) &&
        s.getField("toTerminalId").isNotNull &&
        s.getField("toTerminalId") =!= EmptyUuid).as("root_has_to"))
  }

  /** Final has-child flag per parent equipment id.
    *
    * Timeline semantics (`ProjektorState.cs:349-424`): an affix (or a
    * placement carrying hops) of child C sets the flag on every parent
    * resolved via root-segment id at the affix `seq`; a detach of C clears
    * the flag on all parents C affixed since its last detach; a (re-)
    * placement of the parent resets its flag. The final value is the flag
    * at the greatest timeline `seq`.
    */
  def hasChildFlags(ev: DataFrame, spanState: DataFrame): DataFrame = {
    val placedWithHops = typeIs("SpanEquipmentPlacedInRouteNetwork") &&
      size(col("p.equipment.utilityNetworkHops")) > 0
    val affixHops =
      when(typeIs("SpanEquipmentAffixedToParent"), col("p.newUtilityHopList"))
        .when(placedWithHops, col("p.equipment.utilityNetworkHops"))

    // (child_id, seq, parent_root_segment_id) per affix edge
    val affixes = ev.filter(typeIs("SpanEquipmentAffixedToParent") || placedWithHops)
      .select(col("seq"),
        coalesce(col("p.spanEquipmentId"), col("p.equipment.id")).as("child_id"),
        explode(flatten(affixHops.getField("parentAffixes"))).as("affix"))
      .select(col("seq"), col("child_id"), col("affix.spanSegmentId").as("root_segment_id"))
      // resolve parent via root segment id (final-state join; parents are
      // placed before affixes in well-formed logs)
      .join(spanState.select(col("root_segment_id"), col("id").as("parent_id")), Seq("root_segment_id"))
      .select(col("child_id"), col("seq"), col("parent_id"))

    val detaches = ev.filter(typeIs("SpanEquipmentDetachedFromParent"))
      .select(col("p.spanEquipmentId").as("child_id"), col("seq").as("detach_seq"))

    // each affix is cleared by the child's next detach (if any)
    val wNext = Window.partitionBy(col("child_id")).orderBy(col("seq"))
    val union = affixes.select(col("child_id"), col("seq"), col("parent_id"), lit(false).as("is_detach"))
      .unionByName(detaches.select(col("child_id"), col("detach_seq").as("seq"),
        lit(null.asInstanceOf[String]).as("parent_id"), lit(true).as("is_detach")))
    val withNextDetach = union
      .withColumn("next_detach_seq",
        min(when(col("is_detach"), col("seq")))
          .over(wNext.rowsBetween(1, Window.unboundedFollowing)))
      .filter(!col("is_detach"))

    val setRows = withNextDetach.select(col("parent_id"), col("seq"), lit(true).as("flag"))
    val clearRows = withNextDetach.filter(col("next_detach_seq").isNotNull)
      .select(col("parent_id"), col("next_detach_seq").as("seq"), lit(false).as("flag"))
    val resetRows = spanState.select(col("id").as("parent_id"),
      col("placed_seq").as("seq"), lit(false).as("flag"))

    setRows.unionByName(clearRows).unionByName(resetRows)
      .groupBy(col("parent_id"))
      .agg(max_by(col("flag"), col("seq")).as("has_child"))
  }

  /** Enriched span-equipment state: + is_customer_conduit (placement-time
    * spec name contains "ø12", `SpanEquipmentState.cs:53`), current
    * spec_name, outer_diameter (2-hop dimension chain), has_child.
    */
  def spanEquipmentEnriched(ev: DataFrame): DataFrame = {
    val st = spanEquipmentState(ev)
    val eqSpecs = spanEquipmentSpecs(ev)
    val structSpecs = spanStructureSpecs(ev)
    val placementSpec = eqSpecs
      .select(col("spec_id").as("placement_spec_id"),
        lower(col("spec_name")).contains("ø12").as("is_customer_conduit"),
        col("spec_is_cable").as("placement_spec_is_cable"))
    val currentSpec = eqSpecs
      .join(broadcast(structSpecs), Seq("structure_spec_id"), "left")
      .select(col("spec_id").as("eff_spec_id"), col("spec_name"), col("outer_diameter"))
    val withSpecs = st
      .join(broadcast(placementSpec), Seq("placement_spec_id"))
      .join(broadcast(currentSpec), Seq("eff_spec_id"))
    withSpecs
      .join(hasChildFlags(ev, st).withColumnRenamed("parent_id", "id"), Seq("id"), "left")
      .na.fill(false, Seq("has_child"))
  }

  /** Table 4: span_equipment (id, interest_id, outer_diameter, is_cable,
    * name, spec_name, access_address_id, unit_address_id).
    * `PostgresWriter.cs:306-313`. */
  def spanEquipment(ev: DataFrame): DataFrame =
    spanEquipmentEnriched(ev).filter(col("alive"))
      .select(col("id"), col("walk_of_interest_id").as("interest_id"),
        col("outer_diameter"), col("is_cable"), col("name"), col("spec_name"),
        col("access_address_id"), col("unit_address_id"))

  /** Table 6: conduit_slack (id, route_node_id, number_of_ends) — batch
    * recompute of the reference's incrementally-maintained ±1 counter
    * (`ProjektorState.cs:449-512`): per route node, the number of alive
    * customer-conduit ends with no terminal connection and no child span
    * equipment. `id` is a deterministic UUID of route_node_id.
    */
  def conduitSlack(ev: DataFrame): DataFrame = {
    val st = spanEquipmentEnriched(ev).filter(col("alive") && col("is_customer_conduit") && !col("has_child"))
    val fromEnds = st.filter(!col("root_has_from")).select(col("from_node_id").as("route_node_id"))
    val toEnds = st.filter(!col("root_has_to")).select(col("to_node_id").as("route_node_id"))
    fromEnds.unionByName(toEnds)
      .groupBy(col("route_node_id"))
      .agg(count(lit(1)).cast("int").as("number_of_ends"))
      .withColumn("id", deterministicUuid(col("route_node_id")))
      .select(col("id"), col("route_node_id"), col("number_of_ends"))
  }

  /** Stable UUID-shaped id from a key (md5 reformatted as 8-4-4-4-12). */
  def deterministicUuid(key: Column): Column = {
    val h = md5(key.cast("string"))
    concat_ws("-", substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  // ---------------------------------------------------------------------
  // Cable → route element (as-of walk + hop subtraction)
  // ---------------------------------------------------------------------

  /** Table 2: rel_fiber_cable_to_route_element (fiber_cable_id,
    * route_network_element_id, seq_no).
    *
    * Apply events (`ProjektorState.cs:169-172,388,421`): placement of a
    * cable-spec equipment OR any placement carrying hops; every affix;
    * every detach. The LAST apply event per equipment wins; its hop list is
    * subtracted from the interest walk **as of that event's seq** (walks
    * may be modified later — the reference snapshots at apply time).
    * Entries survive equipment removal.
    */
  def relFiberCableToRouteElement(ev: DataFrame): DataFrame = {
    val placed = typeIs("SpanEquipmentPlacedInRouteNetwork")
    val eq = col("p.equipment")

    // placement apply rows (cable spec, or hops present)
    val cableSpecs = spanEquipmentSpecs(ev).select(col("spec_id"), col("spec_is_cable"))
    val placements = ev.filter(placed)
      .select(col("seq"), eq.getField("id").as("cable_id"),
        eq.getField("walkOfInterestId").as("interest_id"),
        eq.getField("specificationId").as("spec_id"),
        eq.getField("utilityNetworkHops").as("hops"))
      .join(broadcast(cableSpecs), Seq("spec_id"), "left")
      .filter(coalesce(col("spec_is_cable"), lit(false)) || size(col("hops")) > 0)
      .select(col("seq"), col("cable_id"), col("interest_id"), col("hops"))

    // affix/detach apply rows; interest id resolved from the equipment's
    // last placement (forward-fill not needed: walkOfInterestId is
    // placement-frozen, so the per-entity fold value is exact)
    val affixDetach = ev.filter(typeIs("SpanEquipmentAffixedToParent") ||
        typeIs("SpanEquipmentDetachedFromParent"))
      .select(col("seq"), col("p.spanEquipmentId").as("cable_id"),
        col("p.newUtilityHopList").as("hops"))
      .join(spanEquipmentState(ev).select(col("id").as("cable_id"),
        col("walk_of_interest_id").as("interest_id")), Seq("cable_id"))

    val applies = placements.unionByName(affixDetach)
    val lastApply = applies.groupBy(col("cable_id"))
      .agg(max_by(struct(col("seq"), col("interest_id"), col("hops")), col("seq")).as("a"))
      .select(col("cable_id"), col("a.seq").as("seq"), col("a.interest_id").as("interest_id"),
        col("a.hops").as("hops"))

    Walks.explodeOrdered(cableWalkResolve(interestWalkEvents(ev), lastApply),
      "walk", "route_network_element_id", "seq_no")
      .select(col("fiber_cable_id"), col("route_network_element_id"), col("seq_no"))
  }

  /** Interest walk-change timeline rows in the cable-resolve shape:
    * (seq, interest_id, w STRUCT<walk>, cable_id NULL, hops NULL). An
    * Unregistered event writes w = struct(null): the marker survives
    * forward fill, so an apply after unregistration yields a null walk
    * (dropped — the reference would have thrown). */
  private[graft] def interestWalkEvents(ev: DataFrame): DataFrame =
    ev.filter(col("event_type").isin(interestTypes: _*))
      .select(col("seq"),
        coalesce(col("p.interest.id"), col("p.interestId")).as("interest_id"),
        struct(array_distinct(
          when(typeIs("WalkOfInterestRegistered"), col("p.interest.routeNetworkElementRefs"))
            .when(typeIs("WalkOfInterestRouteNetworkElementsModified"), col("p.routeNetworkElementIds"))
        ).as("walk")).as("w"),
        lit(null.asInstanceOf[String]).as("cable_id"),
        lit(null).cast(EventLog.payloadSchema("newUtilityHopList").dataType).as("hops"))

  /** As-of resolve + hop subtraction: forward-fill the interest walk over
    * (walk events ∪ apply rows) per interest, take the walk at each apply's
    * seq, subtract the apply's hops. `lastApply` columns: (seq, interest_id,
    * cable_id, hops). Returns (fiber_cable_id, walk). Shared by the full
    * derivation and the incremental catch-up (which injects stored interest
    * state as pseudo walk events at a negative seq). */
  private[graft] def cableWalkResolve(walkEvents: DataFrame, lastApply: DataFrame): DataFrame = {
    val applyRows = lastApply.select(col("seq"), col("interest_id"),
      lit(null).cast(walkEvents.schema("w").dataType).as("w"), col("cable_id"), col("hops"))
    val w = Window.partitionBy(col("interest_id")).orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    walkEvents.unionByName(applyRows)
      .withColumn("walk_asof", last(col("w"), ignoreNulls = true).over(w).getField("walk"))
      .filter(col("cable_id").isNotNull && col("walk_asof").isNotNull)
      .select(col("cable_id").as("fiber_cable_id"),
        graft.functions.HopSubtractExpr.hopSubtract(col("walk_asof"), col("hops")).as("walk"))
  }

  // ---------------------------------------------------------------------
  // Service terminations
  // ---------------------------------------------------------------------

  /** Table 5: service_termination (id, route_node_id, name,
    * access_address_id, unit_address_id).
    *
    * Placement eligibility (`ProjektorState.cs:529-547`): spec must exist
    * and be a customer termination; the node-container→route-node relation
    * must exist **as of the placement seq** (containers place/remove over
    * time) — silent skip otherwise. Name/address updates apply only to
    * surviving entities; removal deletes.
    */
  def serviceTermination(ev: DataFrame): DataFrame = {
    val placed = typeIs("TerminalEquipmentPlacedInNodeContainer")
    val eq = col("p.equipment")

    // container relation timeline: (container_id, seq, route_node marker)
    val relEvents = ev.filter(typeIs("NodeContainerPlacedInRouteNetwork") ||
        typeIs("NodeContainerRemovedFromRouteNetwork"))
      .select(col("seq"),
        coalesce(col("p.container.id"), col("p.nodeContainerId")).as("container_id"),
        struct(when(typeIs("NodeContainerPlacedInRouteNetwork"),
          col("p.container.routeNodeId")).as("route_node_id")).as("rel"))

    val termPlacements = ev.filter(placed)
      .select(col("seq"), eq.getField("nodeContainerId").as("container_id"),
        struct(eq.getField("id").as("id"), eq.getField("name").as("name"),
          eq.getField("specificationId").as("spec_id"),
          eq.getField("addressInfo").as("address_info")).as("t"))

    val w = Window.partitionBy(col("container_id")).orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val placedResolved = relEvents.select(col("seq"), col("container_id"), col("rel"),
        lit(null).cast(termPlacements.schema("t").dataType).as("t"))
      .unionByName(termPlacements.select(col("seq"), col("container_id"),
        lit(null).cast(relEvents.schema("rel").dataType).as("rel"), col("t")))
      .withColumn("route_node_id", last(col("rel"), ignoreNulls = true).over(w).getField("route_node_id"))
      .filter(col("t").isNotNull && col("route_node_id").isNotNull)

    // spec filter: must exist and be customer termination (silent skip)
    val eligible = placedResolved
      .join(broadcast(terminalSpecs(ev)), col("t.spec_id") === col("spec_id"))
      .filter(col("is_customer_termination"))
      .select(col("seq"), col("t.id").as("id"), col("route_node_id"),
        col("t.name").as("name"), col("t.address_info").as("address_info"))

    val placementRows = eligible.select(col("seq"), lit("placement").as("event_type"), col("id"),
      struct(col("name")).as("naming"), col("address_info").as("addr"),
      col("route_node_id"), col("seq").as("placement_seq"))

    serviceTerminationFold(placementRows, terminalUpdateRows(ev))
  }

  /** Naming/address/removal update rows for the terminal fold. */
  private[graft] def terminalUpdateRows(ev: DataFrame): DataFrame = {
    val namingChanged = typeIs("TerminalEquipmentNamingInfoChanged")
    val addrChanged = typeIs("TerminalEquipmentAddressInfoChanged")
    ev.filter(namingChanged || addrChanged || typeIs("TerminalEquipmentRemoved"))
      .select(col("seq"), col("event_type"), col("p.terminalEquipmentId").as("id"),
        when(namingChanged, struct(col("p.namingInfo.name").as("name"))).as("naming"),
        when(addrChanged, col("p.addressInfo")).as("addr"),
        lit(null.asInstanceOf[String]).as("route_node_id"), lit(null).cast("long").as("placement_seq"))
  }

  /** Terminal fold tail: surviving placements + naming/address updates and
    * removals → final service_termination rows. Shared by the full batch
    * derivation and the incremental catch-up (which injects stored state as
    * pseudo-placement rows at a negative seq — hence the Long.MinValue
    * removal default rather than -1).
    */
  private[graft] def serviceTerminationFold(placementRows: DataFrame,
      updateRows: DataFrame): DataFrame = {
    val seq = col("seq")
    placementRows.unionByName(updateRows)
      .groupBy(col("id"))
      .agg(
        max(col("placement_seq")).as("placement_seq"),
        coalesce(max(when(typeIs("TerminalEquipmentRemoved"), seq)), lit(Long.MinValue)).as("removed_seq"),
        Folds.lastNonNull(col("route_node_id"), seq).as("route_node_id"),
        Folds.lastEvenNull(col("naming"), seq,
          col("event_type").isin("placement", "TerminalEquipmentNamingInfoChanged"))
          .getField("name").as("name"),
        Folds.lastEvenNull(col("addr"), seq,
          col("event_type").isin("placement", "TerminalEquipmentAddressInfoChanged")).as("addr"))
      .filter(col("placement_seq").isNotNull && col("placement_seq") > col("removed_seq"))
      .select(col("id"), col("route_node_id"), col("name"),
        col("addr.accessAddressId").as("access_address_id"),
        col("addr.unitAddressId").as("unit_address_id"))
  }

  // ---------------------------------------------------------------------

  /** All 8 tables from a decoded event log. */
  def deriveAll(ev: DataFrame): Map[String, DataFrame] = Map(
    "rel_interest_to_route_element" -> relInterestToRouteElement(ev),
    "rel_fiber_cable_to_route_element" -> relFiberCableToRouteElement(ev),
    "node_container" -> nodeContainer(ev),
    "span_equipment" -> spanEquipment(ev),
    "service_termination" -> serviceTermination(ev),
    "conduit_slack" -> conduitSlack(ev),
    "work_task" -> workTask(ev),
    "installation" -> installation(ev))
}
