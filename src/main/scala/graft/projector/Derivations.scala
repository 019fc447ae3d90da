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

  /** Partial dim folds carry `d_seq` (greatest contributing seq) so the
    * incremental catch-up can merge a batch fold onto stored dims with
    * [[graft.ops.Folds.mergePartials]]; the public accessors drop it. */
  private[graft] def nodeContainerSpecsPartial(ev: DataFrame): DataFrame =
    ofType(ev, "NodeContainerSpecificationAdded")
      .groupBy(col("p.specification.id").as("spec_id"))
      .agg(max_by(struct(col("p.specification.name").as("name"),
        col("p.specification.category").as("category")), col("seq")).as("s"),
        max(col("seq")).as("d_seq"))

  /** node container spec: id → (name, category). `ProjektorState.cs:30-33`. */
  def nodeContainerSpecs(ev: DataFrame): DataFrame =
    nodeContainerSpecsFromPartial(nodeContainerSpecsPartial(ev))

  private[graft] def nodeContainerSpecsFromPartial(p: DataFrame): DataFrame =
    p.select(col("spec_id"), col("s.name").as("spec_name"), col("s.category").as("spec_category"))

  private[graft] def spanEquipmentSpecsPartial(ev: DataFrame): DataFrame =
    ofType(ev, "SpanEquipmentSpecificationAdded")
      .groupBy(col("p.specification.id").as("spec_id"))
      .agg(max_by(struct(col("p.specification.name").as("name"),
        col("p.specification.isCable").as("is_cable"),
        col("p.specification.rootTemplate.spanStructureSpecificationId").as("structure_spec_id")),
        col("seq")).as("s"),
        max(col("seq")).as("d_seq"))

  /** span equipment spec: id → (name, isCable, rootStructureSpecId). `ProjektorState.cs:325-328`. */
  def spanEquipmentSpecs(ev: DataFrame): DataFrame =
    spanEquipmentSpecsFromPartial(spanEquipmentSpecsPartial(ev))

  private[graft] def spanEquipmentSpecsFromPartial(p: DataFrame): DataFrame =
    p.select(col("spec_id"), col("s.name").as("spec_name"),
      col("s.is_cable").as("spec_is_cable"), col("s.structure_spec_id").as("structure_spec_id"))

  private[graft] def spanStructureSpecsPartial(ev: DataFrame): DataFrame =
    ofType(ev, "SpanStructureSpecificationAdded")
      .groupBy(col("p.specification.id").as("structure_spec_id"))
      .agg(max_by(col("p.specification.outerDiameter"), col("seq")).as("outer_diameter"),
        max(col("seq")).as("d_seq"))

  /** span structure spec: id → outerDiameter. `ProjektorState.cs:330-333`. */
  def spanStructureSpecs(ev: DataFrame): DataFrame =
    spanStructureSpecsPartial(ev).drop("d_seq")

  private[graft] def terminalSpecsPartial(ev: DataFrame): DataFrame =
    ofType(ev, "TerminalEquipmentSpecificationAdded")
      .groupBy(col("p.specification.id").as("spec_id"))
      .agg(max_by(col("p.specification.isCustomerTermination"), col("seq")).as("is_customer_termination"),
        max(col("seq")).as("d_seq"))

  /** terminal equipment spec: id → isCustomerTermination. `ProjektorState.cs:524-527`. */
  def terminalSpecs(ev: DataFrame): DataFrame =
    terminalSpecsPartial(ev).drop("d_seq")

  // ---------------------------------------------------------------------
  // Interests (walks of interest)
  // ---------------------------------------------------------------------

  private val interestTypes = Seq("WalkOfInterestRegistered",
    "WalkOfInterestRouteNetworkElementsModified", "InterestUnregistered")

  /** EVENT-level rows of the per-interest partial fold — one row per
    * family event, in the partial's (value, marker) schema, so
    * [[graft.ops.Folds.mergePartials]] over `stored ∪ rows` folds batch
    * events and merges onto state in ONE aggregation (r8: the previous
    * batch-side pre-aggregation cost the 2-second step a second exchange
    * per family merge). Seq uniqueness makes the fused fold exact: stored
    * markers are ≤ high-water < every batch seq, and batch seqs are
    * distinct, so max-by-marker over rows ≡ max-by-marker over partials. */
  private[graft] def interestPartialRows(ev: DataFrame): DataFrame =
    ev.filter(col("event_type").isin(interestTypes: _*))
      .select(coalesce(col("p.interest.id"), col("p.interestId")).as("interest_id"),
        array_distinct(
          when(typeIs("WalkOfInterestRegistered"), col("p.interest.routeNetworkElementRefs"))
            .when(typeIs("WalkOfInterestRouteNetworkElementsModified"), col("p.routeNetworkElementIds"))
        ).as("walk"),
        col("seq").as("w_seq_raw"), col("event_type").as("last_type"),
        col("seq").as("lt_seq"))
      .withColumn("w_seq", when(col("walk").isNotNull, col("w_seq_raw")))
      .select(col("interest_id"), col("walk"), col("w_seq"),
        col("last_type"), col("lt_seq"))

  /** Mergeable per-interest partial fold: walk (last non-null, marker
    * `w_seq`) and the family's last event type (marker `lt_seq`). */
  private[graft] def interestPartial(ev: DataFrame): DataFrame =
    Folds.mergePartials(Seq(interestPartialRows(ev)), "interest_id", interestPartialPairs)

  private[graft] val interestPartialPairs: Seq[(String, String)] =
    Seq("walk" -> "w_seq", "last_type" -> "lt_seq")

  private[graft] def interestFromPartial(p: DataFrame): DataFrame =
    p.select(col("interest_id"), col("walk"),
      (col("last_type") =!= "InterestUnregistered").as("alive"))

  /** Final per-interest state: (interest_id, walk ARRAY<STRING>, alive).
    * Walks are deduped keeping first occurrence at ingest
    * (`ProjektorState.cs:673-689` via `array_distinct`).
    */
  def interestState(ev: DataFrame): DataFrame =
    interestFromPartial(interestPartial(ev))

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

  /** Event-level rows of the per-container partial (see
    * [[interestPartialRows]] for the fused-fold rationale). */
  private[graft] def nodeContainerPartialRows(ev: DataFrame): DataFrame = {
    val types = Seq("NodeContainerPlacedInRouteNetwork", "NodeContainerRemovedFromRouteNetwork",
      "NodeContainerSpecificationChanged")
    val placed = typeIs("NodeContainerPlacedInRouteNetwork")
    val lifecycle = placed || typeIs("NodeContainerRemovedFromRouteNetwork")
    val rn = when(placed, col("p.container.routeNodeId"))
    val sp = when(placed, col("p.container.specificationId"))
      .when(typeIs("NodeContainerSpecificationChanged"), col("p.newSpecificationId"))
    ev.filter(col("event_type").isin(types: _*))
      .select(coalesce(col("p.container.id"), col("p.nodeContainerId")).as("id"),
        rn.as("route_node_id"), when(rn.isNotNull, col("seq")).as("rn_seq"),
        sp.as("spec_id"), when(sp.isNotNull, col("seq")).as("sp_seq"),
        col("event_type").as("last_lifecycle"),
        when(lifecycle, col("seq")).as("lc_seq"))
  }

  /** Mergeable per-container partial fold (route node / spec / lifecycle,
    * each with its marker seq). */
  private[graft] def nodeContainerPartial(ev: DataFrame): DataFrame =
    Folds.mergePartials(Seq(nodeContainerPartialRows(ev)), "id", nodeContainerPartialPairs)

  private[graft] val nodeContainerPartialPairs: Seq[(String, String)] =
    Seq("route_node_id" -> "rn_seq", "spec_id" -> "sp_seq", "last_lifecycle" -> "lc_seq")

  private[graft] def nodeContainerFromPartial(p: DataFrame): DataFrame =
    p.withColumn("alive", col("last_lifecycle") === "NodeContainerPlacedInRouteNetwork")
      .filter(col("alive"))
      .select(col("id"), col("route_node_id"), col("spec_id"), col("alive"))

  /** Final per-container state incl. route-node relation; join to spec dim
    * for name/category. `ProjektorState.cs:30-84`, `NodeContainerState.cs`. */
  def nodeContainerState(ev: DataFrame): DataFrame =
    nodeContainerFromPartial(nodeContainerPartial(ev))

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

  /** Event-level rows of the per-work-task partial (see
    * [[interestPartialRows]] for the fused-fold rationale). */
  private[graft] def workTaskPartialRows(ev: DataFrame): DataFrame = {
    val validCreate = typeIs("WorkTaskCreated") &&
      col("p.workTask.status").isNotNull && col("p.workTask.status") =!= ""
    val statusChanged = typeIs("WorkTaskStatusChanged")
    ev.filter(typeIs("WorkTaskCreated") || statusChanged)
      .select(col("p.workTaskId").as("id"),
        when(validCreate, col("p.workTask.number")).as("number"),
        when(validCreate, col("seq")).as("created_seq"),
        when(validCreate, col("p.workTask.status"))
          .when(statusChanged, col("p.status")).as("status"),
        when(validCreate || statusChanged, col("seq")).as("st_seq"))
  }

  /** Mergeable per-work-task partial fold. */
  private[graft] def workTaskPartial(ev: DataFrame): DataFrame =
    Folds.mergePartials(Seq(workTaskPartialRows(ev)), "id", workTaskPartialPairs)

  private[graft] val workTaskPartialPairs: Seq[(String, String)] =
    Seq("number" -> "created_seq", "status" -> "st_seq")

  private[graft] def workTaskFromPartial(p: DataFrame): DataFrame =
    p.filter(col("created_seq").isNotNull)
      .select(col("id"), col("number"), col("status"))

  /** Table 7: work_task (id, number, status). `ProjektorState.cs:591-613`. */
  def workTask(ev: DataFrame): DataFrame =
    workTaskFromPartial(workTaskPartial(ev))

  /** Event-level rows of the per-installation partial (see
    * [[interestPartialRows]] for the fused-fold rationale). */
  private[graft] def installationPartialRows(ev: DataFrame): DataFrame = {
    val created = typeIs("InstallationCreated")
    val types = Seq("InstallationCreated", "InstallationUnitAddressChanged",
      "InstallationStatusChanged", "InstallationLocationRemarkChanged")
    val condUa = created || typeIs("InstallationUnitAddressChanged")
    val condSt = created || typeIs("InstallationStatusChanged")
    val condLr = created || typeIs("InstallationLocationRemarkChanged")
    val seq = col("seq")
    ev.filter(col("event_type").isin(types: _*))
      .select(col("p.id").as("id"),
        col("p.installationId").as("installation_id"),
        when(created, seq).as("created_seq"),
        col("p.unitAddressId").as("unit_address_id"),
        when(condUa, seq).as("ua_seq"),
        col("p.status").as("status"),
        when(condSt, seq).as("st_seq"),
        col("p.locationRemark").as("location_remark"),
        when(condLr, seq).as("lr_seq"))
  }

  /** Mergeable per-installation partial fold (field families with marker
    * seqs). */
  private[graft] def installationPartial(ev: DataFrame): DataFrame =
    Folds.mergePartials(Seq(installationPartialRows(ev)), "id", installationPartialPairs)

  private[graft] val installationPartialPairs: Seq[(String, String)] =
    Seq("installation_id" -> "created_seq", "unit_address_id" -> "ua_seq",
      "status" -> "st_seq", "location_remark" -> "lr_seq")

  private[graft] def installationFromPartial(p: DataFrame): DataFrame =
    p.filter(col("created_seq").isNotNull)
      .select(col("id"), col("installation_id"), col("unit_address_id"),
        col("status"), col("location_remark"))

  /** Table 8: installation (id, installation_id, unit_address_id, status,
    * location_remark). Field-family wholesale overwrites incl. nulls
    * (`ProjektorState.cs:623-668`, `InstallationState.cs:21-33`). */
  def installation(ev: DataFrame): DataFrame =
    installationFromPartial(installationPartial(ev))

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
    spanStateFromPartial(spanEquipmentPartial(ev))

  /** Finalize a (merged) span partial into the folded state frame. */
  private[graft] def spanStateFromPartial(part: DataFrame): DataFrame =
    spanPartialWithFacts(part)
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

  /** EVENT-level rows of the span partial fold: one row per family event
    * in the partial's (value, marker) schema — NO placed filter, so the
    * incremental catch-up can fold the batch and merge onto stored state
    * in one aggregation (all batch seqs are greater than every stored
    * marker, so max-by-marker over `stored ∪ rows` is the exact
    * field-wise "batch value if present, else state" merge).
    */
  private[graft] def spanEquipmentPartialRows(ev: DataFrame): DataFrame = {
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
    fam.select(col("id"),
      col("pl"), when(col("pl").isNotNull, seq).as("placed_seq"),
      col("nodes_now").as("nodes"),
      when(col("nodes_now").isNotNull, seq).as("n_seq"),
      col("spec_now").as("eff_spec_id"),
      when(col("spec_now").isNotNull, seq).as("sp_seq"),
      col("addr_now").as("addr"),
      when(col("is_addr_event"), seq).as("last_addr_seq"),
      col("event_type").as("last_lifecycle"),
      when(col("is_lifecycle"), seq).as("lc_seq"))
  }

  /** Mergeable span partial (see [[interestPartialRows]] for the
    * fused-fold rationale behind the rows/aggregate split). */
  private[graft] def spanEquipmentPartial(ev: DataFrame): DataFrame =
    Folds.mergePartials(Seq(spanEquipmentPartialRows(ev)), "id", spanPartialPairs)

  /** (value, marker) pairs for merging span partials across batches. */
  private[graft] val spanPartialPairs: Seq[(String, String)] =
    Seq("pl" -> "placed_seq", "nodes" -> "n_seq", "eff_spec_id" -> "sp_seq",
      "addr" -> "last_addr_seq", "last_lifecycle" -> "lc_seq")

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
    // resolve parent via root segment id (final-state join; parents are
    // placed before affixes in well-formed logs)
    val affixes = affixEdges(ev)
      .join(spanState.select(col("root_segment_id"), col("id").as("parent_id")), Seq("root_segment_id"))
      .select(col("child_id"), col("seq"), col("parent_id"))

    val detaches = ev.filter(typeIs("SpanEquipmentDetachedFromParent"))
      .select(col("p.spanEquipmentId").as("child_id"), col("seq"))

    val withNextDetach = affixNextDetach(affixes, detaches)
    val setRows = withNextDetach.select(col("parent_id"), col("seq"), lit(true).as("flag"))
    val clearRows = withNextDetach.filter(col("next_detach_seq").isNotNull)
      .select(col("parent_id"), col("next_detach_seq").as("seq"), lit(false).as("flag"))
    val resetRows = spanState.select(col("id").as("parent_id"),
      col("placed_seq").as("seq"), lit(false).as("flag"))

    setRows.unionByName(clearRows).unionByName(resetRows)
      .groupBy(col("parent_id"))
      .agg(max_by(col("flag"), col("seq")).as("has_child"))
  }

  /** (child_id, seq, root_segment_id) per affix edge in `ev`: explicit
    * affix events plus placements carrying utility hops
    * (`ProjektorState.cs:349-424`). */
  private[graft] def affixEdges(ev: DataFrame): DataFrame = {
    val placedWithHops = typeIs("SpanEquipmentPlacedInRouteNetwork") &&
      size(col("p.equipment.utilityNetworkHops")) > 0
    val affixHops =
      when(typeIs("SpanEquipmentAffixedToParent"), col("p.newUtilityHopList"))
        .when(placedWithHops, col("p.equipment.utilityNetworkHops"))
    ev.filter(typeIs("SpanEquipmentAffixedToParent") || placedWithHops)
      .select(col("seq"),
        coalesce(col("p.spanEquipmentId"), col("p.equipment.id")).as("child_id"),
        explode(flatten(affixHops.getField("parentAffixes"))).as("affix"))
      .select(col("child_id"), col("seq"), col("affix.spanSegmentId").as("root_segment_id"))
  }

  /** Tagged per-family touched-id expressions over one decoded batch row —
    * the id columns of the partial folds WITHOUT the fold itself, as
    * `(family, ARRAY<STRING> of ids)` pairs (null/absent when the row is
    * outside the family). The incremental step folds ALL of them into ONE
    * single-scan driver collect ([[graft.streaming.Incremental.step]]):
    * per row, an exploded array of (family, ids) structs — instead of a
    * per-family `KeySet.fromDf` job each (~8 jobs × 0.1–0.3 s on the
    * 2-second hot path — VERDICT r7 #1; a union-of-frames formulation
    * re-decoded the not-yet-cached batch once per branch, serialized on
    * the cache-population lock). Each family's distinct non-null value
    * set equals the corresponding partial's id set BY CONSTRUCTION: the
    * folds group by exactly these expressions, and grouping cannot add or
    * drop an id. FusedKeysSpec pins the per-family equality over a full
    * synthetic log — keep the filters/expressions in lockstep when
    * editing a `*Partial` builder above.
    *
    * Excluded on purpose: st_terminal (its id set passes the spec
    * eligibility join — not batch-pure) and every post-merge set
    * (rootKeys, touchedChildren, hcK, touchedNodes) that reads stored
    * state. All ids here are STRING uuids; the fused collect validates
    * that via [[graft.streaming.KeySet.local]]. */
  private[graft] def touchedIdCols: Seq[(String, Column)] = {
    val placedWithHops = typeIs("SpanEquipmentPlacedInRouteNetwork") &&
      size(col("p.equipment.utilityNetworkHops")) > 0
    val affixHops =
      when(typeIs("SpanEquipmentAffixedToParent"), col("p.newUtilityHopList"))
        .when(placedWithHops, col("p.equipment.utilityNetworkHops"))
    Seq(
      "st_installation" -> when(col("event_type").isin("InstallationCreated",
          "InstallationUnitAddressChanged", "InstallationStatusChanged",
          "InstallationLocationRemarkChanged"), array(col("p.id"))),
      "st_work_task" -> when(typeIs("WorkTaskCreated") || typeIs("WorkTaskStatusChanged"),
        array(col("p.workTaskId"))),
      "st_node_container" -> when(col("event_type").isin(
          "NodeContainerPlacedInRouteNetwork", "NodeContainerRemovedFromRouteNetwork",
          "NodeContainerSpecificationChanged"),
        array(coalesce(col("p.container.id"), col("p.nodeContainerId")))),
      // terminalPlacements' container_id column
      "cont_refs" -> when(typeIs("TerminalEquipmentPlacedInNodeContainer"),
        array(col("p.equipment.nodeContainerId"))),
      // batch-pure SUPERSET of the terminal partial's id set: a placement
      // that fails the spec-eligibility filter (or resolves no route node)
      // contributes no partial row, but its id here only makes the merge
      // rewrite that terminal's stored rows unchanged — content-identical,
      // same argument as affix_children below
      "st_terminal" -> when(typeIs("TerminalEquipmentPlacedInNodeContainer"),
          array(col("p.equipment.id")))
        .when(col("event_type").isin("TerminalEquipmentRemoved",
          "TerminalEquipmentNamingInfoChanged", "TerminalEquipmentAddressInfoChanged"),
          array(col("p.terminalEquipmentId"))),
      "st_interest" -> when(col("event_type").isin(interestTypes: _*),
        array(coalesce(col("p.interest.id"), col("p.interestId")))),
      "st_span" -> when(col("event_type").isin("SpanEquipmentPlacedInRouteNetwork",
          "SpanEquipmentMoved", "SpanEquipmentMerged", "SpanEquipmentRemoved",
          "SpanEquipmentSpecificationChanged", "SpanEquipmentAddressInfoChanged"),
        array(coalesce(col("p.equipment.id"), col("p.spanEquipmentId")))),
      "ad_children" -> when(typeIs("SpanEquipmentAffixedToParent") ||
          typeIs("SpanEquipmentDetachedFromParent"), array(col("p.spanEquipmentId"))),
      // affixEdges' root_segment_id column (all hops' parent affixes)
      "root_ids" -> transform(flatten(affixHops.getField("parentAffixes")),
        a => a.getField("spanSegmentId")),
      // placedRootRows' root column (the st_root_segment merge keys)
      "new_root_ids" -> when(typeIs("SpanEquipmentPlacedInRouteNetwork"),
        array(col("p.equipment.spanStructures").getItem(0)
          .getField("spanSegments").getItem(0).getField("id"))),
      // affixEdges' child_id column ∪ detach children — the affix
      // chain's touched-children set. Equals the post-resolve set
      // (batchAffixes ∪ detaches children) whenever every affix root
      // resolves a parent, which well-formed logs guarantee (parents are
      // placed before affixes); an unresolved affix only ADDS its child
      // here, and extra keys in the st_child_affixes merge rewrite that
      // child's stored rows unchanged — content-identical either way
      "affix_children" -> when(typeIs("SpanEquipmentAffixedToParent") ||
          typeIs("SpanEquipmentDetachedFromParent"), array(col("p.spanEquipmentId")))
        .when(placedWithHops, array(col("p.equipment.id"))))
  }

  /** Per-family frames over one batch — the overflow-fallback and
    * parity-spec view of [[touchedIdCols]] (explode drops null/absent
    * arrays, so each frame carries exactly the family's id occurrences). */
  private[graft] def touchedIdFrames(ev: DataFrame): Seq[(String, DataFrame)] =
    touchedIdCols.map { case (f, ks) => f -> ev.select(explode(ks).as("k")) }

  /** (root_segment_id, id) index rows contributed by THIS batch's
    * placement events — the incremental maintenance delta of the
    * st_root_segment index. The root segment id is frozen at placement
    * (`SpanEquipmentState.Create`; [[spanPartialWithFacts]] reads it from
    * the placement-frozen `pl` struct), so a touched-but-not-placed span
    * cannot change its entry: the batch's placements ARE the full delta,
    * making the index merge batch-pure — no dependency on the merged
    * span partials, so [[graft.streaming.Incremental.step]] overlaps it
    * with the st_span merge instead of chaining after it. In-batch
    * re-placement (excluded by the reference's event model — see LogGen
    * scaladoc) would keep the last root by seq. */
  private[graft] def placedRootRows(ev: DataFrame): DataFrame =
    ev.filter(typeIs("SpanEquipmentPlacedInRouteNetwork"))
      .select(col("p.equipment.spanStructures").getItem(0)
          .getField("spanSegments").getItem(0).getField("id").as("root_segment_id"),
        col("p.equipment.id").as("id"), col("seq"))
      .filter(col("root_segment_id").isNotNull)
      .groupBy(col("id"))
      .agg(max_by(col("root_segment_id"), col("seq")).as("root_segment_id"))
      .select(col("root_segment_id"), col("id"))

  /** Attach to each affix row (child_id, seq, extra...) the child's first
    * detach seq strictly after it (`next_detach_seq`, NULL if none). The
    * per-child window partitions are bounded by a child's affix/detach
    * history — no global sort. Shared by the batch [[hasChildFlags]] and
    * the incremental catch-up (which injects stored not-yet-detached
    * affixes as rows at their original seqs). */
  private[graft] def affixNextDetach(affixRows: DataFrame, detachRows: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("child_id")).orderBy(col("seq"))
    affixRows.withColumn("is_detach", lit(false))
      .unionByName(detachRows.select(col("child_id"), col("seq"))
        .withColumn("is_detach", lit(true)), allowMissingColumns = true)
      .withColumn("next_detach_seq",
        min(when(col("is_detach"), col("seq")))
          .over(w.rowsBetween(1, Window.unboundedFollowing)))
      .filter(!col("is_detach"))
      .drop("is_detach")
  }

  /** Enriched span-equipment state: + is_customer_conduit (placement-time
    * spec name contains "ø12", `SpanEquipmentState.cs:53`), current
    * spec_name, outer_diameter (2-hop dimension chain), has_child.
    */
  /** Placement-spec dimension view: is_customer_conduit (spec name contains
    * "ø12", `SpanEquipmentState.cs:53`) keyed by placement_spec_id. */
  private[graft] def placementSpecDim(eqSpecs: DataFrame): DataFrame =
    eqSpecs.select(col("spec_id").as("placement_spec_id"),
      lower(col("spec_name")).contains("ø12").as("is_customer_conduit"),
      col("spec_is_cable").as("placement_spec_is_cable"))

  /** Current-spec dimension view: spec_name + outer_diameter (2-hop chain
    * through the structure spec) keyed by eff_spec_id. */
  private[graft] def currentSpecDim(eqSpecs: DataFrame, structSpecs: DataFrame): DataFrame =
    eqSpecs.join(broadcast(structSpecs), Seq("structure_spec_id"), "left")
      .select(col("spec_id").as("eff_spec_id"), col("spec_name"), col("outer_diameter"))

  /** Attach both spec dimension views (inner joins — the reference throws
    * on a missing spec, `ProjektorState.cs:56-58`). */
  private[graft] def withSpecDims(st: DataFrame, eqSpecs: DataFrame,
      structSpecs: DataFrame): DataFrame =
    st.join(broadcast(placementSpecDim(eqSpecs)), Seq("placement_spec_id"))
      .join(broadcast(currentSpecDim(eqSpecs, structSpecs)), Seq("eff_spec_id"))

  def spanEquipmentEnriched(ev: DataFrame): DataFrame = {
    val st = spanEquipmentState(ev)
    withSpecDims(st, spanEquipmentSpecs(ev), spanStructureSpecs(ev))
      .join(hasChildFlags(ev, st).withColumnRenamed("parent_id", "id"), Seq("id"), "left")
      .na.fill(false, Seq("has_child"))
  }

  /** span_equipment output rows from folded state + dims. The has_child
    * flag does not feed this table, so the output path skips the affix
    * timeline entirely. */
  private[graft] def spanEquipmentFromState(st: DataFrame, eqSpecs: DataFrame,
      structSpecs: DataFrame): DataFrame =
    withSpecDims(st, eqSpecs, structSpecs).filter(col("alive"))
      .select(col("id"), col("walk_of_interest_id").as("interest_id"),
        col("outer_diameter"), col("is_cable"), col("name"), col("spec_name"),
        col("access_address_id"), col("unit_address_id"))

  /** Table 4: span_equipment (id, interest_id, outer_diameter, is_cable,
    * name, spec_name, access_address_id, unit_address_id).
    * `PostgresWriter.cs:306-313`. */
  def spanEquipment(ev: DataFrame): DataFrame =
    spanEquipmentFromState(spanEquipmentState(ev), spanEquipmentSpecs(ev), spanStructureSpecs(ev))

  /** Table 6: conduit_slack (id, route_node_id, number_of_ends) — batch
    * recompute of the reference's incrementally-maintained ±1 counter
    * (`ProjektorState.cs:449-512`): per route node, the number of alive
    * customer-conduit ends with no terminal connection and no child span
    * equipment. `id` is a deterministic UUID of route_node_id.
    */
  def conduitSlack(ev: DataFrame): DataFrame =
    slackFromEnds(eligibleEnds(spanEquipmentEnriched(ev)))

  /** (id, route_node_id, end_kind) — one row per alive eligible conduit
    * end. The incremental catch-up materializes exactly these rows as a
    * state table bucketed by route node so a per-node recount reads only
    * the touched buckets. */
  private[graft] def eligibleEnds(enriched: DataFrame): DataFrame = {
    val st = enriched.filter(col("alive") && col("is_customer_conduit") && !col("has_child"))
    // ONE pass over the enriched subtree (r9): the previous
    // union-of-two-filters referenced `st` twice, and Catalyst executes a
    // duplicated subtree per union branch — in the incremental tail that
    // doubled the whole enriched computation INCLUDING the has-child
    // broadcast build (observed as twin broadcast-exchange jobs). An
    // exploded two-element array emits the same (from, to) end rows from
    // a single scan.
    st.select(col("id"), explode(array(
        when(!col("root_has_from"),
          struct(col("from_node_id").as("route_node_id"), lit("from").as("end_kind"))),
        when(!col("root_has_to"),
          struct(col("to_node_id").as("route_node_id"), lit("to").as("end_kind"))))).as("e"))
      .filter(col("e").isNotNull)
      .select(col("id"), col("e.route_node_id").as("route_node_id"),
        col("e.end_kind").as("end_kind"))
  }

  private[graft] def slackFromEnds(ends: DataFrame): DataFrame =
    ends.groupBy(col("route_node_id"))
      .agg(count(lit(1)).cast("int").as("number_of_ends"))
      .withColumn("id", deterministicUuid(col("route_node_id")))
      .select(col("id"), col("route_node_id"), col("number_of_ends"))

  /** Table 6 in REFERENCE-EXACT compat mode: replays the reference's ±1
    * counter arithmetic (`ProjektorState.cs:145-515`) — including its two
    * path-dependent double-count behaviors (duplicate affixes without an
    * intervening detach; children sharing a parent where both detach) —
    * as a relational ledger instead of a sequential loop. The default
    * [[conduitSlack]] stays the invariant recount; this mode exists for
    * bit-faithful migration off the reference.
    *
    * BATCH-ONLY by design: the incremental catch-up
    * ([[graft.streaming.Incremental.step]]) always applies the invariant
    * recount — compat mode exists for migration audits, which are batch
    * replays of a full log; a live stream maintaining the reference's
    * path-dependent double-counts would have to carry the whole ±1 ledger
    * as state for no operational benefit. CatchUpSpec pins this: on a log
    * with the pathological sequences, the incrementally-maintained
    * `conduit_slack` equals the DEFAULT (invariant) derivation.
    *
    * Reconstruction: every handler's ±1 is a ledger row whose condition is
    * evaluated against three as-of timelines, each expressible with a
    * per-entity forward-fill window (partitions bounded by one entity's
    * history — no global sort):
    *
    *   - has-child flag (set per resolved affix edge, cleared per detach
    *     or re-placement), ordered by (seq, intra-event edge position) with
    *     each edge's eligibility check sequenced BEFORE its own set — the
    *     reference checks slack-eligibility before flipping the flag;
    *   - from/to nodes (placements + moves/merges), move deltas against
    *     the lagged previous value;
    *   - root-segment map membership (placed & not removed as of the affix
    *     seq) for parent resolution.
    *
    * Detach increments are per ENTRY of the child's accumulated parent
    * list (duplicates included, `ProjektorState.cs:398-414`: the flag is
    * forced false inside the loop, so every entry with an unconnected end
    * on a customer conduit increments — the double-count).
    */
  def conduitSlackCompat(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val placed = typeIs("SpanEquipmentPlacedInRouteNetwork")
    val eq = col("p.equipment")

    // frozen placement facts + customer-conduit flag
    // (the shared subtrees below — facts, node timeline, resolved edges,
    // flag timeline — each feed MANY of the ±1 ledger branches; without
    // cutting lineage the final union's plan duplicates them
    // multiplicatively, exploding optimizer/codegen/broadcast work. They
    // are bounded by the affix/move/remove event counts, so eager
    // materialization is cheap at any scale.)
    val facts = spanPartialWithFacts(spanEquipmentPartial(ev))
      .filter(col("placed_seq").isNotNull)
      .join(broadcast(placementSpecDim(spanEquipmentSpecs(ev))
        .select(col("placement_spec_id"), col("is_customer_conduit"))), Seq("placement_spec_id"))
      .select(col("id"), col("root_segment_id"), col("is_customer_conduit").as("cust"),
        col("root_has_from"), col("root_has_to"))
      .localCheckpoint(true)

    // node timeline (placements + moves/merges) with lagged previous nodes
    val nodeTl = ev.filter(placed || typeIs("SpanEquipmentMoved") || typeIs("SpanEquipmentMerged"))
      .select(col("seq"), coalesce(eq.getField("id"), col("p.spanEquipmentId")).as("id"),
        coalesce(eq.getField("nodesOfInterestIds"), col("p.nodesOfInterestIds")).as("nodes"),
        placed.as("is_place"))
      .select(col("seq"), col("id"), col("is_place"),
        element_at(col("nodes"), 1).as("from_node"), element_at(col("nodes"), -1).as("to_node"))
    val wId = Window.partitionBy(col("id")).orderBy(col("seq"))
    val nodeTlLag = nodeTl
      .withColumn("prev_from", lag(col("from_node"), 1).over(wId))
      .withColumn("prev_to", lag(col("to_node"), 1).over(wId))
      .localCheckpoint(true)

    // affix edges with intra-event position, resolved against the root map
    // with reference liveness (parent placed & not removed as of the edge)
    val placedWithHops = placed && size(eq.getField("utilityNetworkHops")) > 0
    val affixHops = when(typeIs("SpanEquipmentAffixedToParent"), col("p.newUtilityHopList"))
      .when(placedWithHops, eq.getField("utilityNetworkHops"))
    val rawEdges = ev.filter(typeIs("SpanEquipmentAffixedToParent") || placedWithHops)
      .select(col("seq"), coalesce(col("p.spanEquipmentId"), eq.getField("id")).as("child_id"),
        posexplode(flatten(affixHops.getField("parentAffixes"))))
      .select(col("seq"), col("child_id"), (col("pos") + 1).as("pos"),
        col("col").getField("spanSegmentId").as("root_segment_id"))
      .join(facts.select(col("root_segment_id"), col("id").as("parent_id")), Seq("root_segment_id"))

    // liveness of the parent as of each edge: forward-fill place/remove
    val lifeRows = ev.filter(placed || typeIs("SpanEquipmentRemoved"))
      .select(coalesce(eq.getField("id"), col("p.spanEquipmentId")).as("parent_id"),
        col("seq"), lit(null).cast("long").as("q_seq"), lit(null).cast("long").as("q_pos"),
        placed.as("alive"))
    val lifeQueries = rawEdges.select(col("parent_id"), col("seq"), col("seq").as("q_seq"),
      col("pos").as("q_pos"), lit(null).cast("boolean").as("alive"))
    val wLife = Window.partitionBy(col("parent_id"))
      .orderBy(col("seq"), col("q_seq").isNotNull) // life event sorts before same-seq query
      .rowsBetween(Window.unboundedPreceding, -1)
    val edgeAlive = lifeRows.unionByName(lifeQueries)
      .withColumn("alive_asof", last(col("alive"), ignoreNulls = true).over(wLife))
      .filter(col("q_seq").isNotNull)
      .select(col("parent_id"), col("q_seq").as("seq"), col("q_pos").as("pos"),
        coalesce(col("alive_asof"), lit(false)).as("in_map"))
    val edges = rawEdges.join(edgeAlive, Seq("parent_id", "seq", "pos"))
      .filter(col("in_map"))
      .select(col("seq"), col("pos"), col("child_id"), col("parent_id"))
      .localCheckpoint(true)

    // detach events; each edge cleared by the child's next detach
    val detaches = ev.filter(typeIs("SpanEquipmentDetachedFromParent"))
      .select(col("p.spanEquipmentId").as("child_id"), col("seq"))
    val edgesWithClear = affixNextDetach(edges.select(col("child_id"), col("seq"),
      col("pos"), col("parent_id")), detaches).localCheckpoint(true)

    // flag timeline rows: (parent_id, seq, pos, kind, flag)
    // kind orders same-(seq,pos) rows: queries (0) see state BEFORE changes (1)
    val flagSets = edges.select(col("parent_id"), col("seq"), col("pos"), lit(true).as("flag"))
    val flagClears = edgesWithClear.filter(col("next_detach_seq").isNotNull)
      .select(col("parent_id"), col("next_detach_seq").as("seq"), lit(0L).as("pos"), lit(false).as("flag"))
      .distinct()
    val flagResets = ev.filter(placed)
      .select(eq.getField("id").as("parent_id"), col("seq"), lit(0L).as("pos"), lit(false).as("flag"))
    val flagChanges = flagSets.unionByName(flagClears).unionByName(flagResets)
      .withColumn("kind", lit(1))

    // flag queries: affix edges (before own set), moves, removes
    val moveOps = nodeTlLag.filter(!col("is_place"))
      .select(col("id").as("parent_id"), col("seq"), lit(0L).as("pos"),
        col("from_node"), col("to_node"), col("prev_from"), col("prev_to"))
    val removeOps = ev.filter(typeIs("SpanEquipmentRemoved"))
      .select(col("p.spanEquipmentId").as("parent_id"), col("seq"), lit(0L).as("pos"))
    val flagQueries = edges.select(col("parent_id"), col("seq"), col("pos"))
      .unionByName(moveOps.select(col("parent_id"), col("seq"), col("pos")))
      .unionByName(removeOps)
      .withColumn("kind", lit(0)).withColumn("flag", lit(null).cast("boolean"))
    val wFlag = Window.partitionBy(col("parent_id"))
      .orderBy(col("seq"), col("pos"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagAt = flagChanges.select(col("parent_id"), col("seq"), col("pos"), col("kind"), col("flag"))
      .unionByName(flagQueries.select(col("parent_id"), col("seq"), col("pos"), col("kind"), col("flag")))
      .withColumn("flag_before", coalesce(last(col("flag"), ignoreNulls = true).over(wFlag), lit(false)))
      .filter(col("kind") === 0)
      .select(col("parent_id"), col("seq"), col("pos"), col("flag_before"))
      .localCheckpoint(true)

    // nodes as of a query seq (strictly before — a move's own row excluded)
    def nodesAt(queries: DataFrame /*(parent_id, seq)*/): DataFrame = {
      val wNodes = Window.partitionBy(col("parent_id"))
        .orderBy(col("seq"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, -1)
      nodeTl.select(col("id").as("parent_id"), col("seq"), lit(1).as("kind"),
          col("from_node"), col("to_node"))
        .unionByName(queries.select(col("parent_id"), col("seq"), lit(0).as("kind"),
          lit(null).cast("string").as("from_node"), lit(null).cast("string").as("to_node")))
        .withColumn("from_asof", last(col("from_node"), ignoreNulls = true).over(wNodes))
        .withColumn("to_asof", last(col("to_node"), ignoreNulls = true).over(wNodes))
        .filter(col("kind") === 0)
        .select(col("parent_id"), col("seq"), col("from_asof"), col("to_asof"))
    }

    // ---- ledger rows: (route_node_id, delta) ----
    val custFacts = facts.select(col("id").as("parent_id"), col("cust"),
      col("root_has_from"), col("root_has_to"))

    // placements: +1 per eligible end (flag fresh-false)
    val placeRows = ev.filter(placed)
      .select(eq.getField("id").as("parent_id"), col("seq"),
        element_at(eq.getField("nodesOfInterestIds"), 1).as("from_node"),
        element_at(eq.getField("nodesOfInterestIds"), -1).as("to_node"))
      .join(custFacts, Seq("parent_id"))
    val placeDeltas =
      placeRows.filter(col("cust") && !col("root_has_from"))
        .select(col("from_node").as("route_node_id"), lit(1).as("delta"))
      .unionByName(placeRows.filter(col("cust") && !col("root_has_to"))
        .select(col("to_node").as("route_node_id"), lit(1).as("delta")))

    // moves: transfer per changed, eligible end
    val moveFlagged = moveOps.join(flagAt, Seq("parent_id", "seq", "pos"))
      .join(custFacts, Seq("parent_id"))
    def moveDelta(changed: Column, eligible: Column, oldNode: Column, newNode: Column) =
      moveFlagged.filter(changed && eligible && !col("flag_before"))
        .select(explode(array(struct(oldNode.as("route_node_id"), lit(-1).as("delta")),
          struct(newNode.as("route_node_id"), lit(1).as("delta")))).as("d"))
        .select(col("d.route_node_id"), col("d.delta"))
    val moveDeltas =
      moveDelta(col("prev_from") =!= col("from_node"), col("cust") && !col("root_has_from"),
        col("prev_from"), col("from_node"))
      .unionByName(moveDelta(col("prev_to") =!= col("to_node"), col("cust") && !col("root_has_to"),
        col("prev_to"), col("to_node")))

    // removals: -1 per eligible end at the then-current nodes
    val removeFlagged = removeOps.join(flagAt, Seq("parent_id", "seq", "pos"))
      .join(nodesAt(removeOps.select(col("parent_id"), col("seq"))), Seq("parent_id", "seq"))
      .join(custFacts, Seq("parent_id"))
    val removeDeltas =
      removeFlagged.filter(col("cust") && !col("root_has_from") && !col("flag_before"))
        .select(col("from_asof").as("route_node_id"), lit(-1).as("delta"))
      .unionByName(removeFlagged.filter(col("cust") && !col("root_has_to") && !col("flag_before"))
        .select(col("to_asof").as("route_node_id"), lit(-1).as("delta")))

    // affix edges: -1 per eligible end of the parent, flag checked BEFORE
    // this edge's own set (the reference's check-then-flip order)
    val edgeFlagged = edges.join(flagAt, Seq("parent_id", "seq", "pos"))
      .join(nodesAt(edges.select(col("parent_id"), col("seq")).distinct()), Seq("parent_id", "seq"))
      .join(custFacts, Seq("parent_id"))
    val affixDeltas =
      edgeFlagged.filter(col("cust") && !col("root_has_from") && !col("flag_before"))
        .select(col("from_asof").as("route_node_id"), lit(-1).as("delta"))
      .unionByName(edgeFlagged.filter(col("cust") && !col("root_has_to") && !col("flag_before"))
        .select(col("to_asof").as("route_node_id"), lit(-1).as("delta")))

    // detaches: +1 per LIST ENTRY (duplicates included) per unconnected
    // customer-conduit end — the flag is forced false in-loop, so no flag
    // condition applies (`ProjektorState.cs:398-414`)
    val detachEntries = edgesWithClear.filter(col("next_detach_seq").isNotNull)
      .select(col("parent_id"), col("next_detach_seq").as("seq"))
    val detachWithNodes = detachEntries
      .join(nodesAt(detachEntries.distinct()), Seq("parent_id", "seq"))
      .join(custFacts, Seq("parent_id"))
    val detachDeltas =
      detachWithNodes.filter(col("cust") && !col("root_has_from"))
        .select(col("from_asof").as("route_node_id"), lit(1).as("delta"))
      .unionByName(detachWithNodes.filter(col("cust") && !col("root_has_to"))
        .select(col("to_asof").as("route_node_id"), lit(1).as("delta")))

    placeDeltas.unionByName(moveDeltas).unionByName(removeDeltas)
      .unionByName(affixDeltas).unionByName(detachDeltas)
      .groupBy(col("route_node_id"))
      .agg(sum(col("delta")).cast("int").as("number_of_ends"))
      .filter(col("number_of_ends") =!= 0)
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
    val cableSpecs = spanEquipmentSpecs(ev).select(col("spec_id"), col("spec_is_cable"))
    // interest id resolved from the equipment's last placement (forward-fill
    // not needed: walkOfInterestId is placement-frozen, so the per-entity
    // fold value is exact)
    val interestOf = spanEquipmentState(ev).select(col("id").as("cable_id"),
      col("walk_of_interest_id").as("interest_id"))
    val applies = cablePlacementApplies(ev, cableSpecs)
      .unionByName(cableAffixDetachApplies(ev, interestOf))
    Walks.explodeOrdered(cableWalkResolve(interestWalkEvents(ev), lastApplyOf(applies)),
      "walk", "route_network_element_id", "seq_no")
      .select(col("fiber_cable_id"), col("route_network_element_id"), col("seq_no"))
  }

  /** Placement apply rows: (seq, cable_id, interest_id, hops) for
    * placements of cable-spec equipment or placements carrying hops
    * (`ProjektorState.cs:169-172,388,421`). */
  private[graft] def cablePlacementApplies(ev: DataFrame, cableSpecs: DataFrame): DataFrame = {
    val eq = col("p.equipment")
    ev.filter(typeIs("SpanEquipmentPlacedInRouteNetwork"))
      .select(col("seq"), eq.getField("id").as("cable_id"),
        eq.getField("walkOfInterestId").as("interest_id"),
        eq.getField("specificationId").as("spec_id"),
        eq.getField("utilityNetworkHops").as("hops"))
      .join(broadcast(cableSpecs), Seq("spec_id"), "left")
      .filter(coalesce(col("spec_is_cable"), lit(false)) || size(col("hops")) > 0)
      .select(col("seq"), col("cable_id"), col("interest_id"), col("hops"))
  }

  /** Affix/detach apply rows; `interestOf` maps cable_id → interest_id. */
  private[graft] def cableAffixDetachApplies(ev: DataFrame, interestOf: DataFrame): DataFrame =
    ev.filter(typeIs("SpanEquipmentAffixedToParent") ||
        typeIs("SpanEquipmentDetachedFromParent"))
      .select(col("seq"), col("p.spanEquipmentId").as("cable_id"),
        col("p.newUtilityHopList").as("hops"))
      .join(interestOf, Seq("cable_id"))

  /** The LAST apply event per equipment wins (its hop list snapshots the
    * walk as of that seq). */
  private[graft] def lastApplyOf(applies: DataFrame): DataFrame =
    applies.groupBy(col("cable_id"))
      .agg(max_by(struct(col("seq"), col("interest_id"), col("hops")), col("seq")).as("a"))
      .select(col("cable_id"), col("a.seq").as("seq"), col("a.interest_id").as("interest_id"),
        col("a.hops").as("hops"))

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
  def serviceTermination(ev: DataFrame): DataFrame =
    serviceTerminationFromPartial(terminalPartial(
      terminalPlacementRows(containerRelEvents(ev), terminalPlacements(ev), terminalSpecs(ev)),
      terminalUpdateRows(ev)))

  /** Container relation timeline rows: (seq, container_id, rel
    * STRUCT<route_node_id>) — placed writes the node, removed writes a
    * null marker that survives forward fill. */
  private[graft] def containerRelEvents(ev: DataFrame): DataFrame =
    ev.filter(typeIs("NodeContainerPlacedInRouteNetwork") ||
        typeIs("NodeContainerRemovedFromRouteNetwork"))
      .select(col("seq"),
        coalesce(col("p.container.id"), col("p.nodeContainerId")).as("container_id"),
        struct(when(typeIs("NodeContainerPlacedInRouteNetwork"),
          col("p.container.routeNodeId")).as("route_node_id")).as("rel"))

  /** Raw terminal placement rows: (seq, container_id, t STRUCT). */
  private[graft] def terminalPlacements(ev: DataFrame): DataFrame = {
    val eq = col("p.equipment")
    ev.filter(typeIs("TerminalEquipmentPlacedInNodeContainer"))
      .select(col("seq"), eq.getField("nodeContainerId").as("container_id"),
        struct(eq.getField("id").as("id"), eq.getField("name").as("name"),
          eq.getField("specificationId").as("spec_id"),
          eq.getField("addressInfo").as("address_info")).as("t"))
  }

  /** Resolve terminal placements against the container relation timeline
    * **as of each placement's seq** (forward-fill window) and apply the
    * spec eligibility filter (silent skip, `ProjektorState.cs:529-547`).
    * Shared by the full derivation and the incremental catch-up, which
    * injects stored container state as pseudo rel rows at pre-batch seqs.
    */
  private[graft] def terminalPlacementRows(relEvents: DataFrame,
      termPlacements: DataFrame, specDim: DataFrame): DataFrame = {
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
      .join(broadcast(specDim), col("t.spec_id") === col("spec_id"))
      .filter(col("is_customer_termination"))
      .select(col("seq"), col("t.id").as("id"), col("route_node_id"),
        col("t.name").as("name"), col("t.address_info").as("address_info"))

    eligible.select(col("seq"), lit("placement").as("event_type"), col("id"),
      struct(col("name")).as("naming"), col("address_info").as("addr"),
      col("route_node_id"), col("seq").as("placement_seq"))
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

  /** Event-level rows of the terminal partial over placement + update
    * rows (see [[interestPartialRows]] for the fused-fold rationale). */
  private[graft] def terminalPartialRows(placementRows: DataFrame,
      updateRows: DataFrame): DataFrame = {
    val seq = col("seq")
    val condNm = col("event_type").isin("placement", "TerminalEquipmentNamingInfoChanged")
    val condAd = col("event_type").isin("placement", "TerminalEquipmentAddressInfoChanged")
    placementRows.unionByName(updateRows)
      .select(col("id"),
        col("route_node_id"), when(col("route_node_id").isNotNull, seq).as("rn_seq"),
        col("naming"), when(condNm, seq).as("nm_seq"),
        col("addr"), when(condAd, seq).as("ad_seq"),
        col("placement_seq"),
        when(typeIs("TerminalEquipmentRemoved"), seq).as("removed_seq"))
  }

  /** Mergeable terminal partial fold over placement + update rows. The
    * incremental catch-up folds the batch's rows and merges onto stored
    * partials in one aggregation ([[graft.ops.Folds.mergePartials]]). */
  private[graft] def terminalPartial(placementRows: DataFrame,
      updateRows: DataFrame): DataFrame =
    Folds.mergePartials(Seq(terminalPartialRows(placementRows, updateRows)),
      "id", terminalPartialPairs, terminalPartialSeqs)

  private[graft] val terminalPartialPairs: Seq[(String, String)] =
    Seq("route_node_id" -> "rn_seq", "naming" -> "nm_seq", "addr" -> "ad_seq")

  private[graft] val terminalPartialSeqs: Seq[String] = Seq("placement_seq", "removed_seq")

  /** Surviving terminals only: placed, and not removed since the last
    * placement (`placement_seq > removed_seq`). */
  private[graft] def serviceTerminationFromPartial(p: DataFrame): DataFrame =
    p.filter(col("placement_seq").isNotNull &&
        col("placement_seq") > coalesce(col("removed_seq"), lit(Long.MinValue)))
      .select(col("id"), col("route_node_id"), col("naming").getField("name").as("name"),
        col("addr.accessAddressId").as("access_address_id"),
        col("addr.unitAddressId").as("unit_address_id"))

  // ---------------------------------------------------------------------

  /** All 8 tables from a decoded event log. `slackCompat = true` swaps the
    * conduit_slack derivation for the reference-exact ±1 ledger replay
    * ([[conduitSlackCompat]], including the reference's double-count
    * behaviors); the default stays the invariant recount. */
  def deriveAll(ev: DataFrame, slackCompat: Boolean = false): Map[String, DataFrame] = Map(
    "rel_interest_to_route_element" -> relInterestToRouteElement(ev),
    "rel_fiber_cable_to_route_element" -> relFiberCableToRouteElement(ev),
    "node_container" -> nodeContainer(ev),
    "span_equipment" -> spanEquipment(ev),
    "service_termination" -> serviceTermination(ev),
    "conduit_slack" -> (if (slackCompat) conduitSlackCompat(ev) else conduitSlack(ev)),
    "work_task" -> workTask(ev),
    "installation" -> installation(ev))

  /** All 8 tables with the shared folded subtrees — span-equipment state,
    * enriched state, spec dims — computed ONCE and cached across the 8
    * table plans (r1 #7 / r2 #7: `deriveAll` used to re-fold
    * `spanEquipmentState` independently under span_equipment, conduit_slack
    * and rel_fiber_cable). Returns the tables plus a release() that
    * unpersists the shared frames after the caller has written all
    * outputs. The folded states are one row per entity — orders of
    * magnitude smaller than the log, safe to cache at any scale.
    */
  def deriveAllCached(ev: DataFrame): (Map[String, DataFrame], () => Unit) = {
    val eqSpecs = spanEquipmentSpecs(ev).cache()
    val structSpecs = spanStructureSpecs(ev).cache()
    val st = spanEquipmentState(ev).cache()
    val enriched = withSpecDims(st, eqSpecs, structSpecs)
      .join(hasChildFlags(ev, st).withColumnRenamed("parent_id", "id"), Seq("id"), "left")
      .na.fill(false, Seq("has_child"))
    val interestOf = st.select(col("id").as("cable_id"),
      col("walk_of_interest_id").as("interest_id"))
    val applies = cablePlacementApplies(ev, eqSpecs.select(col("spec_id"), col("spec_is_cable")))
      .unionByName(cableAffixDetachApplies(ev, interestOf))
    val relCable = Walks.explodeOrdered(
      cableWalkResolve(interestWalkEvents(ev), lastApplyOf(applies)),
      "walk", "route_network_element_id", "seq_no")
      .select(col("fiber_cable_id"), col("route_network_element_id"), col("seq_no"))
    val tables = Map(
      "rel_interest_to_route_element" -> relInterestToRouteElement(ev),
      "rel_fiber_cable_to_route_element" -> relCable,
      "node_container" -> nodeContainer(ev),
      "span_equipment" -> spanEquipmentFromState(st, eqSpecs, structSpecs),
      "service_termination" -> serviceTermination(ev),
      "conduit_slack" -> slackFromEnds(eligibleEnds(enriched)),
      "work_task" -> workTask(ev),
      "installation" -> installation(ev))
    (tables, () => { eqSpecs.unpersist(); structSpecs.unpersist(); st.unpersist(); () })
  }
}
