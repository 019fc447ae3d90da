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
  // disjoint store tables): a step is dozens of small driver actions whose
  // per-job latency, not data volume, bounds the 2-second loop — section
  // threads (and the output sub-sections they spawn) overlap that latency.
  // Daemon pool, shared across steps.
  // 8 threads: up to 5 top-level tasks (inst, wt, ncTerm, root merge,
  // affix chain) can be in flight before their sub-sections land; the
  // extra headroom keeps a spawned sub-section from queueing behind a
  // blocked parent. Threads block on driver-side Await almost all their
  // life — the count bounds concurrent Spark job SUBMISSIONS, not CPU.
  private lazy val stepEc = scala.concurrent.ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newFixedThreadPool(8, (r: Runnable) => {
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
    * after the st_span merge it reads).
    *
    * Returns whether the batch carried any events (the fused step-start
    * collect knows for free) — so [[CatchUp]] needs NO separate
    * `batch.isEmpty` job on the 2-second path; an already-applied
    * redelivery reports true (it did carry the events, last time). */
  def step(store: StateStore, batchDecoded: DataFrame, sink: Sink = noSink,
      batchId: Long = -1L): Boolean = {
    if (batchId >= 0 && store.lastAppliedBatch.exists(_ >= batchId)) return true
    if (batchId >= 0) store.clearSnapshots(batchId) // drop other batches' leftovers
    val spark = batchDecoded.sparkSession
    val sc = spark.sparkContext
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val rawSink = sink
    // with the no-op sink the per-table delete/upsert frames are never
    // consumed — skip their materialization and the sink calls outright
    val sinkActive = sink ne noSink
    val syncSink: Sink = (t, d, u) => rawSink.synchronized { rawSink(t, d, u) }
    val cap = store.maxInsetKeys
    def ksUnion(a: KeySet, b: KeySet): KeySet = KeySet.union(a, b, cap, spark)
    // concurrent: sections may SPAWN sub-sections from their own threads
    // (a family's output merge depends only on the already-written
    // merged frame, so it runs concurrently with the family's remaining
    // chain). A child is enqueued before its parent's body returns, so
    // draining the queue until empty quiesces the whole tree.
    val pending = new java.util.concurrent.ConcurrentLinkedQueue[Future[Any]]()
    def section(body: => Unit): Unit = { pending.add(Future(body)(stepEc)); () }
    def tracked[T](body: => T): Future[T] = {
      val f = Future(body)(stepEc); pending.add(f); f
    }
    // Snapshot the persisted-RDD set: every localCheckpoint below caches
    // blocks that outlive the step (ContextCleaner frees them only on GC),
    // and a long-running stream — or a long test suite — accumulates them
    // until the MemoryStore chokes. All step outputs land in the store
    // files, so everything persisted WITHIN the step is garbage at exit.
    val persistedBefore = sc.getPersistentRDDs.keySet
    val b = batchDecoded.persist()
    try {
      // ---------- fused step-start collect (VERDICT r7 #1) ----------
      // ONE bounded job answers every batch-pure question the step asks up
      // front: which event types are present (dim + section gating) AND
      // each family's touched-id set ([[Derivations.touchedIdFrames]] —
      // the per-family KeySet.fromDf jobs this replaces cost 0.1–0.3 s
      // each on the 2-second hot path). A family whose set exceeds the
      // cap falls back to the distributed KeySet path individually; a
      // blown global bound falls back to the pre-fusion shape wholesale
      // (exact types collect + per-family fromDf inside each section) —
      // StepDistKeysSpec drives the step with a tiny cap so both
      // fallbacks stay E2E-exercised.
      val idCols = Derivations.touchedIdCols
      // global bound: every family under its cap, plus the ≤28-element
      // event-type domain; CollectLimit fetches partitions incrementally,
      // so a normal micro-batch collects a few hundred rows
      val fusedBound = idCols.size * cap + 40
      // ONE scan of the batch (this is also the action that populates the
      // batch cache): per row, an exploded array of (family, ids) structs
      // — a union-of-frames formulation here re-decoded the uncached
      // batch once per branch, serialized on the cache-population lock
      val entryCols = idCols.map { case (f, ks) =>
        struct(lit(f).as("f"), ks.as("ks")) } :+
        struct(lit("__types").as("f"), array(col("event_type")).as("ks"))
      val fusedRows = b.select(explode(array(entryCols: _*)).as("e"))
        .select(col("e.f").as("f"), explode(col("e.ks")).as("k"))
        .filter(col("k").isNotNull).distinct()
        .limit(fusedBound + 1).collect()
      // ONE lazily-built frame map serves BOTH fallbacks (the per-family
      // over-cap spill and fusedOr's overflow path): Dataset.select runs
      // Catalyst analysis eagerly, so building ~11 analyzed plans per
      // batch unconditionally would be pure waste on the 2-second path —
      // the steady state never touches them
      lazy val idFrameMap = Derivations.touchedIdFrames(b).toMap
      val (typesPresent, fusedKeys): (Set[String], Map[String, KeySet]) =
        if (fusedRows.length > fusedBound)
          (b.select(col("event_type")).distinct().collect()
            .map(_.getString(0)).toSet, Map.empty[String, KeySet])
        else {
          val byF = fusedRows.groupBy(_.getString(0))
          val km = idCols.map { case (f, _) =>
            val vals: Array[Any] = byF.getOrElse(f, Array.empty[org.apache.spark.sql.Row])
              .map(_.get(1))
            f -> (if (vals.length <= cap)
                KeySet.local(vals, org.apache.spark.sql.types.StringType)
              else KeySet.fromDf(idFrameMap(f), cap))
          }.toMap
          (byF.getOrElse("__types", Array.empty[org.apache.spark.sql.Row])
            .map(_.getString(1)).toSet, km)
        }
      // fused set when the one-job collect produced it; a bounded collect
      // of the same canonical id frame otherwise (overflow fallback)
      def fusedOr(f: String): KeySet =
        fusedKeys.getOrElse(f, KeySet.fromDf(idFrameMap(f), cap))
      // an events-free batch (e.g. a seeded prefix file pruned by the
      // high-water filter) stops here — every section would skip anyway,
      // and NOT marking it applied matches the stream's pre-fusion
      // isEmpty contract (replaying an empty batch is a no-op)
      if (typesPresent.isEmpty) return false

      // ---------- shared per-family "pin snapshot → merge → output" shape
      // (VERDICT r9 #3) for families whose PRE-batch state feeds a
      // downstream as-of resolve over MORE keys than the batch touches
      // (st_node_container → terminal chain, st_interest → pseudo-walks).
      // Returns the pre-merge stored view over (batch ∪ extra) keys and
      // schedules the family merge plus its output off the caller's
      // critical path:
      //   - batch mode: the widened snapshot is PINNED first (driver-side
      //     bucket copy, milliseconds) and the merge — over the batch keys
      //     ONLY; merging the extras would rewrite their stored rows
      //     byte-unchanged, widening the write bucket span for nothing —
      //     runs with its output on a concurrent sub-section. The
      //     sub-section's mergeFamily re-reads the SAME pinned snapshot
      //     dirs (keys0 ⊆ keysAll and the manifest marks every bucket
      //     copied, so its readKeyedSnap is a listing, not a copy);
      //   - ad-hoc mode (batchId < 0): no pinned snapshot dir exists, so a
      //     live pre-merge read would race a concurrent merge's bucket
      //     swap — the merge runs INLINE with extraReadKeys widening its
      //     checkpointed snapshot, which doubles as the returned view; the
      //     output alone goes to a sub-section.
      // The batchId < 0 fork lives here and ONLY here; keys0 is threaded
      // into the merge so the fused-collect OVERFLOW fallback does not pay
      // the distinct+collect job twice.
      def preViewMerge(table: String, idCol: String, partial: DataFrame,
          pairs: Seq[(String, String)], extraKeys: KeySet,
          output: (KeySet, DataFrame) => Unit): DataFrame =
        if (batchId >= 0) {
          val keys0 = fusedKeys.getOrElse(table,
            KeySet.fromDf(partial.select(col(idCol)), cap))
          val keysAll = KeySet.union(keys0, extraKeys, cap, spark)
          val snap = store.readKeyedSnap(batchId, table, partial.schema, idCol, keysAll)
          section {
            val (keys, _, merged) = mergeFamily(store, table, idCol, partial, pairs, Nil,
              batchId = batchId, batchKeys = Some(keys0))
            output(keys, merged)
          }
          snap
        } else {
          val (keys, stored, merged) = mergeFamily(store, table, idCol, partial, pairs, Nil,
            extraReadKeys = Some(extraKeys), batchId = batchId,
            batchKeys = fusedKeys.get(table))
          section { output(keys, merged) }
          stored
        }

      // ---------- dimension tables (tiny; merged first — every family
      // finalizer joins them) ----------
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
          Derivations.installationPartialRows(b), Derivations.installationPartialPairs, Nil,
          batchId = batchId, snapshot = false,
          batchKeys = fusedKeys.get("st_installation"))
        writeOutput(store, syncSink, sinkActive, "installation", instKeys,
          Derivations.installationFromPartial(instMerged))
      }

      if (has(wtTypes)) section {
        val (wtKeys, _, wtMerged) = mergeFamily(store, "st_work_task", "id",
          Derivations.workTaskPartialRows(b), Derivations.workTaskPartialPairs, Nil,
          batchId = batchId, snapshot = false,
          batchKeys = fusedKeys.get("st_work_task"))
        writeOutput(store, syncSink, sinkActive, "work_task", wtKeys,
          Derivations.workTaskFromPartial(wtMerged))
      }

      // ---------- node containers + service terminations (concurrent; see
      // below — moved ahead of the span chain so the section overlaps it) --
      if (has(ncTermTypes)) section {
        val termPlac = Derivations.terminalPlacements(b) // (seq, container_id, t)
        val contRefs = fusedOr("cont_refs")
        val ncPartial = Derivations.nodeContainerPartialRows(b)
        // r9: the terminal chain consumes ONLY the PRE-merge
        // st_node_container view — preViewMerge pins it and runs the nc
        // merge + node_container output concurrent with the terminal fold
        // instead of queueing the terminal chain behind the nc merge's
        // write (measured ~0.9 s of dead time on the dense critical path)
        val ncStored = preViewMerge("st_node_container", "id", ncPartial,
          Derivations.nodeContainerPartialPairs, contRefs,
          (ncKeys, ncMerged) =>
            writeOutput(store, syncSink, sinkActive, "node_container", ncKeys,
              Derivations.nodeContainerFromPartial(ncMerged)
                .join(broadcast(ncSpecs), Seq("spec_id"), "inner")
                .select(col("id"), col("route_node_id"), col("spec_name"), col("spec_category"))))

        val pseudoRel = ncStored.select(col("lc_seq").as("seq"),
          col("id").as("container_id"),
          struct(when(col("last_lifecycle") === "NodeContainerPlacedInRouteNetwork",
            col("route_node_id")).as("route_node_id")).as("rel"))
        val relRows = pseudoRel.unionByName(Derivations.containerRelEvents(b))
        val bTerm = Derivations.terminalPartialRows(
          Derivations.terminalPlacementRows(relRows, termPlac, termSpecs),
          Derivations.terminalUpdateRows(b))
        // st_terminal's own stored partial feeds only its merge (the as-of
        // inputs come from the st_node_container SNAPSHOT above)
        // fused batch keys are a batch-pure SUPERSET of bTerm's ids (a
        // spec-filtered placement folds no partial row) — the merge
        // rewrites those terminals' stored rows unchanged, the same
        // contract affix_children relies on (Derivations.touchedIdCols)
        val (termKeys, _, termMerged) = mergeFamily(store, "st_terminal", "id", bTerm,
          Derivations.terminalPartialPairs, Derivations.terminalPartialSeqs,
          batchId = batchId, snapshot = false,
          batchKeys = fusedKeys.get("st_terminal"))
        writeOutput(store, syncSink, sinkActive, "service_termination", termKeys,
          Derivations.serviceTerminationFromPartial(termMerged))
      }

      // ---------- interests + cable walks (concurrent; launched BEFORE the
      // st_span merge when a real batch snapshot is available (r8) —
      // affix/detach interest ids resolve the placement-frozen `pl` struct,
      // which the PRE-merge span snapshot ∪ the batch partial determine
      // exactly (pl merges as lastNonNull on placed_seq, so
      // merge(snapshot, batch) ≡ the post-merge value); the as-of resolve
      // reads the PRE-merge interest snapshot. Without a batch id
      // (diagnostic/spec drivers) there is no pinned snapshot, so the
      // section keeps the post-merge read and launches after the merge.
      // Gated on the event types that can actually change an interest or a
      // cable walk: interest events, cable/conduit placements, affixes and
      // detaches. A move-only span batch (the steady-state mix) skips the
      // whole section — moves touch neither walks nor interests. ----------
      val bSpan = Derivations.spanEquipmentPartialRows(b)
      val hasAffixDetach = typesPresent("SpanEquipmentAffixedToParent") ||
        typesPresent("SpanEquipmentDetachedFromParent")
      val interestRelevant = has(interestTypes) || hasAffixDetach ||
        typesPresent("SpanEquipmentPlacedInRouteNetwork")
      def launchInterestSection(spanPreMerge: Option[DataFrame]): Unit = section {
        val interestOf =
          if (hasAffixDetach) spanPreMerge match {
            case Some(snap) =>
              // ADVICE r8: restrict the batch side to ad_children BEFORE the
              // fold so both branches of interestOf produce the same frame —
              // the snapshot is already ad_children-keyed, and an
              // unrestricted bSpan would add a row for EVERY batch-touched
              // span id (harmless for today's inner-joining consumer, but a
              // latent trap for any new one).
              val adChildren = fusedOr("ad_children")
              Folds.mergePartials(
                Seq(snap, restrictToKeys(bSpan, adChildren, "id", bSpan.columns.toSeq)),
                "id", Seq("pl" -> "placed_seq"))
                .select(col("id").as("cable_id"),
                  col("pl").getField("walk_of_interest_id").as("interest_id"))
            case None =>
              val adChildren = fusedOr("ad_children")
              store.readKeyed("st_span", bSpan.schema, "id", adChildren)
                .select(col("id").as("cable_id"),
                  col("pl").getField("walk_of_interest_id").as("interest_id"))
          } else emptyFrame(spark, StructType.fromDDL("cable_id STRING, interest_id STRING"))
        val applies = Derivations
          .cablePlacementApplies(b, eqSpecs.select(col("spec_id"), col("spec_is_cable")))
          .unionByName(Derivations.cableAffixDetachApplies(b, interestOf))
        // ONE bounded collect replaces the r8 eager-checkpoint +
        // two-column-collect pair (r9): within the cap the full
        // (cable_id, seq, interest_id, hops) rows come back to the driver
        // — the same O(touched cables) bound the old two-column collect
        // already put on the driver heap, plus their batch-bounded hop
        // lists — and re-enter the plan as a LOCAL relation, so the walk
        // resolve unions a LocalRelation instead of scanning checkpoint
        // blocks and the applies subtree evaluates exactly once. The LAZY
        // checkpoint mark (the affix-timeline pattern) makes the >cap
        // fallback free of recompute too: the collect's job finalizes the
        // marked RDD, so the distributed-keys path below reads pinned
        // blocks instead of re-running the applies subtree (code-review
        // r9); in the common ≤cap case the pinned blocks are a few
        // hundred tiny rows released by the step-end unpersist sweep.
        val lastApplyPlan = Derivations.lastApplyOf(applies).localCheckpoint(false)
        val laFull = lastApplyPlan.limit(cap + 1).collect()
        val (lastApply, applyInterests, cableKeys) =
          if (laFull.length <= cap) {
            import scala.jdk.CollectionConverters._
            (spark.createDataFrame(laFull.toSeq.asJava, lastApplyPlan.schema),
              KeySet.local(laFull.map(_.getAs[Any]("interest_id")).filter(_ != null)),
              KeySet.local(laFull.map(_.getAs[Any]("cable_id")).filter(_ != null)))
          } else
            (lastApplyPlan, KeySet.fromDf(lastApplyPlan.select(col("interest_id")), cap),
              KeySet.fromDf(lastApplyPlan.select(col("cable_id")), cap))

        // applyInterests widen only the pre-merge view (the as-of
        // pseudo-walk interests), never the merge — preViewMerge's shared
        // contract. r10: in batch mode the interest merge + rel_interest
        // output now run on a concurrent sub-section (the nc pattern),
        // taking the merge off the walk-resolve critical path — the
        // pseudo-walk union below reads the pinned snapshot, not the merge.
        val intPartial = Derivations.interestPartialRows(b)
        val intStored = preViewMerge("st_interest", "interest_id", intPartial,
          Derivations.interestPartialPairs, applyInterests,
          (intKeys, intMerged) =>
            writeOutput(store, syncSink, sinkActive, "rel_interest_to_route_element", intKeys,
              Walks.explodeOrdered(
                Derivations.interestFromPartial(intMerged).filter(col("alive"))
                  .select(col("interest_id"), col("walk")),
                "walk", "route_network_element_id", "seq_no")
                .select(col("interest_id"), col("route_network_element_id"), col("seq_no"))))

        // pre-batch interest state as pseudo walk events at the stored seq
        // (strictly below every batch seq); an unregistered interest yields
        // the struct(null) marker that survives forward fill
        val hopsType = EventLog.payloadSchema("newUtilityHopList").dataType
        val pseudoWalk = intStored.select(col("lt_seq").as("seq"), col("interest_id"),
          struct(when(col("last_type") =!= "InterestUnregistered", col("walk")).as("walk")).as("w"),
          lit(null.asInstanceOf[String]).as("cable_id"),
          lit(null).cast(hopsType).as("hops"))
        val walkEvents = Derivations.interestWalkEvents(b).unionByName(pseudoWalk)
        writeOutput(store, syncSink, sinkActive, "rel_fiber_cable_to_route_element", cableKeys,
          Walks.explodeOrdered(Derivations.cableWalkResolve(walkEvents, lastApply),
            "walk", "route_network_element_id", "seq_no")
            .select(col("fiber_cable_id"), col("route_network_element_id"), col("seq_no")))
      }

      // ---------- span equipment chain: partial merge + root-segment
      // index + affix/has-child state + outputs + slack recount.
      // Sub-chains are gated on the event types that can change them (the
      // steady-state mix is move-heavy): the root-segment index derives
      // from the placement-frozen `pl` struct, so only placements change
      // it; the affix timeline needs affixes/detaches (edges, clears) or
      // placements (flag resets). The eligible-end/slack recount always
      // runs for touched spans — moves change node positions. ----------
      if (has(spanTypes)) {
      // the st_root_segment index delta is batch-pure — the root segment
      // id is placement-frozen, so the batch's placements ARE the full
      // delta ([[Derivations.placedRootRows]]); its merge overlaps the
      // st_span merge on a section thread instead of chaining after it.
      val needAffixChain = hasAffixDetach ||
        typesPresent("SpanEquipmentPlacedInRouteNetwork")
      val affixRootIds = if (needAffixChain) fusedOr("root_ids") else KeySet.empty
      // pin the pre-merge root rows the affix chain resolves against
      // (driver-side bucket copy, milliseconds) BEFORE the root merge
      // launches: snapshot ∪ the batch-pure delta ≡ the post-merge read
      // (a root id is placement-frozen, so stored and delta rows for the
      // same root are byte-identical — replay included — and distinct()
      // restores row multiplicity), so the chain drops the root-merge
      // await from its critical path (r8). batchId < 0 has no pinned
      // snapshot: those callers keep the await + post-merge read.
      val rootSnapOpt: Option[DataFrame] =
        if (needAffixChain && batchId >= 0 &&
            typesPresent("SpanEquipmentPlacedInRouteNetwork"))
          Some(store.readKeyedSnap(batchId, "st_root_segment", rootSchema,
            "root_segment_id", affixRootIds))
        else None
      val fRootMerge: Option[Future[Any]] =
        if (typesPresent("SpanEquipmentPlacedInRouteNetwork"))
          Some(tracked(store.mergeReplace("st_root_segment", "root_segment_id",
            fusedOr("new_root_ids"), Derivations.placedRootRows(b))))
        else None
      // ---------- affix timeline → child-affix + has-child state ----------
      // Runs CONCURRENTLY with the st_span merge below (r8): the chain
      // reads the pinned st_root_segment snapshot (∪ the batch-pure
      // delta), the st_child_affixes SNAPSHOT and st_has_child, and
      // batch-pure frames — none of which the st_span merge or the
      // concurrent st_root_segment merge touches. Only the eligible-end
      // recount needs BOTH seKeys and hcKeys, so that is where the future
      // is joined. The batchId < 0 fallback awaits fRootMerge before a
      // post-merge read; await-inside-a-pool-task is safe by submission
      // order: stepEc is FIFO, fRootMerge is submitted before this
      // future, and a FIFO pool starts tasks in submission order — the
      // awaited task is already running (or done) when the awaiter
      // starts.
      val fHc: scala.concurrent.Future[(KeySet, Option[DataFrame])] =
      if (needAffixChain) tracked {
        val edges = Derivations.affixEdges(b) // (child_id, seq, root_segment_id)
        val detaches = b.filter(col("event_type") === "SpanEquipmentDetachedFromParent")
          .select(col("p.spanEquipmentId").as("child_id"), col("seq"))
        // batch-pure superset of (batchAffixes ∪ detaches) children — equal
        // in well-formed logs; see the affix_children note in
        // [[Derivations.touchedIdCols]]
        val touchedChildren = fusedOr("affix_children")
        // the st_child_affixes snapshot copy is DRIVER-side file I/O —
        // taken first so the copy overlaps the concurrent
        // st_root_segment write instead of chaining after it
        val storedAffixesOpt =
          if (touchedChildren.knownEmpty) None
          else Some(store
            .readKeyedSnap(batchId, "st_child_affixes", childAffixSchema, "child_id", touchedChildren)
            .withColumn("stored", lit(true)))
        // pinned pre-merge snapshot ∪ batch-pure delta when available (the
        // hot path — no await); otherwise await the root merge and read
        // post-merge (batchId < 0, or placement-free batches where no
        // merge launched and the plain read is already safe)
        val rootMap = rootSnapOpt match {
          case Some(snap) =>
            // ADVICE r8: fold the union with max_by per root_segment_id
            // (batch rows — the freshest placement — winning over stored
            // ones) instead of distinct(), which relied on the event-model
            // assumption that stored and batch rows for a re-placed root
            // are byte-identical. A cross-batch re-owning of a root
            // segment now resolves to ONE row per root instead of fanning
            // batchAffixes out through the join. ADVICE r9: placedRootRows
            // folds per SPAN id, so a malformed log where two same-batch
            // placements share a root_segment_id yields two batch rows —
            // break the tie on (src, id) so the fold is deterministic
            // instead of picking an arbitrary parent (the readKeyed
            // fallback path would retain both rows; on well-formed logs,
            // where roots are span-unique, the paths stay identical).
            snap.withColumn("_src", lit(0))
              .unionByName(Derivations.placedRootRows(b).withColumn("_src", lit(1)))
              .groupBy(col("root_segment_id"))
              .agg(max_by(col("id"), struct(col("_src"), col("id"))).as("id"))
              .select(col("root_segment_id"), col("id"))
          case None =>
            fRootMerge.foreach(Await.result(_, Duration.Inf))
            store.readKeyed("st_root_segment", rootSchema, "root_segment_id", affixRootIds)
        }
        val batchAffixes = edges.join(rootMap, Seq("root_segment_id"))
          .select(col("child_id"), col("seq"), col("id").as("parent_id"),
            lit(false).as("stored"))
        // a placement-only batch (no hops, no detaches) has an empty affix
        // timeline: only the flag resets below remain
        val timelineOpt = storedAffixesOpt.map { storedAffixes =>
          // LAZY local checkpoint (r8, same pattern as hcFor): the window
          // materializes inside the hcK collect below — one chain job
          // instead of an eager checkpoint + collect pair. A limit-bounded
          // collect that stops early still finalizes the marked RDD
          // (Spark checkpoints missing partitions at job end).
          Derivations
            .affixNextDetach(storedAffixes.unionByName(batchAffixes), detaches)
            .localCheckpoint(false)
        }
        val affixRows = timelineOpt match {
          case None => Seq.empty[DataFrame]
          case Some(timeline) =>
            // flag timeline rows: batch affixes set, detaches clear every
            // affix they terminate (stored or batch)
            Seq(timeline.filter(!col("stored"))
                .select(col("parent_id"), col("seq"), lit(true).as("has_child")),
              timeline.filter(col("next_detach_seq").isNotNull)
                .select(col("parent_id"), col("next_detach_seq").as("seq"),
                  lit(false).as("has_child")))
        }
        val resetRows = b.filter(col("event_type") === "SpanEquipmentPlacedInRouteNetwork")
          .select(col("p.equipment.id").as("parent_id"), col("seq"), lit(false).as("has_child"))
        val batchHc = affixRows.foldLeft(resetRows)(_ unionByName _)
          .groupBy(col("parent_id"))
          .agg(max_by(col("has_child"), col("seq")).as("has_child"),
            max(col("seq")).as("hc_seq"))
        // the key collect runs over the pre-aggregate parent union (the
        // timeline + the cached batch), NOT batchHc — same distinct key
        // set, one shuffle stage less on the critical path. This is the
        // job that materializes the lazy timeline checkpoint.
        val hcK = KeySet.fromDf(affixRows.map(_.select(col("parent_id")))
          .foldLeft(resetRows.select(col("parent_id")))(_ unionByName _), cap)
        // sub-section AFTER the collect materialized the timeline: the
        // open-affix rewrite reads only cached blocks, and nothing later
        // in the step reads st_child_affixes (the chain consumed its
        // SNAPSHOT above) — the write overlaps everything downstream
        timelineOpt.foreach { timeline =>
          section { store.mergeReplace("st_child_affixes", "child_id", touchedChildren,
            timeline.filter(col("next_detach_seq").isNull)
              .select(col("child_id"), col("parent_id"), col("seq")).distinct()) }
        }
        // the st_has_child MERGE is no longer performed here (r8): the
        // caller computes the post-merge values in-plan from pre-merge
        // state + batchHc, checkpoints them, and only then launches the
        // merge as a section — taking its latency off the hcKeys →
        // eligible-recount critical path. batchHc is replay-stable (it
        // derives from the st_child_affixes SNAPSHOT), so the deferred
        // merge keeps the same fixpoint-replay property.
        (hcK, if (hcK.knownEmpty) None else Some(batchHc))
      } else scala.concurrent.Future.successful((KeySet.empty: KeySet, None: Option[DataFrame]))

      // pin the pre-merge span rows the interest section needs (driver-side
      // snapshot copy, milliseconds) and launch it BEFORE the st_span merge
      // — the section's longest chain (lastApply collect → interest
      // merge → walk resolves) then overlaps the merge instead of queueing
      // behind it. Only with a real batchId: batchId < 0 has no pinned
      // snapshot dir, so the pre-merge read would race the merge's bucket
      // swap — those callers keep the post-merge launch below.
      val spanPreForInterest: Option[DataFrame] =
        if (interestRelevant && hasAffixDetach && batchId >= 0)
          Some(store.readKeyedSnap(batchId, "st_span", bSpan.schema, "id",
            fusedOr("ad_children")))
        else None
      val interestLaunchedEarly = interestRelevant &&
        (spanPreForInterest.nonEmpty || !hasAffixDetach)
      if (interestLaunchedEarly) launchInterestSection(spanPreForInterest)
      // ASYNC st_span merge (r8, batch mode): mergeFamily materializes the
      // fold to a checkpoint and the staged write + swap runs on a section
      // thread — the biggest single job of the dense step comes off the
      // critical path. Every in-step consumer reads the checkpoint or a
      // snapshot; the ONE live post-merge read (spanElig below) awaits the
      // write first. batchId < 0 keeps the synchronous merge.
      var fSpanWrite: Option[Future[Any]] = None
      val (seKeys, seStored, seMerged) = mergeFamily(store, "st_span", "id",
        bSpan, Derivations.spanPartialPairs, Nil, batchId = batchId,
        batchKeys = fusedKeys.get("st_span"),
        asyncWrite = Some(body => fSpanWrite = Some(tracked(body()))))
      // late launch only when the early path was unavailable (batchId < 0
      // with affix/detach events): reads POST-merge st_span (synchronous
      // merge in that mode — nothing to await)
      if (interestRelevant && !interestLaunchedEarly) launchInterestSection(None)

      // ---------- span_equipment output (concurrent with affix chain) ----
      section {
        writeOutput(store, syncSink, sinkActive, "span_equipment", seKeys,
          Derivations.spanEquipmentFromState(
            Derivations.spanStateFromPartial(seMerged), eqSpecs, structSpecs))
      }

      // join the affix future here — the recount below is the first (and
      // only) consumer of hcKeys
      val (hcKeys, batchHcOpt) = Await.result(fHc, Duration.Inf)

      // ---------- eligible ends + conduit_slack recount ----------
      val eligKeys = ksUnion(seKeys, hcKeys)
      if (!eligKeys.knownEmpty) {
      // hcKeys ⊆ seKeys (driver-set check; ALWAYS true for affix-free
      // batches — the sparse steady state — where hcKeys is empty):
      // eligKeys ≡ seKeys and the post-merge keyed view of st_span IS
      // seMerged — no file read, and no await on the async write (it
      // only has to finish before the step's drain). Otherwise the one
      // live post-merge read awaits the write having promoted its
      // buckets; in dense steady state the affix chain outlives the
      // write, so that await is free too.
      val hcSubset = hcKeys.knownEmpty || ((hcKeys, seKeys) match {
        case (LocalKeys(hv, _), LocalKeys(sv, _)) =>
          val ss = sv.toSet; hv.forall(ss.contains)
        case _ => false
      })
      val spanElig =
        if (hcSubset) seMerged
        else {
          fSpanWrite.foreach(Await.result(_, Duration.Inf))
          store.readKeyed("st_span", bSpan.schema, "id", eligKeys)
        }
      // post-merge has_child values for every eligible parent, computed
      // IN-PLAN from the pre-merge store + the batch fold and materialized
      // to memory BEFORE the st_has_child merge is launched (r8): the
      // eligible chain then has no file dependency on the merge, so the
      // merge write runs as a concurrent section instead of sitting on the
      // hcKeys → recount critical path. The checkpoint is delta-bounded
      // (one tiny row per touched span/parent). The merge's replacement is
      // the SAME checkpointed frame restricted to the touched parents —
      // for those keys mergePartials over (stored ∪ batchHc) IS the
      // post-merge value, and the restriction keeps the replacement inside
      // the touched-key bucket span the swap contract requires. Replay
      // safety is unchanged: batchHc derives from the st_child_affixes
      // snapshot and the merge stays a max-seq fixpoint.
      val hcStoredAll = store.readKeyed("st_has_child", hcSchema, "parent_id", eligKeys)
      // LAZY local checkpoint (r8): the frame is marked for checkpointing
      // but materializes inside the mergedEnds checkpoint job below (its
      // plan joins hcFor, and Spark checkpoints marked ancestor RDDs when
      // the job completes) — ONE tail-state materialization job instead
      // of two. The st_has_child merge section launches only after that
      // job returns, so its bucket swap still cannot race the pre-merge
      // read inside this plan.
      val (hcFor, fHcForMat): (DataFrame, Option[Future[Any]]) = batchHcOpt match {
        case None => (hcStoredAll, None)
        case Some(batchHc) =>
          val f = Folds
            .mergePartials(Seq(hcStoredAll, batchHc), "parent_id", Seq("has_child" -> "hc_seq"))
            .localCheckpoint(false)
          // materialize the marked frame NOW on a tracked future (r10):
          // the probe showed the lazy mark did NOT ride inside the
          // mergedEnds job as the r8 comment assumed — it materialized
          // inside the enrichedElig JOIN's broadcast-exchange job, which
          // only launches after the touchedNodes await, serializing ~0.2 s
          // onto the dense tail. Computing it here overlaps the
          // touchedNodes collect instead; concurrent first-compute of a
          // locally-checkpointed RDD is safe (block-store caching races
          // resolve to one winner). InternalRow-level drain — a Dataset
          // foreach would pay per-row deserialization for rows nobody
          // reads. The st_has_child merge section AWAITS this future
          // before its bucket swap (self-review r10): this plan reads
          // st_has_child LIVE, and a straggling drain task scanning a
          // bucket file during the swap's move-aside would crash the step.
          val fMat = tracked {
            spark.sparkContext.runJob(f.queryExecution.toRdd,
              (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
                while (it.hasNext) { it.next(); () }
              })
          }
          (f, Some(fMat))
      }
      def nodesOf(df: DataFrame): DataFrame = df.select(explode(array(
          element_at(col("nodes"), 1), element_at(col("nodes"), -1))).as("b"))
        .filter(col("b").isNotNull)
      // old ∪ new positions of every touched equipment: the buckets whose
      // eligible-end rows may change, and the nodes whose count may change.
      // endRows' route nodes ⊆ spanElig's nodes ⊆ this set — the coverage
      // the split-layout mergeReplace contract requires. Collected on a
      // section thread: it depends only on eligKeys + the span snapshot,
      // so it overlaps the hcFor checkpoint above (r8).
      val fTouchedNodes = tracked(KeySet.fromDf(
        nodesOf(seStored).unionByName(nodesOf(spanElig)).distinct(), cap))
      val enrichedElig = Derivations
        .withSpecDims(Derivations.spanStateFromPartial(spanElig), eqSpecs, structSpecs)
        .join(hcFor.select(col("parent_id").as("id"), col("has_child")), Seq("id"), "left")
        .na.fill(false, Seq("has_child"))
      val endRows = Derivations.eligibleEnds(enrichedElig)
      val touchedNodes = Await.result(fTouchedNodes, Duration.Inf)
      // POST-merge eligible-end rows at the touched nodes, computed
      // IN-PLAN from pre-merge state ∪ endRows and checkpointed BEFORE the
      // st_eligible_ends merge launches (r8, same pattern as hcFor above):
      // `kept` mirrors the merge's anti-filter (every endRows id is in
      // eligKeys, so stored-minus-eligKeys at the touched nodes is exactly
      // the merge's kept side there — a replay after the merge re-derives
      // the same frame, fixpoint). The slack recount then has no file
      // dependency on the merge, so the two merges run concurrently
      // instead of back-to-back on the 2-second path.
      val storedEnds = store.readKeyed("st_eligible_ends", eligSchema, "route_node_id", touchedNodes)
      val keptEnds = eligKeys match {
        case LocalKeys(vals, _) if vals.length <= cap =>
          if (vals.isEmpty) storedEnds
          else storedEnds.filter(col("id").isNull || !col("id").isin(vals.toSeq: _*))
        case ks => storedEnds.join(broadcast(ks.toDf(spark, "id")), Seq("id"), "left_anti")
      }
      // ONE tail materialization (r9; fused from r8's two): the endRows
      // subtree — including the lazy hcFor checkpoint riding inside it —
      // and the kept stored ends materialize in the SAME job. The r8 shape
      // checkpointed endRows separately on a section thread to overlap the
      // touchedNodes collect, but the collect is ~80 ms while the extra
      // job + its planning gap cost more on the dense tail; the fused job
      // both consumers (st_eligible_ends merge, slack recount) read.
      val mergedEnds = keptEnds.unionByName(endRows.select(keptEnds.columns.map(col).toSeq: _*))
        .localCheckpoint(true)
      // the st_has_child merge launches only now, and its section awaits
      // the hcFor materialization future first — by this point the drain
      // has long finished in the common case (it overlapped the
      // touchedNodes collect), but a straggler must not still be reading
      // live st_has_child buckets when the swap moves them aside.
      // Await-inside-a-pool-task is safe by submission order (stepEc is
      // FIFO; fHcForMat was submitted before this section).
      batchHcOpt.foreach { _ =>
        section {
          fHcForMat.foreach(Await.result(_, Duration.Inf))
          store.mergeReplace("st_has_child", "parent_id", hcKeys,
            restrictToKeys(hcFor, hcKeys, "parent_id", hcFor.columns.toSeq),
            coversKeys = true) }
      }
      // the merge's replacement is the checkpointed frame restricted to
      // the touched ids (= endRows exactly: kept excludes every eligKeys
      // id and all endRows ids are eligKeys ids) — endRows materializes
      // once, not once per consumer
      section { store.mergeReplace("st_eligible_ends", "id", eligKeys,
        restrictToKeys(mergedEnds, eligKeys, "id", mergedEnds.columns.toSeq),
        bucketSrcCol = Some("route_node_id"), extraBucketVals = Some(touchedNodes)) }
      val slackRows0 = Derivations.slackFromEnds(mergedEnds)
      val slackRows = if (sinkActive) slackRows0.localCheckpoint(true) else slackRows0
      store.mergeReplace("conduit_slack", "route_node_id", touchedNodes, slackRows)
      if (sinkActive) syncSink("conduit_slack",
        touchedNodes.toDf(spark, "k")
          .select(Derivations.deterministicUuid(col("k")).as("id")), slackRows)
      } else if (sinkActive) {
        // delivery contract (see writeOutput): an active sink observes ONE
        // callback per output table whose section ran, even with nothing to
        // deliver — crash-point tests count callbacks, and a sink that
        // batches per-table acks would otherwise see a hole. Zero jobs:
        // both frames are empty local relations (ADVICE r6).
        syncSink("conduit_slack",
          KeySet.empty.toDf(spark, "k")
            .select(Derivations.deterministicUuid(col("k")).as("id")),
          Derivations.slackFromEnds(
            store.readKeyed("st_eligible_ends", eligSchema, "route_node_id", KeySet.empty)))
      }
      // no span events at all ⇒ hasAffixDetach is false (affix/detach ARE
      // span types) ⇒ the section never touches st_span
      } else if (interestRelevant) launchInterestSection(None)
      // join the concurrent sections (first failure propagates; drain
      // until empty — sections can spawn sub-sections) ...
      var nf = pending.poll()
      while (nf != null) { Await.result(nf, Duration.Inf); nf = pending.poll() }
      // ... then the commit point: record completion FIRST (a crash between
      // the two leaves a skippable batch with a stale snapshot dir, cleaned
      // by the next step), then drop this batch's snapshots
      if (batchId >= 0) {
        store.setLastAppliedBatch(batchId)
        store.clearSnapshots(batchId, including = true)
      }
      // always true here: the events-free case returned false at the
      // fused-collect guard above — this literal states that invariant
      true
    } finally {
      // a section that crashed must not leave siblings racing the caller's
      // redelivery: quiesce every section (and spawned sub-section) before
      // releasing the batch cache
      var qf = pending.poll()
      while (qf != null) {
        scala.util.Try(Await.ready(qf, Duration.Inf)); qf = pending.poll()
      }
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

  private def emptyFrame(spark: org.apache.spark.sql.SparkSession,
      schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Replacement rows recovered from a merge's returned frame
    * ([[StateStore.mergeReplaceReturning]]): the post-merge bucket content
    * restricted to the touched keys IS the replacement (the kept side
    * excludes every touched key), so finalizers read the merge's own
    * written files instead of materializing the replacement a second time. */
  private def restrictToKeys(written: DataFrame, keys: KeySet, keyCol: String,
      cols: Seq[String]): DataFrame = {
    val filtered = keys match {
      case LocalKeys(vals, _) => written.filter(col(keyCol).isin(vals.toSeq: _*))
      case dk: DistKeys => written.join(
        broadcast(dk.toDf(written.sparkSession, keyCol)), Seq(keyCol), "left_semi")
    }
    filtered.select(cols.map(col).toSeq: _*)
  }

  /** Merge a batch partial onto stored state for its touched keys (plus
    * `extraReadKeys`, which are read+rewritten unchanged — used when a
    * downstream as-of resolve needs the pre-batch snapshot of keys the
    * batch itself does not touch). Returns (touchedKeys, storedSnapshot,
    * merged).
    *
    * Job shape (r6): the touched keys are ONE bounded collect
    * ([[KeySet.fromDf]]); a known-empty set short-circuits the whole merge.
    * `merged` is a lazy read of the merge's written files (callers
    * finalize output rows from it AFTER
    * the table overwrite). `stored` is materialized only on the snapshot
    * path — `snapshot = false` callers must not consume it after the merge
    * (its lazy lineage reads the overwritten table; they all discard it).
    *
    * `snapshot = false` is for families whose stored state feeds ONLY the
    * field-wise max-seq merge: merging a batch's markers onto state that
    * already absorbed them is a fixpoint, so a mid-crash replay converges
    * without the pre-merge snapshot round-trip. Families whose PRE-batch
    * state feeds other computations (vacated span positions,
    * container/interest as-of pseudo-events, open affixes) keep their
    * snapshots. */
  private def mergeFamily(store: StateStore, table: String, idCol: String,
      batchPartial: DataFrame, pairs: Seq[(String, String)], seqs: Seq[String],
      extraReadKeys: Option[KeySet] = None,
      batchId: Long = -1L, snapshot: Boolean = true,
      batchKeys: Option[KeySet] = None,
      asyncWrite: Option[(() => Unit) => Unit] = None): (KeySet, DataFrame, DataFrame) = {
    val spark = batchPartial.sparkSession
    // batchKeys: the step's fused one-job collect already knows this
    // family's touched ids (identical set — the partial groups by exactly
    // the projected id expression); absent on the overflow fallback
    val keys0 = batchKeys.getOrElse(
      KeySet.fromDf(batchPartial.select(col(idCol)), store.maxInsetKeys))
    val keys = extraReadKeys
      .map(KeySet.union(keys0, _, store.maxInsetKeys, spark)).getOrElse(keys0)
    if (keys.knownEmpty) {
      val empty = emptyFrame(spark, batchPartial.schema)
      return (keys, empty, empty)
    }
    // snapshot callers CONSUME stored after the merge (pseudo-events,
    // vacated positions) — it must be materialized before the overwrite:
    // parquet-backed in batch mode, checkpointed in ad-hoc (-1) mode.
    // snapshot=false callers discard it, so it stays a lazy plan folded
    // into the merge's staged write.
    val stored =
      if (batchId >= 0 && snapshot)
        store.readKeyedSnap(batchId, table, batchPartial.schema, idCol, keys)
      else if (snapshot)
        store.readKeyed(table, batchPartial.schema, idCol, keys).localCheckpoint(true)
      else store.readKeyed(table, batchPartial.schema, idCol, keys)
    val mergedPlan = Folds.mergePartials(Seq(stored, batchPartial), idCol, pairs, seqs)
    // ASYNC-WRITE mode (r8, batch mode only): materialize the fold to a
    // local checkpoint (fold cost only — no parquet encode) and hand the
    // staged write + bucket swap to the caller's submit function, which
    // runs it on a section thread. The returned merged frame is the
    // checkpoint, so every downstream consumer proceeds without the write
    // on its critical path. Sound because the fold's inputs are pinned
    // (SNAPSHOT dirs + the cached batch — nothing reads live files), and
    // the caller guarantees no live read of `table` happens before it
    // awaits the submitted write (the step's table-disjointness contract).
    // The write reads the checkpointed blocks, not live state, so it
    // cannot race its own swap. r9 note: tried for st_interest/st_terminal
    // too — the extra fold-checkpoint job per family cost MORE than the
    // write overlap saved at micro-batch sizes (sentinel-normalized dense
    // min regressed ~10%); st_span stays the only asyncWrite family.
    asyncWrite match {
      case Some(submit) if batchId >= 0 && snapshot =>
        val merged = mergedPlan.localCheckpoint(true)
        submit(() => store.mergeReplace(table, idCol, keys, merged, coversKeys = true))
        (keys, stored, merged)
      case _ =>
        // coversKeys: merged is a groupBy over stored ∪ batch, so every
        // touched key with any row appears — the merge skips the
        // emptied-bucket sweep. The merge's returned file-backed frame
        // doubles as the merged frame (ONE materialization job per family
        // instead of two).
        val merged = store
          .mergeReplaceReturning(table, idCol, keys, mergedPlan, coversKeys = true) match {
            case Some(written) => restrictToKeys(written, keys, idCol, mergedPlan.columns.toSeq)
            // wholesale-create path: the written table IS the merged state —
            // read it back (lazy parquet, no extra job)
            case None => store.readKeyed(table, batchPartial.schema, idCol, keys)
          }
        (keys, stored, merged)
    }
  }

  /** Delete+reinsert the touched keys' output rows, then notify the sink.
    * With the no-op sink the rows materialize exactly once, inside the
    * merge's staged write; an active sink reads the merge's written files so
    * the post-overwrite sink call cannot recompute against rewritten
    * files. A known-empty key set skips the merge and the rows evaluation
    * entirely — an ACTIVE sink still observes its per-table callback with
    * empty delete/upsert frames (zero jobs): the delivery and crash-point
    * contract is one call per output table whose section ran
    * (AtomicReplaySpec crashes on each in turn). */
  private def writeOutput(store: StateStore, sink: Sink, sinkActive: Boolean,
      table: String, keys: KeySet, rows: DataFrame): Unit = {
    val keyCol = outputKey(table)
    if (keys.knownEmpty) {
      if (sinkActive) sink(table, keys.toDf(rows.sparkSession, keyCol),
        emptyFrame(rows.sparkSession, rows.schema))
      return
    }
    if (!sinkActive) { store.mergeReplace(table, keyCol, keys, rows); return }
    // active sink: the merge's written files double as the sink's upsert
    // frame (restricted to the touched keys) — one materialization, and
    // the post-overwrite sink call cannot recompute against rewritten files
    val out = store.mergeReplaceReturning(table, keyCol, keys, rows) match {
      case Some(written) => restrictToKeys(written, keys, keyCol, rows.columns.toSeq)
      case None => store.readKeyed(table, rows.schema, keyCol, keys)
    }
    sink(table, keys.toDf(rows.sparkSession, keyCol), out)
  }

  /** Merge a tiny dimension partial (union + refold + full overwrite);
    * returns the merged frame. `hasEvents` (computed once per step for all
    * four dims) skips the merge when the batch carries no events of this
    * dim's type — the skip path returns the stored table as a LAZY read
    * (no job at all: the table cannot change this step, so downstream
    * consumers re-reading the tiny parquet per action is cheaper than an
    * eager checkpoint on the 2-second path). */
  private def mergeDim(store: StateStore, table: String, batchPartial: DataFrame,
      idCol: String, pairs: Seq[(String, String)], hasEvents: Boolean,
      batchId: Long): DataFrame = {
    if (!hasEvents) store.readSmall(table, batchPartial.schema)
    else {
      val stored = store.readSmallSnap(batchId, table, batchPartial.schema)
      val merged = Folds.mergePartials(Seq(stored, batchPartial), idCol, pairs)
        .localCheckpoint(true)
      store.writeSmall(table, merged)
      merged
    }
  }
}
