package graft.projector

import scala.collection.mutable
import scala.util.Random

import Sim._

/** Seeded scenario generator producing well-formed event logs per
  * FIXTURES.md §3: referential order honored, plus deliberately-skipped
  * variants (missing specs/containers, empty statuses, updates on absent
  * ids) and the hop-subtraction edge cases.
  *
  * Avoided (divergent-by-design reference behaviors, see Derivations
  * scaladoc): re-placement of an existing span equipment id; affixing the
  * same child to the same parent twice without an intervening detach.
  */
object LogGen {

  /** @param pfx id-namespace prefix: scenarios with distinct prefixes use
    *  disjoint entity/node ids and can be concatenated into one log.
    * @param slackPathologies when true, generates the sequences the
    *  reference double-counts (duplicate affixes without an intervening
    *  detach; children sharing a parent) — used by the compat-mode spec
    *  (Derivations.conduitSlackCompat); the default keeps the carve-outs
    *  so the invariant-mode recount matches the simulator. */
  def scenario(rnd: Random, pfx: String = "", slackPathologies: Boolean = false): Vector[Evt] = {
    val out = Vector.newBuilder[Evt]
    def emit(e: Evt): Unit = out += e

    val routeNodes = (0 until 24).map(i => s"${pfx}rn-$i")
    def pickNode(): String = routeNodes(rnd.nextInt(routeNodes.length))

    // --- specification dimensions ---
    val ncSpecs = Seq(s"${pfx}ncs-well" -> ("Well 1000", "WELL"), s"${pfx}ncs-cab" -> ("Cabinet X", "CABINET"),
      s"${pfx}ncs-man" -> ("Manhole", "WELL"))
    ncSpecs.foreach { case (id, (n, c)) => emit(NcSpecAdded(id, n, c)) }

    emit(SsSpecAdded(s"${pfx}sss-12", 12))
    emit(SsSpecAdded(s"${pfx}sss-40", 40))
    emit(SsSpecAdded(s"${pfx}sss-50", 50))
    val seSpecs = Seq(
      (s"${pfx}ses-cust", "Ø12 customer conduit", false, s"${pfx}sss-12"),
      (s"${pfx}ses-cust2", "flexrør ø12 orange", false, s"${pfx}sss-12"),
      (s"${pfx}ses-40", "Ø40 distribution conduit", false, s"${pfx}sss-40"),
      (s"${pfx}ses-cable", "Fiber cable 48", true, s"${pfx}sss-50"))
    seSpecs.foreach { case (id, n, c, s) => emit(SeSpecAdded(id, n, c, s)) }
    emit(TeSpecAdded(s"${pfx}tes-cust", isCustomerTermination = true))
    emit(TeSpecAdded(s"${pfx}tes-rack", isCustomerTermination = false))

    // --- node containers ---
    val containers = (0 until 12).map(i => s"${pfx}nc-$i")
    val containerNode = mutable.Map[String, String]()
    containers.foreach { id =>
      val node = pickNode()
      containerNode(id) = node
      emit(NcPlaced(id, node, ncSpecs(rnd.nextInt(ncSpecs.length))._1))
    }
    // remove a few, spec-change a couple of the surviving
    val removedNc = rnd.shuffle(containers.toList).take(3)
    removedNc.foreach(id => emit(NcRemoved(id)))
    rnd.shuffle(containers.filterNot(removedNc.contains).toList).take(2)
      .foreach(id => emit(NcSpecChanged(id, s"${pfx}ncs-man")))

    // --- walks of interest ---
    val interests = (0 until 15).map(i => s"${pfx}woi-$i")
    val walkOf = mutable.Map[String, Seq[String]]()
    interests.foreach { id =>
      val len = 3 + rnd.nextInt(6)
      val base = Vector.fill(len)(pickNode())
      // occasionally inject duplicates to exercise order-preserving dedup
      val walk = if (rnd.nextBoolean()) base ++ base.take(1 + rnd.nextInt(2)) else base
      walkOf(id) = walk
      emit(WalkRegistered(id, walk))
    }
    rnd.shuffle(interests.toList).take(4).foreach { id =>
      val walk = Vector.fill(3 + rnd.nextInt(5))(pickNode())
      walkOf(id) = walk
      emit(WalkModified(id, walk))
    }
    val unregistered = rnd.shuffle(interests.toList).take(2)
    unregistered.foreach(id => emit(InterestUnregistered(id)))
    // one re-created via Modified after Unregistered (dictionary indexer)
    emit(WalkModified(unregistered.head, Vector.fill(4)(pickNode())))

    val liveInterests = interests.filterNot(i => i == unregistered(1))

    // --- span equipments: conduits first (potential parents) ---
    var segCounter = 0
    def freshSeg(): String = { segCounter += 1; s"${pfx}seg-$segCounter" }

    def mkStructures(nNodes: Int, hasFrom: Boolean, hasTo: Boolean): Seq[Seq[Seg]] = {
      val root = Seg(freshSeg(), 0, nNodes - 1,
        if (hasFrom) s"term-${rnd.nextInt(1000)}" else EmptyUuid,
        if (hasTo) s"term-${rnd.nextInt(1000)}" else EmptyUuid)
      // a second structure with inner segments that must NOT count
      val inner = Seg(freshSeg(), 1, math.max(1, nNodes - 2), EmptyUuid, EmptyUuid)
      Seq(Seq(root), Seq(inner))
    }

    val conduits = (0 until 10).map(i => s"${pfx}cond-$i")
    val rootSegOf = mutable.Map[String, String]()
    conduits.foreach { id =>
      val interest = liveInterests(rnd.nextInt(liveInterests.length))
      val walk = walkOf(interest)
      val nNodes = 2 + rnd.nextInt(3)
      val nodes = Vector.fill(nNodes)(pickNode())
      val spec = Seq(s"${pfx}ses-cust", s"${pfx}ses-cust2", s"${pfx}ses-40")(rnd.nextInt(3))
      val structures = mkStructures(nNodes, rnd.nextBoolean(), rnd.nextBoolean())
      rootSegOf(id) = structures.head.head.id
      val addr = if (rnd.nextBoolean()) Some(Addr(Some(s"aa-${rnd.nextInt(50)}"), None)) else None
      emit(SePlaced(id, s"Conduit $id", spec, interest, isCable = false, nodes, structures, None, addr))
      val _ = walk
    }

    // --- cables with utility hops (incl. edge cases) ---
    def mkHops(walk: Seq[String], parents: Seq[String]): Seq[Hop] = {
      val n = walk.length
      val variants = rnd.nextInt(5) match {
        case 0 => Seq(Hop(walk.head, walk(n / 2), parents.take(1)))               // hop at start
        case 1 => Seq(Hop(walk(n / 2), walk.last, parents.take(1)))               // hop to end
        case 2 => Seq(Hop(walk(rnd.nextInt(n)), s"${pfx}zz-missing", parents.take(1)))   // toNode absent → skip to end
        case 3 => Seq(Hop(s"${pfx}zz-never", walk.last, parents.take(1)))                // fromNode never matches
        case _ =>
          val a = rnd.nextInt(math.max(1, n - 1))
          Seq(Hop(walk(a), walk(math.min(n - 1, a + 1 + rnd.nextInt(2))), parents.take(1)))
      }
      variants
    }

    val cables = (0 until 8).map(i => s"${pfx}cab-$i")
    val cableInterest = mutable.Map[String, String]()
    val cablePlacementParents = mutable.Map[String, Set[String]]()
    cables.foreach { id =>
      val interest = liveInterests(rnd.nextInt(liveInterests.length))
      cableInterest(id) = interest
      val walk = walkOf(interest)
      val nodes = Vector(walk.head, walk.last)
      val withHops = rnd.nextInt(3) > 0
      val parents = rnd.shuffle(conduits.toList).take(2).map(rootSegOf)
      val hops = if (withHops) Some(mkHops(walk, parents)) else None
      cablePlacementParents(id) = hops.map(_.flatMap(_.parentAffixes).toSet).getOrElse(Set.empty)
      emit(SePlaced(id, s"Cable $id", s"${pfx}ses-cable", interest, isCable = true,
        nodes, mkStructures(2, rnd.nextBoolean(), rnd.nextBoolean()), hops, None))
    }

    // --- lifecycle churn on span equipment ---
    rnd.shuffle(conduits.toList).take(3).foreach { id =>
      emit(SeMoved(id, Vector.fill(2 + rnd.nextInt(2))(pickNode())))
    }
    rnd.shuffle(conduits.toList).take(2).foreach { id =>
      emit(SeMerged(id, Vector.fill(2)(pickNode())))
    }
    // spec change incl. ø12 → non-ø12 (is_customer_conduit stays frozen)
    emit(SeSpecChanged(conduits(0), s"${pfx}ses-40"))
    emit(SeSpecChanged(conduits(1), s"${pfx}ses-cust"))
    rnd.shuffle(conduits.toList).take(2).foreach { id =>
      emit(SeAddrChanged(id, Addr(Some(s"aa-${rnd.nextInt(50)}"),
        if (rnd.nextBoolean()) Some(s"ua-${rnd.nextInt(50)}") else None)))
    }

    // --- affix / detach (cable into conduit parents) ---
    val affixed = rnd.shuffle(cables.toList).take(4)
    // slack double-count cases the reference exhibits and we deliberately
    // do NOT generate (Derivations scaladoc: divergent-by-design): the same
    // child affixed twice to one parent without a detach, and two children
    // sharing a parent where both later detach — keep every explicit-affix
    // parent disjoint from placement-hop parents and from other affixes
    val usedAffixParents = mutable.Set[String]()
    cables.foreach(id => usedAffixParents ++= cablePlacementParents(id))
    affixed.zipWithIndex.foreach { case (id, i) =>
      val pool = rnd.shuffle(conduits.toList).map(rootSegOf)
      val parentPool =
        (if (slackPathologies) pool // shared parents allowed → double-counts
         else pool.filterNot(usedAffixParents.contains))
          .take(1 + rnd.nextInt(2))
      usedAffixParents ++= parentPool
      val walk = walkOf(cableInterest(id))
      val hops = parentPool.map(p => Hop(walk(rnd.nextInt(walk.length)),
        walk(rnd.nextInt(walk.length)), Seq(p)))
      emit(SeAffixed(id, hops))
      // duplicate affix without an intervening detach (reference
      // re-appends the parent → double increment at the next detach)
      if (slackPathologies && rnd.nextBoolean()) emit(SeAffixed(id, hops))
      if (i % 2 == 0) emit(SeDetached(id, mkHops(walk, parentPool)))
    }
    // walk modified AFTER a cable applied it (as-of snapshot must hold)
    emit(WalkModified(cableInterest(cables(0)), Vector.fill(5)(pickNode())))

    // remove some span equipment (conduit + cable)
    emit(SeRemoved(conduits(5)))
    emit(SeRemoved(cables(5)))

    // --- terminal equipment ---
    val liveNc = containers.filterNot(removedNc.contains)
    val terms = (0 until 10).map(i => s"${pfx}te-$i")
    terms.foreach { id =>
      val variant = rnd.nextInt(5)
      val (spec, container) = variant match {
        case 0 => (s"${pfx}tes-missing", liveNc(rnd.nextInt(liveNc.length)))   // unknown spec → skip
        case 1 => (s"${pfx}tes-rack", liveNc(rnd.nextInt(liveNc.length)))      // not customer → skip
        case 2 => (s"${pfx}tes-cust", removedNc(rnd.nextInt(removedNc.length))) // removed container → skip
        case _ => (s"${pfx}tes-cust", liveNc(rnd.nextInt(liveNc.length)))
      }
      val addr = if (rnd.nextBoolean()) Some(Addr(None, Some(s"ua-${rnd.nextInt(99)}"))) else None
      emit(TePlaced(id, s"Term $id", spec, container, addr))
    }
    terms.take(6).foreach { id =>
      rnd.nextInt(4) match {
        case 0 => emit(TeNamed(id, Some(s"renamed-$id")))
        case 1 => emit(TeNamed(id, None))
        case 2 => emit(TeAddrChanged(id, Addr(Some(s"aa-${rnd.nextInt(99)}"), None)))
        case _ => emit(TeRemoved(id))
      }
    }

    // --- work tasks ---
    (0 until 8).foreach { i =>
      val id = s"${pfx}wt-$i"
      rnd.nextInt(4) match {
        case 0 => emit(WtCreated(id, s"N-$i", ""))          // empty status → full no-op
        case 1 =>
          emit(WtCreated(id, s"N-$i", "created"))
          emit(WtStatusChanged(id, "in_progres"))
        case 2 =>
          emit(WtStatusChanged(id, "ghost"))                // on absent id → no-op
          emit(WtCreated(id, s"N-$i", "created"))
        case _ =>
          emit(WtCreated(id, s"N-$i", "created"))
          emit(WtCreated(id, s"N-$i-re", ""))               // invalid re-create → no-op
      }
    }

    // --- installations ---
    (0 until 8).foreach { i =>
      val id = s"${pfx}inst-$i"
      rnd.nextInt(4) match {
        case 0 =>
          emit(InstCreated(id, s"I-$i", Some(s"ua-$i"), "planned", Some("cellar")))
          emit(InstUnitChanged(id, None))                   // wholesale null overwrite
        case 1 =>
          emit(InstStatusChanged(id, "ghost"))              // on absent id → no-op
          emit(InstCreated(id, s"I-$i", None, "planned", None))
        case 2 =>
          emit(InstCreated(id, s"I-$i", None, "planned", None))
          emit(InstStatusChanged(id, "active"))
          emit(InstRemarkChanged(id, Some("note")))
          emit(InstCreated(id, s"I-$i-re", Some(s"ua-$i"), "replanned", None)) // re-create resets
        case _ =>
          emit(InstCreated(id, s"I-$i", Some(s"ua-$i"), "planned", None))
          emit(InstRemarkChanged(id, None))
      }
    }

    out.result()
  }
}
