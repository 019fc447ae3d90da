package graft.projector

import scala.collection.mutable

/** Test-scope oracle: a faithful single-threaded re-implementation of the
  * reference's dictionary fold (`ProjektorState.cs` semantics studied at
  * `/root/reference/`), used to validate the Spark derivations against
  * arbitrary seeded event logs. This is deliberately the *reference's*
  * architecture (mutable maps, event-at-a-time) so that it constitutes an
  * independent oracle for the set-oriented Spark formulation.
  */
object Sim {

  val EmptyUuid = "00000000-0000-0000-0000-000000000000"

  // ---- typed events (shapes per FIXTURES.md §2) ----
  sealed trait Evt { def typ: String; def payload: String }

  case class Hop(fromNodeId: String, toNodeId: String, parentAffixes: Seq[String]) {
    def json: String = Js.obj(
      "fromNodeId" -> Js.s(fromNodeId), "toNodeId" -> Js.s(toNodeId),
      "parentAffixes" -> Js.arr(parentAffixes.map(a => Js.obj("spanSegmentId" -> Js.s(a)))))
  }
  case class Seg(id: String, fromIdx: Int, toIdx: Int, fromTerm: String, toTerm: String) {
    def json: String = Js.obj("id" -> Js.s(id),
      "fromNodeOfInterestIndex" -> fromIdx.toString, "toNodeOfInterestIndex" -> toIdx.toString,
      "fromTerminalId" -> Js.s(fromTerm), "toTerminalId" -> Js.s(toTerm))
  }
  case class Addr(access: Option[String], unit: Option[String]) {
    def json: String = Js.obj("accessAddressId" -> access.map(Js.s).orNull,
      "unitAddressId" -> unit.map(Js.s).orNull)
  }

  case class NcSpecAdded(id: String, name: String, category: String) extends Evt {
    val typ = "NodeContainerSpecificationAdded"
    def payload = Js.obj("specification" -> Js.obj("id" -> Js.s(id), "name" -> Js.s(name), "category" -> Js.s(category)))
  }
  case class NcPlaced(id: String, routeNodeId: String, specId: String) extends Evt {
    val typ = "NodeContainerPlacedInRouteNetwork"
    def payload = Js.obj("container" -> Js.obj("id" -> Js.s(id), "routeNodeId" -> Js.s(routeNodeId), "specificationId" -> Js.s(specId)))
  }
  case class NcRemoved(id: String) extends Evt {
    val typ = "NodeContainerRemovedFromRouteNetwork"
    def payload = Js.obj("nodeContainerId" -> Js.s(id))
  }
  case class NcSpecChanged(id: String, newSpecId: String) extends Evt {
    val typ = "NodeContainerSpecificationChanged"
    def payload = Js.obj("nodeContainerId" -> Js.s(id), "newSpecificationId" -> Js.s(newSpecId))
  }

  case class WalkRegistered(id: String, refs: Seq[String]) extends Evt {
    val typ = "WalkOfInterestRegistered"
    def payload = Js.obj("interest" -> Js.obj("id" -> Js.s(id), "routeNetworkElementRefs" -> Js.arr(refs.map(Js.s))))
  }
  case class WalkModified(id: String, ids: Seq[String]) extends Evt {
    val typ = "WalkOfInterestRouteNetworkElementsModified"
    def payload = Js.obj("interestId" -> Js.s(id), "routeNetworkElementIds" -> Js.arr(ids.map(Js.s)))
  }
  case class InterestUnregistered(id: String) extends Evt {
    val typ = "InterestUnregistered"
    def payload = Js.obj("interestId" -> Js.s(id))
  }

  case class SeSpecAdded(id: String, name: String, isCable: Boolean, structSpecId: String) extends Evt {
    val typ = "SpanEquipmentSpecificationAdded"
    def payload = Js.obj("specification" -> Js.obj("id" -> Js.s(id), "name" -> Js.s(name),
      "isCable" -> isCable.toString, "rootTemplate" -> Js.obj("spanStructureSpecificationId" -> Js.s(structSpecId))))
  }
  case class SsSpecAdded(id: String, outerDiameter: Int) extends Evt {
    val typ = "SpanStructureSpecificationAdded"
    def payload = Js.obj("specification" -> Js.obj("id" -> Js.s(id), "outerDiameter" -> outerDiameter.toString))
  }
  case class SePlaced(id: String, name: String, specId: String, walkId: String, isCable: Boolean,
      nodes: Seq[String], structures: Seq[Seq[Seg]], hops: Option[Seq[Hop]], addr: Option[Addr]) extends Evt {
    val typ = "SpanEquipmentPlacedInRouteNetwork"
    def payload = Js.obj("equipment" -> Js.obj(
      "id" -> Js.s(id), "name" -> Js.s(name), "specificationId" -> Js.s(specId),
      "walkOfInterestId" -> Js.s(walkId), "isCable" -> isCable.toString,
      "nodesOfInterestIds" -> Js.arr(nodes.map(Js.s)),
      "spanStructures" -> Js.arr(structures.map(st => Js.obj("spanSegments" -> Js.arr(st.map(_.json))))),
      "utilityNetworkHops" -> hops.map(hs => Js.arr(hs.map(_.json))).orNull,
      "addressInfo" -> addr.map(_.json).orNull))
  }
  case class SeMoved(id: String, nodes: Seq[String]) extends Evt {
    val typ = "SpanEquipmentMoved"
    def payload = Js.obj("spanEquipmentId" -> Js.s(id), "nodesOfInterestIds" -> Js.arr(nodes.map(Js.s)))
  }
  case class SeMerged(id: String, nodes: Seq[String]) extends Evt {
    val typ = "SpanEquipmentMerged"
    def payload = Js.obj("spanEquipmentId" -> Js.s(id), "nodesOfInterestIds" -> Js.arr(nodes.map(Js.s)))
  }
  case class SeRemoved(id: String) extends Evt {
    val typ = "SpanEquipmentRemoved"
    def payload = Js.obj("spanEquipmentId" -> Js.s(id))
  }
  case class SeAffixed(id: String, hops: Seq[Hop]) extends Evt {
    val typ = "SpanEquipmentAffixedToParent"
    def payload = Js.obj("spanEquipmentId" -> Js.s(id), "newUtilityHopList" -> Js.arr(hops.map(_.json)))
  }
  case class SeDetached(id: String, hops: Seq[Hop]) extends Evt {
    val typ = "SpanEquipmentDetachedFromParent"
    def payload = Js.obj("spanEquipmentId" -> Js.s(id), "newUtilityHopList" -> Js.arr(hops.map(_.json)))
  }
  case class SeSpecChanged(id: String, newSpecId: String) extends Evt {
    val typ = "SpanEquipmentSpecificationChanged"
    def payload = Js.obj("spanEquipmentId" -> Js.s(id), "newSpecificationId" -> Js.s(newSpecId))
  }
  case class SeAddrChanged(id: String, addr: Addr) extends Evt {
    val typ = "SpanEquipmentAddressInfoChanged"
    def payload = Js.obj("spanEquipmentId" -> Js.s(id), "addressInfo" -> addr.json)
  }

  case class TeSpecAdded(id: String, isCustomerTermination: Boolean) extends Evt {
    val typ = "TerminalEquipmentSpecificationAdded"
    def payload = Js.obj("specification" -> Js.obj("id" -> Js.s(id), "isCustomerTermination" -> isCustomerTermination.toString))
  }
  case class TePlaced(id: String, name: String, specId: String, containerId: String, addr: Option[Addr]) extends Evt {
    val typ = "TerminalEquipmentPlacedInNodeContainer"
    def payload = Js.obj("equipment" -> Js.obj("id" -> Js.s(id), "name" -> Js.s(name),
      "specificationId" -> Js.s(specId), "nodeContainerId" -> Js.s(containerId),
      "addressInfo" -> addr.map(_.json).orNull))
  }
  case class TeRemoved(id: String) extends Evt {
    val typ = "TerminalEquipmentRemoved"
    def payload = Js.obj("terminalEquipmentId" -> Js.s(id))
  }
  case class TeNamed(id: String, name: Option[String]) extends Evt {
    val typ = "TerminalEquipmentNamingInfoChanged"
    def payload = Js.obj("terminalEquipmentId" -> Js.s(id),
      "namingInfo" -> name.map(n => Js.obj("name" -> Js.s(n))).getOrElse(Js.obj()))
  }
  case class TeAddrChanged(id: String, addr: Addr) extends Evt {
    val typ = "TerminalEquipmentAddressInfoChanged"
    def payload = Js.obj("terminalEquipmentId" -> Js.s(id), "addressInfo" -> addr.json)
  }

  case class WtCreated(id: String, number: String, status: String) extends Evt {
    val typ = "WorkTaskCreated"
    def payload = Js.obj("workTaskId" -> Js.s(id),
      "workTask" -> Js.obj("number" -> Js.s(number), "status" -> Js.s(status)))
  }
  case class WtStatusChanged(id: String, status: String) extends Evt {
    val typ = "WorkTaskStatusChanged"
    def payload = Js.obj("workTaskId" -> Js.s(id), "status" -> Js.s(status))
  }

  case class InstCreated(id: String, installationId: String, unitAddr: Option[String],
      status: String, remark: Option[String]) extends Evt {
    val typ = "InstallationCreated"
    def payload = Js.obj("id" -> Js.s(id), "installationId" -> Js.s(installationId),
      "unitAddressId" -> unitAddr.map(Js.s).orNull, "status" -> Js.s(status),
      "locationRemark" -> remark.map(Js.s).orNull)
  }
  case class InstUnitChanged(id: String, unitAddr: Option[String]) extends Evt {
    val typ = "InstallationUnitAddressChanged"
    def payload = Js.obj("id" -> Js.s(id), "unitAddressId" -> unitAddr.map(Js.s).orNull)
  }
  case class InstStatusChanged(id: String, status: String) extends Evt {
    val typ = "InstallationStatusChanged"
    def payload = Js.obj("id" -> Js.s(id), "status" -> Js.s(status))
  }
  case class InstRemarkChanged(id: String, remark: Option[String]) extends Evt {
    val typ = "InstallationLocationRemarkChanged"
    def payload = Js.obj("id" -> Js.s(id), "locationRemark" -> remark.map(Js.s).orNull)
  }

  object Js {
    def s(v: String): String =
      if (v == null) null
      else "\"" + v.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c => c.toString
      } + "\""
    def arr(items: Iterable[String]): String = items.mkString("[", ",", "]")
    def obj(fields: (String, String)*): String =
      fields.filter(_._2 != null).map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
  }

  // ---- simulator state ----
  class State {
    case class SeState(id: String, var name: String, walkId: String, var specId: String,
        var fromNode: String, var toNode: String, isCable: Boolean, isCustomerConduit: Boolean,
        rootSegId: String, hasFrom: Boolean, hasTo: Boolean,
        var hasChild: Boolean, var access: Option[String], var unit: Option[String],
        var specName: String, var outerDiameter: Option[Int])

    val ncSpec = mutable.Map[String, (String, String)]()
    val nc = mutable.Map[String, (String, String, String, String)]() // id -> (routeNode, specId, specName, specCat)
    val ncToRoute = mutable.Map[String, String]()
    val walks = mutable.Map[String, Vector[String]]()
    val cableToRoute = mutable.Map[String, Vector[String]]()
    val seSpec = mutable.Map[String, (String, Boolean, String)]() // name, isCable, structSpecId
    val ssSpec = mutable.Map[String, Int]()
    val se = mutable.Map[String, SeState]()
    val seByRootSeg = mutable.Map[String, SeState]()
    val parentsByChild = mutable.Map[String, mutable.ListBuffer[SeState]]()
    val slack = mutable.Map[String, Int]()
    val teSpec = mutable.Map[String, Boolean]()
    val st = mutable.Map[String, (String, Option[String], Option[String], Option[String])]() // id -> (routeNode, name, access, unit)
    val wt = mutable.Map[String, (String, String)]()
    val inst = mutable.Map[String, (String, Option[String], Option[String], Option[String])]()

    private def dedup(ids: Seq[String]): Vector[String] = {
      val seen = mutable.LinkedHashSet[String]()
      ids.foreach(seen.add)
      seen.toVector
    }

    private def isFromSlack(s: SeState) = s.isCustomerConduit && !s.hasFrom && !s.hasChild
    private def isToSlack(s: SeState) = s.isCustomerConduit && !s.hasTo && !s.hasChild

    private def incSlack(node: String): Unit = slack(node) = slack.getOrElse(node, 0) + 1
    private def decSlack(node: String): Unit = {
      val n = slack.getOrElse(node,
        throw new IllegalStateException(s"slack decrement on absent node $node"))
      if (n == 1) slack.remove(node) else slack(node) = n - 1
    }

    private def hopSubtract(walk: Vector[String], hops: Seq[Hop]): Vector[String] = {
      if (hops == null) return walk
      var stack = hops.toList
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < walk.length) {
        val el = walk(i)
        if (stack.nonEmpty && stack.head.fromNodeId == el) {
          val hop = stack.head; stack = stack.tail
          var search = i + 1
          var found = false
          while (search < walk.length && !found) {
            if (walk(search) == hop.toNodeId) found = true else { i += 1; search += 1 }
          }
        } else out += el
        i += 1
      }
      out.result()
    }

    private def cableToRouteApply(cableId: String, interestId: String, hops: Seq[Hop]): Unit = {
      val walk = walks(interestId)
      cableToRoute(cableId) = if (hops == null) walk else hopSubtract(walk, hops)
    }

    private def processAffix(childId: String, hops: Seq[Hop]): Unit = {
      for (hop <- hops; segId <- hop.parentAffixes) {
        seByRootSeg.get(segId).foreach { parent =>
          if (isToSlack(parent)) decSlack(parent.toNode)
          if (isFromSlack(parent)) decSlack(parent.fromNode)
          parent.hasChild = true
          parentsByChild.getOrElseUpdate(childId, mutable.ListBuffer()) += parent
        }
      }
      val s = se(childId)
      cableToRouteApply(childId, s.walkId, hops)
    }

    def apply(e: Evt): Unit = e match {
      case NcSpecAdded(id, name, cat) => ncSpec(id) = (name, cat)
      case NcPlaced(id, route, specId) =>
        val (n, c) = ncSpec(specId)
        nc(id) = (route, specId, n, c)
        ncToRoute(id) = route
      case NcRemoved(id) =>
        nc.remove(id); ncToRoute.remove(id)
      case NcSpecChanged(id, newSpec) =>
        val (n, c) = ncSpec(newSpec)
        val (route, _, _, _) = nc(id)
        nc(id) = (route, newSpec, n, c)

      case WalkRegistered(id, refs) => walks(id) = dedup(refs)
      case WalkModified(id, ids) => walks(id) = dedup(ids)
      case InterestUnregistered(id) => walks.remove(id)

      case SeSpecAdded(id, name, isCable, structId) => seSpec(id) = (name, isCable, structId)
      case SsSpecAdded(id, d) => ssSpec(id) = d

      case SePlaced(id, name, specId, walkId, isCable, nodes, structures, hops, addr) =>
        val (specName, specIsCable, structId) = seSpec(specId)
        val diameter = ssSpec(structId)
        val segs = structures.flatten
        val hasFrom = segs.exists(s => s.fromIdx == 0 && s.fromTerm != null && s.fromTerm != EmptyUuid)
        val hasTo = segs.exists(s => s.toIdx == nodes.length - 1 && s.toTerm != null && s.toTerm != EmptyUuid)
        val state = SeState(id, name, walkId, specId, nodes.head, nodes.last, isCable,
          specName.toLowerCase.contains("ø12"), structures.head.head.id, hasFrom, hasTo,
          hasChild = false, addr.flatMap(_.access), addr.flatMap(_.unit), specName, Some(diameter))
        se(id) = state
        seByRootSeg(state.rootSegId) = state
        if (isFromSlack(state)) incSlack(state.fromNode)
        if (isToSlack(state)) incSlack(state.toNode)
        if (hops.exists(_.nonEmpty)) processAffix(id, hops.get)
        if (specIsCable) cableToRouteApply(id, walkId, hops.orNull)

      case SeMoved(id, nodes) => seMove(id, nodes)
      case SeMerged(id, nodes) => seMove(id, nodes)

      case SeRemoved(id) =>
        val s = se(id)
        if (isFromSlack(s)) decSlack(s.fromNode)
        if (isToSlack(s)) decSlack(s.toNode)
        seByRootSeg.remove(s.rootSegId)
        se.remove(id)

      case SeSpecChanged(id, newSpec) =>
        val (specName, _, structId) = seSpec(newSpec)
        val d = ssSpec(structId)
        val s = se(id)
        s.specId = newSpec; s.specName = specName; s.outerDiameter = Some(d)

      case SeAddrChanged(id, addr) =>
        val s = se(id)
        s.access = addr.access; s.unit = addr.unit

      case SeAffixed(id, hops) => processAffix(id, hops)

      case SeDetached(id, hops) =>
        parentsByChild.remove(id).foreach { parents =>
          parents.foreach { parent =>
            parent.hasChild = false
            if (isToSlack(parent)) incSlack(parent.toNode)
            if (isFromSlack(parent)) incSlack(parent.fromNode)
          }
        }
        val s = se(id)
        cableToRouteApply(id, s.walkId, hops)

      case TeSpecAdded(id, isCust) => teSpec(id) = isCust
      case TePlaced(id, name, specId, containerId, addr) =>
        (teSpec.get(specId), ncToRoute.get(containerId)) match {
          case (Some(isCust), Some(route)) if isCust =>
            st(id) = (route, Option(name), addr.flatMap(_.access), addr.flatMap(_.unit))
          case _ => // silent skip
        }
      case TeRemoved(id) => st.remove(id)
      case TeNamed(id, name) =>
        st.get(id).foreach { case (r, _, a, u) => st(id) = (r, name, a, u) }
      case TeAddrChanged(id, addr) =>
        st.get(id).foreach { case (r, n, _, _) => st(id) = (r, n, addr.access, addr.unit) }

      case WtCreated(id, number, status) =>
        if (status != null && status.nonEmpty) wt(id) = (number, status)
      case WtStatusChanged(id, status) =>
        wt.get(id).foreach { case (n, _) => wt(id) = (n, status) }

      case InstCreated(id, instId, unitAddr, status, remark) =>
        inst(id) = (instId, unitAddr, Option(status), remark)
      case InstUnitChanged(id, unitAddr) =>
        inst.get(id).foreach { case (i, _, s, r) => inst(id) = (i, unitAddr, s, r) }
      case InstStatusChanged(id, status) =>
        inst.get(id).foreach { case (i, u, _, r) => inst(id) = (i, u, Option(status), r) }
      case InstRemarkChanged(id, remark) =>
        inst.get(id).foreach { case (i, u, s, _) => inst(id) = (i, u, s, remark) }
    }

    private def seMove(id: String, nodes: Seq[String]): Unit = {
      se.get(id).foreach { s =>
        val newFrom = nodes.head
        val newTo = nodes.last
        if (s.fromNode != newFrom) {
          if (isFromSlack(s)) { decSlack(s.fromNode); incSlack(newFrom) }
          s.fromNode = newFrom
        }
        if (s.toNode != newTo) {
          if (isToSlack(s)) { decSlack(s.toNode); incSlack(newTo) }
          s.toNode = newTo
        }
      }
    }

    // ---- expected table contents ----
    def relInterest: Set[(String, String, Int)] =
      walks.toSet[(String, Vector[String])].flatMap { case (id, walk) =>
        walk.zipWithIndex.map { case (el, i) => (id, el, i + 1) }
      }
    def relFiberCable: Set[(String, String, Int)] =
      cableToRoute.toSet[(String, Vector[String])].flatMap { case (id, walk) =>
        walk.zipWithIndex.map { case (el, i) => (id, el, i + 1) }
      }
    def nodeContainers: Set[(String, String, String, String)] =
      nc.map { case (id, (route, _, n, c)) => (id, route, n, c) }.toSet
    def spanEquipments: Set[(String, String, Option[Int], Boolean, String, String, Option[String], Option[String])] =
      se.values.map(s => (s.id, s.walkId, s.outerDiameter, s.isCable, s.name, s.specName, s.access, s.unit)).toSet
    def serviceTerminations: Set[(String, String, Option[String], Option[String], Option[String])] =
      st.map { case (id, (route, n, a, u)) => (id, route, n, a, u) }.toSet
    def conduitSlacks: Set[(String, Int)] = slack.toSet
    def workTasks: Set[(String, String, String)] =
      wt.map { case (id, (n, s)) => (id, n, s) }.toSet
    def installations: Set[(String, String, Option[String], Option[String], Option[String])] =
      inst.map { case (id, (i, u, s, r)) => (id, i, u, s, r) }.toSet
  }
}
