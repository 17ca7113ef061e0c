package graft.cj

import com.fasterxml.jackson.databind.JsonNode
import scala.collection.mutable
import graft.model.{Vocab => V}

/** Semantic-surface tree for one geometry item. Reproduces
  * /root/reference/CityJsonRDF/Semantics.cpp: parent wiring from `children`
  * lists with conflict detection (Semantics.cpp:64-79), tolerant value-path
  * walk (Semantics.cpp:84-105, short arrays keep the current node), lazy
  * memoized surface-instance creation walking the parent chain
  * (Semantics.cpp:109-145).
  *
  * Divergence (documented): on a cyclic parent chain the reference recurses
  * forever; we break the cycle and return the partially-built instance.
  */
private[cj] final class CjSemantics(m: CjModel) {

  private final class Surf {
    var typNode: JsonNode = null
    var parent: Int = -1
    val children = mutable.ArrayBuffer[Int]()
    val attributes = mutable.ArrayBuffer[(String, JsonNode)]()
    var owlInstance: String = null
    var visiting = false
  }

  private val surfaces = mutable.ArrayBuffer[Surf]()
  private var values: JsonNode = null

  /** Semantics::Init (Semantics.cpp:45-79). */
  def init(semantics: JsonNode): Unit = {
    m.members(semantics).foreach { case (name, value) =>
      name match {
        case "surfaces" => m.elems(value).foreach(j => surfaces += initSurface(j))
        case "values" => values = value
        case other => m.logInfo("Unsupported semantics member '%s'", other)
      }
    }
    // push parent indices down from declared children lists
    for (iParent <- surfaces.indices) {
      val parent = surfaces(iParent)
      parent.children.foreach { iChild =>
        if (iChild < 0 || iChild >= surfaces.size)
          m.jsonAssert(cond = false, "child index < surfaces.size")
        val child = surfaces(iChild)
        if (child.parent >= 0 && child.parent != iParent)
          m.logError("Invalid semantic surface '%s' parent", m.jStr(child.typNode))
        child.parent = iParent
      }
      parent.children.clear()
    }
  }

  /** Semantics::Surface::Init (Semantics.cpp:18-39): unknown members are
    * captured as attributes. */
  private def initSurface(jsurf: JsonNode): Surf = {
    val s = new Surf
    m.members(jsurf).foreach { case (name, value) =>
      name match {
        case "type" => s.typNode = value
        case "parent" => s.parent = m.jInt(value)
        case "children" => m.elems(value).foreach(c => s.children += m.jInt(c))
        case other => s.attributes += ((other, value))
      }
    }
    s
  }

  /** Semantics::GetSurfaceSemantic (Semantics.cpp:84-105): tolerant walk —
    * descend only while the node is an array long enough; a non-int leaf or
    * out-of-range surface index yields no semantic. Returns the surface
    * instance IRI or null. */
  def getSurfaceSemantic(faceIndexPath: Seq[Int]): String = {
    var node = values
    faceIndexPath.foreach { i =>
      if (node != null && node.isArray && node.size > i) node = node.get(i)
    }
    if (node == null || !node.isIntegralNumber || !node.canConvertToInt) return null
    val i = node.intValue
    if (i < 0 || i >= surfaces.size) {
      m.logError("Semantic surface index %d is out of range", i)
      return null
    }
    getOwlInstance(surfaces(i))
  }

  /** Semantics::GetOwlInstance (Semantics.cpp:109-145). */
  private def getOwlInstance(surf: Surf): String = {
    if (surf.typNode != null && !surf.typNode.isNull && !surf.visiting) {
      surf.visiting = true
      val typ = m.jStr(surf.typNode)
      val cls = m.getOrCreateClass("City.SurfaceSemantic", addPrefix = false)
      surf.owlInstance = m.createInstance(cls, typ)

      val typeProp = m.getOrCreateProperty(cls, "city.prop.type", null, P.CHAR)
      m.setDatatype(surf.owlInstance, typeProp, typ, V.XsdString)

      if (surf.parent >= 0 && surf.parent < surfaces.size) {
        val owlParent = getOwlInstance(surfaces(surf.parent))
        if (owlParent != null) {
          val parentProp = m.getOrCreateProperty(cls, "parent", "city.prop.", P.OBJ, "City.SurfaceSemantic")
          m.setObjectProp(surf.owlInstance, parentProp, owlParent)
        }
      }

      surf.attributes.foreach { case (name, value) =>
        m.createAttribute(surf.owlInstance, name, "city.prop.attr.", value)
      }
      surf.attributes.clear()
      surf.typNode = null
      surf.visiting = false
    }
    surf.owlInstance
  }
}
