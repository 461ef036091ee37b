package graft.merge

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.model.Biolink
import scala.jdk.CollectionConverters._

/** Property-level entity merge — the semantics of the reference's
  * `entity_merging_function` (/root/reference/orion/merging.py:103-183)
  * re-implemented over Jackson JSON trees (Jackson ships with Spark):
  *
  *  - dict ⊕ dict   → per-subkey recursive merge, truthy-prefer scalars
  *  - dict ⊕ other  → mismatch warning, keep first
  *  - list ⊕ list   → concat;  scalar ⊕ list → append/prepend
  *  - scalar ⊕ scalar → first-truthy-wins; both truthy+differ → keep first,
  *    record dropped-property warning
  *  - post-merge list dedup: plain lists `sorted(set(...))`; lists of dicts
  *    grouped by a key fn (`sources` → resource_id+resource_role, else
  *    canonical sorted-keys JSON) then recursively merged
  *    (ref orion/merging.py:44-64,159-179)
  *  - skip keys {id, subject, object, predicate, primary_knowledge_source}
  */
object PropertyMerge {
  val mapper = new ObjectMapper()

  /** Side-channel for merge warnings (ref orion/merging.py:25-42). */
  final case class Warnings(
      mismatched: scala.collection.mutable.Set[String] = scala.collection.mutable.Set(),
      dropped: scala.collection.mutable.Set[String] = scala.collection.mutable.Set())

  private def truthy(n: JsonNode): Boolean =
    n != null && !n.isNull && (n match {
      case _ if n.isBoolean => n.asBoolean()
      case _ if n.isNumber  => n.asDouble() != 0.0
      case _ if n.isTextual => n.asText().nonEmpty
      case _ if n.isArray   => n.size() > 0
      case _ if n.isObject  => n.size() > 0
      case _                => true
    })

  /** Canonical sorted-keys JSON — duplicate-dict detection key
    * (ref orion/merging.py:49-51). */
  def canonicalJson(n: JsonNode): String = n match {
    case o: ObjectNode =>
      o.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
        .sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + canonicalJson(v) }
        .mkString("{", ",", "}")
    case a: ArrayNode =>
      a.elements().asScala.map(canonicalJson).mkString("[", ",", "]")
    case other => other.toString
  }

  private def dictKeyFn(prop: String)(n: JsonNode): String =
    if (prop == Biolink.Sources)
      n.path(Biolink.ResourceId).asText("") + n.path(Biolink.ResourceRole).asText("")
    else canonicalJson(n)

  /** Total order over scalar JSON values for `sorted(set(...))` parity:
    * numbers numerically, strings lexicographically, heterogeneous by
    * (type rank, text). */
  private def scalarOrdering: Ordering[JsonNode] = new Ordering[JsonNode] {
    private def rank(n: JsonNode) =
      if (n.isNumber) 0 else if (n.isTextual) 1 else if (n.isBoolean) 2 else 3
    def compare(a: JsonNode, b: JsonNode): Int = {
      val r = rank(a) compare rank(b)
      if (r != 0) r
      else if (a.isNumber && b.isNumber) java.lang.Double.compare(a.asDouble(), b.asDouble())
      else a.toString compare b.toString
    }
  }

  private def dedupList(prop: String, arr: ArrayNode, w: Warnings): JsonNode = {
    if (arr.size() == 0) return arr
    val out = mapper.createArrayNode()
    if (arr.get(0).isObject) {
      // group by key fn, recursive merge, first-occurrence order (LinkedHashMap)
      val grouped = new java.util.LinkedHashMap[String, JsonNode]()
      arr.elements().asScala.foreach { item =>
        val k = dictKeyFn(prop)(item)
        grouped.compute(k, (_, prev) =>
          if (prev == null) item
          else merge(prev.asInstanceOf[ObjectNode].deepCopy(), item.asInstanceOf[ObjectNode], w))
      }
      grouped.values().asScala.foreach(out.add)
    } else {
      val seen = scala.collection.mutable.Set[String]()
      arr.elements().asScala.toSeq
        .filter(e => seen.add(canonicalJson(e)))
        .sorted(scalarOrdering)
        .foreach(out.add)
    }
    out
  }

  /** Merge e2 into e1 (e1 mutated and returned), reference-faithful. */
  def merge(e1: ObjectNode, e2: ObjectNode, w: Warnings): ObjectNode = {
    e2.properties().asScala.toSeq.foreach { entry =>
      val key = entry.getKey
      val v2 = entry.getValue
      if (!Biolink.mergeSkipKeys.contains(key)) {
        if (e1.has(key) && v2 != null && !v2.isNull) {
          val v1 = e1.get(key)
          val (l1, l2) = (v1.isArray, v2.isArray)
          val (d1, d2) = (v1.isObject, v2.isObject)
          if (d1 && d2) {
            val o1 = v1.asInstanceOf[ObjectNode]
            v2.asInstanceOf[ObjectNode].properties().asScala.toSeq.foreach { se =>
              val (sk, sv) = (se.getKey, se.getValue)
              if (o1.has(sk)) {
                val esv = o1.get(sk)
                if (esv.isObject && sv.isObject)
                  o1.set(sk, merge(esv.asInstanceOf[ObjectNode], sv.asInstanceOf[ObjectNode], w))
                else if (!truthy(esv)) o1.set(sk, sv)
                else if (!truthy(sv)) ()
                else if (esv != sv) w.dropped += key
              } else o1.set(sk, sv)
            }
          } else if (d1 || d2) {
            w.mismatched += key
          } else if (l1 && l2) {
            v1.asInstanceOf[ArrayNode].addAll(v2.asInstanceOf[ArrayNode])
          } else if (l1) {
            v1.asInstanceOf[ArrayNode].add(v2)
          } else if (l2) {
            val merged = mapper.createArrayNode()
            if (v1 != null && !v1.isNull) merged.add(v1)
            merged.addAll(v2.asInstanceOf[ArrayNode])
            e1.set(key, merged)
          } else {
            if (!truthy(v1)) e1.set(key, v2)
            else if (!truthy(v2)) ()
            else if (v1 != v2) w.dropped += key
          }
          if (l1 || l2) {
            val cur = e1.get(key)
            if (cur.isArray && cur.size() > 0)
              e1.set(key, dedupList(key, cur.asInstanceOf[ArrayNode], w))
          }
        } else if (!e1.has(key)) {
          e1.set(key, v2)
        }
      }
    }
    e1
  }

  /** Fold a sequence of entity JSON strings in order (file order in the
    * reference; ordinal order here — SURVEY §7.5 risk 1). */
  def mergeAll(jsons: Seq[String], w: Warnings): String = {
    require(jsons.nonEmpty)
    val first = mapper.readTree(jsons.head).asInstanceOf[ObjectNode]
    jsons.tail.foldLeft(first) { (acc, js) =>
      merge(acc, mapper.readTree(js).asInstanceOf[ObjectNode], w)
    }.toString
  }
}
