package graft.engine

import graft.core.{Delta, Uid}
import scala.collection.mutable

final case class GraphyDBException(msg: String) extends RuntimeException(msg)

/** Driver-side item handle: a dict payload + dirty-key tracking, mirroring
  * `GraphyDBItem` (graphydb.py:1067-1291). The payload map carries core keys
  * (uid/kind/ctime/mtime[/startuid/enduid]) alongside user keys, exactly like
  * the reference's `data` dict; `_`-prefixed keys are local-only and never
  * persisted (graphydb.py:196-201).
  *
  * Items are a driver-side convenience over the distributed engine: `save`/
  * `delete` append to the graph's journal; queries never require items.
  */
sealed abstract class Item(val graph: MemGraph) {
  val data: mutable.LinkedHashMap[String, Any]
  protected[engine] val changedKeys: mutable.Set[String] = mutable.Set.empty

  def isEdge: Boolean
  def uid: String = data("uid").toString
  def kind: String = data("kind").toString

  def apply(key: String): Any =
    data.getOrElse(key, throw new NoSuchElementException(key))
  def get(key: String): Option[Any] = data.get(key)
  def contains(key: String): Boolean = data.contains(key)
  def keys: Iterable[String] = data.keys

  /** Set a key (mtime auto-touch + dirty tracking, graphydb.py:1215-1227). */
  def update(key: String, value: Any): this.type = {
    data(key) = value
    if (key != "mtime") { data("mtime") = MemGraph.now(); changedKeys += "mtime" }
    changedKeys += key
    this
  }
  def set(attrs: (String, Any)*): this.type = { attrs.foreach { case (k, v) => update(k, v) }; this }

  /** Remove key if present (graphydb.py:1229-1235). */
  def discard(key: String): this.type = {
    if (data.contains(key)) {
      data.remove(key)
      if (key != "mtime") { data("mtime") = MemGraph.now(); changedKeys += "mtime" }
      changedKeys += key
    }
    this
  }

  def changed: Boolean = changedKeys.nonEmpty
  protected[engine] def setChanged(c: Boolean): Unit = {
    changedKeys.clear(); if (c) changedKeys ++= data.keys
  }

  def exists: Boolean = graph.existsUid(uid, isEdge)

  /** Fresh copy from the graph state (graphydb.py:1144-1148). */
  def original(): Option[Item] = graph.getuid(uid)

  /** Reload from the graph, discarding local changes; `_`-prefixed local
    * keys survive (graphydb.py:1150-1163). */
  def renew(): this.type = {
    original().foreach { fresh =>
      val locals = data.filter { case (k, _) => k.startsWith("_") }
      data.clear()
      fresh.data.foreach { case (k, v) => data(k) = v }
      locals.foreach { case (k, v) => data(k) = v }
    }
    setChanged(false)
    this
  }

  def cleanData: Map[String, Any] = Delta.clean(data.toMap)

  def save(force: Boolean = false, batch: Option[String] = None): this.type
  def delete(disconnect: Boolean = false, batch: Option[String] = None): this.type

  def updatefts(fields: (String, String)*): this.type = { graph.updateFts(this, fields.toMap); this }
  def deletefts(): this.type = { graph.deleteFts(uid, isEdge); this }
}

final class Node private[engine] (
    graph0: MemGraph,
    val data: mutable.LinkedHashMap[String, Any],
    changed0: Boolean) extends Item(graph0) {

  if (!data.contains("kind") || data("kind") == null)
    throw GraphyDBException("Must supply Node kind")
  // edge-only reserved keys on a node would make the journal fold classify
  // the folded payload as an edge (presence of startuid) — corrupting
  // snapshots silently; the reference reserves these keys too (RESERVED,
  // graphydb.py:130-131)
  if (data.contains("startuid") || data.contains("enduid"))
    throw GraphyDBException("startuid/enduid are reserved edge keys")
  MemGraph.fillDefaults(data)
  setChanged(changed0)

  def isEdge = false

  /** INSERT OR REPLACE + journal append (graphydb.py:1309-1332; journaling is
    * always-on in this engine — SURVEY §2.11 drift note). */
  def save(force: Boolean = false, batch: Option[String] = None): this.type = {
    if (!force && !changed) return this
    graph.saveItem(this, batch, journal = true)
    setChanged(false); this
  }

  /** Refuses while connected unless `disconnect` (then cascades edges in the
    * same undo batch) — graphydb.py:1425-1452. */
  def delete(disconnect: Boolean = false, batch: Option[String] = None): this.type = {
    val touching = graph.edgesTouching(uid)
    var b = batch
    if (touching.nonEmpty) {
      if (!disconnect) throw GraphyDBException("Node still connected. Delete Edges First")
      if (b.isEmpty) b = Some(Uid.random())
      touching.foreach(e => graph.deleteItemByUid(e, isEdge = true, b))
    }
    graph.deleteItem(this, b)
    data("mtime") = MemGraph.now()
    setChanged(true); this
  }

  /** Shallow copy, optionally with a fresh uid (graphydb.py:1250-1262). */
  def copyItem(newUid: Boolean = false): Node = {
    val d = mutable.LinkedHashMap(data.toSeq: _*)
    if (newUid) d("uid") = Uid.random()
    val c = new Node(graph, d, changed0 = false)
    c.changedKeys.clear(); c.changedKeys ++= changedKeys
    if (newUid) c.changedKeys += "uid"
    c
  }

  /** Deep copy: nested payload structures are recursively cloned, so the
    * copy shares no mutable state with the original (graphydb.py:1273-1284). */
  def deepcopyItem(newUid: Boolean = false): Node = {
    val c = copyItem(newUid)
    val cloned = c.data.toSeq.map { case (k, v) => k -> graft.core.Delta.deepClone(v) }
    c.data.clear(); cloned.foreach { case (k, v) => c.data(k) = v }
    c
  }

  def inE(where: Seq[String] = Nil, params: Map[String, Any] = Map.empty): ESet =
    graph.fetchE("<(e)-", where = s"e.enduid = ${graft.query.Dialect.renderLiteral(uid)}" +: where, params = params)
  def outE(where: Seq[String] = Nil, params: Map[String, Any] = Map.empty): ESet =
    graph.fetchE("-(e)>", where = s"e.startuid = ${graft.query.Dialect.renderLiteral(uid)}" +: where, params = params)
  def bothE(where: Seq[String] = Nil): ESet = inE(where) | outE(where)
  def inN(where: Seq[String] = Nil): NSet =
    graph.fetchN("<(e)- [n]", where = s"e.enduid = ${graft.query.Dialect.renderLiteral(uid)}" +: where)
  def outN(where: Seq[String] = Nil): NSet =
    graph.fetchN("-(e)> [n]", where = s"e.startuid = ${graft.query.Dialect.renderLiteral(uid)}" +: where)
  def bothN(where: Seq[String] = Nil): NSet = inN(where) | outN(where)
  // COUNT variants: the reference fetches both sides and dedups client-side
  // (graphydb.py:1367-1373); sets are lazy unions here so size() suffices
  def inECount: Long = inE().size
  def outECount: Long = outE().size
  def bothECount: Long = bothE().size
  def inNCount: Long = inN().size
  def outNCount: Long = outN().size
  def bothNCount: Long = bothN().size

  override def toString = s"($uid:$kind)"
}

final class Edge private[engine] (
    graph0: MemGraph,
    val data: mutable.LinkedHashMap[String, Any],
    changed0: Boolean) extends Item(graph0) {

  if (!data.contains("kind") || data("kind") == null)
    throw GraphyDBException("Must supply edge kind")
  if (!data.contains("startuid") || data("startuid") == null)
    throw GraphyDBException("Wrong type or missing start node")
  if (!data.contains("enduid") || data("enduid") == null)
    throw GraphyDBException("Wrong type or missing end node")
  MemGraph.fillDefaults(data)
  setChanged(changed0)

  def isEdge = true
  def startuid: String = data("startuid").toString
  def enduid: String = data("enduid").toString

  /** FK-checks both endpoints before write (graphydb.py:1491-1494). */
  def save(force: Boolean = false, batch: Option[String] = None): this.type = {
    if (!force && !changed) return this
    if (!graph.existsUid(startuid, isEdge = false))
      throw GraphyDBException("start node referenced from edge does not exist in DB.")
    if (!graph.existsUid(enduid, isEdge = false))
      throw GraphyDBException("end node referenced from edge does not exist in DB.")
    graph.saveItem(this, batch, journal = true)
    setChanged(false); this
  }

  def delete(disconnect: Boolean = false, batch: Option[String] = None): this.type = {
    graph.deleteItem(this, batch)
    data("mtime") = MemGraph.now()
    setChanged(true); this
  }

  def start: Node = graph.fetchN("(n)", where = Seq(s"n.uid = ${graft.query.Dialect.renderLiteral(startuid)}")).one.get
  def end: Node = graph.fetchN("(n)", where = Seq(s"n.uid = ${graft.query.Dialect.renderLiteral(enduid)}")).one.get

  /** Shallow copy, optionally with a fresh uid (graphydb.py:1250-1262 — the
    * reference's `copy` lives on Item, so edges have it too). */
  def copyItem(newUid: Boolean = false): Edge = {
    val d = mutable.LinkedHashMap(data.toSeq: _*)
    if (newUid) d("uid") = Uid.random()
    val c = new Edge(graph, d, changed0 = false)
    c.changedKeys.clear(); c.changedKeys ++= changedKeys
    if (newUid) c.changedKeys += "uid"
    c
  }

  /** Deep copy (graphydb.py:1273-1284): nested payload structures cloned. */
  def deepcopyItem(newUid: Boolean = false): Edge = {
    val c = copyItem(newUid)
    val cloned = c.data.toSeq.map { case (k, v) => k -> graft.core.Delta.deepClone(v) }
    c.data.clear(); cloned.foreach { case (k, v) => c.data(k) = v }
    c
  }

  override def toString = s"($startuid)-[$uid:$kind]->($enduid)"
}
