package graft.core

/** Key-level diff/patch over schemaless payload dicts.
  *
  * Same change-doc semantics as the reference (diff: graphydb.py:203-236,
  * patch: graphydb.py:238-252): a change is `{add, remove}` key→value maps;
  * `_`-prefixed keys are ignored; a change touching only `mtime` collapses to
  * empty (pure timestamp churn is not a change).
  */
object Delta {

  case class Change(add: Map[String, Any], remove: Map[String, Any]) {
    def isEmpty: Boolean = add.isEmpty && remove.isEmpty
    /** Undo doc: apply the inverse. */
    def inverse: Change = Change(remove, add)
  }

  /** Diff taking d1 to d2, restricted to `changedKeys`. */
  def diff(d1: Map[String, Any], d2: Map[String, Any], changedKeys: Set[String]): Change = {
    var add = Map.empty[String, Any]
    var remove = Map.empty[String, Any]
    for (k <- d1.keySet ++ d2.keySet if !k.startsWith("_") && changedKeys.contains(k)) {
      (d1.get(k), d2.get(k)) match {
        case (Some(v1), None)                      => remove += k -> v1
        case (None, Some(v2))                      => add += k -> v2
        case (Some(v1), Some(v2)) if v1 != v2      => remove += k -> v1; add += k -> v2
        case _                                     => ()
      }
    }
    if (add.keySet == Set("mtime") && remove.keySet == Set("mtime")) Change(Map.empty, Map.empty)
    else Change(add, remove)
  }

  /** Apply (or reverse) a change to a payload dict. */
  def patch(d: Map[String, Any], c: Change, reverse: Boolean = false): Map[String, Any] =
    if (reverse) (d -- c.add.keySet) ++ c.remove
    else (d -- c.remove.keySet) ++ c.add

  /** Strip `_`-prefixed (local/temporary) keys before persisting
    * (reference `cleandata`, graphydb.py:196-201). */
  def clean(d: Map[String, Any]): Map[String, Any] = d.filter { case (k, _) => !k.startsWith("_") }

  /** Recursive structural clone of a payload value (reference `deepcopy`,
    * graphydb.py:1273-1284): nested maps/sequences are rebuilt so the clone
    * shares no mutable structure; scalars (immutable) pass through. */
  def deepClone(v: Any): Any = v match {
    case m: scala.collection.mutable.Map[_, _] =>
      val c = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
      m.foreach { case (k, x) => c(k) = deepClone(x) }
      c
    case m: scala.collection.Map[_, _] =>
      m.foldLeft(Map.empty[Any, Any]) { case (acc, (k, x)) => acc + (k -> deepClone(x)) }
    case s: scala.collection.mutable.Buffer[_] =>
      val b = scala.collection.mutable.ArrayBuffer.empty[Any]
      s.foreach(x => b += deepClone(x))
      b
    case s: Seq[_]    => s.map(deepClone)
    case s: Set[_]    => s.map(deepClone)
    case a: Array[_]  => a.map(deepClone)
    case other        => other
  }
}
