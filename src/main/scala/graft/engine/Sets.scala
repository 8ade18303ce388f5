package graft.engine

import scala.collection.mutable

/** Ordered, uid-indexed set algebra over materialized items — a Scala port of
  * the reference's `IndexedSet`/`NSet`/`ESet` semantics
  * (graphydb.py:261-482, 1546-1784): identity is `uid` only, never content;
  * union/intersection are left-biased (`conditionalyield`,
  * graphydb.py:189-194); duplicate uids collapse on construction; sort is
  * stable; `add` keeps position, `append` moves to end.
  *
  * These are driver-side wrappers for human-scale result handling. The
  * distributed equivalents are uid-keyed semi/anti joins (SURVEY §2.7) —
  * see [[graft.ops.SetOps]] — and the set-returning traversals on
  * [[MemGraph]] stay single distributed plans until materialized.
  */
abstract class ItemSet[T <: Item, Self <: ItemSet[T, Self]](initial: Seq[T]) { self: Self =>

  protected def make(items: Seq[T]): Self

  protected val list = mutable.ArrayBuffer.empty[T]
  protected val index = mutable.LinkedHashMap.empty[String, T]
  initial.foreach(add)

  def uids: Set[String] = index.keySet.toSet
  def size: Int = index.size
  def isEmpty: Boolean = index.isEmpty
  def iterator: Iterator[T] = list.iterator
  def toSeq: Seq[T] = list.toSeq
  def contains(uid: String): Boolean = index.contains(uid)

  def apply(i: Int): T = list(i)
  def apply(uid: String): T = index(uid)
  def slice(from: Int, until: Int): Self = make(list.slice(from, until).toSeq)

  /** First item or None (reference `.one`, graphydb.py:1620-1628). */
  def one: Option[T] = list.headOption

  def add(item: T): this.type = {
    val u = item.uid
    if (index.contains(u)) {
      val i = list.indexWhere(_.uid == u)
      list(i) = item
    } else list += item
    index(u) = item
    this
  }

  def append(item: T): this.type = { discard(item.uid); list += item; index(item.uid) = item; this }
  def discard(uid: String): this.type = {
    index.remove(uid).foreach { old => list.remove(list.indexWhere(_.uid == uid)) }
    this
  }
  def remove(uid: String): this.type = {
    if (!index.contains(uid)) throw new NoSuchElementException(uid)
    discard(uid)
  }
  def pop(idx: Int = -1): T = {
    val i = if (idx < 0) list.length + idx else idx
    val item = list.remove(i); index.remove(item.uid); item
  }
  def clear(): this.type = { list.clear(); index.clear(); this }
  def update(others: IterableOnce[T]*): this.type = { others.foreach(_.iterator.foreach(add)); this }
  def copy: Self = make(toSeq)

  // -- set algebra: uid-keyed, left-biased ----------------------------------
  def |(other: Self): Self =
    make(toSeq ++ other.toSeq.filterNot(i => index.contains(i.uid)))
  def &(other: Self): Self = make(toSeq.filter(i => other.contains(i.uid)))
  def -(other: Self): Self = make(toSeq.filterNot(i => other.contains(i.uid)))
  def ^(other: Self): Self =
    make(toSeq.filterNot(i => other.contains(i.uid)) ++
         other.toSeq.filterNot(i => index.contains(i.uid)))
  def union(others: Self*): Self = others.foldLeft(this.asInstanceOf[Self])(_ | _)
  def intersection(others: Self*): Self = others.foldLeft(this.asInstanceOf[Self])(_ & _)
  def difference(others: Self*): Self = others.foldLeft(this.asInstanceOf[Self])(_ - _)

  /** Equality/comparison on uid sets only (graphydb.py:412-425). */
  def setEquals(other: Self): Boolean = uids == other.uids
  def subsetOf(other: Self): Boolean = uids.subsetOf(other.uids)
  override def equals(o: Any): Boolean = o match {
    case s: ItemSet[_, _] => uids == s.uids
    case _ => false
  }
  override def hashCode(): Int = uids.hashCode()

  // -- list-ish behaviors ---------------------------------------------------
  /** Stable in-place sort (graphydb.py:307-312). */
  def sortInPlace[B](key: T => B, reverse: Boolean = false)(implicit ord: Ordering[B]): this.type = {
    val sorted = list.sortBy(key)(if (reverse) ord.reverse else ord)
    list.clear(); list ++= sorted; this
  }
  def reverseInPlace(): this.type = { val r = list.reverse; list.clear(); list ++= r; this }

  /** Client-side filter; exceptions drop the item (graphydb.py:1576-1595). */
  def filter(f: T => Boolean): Self =
    make(toSeq.filter(i => try f(i) catch { case _: Exception => false }))

  /** Per-key fnmatch glob filter; missing key = no match
    * (graphydb.py:1597-1618). */
  def filterGlob(patterns: (String, String)*): Self = {
    val regexes = patterns.map { case (k, p) =>
      k -> graft.query.Dialect.globToRegex(p).r
    }
    filter { item =>
      regexes.forall { case (k, re) =>
        item.get(k).exists(v => re.matches(String.valueOf(v)))
      }
    }
  }

  /** Column extraction (graphydb.py:1630-1648). */
  def get(key: String, default: Any = null): Seq[Any] =
    toSeq.map(_.get(key).getOrElse(default))
  def getm(keys: String*): Seq[Seq[Any]] =
    toSeq.map(i => keys.map(k => i.get(k).orNull))

  /** Bulk save/delete share one undo batch (graphydb.py:1561-1573). */
  def save(): this.type = {
    val batch = Some(graft.core.Uid.random())
    list.foreach(_.save(batch = batch)); this
  }
  def delete(disconnect: Boolean = false): this.type = {
    val batch = Some(graft.core.Uid.random())
    list.foreach(_.delete(disconnect = disconnect, batch = batch)); this
  }
  def setAll(attrs: (String, Any)*): this.type = { list.foreach(_.set(attrs: _*)); this }
  def deletefts(): this.type = { list.foreach(_.deletefts()); this }
}

object ItemSet {
  /** Above this many uids, traversal predicates switch from inline IN-lists
    * to a temp-view semi-join — a million-row set would otherwise render a
    * multi-MB SQL string the parser has to chew through. */
  private[engine] val InListThreshold = 10000

  // uid-set views registered since the last drain, per THREAD (a session-
  // keyed map would let one thread's drain drop another in-flight fetch's
  // view — Spark sessions are multi-thread-safe and the register/execute/
  // drain cycle runs on the calling thread). ItemSet fetches are eager
  // (collect on return), so traversal methods drain right after the fetch —
  // a long-lived session no longer accumulates catalog entries pinning
  // driver-side uid data.
  private val pendingViews =
    ThreadLocal.withInitial[List[String]](() => Nil)

  /** Render `<colRef> IN (...)` either as literals (small sets) or as a
    * subquery over a registered temp view of the uids (large sets — the
    * optimizer turns it into a semi-join; the uid frame is broadcast-sized
    * relative to the tables it probes). */
  private[engine] def uidPredicate(spark: org.apache.spark.sql.SparkSession,
      colRef: String, us: Seq[String]): String =
    if (us.size <= InListThreshold)
      us.map(graft.query.Dialect.renderLiteral(_)).mkString(s"$colRef IN (", ",", ")")
    else {
      val view = s"graft_uidset_${graft.core.Uid.random().toLowerCase}"
      import spark.implicits._
      spark.createDataset(us).toDF("uid").createOrReplaceTempView(view)
      pendingViews.set(view :: pendingViews.get())
      s"$colRef IN (SELECT uid FROM $view)"
    }

  /** Drop every uid-set view THIS THREAD registered since its last drain.
    * Call only AFTER the consuming query has materialized (or failed). */
  private[engine] def dropPendingViews(spark: org.apache.spark.sql.SparkSession): Unit = {
    val views = pendingViews.get()
    pendingViews.remove()
    views.foreach(spark.catalog.dropTempView)
  }
}

final class NSet(initial: Seq[Node] = Nil) extends ItemSet[Node, NSet](initial) {
  protected def make(items: Seq[Node]): NSet = new NSet(items)

  private def g: MemGraph = list.head.graph
  private def uidIn(colRef: String): String = ItemSet.uidPredicate(g.spark, colRef, uids.toSeq)
  // fetches are eager, so the uid-set views a predicate registered can be
  // dropped as soon as the fetch returns — or fails (finally)
  private def drained[A](fetched: => A): A =
    try fetched finally ItemSet.dropPendingViews(g.spark)

  /** Set-level traversals: ONE distributed query per call (the reference
    * loops members, N+1 queries — graphydb.py:1711-1772; SURVEY §2.12). */
  def inE(): ESet = if (isEmpty) new ESet() else drained(g.fetchE("<(e)-", Seq(uidIn("e.enduid"))))
  def outE(): ESet = if (isEmpty) new ESet() else drained(g.fetchE("-(e)>", Seq(uidIn("e.startuid"))))
  def bothE(): ESet = if (isEmpty) new ESet()
    else drained(g.fetchE("-(e)>", Seq(s"(${uidIn("e.startuid")} OR ${uidIn("e.enduid")})")))
  def inN(): NSet = if (isEmpty) new NSet() else drained(g.fetchN("<(e)- [n]", Seq(uidIn("e.enduid"))))
  def outN(): NSet = if (isEmpty) new NSet() else drained(g.fetchN("-(e)> [n]", Seq(uidIn("e.startuid"))))
  def bothN(): NSet = if (isEmpty) new NSet() else inN() | outN()
}

final class ESet(initial: Seq[Edge] = Nil) extends ItemSet[Edge, ESet](initial) {
  protected def make(items: Seq[Edge]): ESet = new ESet(items)

  private def g: MemGraph = list.head.graph
  private def uidIn(col: String): String = ItemSet.uidPredicate(
    g.spark, "n.uid", toSeq.map(_.data(col).toString).distinct)
  private def drained[A](fetched: => A): A =
    try fetched finally ItemSet.dropPendingViews(g.spark)

  /** Endpoint node sets — one query each (graphydb.py:1673-1691). */
  def start: NSet = if (isEmpty) new NSet() else drained(g.fetchN("(n)", Seq(uidIn("startuid"))))
  def end: NSet = if (isEmpty) new NSet() else drained(g.fetchN("(n)", Seq(uidIn("enduid"))))
}
