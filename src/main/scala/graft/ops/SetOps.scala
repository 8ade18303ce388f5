package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed twins of the driver-side NSet/ESet algebra (SURVEY §2.7):
  * uid-keyed, left-biased set operations as semi/anti joins — lazy, shuffle
  * only on the uid column, and safe at any cardinality. */
object SetOps {

  /** A ∪ B, left-biased: rows from A win on uid collision (the reference's
    * `conditionalyield`, graphydb.py:189-194). */
  def union(a: DataFrame, b: DataFrame, uidCol: String = "uid"): DataFrame =
    a.unionByName(b.join(a.select(uidCol), Seq(uidCol), "left_anti"))

  /** A ∩ B by uid, rows from A (left-biased). */
  def intersection(a: DataFrame, b: DataFrame, uidCol: String = "uid"): DataFrame =
    a.join(b.select(uidCol), Seq(uidCol), "left_semi")

  /** A − B by uid. */
  def difference(a: DataFrame, b: DataFrame, uidCol: String = "uid"): DataFrame =
    a.join(b.select(uidCol), Seq(uidCol), "left_anti")

  /** A △ B by uid (element from whichever side holds it). */
  def symmetricDifference(a: DataFrame, b: DataFrame, uidCol: String = "uid"): DataFrame =
    difference(a, b, uidCol).unionByName(difference(b, a, uidCol))

  /** uid-set equality (both directions empty after anti-join). */
  def setEquals(a: DataFrame, b: DataFrame, uidCol: String = "uid"): Boolean =
    difference(a.select(uidCol), b.select(uidCol), uidCol).isEmpty &&
      difference(b.select(uidCol), a.select(uidCol), uidCol).isEmpty

  /** Construction-time dedup (graphydb.py:283-287) at scale. */
  def dedupByUid(a: DataFrame, uidCol: String = "uid"): DataFrame =
    a.dropDuplicates(uidCol)
}
