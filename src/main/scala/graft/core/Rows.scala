package graft.core

import org.apache.spark.sql.types._

/** Fixed row schemas (reference DDL: graphydb.py:521-525; design SURVEY.md §1.5).
  *
  * Core columns are first-class Spark columns (prunable, pushdown-able);
  * the schemaless remainder lives in `props` as canonical JSON text.
  */
object Rows {
  /** Keys that are core columns, never stored inside props.
    * Mirrors RESERVED (graphydb.py:130-131). */
  val Reserved: Set[String] = Set("uid", "kind", "ctime", "mtime", "startuid", "enduid")

  val nodeSchema: StructType = StructType(Seq(
    StructField("uid", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("ctime", DoubleType, nullable = false),
    StructField("mtime", DoubleType, nullable = false),
    StructField("props", StringType, nullable = true)))

  val edgeSchema: StructType = StructType(Seq(
    StructField("uid", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("startuid", StringType, nullable = false),
    StructField("enduid", StringType, nullable = false),
    StructField("ctime", DoubleType, nullable = false),
    StructField("mtime", DoubleType, nullable = false),
    StructField("props", StringType, nullable = true)))

  /** Journal row (reference change docs: graphydb.py:572-603).
    * `add`/`remove` are JSON objects: full image for create/delete,
    * key-level diffs for modify. */
  val changeSchema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("uid", StringType, nullable = false),
    StructField("add", StringType, nullable = true),
    StructField("remove", StringType, nullable = true),
    StructField("time", DoubleType, nullable = false),
    StructField("rev", StringType, nullable = false),
    StructField("batch", StringType, nullable = true)))

  val kvSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))
}

/** Typed views of the fixed schemas for Dataset[T] APIs. */
case class NodeRow(uid: String, kind: String, ctime: Double, mtime: Double, props: String)

case class EdgeRow(uid: String, kind: String, startuid: String, enduid: String,
                   ctime: Double, mtime: Double, props: String)

case class ChangeRow(seq: Long, uid: String, add: String, remove: String,
                     time: Double, rev: String, batch: String)
