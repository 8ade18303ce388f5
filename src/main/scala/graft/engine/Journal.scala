package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Json, Rows}

/** Distributed snapshot reconstruction from the change journal — the scale
  * path of the storage inversion (SURVEY §7.2): the journal IS the database;
  * the queryable node/edge tables are per-uid folds of change docs in seq
  * order.
  *
  * Change-doc fold rule (mirrors reference semantics, graphydb.py:572-636):
  * `payload ← (payload − removeKeys) ∪ addMap`; an item exists iff its folded
  * payload is non-empty (a delete doc removes the full image, including core
  * keys). Creates are full-image adds, modifies are key diffs — the same rule
  * covers all three, so the fold needs no per-doc discrimination.
  *
  * Execution shape: ONE shuffle (groupByKey on uid) + a typed mapGroups fold.
  * At 100 TB journal scale the fold stays bounded per uid (docs per item),
  * and compaction (`WarehouseGraph.compact`) bounds journal length by
  * rewriting the current snapshot as full-image creates.
  */
object Journal {

  // NOT private: Janino-generated encoder code cannot access a private
  // nested case class — the whole fold stage silently fell back to
  // interpreted serialization (CompileException noise in every run of a
  // journal query) until w21 surfaced it (r9)
  final case class FoldedItem(
      uid: String, kind: String, startuid: String, enduid: String,
      ctime: Double, mtime: Double, props: String, isEdge: Boolean)

  /** A folded snapshot: node/edge views over one cached backing DataFrame.
    * Callers that re-fold (new journal appends) should `unpersist()` the
    * previous snapshot to release executor storage. */
  final case class Snapshot(nodes: DataFrame, edges: DataFrame, backing: DataFrame) {
    def unpersist(): Unit = backing.unpersist()
  }

  /** Fold a journal (changeSchema rows) into current node/edge snapshots. */
  def snapshot(spark: SparkSession, changes: DataFrame): (DataFrame, DataFrame) = {
    val s = fold(spark, changes, Long.MaxValue)
    (s.nodes, s.edges)
  }

  /** Time travel: state as of journal position `maxSeq` (inclusive). */
  def snapshotAt(spark: SparkSession, changes: DataFrame, maxSeq: Long): (DataFrame, DataFrame) = {
    val s = fold(spark, changes, maxSeq)
    (s.nodes, s.edges)
  }

  def fold(spark: SparkSession, changes: DataFrame, maxSeq: Long): Snapshot = {
    import spark.implicits._
    val folded: Dataset[FoldedItem] = changes
      .filter(col("seq") <= maxSeq)
      .select("uid", "seq", "add", "remove")
      .as[(String, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        var payload = Map.empty[String, Any]
        it.toSeq.sortBy(_._2).foreach { case (_, _, add, remove) =>
          val rm = Option(remove).map(Json.parse).getOrElse(Map.empty)
          val ad = Option(add).map(Json.parse).getOrElse(Map.empty)
          payload = (payload -- rm.keys) ++ ad
        }
        if (payload.isEmpty) Iterator.empty
        else {
          def dbl(k: String): Double = payload.get(k) match {
            case Some(x: Double) => x
            case Some(x: Long) => x.toDouble
            case Some(x) => x.toString.toDouble
            case None => 0.0
          }
          val isEdge = payload.contains("startuid")
          Iterator.single(FoldedItem(
            uid,
            payload.getOrElse("kind", "").toString,
            payload.get("startuid").map(_.toString).orNull,
            payload.get("enduid").map(_.toString).orNull,
            dbl("ctime"), dbl("mtime"),
            Json.render(payload -- Rows.Reserved),
            isEdge))
        }
      }
    val cached = folded.toDF().cache()
    Snapshot(
      cached.filter(!col("isEdge"))
        .select("uid", "kind", "ctime", "mtime", "props"),
      cached.filter(col("isEdge"))
        .select("uid", "kind", "startuid", "enduid", "ctime", "mtime", "props"),
      cached)
  }

  /** Full-image create docs for a snapshot — the compaction rewrite. */
  def snapshotAsChanges(nodes: DataFrame, edges: DataFrame, startSeq: Long): DataFrame = {
    val nodeDocs = nodes.select(col("uid"),
      to_json(struct(col("uid"), col("kind"), col("ctime"), col("mtime"))).as("core"),
      col("props"), col("mtime"))
    val edgeDocs = edges.select(col("uid"),
      to_json(struct(col("uid"), col("kind"), col("startuid"), col("enduid"),
        col("ctime"), col("mtime"))).as("core"),
      col("props"), col("mtime"))
    nodeDocs.unionByName(edgeDocs)
      // any distinct seq assignment at/above startSeq is valid for creates
      // (each uid appears once, and the per-uid fold only needs base docs to
      // sort before every journal-tail doc). monotonically_increasing_id is
      // distinct and shuffle-free — a global row_number window would funnel
      // the whole snapshot through one task, a hard wall at warehouse scale.
      .withColumn("seq", monotonically_increasing_id() + lit(startSeq))
      .select(col("seq").cast("long"),
        col("uid"),
        // splice user props into the core object: one full-image add doc
        concat(expr("substring(core, 1, length(core)-1)"),
          when(col("props").isNull || col("props") === "{}", lit("}"))
            .otherwise(concat(lit(","), expr("substring(props, 2)")))).as("add"),
        lit(null).cast("string").as("remove"),
        col("mtime").as("time"),
        md5(col("uid")).as("rev"),
        lit(null).cast("string").as("batch"))
  }
}
