package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.ops.ManifestFileIndex

/** Metadata-only `COUNT(*)` over a manifest-backed table — the
  * Iceberg/Delta "answer counts from table metadata" optimization as a
  * Catalyst [[Rule]]: a grouping-free `count(1)` whose child bottoms out
  * at a [[graft.ops.ManifestFileIndex]] relation (through row-preserving
  * Projects only) folds to a [[LocalRelation]] holding the manifest's
  * row total — zero tasks, zero file opens, the exact per-file counts
  * every commit already recorded.
  *
  * Fires ONLY when the answer is provably the manifest total:
  *   - a single aggregate expression, `count(1)`/`count(*)` (non-distinct,
  *     no filter clause) — any other aggregate, grouping key, or filter in
  *     the plan blocks the rewrite (a Filter node changes cardinality;
  *     Project never does);
  *   - the index's generation carries NO deletion-vector tombstones
  *     (tombstoned tables read through an anti-join — that plan shape
  *     never matches here anyway, but the index check is belt-and-braces
  *     against future plan shapes).
  *
  * Registration is session-level and explicit:
  * `ManifestCount.enable(spark)` appends the rule to
  * `spark.experimental.extraOptimizations` (idempotent). Kept opt-in so
  * the default ZTable read path stays byte-identical to earlier rounds.
  */
object ManifestCount extends Rule[LogicalPlan] {

  def enable(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  def disable(spark: SparkSession): Unit = synchronized {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq this)
  }

  /** The chain below the aggregate must preserve row count exactly:
    * Projects do, nothing else is admitted. */
  private def manifestRowCount(plan: LogicalPlan): Option[Long] = plan match {
    case Project(_, child) => manifestRowCount(child)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case mfi: ManifestFileIndex if !mfi.hasTombstones =>
          Some(mfi.manifestRowCount)
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def isCountStar(e: AggregateExpression): Boolean = e match {
    case AggregateExpression(Count(Seq(Literal(_, _))), Complete, false, None, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg @ Aggregate(Nil, Seq(Alias(ae: AggregateExpression, _)), child, _)
        if isCountStar(ae) =>
      manifestRowCount(child) match {
        case Some(n) =>
          LocalRelation(agg.output.map(_.toAttribute),
            Seq(InternalRow(n)))
        case None => agg
      }
  }
}
