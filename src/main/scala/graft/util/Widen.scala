package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Scan-parallelism repair for heavy per-row operators (optimization
  * guide §2.5 "input skew": one huge unsplittable file → repartition
  * immediately after the read).
  *
  * The driver ships each benchmark table as ONE parquet file with ONE row
  * group, so a scan over it plans a handful of splits of which only the
  * split holding the row-group start does any work: everything between
  * the scan and the first exchange — tokenizing, shingling, md5/xxhash
  * fingerprinting, byte-symbol encoding — runs on one core no matter how
  * many the session has. Operators whose pre-shuffle per-row work is the
  * dominant cost call [[widenNarrowScan]] on their input: when the input
  * is a plain scan pipeline (projections/filters/generates/unions over
  * file relations — nothing that already forces an exchange) with fewer
  * planned partitions than the session's parallelism, it is round-robin
  * repartitioned to that parallelism so the heavy expressions run wide.
  *
  * Scale-adaptive by construction, not a local[32] constant:
  *  - a production-size table plans >= defaultParallelism scan splits and
  *    is returned UNCHANGED (zero added shuffles at 100 TB);
  *  - anything that is not a pure scan pipeline (already shuffled,
  *    checkpointed, cached) is returned unchanged — the partition probe
  *    (`df.rdd`) would otherwise eagerly materialize AQE shuffle stages;
  *  - filters/pruning still reach the parquet scan: the optimizer pushes
  *    predicates and projections through RepartitionOperation, so
  *    PushedFilters/ReadSchema are unchanged (round-19 plan dumps).
  */
object Widen {

  /** True iff the ANALYZED plan is a scan pipeline: row-local operators
    * over file relations only — the shapes whose `.rdd` is safe to plan
    * (no AQE stage materialization) and whose partition count equals the
    * file-split count.
    */
  private def isNarrowScan(plan: LogicalPlan): Boolean = plan match {
    case _: LogicalRelation => true
    case _: DataSourceV2Relation => true
    case p: Project => isNarrowScan(p.child)
    case f: Filter => isNarrowScan(f.child)
    case g: Generate => isNarrowScan(g.child)
    case s: SubqueryAlias => isNarrowScan(s.child)
    case u: Union => u.children.forall(isNarrowScan)
    case _ => false
  }

  def widenNarrowScan(df: DataFrame): DataFrame = {
    if (!isNarrowScan(df.queryExecution.analyzed)) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
