package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DoubleType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator custom plan for the as-of join — SURVEY.md §2.10
  * preference (c): `LogicalPlan` + `Strategy` + physical `SparkPlan`,
  * for the operator Spark has no native node for.
  *
  * Physical algorithm: both sides hash-clustered on the key and sorted
  * within partitions by (key, ts) — the planner inserts the exchanges and
  * sorts via requiredChildDistribution/Ordering, exactly like sort-merge
  * join — then a single forward merge per partition keeps the latest tick
  * at-or-before each probe. O(|ticks| + |probes|) per partition, no
  * range explosion, no per-row search; the shuffle on the key is the only
  * data movement, so the operator scales like SMJ at 100 TB.
  *
  * Types are scoped to the financial shape: String key, Timestamp ts,
  * Double value. The composed union-window form (ops.AsOfOps) stays as
  * the generic fallback; both must produce identical results (shared
  * DuckDB ASOF JOIN oracle + spec equality).
  */
case class AsOfJoinNode(probes: LogicalPlan, ticks: LogicalPlan,
                        pKey: Attribute, pTs: Attribute,
                        tKey: Attribute, tTs: Attribute, tVal: Attribute,
                        // constructor params (NOT body vals) so exprIds
                        // survive copy()/transform during optimization
                        asofValue: AttributeReference =
                          AttributeReference("asof_value", DoubleType)(),
                        asofTs: AttributeReference =
                          AttributeReference("asof_ts", TimestampType)())
    extends BinaryNode {
  override def left: LogicalPlan = probes
  override def right: LogicalPlan = ticks
  override def output: Seq[Attribute] = probes.output :+ asofValue :+ asofTs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(Seq(asofValue, asofTs))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(probes = newLeft, ticks = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.pKey, n.pTs, n.tKey, n.tTs, n.tVal,
        n.asofValue, n.asofTs, planLater(n.probes), planLater(n.ticks)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(pKey: Attribute, pTs: Attribute,
                        tKey: Attribute, tTs: Attribute, tVal: Attribute,
                        asofValue: Attribute, asofTs: Attribute,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofValue :+ asofTs

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(pKey)), ClusteredDistribution(Seq(tKey)))

  // tick value as tertiary sort key: among ticks sharing (key, ts) the
  // merge's "last absorbed wins" then lands on the greatest value —
  // the same deterministic tie-break as AsOfOps.asofImpl's window
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(pKey, Ascending), SortOrder(pTs, Ascending)),
    Seq(SortOrder(tKey, Ascending), SortOrder(tTs, Ascending),
      SortOrder(tVal, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(pKey, Ascending), SortOrder(pTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val pKeyIdx = left.output.indexWhere(_.exprId == pKey.exprId)
    val pTsIdx = left.output.indexWhere(_.exprId == pTs.exprId)
    val tKeyIdx = right.output.indexWhere(_.exprId == tKey.exprId)
    val tTsIdx = right.output.indexWhere(_.exprId == tTs.exprId)
    val tValIdx = right.output.indexWhere(_.exprId == tVal.exprId)
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (probeItRaw, tickItRaw) =>
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      val extra = new GenericInternalRow(2)
      // defense in depth: AsOfOps filters nulls before building the
      // node, but a directly constructed AsOfJoinNode must not crash the
      // merge's UTF8String/getLong primitives — null key/ts (and null
      // tick values) can never join under inner as-of semantics, so
      // they are skipped here too. Nulls sort FIRST under the required
      // ascending ordering, so this drains them from the head.
      val probeIt = probeItRaw.filter(r =>
        !r.isNullAt(pKeyIdx) && !r.isNullAt(pTsIdx))
      val ticks = tickItRaw.filter(r =>
        !r.isNullAt(tKeyIdx) && !r.isNullAt(tTsIdx) && !r.isNullAt(tValIdx))
        .buffered

      new Iterator[InternalRow] {
        private var nextRow: InternalRow = _
        // latest tick seen for curKey (value/ts primitives — no row refs)
        private var curKey: UTF8String = _
        private var hasTick = false
        private var lastVal = 0.0
        private var lastTs = 0L

        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && probeIt.hasNext) {
            val probe = probeIt.next()
            val k = probe.getUTF8String(pKeyIdx)
            val ts = probe.getLong(pTsIdx)
            if (curKey == null || k.compareTo(curKey) != 0) {
              curKey = k.clone() // iterator may reuse the row buffer
              hasTick = false
              // skip ticks for keys before this probe key
              while (ticks.hasNext &&
                ticks.head.getUTF8String(tKeyIdx).compareTo(curKey) < 0)
                ticks.next()
            }
            // absorb all ticks for this key at-or-before the probe ts
            while (ticks.hasNext && {
              val h = ticks.head
              h.getUTF8String(tKeyIdx).compareTo(curKey) == 0 &&
                h.getLong(tTsIdx) <= ts
            }) {
              val t = ticks.next()
              lastVal = t.getDouble(tValIdx)
              lastTs = t.getLong(tTsIdx)
              hasTick = true
            }
            if (hasTick) {
              extra.update(0, lastVal)
              extra.update(1, lastTs)
              nextRow = resultProj(joined(probe, extra))
            }
          }
        }

        override def hasNext: Boolean = {
          if (nextRow == null) advance()
          nextRow != null
        }
        override def next(): InternalRow = {
          if (nextRow == null) advance()
          val r = nextRow
          nextRow = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
