package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator as-of join — the (c) rung of the custom-operator
  * ladder: a logical node, a planner strategy, and a physical
  * sort-merge exec, registered per-session. The composed-built-ins
  * formulation in graft.queries.AsOf is the (a) rung; AsOfSpec asserts
  * the two produce identical results.
  *
  * Physical shape: both children hash-clustered on the key and sorted
  * by (key, ts) — EnsureRequirements inserts the exchanges/sorts — then
  * a single zip-merge pass per partition keeps ONE buffered right row
  * (the latest with r_ts ≤ ts for the current key). O(1) state per
  * partition, no range blow-up, inner backward-join semantics exactly
  * like DuckDB's ASOF JOIN.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Attribute, leftTs: Attribute,
                    rightKey: Attribute, rightTs: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, leftTs: Attribute,
                        rightKey: Attribute, rightTs: Attribute)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // advertise what the zip-merge preserves: rows leave hash-clustered
  // on the left key and sorted by (key, ts), so a downstream groupBy /
  // window on the key reuses the exchange and sort instead of
  // re-shuffling (SortMergeJoinExec does the same)
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lt = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rk = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rt = right.output.indexWhere(_.exprId == rightTs.exprId)
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter0) =>
      val proj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val rIter = rIter0.buffered
      new Iterator[InternalRow] {
        private var matched: InternalRow = _
        private var matchedKey: Long = 0L
        private var nextRow: InternalRow = _

        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && lIter.hasNext) {
            val l = lIter.next()
            // null key/ts rows cannot match (SQL join-on-null semantics);
            // without the guard getLong reads null as 0 and a null-key
            // left row could spuriously match right rows with key 0
            // (ClusteredDistribution co-locates nulls, so it's reachable)
            if (!l.isNullAt(lk) && !l.isNullAt(lt)) {
              val k = l.getLong(lk); val t = l.getLong(lt)
              // consume right rows usable for this (k, t): null-keyed
              // rows (sorted first) are discarded, key < k is stale,
              // key == k with ts <= t updates the buffered match
              while (rIter.hasNext && {
                val h = rIter.head
                h.isNullAt(rk) || h.isNullAt(rt) || {
                  val rKey = h.getLong(rk)
                  rKey < k || (rKey == k && h.getLong(rt) <= t)
                }
              }) {
                val r = rIter.next()
                if (!r.isNullAt(rk) && !r.isNullAt(rt) && r.getLong(rk) == k) {
                  matched = r.copy(); matchedKey = k
                }
              }
              if (matched != null && matchedKey == k) {
                nextRow = proj(joined(l, matched))
              } // else: no right row at or before t for this key → inner-drop
            }
          }
        }

        override def hasNext: Boolean = { if (nextRow == null) advance(); nextRow != null }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = nextRow; nextRow = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

/** DataFrame-level facade. `key` must be LongType; `ts` LongType or
  * TimestampType (both are long-backed in InternalRow). Right-side
  * columns are suffixed `_r` (fresh exprIds — also what makes an
  * events self-join bind cleanly).
  */
object AsOfJoinOps {
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame, key: String, ts: String): DataFrame = {
    val spark = leftDf.sparkSession
    register(spark)
    val rightRenamed = rightDf.select(rightDf.columns.toIndexedSeq.map(c => col(c).as(c + "_r")): _*)
    val lp = leftDf.queryExecution.analyzed
    val rp = rightRenamed.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val (lKey, lTs) = (attr(lp, key), attr(lp, ts))
    val (rKey, rTs) = (attr(rp, key + "_r"), attr(rp, ts + "_r"))
    Seq(lKey, rKey).foreach(a => require(a.dataType == LongType,
      s"as-of key must be long, got ${a.dataType.sql}"))
    Seq(lTs, rTs).foreach(a => require(a.dataType == LongType || a.dataType == TimestampType,
      s"as-of ts must be long-backed, got ${a.dataType.sql}"))
    GraftExpressionBridge.ofRows(spark, AsOfJoin(lp, rp, lKey, lTs, rKey, rTs))
  }

  /** Idempotently add the planner strategy to a session. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
}
