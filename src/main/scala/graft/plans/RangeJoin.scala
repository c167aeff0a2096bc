package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** The whole-operator extension rung (SURVEY §4 ladder step c): a
  * custom band/range join — `left ⋈ right ON key equality AND
  * rTime ∈ (lTime + lo, lTime + hi]` — as a first-class Catalyst
  * citizen: logical node, planner Strategy, physical operator.
  *
  * WHY a custom operator: Spark's builtin planning for a band predicate
  * on top of an equality key is a SortMergeJoin on the key with the
  * band as a post-join filter — every same-key pair is MATERIALIZED
  * before the filter drops it, O(Σ n_k·m_k) per key. This operator
  * declares the same child requirements an SMJ would (hash clustering
  * on the key, (key, time) sort order — so Catalyst/EnsureRequirements
  * still inserts exactly one exchange per side and AQE still re-plans
  * them) but its execution is a per-key sliding-window sweep: both
  * inputs are consumed ONCE, and because left times ascend within a
  * key, the right-side match window [start, end) only ever advances —
  * O(n_k + m_k + matches) per key. At 100 TB the band is selective and
  * the difference is the whole job.
  *
  * Bounds are strict-greater / less-or-equal, the interval-join
  * convention shared with events_interval_join and the streaming
  * purchaseClickJoin.
  *
  * Scope guard: key and time must be LongType (ids and epoch-ns — the
  * repo's event schema); the API entry validates and fails analysis
  * fast rather than planning a silently-wrong sweep.
  *
  * Memory posture: the sweep buffers ONE key's right-side rows (the
  * left side streams) — executor memory bounds the max per-key right
  * cardinality, the same inner-buffer exposure SortMergeJoin has for
  * same-key runs, minus its spilling. For a 100 TB deployment with a
  * hot key, salt the key or pre-aggregate the right side first (the
  * join_salted recipe); a spillable buffer is the next hardening step
  * if profiles ever show it. */
case class RangeJoinPlan(left: LogicalPlan, right: LogicalPlan,
                         keyL: Attribute, keyR: Attribute,
                         timeL: Attribute, timeR: Attribute,
                         lo: Long, hi: Long,
                         pickLatest: Boolean = false) extends BinaryNode {
  // the key/time Attributes are constructor fields, so QueryPlan derives
  // `expressions`/`references` from them automatically — which is what
  // keeps ColumnPruning from stripping them out of the children
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[RangeJoinPlan]] into [[RangeJoinExec]]. Register via
  * `spark.experimental.extraStrategies` ([[RangeJoin.ensureRegistered]])
  * or the GraftExtensions SparkSessionExtensions hook. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, kl, kr, tl, tr, lo, hi, latest) =>
      RangeJoinExec(kl, kr, tl, tr, lo, hi, latest, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(keyL: Attribute, keyR: Attribute,
                         timeL: Attribute, timeR: Attribute,
                         lo: Long, hi: Long, pickLatest: Boolean,
                         left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // same child contract as a SortMergeJoin on the key: one hash
  // exchange per side (EnsureRequirements makes them co-partitioned),
  // sorted within partitions by (key, time) — the sweep's precondition
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(keyL)), ClusteredDistribution(Seq(keyR)))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(keyL, Ascending), SortOrder(timeL, Ascending)),
        Seq(SortOrder(keyR, Ascending), SortOrder(timeR, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val kliOrd = left.output.indexWhere(_.exprId == keyL.exprId)
    val tliOrd = left.output.indexWhere(_.exprId == timeL.exprId)
    val kriOrd = right.output.indexWhere(_.exprId == keyR.exprId)
    val triOrd = right.output.indexWhere(_.exprId == timeR.exprId)
    val outAtts = output
    val (loB, hiB) = (lo, hi)
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      new Iterator[InternalRow] {
        private val proj = UnsafeProjection.create(outAtts, outAtts)
        private val joined = new JoinedRow
        private val lIt = li.buffered
        private val rIt = ri.buffered
        // right rows of the key currently being swept (copied: the
        // child iterator reuses its UnsafeRow)
        private var rTimes: Array[Long] = Array.emptyLongArray
        private var rRows: Array[InternalRow] = Array.empty
        private var curKey: Long = 0L
        private var haveKey = false
        private var lRow: InternalRow = _
        private var lTime = 0L
        private var winStart = 0 // advances monotonically per key
        private var matchIdx = 0
        private var matchEnd = 0

        /** Align both sides on the next key present in BOTH streams and
          * buffer that key's right rows. */
        private def advanceKey(): Boolean = {
          while (lIt.hasNext && rIt.hasNext) {
            val lk = lIt.head.getLong(kliOrd)
            val rk = rIt.head.getLong(kriOrd)
            if (lk < rk) { while (lIt.hasNext && lIt.head.getLong(kliOrd) == lk) lIt.next() }
            else if (rk < lk) { while (rIt.hasNext && rIt.head.getLong(kriOrd) == rk) rIt.next() }
            else {
              curKey = lk
              val ts = scala.collection.mutable.ArrayBuilder.make[Long]
              val rs = scala.collection.mutable.ArrayBuilder.make[InternalRow]
              while (rIt.hasNext && rIt.head.getLong(kriOrd) == curKey) {
                val r = rIt.next()
                ts += r.getLong(triOrd); rs += r.copy()
              }
              rTimes = ts.result(); rRows = rs.result()
              winStart = 0; haveKey = true
              return true
            }
          }
          false
        }

        /** Position matchIdx/matchEnd on the band for the next left row
          * with at least one match; returns false when exhausted. */
        private def advanceLeft(): Boolean = {
          while (true) {
            if (!haveKey && !advanceKey()) return false
            if (!lIt.hasNext || lIt.head.getLong(kliOrd) != curKey) {
              haveKey = false
              if (!advanceKey()) return false
            }
            lRow = lIt.next().copy()
            lTime = lRow.getLong(tliOrd)
            // left times ascend within the key → both bounds advance
            while (winStart < rTimes.length && rTimes(winStart) <= lTime + loB) winStart += 1
            var end = winStart
            while (end < rTimes.length && rTimes(end) <= lTime + hiB) end += 1
            if (end > winStart) {
              // as-of mode: only the latest in-band right row matches
              matchIdx = if (pickLatest) end - 1 else winStart
              matchEnd = end; return true
            }
          }
          false
        }

        private var ready = false
        override def hasNext: Boolean = {
          if (ready) return true
          if (matchIdx < matchEnd) { ready = true; return true }
          ready = advanceLeft()
          ready
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val out = proj(joined(lRow, rRows(matchIdx)))
          matchIdx += 1
          ready = matchIdx < matchEnd
          out
        }
      }
    }
  }
}

object RangeJoin {
  /** Idempotently add the strategy to the session's planner. */
  def ensureRegistered(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(RangeJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ RangeJoinStrategy

  /** User-facing constructor: band join `left ⋈ right` on key equality
    * with `rTime ∈ (lTime + lo, lTime + hi]`. Key/time columns must be
    * LongType and named distinctly across the two sides. */
  /** As-of (backward) variant through the same physical operator: for
    * each left row, ONLY the most recent right row with
    * `rTime ∈ [lTime − maxLag, lTime)` (inner — rows with no match in
    * the lag window drop; compose with a left join for the outer
    * spelling). The sweep picks the last in-band index, so cost is
    * identical to the plain band join. */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyL: String, keyR: String, timeL: String, timeR: String,
               maxLag: Long): DataFrame =
    build(left, right, keyL, keyR, timeL, timeR,
      lo = -maxLag - 1L, hi = -1L, pickLatest = true)

  def rangeJoin(left: DataFrame, right: DataFrame,
                keyL: String, keyR: String, timeL: String, timeR: String,
                lo: Long, hi: Long): DataFrame =
    build(left, right, keyL, keyR, timeL, timeR, lo, hi, pickLatest = false)

  private def build(left: DataFrame, right: DataFrame,
                    keyL: String, keyR: String, timeL: String, timeR: String,
                    lo: Long, hi: Long, pickLatest: Boolean): DataFrame = {
    val s = left.sparkSession
    ensureRegistered(s)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def att(p: LogicalPlan, n: String): Attribute = {
      val a = p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"rangeJoin: no column $n"))
      require(a.dataType == LongType, s"rangeJoin: $n must be LongType, was ${a.dataType}")
      a
    }
    require(lp.output.map(_.name).intersect(rp.output.map(_.name)).isEmpty,
      "rangeJoin: column names must be distinct across sides")
    org.apache.spark.sql.GraftBridge.ofRows(s,
      RangeJoinPlan(lp, rp, att(lp, keyL), att(rp, keyR),
        att(lp, timeL), att(rp, timeR), lo, hi, pickLatest))
  }
}
