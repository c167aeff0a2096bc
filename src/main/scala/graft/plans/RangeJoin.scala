package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy, SpillableRowBuffer}
import org.apache.spark.sql.functions.col
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
  * left side streams) in an [[ExternalAppendOnlyUnsafeRowArray]] — the
  * same spill-capable inner buffer SortMergeJoin uses for same-key
  * runs, governed by the same three confs
  * (`spark.sql.sortMergeJoinExec.buffer.{in.memory.threshold,
  * spill.threshold, spill.size.threshold}`): a hot key larger than the
  * thresholds spills to disk instead of OOMing the executor. The only
  * residual per-key in-memory state is the right-side TIME axis, kept
  * as a primitive Long array because the sweep needs random access to
  * position the window — 8 bytes/row, ~30-100x smaller than the rows
  * it indexes (a 10⁸-row hot key costs 0.8 GB of longs). Beyond that,
  * salt the key (the join_salted recipe). */
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
    // SMJ's own buffer confs, captured on the driver for the closure
    val inMemThreshold = conf.sortMergeJoinExecBufferInMemoryThreshold
    val spillThreshold = conf.sortMergeJoinExecBufferSpillThreshold
    val spillSizeThreshold = conf.sortMergeJoinExecBufferSpillSizeThreshold
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      new Iterator[InternalRow] {
        private val proj = UnsafeProjection.create(outAtts, outAtts)
        private val joined = new JoinedRow
        private val lIt = li.buffered
        private val rIt = ri.buffered
        // right rows of the key currently being swept; add() copies, and
        // past the thresholds the rows spill to disk instead of OOMing
        private val rBuf = new SpillableRowBuffer(
          inMemThreshold, spillThreshold, spillSizeThreshold)
        // the time axis stays a primitive array (random access positions
        // the window) — 8 B/row, the documented residual
        private var rTimes: Array[Long] = Array.emptyLongArray
        private var curKey: Long = 0L
        private var haveKey = false
        private var lRow: InternalRow = _
        private var lTime = 0L
        private var winStart = 0 // advances monotonically per key
        private var matchIter: Iterator[UnsafeRow] = Iterator.empty
        private var remaining = 0

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
              rBuf.clear()
              while (rIt.hasNext && rIt.head.getLong(kriOrd) == curKey) {
                val r = rIt.next()
                ts += r.getLong(triOrd)
                // sorted children emit UnsafeRows; add() copies into the
                // in-memory buffer or the spill-capable sorter
                rBuf.add(r.asInstanceOf[UnsafeRow])
              }
              rTimes = ts.result()
              winStart = 0; haveKey = true
              return true
            }
          }
          false
        }

        /** Position the match window for the next left row with at least
          * one in-band right row; returns false when exhausted. lRow is
          * NOT copied: the child iterator's reused row is only
          * overwritten by the next lIt.head/next(), which happens after
          * this row's matches are fully emitted. */
        private def advanceLeft(): Boolean = {
          while (true) {
            if (!haveKey && !advanceKey()) return false
            if (!lIt.hasNext || lIt.head.getLong(kliOrd) != curKey) {
              haveKey = false
              if (!advanceKey()) return false
            }
            lRow = lIt.next()
            lTime = lRow.getLong(tliOrd)
            // left times ascend within the key → both bounds advance
            while (winStart < rTimes.length && rTimes(winStart) <= lTime + loB) winStart += 1
            var end = winStart
            while (end < rTimes.length && rTimes(end) <= lTime + hiB) end += 1
            if (end > winStart) {
              // as-of mode: only the latest in-band right row matches
              val from = if (pickLatest) end - 1 else winStart
              matchIter = rBuf.iteratorFrom(from)
              remaining = end - from
              return true
            }
          }
          false
        }

        override def hasNext: Boolean = remaining > 0 || advanceLeft()
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val out = proj(joined(lRow, matchIter.next()))
          remaining -= 1
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
    def check(df: DataFrame, n: String): Unit = {
      val f = df.schema.fields.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"rangeJoin: no column $n"))
      require(f.dataType == LongType, s"rangeJoin: $n must be LongType, was ${f.dataType}")
    }
    check(left, keyL); check(left, timeL); check(right, keyR); check(right, timeR)
    require(left.columns.intersect(right.columns).isEmpty,
      "rangeJoin: column names must be distinct across sides")
    // SQL join semantics: NULL keys/times never match. The sweep reads
    // key/time with getLong, which would surface NULL storage as 0 and
    // equi-match genuine key-0 rows — so nullable inputs get an
    // isNotNull filter on both columns up front (inner/as-of inner
    // semantics make dropping those rows exactly correct).
    def dropNulls(df: DataFrame, k: String, t: String): DataFrame =
      if (df.schema(k).nullable || df.schema(t).nullable)
        df.filter(col(k).isNotNull && col(t).isNotNull)
      else df
    val lp = dropNulls(left, keyL, timeL).queryExecution.analyzed
    val rp = dropNulls(right, keyR, timeR).queryExecution.analyzed
    def att(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).get
    org.apache.spark.sql.GraftBridge.ofRows(s,
      RangeJoinPlan(lp, rp, att(lp, keyL), att(rp, keyR),
        att(lp, timeL), att(rp, timeR), lo, hi, pickLatest))
  }
}
