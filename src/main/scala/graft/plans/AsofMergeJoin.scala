package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native merge-shaped execution for the dialect layer's `ASOF JOIN`
  * rewrite (reference passthrough surface,
  * `/root/reference/filefilter.py:340-342`; VERDICT r12 next-round #1).
  *
  * [[graft.operators.GraftSqlParser.rewriteAsof]] turns `ASOF JOIN` into
  * a validity-interval join: `lead(ts) OVER (PARTITION BY keys)` on the
  * right side, then an equi-join bounded by the helper column. That is
  * CORRECT but its execution shape pays a window sort over the right
  * side, a hash-relation build of every right row, and a per-candidate-
  * pair filter inside the join — per equal-key group it is
  * O(|left| · |right|) comparisons, the quadratic hot-key risk at 100 TB.
  *
  * [[AsofMergeStrategy]] recognizes that rewrite's fingerprint at
  * planning time (a join condition referencing a generated
  * `__graft_asof_end_N` attribute produced by a lead/lag Window directly
  * under the join's right side), strips the Window, and plans
  * [[AsofMergeJoinExec]] instead: both sides hash-clustered on the equi
  * keys and locally sorted by (keys, ts) — Spark's EnsureRequirements
  * inserts the exchanges and sorts, exactly as for a sort-merge join —
  * then a single forward pass per partition pairs each left row with the
  * extremal right row by two-pointer merge. Cost per partition is
  * O(n + m) after the sort, no pair blow-up on hot keys, no broadcast,
  * no window. Semantics are identical to the interval rewrite (gate
  * q99 hash-checks both against DuckDB's native ASOF JOIN):
  *
  *  - backward (`right.ts <= / < left.ts`): latest earlier right row;
  *    ties on the right timestamp keep the last row in sort order, the
  *    same survivor the lead-window's empty-interval collapse picks;
  *  - forward (`right.ts >= / > left.ts`): earliest later right row;
  *  - NULL left key or NULL timestamp never matches (null-extended
  *    under `ASOF LEFT JOIN`, dropped under inner); NULL right
  *    timestamps never match — all exactly the comparison-yields-NULL
  *    behavior of the interval join;
  *  - the helper attribute is still part of the logical join's output
  *    (the wrap projection above discards it); the exec emits NULL for
  *    it, which no surviving operator can observe since the name is
  *    generated and the rewrite either EXCEPT-wraps it away or the user
  *    query never references it.
  *
  * Anything the extractor cannot classify — extra residual conjuncts, a
  * helper that is not the last right-output attribute, a right subtree
  * whose Window cannot be stripped — returns Nil and Spark falls back to
  * the interval-join plan, so the strategy can only improve the shape,
  * never change results.
  */
object AsofMergeStrategy extends SparkStrategy with PredicateHelper {

  private val HelperPrefix = "__graft_asof_end_"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: Join
        if (j.joinType == Inner || j.joinType == LeftOuter) &&
          j.condition.exists(_.references.exists(_.name.startsWith(HelperPrefix))) =>
      extract(j).toSeq
    case _ => Nil
  }

  private def extract(j: Join): Option[SparkPlan] = {
    val helpers = j.right.output.filter(_.name.startsWith(HelperPrefix))
    if (helpers.size != 1 || j.right.output.last.exprId != helpers.head.exprId)
      return None
    val helper = helpers.head
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val leftSet = j.left.outputSet
    val rightSet = j.right.outputSet

    var leftKeys = Vector.empty[Expression]
    var rightKeys = Vector.empty[Expression]
    // (rightTs, leftTs, forward, strict)
    var ineq: Option[(Expression, Expression, Boolean, Boolean)] = None
    var sawHelperBound = false

    def sideOf(e: Expression): Int = { // 0 left, 1 right, -1 mixed/none
      val r = e.references
      if (r.isEmpty) -1
      else if (r.subsetOf(leftSet)) 0
      else if (r.subsetOf(rightSet)) 1
      else -1
    }

    conjuncts.foreach {
      case e if e.references.contains(helper) =>
        // the interval upper bound — semantics the merge implements natively
        sawHelperBound = true
      case EqualTo(a, b) if sideOf(a) == 0 && sideOf(b) == 1 =>
        leftKeys :+= a; rightKeys :+= b
      case EqualTo(a, b) if sideOf(a) == 1 && sideOf(b) == 0 =>
        leftKeys :+= b; rightKeys :+= a
      case cmp: BinaryComparison if ineq.isEmpty &&
          ((sideOf(cmp.left) == 1 && sideOf(cmp.right) == 0) ||
           (sideOf(cmp.left) == 0 && sideOf(cmp.right) == 1)) =>
        val rightFirst = sideOf(cmp.left) == 1
        val (r, l) = if (rightFirst) (cmp.left, cmp.right) else (cmp.right, cmp.left)
        // normalize to r OP l with OP in {<=, <, >=, >}
        val norm = cmp match {
          case _: LessThanOrEqual => Some(if (rightFirst) ("<=") else (">="))
          case _: LessThan => Some(if (rightFirst) ("<") else (">"))
          case _: GreaterThanOrEqual => Some(if (rightFirst) (">=") else ("<="))
          case _: GreaterThan => Some(if (rightFirst) (">") else ("<"))
          case _ => None
        }
        norm match {
          case Some(op) =>
            ineq = Some((r, l, op == ">=" || op == ">", op == "<" || op == ">"))
          case None => return None
        }
      case _ => return None
    }
    if (!sawHelperBound || ineq.isEmpty || leftKeys.isEmpty) return None
    val (rightTs, leftTs, forward, strict) = ineq.get
    if (rightTs.references.contains(helper)) return None
    if (!RowOrdering.isOrderable(leftKeys) || !RowOrdering.isOrderable(Seq(leftTs)))
      return None

    stripHelper(j.right, helper).map { stripped =>
      // Mirror Spark's own ShuffledHashJoin-vs-SortMergeJoin selection
      // (JoinSelection.canBuildLocalHashMapBySize): a right side whose
      // per-partition slice fits a local map skips BOTH SortExecs — at
      // the bench SF the global (key, ts) record-comparator sorts are
      // the whole stage cost. Larger right sides take the sorted-merge
      // exec, which holds only one candidate row at a time.
      val conf = org.apache.spark.sql.internal.SQLConf.get
      val hashable = conf.autoBroadcastJoinThreshold > 0 &&
        stripped.stats.sizeInBytes >= 0 &&
        stripped.stats.sizeInBytes <
          conf.autoBroadcastJoinThreshold * conf.numShufflePartitions
      if (hashable)
        AsofHashJoinExec(j.output, leftKeys, rightKeys, leftTs, rightTs,
          forward, strict, j.joinType == LeftOuter,
          planLater(j.left), planLater(stripped))
      else
        AsofMergeJoinExec(j.output, leftKeys, rightKeys, leftTs, rightTs,
          forward, strict, j.joinType == LeftOuter,
          planLater(j.left), planLater(stripped))
    }
  }

  /** Remove the Window (and any Project slots) producing the helper from
    * the right subtree; None if the subtree has a shape we don't own.
    */
  private def stripHelper(p: LogicalPlan, helper: Attribute): Option[LogicalPlan] =
    p match {
      case w: Window if w.windowExpressions.exists(_.toAttribute.exprId == helper.exprId) =>
        val isLeadLag = w.windowExpressions.forall {
          case a: Alias if a.exprId == helper.exprId =>
            a.child.collectFirst { case _: Lead => (); case _: Lag => () }.isDefined
          case _ => true
        }
        if (!isLeadLag) None
        else if (w.windowExpressions.size == 1) Some(w.child)
        else Some(w.copy(windowExpressions =
          w.windowExpressions.filterNot(_.toAttribute.exprId == helper.exprId)))
      case pr: Project if pr.projectList.exists(_.toAttribute.exprId == helper.exprId) =>
        stripHelper(pr.child, helper).map { c =>
          Project(pr.projectList.filterNot(_.toAttribute.exprId == helper.exprId), c)
        }
      case f: Filter if !f.condition.references.contains(helper) =>
        stripHelper(f.child, helper).map(c => f.copy(child = c))
      case _ => None
    }
}

/** Shared primitive-path helpers for the as-of execs. */
private[plans] object AsofPrim {
  /** Ordinal of `e` in `out` when it is a direct attribute of an
    * integral-internal type (long/int-backed — bigint, int, date, both
    * timestamp flavors), else -1. Gates the primitive loops: the
    * generic paths pay ~0.5 µs/row in projection + ordering dispatch,
    * which at the bench SF is the whole stage cost.
    */
  def primOrdinal(e: Expression, out: Seq[Attribute]): Int = e match {
    case a: AttributeReference
        if a.dataType.isInstanceOf[org.apache.spark.sql.types.LongType] ||
           a.dataType.isInstanceOf[org.apache.spark.sql.types.IntegerType] ||
           a.dataType.isInstanceOf[org.apache.spark.sql.types.DateType] ||
           a.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
           a.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType] =>
      out.indexWhere(_.exprId == a.exprId)
    case _ => -1
  }

  def isLongBacked(e: Expression): Boolean = e.dataType match {
    case _: org.apache.spark.sql.types.LongType |
         _: org.apache.spark.sql.types.TimestampType |
         _: org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  /** In-place quicksort of the parallel (ts, row) arrays by ts — a
    * primitive dual-array sort so per-key group ordering never touches
    * a boxed comparator. Insertion sort below 16 elements (the common
    * per-key group size).
    */
  def sortByTs(ts: Array[Long], rows: Array[InternalRow], lo0: Int, hi0: Int): Unit = {
    if (hi0 - lo0 < 16) {
      var i = lo0 + 1
      while (i <= hi0) {
        val t = ts(i); val r = rows(i)
        var j = i - 1
        while (j >= lo0 && ts(j) > t) { ts(j + 1) = ts(j); rows(j + 1) = rows(j); j -= 1 }
        ts(j + 1) = t; rows(j + 1) = r
        i += 1
      }
    } else {
      val pivot = ts(lo0 + (hi0 - lo0) / 2)
      var i = lo0; var j = hi0
      while (i <= j) {
        while (ts(i) < pivot) i += 1
        while (ts(j) > pivot) j -= 1
        if (i <= j) {
          val t = ts(i); ts(i) = ts(j); ts(j) = t
          val r = rows(i); rows(i) = rows(j); rows(j) = r
          i += 1; j -= 1
        }
      }
      if (lo0 < j) sortByTs(ts, rows, lo0, j)
      if (i < hi0) sortByTs(ts, rows, i, hi0)
    }
  }
}

/** Shuffled-hash as-of join — the small-right-side path, the analogue of
  * Spark's ShuffledHashJoinExec. Both sides are hash-clustered on the
  * equi keys (one exchange each, NO SortExec on either side — at small
  * SFs the two-column record-comparator sorts dominate the sort-merge
  * plan's CPU); each partition builds a key -> timestamp-sorted array
  * index of its right slice, then streams the left side through a hash
  * probe + binary search. Per-key group sorts replace the global sort:
  * sum of g·log g over groups instead of n·log n over the partition.
  * Memory holds the right PARTITION slice (the same constraint Spark
  * accepts for ShuffledHashJoin), which is why [[AsofMergeStrategy]]
  * only picks this exec under the JoinSelection
  * `canBuildLocalHashMapBySize` bound and keeps [[AsofMergeJoinExec]]
  * as the unbounded-scale default. Tie semantics match the merge exec:
  * backward keeps the LAST duplicate timestamp in array order, forward
  * the FIRST — the same survivors the lead/lag interval rewrite picks.
  */
case class AsofHashJoinExec(
    output: Seq[Attribute],
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean,
    strict: Boolean,
    isLeftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def nodeName: String = "AsofHashJoin"

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val fwd = forward
    val str = strict
    val outer = isLeftOuter
    val outAttrs = output
    // primitive fast path: single integral key + integral ts on both sides
    val lKeyOrd = if (lKeyExprs.size == 1) AsofPrim.primOrdinal(lKeyExprs.head, lOut) else -1
    val rKeyOrd = if (rKeyExprs.size == 1) AsofPrim.primOrdinal(rKeyExprs.head, rOut) else -1
    val lTsOrdNo = AsofPrim.primOrdinal(lTsExpr, lOut)
    val rTsOrdNo = AsofPrim.primOrdinal(rTsExpr, rOut)
    val primitive = lKeyOrd >= 0 && rKeyOrd >= 0 && lTsOrdNo >= 0 && rTsOrdNo >= 0
    val keyLong = primitive && AsofPrim.isLongBacked(lKeyExprs.head)
    val tsLong = primitive && AsofPrim.isLongBacked(lTsExpr)
    if (primitive) {
      return left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        // ---- build: boxed-Long-keyed map of growing (long ts, row) arrays
        final class Grp {
          var ts = new Array[Long](8)
          var rows = new Array[InternalRow](8)
          var n = 0
          def add(t: Long, r: InternalRow): Unit = {
            if (n == ts.length) {
              ts = java.util.Arrays.copyOf(ts, n * 2)
              rows = java.util.Arrays.copyOf(rows, n * 2)
            }
            ts(n) = t; rows(n) = r; n += 1
          }
        }
        val index = new java.util.HashMap[java.lang.Long, Grp]()
        while (rIter.hasNext) {
          val row = rIter.next()
          if (!row.isNullAt(rKeyOrd) && !row.isNullAt(rTsOrdNo)) {
            val k = java.lang.Long.valueOf(
              if (keyLong) row.getLong(rKeyOrd) else row.getInt(rKeyOrd).toLong)
            var g = index.get(k)
            if (g == null) { g = new Grp; index.put(k, g) }
            g.add(if (tsLong) row.getLong(rTsOrdNo) else row.getInt(rTsOrdNo).toLong,
              row.copy())
          }
        }
        val git = index.values().iterator()
        while (git.hasNext) {
          val g = git.next()
          if (g.n > 1) AsofPrim.sortByTs(g.ts, g.rows, 0, g.n - 1)
        }
        // ---- probe
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joinL = new JoinedRow
        val joinR = new JoinedRow
        val helperNull = new GenericInternalRow(1)
        val rightNulls = new GenericInternalRow(rOut.size + 1)
        lIter.flatMap { l =>
          var matched: InternalRow = null
          if (!l.isNullAt(lKeyOrd) && !l.isNullAt(lTsOrdNo)) {
            val g = index.get(java.lang.Long.valueOf(
              if (keyLong) l.getLong(lKeyOrd) else l.getInt(lKeyOrd).toLong))
            if (g != null) {
              val lTs = if (tsLong) l.getLong(lTsOrdNo) else l.getInt(lTsOrdNo).toLong
              var lo = 0
              var hi = g.n
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                val below = if (fwd) (if (str) g.ts(mid) <= lTs else g.ts(mid) < lTs)
                            else (if (str) g.ts(mid) < lTs else g.ts(mid) <= lTs)
                if (below) lo = mid + 1 else hi = mid
              }
              if (fwd) { if (lo < g.n) matched = g.rows(lo) }
              else { if (lo > 0) matched = g.rows(lo - 1) }
            }
          }
          if (matched != null) {
            numOutputRows += 1
            Iterator.single(resultProj(joinL(l, joinR(matched, helperNull))))
          } else if (outer) {
            numOutputRows += 1
            Iterator.single(resultProj(joinL(l, rightNulls)))
          } else Iterator.empty
        }
      }
    }
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rKeyGen = UnsafeProjection.create(rKeyExprs, rOut)
      val rTsGen = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(rTsExpr.dataType))
      // ---- build: key -> ts-sorted (tsRow, row) arrays
      val built = new java.util.HashMap[InternalRow,
        scala.collection.mutable.ArrayBuffer[(UnsafeRow, InternalRow)]]()
      while (rIter.hasNext) {
        val row = rIter.next()
        val k = rKeyGen(row)
        val t = rTsGen(row)
        if (!k.anyNull && !t.isNullAt(0)) {
          var buf = built.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty
            built.put(k.copy(), buf)
          }
          buf.append((t.copy(), row.copy()))
        }
      }
      val index = new java.util.HashMap[InternalRow, (Array[UnsafeRow], Array[InternalRow])](
        built.size() * 2)
      val bit = built.entrySet().iterator()
      while (bit.hasNext) {
        val e = bit.next()
        val sorted = e.getValue.sortWith((a, b) => tsOrd.compare(a._1, b._1) < 0)
        index.put(e.getKey, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
      }
      built.clear()
      // ---- probe
      val lKeyGen = UnsafeProjection.create(lKeyExprs, lOut)
      val lTsGen = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joinL = new JoinedRow
      val joinR = new JoinedRow
      val helperNull = new GenericInternalRow(1)
      val rightNulls = new GenericInternalRow(rOut.size + 1)
      lIter.flatMap { l =>
        val lKey = lKeyGen(l)
        val lTsRow = lTsGen(l)
        var matched: InternalRow = null
        if (!lKey.anyNull && !lTsRow.isNullAt(0)) {
          val grp = index.get(lKey)
          if (grp != null) {
            val (tss, rows) = grp
            var lo = 0
            var hi = tss.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              val c = tsOrd.compare(tss(mid), lTsRow)
              val below = if (fwd) (if (str) c <= 0 else c < 0)
                          else (if (str) c < 0 else c <= 0)
              if (below) lo = mid + 1 else hi = mid
            }
            if (fwd) { if (lo < tss.length) matched = rows(lo) }
            else { if (lo > 0) matched = rows(lo - 1) }
          }
        }
        if (matched != null) {
          numOutputRows += 1
          Iterator.single(resultProj(joinL(l, joinR(matched, helperNull))))
        } else if (outer) {
          numOutputRows += 1
          Iterator.single(resultProj(joinL(l, rightNulls)))
        } else Iterator.empty
      }
    }
  }
}

/** Per-partition two-pointer as-of merge. Children are hash-clustered on
  * the equi keys and sorted by (keys, ts) — the same contract as
  * SortMergeJoinExec, enforced by EnsureRequirements — so each partition
  * holds complete key groups on both sides in merge order and one linear
  * pass pairs every left row with its extremal right row. `output` is
  * the ORIGINAL logical join output (right side ends with the stripped
  * `__graft_asof_end_N` helper, emitted as NULL — see
  * [[AsofMergeStrategy]] for why that is unobservable).
  */
case class AsofMergeJoinExec(
    output: Seq[Attribute],
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean,
    strict: Boolean,
    isLeftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def nodeName: String = "AsofMergeJoin"

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val fwd = forward
    val str = strict
    val outer = isLeftOuter
    val outAttrs = output
    // primitive fast path: single integral key + integral ts on both sides
    val lKeyOrd = if (lKeyExprs.size == 1) AsofPrim.primOrdinal(lKeyExprs.head, lOut) else -1
    val rKeyOrd = if (rKeyExprs.size == 1) AsofPrim.primOrdinal(rKeyExprs.head, rOut) else -1
    val lTsOrd = AsofPrim.primOrdinal(lTsExpr, lOut)
    val rTsOrd = AsofPrim.primOrdinal(rTsExpr, rOut)
    val primitive = lKeyOrd >= 0 && rKeyOrd >= 0 && lTsOrd >= 0 && rTsOrd >= 0
    val keyLong = primitive && AsofPrim.isLongBacked(lKeyExprs.head)
    val tsLong = primitive && AsofPrim.isLongBacked(lTsExpr)
    if (primitive) {
      return left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joinL = new JoinedRow
        val joinR = new JoinedRow
        val helperNull = new GenericInternalRow(1)
        val rightNulls = new GenericInternalRow(rOut.size + 1)
        def lKeyAt(r: InternalRow): Long = if (keyLong) r.getLong(lKeyOrd) else r.getInt(lKeyOrd).toLong
        def rKeyAt(r: InternalRow): Long = if (keyLong) r.getLong(rKeyOrd) else r.getInt(rKeyOrd).toLong
        def lTsAt(r: InternalRow): Long = if (tsLong) r.getLong(lTsOrd) else r.getInt(lTsOrd).toLong
        def rTsAt(r: InternalRow): Long = if (tsLong) r.getLong(rTsOrd) else r.getInt(rTsOrd).toLong

        var rRow: InternalRow = null
        var rKeyNull = false; var rKey = 0L
        var rTsNull = false; var rTs = 0L
        def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKeyNull = rRow.isNullAt(rKeyOrd)
            rKey = if (rKeyNull) 0L else rKeyAt(rRow)
            rTsNull = rRow.isNullAt(rTsOrd)
            rTs = if (rTsNull) 0L else rTsAt(rRow)
          } else rRow = null
        advanceRight()

        var candRow: InternalRow = null
        var candKey = 0L

        new Iterator[InternalRow] {
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            var out: InternalRow = null
            while (out == null && lIter.hasNext) {
              val l = lIter.next()
              if (l.isNullAt(lKeyOrd) || l.isNullAt(lTsOrd)) {
                if (outer) out = resultProj(joinL(l, rightNulls))
              } else {
                val lKey = lKeyAt(l)
                val lTs = lTsAt(l)
                if (!fwd) {
                  if (candRow != null && candKey != lKey) candRow = null
                  var scan = true
                  while (scan && rRow != null) {
                    val take = rKeyNull || rKey < lKey || (rKey == lKey &&
                      (rTsNull || (if (str) rTs < lTs else rTs <= lTs)))
                    if (take) {
                      if (!rKeyNull && rKey == lKey && !rTsNull) {
                        candRow = rRow.copy(); candKey = rKey
                      }
                      advanceRight()
                    } else scan = false
                  }
                  if (candRow != null && candKey == lKey)
                    out = resultProj(joinL(l, joinR(candRow, helperNull)))
                  else if (outer) out = resultProj(joinL(l, rightNulls))
                } else {
                  var scan = true
                  while (scan && rRow != null) {
                    val skip = rKeyNull || rKey < lKey || (rKey == lKey &&
                      (rTsNull || (if (str) rTs <= lTs else rTs < lTs)))
                    if (skip) advanceRight() else scan = false
                  }
                  if (rRow != null && !rKeyNull && rKey == lKey)
                    out = resultProj(joinL(l, joinR(rRow, helperNull)))
                  else if (outer) out = resultProj(joinL(l, rightNulls))
                }
              }
              if (out != null) numOutputRows += 1
            }
            out
          }
        }.filter(_ != null)
      }
    }
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyGen = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsGen = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsGen = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsExpr.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joinL = new JoinedRow
      val joinR = new JoinedRow
      val helperNull = new GenericInternalRow(1)
      // null extension covers the stripped right columns AND the helper
      val rightNulls = new GenericInternalRow(rOut.size + 1)

      // rolling right head (projections reuse buffers: candidate copies)
      var rRow: InternalRow = null
      var rKey: UnsafeRow = null
      var rTsRow: UnsafeRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next()
          rKey = rKeyGen(rRow)
          rTsRow = rTsGen(rRow)
        } else rRow = null
      advanceRight()

      var candRow: InternalRow = null
      var candKey: InternalRow = null

      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          var out: InternalRow = null
          while (out == null && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyGen(l)
            val lTsRow = lTsGen(l)
            if (lKey.anyNull || lTsRow.isNullAt(0)) {
              if (outer) out = resultProj(joinL(l, rightNulls))
            } else {
              if (!fwd) {
                // backward: latest right with ts <= (or <) left ts
                if (candKey != null && keyOrd.compare(candKey, lKey) != 0) {
                  candRow = null; candKey = null
                }
                var scan = true
                while (scan && rRow != null) {
                  val kc = keyOrd.compare(rKey, lKey)
                  val take = kc < 0 || (kc == 0 && (rTsRow.isNullAt(0) || {
                    val tc = tsOrd.compare(rTsRow, lTsRow)
                    if (str) tc < 0 else tc <= 0
                  }))
                  if (take) {
                    if (kc == 0 && !rTsRow.isNullAt(0)) {
                      candRow = rRow.copy(); candKey = rKey.copy()
                    }
                    advanceRight()
                  } else scan = false
                }
                if (candRow != null && keyOrd.compare(candKey, lKey) == 0)
                  out = resultProj(joinL(l, joinR(candRow, helperNull)))
                else if (outer) out = resultProj(joinL(l, rightNulls))
              } else {
                // forward: earliest right with ts >= (or >) left ts
                var scan = true
                while (scan && rRow != null) {
                  val kc = keyOrd.compare(rKey, lKey)
                  val skip = kc < 0 || (kc == 0 && (rTsRow.isNullAt(0) || {
                    val tc = tsOrd.compare(rTsRow, lTsRow)
                    if (str) tc <= 0 else tc < 0
                  }))
                  if (skip) advanceRight() else scan = false
                }
                if (rRow != null && keyOrd.compare(rKey, lKey) == 0)
                  out = resultProj(joinL(l, joinR(rRow, helperNull)))
                else if (outer) out = resultProj(joinL(l, rightNulls))
              }
            }
            if (out != null) numOutputRows += 1
          }
          out
        }
      }.filter(_ != null)
    }
  }
}
