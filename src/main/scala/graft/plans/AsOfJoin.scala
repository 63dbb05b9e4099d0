package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeMap, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{LongType, TimestampType}

/** AS-OF JOIN as a first-class operator — the whole custom-operator ladder
  * (SURVEY §4 preference (c)): a logical node, a resolution [[Rule]], a
  * planner [[SparkStrategy]], and a sort-merge [[SparkPlan]], injected via
  * `SparkSessionExtensions` ([[GraftExtensions]]), reachable from both the
  * DataFrame API ([[AsOf.join]]) and SQL (`asof_join(...)` table function).
  *
  * Semantics (inner as-of, `direction = "backward"`): for each left row,
  * the single right row with the same key and the greatest `(rightTime,
  * rightTie)` among rows with `rightTime <= leftTime`; left rows with no
  * qualifying right row are dropped. The left-outer variant keeps them,
  * right columns null — the telemetry-enrichment shape ("last config
  * change before this flow, if any"). This is exactly the reference shape
  * `q18_join_asof` computes as range-join + per-key `row_number() = 1`
  * (`ops/CoreQueries.scala` Q18, after reference query patterns over
  * ClickHouse `flows` — see `/root/reference/initdb/create_tables.sql:1-33`
  * for the time-keyed schema such joins run over).
  *
  * `direction = "forward"` flips the inequality: the single right row with
  * the LEAST `(rightTime, rightTie)` among rows with `rightTime >=
  * leftTime` ("next deploy after this error"). `direction = "nearest"`
  * takes whichever of the backward and forward matches is closer in time,
  * ties broken toward backward. An optional `tolerance` (a non-negative
  * long, in the time column's own unit — microseconds for TIMESTAMP)
  * bounds `|leftTime - rightTime|`; matches farther than the tolerance are
  * discarded (the row then drops under inner / null-pads under left
  * outer). All three directions run in the same single merge pass with
  * O(1) state: forward needs only a peek at the not-yet-consumed head,
  * nearest combines that peek with backward's one-row state.
  *
  * WHY an operator: the compositional plan materializes EVERY qualifying
  * (left, right) pair before the window discards all but one — per-key
  * quadratic blow-up at scale. The merge formulation is one pass over each
  * side, sorted: shuffle by key, sort by (key, time), and stream — the
  * same cost shape as a sort-merge equi-join, with O(1) state (the current
  * best match) beyond the iterators.
  *
  * Scope, by declaration: key/time/tie expressions must be Long-backed
  * (BIGINT or TIMESTAMP — both stored as a long) and nulls never match
  * (null-keyed/timed left rows drop under inner, null-pad under left
  * outer; right rows with null key/time are skipped).
  */
final case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, leftOuter: Boolean = false,
    direction: String = AsOfJoin.Backward,
    tolerance: Long = AsOfJoin.NoTolerance) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  // duplicate exprIds across sides stay UNRESOLVED: Spark's
  // DeduplicateRelations never fires for a custom node, and
  // UnsafeProjection would silently bind each duplicate to its first
  // occurrence (right columns returning left values). AsOfDeduplicateRight
  // re-aliases the right side during analysis; if it cannot (expressions
  // not yet resolved), analysis fails on the unresolved operator rather
  // than producing wrong results.
  override lazy val resolved: Boolean = childrenResolved &&
    Seq(leftKey, rightKey, leftTime, rightTime, rightTie).forall { e =>
      e.resolved && (e.dataType == LongType || e.dataType == TimestampType)
    } && left.outputSet.intersect(right.outputSet).isEmpty

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  val Backward = "backward"
  val Forward = "forward"
  val Nearest = "nearest"
  val Directions: Set[String] = Set(Backward, Forward, Nearest)
  /** Sentinel: any negative tolerance means "unbounded". */
  val NoTolerance: Long = -1L

  def validateDirection(direction: String): Unit =
    require(Directions.contains(direction),
      s"asof_join: direction must be one of ${Directions.mkString("'", "', '", "'")}, " +
        s"got '$direction'")
}

/** Analysis-time exprId dedup for [[AsOfJoin]] (the custom-node analogue
  * of DeduplicateRelations): a self-join, or any join whose sides share
  * lineage, puts the same exprIds in both outputs — re-alias every right
  * column with fresh exprIds and remap the right-side key/time/tie onto
  * them. Injected as a resolution rule so BOTH entry surfaces (DataFrame
  * API and the `asof_join` SQL table function) pass through it.
  */
object AsOfDeduplicateRight extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Case A: both outputs still overlap (DeduplicateRelations has not —
    // or cannot — re-instance the right side): re-alias every right column
    // with fresh exprIds and remap the right-side expressions onto them.
    case j @ AsOfJoin(l, r, _, rk, _, rt, tie, _, _, _)
        if j.childrenResolved && j.expressions.forall(_.resolved) &&
          l.outputSet.intersect(r.outputSet).nonEmpty =>
      val aliases = r.output.map(a => Alias(a, a.name)())
      val mapping = AttributeMap(r.output.zip(aliases.map(_.toAttribute)))
      def remap(e: Expression): Expression = e.transform {
        case a: Attribute => mapping.getOrElse(a, a)
      }
      j.copy(right = Project(aliases, r),
        rightKey = remap(rk), rightTime = remap(rt), rightTie = remap(tie))

    // Case B: Spark's DeduplicateRelations re-instanced the right subtree
    // (it handles conflicting leaf relations for ANY node) but knows
    // nothing of this node's expressions — rightKey/rightTime/rightTie
    // still carry the PRE-dedup exprIds. Remap each stale reference onto
    // the right output attribute with the same (unique) name: on the
    // DataFrame API path those expressions were resolved against the right
    // side by construction, so the name is faithful; anything that stays
    // stale falls through to the planner's side-containment error.
    case j @ AsOfJoin(l, r, _, rk, _, rt, tie, _, _, _)
        if j.childrenResolved && j.expressions.forall(_.resolved) &&
          l.outputSet.intersect(r.outputSet).isEmpty &&
          !Seq(rk, rt, tie).forall(_.references.subsetOf(r.outputSet)) &&
          Seq(rk, rt, tie).exists(_.references.subsetOf(l.outputSet)) =>
      val byName = r.output.groupBy(_.name)
      def remap(e: Expression): Expression = e.transform {
        case a: Attribute if !r.outputSet.contains(a) && l.outputSet.contains(a) =>
          byName.get(a.name) match {
            case Some(Seq(only)) => only
            case _ => a
          }
      }
      val repaired = j.copy(rightKey = remap(rk), rightTime = remap(rt),
        rightTie = remap(tie))
      if (repaired != j) repaired else j
  }
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy`. Side containment is validated here with a
  * clear error — the SQL surface resolves key names against both children,
  * so a key accidentally naming a column of the OTHER side must fail
  * loudly, not at BindReferences depth.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie, leftOuter, direction, tolerance) =>
      def contained(what: String, e: Expression, side: LogicalPlan): Unit =
        require(e.references.subsetOf(side.outputSet),
          s"asof_join: $what (${e.sql}) must reference only its own side's columns")
      contained("left key", lk, l); contained("left time", lt, l)
      contained("right key", rk, r); contained("right time", rt, r)
      contained("right tie", tie, r)
      AsOfJoin.validateDirection(direction)
      AsOfJoinExec(lk, rk, lt, rt, tie, leftOuter, direction, tolerance,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Declares the same child contract as
  * SortMergeJoinExec — clustered distribution on the key (EnsureRequirements
  * inserts co-partitioned exchanges) and per-partition ordering by
  * (key, time[, tie]) (EnsureRequirements inserts sorts) — then streams
  * both sorted sides once per partition, carrying only the current best
  * match as state.
  */
final case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, leftOuter: Boolean,
    direction: String, tolerance: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  // emitted in left order; keyed partitioning passes through
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head
  override def outputPartitioning = left.outputPartitioning

  /** Per-row long extraction without boxing for the common bound-attribute
    * case; generic expressions fall back to one `eval` per row, stashed so
    * `get` never re-evaluates. Contract: `isNull(r)` then `get(r)` on the
    * SAME row, single-threaded — instantiate per partition.
    */
  private abstract class LongAcc extends Serializable {
    def isNull(r: InternalRow): Boolean
    def get(r: InternalRow): Long
  }

  private def longAcc(e: Expression): LongAcc = e match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference =>
      new LongAcc {
        override def isNull(r: InternalRow): Boolean = r.isNullAt(b.ordinal)
        override def get(r: InternalRow): Long = r.getLong(b.ordinal)
      }
    case other => new LongAcc {
      private[this] var v: java.lang.Long = null
      override def isNull(r: InternalRow): Boolean = {
        v = other.eval(r).asInstanceOf[java.lang.Long]
        v == null
      }
      override def get(r: InternalRow): Long = v.longValue()
    }
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val schema = output
    val leftOut = left.output
    // the projection's input schema must declare right columns nullable
    // under left-outer — a non-nullable input attr lets codegen skip the
    // null check and read garbage from the all-null pad row
    val rightOut =
      if (leftOuter) right.output.map(_.withNullability(true)) else right.output
    val outer = leftOuter
    // 0 = backward, 1 = forward, 2 = nearest — primitive compare in the loop
    val dir = direction match {
      case AsOfJoin.Backward => 0
      case AsOfJoin.Forward => 1
      case AsOfJoin.Nearest => 2
    }
    val tol = tolerance
    val lRdd = left.execute()
    val rRdd = right.execute()
    // EnsureRequirements aligns partition counts when it plans BOTH
    // exchanges, but a child whose existing partitioning already satisfies
    // the distribution with a different count (e.g. a bucketed scan) would
    // zip wrong rows together — fail loudly, never join across keys
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec children must be co-partitioned: left has " +
        s"${lRdd.getNumPartitions} partitions, right has ${rRdd.getNumPartitions}")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val resultProj = UnsafeProjection.create(schema, leftOut ++ rightOut)
        private val nullRight = new GenericInternalRow(rightOut.length)
        private val rBuf = rIter.buffered
        // per-partition primitive accessors — zero boxing on the
        // bound-attribute fast path, one eval per row otherwise
        private val lkA = longAcc(lk)
        private val ltA = longAcc(lt)
        private val rkA = longAcc(rk)
        private val rtA = longAcc(rt)
        // state: best backward (= last consumed, thanks to the (time, tie)
        // sort) right row for the current key — O(1) beyond the iterators.
        // Forward candidates are never consumed, only peeked at rBuf.head.
        private var matchRow: InternalRow = null
        private var matchKey: Long = 0L
        private var matchTime: Long = 0L
        private var nextOut: InternalRow = null

        // resultProj reuses one UnsafeRow buffer, so the NEXT match may only
        // be computed after the consumer is done with the current row —
        // advance lazily from hasNext/next, never eagerly after emitting
        // (an eager advance invalidates the row just handed out)
        private def advance(): Unit = {
          while (nextOut == null && lIter.hasNext) {
            val l = lIter.next()
            if (!lkA.isNull(l) && !ltA.isNull(l)) {
              val key = lkA.get(l)
              val time = ltA.get(l)
              if (matchRow != null && matchKey != key) matchRow = null
              // consume right rows that can no longer match this or any
              // later left row (left times only grow within a key):
              //  - behind the current key, or at the key strictly before
              //    the left time (forward: those satisfy rt < time <= any
              //    later left time, so they never qualify again);
              //  - backward/nearest additionally consume rows at the key
              //    with rt <= time, keeping the LAST as state — the argmax
              //    by (time, tie) among backward qualifiers
              var scanning = true
              while (scanning && rBuf.hasNext) {
                val r = rBuf.head
                if (rkA.isNull(r) || rtA.isNull(r)) rBuf.next() // never matches
                else {
                  val rKey = rkA.get(r)
                  if (rKey < key) rBuf.next()
                  else if (rKey > key) scanning = false
                  else {
                    val rTime = rtA.get(r)
                    if (dir == 1) {
                      if (rTime < time) rBuf.next() else scanning = false
                    } else if (rTime <= time) {
                      matchTime = rTime
                      matchRow = rBuf.next().copy()
                      matchKey = key
                    } else scanning = false
                  }
                }
              }
              // backward candidate: the consumed state, within tolerance
              val backOk = dir != 1 && matchRow != null && matchKey == key &&
                (tol < 0L || time - matchTime <= tol)
              // forward candidate: the unconsumed head — at this key it has
              // rt >= time (forward) / rt > time (nearest) by construction
              var fwdRow: InternalRow = null
              var fwdTime = 0L
              if (dir != 0 && rBuf.hasNext) {
                val r = rBuf.head
                if (!rkA.isNull(r) && !rtA.isNull(r) && rkA.get(r) == key &&
                    (tol < 0L || rtA.get(r) - time <= tol)) {
                  fwdRow = r
                  fwdTime = rtA.get(r)
                }
              }
              val chosen: InternalRow =
                if (dir == 0) { if (backOk) matchRow else null }
                else if (dir == 1) fwdRow
                else if (backOk && (fwdRow == null || time - matchTime <= fwdTime - time))
                  matchRow
                else fwdRow
              if (chosen != null)
                nextOut = resultProj(joined(l, chosen))
              else if (outer)
                nextOut = resultProj(joined(l, nullRight))
            } else if (outer) {
              // null key/time: SQL outer semantics — the left row survives
              // unmatched (a null never equals anything)
              nextOut = resultProj(joined(l, nullRight))
            } // inner: left row drops
          }
        }

        override def hasNext: Boolean = {
          if (nextOut == null) advance()
          nextOut != null
        }
        override def next(): InternalRow = {
          if (nextOut == null) advance()
          val out = nextOut
          nextOut = null
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** SQL surface: `asof_join(left, right, lk, rk, lt, rt, tie[, left_outer
  * [, direction[, tolerance]]])` as a table-valued function (injected via
  * `injectTableFunction`) — `spark.sql` users reach the operator without
  * touching the DataFrame API:
  *
  * {{{
  * SELECT * FROM asof_join('errors', 'purchases',
  *   'u', 'pu', 'err_ts', 'pur_ts', 'pur_id')
  * }}}
  *
  * Table args name temp views / tables (dotted names allowed); key args
  * are column names resolved by the analyzer against the COMBINED output
  * of both sides. Two consequences (ADVICE r07):
  *  - DIFFERENT tables sharing a column name (the common trades/quotes
  *    shape where both carry `ts`) make a bare name ambiguous — qualify
  *    it with the view name (`'trades.ts', 'quotes.ts'`), which the
  *    surface already supports;
  *  - joining a view to ITSELF needs two distinctly-named views — the
  *    same name twice makes even qualified references ambiguous, which
  *    the analyzer reports as such.
  */
object AsOfSql {
  import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.{BooleanType, ByteType, IntegerType, ShortType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  private def str(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"asof_join: $what must be a STRING literal, got ${other.sql}")
  }

  def build(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length < 7 || exprs.length > 10)
      throw new IllegalArgumentException(
        "asof_join(left_table, right_table, left_key, right_key, left_time, " +
          "right_time, right_tie[, left_outer[, direction[, tolerance]]]) " +
          s"takes 7 to 10 arguments, got ${exprs.length}")
    val leftOuter = exprs.length >= 8 && (exprs(7) match {
      case Literal(b: Boolean, BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"asof_join: left_outer must be a BOOLEAN literal, got ${other.sql}")
    })
    val direction =
      if (exprs.length >= 9) str(exprs(8), "direction") else AsOfJoin.Backward
    AsOfJoin.validateDirection(direction)
    val tolerance = if (exprs.length < 10) AsOfJoin.NoTolerance else {
      val t = exprs(9) match {
        // any integral literal — a bare `604800000000` parses as BIGINT
        case Literal(v: Long, LongType) => v
        case Literal(v: Int, IntegerType) => v.toLong
        case Literal(v: Short, ShortType) => v.toLong
        case Literal(v: Byte, ByteType) => v.toLong
        case other => throw new IllegalArgumentException(
          s"asof_join: tolerance must be an integral literal, got ${other.sql}")
      }
      require(t >= 0L, s"asof_join: tolerance must be non-negative, got $t")
      t
    }
    def rel(e: Expression, what: String): LogicalPlan =
      UnresolvedRelation(str(e, what).split('.').toIndexedSeq)
    def attr(e: Expression, what: String): Expression =
      UnresolvedAttribute.quotedString(str(e, what))
    AsOfJoin(rel(exprs(0), "left_table"), rel(exprs(1), "right_table"),
      attr(exprs(2), "left_key"), attr(exprs(3), "right_key"),
      attr(exprs(4), "left_time"), attr(exprs(5), "right_time"),
      attr(exprs(6), "right_tie"), leftOuter, direction, tolerance)
  }
}

/** DataFrame API for the as-of join (column names resolve against each
  * side, so key/time/tie can't accidentally bind across sides). Sides
  * sharing lineage (self-joins included) are safe: analysis re-aliases the
  * right side via [[AsOfDeduplicateRight]].
  */
object AsOf {
  /** @param direction "backward" (default), "forward", or "nearest"
    * @param tolerance max `|leftTime - rightTime|` in the time column's own
    *        unit (micros for TIMESTAMP); negative = unbounded (default) */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTie: String, leftOuter: Boolean = false,
      direction: String = AsOfJoin.Backward,
      tolerance: Long = AsOfJoin.NoTolerance): DataFrame = {
    AsOfJoin.validateDirection(direction)
    def e(c: Column): Expression = Shim.expression(c)
    Shim.ofRows(left.sparkSession,
      AsOfJoin(Shim.plan(left), Shim.plan(right),
        e(left(leftKey)), e(right(rightKey)),
        e(left(leftTime)), e(right(rightTime)), e(right(rightTie)), leftOuter,
        direction, tolerance))
  }

  /** Left-outer as-of: unmatched left rows survive with null right columns. */
  def leftJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTie: String): DataFrame =
    join(left, right, leftKey, rightKey, leftTime, rightTime, rightTie,
      leftOuter = true)
}
