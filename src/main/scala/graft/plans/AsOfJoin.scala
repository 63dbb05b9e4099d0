package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{LongType, TimestampType}

/** AS-OF JOIN as a first-class operator — the whole custom-operator ladder
  * (SURVEY §4 preference (c)): a logical node, a planner [[SparkStrategy]],
  * and a sort-merge [[SparkPlan]], injected via `SparkSessionExtensions`
  * ([[GraftExtensions]]).
  *
  * Semantics (inner as-of): for each left row, the single right row with
  * the same key and the greatest `(rightTime, rightTie)` among rows with
  * `rightTime <= leftTime`; left rows with no qualifying right row are
  * dropped. This is exactly the reference shape `q18_join_asof` computes as
  * range-join + per-key `row_number() = 1` (`ops/CoreQueries.scala` Q18,
  * after reference query patterns over ClickHouse `flows` — see
  * `/root/reference/initdb/create_tables.sql:1-33` for the time-keyed
  * schema such joins run over).
  *
  * WHY an operator: the compositional plan materializes EVERY qualifying
  * (left, right) pair before the window discards all but one — per-key
  * quadratic blow-up at scale. The merge formulation is one pass over each
  * side, sorted: shuffle by key, sort by (key, time), and stream — the
  * same cost shape as a sort-merge equi-join, with O(1) state (the current
  * best match) beyond the iterators.
  *
  * Scope, by declaration: key/time/tie expressions must be Long-backed
  * (BIGINT or TIMESTAMP — both stored as a long), nulls never match
  * (null-keyed/timed left rows drop, right rows are skipped), and the
  * operator plans only through [[AsOf.join]] (no SQL syntax surface).
  */
final case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val resolved: Boolean = childrenResolved &&
    Seq(leftKey, rightKey, leftTime, rightTime, rightTie).forall { e =>
      e.resolved && (e.dataType == LongType || e.dataType == TimestampType)
    }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
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
    rightTie: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

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

  protected override def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val schema = output
    val leftOut = left.output
    val rightOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val resultProj = UnsafeProjection.create(schema, leftOut ++ rightOut)
        private val rBuf = rIter.buffered
        // state: best (= last consumed, thanks to the (time, tie) sort)
        // right row for the current key — O(1) beyond the iterators
        private var matchRow: InternalRow = null
        private var matchKey: Long = 0L
        private var nextOut: InternalRow = null

        private def evalLong(e: Expression, row: InternalRow): java.lang.Long =
          e.eval(row).asInstanceOf[java.lang.Long]

        // resultProj reuses one UnsafeRow buffer, so the NEXT match may only
        // be computed after the consumer is done with the current row —
        // advance lazily from hasNext/next, never eagerly after emitting
        // (an eager advance invalidates the row just handed out)
        private def advance(): Unit = {
          while (nextOut == null && lIter.hasNext) {
            val l = lIter.next()
            val lkV = evalLong(lk, l)
            val ltV = evalLong(lt, l)
            if (lkV != null && ltV != null) {
              val key = lkV.longValue()
              val time = ltV.longValue()
              if (matchRow != null && matchKey != key) matchRow = null
              // consume right rows that are (a) behind the current key or
              // (b) at the key with time <= left time — (b)'s LAST row is
              // the argmax by (time, tie) among qualifiers, the as-of match
              var scanning = true
              while (scanning && rBuf.hasNext) {
                val r = rBuf.head
                val rkV = evalLong(rk, r)
                val rtV = evalLong(rt, r)
                if (rkV == null || rtV == null) rBuf.next() // never matches
                else if (rkV.longValue() < key) rBuf.next()
                else if (rkV.longValue() == key && rtV.longValue() <= time) {
                  matchRow = rBuf.next().copy()
                  matchKey = key
                } else scanning = false
              }
              if (matchRow != null && matchKey == key)
                nextOut = resultProj(joined(l, matchRow))
            } // null key/time: inner semantics — left row drops
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

/** DataFrame API for the as-of join (column names resolve against each
  * side, so key/time/tie can't accidentally bind across sides).
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTie: String): DataFrame = {
    def e(c: Column): Expression = Shim.expression(c)
    Shim.ofRows(left.sparkSession,
      AsOfJoin(Shim.plan(left), Shim.plan(right),
        e(left(leftKey)), e(right(rightKey)),
        e(left(leftTime)), e(right(rightTime)), e(right(rightTie))))
  }
}
