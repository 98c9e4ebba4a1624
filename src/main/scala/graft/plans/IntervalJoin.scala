package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator point-in-interval join: every (left point, right
  * interval) pair with the same key where `start <= ts <= end` — the
  * event-to-window join behind attribution, maintenance-window
  * filtering, and session enrichment.
  *
  * The second rung of the engine's custom-physical-operator line
  * (SURVEY §2.2 C15, next to [[AsOfJoinExec]]): Spark's built-ins
  * plan `l.key = r.key AND l.ts BETWEEN r.start AND r.end` as a
  * sort-merge/hash join on the key with the range as a POST-JOIN
  * residual — every (point, interval) pair of a key materializes
  * before the residual drops it, O(|points_k| · |intervals_k|) per
  * key. [[IntervalJoinExec]] declares the same ClusteredDistribution
  * a sort-merge join would (EnsureRequirements/AQE place, reuse, and
  * skew-split the exchanges) plus (key, ts) / (key, start) ordering,
  * and then streams both sorted partitions through an interval sweep:
  * intervals enter an active min-heap (keyed by end) when their start
  * passes, leave when their end expires, and each point emits exactly
  * its matches — O(evictions + output) per point, active-set state
  * only (the max concurrent overlap, not the relation).
  *
  * Inner-join semantics; a NULL key/ts/bound never matches (exactly
  * what SQL's `BETWEEN` residual gives). Output preserves the left
  * side's partitioning and (key, ts) ordering.
  */
case class IntervalJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightStart: Attribute, rightEnd: Attribute,
    leftOuter: Boolean = false,
    leftSalt: Option[Attribute] = None,
    rightSalt: Option[Attribute] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinNode =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinNode(l, r, lk, rk, lt, rs, re, outer, lsalt, rsalt) =>
      IntervalJoinExec(lk, rk, lt, rs, re, planLater(l), planLater(r), outer,
        lsalt, rsalt) :: Nil
    case _ => Nil
  }
}

/** Interval sweep exec. Skew notes (the two ways one partition can run
  * hot, and the mitigations):
  *  - NULL-key points under LEFT OUTER survive unmatched (SQL LEFT
  *    JOIN), and ClusteredDistribution routes ALL null keys to one
  *    partition — the same hotspot every built-in join has on
  *    NULL-heavy data. At scale, split the input into `key IS NULL`
  *    (append null right columns directly — no join needed) and the
  *    non-null remainder through this operator.
  *  - A hot NON-NULL key serializes one task (AQE's OptimizeSkewedJoin
  *    only rewrites SMJ/SHJ): use [[IntervalJoin.innerIntervalSalted]],
  *    which clusters on (key, salt) with the interval side replicated
  *    per salt — exact same rows out, per-task input bounded by
  *    ~1/saltBuckets of the hot key (IntervalJoinSpec measures it).
  */
case class IntervalJoinExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightStart: Attribute, rightEnd: Attribute,
    left: SparkPlan, right: SparkPlan,
    leftOuter: Boolean = false,
    leftSalt: Option[Attribute] = None,
    rightSalt: Option[Attribute] = None) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey) ++ leftSalt) ::
      ClusteredDistribution(Seq(rightKey) ++ rightSalt) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((Seq(leftKey) ++ leftSalt :+ leftTs).map(SortOrder(_, Ascending)),
        (Seq(rightKey) ++ rightSalt :+ rightStart).map(SortOrder(_, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (Seq(leftKey) ++ leftSalt :+ leftTs).map(SortOrder(_, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numAdmitted" -> SQLMetrics.createMetric(sparkContext, "intervals admitted to the sweep"))

  protected override def doExecute(): RDD[InternalRow] = {
    def ord(side: SparkPlan, a: Attribute): Int = {
      val i = side.output.indexWhere(_.exprId == a.exprId)
      require(i >= 0, s"interval-join attribute $a not found in child output")
      i
    }
    val lkOrd = ord(left, leftKey); val ltOrd = ord(left, leftTs)
    val rkOrd = ord(right, rightKey)
    val rsOrd = ord(right, rightStart); val reOrd = ord(right, rightEnd)
    // salt ordinals, -1 when unsalted (groups then key on (key, 0))
    val lSaltOrd = leftSalt.map(a => ord(left, a)).getOrElse(-1)
    val rSaltOrd = rightSalt.map(a => ord(right, a)).getOrElse(-1)
    val outAttrs = output
    val rowsMetric = longMetric("numOutputRows")
    val admittedMetric = longMetric("numAdmitted")

    val rightArity = right.output.length
    val isOuter = leftOuter
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val nullRight: InternalRow =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightArity)
        // active intervals of the CURRENT (key, salt) group, min-heap by
        // end: evicting every end < ts leaves exactly the matching set
        // (start already passed at insertion, ts nondecreasing within a
        // group)
        val active = scala.collection.mutable.PriorityQueue.empty[(Long, InternalRow)](
          Ordering.by[(Long, InternalRow), Long](_._1).reverse)
        var activeKey = Long.MinValue
        var activeSalt = Long.MinValue
        var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null

        lIter.flatMap { l =>
          if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd) ||
              (lSaltOrd >= 0 && l.isNullAt(lSaltOrd))) {
            // a NULL key/ts can never satisfy the range — inner drops
            // the point, left-outer keeps it unmatched (SQL LEFT JOIN)
            if (isOuter) { rowsMetric += 1; Iterator.single(proj(joined(l, nullRight))) }
            else Iterator.empty
          } else {
            val lk = l.getLong(lkOrd)
            val ls = if (lSaltOrd >= 0) l.getLong(lSaltOrd) else 0L
            val lt = l.getLong(ltOrd)
            if (lk != activeKey || ls != activeSalt) {
              active.clear(); activeKey = lk; activeSalt = ls
            }
            // admit right intervals for groups < (lk, ls) (drained unseen
            // — no left partner exists) and this group's starts <= lt
            var advance = true
            while (advance && rRow != null) {
              if (rRow.isNullAt(rkOrd) || rRow.isNullAt(rsOrd) || rRow.isNullAt(reOrd) ||
                  (rSaltOrd >= 0 && rRow.isNullAt(rSaltOrd))) {
                rRow = if (rIter.hasNext) rIter.next() else null
              } else {
                val rk = rRow.getLong(rkOrd)
                val rs = if (rSaltOrd >= 0) rRow.getLong(rSaltOrd) else 0L
                val groupCmp = if (rk != lk) java.lang.Long.compare(rk, lk)
                               else java.lang.Long.compare(rs, ls)
                if (groupCmp < 0) {
                  rRow = if (rIter.hasNext) rIter.next() else null
                } else if (groupCmp == 0 && rRow.getLong(rsOrd) <= lt) {
                  admittedMetric += 1
                  active.enqueue((rRow.getLong(reOrd), rRow.copy()))
                  rRow = if (rIter.hasNext) rIter.next() else null
                } else advance = false
              }
            }
            // expire ended intervals; everything left matches
            while (active.nonEmpty && active.head._1 < lt) active.dequeue()
            if (active.isEmpty) {
              if (isOuter) { rowsMetric += 1; Iterator.single(proj(joined(l, nullRight))) }
              else Iterator.empty
            } else active.iterator.map { case (_, r) =>
              rowsMetric += 1
              proj(joined(l, r))
            }
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User API for the native interval join. */
object IntervalJoin {

  /** Inner point-in-interval join: every pair with
    * `left.key = right.key AND right.start <= left.ts <= right.end`.
    * Column names must be disjoint between the sides (rename first);
    * key/ts/bound columns must be bigint or timestamp.
    */
  def innerInterval(left: DataFrame, right: DataFrame,
                    leftKeyCol: String, rightKeyCol: String,
                    leftTsCol: String, rightStartCol: String,
                    rightEndCol: String): DataFrame =
    build(left, right, leftKeyCol, rightKeyCol, leftTsCol,
      rightStartCol, rightEndCol, leftOuter = false)

  /** [[innerInterval]] with LEFT OUTER semantics: points covered by no
    * interval (or with a NULL key/ts) survive with a null right side —
    * the coverage-audit shape ("which events fall in NO window").
    */
  def leftInterval(left: DataFrame, right: DataFrame,
                   leftKeyCol: String, rightKeyCol: String,
                   leftTsCol: String, rightStartCol: String,
                   rightEndCol: String): DataFrame =
    build(left, right, leftKeyCol, rightKeyCol, leftTsCol,
      rightStartCol, rightEndCol, leftOuter = true)

  /** [[innerInterval]] with SALTED key distribution — skew hardening
    * for the sweep (see [[IntervalJoinExec]]'s scaladoc): the point
    * side gets a deterministic whole-row-hash salt in
    * [0, saltBuckets), the interval side is replicated once per salt,
    * and the exec clusters on (key, salt) — the hot key's points
    * spread over saltBuckets tasks, each sweeping the key's FULL
    * interval set. Exactly [[innerInterval]]'s rows; the interval side
    * shuffles ×saltBuckets, so size the salt like a salted SMJ.
    */
  def innerIntervalSalted(left: DataFrame, right: DataFrame,
                          leftKeyCol: String, rightKeyCol: String,
                          leftTsCol: String, rightStartCol: String,
                          rightEndCol: String, saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 2 && saltBuckets <= 4096,
      s"saltBuckets must be in [2, 4096], got $saltBuckets")
    import org.apache.spark.sql.functions.{array, explode, lit, pmod, xxhash64}
    val saltL = "__graft_iv_salt_l"
    val saltR = "__graft_iv_salt_r"
    val l2 = left.withColumn(saltL,
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltBuckets.toLong)))
    val r2 = right.withColumn(saltR,
      explode(array((0 until saltBuckets).map(s => lit(s.toLong)): _*)))
    build(l2, r2, leftKeyCol, rightKeyCol, leftTsCol, rightStartCol, rightEndCol,
      leftOuter = false, salt = Some((saltL, saltR)))
      .drop(saltL, saltR)
  }

  private def build(left: DataFrame, right: DataFrame,
                    leftKeyCol: String, rightKeyCol: String,
                    leftTsCol: String, rightStartCol: String,
                    rightEndCol: String, leftOuter: Boolean,
                    salt: Option[(String, String)] = None): DataFrame = {
    val spark = left.sparkSession
    GraftSqlBridge.ensureStrategy(spark, IntervalJoinStrategy)
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"interval-join sides share column names $dup — rename before joining")
    val l2 = left.select(left.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val r2 = right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val lPlan = GraftSqlBridge.analyzed(l2)
    val rPlan = GraftSqlBridge.analyzed(r2)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"$side side has no column `$name`"))
    val lk = attr(lPlan, leftKeyCol, "left"); val rk = attr(rPlan, rightKeyCol, "right")
    val lt = attr(lPlan, leftTsCol, "left")
    val rs = attr(rPlan, rightStartCol, "right"); val re = attr(rPlan, rightEndCol, "right")
    Seq(lk -> "key", rk -> "key", lt -> "ts", rs -> "bound", re -> "bound").foreach {
      case (a, what) => a.dataType match {
        case LongType | TimestampType => ()
        case other => throw new IllegalArgumentException(
          s"interval-join $what `${a.name}` must be bigint or timestamp, got $other")
      }
    }
    val (lsalt, rsalt) = salt match {
      case Some((slCol, srCol)) =>
        (Some(attr(lPlan, slCol, "left")), Some(attr(rPlan, srCol, "right")))
      case None => (None, None)
    }
    GraftSqlBridge.ofRows(spark,
      IntervalJoinNode(lPlan, rPlan, lk, rk, lt, rs, re, leftOuter, lsalt, rsalt))
  }
}
