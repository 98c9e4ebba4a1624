package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, BroadcastMode, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator as-of join: for every left row, the single right row
  * with the greatest `rightTs <= leftTs` within the same key — the
  * point-in-time lookup every feature store / tick-data / attribution
  * pipeline needs.
  *
  * This is the engine's custom-LogicalPlan + SparkStrategy + SparkPlan
  * rung (SURVEY §2.2 C15): Spark has no physical as-of operator — its
  * own logical `AsOfJoin` (pandas `merge_asof`) is REWRITTEN by the
  * optimizer into an inner join on the key with a `min_by` aggregate
  * over every in-horizon pair (`RewriteAsOfJoin`), i.e. each left row
  * materializes ALL its candidate right rows before aggregation; the
  * relational alternative (q60's union+window) funnels BOTH relations
  * through one union, a per-key sort, and a window carry. [[AsOfJoinExec]]
  * instead declares `ClusteredDistribution` on the key and a
  * `(key, ts)` required ordering for each child — EnsureRequirements
  * co-partitions and sorts exactly as it would for a sort-merge join —
  * and then streams both sorted partitions through a single-pass merge
  * with O(1) state (the last in-horizon right row per key). No pair
  * blow-up, no union materialization, no window buffer; output
  * preserves the left side's partitioning AND `(key, ts)` ordering, so
  * a downstream per-key window or as-of join over the result adds
  * neither exchange nor sort. At 100 TB both shuffles are the same
  * volume a sort-merge join would pay; the win is the per-row
  * constant and the reusable output layout.
  *
  * Contract (checked by [[AsOf.leftAsOf]]): key columns are
  * `bigint`, ts columns `bigint` or `timestamp` (both Long-backed
  * internally); a NULL key or ts on the left yields an unmatched row,
  * on the right the row is skipped — the semantics DuckDB's
  * `ASOF LEFT JOIN` gives NULLs that never satisfy `>=`.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    broadcastRight: Boolean = false,
    leftSalt: Option[Attribute] = None,
    rightSalt: Option[Attribute] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]] (co-partitioned merge) or
  * [[BroadcastAsOfJoinExec]] (dimension-broadcast probe). Injected by
  * [[graft.GraftExtensions]] (`injectPlannerStrategy`) and, for
  * sessions not built with the extension, lazily via
  * `experimental.extraStrategies` in [[AsOf.leftAsOf]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, bcast, ls, rs) =>
      if (bcast) BroadcastAsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
      else AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), ls, rs) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned merge as-of join. `leftSalt`/`rightSalt` (set by
  * [[AsOf.leftAsOfSalted]]) widen the clustering AND the merge
  * grouping to (key, salt): AQE's OptimizeSkewedJoin only rewrites
  * SMJ/SHJ, so a hot key here would otherwise serialize one task — the
  * salt splits it across `saltBuckets` partitions, with the right side
  * replicated per salt so every (key, salt) group still sees the full
  * right history (exact same result, bounded per-task input;
  * AsOfSpec measures it on a 100:1 skewed fixture).
  */
case class AsOfJoinExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    left: SparkPlan, right: SparkPlan,
    leftSalt: Option[Attribute] = None,
    rightSalt: Option[Attribute] = None) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition on the key (plus salt when present), sort (key, salt,
  // ts) — the same requirements a sort-merge join would declare, so
  // EnsureRequirements/AQE place the exchanges and reuse compatible ones
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey) ++ leftSalt) ::
      ClusteredDistribution(Seq(rightKey) ++ rightSalt) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((Seq(leftKey) ++ leftSalt :+ leftTs).map(SortOrder(_, Ascending)),
        (Seq(rightKey) ++ rightSalt :+ rightTs).map(SortOrder(_, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (Seq(leftKey) ++ leftSalt :+ leftTs).map(SortOrder(_, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      s"as-of key/ts attributes not found in child output: $leftKey/$leftTs/$rightKey/$rightTs")
    // salt ordinals, -1 when unsalted: the merge groups on (key, salt)
    // with salt fixed at 0 so the unsalted path costs nothing extra
    val lsOrd = leftSalt.map(a => left.output.indexWhere(_.exprId == a.exprId)).getOrElse(-1)
    val rsOrd = rightSalt.map(a => right.output.indexWhere(_.exprId == a.exprId)).getOrElse(-1)
    require(leftSalt.isEmpty || lsOrd >= 0, s"left salt $leftSalt not found in child output")
    require(rightSalt.isEmpty || rsOrd >= 0, s"right salt $rightSalt not found in child output")
    val outAttrs = output
    val rightArity = right.output.length
    val rowsMetric = longMetric("numOutputRows")
    val matchedMetric = longMetric("numMatched")

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val nullRight: InternalRow = new GenericInternalRow(rightArity)
        // one-row lookahead over the right side; `matched` holds a COPY
        // of the newest right row whose ts <= the current left ts for
        // the (key, salt) group in hand (sort iterators reuse their
        // UnsafeRow)
        var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        var matched: InternalRow = null
        var matchedKey = 0L
        var matchedSalt = 0L
        lIter.map { l =>
          rowsMetric += 1
          if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd) ||
              (lsOrd >= 0 && l.isNullAt(lsOrd))) proj(joined(l, nullRight))
          else {
            val lk = l.getLong(lkOrd)
            val ls = if (lsOrd >= 0) l.getLong(lsOrd) else 0L
            val lt = l.getLong(ltOrd)
            var advance = true
            while (advance && rRow != null) {
              if (rRow.isNullAt(rkOrd) || rRow.isNullAt(rtOrd) ||
                  (rsOrd >= 0 && rRow.isNullAt(rsOrd))) {
                rRow = if (rIter.hasNext) rIter.next() else null
              } else {
                val rk = rRow.getLong(rkOrd)
                val rs = if (rsOrd >= 0) rRow.getLong(rsOrd) else 0L
                // lexicographic (key, salt) group order, then the ts horizon
                val groupCmp = if (rk != lk) java.lang.Long.compare(rk, lk)
                               else java.lang.Long.compare(rs, ls)
                if (groupCmp < 0 || (groupCmp == 0 && rRow.getLong(rtOrd) <= lt)) {
                  if (groupCmp == 0) { matched = rRow.copy(); matchedKey = rk; matchedSalt = rs }
                  rRow = if (rIter.hasNext) rIter.next() else null
                } else advance = false
              }
            }
            if (matched != null && matchedKey == lk && matchedSalt == ls) {
              matchedMetric += 1
              proj(joined(l, matched))
            } else proj(joined(l, nullRight))
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** BroadcastMode that sorts the right side by (key, ts) ONCE on the
  * driver — the sorted `Array[InternalRow]` IS the index (one of the
  * two payload types `BroadcastExchangeExec` accepts; a custom class
  * trips its size-accounting whitelist). Rows with a NULL key or ts
  * can never satisfy the `<=` horizon and are dropped at build. Rows
  * are copied: the collect iterator reuses one UnsafeRow buffer.
  * Probes binary-search the array reading (key, ts) through the same
  * ordinals — no per-task rebuild, no per-key sub-structure.
  */
case class AsOfIndexMode(keyOrd: Int, tsOrd: Int) extends BroadcastMode {
  override def transform(rows: Array[InternalRow]): Array[InternalRow] =
    transform(rows.iterator, Some(rows.length.toLong))
  override def transform(rows: Iterator[InternalRow],
                         sizeHint: Option[Long]): Array[InternalRow] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    sizeHint.foreach(n => buf.sizeHint(math.min(n, Int.MaxValue.toLong).toInt))
    rows.foreach { r =>
      if (!r.isNullAt(keyOrd) && !r.isNullAt(tsOrd)) buf += r.copy()
    }
    buf.sortInPlace()(Ordering.by(r => (r.getLong(keyOrd), r.getLong(tsOrd))))
    buf.toArray
  }
  // ordinals are positional (no exprIds to normalize) — identity
  // canonical form lets EnsureRequirements reuse an identical exchange
  override def canonicalized: BroadcastMode = this

  /** Newest row in the (key, ts)-sorted `index` with key == k and
    * ts <= t, or null.
    */
  def lookup(index: Array[InternalRow], k: Long, t: Long): InternalRow = {
    var lo = 0
    var hi = index.length - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mk = index(mid).getLong(keyOrd)
      if (mk < k || (mk == k && index(mid).getLong(tsOrd) <= t)) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (ans >= 0 && index(ans).getLong(keyOrd) == k) index(ans) else null
  }
}

/** Broadcast-right as-of join: the dominant production shape — a huge
  * fact side (clicks, ticks, feature requests) point-in-time joining a
  * dimension that fits in memory (SCD2 stamps, feature snapshots).
  * [[AsOfJoinExec]] is correct there but pays a full shuffle + sort of
  * the 100 TB fact side; this operator requires NOTHING of the left
  * child (`UnspecifiedDistribution`, no ordering) and
  * `BroadcastDistribution(AsOfIndexMode)` of the right, so the fact
  * side flows straight from the scan — zero exchange, zero sort — and
  * each task probes the driver-built sorted index at O(log |dim|) per
  * row. Output preserves the left side's partitioning AND ordering
  * verbatim. The caller asserts the right side fits in executor
  * memory, exactly like a `broadcast()` join hint.
  */
case class BroadcastAsOfJoinExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    left: SparkPlan, right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  private def rightOrd(a: Attribute): Int = {
    val i = right.output.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"as-of attribute $a not found in right child output")
    i
  }
  private def indexMode: AsOfIndexMode =
    AsOfIndexMode(rightOrd(rightKey), rightOrd(rightTs))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(indexMode) :: Nil
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    require(lkOrd >= 0 && ltOrd >= 0,
      s"as-of key/ts attributes not found in left child output: $leftKey/$leftTs")
    val outAttrs = output
    val rightArity = right.output.length
    val rowsMetric = longMetric("numOutputRows")
    val matchedMetric = longMetric("numMatched")
    val mode = indexMode
    val bcast = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions({ lIter =>
      val index = bcast.value
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight: InternalRow = new GenericInternalRow(rightArity)
      lIter.map { l =>
        rowsMetric += 1
        if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) proj(joined(l, nullRight))
        else {
          val m = mode.lookup(index, l.getLong(lkOrd), l.getLong(ltOrd))
          if (m != null) { matchedMetric += 1; proj(joined(l, m)) }
          else proj(joined(l, nullRight))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User API for the native as-of join. */
object AsOf {

  /** `left AS-OF LEFT JOIN right` on `key`, matching the newest
    * `right` row with `right.tsR <= left.tsL`. Column names must be
    * disjoint between the two sides apart from nothing — i.e. rename
    * before calling (the output carries both sides' columns verbatim).
    */
  def leftAsOf(left: DataFrame, right: DataFrame,
               leftKeyCol: String, rightKeyCol: String,
               leftTsCol: String, rightTsCol: String): DataFrame =
    build(left, right, leftKeyCol, rightKeyCol, leftTsCol, rightTsCol,
      broadcastRight = false)

  /** [[leftAsOf]] forcing the broadcast-right physical plan: the right
    * side is collected, sorted into an [[AsOfIndex]] on the driver and
    * broadcast; the left side needs no exchange and no sort. Use when
    * the right side fits in executor memory (the `broadcast()` hint
    * contract); identical semantics to [[leftAsOf]].
    */
  def leftAsOfBroadcast(left: DataFrame, right: DataFrame,
                        leftKeyCol: String, rightKeyCol: String,
                        leftTsCol: String, rightTsCol: String): DataFrame =
    build(left, right, leftKeyCol, rightKeyCol, leftTsCol, rightTsCol,
      broadcastRight = true)

  /** [[leftAsOf]] with SALTED key distribution — the skew hardening for
    * the merge plan. AQE's OptimizeSkewedJoin only rewrites SMJ/SHJ, so
    * a hot key (one user producing half the ticks) would serialize a
    * single task under [[leftAsOf]]. Here the left side gets a
    * deterministic salt in [0, saltBuckets) (hash of the whole row) and
    * the right side is replicated once per salt, so the exec clusters
    * on (key, salt): the hot key's probes spread over `saltBuckets`
    * tasks, each still seeing the key's FULL right history — results
    * are exactly [[leftAsOf]]'s (AsOfSpec proves equality plus the
    * bounded per-task input on a 100:1 skewed fixture). Cost: the
    * right side shuffles ×saltBuckets — size it like a salted
    * SMJ (small right side or small salt count); if the right side
    * fits in memory outright, prefer [[leftAsOfBroadcast]], which has
    * no skew exposure at all (no shuffle, per-row O(log) probes).
    */
  def leftAsOfSalted(left: DataFrame, right: DataFrame,
                     leftKeyCol: String, rightKeyCol: String,
                     leftTsCol: String, rightTsCol: String,
                     saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 2 && saltBuckets <= 4096,
      s"saltBuckets must be in [2, 4096], got $saltBuckets")
    import org.apache.spark.sql.functions.{array, explode, lit, pmod, xxhash64}
    val saltL = "__graft_asof_salt_l"
    val saltR = "__graft_asof_salt_r"
    val l2 = left.withColumn(saltL,
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltBuckets.toLong)))
    val r2 = right.withColumn(saltR,
      explode(array((0 until saltBuckets).map(s => lit(s.toLong)): _*)))
    build(l2, r2, leftKeyCol, rightKeyCol, leftTsCol, rightTsCol,
      broadcastRight = false, salt = Some((saltL, saltR)))
      .drop(saltL, saltR)
  }

  private def build(left: DataFrame, right: DataFrame,
                    leftKeyCol: String, rightKeyCol: String,
                    leftTsCol: String, rightTsCol: String,
                    broadcastRight: Boolean,
                    salt: Option[(String, String)] = None): DataFrame = {
    val spark = left.sparkSession
    GraftSqlBridge.ensureStrategy(spark, AsOfJoinStrategy)
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"as-of join sides share column names $dup — rename before joining")
    // fresh-alias projections give every referenced attribute a unique
    // exprId, so self-joins (both sides carved from one scan) survive
    // the analyzer's relation dedup without ambiguity
    val l2 = left.select(left.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val r2 = right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val lPlan = GraftSqlBridge.analyzed(l2)
    val rPlan = GraftSqlBridge.analyzed(r2)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"$side side has no column `$name`"))
    val lk = attr(lPlan, leftKeyCol, "left"); val rk = attr(rPlan, rightKeyCol, "right")
    val lt = attr(lPlan, leftTsCol, "left"); val rt = attr(rPlan, rightTsCol, "right")
    def checkType(a: Attribute, what: String): Unit = a.dataType match {
      case LongType | TimestampType => ()
      case other => throw new IllegalArgumentException(
        s"as-of $what `${a.name}` must be bigint or timestamp, got $other")
    }
    checkType(lk, "key"); checkType(rk, "key"); checkType(lt, "ts"); checkType(rt, "ts")
    val (ls, rs) = salt match {
      case Some((slCol, srCol)) =>
        (Some(attr(lPlan, slCol, "left")), Some(attr(rPlan, srCol, "right")))
      case None => (None, None)
    }
    GraftSqlBridge.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt, broadcastRight, ls, rs))
  }
}
