package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.GraftCheckpointOps

/** Scale-safe global cumulative sums (round 10, VERDICT item 4).
  *
  * A global running total (`sum(v) OVER (ORDER BY ... ROWS UNBOUNDED
  * PRECEDING)`) plans as a SINGLE-partition WindowExec in Spark — fine
  * when the windowed relation is bounded (q175's top-200, a per-round
  * curve), a stall when its cardinality grows with a dimension (q219
  * ranks ALL parts, q99 ranks the whole vocab, q190 accumulates every
  * lineitem of a return flag; at 100 TB each would serialize on one
  * task). This is the standard two-pass range-partitioned prefix sum
  * instead:
  *
  *   pass 1: range-partition by the total order, per-partition running
  *           sums via a window keyed by the partition id (parallel —
  *           every partition works at once);
  *   pass 2: the per-partition subtotal ledger (≤ shuffle-partitions
  *           rows — bounded by CONFIG, not data) is prefix-summed and
  *           broadcast back; each row adds its partition's offset.
  *
  * The same shape the engine already used ad hoc for q66's token
  * sharding; hoisted here as a first-class operator and adopted by
  * q219/q190/q99. Numeric caveat for float values: the two-pass
  * association order differs from a sequential left-to-right fold, so
  * results can differ in the last ulp from a single-partition window
  * (EXACT for integer-valued sums — q190/q99 — and for row ranks);
  * float consumers must quantize before comparing (q219 does, via
  * quant6). PrefixSumSpec pins both forms to the single-partition
  * window on the fixture.
  *
  * `sortCols` must be a TOTAL order (include a tie-break key):
  * `repartitionByRange` + the in-partition sort give every row a
  * unique global rank only when no two rows compare equal.
  */
object PrefixSum {

  /** Adds, for each `(valueCol, outName)`, the running sum of the
    * value over the global order `sortCols`. One range-exchange over
    * the data plus one tiny subtotal aggregate; no single-partition
    * pass over the relation. Pass `(lit(1L), "rank")` to get the
    * global row rank as one of the outputs.
    */
  def cumSums(df: DataFrame, sortCols: Seq[Column],
              values: Seq[(Column, String)]): DataFrame =
    grouped(df, Nil, sortCols, values)

  /** Single-value convenience form of [[cumSums]]. */
  def cumSum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
             out: String): DataFrame =
    cumSums(df, sortCols, Seq(valueCol -> out))

  /** Per-group running sums: the cumulative restarts at every distinct
    * `groupCols` value (q190's per-returnflag cumulative weight). The
    * range partitioning leads with the group key, so a group spans at
    * most a handful of adjacent partitions; the offset ledger holds
    * one row per (partition, group-in-partition) — O(partitions +
    * groups) rows, its prefix window partitioned BY GROUP (parallel,
    * ≤ partitions rows per group).
    */
  def grouped(df: DataFrame, groupCols: Seq[String], sortCols: Seq[Column],
              values: Seq[(Column, String)]): DataFrame = {
    require(values.nonEmpty, "prefix sum needs at least one value column")
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val vNames = values.indices.map(i => s"__v$i")
    val groupCs = groupCols.map(col)
    val parted0 = df.repartitionByRange(n, (groupCs ++ sortCols): _*)
    val parted = values.zip(vNames).foldLeft(parted0) {
        case (acc, ((v, _), nm)) => acc.withColumn(nm, v)
      }
      .withColumn("__pid", spark_partition_id())
      // materialized once: the per-row pass and the subtotal ledger
      // both read it, and spark_partition_id is only stable within one
      // evaluation of the exchange
      .graftCheckpoint()
    val wLocal = Window.partitionBy(col("__pid") +: groupCs: _*)
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = vNames.zipWithIndex.foldLeft(parted) { case (acc, (nm, i)) =>
      acc.withColumn(s"__local$i", sum(col(nm)).over(wLocal))
    }
    val wPid = Window.partitionBy(groupCs: _*).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ledger = parted.groupBy(col("__pid") +: groupCs: _*)
      .agg(sum(col(vNames.head)).as("__ptot0"),
           vNames.tail.zipWithIndex.map { case (nm, i) =>
             sum(col(nm)).as(s"__ptot${i + 1}")
           }: _*)
    // the ledger join-back is null-SAFE on the group columns (<=>):
    // a plain equi-join would silently drop every row whose group key
    // is NULL (NULL never equals itself), turning a generic operator
    // into silent row loss for nullable group keys (ADVICE r10). The
    // ledger side's keys are renamed so the self-lineage join stays
    // unambiguous.
    val offsets = vNames.indices.foldLeft(ledger) { case (acc, i) =>
        acc.withColumn(s"__off$i", sum(col(s"__ptot$i")).over(wPid))
      }
      .select((col("__pid").as("__opid") +:
               groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"__g$i") }) ++
              vNames.indices.map(i => col(s"__off$i")): _*)
    val joinCond = groupCols.indices.foldLeft(col("__pid") === col("__opid")) {
      case (c, i) => c && (col(groupCols(i)) <=> col(s"__g$i"))
    }
    val joined = local.join(broadcast(offsets), joinCond)
      .drop("__opid")
      .drop(groupCols.indices.map(i => s"__g$i"): _*)
    values.zipWithIndex.foldLeft(joined) { case (acc, ((_, out), i)) =>
        acc.withColumn(out, when(col(s"__off$i").isNull, col(s"__local$i"))
                              .otherwise(col(s"__local$i") + col(s"__off$i")))
      }
      .drop("__pid")
      .drop(vNames: _*)
      .drop(vNames.indices.flatMap(i => Seq(s"__local$i", s"__off$i")): _*)
  }
}
