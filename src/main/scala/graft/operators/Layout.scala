package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional data
  * skipping — the write-side half of scan performance at 100 TB.
  * Sorting by one column clusters that column only: a predicate on any
  * OTHER column touches every file. Interleaving the bits of two key
  * columns and range-partitioning + sorting by the interleaved value
  * clusters BOTH dimensions at once, so parquet min/max stats prune
  * files for predicates on either column (what Delta's OPTIMIZE
  * ZORDER does; vanilla Spark has no built-in).
  *
  * Everything is built-in bit arithmetic (shiftright/and/or) —
  * whole-stage codegen'd, no UDF; the only shuffle is the range
  * partitioning the write needs anyway. LayoutSpec quantifies the
  * effect: a range predicate on the second dimension touches a small
  * fraction of z-ordered files vs ~all files of a singly-sorted
  * layout.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of two non-negative
    * int keys (a even positions, b odd). 16+16 → one long.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Equal-width bucket rank of `c` over [lo, hi] into 2^bits buckets —
    * maps an arbitrary numeric/date-derived key onto the z-curve grid.
    */
  def bucketRank(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val buckets = (1 << bits) - 1
    least(lit(buckets), greatest(lit(0),
      floor((c.cast("double") - lo) / math.max(hi - lo, Double.MinPositiveValue) * buckets)))
      .cast("long")
  }

  /** Write `df` z-ordered by (a, b) into `files` parquet files at
    * `path`: range-partition by z-value (equal-size files via range
    * boundaries sampling) and sort within each file so row-group
    * min/max stats are tight on both dimensions.
    */
  def zorderWrite(df: DataFrame, a: Column, b: Column, path: String, files: Int): Unit =
    df.withColumn("__z", zValue(a, b))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
