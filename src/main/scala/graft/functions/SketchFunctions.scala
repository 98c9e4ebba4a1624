package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}

/** Column surface over Spark's internal bloom-filter expressions (the
  * same machinery Catalyst's runtime row-group filtering uses —
  * `BloomFilterAggregate` / `BloomFilterMightContain` are not exposed
  * in `functions._`).
  *
  * Usage pattern for membership pruning (see q73): build the sketch
  * with a distributed aggregate, collect the one ~numBits/8-byte binary
  * row to the driver, and re-inject it as a `lit(...)` —
  * `might_contain` requires its bloom argument to be a CONSTANT
  * (foldable or scalar subquery), exactly like Spark's own
  * InjectRuntimeFilter reuses a subquery result. The collect moves a
  * sketch, never data.
  */
object SketchFunctions {

  /** Aggregate: bloom filter over a LONG column (hash non-long inputs
    * with `xxhash64` first, like InjectRuntimeFilter does).
    */
  def bloomFilterAgg(c: Column, estimatedItems: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(expression(c),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** `might_contain(bloom, xxhash64(value))` — false ⇒ definitely
    * absent; true ⇒ verify exactly. `bloom` must be foldable.
    */
  def mightContain(bloom: Column, value: Column): Column =
    column(BloomFilterMightContain(expression(bloom), expression(value)))
}
