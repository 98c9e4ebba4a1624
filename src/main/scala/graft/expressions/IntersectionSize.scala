package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| for two long arrays whose elements are DISTINCT within each
  * array (the shingle/gram sets here are array_distinct outputs) —
  * equivalent to `size(array_intersect(a, b))` in that case, without
  * materializing the intersection: copies to primitive arrays, sorts,
  * merge-counts. `size(array_intersect(...))` costs ~110 µs per call
  * on ~250-element arrays (boxed hash set + result array); this is a
  * few µs, which matters when a set-similarity verify stage evaluates
  * it hundreds of thousands of times.
  */
case class IntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "intersection_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got ${l.simpleString(10)}, ${r.simpleString(10)}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = toSorted(a.asInstanceOf[ArrayData])
    val y = toSorted(b.asInstanceOf[ArrayData])
    var i = 0; var j = 0; var n = 0
    while (i < x.length && j < y.length) {
      val c = java.lang.Long.compare(x(i), y(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  private def toSorted(d: ArrayData): Array[Long] = {
    val n = d.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = d.getLong(i); i += 1 }
    java.util.Arrays.sort(out)
    out
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectionSize =
    copy(left = newLeft, right = newRight)
}
