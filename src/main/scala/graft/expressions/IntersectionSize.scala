package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| over two long arrays treated as SETS — equivalent to
  * `size(array_intersect(a, b))` for non-null elements, without
  * materializing the intersection: copies to primitive arrays, sorts,
  * merge-counts with duplicate runs skipped (so duplicated inputs
  * still count each common VALUE once, like array_intersect).
  * `size(array_intersect(...))` costs ~110 µs per call on ~250-element
  * arrays (boxed hash set + result array); this is a few µs, which
  * matters when a set-similarity verify stage evaluates it hundreds of
  * thousands of times. Null elements are rejected at analysis time —
  * this is also a registered SQL function, and `ArrayData.getLong`
  * would otherwise silently read a null as 0.
  */
case class IntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "intersection_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires non-null array elements (got a nullable-element array)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got ${l.simpleString(10)}, ${r.simpleString(10)}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = toSorted(a.asInstanceOf[ArrayData])
    val y = toSorted(b.asInstanceOf[ArrayData])
    var i = 0; var j = 0; var n = 0
    while (i < x.length && j < y.length) {
      val c = java.lang.Long.compare(x(i), y(j))
      if (c == 0) {
        n += 1
        val v = x(i)
        while (i < x.length && x(i) == v) i += 1   // skip duplicate runs:
        while (j < y.length && y(j) == v) j += 1   // each value counts once
      }
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
