package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass Σ v·vᵀ accumulation for covariance builds (round 11,
  * VERDICT r10 on q223): input = a d-vector, buffer = the flat d²
  * outer-product sum, output = the flat d² array (row-major,
  * cell (p,q) at index p·d+q).
  *
  * Replaces the double-posexplode build, which materialized d² rows
  * PER VECTOR (4,096 at d=64) before partial aggregation could absorb
  * them. Here each input row folds directly into a single d²-double
  * buffer (32 KB at d=64) — associative/commutative partial state, so
  * Spark plans it partial+final (ObjectHashAggregate) and only the
  * per-partition buffers cross the exchange: shuffle bytes drop from
  * O(partitions·d²) rows to O(partitions) buffers and the row
  * explosion disappears entirely.
  *
  * The buffer is bounded by d² — callers must keep d modest (d ≤ ~1k,
  * 8 MB buffers); the embedding corpus is d=64. Float caveat: per-cell
  * sums fold in partition order (arbitrary), exactly like the
  * groupBy(p,q) sum it replaces — consumers quantize before comparing
  * across engines (q223 applies quant6 per cell).
  */
class OuterProductSumAgg(d: Int)
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = new Array[Double](d * d)

  override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
    val a = v.toArray
    var p = 0
    while (p < d) {
      val vp = a(p)
      val base = p * d
      var q = 0
      while (q < d) { b(base + q) += vp * a(q); q += 1 }
      p += 1
    }
    b
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(r: Array[Double]): Seq[Double] = r.toSeq

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
