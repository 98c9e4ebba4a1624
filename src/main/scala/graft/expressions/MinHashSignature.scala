package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Full MinHash signature in one pass over a token-hash array.
  *
  * Input: array<long> of per-token 31-bit hashes. For each 3-token
  * window the two shingle hashes are base-1024 / base-8191 polynomials
  * g1, g2; the k-th MinHash (k < numHashes) is
  * min over windows of (g1 + k·g2) mod (2^61 − 1).
  *
  * Replaces numHashes separate `zip_with` higher-order calls (an
  * interpreted lambda per element per hash — ~6M boxed evaluations at
  * sf0.1) with one primitive JVM loop per row. CodegenFallback is fine
  * here: the per-row call does all the work internally, so there is no
  * per-element interpretation overhead to eliminate.
  *
  * Arithmetic is identical to the DuckDB oracle's
  * `list_min(list_transform(...))` mirror — signatures stay bit-exact.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  private val prime = 2305843009213693951L // 2^61 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData]
    val n = h.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i + 2 < n) {
      val a = h.getLong(i); val b = h.getLong(i + 1); val c = h.getLong(i + 2)
      val g1 = (a * 1024L + b) * 1024L + c
      val g2 = (a * 8191L + b) * 8191L + c
      var k = 0
      while (k < numHashes) {
        val v = (g1 + k * g2) % prime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    if (n < 3) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
