package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregator (the UDAF row of SURVEY §2.2): geometric
  * mean via log-sum — associative/commutative partial state
  * (Σ ln x, n), so Spark plans it partial+final like any built-in
  * aggregate; no per-group materialization.
  */
object GeoMeanAgg extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    (b._1 + math.log(a), b._2 + 1)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Long)): Double = math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] = Encoders.product[(Double, Long)]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
