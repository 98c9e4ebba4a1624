package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import graft.expressions.{FloatDotProduct, IntersectionSize, MinHashScheme, MinHashSignature, SimHash64, TokenHashArray}

/** SQL-surface registration for graft's custom Catalyst expressions,
  * so `spark.sql("SELECT float_dot(a, b) ...")` works alongside the
  * Column API.
  */
object GraftFunctions {

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float_dot" -> (exprs => FloatDotProduct(exprs(0), exprs(1))),
    "minhash_signature" -> (exprs => MinHashSignature(exprs(0), MinHashScheme.numHashes)),
    // token_hashes(text[, mod]) — mod defaults to 0 (raw 60-bit hashes)
    "token_hashes" -> (exprs => TokenHashArray(exprs(0), exprs.lift(1) match {
      case Some(Literal(m: Long, _)) => m
      case Some(Literal(m: Int, _))  => m.toLong
      case None => 0L
      case other => sys.error(s"token_hashes mod must be an integer literal, got $other")
    })),
    "simhash64" -> (exprs => SimHash64(exprs(0), 60)),
    "intersection_size" -> (exprs => IntersectionSize(exprs(0), exprs(1))))

  /** Idempotent per-session registration (temp functions). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => GraftSqlBridge.registerFunction(spark, name, b) }
}

/** Builder-time variant: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or `spark.sql.extensions=graft.GraftExtensions`)
  * injects the functions into every session derived from the builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftFunctions.type].getName, name), b))
    }
    e.injectOptimizerRule(_ => graft.plans.RewriteSetIntersectionSize)
  }
}
