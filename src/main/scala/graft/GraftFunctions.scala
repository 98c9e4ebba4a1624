package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expressions.{FloatDotProduct, MinHashScheme, MinHashSignature}

/** SQL-surface registration for graft's custom Catalyst expressions,
  * so `spark.sql("SELECT float_dot(a, b) ...")` works alongside the
  * Column API.
  */
object GraftFunctions {

  /** Idempotent per-session registration (temp functions). */
  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "float_dot",
      exprs => FloatDotProduct(exprs(0), exprs(1)))
    GraftSqlBridge.registerFunction(spark, "minhash_signature",
      exprs => MinHashSignature(exprs(0), MinHashScheme.numHashes))
  }
}

/** Builder-time variant: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or `spark.sql.extensions=graft.GraftExtensions`)
  * injects the functions into every session derived from the builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      exprs => FloatDotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      exprs => MinHashSignature(exprs(0), MinHashScheme.numHashes)))
  }
}
