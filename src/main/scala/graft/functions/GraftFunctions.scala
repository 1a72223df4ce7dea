package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL-surface registration for graft's native expressions, so `spark.sql`
  * users (and rule files) can call them by name: `vec_dot(a, b)`.
  *
  * Two paths, both standard Spark:
  *  - [[install]] — imperative, per-session;
  *  - [[GraftExtensions]] — `SparkSessionExtensions` injection for
  *    `spark.sql.extensions=graft.functions.GraftExtensions` (how a cluster
  *    deployment would wire it).
  */
object GraftFunctions {

  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => RewriteSortedOverlap)
  }
}
