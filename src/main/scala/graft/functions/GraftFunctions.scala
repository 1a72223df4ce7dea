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

  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries", exprs => mkMisraGries(exprs), "scala_udf")
  }

  /** `misra_gries(token, capacity)` — capacity must be a literal int. */
  private[functions] def mkMisraGries(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): MisraGriesAgg = {
    require(exprs.length == 2,
      s"misra_gries takes (token, capacity), got ${exprs.length} argument(s)")
    val cap = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"misra_gries capacity must be an integer literal, got $other")
    }
    MisraGriesAgg(exprs(0), cap)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("misra_gries"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MisraGriesAgg].getName, "misra_gries"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.mkMisraGries(exprs)))
    e.injectOptimizerRule(_ => RewriteSortedOverlap)
  }
}
