package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Static consistency of the driver contract: every oracle has a façade
  * query, and every façade query analyzes to a sane schema. The driver's
  * correctness gate compares column-name-sorted hashes, so a duplicate or
  * drifting column name breaks it at the DRIVER — these guards break it at
  * `sbt test` instead.
  */
class FacadeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every oracleSql key is a registered façade query") {
    val missing = OracleSql.sql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without a façade query: $missing")
  }

  test("every façade query constructs: resolvable plan, non-empty distinct column names") {
    // "constructs", not "statically analyzes": facades whose bodies do
    // eager work (format round-trip writes, index builds, k-seed collects)
    // run that work here at sf0.001 — subsecond each, and failures in those
    // paths are exactly what this sweep should surface before the driver does
    val bad = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        val schema = fn(spark, dir).schema
        val names = schema.fields.map(_.name)
        if (names.isEmpty) Some(s"$name: empty schema")
        else if (names.distinct.length != names.length)
          Some(s"$name: duplicate column names ${names.mkString(",")}")
        else if (names.exists(_.trim.isEmpty)) Some(s"$name: blank column name")
        else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
