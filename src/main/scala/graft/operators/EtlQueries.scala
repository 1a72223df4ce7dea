package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.{Engine, Overlay}
import graft.rules.RuleParser
import graft.sources.Tables

/** The ETL engine's composite operators (SURVEY.md §2.A A14-A17), exercised
  * on the driver's synthetic tables so they flow through the DuckDB-oracle
  * gate like every other operator.
  */
object EtlQueries {

  private def engineOn(s: SparkSession, dir: String, names: String*): Engine = {
    val e = new Engine(s)
    names.foreach(n => e.registerSource("cerner", n, Tables.load(s, dir, n)))
    e
  }

  /** A14 — multi-source merge with dense, source-ordered surrogate ids: the
    * reference's mapping-table build, driven end-to-end through the YAML rule
    * path on customer+supplier.
    */
  def q12_spine_merge(s: SparkSession, dir: String): DataFrame = {
    val rule = RuleParser.parse("party", """
      |name: party
      |primary_key:
      |  name: id
      |  sources:
      |    customer: {table: customer, columns: {c_custkey: bigint}}
      |    supplier: {table: supplier, columns: {s_suppkey: bigint}}
      |columns:
      |  - {name: is_cust, constant: 1}
      |""".stripMargin)
    engineOn(s, dir, "customer", "supplier").run(Seq(rule))("party")
    val spine = s.table("mapping_party")
    spine.select(
      col("id"),
      col("customer_c_custkey").as("customer_key"),
      col("supplier_s_suppkey").as("supplier_key"))
      .orderBy("id")
  }

  /** A16 — FK remapping: orders' customer FK rewritten to the customer
    * spine's surrogate id, via the rule-file `references` path.
    */
  def q13_fk_remap(s: SparkSession, dir: String): DataFrame = {
    val custRule = RuleParser.parse("cust", """
      |name: cust
      |primary_key:
      |  name: id
      |  sources:
      |    c: {table: customer, columns: {c_custkey: bigint}}
      |columns:
      |  - {name: src, constant: customer}
      |""".stripMargin)
    val ordRule = RuleParser.parse("ord", """
      |name: ord
      |primary_key:
      |  name: id
      |  sources:
      |    o: {table: orders, columns: {o_orderkey: bigint}}
      |columns:
      |  - name: cust_sid
      |    tables: [orders]
      |    primary_key: o
      |    references: {table: cust, column: customer_c_custkey}
      |    expression: orders.o_custkey
      |""".stripMargin)
    engineOn(s, dir, "customer", "orders")
      .run(Seq(custRule, ordRule))("ord")
      .orderBy("id")
  }

  /** A15/A11 — UPDATE…FROM as left-join overlay: finalized-order totals
    * overwrite the account balance where present; unmatched customers keep
    * the prior value.
    */
  def q11_overlay(s: SparkSession, dir: String): DataFrame = {
    val target = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal").cast(DecimalType(12, 2)).as("bal"))
    val ruleDf = Tables.load(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(DecimalType(38, 2)).as("__val"))
      .select(col("o_custkey").as("__id"), col("__val"))
    Overlay(target, "c_custkey", "bal", ruleDf)
      .withColumn("bal", col("bal").cast("double"))
      .orderBy("c_custkey")
  }
}
