package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.rules.RuleParser

/** §2.C statement-count fingerprints: the engine's generated-statement
  * ledger mirrors the reference's `translate()` statement list, and the
  * counts move the same way when columns are disabled/re-enabled
  * (`/root/reference/tests/test_translation.py:378-399` — copy.yaml is 5
  * statements there: create + 2 inserts + 2 updates; here the spine build
  * is one statement per pk source, so copy.yaml is 4: spine_select +
  * skeleton + 2 column_updates. The DELTA per toggled column is identical).
  */
class TranslationShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def copyYaml(alphaEnabled: Boolean, betaEnabled: Boolean): String = s"""
    |name: baz
    |primary_key:
    |  name: id
    |  sources:
    |    foo_pk: {table: foo, columns: {id: integer}}
    |columns:
    |  - {name: alpha, enabled: $alphaEnabled, tables: [foo], expression: foo.alpha}
    |  - name: beta
    |    enabled: $betaEnabled
    |    tables: [foo, bar]
    |    constraints: [foo.id = bar.id]
    |    primary_key: foo_pk
    |    expression: bar.beta
    |""".stripMargin

  private def ledger(yaml: String): Seq[Engine.Statement] = {
    val e = new Engine(spark)
    e.registerSource("cerner", "foo",
      Seq((0, "a", 4), (1, "c", 5)).toDF("id", "alpha", "beta"))
    e.registerSource("cerner", "bar",
      Seq((0, "x", 8), (1, "a", 4)).toDF("id", "alpha", "beta"))
    e.run(Seq(RuleParser.parse("copy", yaml)))
    e.statementLog.toSeq
  }

  test("copy.yaml statement counts track disabled columns (`test_translation.py:378-399`)") {
    assert(ledger(copyYaml(true, true)).size == 4)
    assert(ledger(copyYaml(false, true)).size == 3)
    assert(ledger(copyYaml(false, false)).size == 2)
    assert(ledger(copyYaml(true, false)).size == 3)
    assert(ledger(copyYaml(true, true)).size == 4)
  }

  test("statement kinds and shapes are pinned") {
    val log = ledger(copyYaml(true, true))
    assert(log.map(_.kind) == Seq("spine_select", "skeleton", "column_update", "column_update"))
    val spine = log.head.sql
    assert(spine.contains("CAST(foo.id AS INT) AS foo_id"))
    assert(spine.contains("FROM cerner_foo AS foo"))
    assert(log(1).sql ==
      "INSERT INTO omop.baz (id) SELECT id FROM mapping.baz")
    // the beta rule joins its second table and carries the constraint +
    // pk-link predicates
    val beta = log(3).sql
    assert(beta.contains("cerner_bar AS bar"))
    assert(beta.contains("foo.id = bar.id"))
    assert(beta.contains("foo.id = baz.foo_id"))
  }

  test("temp tables and scripts are ledgered once each") {
    val e = new Engine(spark)
    e.registerSource("cerner", "foo", Seq((0, "a")).toDF("id", "alpha"))
    val rule = RuleParser.parse("r", """
      |name: baz
      |scripts: ["TRUE;"]
      |pre_init:
      |  - alias: pre_t
      |    query: select 1 as one
      |post_init:
      |  - alias: post_t
      |    query: select 2 as two
      |primary_key:
      |  name: id
      |  sources:
      |    foo_pk: {table: foo, columns: {id: integer}}
      |columns:
      |  - {name: alpha, tables: [foo], expression: foo.alpha}
      |""".stripMargin)
    e.run(Seq(rule))
    assert(e.statementLog.map(_.kind).toSeq ==
      Seq("script", "temp_table", "spine_select", "skeleton", "temp_table", "column_update"))
  }
}
