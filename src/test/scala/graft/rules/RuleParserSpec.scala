package graft.rules

import org.scalatest.funsuite.AnyFunSuite

/** Parser behaviors pinned by the reference's parsing tests
  * (`/root/reference/tests/test_parsing.py`) and pydantic quirks
  * (SURVEY.md §1.3).
  */
class RuleParserSpec extends AnyFunSuite {

  test("single-source table with pk autofill (copy.yaml shape)") {
    val r = RuleParser.parseTable("copy", """
      |name: baz
      |primary_key:
      |  name: id
      |  sources:
      |    foo_pk:
      |      table: foo
      |      columns:
      |        id: integer
      |columns:
      |  - name: alpha
      |    enabled: true
      |    tables: [foo]
      |    expression: foo.alpha
      |  - name: beta
      |    tables: [foo, bar]
      |    constraints:
      |      - foo.id = bar.id
      |    primary_key: foo_pk
      |    expression: bar.beta
      |""".stripMargin)
    assert(r.name == "baz")
    assert(r.primaryKey.name == "id")
    assert(r.primaryKey.sources.map(_._1) == Seq("foo_pk"))
    val cols = r.columns.collect { case t: TargetColumn => t }
    assert(cols.map(_.name) == Seq("alpha", "beta"))
    // pk autofilled from the single source (`schema.py:393-401`)
    assert(cols.head.primaryKey == "foo_pk")
    assert(cols(1).constraints == Seq("foo.id = bar.id"))
    assert(cols(1).tables == Seq(TableRef("foo", None), TableRef("bar", None)))
  }

  test("multi-source order is preserved (merge.yaml shape)") {
    val r = RuleParser.parseTable("merge", """
      |name: baz
      |primary_key:
      |  name: id
      |  sources:
      |    foo_pk: {table: foo, columns: {id: integer}}
      |    bar_pk: {table: bar, columns: {id: integer}}
      |columns:
      |  - {name: alpha, tables: [foo], primary_key: foo_pk, expression: foo.alpha}
      |  - {name: alpha, tables: [bar], primary_key: bar_pk, expression: bar.alpha}
      |""".stripMargin)
    assert(r.primaryKey.sources.map(_._1) == Seq("foo_pk", "bar_pk"))
  }

  test("column variants: disabled beats target beats constant; unknown keys ignored") {
    val r = RuleParser.parseTable("c", """
      |name: baz
      |data_type: bogus
      |primary_key:
      |  name: id
      |  constraints:
      |    - silently dropped (`tests/rules/custom_query.yaml:31-32`)
      |  sources:
      |    s: {table: foo, columns: {id: integer}}
      |columns:
      |  - column:
      |    name: alpha
      |    data_type: integer
      |    constant: alpha
      |  - name: beta
      |    constant: 1
      |  - name: dis
      |    enabled: false
      |""".stripMargin)
    assert(r.columns == Seq(
      ConstantColumn("alpha", "alpha"),
      ConstantColumn("beta", 1),
      DisabledColumn("dis")))
  }

  test("references: both YAML forms (`tests/rules/event.yaml:57-68`)") {
    val r = RuleParser.parseTable("event", """
      |name: events
      |primary_key:
      |  name: id
      |  sources:
      |    event_pk: {table: event, columns: {id: integer}}
      |columns:
      |  - name: staff_id
      |    tables: [event]
      |    primary_key: event_pk
      |    references:
      |      table: person
      |      column: staff_id
      |    expression: event.staff_id
      |  - name: patient_id
      |    tables: [event]
      |    primary_key: event_pk
      |    references:
      |      person:
      |        table: patient
      |        column: id
      |    expression: event.patient_id
      |""".stripMargin)
    val refs = r.columns.collect { case t: TargetColumn => t.references }
    assert(refs == Seq(Some(FkRef("person", "staff_id")), Some(FkRef("person", "patient_id"))))
  }

  test("YAML anchors resolve; inline query tables parse (custom_query.yaml shape)") {
    val r = RuleParser.parseTable("cq", """
      |variables:
      |  foo_table: &foo_table
      |    alias: foo
      |    query: select 1 as id
      |name: baz
      |primary_key:
      |  name: id
      |  sources:
      |    foo: {table: *foo_table, columns: {id: integer}}
      |columns:
      |  - {name: alpha, tables: [*foo_table], expression: foo.alpha, primary_key: foo}
      |""".stripMargin)
    assert(r.primaryKey.sources.head._2.table == QueryRef("foo", "select 1 as id"))
    assert(r.columns.head.asInstanceOf[TargetColumn].tables ==
      Seq(QueryRef("foo", "select 1 as id")))
  }

  test("schema-qualified table refs parse (external.yaml shape)") {
    val r = RuleParser.parseTable("e", """
      |name: baz
      |primary_key:
      |  name: id
      |  sources:
      |    s: {table: foo, columns: {id: integer}}
      |columns:
      |  - name: alpha
      |    tables: [foo, external.vocabulary]
      |    constraints: [foo.id = external.vocabulary.id]
      |    expression: external.vocabulary.name
      |""".stripMargin)
    val tc = r.columns.head.asInstanceOf[TargetColumn]
    assert(tc.tables == Seq(TableRef("foo", None), TableRef("vocabulary", Some("external"))))
  }

  test("non-table file falls back to Dependency (`__main__.py:25-27`)") {
    val r = RuleParser.parse("dep", """
      |scripts:
      |  - TRUE;
      |pre_init:
      |  - alias: temp_table_4
      |    query: select 1 as id
      |""".stripMargin)
    val d = r.asInstanceOf[DependencyRule]
    assert(d.dep.scripts == Seq("TRUE;"))
    assert(d.dep.preInit == Seq(QueryRef("temp_table_4", "select 1 as id")))
  }

  test("dangling column pk ref fails table parse (`schema.py:403-414`)") {
    val yaml = """
      |name: baz
      |primary_key:
      |  name: id
      |  sources:
      |    s: {table: foo, columns: {id: integer}}
      |columns:
      |  - {name: a, tables: [foo], expression: foo.a, primary_key: nope}
      |""".stripMargin
    intercept[RuleParser.RuleParseException](RuleParser.parseTable("bad", yaml))
    // …and the tolerant entry point degrades it to a Dependency
    assert(RuleParser.parse("bad", yaml).isInstanceOf[DependencyRule])
  }
}
