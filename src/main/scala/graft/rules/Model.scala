package graft.rules

/** Case-class rule model mirroring the reference's pydantic object model
  * (`/root/reference/omop_etl/schema.py`; SURVEY.md §1.3).
  *
  * Field semantics (with reference citations):
  *  - [[TableRef]] — bare or `schema.`-qualified name (`schema.py:76-107`).
  *  - [[QueryRef]] — inline subquery `{alias, query}` (`schema.py:60-73`).
  *  - [[PrimaryKeySource]] — natural-key columns + optional constraints
  *    (`schema.py:128-162`); `columns` order is load-bearing (mapping-table
  *    column order).
  *  - [[PrimaryKey]] — `sources` order is load-bearing: surrogate ids are
  *    assigned in source-declaration order (`schema.py:317-319`).
  *  - Column variants discriminated by shape, in the reference's union order
  *    disabled → target → constant (`schema.py:381`).
  *  - [[FkRef]] — FK remap; two YAML forms (`schema.py:226-239`).
  */
sealed trait SourceRef
case class TableRef(alias: String, schema: Option[String]) extends SourceRef
case class QueryRef(alias: String, query: String) extends SourceRef

case class PrimaryKeySource(
    table: SourceRef,
    columns: Seq[(String, String)], // (column, declared pg type) in order
    constraints: Seq[String])

case class PrimaryKey(
    name: String,
    sources: Seq[(String, PrimaryKeySource)]) // (source alias, source) in order

/** FK remap target: `mappingTable` = which mapping spine to join,
  * `mappingColumn` = which natural-key column of that spine to match.
  * Simple form `{table, column}` → mappingTable=table, mappingColumn=column
  * used as-is (`tests/rules/event.yaml:57-59`); dict form
  * `{key: {table, column}}` → mappingTable=key, mappingColumn=`<table>_<column>`
  * (`tests/rules/event.yaml:65-68`, `schema.py:231-233`).
  */
case class FkRef(mappingTable: String, mappingColumn: String)

sealed trait ColumnRule { def name: String }
case class DisabledColumn(name: String) extends ColumnRule
case class ConstantColumn(name: String, constant: Any) extends ColumnRule
case class TargetColumn(
    name: String,
    tables: Seq[SourceRef],
    constraints: Seq[String],
    expression: String,
    primaryKey: String, // which PK source this rule keys on (autofilled if 1 source)
    references: Option[FkRef]) extends ColumnRule

/** Script-only / setup fields shared by dependency files and target tables
  * (`schema.py:335-375`).
  */
case class DependencyParts(
    defaultSchema: Option[String],
    preInit: Seq[QueryRef],
    postInit: Seq[QueryRef],
    scripts: Seq[String],
    dependsOn: Seq[String])

sealed trait Rule { def name: String; def dep: DependencyParts }

/** A YAML file that failed TargetTable validation and re-parsed as a bare
  * dependency (`__main__.py:25-27`).
  */
case class DependencyRule(name: String, dep: DependencyParts) extends Rule

case class TableRule(
    name: String, // rule name == target table name
    primaryKey: PrimaryKey,
    columns: Seq[ColumnRule],
    dep: DependencyParts) extends Rule
