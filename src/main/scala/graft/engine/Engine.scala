package graft.engine

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Checkpoints.DatasetCheckpointOps
import graft.dialect.Dialect
import graft.rules._

/** The ETL execution engine: runs parsed rules as DataFrame pipelines.
  *
  * The reference compiles rules to a PostgreSQL script
  * (`omop_etl/generation.py`); this engine expresses the same semantics
  * directly as Catalyst logical plans. Statement shapes map as:
  *
  *  - mapping-table build (A14) → per-source natural-key SELECT →
  *    `unionByName(allowMissingColumns)` in declaration order → dense
  *    surrogate ids ([[DenseId]]).
  *  - `UPDATE … FROM` per column (A15) → rule SELECT (spine ⋈ sources,
  *    conjunctive WHERE — Catalyst turns filtered cross joins into real
  *    joins) → collapse to one row per id → left-join overlay with a
  *    matched-marker: matched rows take the new value (even when NULL,
  *    matching UPDATE semantics), unmatched rows keep the old.
  *  - FK remap (A16) → join the referenced spine on its natural-key column,
  *    non-null-gated; emit its surrogate id.
  *  - constants (A17) → unconditional `withColumn(lit)`.
  *  - scripts/temp tables (A8/A12/A19) → `spark.sql` + temp views; plpgsql
  *    function scripts resolve against a caller-supplied UDF registry
  *    (SURVEY.md §7.6).
  *
  * Two-phase schedule (`__main__.py:81-88`): all dependencies, then every
  * table's initialization (spines materialized + cached — each spine is
  * reused by all of its table's column rules and by other tables'
  * `references`), then every table's column updates.
  */
class Engine(
    spark: SparkSession,
    val udfs: Map[String, SparkSession => Unit] = Map.empty,
    val dropTables: Boolean = false) {

  // graft's native SQL functions (vec_dot, misra_gries) are always in scope
  // for rule expressions — the engine-level analogue of installing an
  // extension in the reference's Postgres target database
  graft.functions.GraftFunctions.install(spark)

  /** target table name → mapping spine (id + one column per source natural
    * key, named `<table>_<col>`)
    */
  val mappings: mutable.Map[String, DataFrame] = mutable.Map.empty

  /** target table name → current overlay state */
  val targets: mutable.Map[String, DataFrame] = mutable.Map.empty

  private val tempViews: mutable.Set[String] = mutable.Set.empty

  /** Generated-statement ledger, one entry per emitted SQL statement —
    * the rebuild's analogue of the reference's statement IR
    * (`generation.py`), pinned by the §2.C statement-count fingerprint
    * tests (`tests/test_translation.py:378-399`) and dumped by
    * [[Etl.compileDirectory]]. Kinds: `script`, `temp_table` (one per
    * CREATE TEMP TABLE), `spine_select` (one per pk source), `skeleton`
    * (one per table — the reference's
    * `INSERT INTO omop.t (pk) SELECT id FROM mapping.t`,
    * `schema.py:320-328`), `column_update` (one per enabled column rule),
    * `drop_table` (one per table when `dropTables` is set — the
    * `--drop-tables` ledger entry emitted by [[initialize]]).
    */
  val statementLog: mutable.Buffer[Engine.Statement] = mutable.Buffer.empty

  /** Every temp view THIS engine registered in the session — so a shared
    * session can be restored to its prior state ([[cleanup]]): the API
    * server translates many unrelated documents against one SparkSession,
    * and a leaked `mapping_*`/pre-init view would let a later rule that
    * references an undefined view silently resolve against another
    * document's state instead of failing like the stateless reference API.
    */
  private val createdViews: mutable.Set[String] = mutable.Set.empty

  private def registerView(name: String, df: DataFrame): Unit = {
    df.createOrReplaceTempView(name)
    createdViews += name
  }

  /** Drop every temp view this engine registered (request-scoped hosts call
    * this in a finally; a CLI run that exits with the JVM can skip it). */
  def cleanup(): Unit = {
    createdViews.foreach(spark.catalog.dropTempView(_))
    createdViews.clear()
  }

  /** Register a source table under its schema-qualified view name. */
  def registerSource(schema: String, name: String, df: DataFrame): Unit =
    registerView(s"${schema}_$name", df)

  /** Pre-seed a mapping spine (the event fixture does this:
    * `tests/test_integration.py:700-727` seeds mapping.person externally).
    */
  def seedMapping(table: String, df: DataFrame): Unit = {
    mappings(table) = df
    registerView(s"mapping_$table", df)
  }

  private def schemas(dep: DependencyParts): Set[String] =
    Dialect.KnownSchemas ++ dep.defaultSchema

  private def sql(text: String): DataFrame = spark.sql(text)

  private def translate(fragment: String, dep: DependencyParts): String =
    Dialect.translate(fragment, schemas(dep))

  /** Resolve a source reference to a FROM-clause item exposing the bare
    * alias, mirroring Postgres name resolution (explicit schema → temp
    * table → default schema; `schema.py:92-102`).
    */
  private def fromItem(ref: SourceRef, dep: DependencyParts): String = ref match {
    case QueryRef(alias, query) => s"(${translate(query, dep)}) AS $alias"
    case TableRef(alias, schemaOpt) =>
      val schema = schemaOpt.orElse(
        if (tempViews.contains(alias)) None else dep.defaultSchema.orElse(Some("cerner")))
      schema match {
        case Some(s) => s"${s}_$alias AS $alias"
        case None => alias // session temp view
      }
  }

  private def refAlias(ref: SourceRef): String = ref match {
    case QueryRef(alias, _) => alias
    case TableRef(alias, _) => alias
  }

  /** Run scripts + pre-init temp tables (`schema.py:349-359`). Scripts that
    * define functions dispatch to the UDF registry; other scripts run as
    * `spark.sql` and parse failures are tolerated (the reference hands
    * scripts verbatim to Postgres; `TRUE;` in `tests/rules/dep.yaml:2`).
    */
  private def runScripts(rule: Rule): Unit =
    rule.dep.scripts.foreach { script =>
      // the optional schema qualifier must not win the capture:
      // `CREATE FUNCTION public.fn_age` registers as 'fn_age', not 'public'
      val fn = "(?is)create\\s+(or\\s+replace\\s+)?function\\s+(?:\\w+\\.)?(\\w+)".r
        .findFirstMatchIn(script).map(_.group(2))
      statementLog += Engine.Statement(rule.name, "script", script)
      fn match {
        case Some(name) =>
          udfs.get(name) match {
            case Some(install) => install(spark)
            case None => throw new IllegalArgumentException(
              s"rule '${rule.name}': script defines function '$name' with no " +
                "registered Scala implementation (plpgsql is not translatable; SURVEY.md §7.6)")
          }
        case None =>
          try sql(translate(script, rule.dep)).collect()
          catch {
            case e @ (_: org.apache.spark.sql.AnalysisException |
                      _: org.apache.spark.sql.catalyst.parser.ParseException) =>
              // tolerated (the reference hands scripts verbatim to Postgres —
              // `TRUE;` in `tests/rules/dep.yaml:2` must no-op) but NOT
              // silent: a typo'd real setup script would error in Postgres,
              // so a rules author needs the rule name and the reason.
              System.err.println(
                s"[graft] rule '${rule.name}': setup script ignored " +
                  s"(${e.getMessage.linesIterator.nextOption().getOrElse("")})")
          }
      }
    }

  private def runTempTables(rule: String, qs: Seq[QueryRef], dep: DependencyParts): Unit =
    qs.foreach { q =>
      // materialized like Postgres CREATE TEMP TABLE … AS
      // (`generation.py:106-112`) — an eager localCheckpoint, not persist:
      // computed exactly once at creation (CREATE TEMP TABLE semantics),
      // blocks auto-released when the engine is dropped, no session-lifetime
      // CacheManager entry
      statementLog += Engine.Statement(rule, "temp_table", translate(q.query, dep))
      val df = sql(translate(q.query, dep)).graftCheckpoint()
      registerView(q.alias, df)
      tempViews += q.alias
    }

  /** Phase-1 for one table: pre-init, spine build + omop skeleton, post-init
    * (`schema.py:449-461`).
    */
  def initialize(rule: TableRule): Unit = {
    runScripts(rule)
    runTempTables(rule.name, rule.dep.preInit, rule.dep)

    // `--drop-tables` (`__main__.py:41,70`; `schema.py:269-271`): the
    // reference prepends DROP TABLE IF EXISTS to each mapping build. This
    // engine always overwrites its in-session state (drop semantics are
    // implicit — A6 idempotency), so the flag affects the LEDGER only.
    if (dropTables)
      statementLog += Engine.Statement(rule.name, "drop_table",
        s"DROP TABLE IF EXISTS mapping.${rule.name}")

    val perSource = rule.primaryKey.sources.zipWithIndex.map {
      case ((_, src), ordinal) =>
        val tableRef = refAlias(src.table)
        val selectCols = src.columns.map { case (c, dtype) =>
          s"CAST($tableRef.$c AS ${Dialect.sparkType(dtype)}) AS ${tableRef}_$c"
        }.mkString(", ")
        val where =
          if (src.constraints.isEmpty) ""
          else " WHERE " + src.constraints.map(c => s"(${translate(c, rule.dep)})").mkString(" AND ")
        val text = s"SELECT $selectCols FROM ${fromItem(src.table, rule.dep)}$where"
        statementLog += Engine.Statement(rule.name, "spine_select", text)
        val df = sql(text)
        df.withColumn("__ord", lit(ordinal))
    }

    val unioned = perSource.reduce(_.unionByName(_, allowMissingColumns = true))
    val keyCols = unioned.columns.filter(_ != "__ord").toSeq
    val spine = DenseId
      .withDenseId(unioned, "id", col("__ord") +: keyCols.map(col))
      .drop("__ord")
      .select("id", keyCols: _*)

    mappings(rule.name) = spine
    registerView(s"mapping_${rule.name}", spine)

    // `insert into omop.t (pk) select mapping.t.id from mapping.t`
    // (`schema.py:320-328`): the target starts as the bare key skeleton.
    statementLog += Engine.Statement(rule.name, "skeleton",
      s"INSERT INTO omop.${rule.name} (${rule.primaryKey.name}) " +
        s"SELECT id FROM mapping.${rule.name}")
    targets(rule.name) = spine.select(col("id").as(rule.primaryKey.name))

    runTempTables(rule.name, rule.dep.postInit, rule.dep)
  }

  /** Phase-2 for one table: apply its column rules in declaration order
    * (order is semantic — last write wins; SURVEY.md §7.5).
    *
    * Scale shape: the naive translation left-joins the full target once per
    * column rule — C shuffles of the biggest table. Instead, rules are
    * folded per column (later-rule-wins = rank by rule index over the
    * union of the per-rule outputs — these are keyed rule-output frames,
    * small relative to the target), the per-column finals are outer-joined
    * on the surrogate id, and the target is joined ONCE. A constant rule
    * (A17) overwrites every row, so it kills all earlier rules for its
    * column and becomes the column's default value. Falls back to the
    * sequential overlay when a column's rules produce incompatible value
    * types (the ranked union needs one type; the reference relies on the
    * target DDL cast there).
    */
  def process(rule: TableRule): Unit = {
    val pkName = rule.primaryKey.name

    // column name → (rules with global index), first-appearance order
    val indexed = rule.columns.zipWithIndex.filter(!_._1.isInstanceOf[DisabledColumn])
    val colOrder = indexed.map(_._1.name).distinct
    val byColumn = colOrder.map(c => c -> indexed.filter(_._1.name == c))

    case class ColPlan(name: String, default: Option[Any], folded: Option[DataFrame])

    val plans = byColumn.map { case (colName, rs) =>
      val lastConstIdx = rs.collect { case (c: ConstantColumn, i) => i }.lastOption
      val default = lastConstIdx.map(i =>
        rs.collect { case (c: ConstantColumn, `i`) => c.constant }.head)
      val keyed = rs.collect {
        case (tc: TargetColumn, i) if lastConstIdx.forall(i > _) => (tc, i)
      }
      val perRule = keyed.map { case (tc, i) =>
        columnRuleSelect(rule, tc).dropDuplicates("__id")
          .withColumn("__ridx", lit(i))
      }
      val types = perRule.map(_.schema("__val").dataType).distinct
      if (perRule.isEmpty) ColPlan(colName, default, None)
      else if (types.size > 1) {
        // incompatible rule value types → sequential overlay fallback
        // (reuses the already-analyzed perRule frames: no second
        // columnRuleSelect pass, no duplicate statementLog entries)
        var t = targets(rule.name)
        default.foreach(v => t = t.withColumn(colName, lit(v)))
        perRule.foreach { f =>
          t = Overlay(t, pkName, colName, f.select("__id", "__val"))
        }
        targets(rule.name) = t
        ColPlan(colName, None, None)
      } else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__id")).orderBy(col("__ridx").desc)
        val folded = perRule.reduce(_.unionByName(_))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("__id"), col("__val").as(s"__val_$colName"),
            lit(1).as(s"__m_$colName"))
        ColPlan(colName, default, Some(folded))
      }
    }

    val withFinals = plans.filter(_.folded.isDefined)
    val combined = withFinals.map(_.folded.get)
      .reduceOption(_.join(_, Seq("__id"), "full_outer"))

    var target = targets(rule.name)
    combined match {
      case Some(c) =>
        target = target.join(c, target(pkName) === c("__id"), "left")
      case None => ()
    }
    plans.foreach { p =>
      if (p.folded.isDefined) {
        val prior: org.apache.spark.sql.Column = p.default.map(lit)
          .getOrElse(if (target.columns.contains(p.name)) col(p.name) else lit(null))
        target = target.withColumn(p.name,
          when(col(s"__m_${p.name}").isNotNull, col(s"__val_${p.name}")).otherwise(prior))
      } else if (p.default.isDefined) {
        // constants-only column (or fallback already applied its default)
        target = target.withColumn(p.name, lit(p.default.get))
      }
    }
    targets(rule.name) = target
      .drop("__id")
      .drop(withFinals.flatMap(p => Seq(s"__val_${p.name}", s"__m_${p.name}")): _*)
  }

  /** Build `SELECT <spine id> AS __id, <expr> AS __val FROM mapping ⋈ rule
    * tables WHERE pk-link ∧ constraints [∧ fk-gate]` for one column rule —
    * the translation of `UpdateStatement` (`generation.py:159-189`,
    * `schema.py:207-245`).
    */
  private def columnRuleSelect(rule: TableRule, tc: TargetColumn): DataFrame = {
    val dep = rule.dep
    val mapView = s"mapping_${rule.name} AS ${rule.name}"
    val (_, pkSource) = rule.primaryKey.sources.find(_._1 == tc.primaryKey)
      .getOrElse(throw new IllegalStateException(
        s"rule '${rule.name}': column '${tc.name}' references unknown pk source '${tc.primaryKey}'"))

    val srcAlias = refAlias(pkSource.table)
    // pk-link: `<src>.<c> = mapping.<t>.<src>_<c>` per natural-key column
    // (`schema.py:277-310`); the `omop.t.pk = mapping.t.id` predicate becomes
    // the overlay join.
    val pkLink = pkSource.columns.map { case (c, _) =>
      s"$srcAlias.$c = ${rule.name}.${srcAlias}_$c"
    }

    val fromItems = mutable.ListBuffer(mapView)
    fromItems ++= tc.tables.map(fromItem(_, dep))
    // if the pk source is not among the rule tables, it still participates
    // via the pk-link (the reference's FROM always re-lists rule tables; the
    // mapping columns carry the keys, so the source itself is only needed
    // when referenced — rule tables always include it in shipped rules).

    val preds = mutable.ListBuffer[String]()
    preds ++= pkLink
    preds ++= tc.constraints.map(c => translate(c, dep))

    var valueExpr = translate(tc.expression, dep)
    tc.references.foreach { case FkRef(refTable, refCol) =>
      // A16: join the referenced spine, non-null gate, emit its surrogate id
      // (`schema.py:226-239`; unmatched FK → row unmatched → value stays
      // NULL, golden `tests/test_integration.py:748-751`).
      fromItems += s"mapping_$refTable AS $refTable"
      preds += s"$refTable.$refCol IS NOT NULL"
      preds += s"$refTable.$refCol = $valueExpr"
      valueExpr = s"$refTable.id"
    }

    val text =
      s"""SELECT ${rule.name}.id AS __id, ($valueExpr) AS __val
         |FROM ${fromItems.mkString(", ")}
         |WHERE ${preds.map(p => s"($p)").mkString(" AND ")}""".stripMargin
    statementLog += Engine.Statement(rule.name, "column_update", text)
    // attach rule/column context to analysis errors — the reference only
    // surfaces raw Postgres errors at script-run time (`__main__.py:137-142`);
    // a rules author needs to know WHICH rule produced the bad SQL
    try sql(text)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"rule '${rule.name}', column '${tc.name}': ${e.getMessage}\n  generated SQL: $text", e)
    }
  }

  /** A13 — the reference's required-column cleanup (generated but never
    * wired into an entry point, `schema.py:426-428`): drop rows whose
    * required columns are NULL. Exposed for callers that want the DELETE
    * semantics the reference intended.
    */
  def enforceRequired(df: DataFrame, requiredCols: Seq[String]): DataFrame =
    requiredCols.filter(df.columns.contains) match {
      case Nil => df
      case cols => df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    }

  /** Run a full rule set with the reference's global two-phase schedule. */
  def run(rules: Seq[Rule]): Map[String, DataFrame] = {
    val (deps, tables) = rules.partitionMap {
      case d: DependencyRule => Left(d)
      case t: TableRule => Right(t)
    }
    deps.foreach { d =>
      runScripts(d)
      runTempTables(d.name, d.dep.preInit, d.dep)
      runTempTables(d.name, d.dep.postInit, d.dep)
    }
    // `depends_on` env inheritance (`__main__.py:67-80`): each dependency
    // file with a non-null `default_schema` overwrites the dependent table's
    // DefaultSchema, in depends_on order (last wins). The dep's TempTables
    // need no counterpart: temp views are engine-global here, a superset of
    // the reference's per-table TempTables union.
    val depSchema: Map[String, String] =
      deps.flatMap(d => d.dep.defaultSchema.map(d.name -> _)).toMap
    val effective = tables.map { t =>
      t.dep.dependsOn.flatMap(depSchema.get).lastOption match {
        case Some(s) => t.copy(dep = t.dep.copy(defaultSchema = Some(s)))
        case None => t
      }
    }
    effective.foreach(initialize)
    effective.foreach(process)
    targets.toMap
  }
}

object Engine {
  /** One generated SQL statement, attributed to the rule that emitted it. */
  case class Statement(rule: String, kind: String, sql: String)
}

/** UPDATE…FROM as a left-join overlay (SURVEY.md §7.5). */
object Overlay {

  /** Overlay `ruleDf` (columns `__id`, `__val`) onto `target.colName`:
    * matched rows take `__val` (including NULL — UPDATE sets the column
    * unconditionally on match), unmatched rows keep their prior value.
    * Multi-match collapses to one arbitrary row per id, mirroring Postgres
    * UPDATE…FROM nondeterminism while keeping row counts stable.
    */
  def apply(target: DataFrame, pkName: String, colName: String, ruleDf: DataFrame): DataFrame = {
    val collapsed = ruleDf
      .dropDuplicates("__id")
      .withColumn("__matched", lit(1))
    val prior: org.apache.spark.sql.Column =
      if (target.columns.contains(colName)) col(colName) else lit(null)
    target
      .join(collapsed, target(pkName) === collapsed("__id"), "left")
      .withColumn(colName, when(col("__matched").isNotNull, col("__val")).otherwise(prior))
      .drop("__id", "__val", "__matched")
  }
}
