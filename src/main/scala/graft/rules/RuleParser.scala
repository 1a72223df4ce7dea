package graft.rules

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** YAML → rule-model parser, reproducing the reference's pydantic-v1
  * behaviors (SURVEY.md §1.3):
  *  - unknown keys are accepted and ignored (incl. `variables:` anchor
  *    workspaces, stray `- column:` keys, `data_type:`, and `constraints:`
  *    under `primary_key:` — all silently dropped);
  *  - YAML anchors/aliases resolve (free with snakeyaml);
  *  - column-variant discrimination in union order disabled → target →
  *    constant (`schema.py:381`);
  *  - default-pk autofill when there is exactly one source
  *    (`schema.py:393-401`);
  *  - a file failing TargetTable validation re-parses as a bare Dependency
  *    (`__main__.py:17-31`).
  */
object RuleParser {

  case class RuleParseException(rule: String, msg: String)
      extends RuntimeException(s"rule '$rule': $msg")

  def parse(name: String, yamlText: String): Rule = {
    val root = load(yamlText)
    // A file that fails TargetTable validation re-parses as a bare
    // Dependency — including semantic failures like a dangling pk ref,
    // which pydantic surfaces as ValidationError (`__main__.py:25-27`).
    val asTable =
      try parseTargetTable(name, root)
      catch { case _: RuleParseException => None }
    asTable.getOrElse(DependencyRule(name, parseDepParts(root)))
  }

  /** Parse insisting on a full target table (for tests / API warnings). */
  def parseTable(name: String, yamlText: String): TableRule =
    parseTargetTable(name, load(yamlText))
      .getOrElse(throw RuleParseException(name, "not a valid target-table rule"))

  private def load(yamlText: String): Map[String, Any] = {
    val y = new Yaml().load[Any](yamlText)
    toScala(y) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => throw new IllegalArgumentException(s"YAML root is not a mapping: $other")
    }
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      // LinkedHashMap preserves YAML document order (load-bearing for
      // pk-source and natural-key column ordering).
      scala.collection.immutable.VectorMap.from(
        m.asScala.toSeq.map { case (k, x) => (String.valueOf(k), toScala(x)) })
    case l: java.util.List[_] => l.asScala.map(toScala).toList
    case other => other
  }

  private def str(v: Any): String = String.valueOf(v)

  private def optMap(v: Any): Option[Map[String, Any]] = v match {
    case m: Map[_, _] => Some(m.asInstanceOf[Map[String, Any]])
    case _ => None
  }

  private def strList(v: Any): Seq[String] = v match {
    case l: List[_] => l.map(str)
    case null => Nil
    case s => Seq(str(s))
  }

  private def parseDepParts(m: Map[String, Any]): DependencyParts =
    DependencyParts(
      defaultSchema = m.get("default_schema").filter(_ != null).map(str),
      preInit = queryList(m.get("pre_init")),
      postInit = queryList(m.get("post_init")),
      scripts = m.get("scripts").map(strList).getOrElse(Nil),
      dependsOn = m.get("depends_on").map(strList).getOrElse(Nil))

  private def queryList(v: Option[Any]): Seq[QueryRef] = v match {
    case Some(l: List[_]) =>
      l.flatMap(optMap).map { q =>
        // contextful error, not a bare key-not-found out of q("alias")
        if (!q.contains("alias") || !q.contains("query"))
          throw new IllegalArgumentException(
            s"pre/post_init item needs both 'alias' and 'query'; got keys " +
              s"[${q.keys.mkString(", ")}]")
        QueryRef(str(q("alias")), str(q("query")))
      }
    case _ => Nil
  }

  private def parseSourceRef(v: Any): Option[SourceRef] = v match {
    case s: String =>
      if (s.matches("\\w+")) Some(TableRef(s, None))
      else if (s.matches("\\w+\\.\\w+")) {
        val Array(sch, al) = s.split("\\.")
        Some(TableRef(al, Some(sch)))
      } else None
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      if (mm.contains("query")) Some(QueryRef(str(mm("alias")), str(mm("query"))))
      else if (mm.contains("alias")) Some(TableRef(str(mm("alias")),
        mm.get("schema").filter(_ != null).map(str)))
      else None
    case _ => None
  }

  private def parseTargetTable(name: String, m: Map[String, Any]): Option[TableRule] = {
    for {
      tname <- m.get("name").map(str)
      pkRaw <- m.get("primary_key").flatMap(optMap)
      colsRaw <- m.get("columns") match {
        case Some(l: List[_]) if l.nonEmpty => Some(l)
        case _ => None
      }
      pk <- parsePrimaryKey(tname, pkRaw)
      cols <- parseColumns(tname, colsRaw, pk)
    } yield TableRule(tname, pk, cols, parseDepParts(m))
  }

  private def parsePrimaryKey(rule: String, m: Map[String, Any]): Option[PrimaryKey] =
    for {
      pkName <- m.get("name").map(str)
      sourcesRaw <- m.get("sources").flatMap(optMap)
      sources = sourcesRaw.toSeq.flatMap { case (alias, v) =>
        optMap(v).flatMap(parsePkSource)
          .map(alias -> _)
      }
      if sources.size == sourcesRaw.size
    } yield PrimaryKey(pkName, sources)

  private def parsePkSource(m: Map[String, Any]): Option[PrimaryKeySource] =
    for {
      tableRaw <- m.get("table")
      table <- parseSourceRef(tableRaw)
      colsRaw <- m.get("columns").flatMap(optMap)
    } yield PrimaryKeySource(
      table,
      colsRaw.toSeq.map { case (c, t) => (c, str(t)) },
      m.get("constraints").map(strList).getOrElse(Nil))

  /** Union discrimination disabled → target → constant (`schema.py:381`);
    * pk autofill from a single source (`schema.py:393-401`); a pk name
    * that matches no source is an error (`schema.py:403-414`).
    */
  private def parseColumns(rule: String, l: List[Any], pk: PrimaryKey): Option[Seq[ColumnRule]] = {
    val defaultPk = if (pk.sources.size == 1) Some(pk.sources.head._1) else None
    val parsed: Seq[Option[ColumnRule]] = l.flatMap(optMap).map { c =>
      val name = c.get("name").map(str).getOrElse("")
      val enabled = c.get("enabled") match {
        case Some(b: java.lang.Boolean) => b.booleanValue()
        case _ => true
      }
      if (!enabled) Some(DisabledColumn(name))
      else if (c.contains("expression") && c.contains("tables") && name.nonEmpty) {
        val tables = c("tables") match {
          case tl: List[_] => tl.flatMap(parseSourceRef)
          case other => parseSourceRef(other).toList
        }
        val pkAlias = c.get("primary_key").map(str).orElse(defaultPk)
        if (tables.isEmpty || pkAlias.isEmpty) None
        else if (!pk.sources.exists(_._1 == pkAlias.get))
          throw RuleParseException(rule,
            s"column '$name' primary_key '${pkAlias.get}' matches no pk source")
        else Some(TargetColumn(
          name,
          tables,
          c.get("constraints").map(strList).getOrElse(Nil),
          str(c("expression")),
          pkAlias.get,
          // a PRESENT-but-malformed references block must fail the rule
          // (the reference's pydantic ValidationError → file demoted to a
          // dependency, loudly), never silently skip the FK remap — a
          // skipped remap emits raw natural keys into a surrogate column
          c.get("references").map(v => parseFkRef(v).getOrElse(
            throw RuleParseException(rule,
              s"column '$name' has a malformed references block: $v")))))
      } else if (c.contains("constant") && name.nonEmpty)
        Some(ConstantColumn(name, c("constant")))
      else None
    }
    if (parsed.forall(_.isDefined)) Some(parsed.flatten) else None
  }

  private def parseFkRef(v: Any): Option[FkRef] = optMap(v).flatMap { m =>
    if (m.contains("table") && m.contains("column"))
      // simple form: column name used as-is (`schema.py:228-230`)
      Some(FkRef(str(m("table")), str(m("column"))))
    else m.headOption.flatMap { case (key, inner) =>
      // dict form: column composed as <table>_<column> (`schema.py:231-233`);
      // missing inner keys → None, so the call site raises its contextful
      // rule error instead of a bare key-not-found
      optMap(inner).filter(r => r.contains("table") && r.contains("column"))
        .map(r => FkRef(key, s"${str(r("table"))}_${str(r("column"))}"))
    }
  }
}
