package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.rules.RuleParser

/** Tier-5 realistic-corpus validation (`/root/reference/tests/test_rules.py`):
  * the four Cerner→OMOP rules (reference `validation` dir) run against the
  * hand-authored workbook corpus (converted to parquet by
  * tools/convert_corpus.py), asserting the same 13 (table, column) pairs as
  * `test_rules.py:131-171`.
  */
class CorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  val corpus = "src/test/resources/corpus"

  // ported from /root/reference/validation/person.yaml
  val personRule = RuleParser.parse("person", """
    |name: PERSON
    |primary_key:
    |  name: person_id
    |  sources:
    |    PERSON_PK:
    |      table: CERNER.PERSON
    |      columns:
    |        person_id: bigint
    |      constraints:
    |        - CERNER.PERSON.active_ind=1
    |columns:
    |  - name: year_of_birth
    |    tables: [CERNER.PERSON]
    |    expression: extract(year FROM CERNER.PERSON.birth_dt_tm)
    |  - name: death_datetime
    |    tables: [CERNER.PERSON]
    |    expression: CERNER.PERSON.deceased_dt_tm
    |  - name: gender_source_value
    |    tables: [CERNER.PERSON, CERNER.CODE_VALUE]
    |    constraints:
    |      - CERNER.PERSON.sex_cd=CERNER.CODE_VALUE.code_value
    |    expression: CERNER.CODE_VALUE.display
    |  - name: gender_source_concept_id
    |    constant: "0"
    |""".stripMargin)

  // ported from /root/reference/validation/location.yaml
  val locationRule = RuleParser.parse("location", """
    |name: LOCATION
    |variables:
    |  - &FACILITY_TABLE
    |    alias: FACILITY_QUERY
    |    query: |
    |      select distinct on (loc_facility_cd) loc_facility_cd, active_ind
    |      from CERNER.ENCOUNTER
    |      UNION
    |      select distinct on (loc_facility_cd) loc_facility_cd, active_ind
    |      from CERNER.ENCNTR_LOC_HIST
    |      order by loc_facility_cd
    |  - &NURSE_UNIT_TABLE
    |    alias: NURSE_UNIT_QUERY
    |    query: |
    |      select distinct on (loc_nurse_unit_cd) loc_nurse_unit_cd, loc_facility_cd, active_ind
    |      from CERNER.ENCOUNTER
    |      UNION
    |      select distinct on (loc_nurse_unit_cd) loc_nurse_unit_cd, loc_facility_cd, active_ind
    |      from CERNER.ENCNTR_LOC_HIST
    |      order by loc_nurse_unit_cd
    |primary_key:
    |  name: location_id
    |  sources:
    |    FACILITY_PK:
    |      table: *FACILITY_TABLE
    |      columns:
    |        loc_facility_cd: bigint
    |    NURSE_UNIT_PK:
    |      table: *NURSE_UNIT_TABLE
    |      columns:
    |        loc_nurse_unit_cd: bigint
    |    ADDRESS_PK:
    |      table: CERNER.ADDRESS
    |      columns:
    |        address_id: bigint
    |columns:
    |  - {name: state, enabled: true, expression: "'NSW'", tables: [*FACILITY_TABLE], primary_key: FACILITY_PK}
    |  - {name: state, enabled: true, expression: "'NSW'", tables: [*NURSE_UNIT_TABLE], primary_key: NURSE_UNIT_PK}
    |  - {name: state, enabled: true, tables: [CERNER.ADDRESS], expression: ADDRESS.state, primary_key: ADDRESS_PK}
    |  - name: zip
    |    enabled: true
    |    tables: [*FACILITY_TABLE, EXTERNAL.FACILITY_POSTCODE]
    |    constraints:
    |      - FACILITY_QUERY.loc_facility_cd=EXTERNAL.FACILITY_POSTCODE.source_facility_cd
    |    expression: EXTERNAL.FACILITY_POSTCODE.target_postcode
    |    primary_key: FACILITY_PK
    |  - name: zip
    |    enabled: true
    |    tables: [*NURSE_UNIT_TABLE, EXTERNAL.FACILITY_POSTCODE]
    |    constraints:
    |      - NURSE_UNIT_QUERY.loc_facility_cd=EXTERNAL.FACILITY_POSTCODE.source_facility_cd
    |    expression: EXTERNAL.FACILITY_POSTCODE.target_postcode
    |    primary_key: NURSE_UNIT_PK
    |  - {name: zip, enabled: true, tables: [CERNER.ADDRESS], expression: ADDRESS.zipcode, primary_key: ADDRESS_PK}
    |""".stripMargin)

  // ported from /root/reference/validation/visit_occurrence.yaml
  val visitRule = RuleParser.parse("visit_occurrence", """
    |name: VISIT_OCCURRENCE
    |primary_key:
    |  name: visit_occurrence_id
    |  data_type: bigint
    |  sources:
    |    ENCOUNTER_PK:
    |      table: ENCOUNTER
    |      columns:
    |        encntr_id: bigint
    |columns:
    |  - column:
    |    name: person_id
    |    data_type: bigint
    |    tables: [ENCOUNTER]
    |    expression: ENCOUNTER.person_id
    |    primary_key: ENCOUNTER_PK
    |    references:
    |      table: person
    |      column: PERSON_person_id
    |""".stripMargin)

  // ported from /root/reference/validation/condition_occurrence.yaml
  val conditionRule = RuleParser.parse("condition_occurrence", """
    |name: CONDITION_OCCURRENCE
    |primary_key:
    |  name: condition_occurrence_id
    |  sources:
    |    DIAGNOSIS_PK:
    |      table: CERNER.DIAGNOSIS
    |      columns:
    |        diagnosis_id: bigint
    |    PROBLEM_PK:
    |      table: CERNER.PROBLEM
    |      columns:
    |        problem_instance_id: bigint
    |columns:
    |  - name: person_id
    |    enabled: true
    |    tables: [CERNER.DIAGNOSIS]
    |    expression: CERNER.DIAGNOSIS.person_id
    |    primary_key: DIAGNOSIS_PK
    |    references: {table: person, column: PERSON_person_id}
    |  - name: person_id
    |    enabled: true
    |    tables: [CERNER.PROBLEM]
    |    expression: CERNER.PROBLEM.person_id
    |    primary_key: PROBLEM_PK
    |    references: {table: person, column: PERSON_person_id}
    |  - name: condition_concept_id
    |    enabled: true
    |    tables: [CERNER.DIAGNOSIS, CERNER.NOMENCLATURE, OMOP.CONCEPT, OMOP.CONCEPT_RELATIONSHIP]
    |    constraints:
    |      - CERNER.DIAGNOSIS.nomenclature_id=CERNER.NOMENCLATURE.nomenclature_id
    |      - CERNER.NOMENCLATURE.source_vocabulary_cd=10752
    |      - CERNER.NOMENCLATURE.source_identifier_keycap=OMOP.CONCEPT.concept_code
    |      - OMOP.CONCEPT.vocabulary_id='ICD10'
    |      - OMOP.CONCEPT.concept_id=OMOP.CONCEPT_RELATIONSHIP.concept_id_1
    |      - OMOP.CONCEPT_RELATIONSHIP.relationship_id='Maps to'
    |    expression: OMOP.CONCEPT_RELATIONSHIP.concept_id_2
    |    primary_key: DIAGNOSIS_PK
    |  - name: condition_concept_id
    |    enabled: true
    |    tables: [CERNER.DIAGNOSIS, CERNER.NOMENCLATURE, OMOP.CONCEPT]
    |    constraints:
    |      - CERNER.DIAGNOSIS.nomenclature_id=CERNER.NOMENCLATURE.nomenclature_id
    |      - CERNER.NOMENCLATURE.source_vocabulary_cd=13837739
    |      - substring(CERNER.NOMENCLATURE.concept_cki, position('!' in CERNER.NOMENCLATURE.concept_cki )+1, length(CERNER.NOMENCLATURE.concept_cki))=OMOP.CONCEPT.concept_code
    |      - OMOP.CONCEPT.vocabulary_id='SNOMED'
    |    expression: OMOP.CONCEPT.concept_id
    |    primary_key: DIAGNOSIS_PK
    |  - name: condition_concept_id
    |    enabled: true
    |    tables: [CERNER.PROBLEM, CERNER.NOMENCLATURE, OMOP.CONCEPT, OMOP.CONCEPT_RELATIONSHIP, OMOP.VOCABULARY]
    |    constraints:
    |      - CERNER.PROBLEM.nomenclature_id=CERNER.NOMENCLATURE.nomenclature_id
    |      - CERNER.NOMENCLATURE.source_vocabulary_cd=10752
    |      - CERNER.NOMENCLATURE.source_identifier_keycap=OMOP.CONCEPT.concept_code
    |      - OMOP.CONCEPT.vocabulary_id='ICD10'
    |      - OMOP.CONCEPT.concept_id=OMOP.CONCEPT_RELATIONSHIP.concept_id_1
    |      - OMOP.CONCEPT_RELATIONSHIP.relationship_id='Maps to'
    |    expression: OMOP.CONCEPT_RELATIONSHIP.concept_id_2
    |    primary_key: PROBLEM_PK
    |  - name: condition_concept_id
    |    enabled: true
    |    tables: [CERNER.PROBLEM, CERNER.NOMENCLATURE, OMOP.CONCEPT]
    |    constraints:
    |      - CERNER.PROBLEM.nomenclature_id=CERNER.NOMENCLATURE.nomenclature_id
    |      - CERNER.NOMENCLATURE.source_vocabulary_cd=13837739
    |      - substring(CERNER.NOMENCLATURE.concept_cki, position('!' in CERNER.NOMENCLATURE.concept_cki )+1, length(CERNER.NOMENCLATURE.concept_cki))=OMOP.CONCEPT.concept_code
    |      - OMOP.CONCEPT.vocabulary_id='SNOMED'
    |    expression: OMOP.CONCEPT.concept_id
    |    primary_key: PROBLEM_PK
    |""".stripMargin)

  lazy val targets: Map[String, DataFrame] = {
    val e = new Engine(spark)
    // The workbook populates a subset of each DDL table's columns; in the
    // reference the remainder exist as NULL (tables pre-created from
    // `schema/cerner.sql`). Supplement the rule-referenced ones.
    def withNullCol(df: DataFrame, name: String): DataFrame =
      if (df.columns.contains(name)) df else df.withColumn(name, lit(null).cast("double"))
    Seq("person", "encounter", "encntr_loc_hist", "diagnosis", "problem",
      "address", "nomenclature", "code_value").foreach { t =>
      val df = spark.read.parquet(s"$corpus/cerner_$t.parquet")
      val full = if (t == "encounter" || t == "encntr_loc_hist") withNullCol(df, "active_ind") else df
      e.registerSource("cerner", t, full)
    }
    Seq("concept", "concept_relationship").foreach { t =>
      e.registerSource("omop", t, spark.read.parquet(s"$corpus/omop_$t.parquet"))
    }
    // omop.vocabulary exists in the DDL but ships empty — the rule that cross
    // joins it matches nothing, exactly as in Postgres (`schema/omop.sql`)
    e.registerSource("omop", "vocabulary", spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vocabulary_id", StringType)))))
    Seq("facility_postcode", "person_ethnicity_concept").foreach { t =>
      e.registerSource("external", t, spark.read.parquet(s"$corpus/external_$t.parquet"))
    }
    e.run(Seq(personRule, locationRule, visitRule, conditionRule))
  }

  /** Mirror of `test_rules.py:131-171`: order both sides by the target's pk,
    * compare one column with float coercion for numerics.
    */
  def check(table: String, column: String): Unit = {
    val expected = spark.read.parquet(s"$corpus/expected_$table.parquet")
    val pk = expected.columns.head
    // coercion driven by the EXPECTED column type, mirroring
    // `is_numeric_dtype(expected_df[column])` in test_rules.py
    val target = expected.schema(column).dataType match {
      case TimestampType | org.apache.spark.sql.types.TimestampNTZType => "string"
      case StringType => "string"
      case _ => "double"
    }
    def colVals(df: DataFrame): Seq[Any] =
      df.orderBy(col(pk)).select(col(column).cast(target))
        .collect().map(_.get(0)).toSeq
    assert(colVals(targets(table.toUpperCase)) == colVals(expected),
      s"$table.$column mismatch")
  }

  for ((t, c) <- Seq(
    "condition_occurrence" -> "condition_concept_id",
    "condition_occurrence" -> "condition_occurrence_id",
    "condition_occurrence" -> "person_id",
    "location" -> "location_id",
    "location" -> "state",
    "location" -> "zip",
    "person" -> "death_datetime",
    "person" -> "gender_source_concept_id",
    "person" -> "gender_source_value",
    "person" -> "person_id",
    "person" -> "year_of_birth",
    "visit_occurrence" -> "person_id",
    "visit_occurrence" -> "visit_occurrence_id"))
    test(s"corpus: $t.$c matches the workbook golden (`test_rules.py`)") {
      check(t, c)
    }
}
