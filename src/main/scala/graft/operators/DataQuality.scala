package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TableIO.table

/** Declarative data-quality constraint checking — the intake gate a
  * production pipeline runs before letting a batch near training (or
  * before a MERGE into the serving tables): uniqueness, completeness,
  * range and domain membership, each reported as a violation count and a
  * pass flag.
  *
  * Every rule is an AGGREGATE expression (violation count), so the whole
  * report is ONE pass over the table — a single partial-aggregated scan,
  * no per-rule jobs, no driver-side looping; rule results explode from
  * one aggregated row into the report. That single-scan shape is the
  * entire scale story: checking 50 constraints on 100 TB costs the same
  * scan as checking one. (An exact-uniqueness rule adds the standard
  * distinct-expand exchange on the key — swap in approx_count_distinct
  * when a tolerance is acceptable and it rides the same single pass.)
  */
object DataQuality {

  /** One constraint: `name` and an aggregate expression counting its
    * violations over the frame. */
  final case class Rule(name: String, violations: Column)

  /** Evaluate all rules in one aggregation pass; returns
    * (rule, n_violations, passed) per rule. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "data-quality check needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"data-quality rule names must be distinct, got: ${rules.map(_.name).mkString(", ")}")
    // Packed agg aliases are namespaced so a rule named like a df column
    // can't be shadowed in the explode stage below.
    def alias(r: Rule) = s"_dq_${r.name}"
    val packed = df.agg(
      rules.head.violations.cast("long").as(alias(rules.head)),
      rules.tail.map(r => r.violations.cast("long").as(alias(r))): _*)
    packed.select(explode(array(rules.map(r =>
        struct(lit(r.name).as("rule"),
          coalesce(col(alias(r)), lit(0L)).as("n_violations"))): _*)).as("c"))
      .select(col("c.rule"), col("c.n_violations"),
        (col("c.n_violations") === 0L).as("passed"))
  }

  /** Row-predicate helper: violations = count of rows where `bad` holds. */
  def countWhere(bad: Column): Column = sum(when(bad, 1L).otherwise(0L))

  /** q_dq_report: the documents-table intake contract — id uniqueness,
    * text completeness, length sanity, language domain, and cross-field
    * consistency (n_chars matches the text). */
  def dqReport(s: SparkSession, dir: String): DataFrame =
    check(table(s, dir, "documents"), Seq(
      Rule("doc_id_unique", count(lit(1)) - countDistinct(col("doc_id"))),
      Rule("text_complete", countWhere(col("text").isNull || length(col("text")) === 0)),
      Rule("n_chars_in_range", countWhere(col("n_chars") < 1 || col("n_chars") > 100000)),
      Rule("lang_in_domain", countWhere(!col("lang").isin("en", "de", "fr", "es", "pt"))),
      Rule("n_chars_consistent", countWhere(col("n_chars") =!= length(col("text"))))))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_report" -> (dqReport _))

  val oracles: Map[String, String] = Map(
    "q_dq_report" ->
      """WITH a AS (SELECT
        |    COUNT(*) - COUNT(DISTINCT doc_id) AS doc_id_unique,
        |    CAST(SUM(CASE WHEN text IS NULL OR len(text) = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS text_complete,
        |    CAST(SUM(CASE WHEN n_chars < 1 OR n_chars > 100000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_chars_in_range,
        |    CAST(SUM(CASE WHEN lang NOT IN ('en', 'de', 'fr', 'es', 'pt')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS lang_in_domain,
        |    CAST(SUM(CASE WHEN n_chars <> len(text) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_chars_consistent
        |  FROM documents),
        |u AS (
        |  SELECT 'doc_id_unique' AS rule, doc_id_unique AS n_violations FROM a
        |  UNION ALL SELECT 'text_complete', text_complete FROM a
        |  UNION ALL SELECT 'n_chars_in_range', n_chars_in_range FROM a
        |  UNION ALL SELECT 'lang_in_domain', lang_in_domain FROM a
        |  UNION ALL SELECT 'n_chars_consistent', n_chars_consistent FROM a)
        |SELECT rule, n_violations, (n_violations = 0) AS passed FROM u""".stripMargin)
}
