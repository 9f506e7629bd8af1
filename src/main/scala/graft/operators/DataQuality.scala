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

  /** One referential-integrity edge: child.childKey must resolve in
    * parent.parentKey. */
  final case class FkEdge(name: String, child: String, childKey: String,
                          parent: String, parentKey: String)

  /** Cross-table referential-integrity audit: for each FK edge, the count
    * of child rows (null FKs excluded — SQL FK semantics) and of ORPHANS
    * (children whose key resolves to no parent), one report row per edge.
    *
    * Each edge is one left join against the DISTINCT parent keys with both
    * counts in a single aggregate — one scan of each side per edge. At
    * 100 TB the parent key set of a dimension broadcasts (AQE picks this
    * up from the distinct's size); a fact-to-fact edge shuffles both sides
    * on the key, the cost floor for an exact orphan check. The per-edge
    * single-row plans union into one report frame, so the whole audit is
    * one job. */
  def fkAudit(s: SparkSession, dir: String, edges: Seq[FkEdge]): DataFrame = {
    require(edges.nonEmpty, "fk audit needs at least one edge")
    edges.map { e =>
      val c = table(s, dir, e.child)
        .select(col(e.childKey).as("k")).filter(col("k").isNotNull)
      val p = table(s, dir, e.parent)
        .select(col(e.parentKey).as("k")).distinct()
        .withColumn("_hit", lit(true))
      c.join(p, Seq("k"), "left")
        .agg(count(lit(1)).as("n_children"),
          coalesce(sum(when(col("_hit").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_orphans"))
        .select(lit(e.name).as("edge"), col("n_children"), col("n_orphans"),
          (col("n_orphans") === 0L).as("passed"))
    }.reduce(_ unionByName _)
  }

  /** q_dq_integrity: the TPC-H-ish schema's FK skeleton audited in one
    * report — the pre-merge gate that catches a partial dimension load or
    * a fact batch referencing unshipped keys before it lands. */
  def dqIntegrity(s: SparkSession, dir: String): DataFrame =
    fkAudit(s, dir, Seq(
      FkEdge("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      FkEdge("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      FkEdge("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      FkEdge("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      FkEdge("nation_region", "nation", "n_regionkey", "region", "r_regionkey")))

  /** Key-skew histogram for a prospective shuffle key: per-key row counts
    * bucketed by floor(log2(count)) — the exact integer exponent from the
    * binary-string length, the same transcendental-free idiom as
    * MixQueries.log2fpSql — with key and row counts, the bucket's
    * heaviest count, AND that hot key's IDENTITY (which is what the
    * salting decision actually consumes: a salt factor needs the key to
    * salt). The hot key is the arg-max resolved deterministically — max
    * count, string-max key among ties — as `max(struct(n_rows, key))`,
    * which stays a PARTIAL-AGGREGABLE expression: the per-key frame
    * (one row per distinct key — billions for a user-id audit) folds to
    * ~60 combined rows map-side before the bucket exchange, exactly like
    * the plain max/sum columns beside it. (A per-bucket window would
    * compute the same value but forces the full per-key frame through a
    * ~60-partition exchange — one straggler per bucket, the very
    * pathology this report warns about.) The report
    * that decides, BEFORE a 100 TB job runs, whether a groupBy/join on
    * this key needs salting or AQE skew handling (a heavy tail = one
    * straggler task per hot key) and what salt factor the top bucket
    * implies. Cost: the per-key count is one map-side-combined
    * aggregation — same exchange the audited shuffle itself would pay —
    * and the histogram folds the key space down to ~60 rows. */
  def skewReport(df: DataFrame, key: Column, label: String): DataFrame =
    df.groupBy(key.as("k")).agg(count(lit(1)).as("n_rows"))
      .withColumn("log2_bucket",
        expr("CAST(length(conv(CAST(n_rows AS STRING), 10, 2)) - 1 AS INT)"))
      .withColumn("k_str", col("k").cast("string"))
      .groupBy("log2_bucket")
      .agg(count(lit(1)).as("n_keys"), sum("n_rows").as("bucket_rows"),
        max("n_rows").as("max_key_rows"),
        max(struct(col("n_rows"), col("k_str"))).getField("k_str").as("hot_key"))
      .select(lit(label).as("audited_key"), col("log2_bucket"),
        col("n_keys"), col("bucket_rows"), col("max_key_rows"), col("hot_key"))

  /** q_dq_skew: [[skewReport]] over the event stream's two candidate
    * shuffle keys — user_id (the key every sessionize/retention/funnel
    * gate shuffles on; near-uniform, safe) and event_type (cardinality ≈
    * the partition count with one dominant value — the classic
    * "groupBy looks fine at sf0.01, straggles at 100 TB" trap the
    * histogram exists to expose: its top bucket holds one key with 2^11×
    * a uniform key's rows). */
  def dqSkew(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.sources.TableIO.events(s, dir)
    skewReport(ev, col("user_id"), "user_id")
      .unionByName(skewReport(ev, col("event_type"), "event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_integrity" -> (dqIntegrity _),
    "q_dq_report" -> (dqReport _),
    "q_dq_skew" -> (dqSkew _))

  private def fkEdgeSql(name: String, child: String, childKey: String,
                        parent: String, parentKey: String): String =
    s"""SELECT '$name' AS edge, COUNT(*) AS n_children,
       |  CAST(COALESCE(SUM(CASE WHEN p.$parentKey IS NULL THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) AS n_orphans,
       |  CAST(COALESCE(SUM(CASE WHEN p.$parentKey IS NULL THEN 1 ELSE 0 END), 0)
       |    AS BIGINT) = 0 AS passed
       |FROM $child c
       |LEFT JOIN (SELECT DISTINCT $parentKey FROM $parent) p
       |  ON c.$childKey = p.$parentKey
       |WHERE c.$childKey IS NOT NULL""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dq_skew" ->
      """WITH ku AS (SELECT CAST(user_id AS VARCHAR) AS k,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM events GROUP BY user_id),
        |kt AS (SELECT event_type AS k, CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM events GROUP BY event_type),
        |bu AS (SELECT k, n_rows,
        |    CAST(length(bin(n_rows)) - 1 AS INTEGER) AS lb FROM ku),
        |bt AS (SELECT k, n_rows,
        |    CAST(length(bin(n_rows)) - 1 AS INTEGER) AS lb FROM kt),
        |wu AS (SELECT *, MAX(n_rows) OVER (PARTITION BY lb) AS max_n FROM bu),
        |wt AS (SELECT *, MAX(n_rows) OVER (PARTITION BY lb) AS max_n FROM bt)
        |SELECT 'user_id' AS audited_key, lb AS log2_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(n_rows) AS BIGINT) AS bucket_rows,
        |  MAX(n_rows) AS max_key_rows,
        |  MAX(CASE WHEN n_rows = max_n THEN k END) AS hot_key
        |FROM wu GROUP BY lb
        |UNION ALL
        |SELECT 'event_type' AS audited_key, lb AS log2_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(n_rows) AS BIGINT) AS bucket_rows,
        |  MAX(n_rows) AS max_key_rows,
        |  MAX(CASE WHEN n_rows = max_n THEN k END) AS hot_key
        |FROM wt GROUP BY lb""".stripMargin,
    "q_dq_integrity" -> Seq(
      fkEdgeSql("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      fkEdgeSql("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      fkEdgeSql("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      fkEdgeSql("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      fkEdgeSql("nation_region", "nation", "n_regionkey", "region", "r_regionkey"))
      .mkString("\nUNION ALL\n"),
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
