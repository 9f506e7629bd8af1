package graft.pipeline.mls

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Oracle gate for the MSSQL 3-hop property-id lookup variant (SURVEY §2.3
  * J8-J10; reference: mls_listings_transform.py:574-633): listing →
  * Listing_dt on (mls, mlslistingid) recovers ailpropertyid, hop 1 into
  * PropertyMaster resolves the PRIMARY id, hop 2 re-joins PropertyMaster on
  * that primary id to read its provisional/validation state for the
  * final-flag decode; mssql_fixed_flag records primary-id redirection.
  *
  * The synthetic Listing_dt / PropertyMaster_dt fixtures are written in the
  * shared SQL subset so DuckDB builds byte-identical dims and replays the
  * three left joins and both CASE decodes. Value cycles cover every branch:
  * listings absent from Listing_dt (responded=false), null ailpropertyid,
  * ail ids missing from PropertyMaster, null asgprimaryid, redirected
  * primaries (fixed=true), primaries missing from PropertyMaster (hop-2
  * miss → asgtimestamp null → final=true), and all
  * isprovisional/lastvalidated/asgtimestamp combinations. */
object MlsEnrichMssqlGate {

  private val listingExprs = Seq(
    "'MLS' || CAST(k % 3 AS STRING) AS mls",
    "'L' || CAST(k AS STRING) AS mls_listing_id")

  /** Listing_dt rows (absent for k%7=0 listings). Shared with the
    * MSSQL-mode backfill CLI gate (MlsJob3Gate.job3CliMssql). */
  private[mls] val ldtExprs = Seq(
    "'MLS' || CAST(k % 3 AS STRING) AS mls",
    "'L' || CAST(k AS STRING) AS mlslistingid",
    """CASE WHEN k % 11 = 1 THEN CAST(NULL AS BIGINT)
      | WHEN k % 13 = 2 THEN CAST(2000 + k % 10 AS BIGINT)
      | ELSE CAST(1001 + k % 50 AS BIGINT) END AS ailpropertyid""".stripMargin)

  /** PropertyMaster_dt rows keyed asgpropid = 1001..1060. Shared with the
    * MSSQL-mode backfill CLI gate (MlsJob3Gate.job3CliMssql). */
  private[mls] val pmExprs = Seq(
    "CAST(1000 + k AS BIGINT) AS asgpropid",
    """CASE WHEN k % 6 = 3 THEN CAST(NULL AS BIGINT)
      | WHEN k % 4 = 0 THEN CAST(1001 + k % 30 AS BIGINT)
      | WHEN k % 9 = 5 THEN CAST(3000 + k AS BIGINT)
      | ELSE CAST(1000 + k AS BIGINT) END AS asgprimaryid""".stripMargin,
    "CAST(CASE WHEN k % 3 = 1 THEN 1 ELSE 0 END AS INTEGER) AS isprovisional",
    "CASE WHEN k % 5 < 3 THEN '2023-06-01' ELSE CAST(NULL AS STRING) END AS lastvalidated",
    "CASE WHEN k % 7 < 4 THEN '2022-01-01' ELSE CAST(NULL AS STRING) END AS asgtimestamp")

  def enrichMssql(s: SparkSession, dir: String): DataFrame = {
    val ks = graft.sources.TableIO.readStatic(s, s"$dir/customer.parquet")
      .selectExpr("CAST(c_custkey AS BIGINT) AS k")
    val listings = ks.selectExpr(listingExprs: _*)
    val ldt = ks.filter("k % 7 <> 0").selectExpr(ldtExprs: _*)
    val pm = ks.filter("k <= 60").selectExpr(pmExprs: _*)
    MlsJob1Gate.lkpHashOutput(
      MlsEnrich.lookupPropertyIdsFromMssql(listings, ldt, pm).get)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_enrich_mssql" -> (enrichMssql _))

  def oracle: String =
    s"""WITH ks AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
       |l AS (SELECT ${listingExprs.mkString(",\n  ")} FROM ks),
       |ldt AS (SELECT ${ldtExprs.mkString(",\n  ")} FROM ks WHERE k % 7 <> 0),
       |pm AS (SELECT ${pmExprs.mkString(",\n  ")} FROM ks WHERE k <= 60),
       |h0 AS (
       |  SELECT l.mls AS lkp_mls, l.mls_listing_id AS lkp_mls_listing_id,
       |    (d.mls IS NOT NULL) AS responded, d.ailpropertyid AS ail
       |  FROM l LEFT JOIN ldt d
       |    ON l.mls = d.mls AND l.mls_listing_id = d.mlslistingid),
       |h1 AS (
       |  SELECT h0.*, p1.asgprimaryid AS prim
       |  FROM h0 LEFT JOIN pm p1 ON h0.ail = p1.asgpropid)
       |SELECT lkp_mls, lkp_mls_listing_id,
       |  prim AS lkp_asg_primary_id,
       |  CAST(CASE WHEN prim IS NULL THEN CAST(NULL AS BOOLEAN)
       |       WHEN prim IS NOT NULL AND p2.isprovisional = 0
       |            AND p2.lastvalidated IS NOT NULL THEN true
       |       WHEN prim IS NOT NULL AND p2.asgtimestamp IS NULL THEN true
       |       ELSE false END AS STRING) AS lkp_asg_primary_id_final_flag,
       |  'MSSQL' AS lkp_asg_primary_id_source,
       |  CAST(responded AS STRING) AS lkp_asg_primary_id_source_responded_flag,
       |  CAST(NULL AS STRING) AS lkp_asg_primary_id_issue_text,
       |  CAST(CASE WHEN prim IS NULL THEN CAST(NULL AS BOOLEAN)
       |       WHEN ail <> prim THEN true
       |       ELSE false END AS STRING) AS lkp_asg_primary_id_mssql_fixed_flag
       |FROM h1 LEFT JOIN pm p2 ON h1.prim = p2.asgpropid""".stripMargin

  val oracles: Map[String, String] = Map("q_enrich_mssql" -> oracle)
}
