package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.BatchLookup
import graft.pipeline.mls.MlsEnrich
import scala.jdk.CollectionConverters._

/** Deterministic fake of the property-id service keyed by street address
  * (FIXTURES.md §A3's four payload shapes: final, provisional, null-prop,
  * issue-text). Top-level for closure serializability. */
class FakePropertyIdService extends BatchLookup.LookupClient {
  override def lookup(batch: Seq[Row]): Seq[Row] = batch.map { r =>
    val ref = r.getAs[Long]("ReferenceID")
    r.getAs[String]("StreetAddress") match {
      case "1 FINAL ST" =>
        Row(ref, 101L, "2020-01-01", false, "2023-01-01", null)
      case "2 PROVISIONAL AVE" =>
        Row(ref, 202L, "2020-01-01", true, null, null)
      case "3 UNKNOWN RD" =>
        Row(ref, null, null, null, null, "address not found")
      case "4 ADDED NULL LN" => // 3rd CASE branch: no AddedToPmDate → Final
        Row(ref, 404L, null, true, null, null)
      case _ => Row(ref, null, null, null, null, "unexpected")
    }
  }
}

class MlsEnrichSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("mls", StringType), StructField("mls_listing_id", StringType),
    StructField("street_address", StringType), StructField("city", StringType),
    StructField("state", StringType), StructField("zip", StringType),
    StructField("unit", StringType),
    StructField("asg_primary_id", LongType),
    StructField("asg_primary_id_final_flag", BooleanType),
    StructField("asg_primary_id_source", StringType),
    StructField("asg_primary_id_source_queried_timestamp", TimestampType),
    StructField("asg_primary_id_source_responded_flag", BooleanType),
    StructField("asg_primary_id_issue_text", StringType),
    StructField("asg_primary_id_mssql_fixed_flag", BooleanType),
    StructField("asg_primary_id_updated_flag", BooleanType),
    StructField("asg_primary_id_updated_timestamp", TimestampType),
    StructField("asg_primary_id_previous_value", LongType),
    StructField("asg_primary_id_load_status", StringType)))

  private def main(rows: Row*): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  private def listingRow(id: String, addr: String, existing: Any = null): Row =
    Row("MLS1", id, addr, "Houston", "TX", "77001", null,
      existing, null, null, null, null, null, null, null, null, null, null)

  test("full enrichment: canonical address lookup, status decode, asg order") {
    val df = main(
      listingRow("L1", "1 FINAL ST"),
      listingRow("L2", "1 FINAL ST"),         // same address → one lookup row
      listingRow("L3", "2 PROVISIONAL AVE"),
      listingRow("L4", "3 UNKNOWN RD", 999L), // had an id; lookup returns null
      listingRow("L5", "4 ADDED NULL LN"))
    val lookup = MlsEnrich.lookupPropertyIds(spark, df,
      new FakePropertyIdService, batchSize = 2).get
    val out = MlsEnrich.attachPropertyIds(df, lookup,
      now = lit("2024-06-01 00:00:00").cast(TimestampType))
    val idx = out.columns.zipWithIndex.toMap
    val byId = out.collect().map(r => r.getString(idx("mls_listing_id")) -> r).toMap
    def v(id: String, c: String): Any = byId(id).get(idx(c))

    assert(out.count() == 5)
    // shared address: both listings enriched with the same property id
    assert(v("L1", "asg_primary_id") == 101L && v("L2", "asg_primary_id") == 101L)
    assert(v("L1", "asg_primary_id_load_status") == "Final")
    assert(v("L3", "asg_primary_id_load_status") == "Provisional")
    // null prop id → status 'Null', responded=false (issue text present)
    assert(v("L4", "asg_primary_id") == null)
    assert(v("L4", "asg_primary_id_load_status") == "Null")
    assert(v("L4", "asg_primary_id_source_responded_flag") == false)
    // the order-is-important recompute: previous value captured before
    // asg_primary_id was overwritten
    assert(v("L4", "asg_primary_id_updated_flag") == true)
    assert(v("L4", "asg_primary_id_previous_value") == 999L)
    // third CASE branch: AddedToPmDate null + provisional → still Final
    assert(v("L5", "asg_primary_id_load_status") == "Final")
    // unchanged id (null→101 is a change; L1 had none): updated flag true
    assert(v("L1", "asg_primary_id_updated_flag") == true)
    assert(v("L1", "asg_primary_id_previous_value") == null)
  }

  test("no addresses to look up returns None") {
    assert(MlsEnrich.lookupPropertyIds(spark, main().limit(0),
      new FakePropertyIdService, 10).isEmpty)
  }

  test("MSSQL lookup variant: three-hop joins, final and fixed flags") {
    import spark.implicits._
    val listings = Seq(("MLS1", "L1"), ("MLS1", "L2"), ("MLS1", "L3"))
      .toDF("mls", "mls_listing_id")
    val ldt = Seq(("MLS1", "L1", 10L), ("MLS1", "L2", 20L))
      .toDF("mls", "mlslistingid", "ailpropertyid")
    // pm: 10 redirects to primary 11 (fixed); 11 is validated non-provisional
    // → Final; 20 points at itself but 20 is provisional with a timestamp
    // → Provisional
    val pm = Seq(
      (10L, 11L, 0, "2023-01-01", "ts1"),
      (11L, 11L, 0, "2023-01-01", "ts1"),
      (20L, 20L, 1, null, "ts2"))
      .toDF("asgpropid", "asgprimaryid", "isprovisional", "lastvalidated",
        "asgtimestamp")
    val out = MlsEnrich.lookupPropertyIdsFromMssql(listings, ldt, pm).get
    val idx = out.columns.zipWithIndex.toMap
    val byId = out.collect().map(r => r.getString(idx("lkp_mls_listing_id")) -> r).toMap
    def v(id: String, c: String): Any = byId(id).get(idx(c))
    assert(v("L1", "lkp_asg_primary_id") == 11L)
    assert(v("L1", "lkp_asg_primary_id_final_flag") == true)
    assert(v("L1", "lkp_asg_primary_id_mssql_fixed_flag") == true) // 10 → 11
    assert(v("L2", "lkp_asg_primary_id") == 20L)
    assert(v("L2", "lkp_asg_primary_id_final_flag") == false) // provisional
    assert(v("L2", "lkp_asg_primary_id_mssql_fixed_flag") == false)
    assert(v("L3", "lkp_asg_primary_id") == null) // not in Listing_dt
    assert(v("L3", "lkp_asg_primary_id_final_flag") == null)
    assert(v("L3", "lkp_asg_primary_id_source_responded_flag") == false)
    assert(v("L1", "lkp_asg_primary_id_source") == "MSSQL")
  }

  test("geo joins: counties fips/state-name fallback, 3-way geo-id coalesce") {
    import spark.implicits._
    val good = Seq(
      ("L1", "48201", "TX", "Harris", "312000"),     // fips hit + tract hit
      ("L2", null, "TX", "Harris", "9999"),          // state+basename fallback
      ("L3", null, "CO", "Denver", "08031000100"))   // bare-geoid fallback
      .toDF("mls_listing_id", "fips", "state", "county_name", "census_tract_geo_id")
    val counties = Seq(("48201", "TX", "Harris"), ("08031", "CO", "Denver"))
      .toDF("fips", "state", "basename")
    val geoIds = Seq(
      ("48201", "312000", "48201312000", "3120.00"),
      ("08031", "000100", "08031000100", "1.00"))
      .toDF("fips", "censustract", "censustractgeoid", "censustractname")
    val out = graft.functions.ColumnLib.applyUnderscoreReplacements(
      graft.pipeline.mls.MlsTransform.attachGeo(good, counties, geoIds))
    val idx = out.columns.zipWithIndex.toMap
    val byId = out.collect().map(r => r.getString(idx("mls_listing_id")) -> r).toMap
    def v(id: String, c: String): Any = byId(id).get(idx(c))
    assert(v("L1", "fips") == "48201")
    assert(v("L1", "census_tract_geo_id") == "48201312000") // tract+fips join
    assert(v("L2", "fips") == "48201")                      // fallback join hit
    assert(v("L2", "census_tract_geo_id") == null)
    assert(v("L3", "fips") == "08031")
    assert(v("L3", "census_tract_geo_id") == "08031000100") // bare-geoid join
    assert(v("L1", "county_name") == "Harris")
  }
}
