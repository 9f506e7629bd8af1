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
}
