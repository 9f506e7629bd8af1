package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.mls.MlsEnrich
import scala.jdk.CollectionConverters._

/** Runnable drive of the property-id enrichment flow with the fake service:
  * {{{ sbt "Test/runMain graft.EnrichDemo" }}} — prints the enriched rows. */
object EnrichDemo {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val schema = StructType(Seq(
      StructField("mls", StringType), StructField("mls_listing_id", StringType),
      StructField("street_address", StringType), StructField("city", StringType),
      StructField("state", StringType), StructField("zip", StringType),
      StructField("unit", StringType), StructField("asg_primary_id", LongType),
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
    def row(id: String, addr: String) =
      Row("MLS1", id, addr, "Houston", "TX", "77001", null,
        null, null, null, null, null, null, null, null, null, null, null)
    val df = spark.createDataFrame(Seq(
      row("L1", "1 FINAL ST"), row("L2", "1 FINAL ST"),
      row("L3", "2 PROVISIONAL AVE"), row("L4", "3 UNKNOWN RD")).asJava, schema)
    val lookup = MlsEnrich.lookupPropertyIds(spark, df,
      new FakePropertyIdService, batchSize = 2).get
    MlsEnrich.attachPropertyIds(df, lookup)
      .select("mls_listing_id", "asg_primary_id", "asg_primary_id_load_status",
        "asg_primary_id_source_responded_flag")
      .orderBy("mls_listing_id")
      .show(truncate = false)
    spark.stop()
  }
}
