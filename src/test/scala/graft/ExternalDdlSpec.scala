package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.mls.MlsFullTransform
import graft.sources.ExternalDdl

/** S10: external ORC DDL generated from the 133-field schema — create,
  * write, read-back, and external (drop-keeps-data) semantics. */
class ExternalDdlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("external ORC table over the 133-col schema: create, insert, read, drop keeps data") {
    val schema = MlsFullTransform.targetSchema
    assert(schema.fields.length == 133)
    val loc = Files.createTempDirectory("graft_ext_orc").toString
    // seed the location with an ORC file the external table must pick up
    val seed = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row]), schema)
    seed.write.mode("overwrite").option("compression", "zlib").orc(loc)

    ExternalDdl.register(spark, "mls_listings_ext", schema, loc,
      comment = "MLS listings curated")
    assert(spark.sql("SELECT count(*) FROM mls_listings_ext").head.getLong(0) == 0)
    // catalog schema must equal the generating StructType, field for field
    val catalogFields = spark.table("mls_listings_ext").schema.fields
    assert(catalogFields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // reserved-word columns are addressable
    spark.sql("SELECT `state`, `section`, `range` FROM mls_listings_ext").collect()

    // EXTERNAL semantics: drop leaves the ORC files at the location
    spark.sql("DROP TABLE mls_listings_ext")
    assert(Files.list(java.nio.file.Paths.get(loc)).count() > 0)
    // re-register over the surviving data — the Hive DDL replay pattern
    ExternalDdl.register(spark, "mls_listings_ext", schema, loc)
    assert(spark.sql("SELECT count(*) FROM mls_listings_ext").head.getLong(0) == 0)
    spark.sql("DROP TABLE mls_listings_ext")
  }

  test("hist DDL twin: 134-col listings_hist with the boolean changed-flag tail") {
    // ddl/listings_hist.sql:1-140 — the history table's DDL is the
    // listings DDL plus the *_old previous-value columns and six boolean
    // *_changed_flag tail columns; generated from the same schema file
    // the hist job writes, so catalog and pipeline can never drift.
    val schema = MlsFullTransform.histSchema
    assert(schema.fields.length == 134)
    val ddl = ExternalDdl.createExternalOrc("mls.listings_hist", schema,
      "/data/curated/mls/listings_hist/", comment = "MLS listing history curated")
    val flagTail = Seq("listing_status", "current_price", "source_listing_id",
      "street_address_raw", "property_type", "property_sub_type")
    flagTail.foreach { c =>
      assert(ddl.contains(s"`${c}_changed_flag` BOOLEAN"), s"missing ${c}_changed_flag")
      assert(ddl.contains(s"`${c}_old`"), s"missing ${c}_old")
    }
    // the six flags are the LAST six columns, in the reference's order
    assert(schema.fieldNames.takeRight(6).toSeq == flagTail.map(_ + "_changed_flag"))
    assert(ddl.contains("`state` STRING")) // reserved word stays quoted

    // the generated DDL is valid Spark SQL: register + read back through
    // the catalog at the full hist width
    val loc = Files.createTempDirectory("graft_ext_hist").toString
    spark.createDataFrame(spark.sparkContext.parallelize(Seq.empty[Row]), schema)
      .write.mode("overwrite").option("compression", "zlib").orc(loc)
    ExternalDdl.register(spark, "mls_listings_hist_ext", schema, loc)
    val catalogFields = spark.table("mls_listings_hist_ext").schema.fields
    assert(catalogFields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    spark.sql("DROP TABLE mls_listings_hist_ext")
  }
}
