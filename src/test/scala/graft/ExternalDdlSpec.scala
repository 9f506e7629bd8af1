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
}
