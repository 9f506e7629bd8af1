package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.BatchLookup

/** Deterministic fake of the external service — top-level so the closure
  * serializes without dragging the suite along. */
class FakeLookupClient extends BatchLookup.LookupClient {
  override def lookup(batch: Seq[Row]): Seq[Row] =
    batch.map(r => Row(r.getInt(0), s"P-${r.getInt(0)}"))
}

class BatchLookupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val resultSchema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("prop_id", StringType)))

  test("enrich returns one result row per input across sized partitions") {
    val keys = (1 to 97).toDF("id")
    val out = BatchLookup.enrich(spark, keys, new FakeLookupClient, batchSize = 10,
      resultSchema)
    val got = out.as[(Int, String)].collect().sortBy(_._1)
    assert(got.length == 97)
    assert(got.head == (1, "P-1") && got.last == (97, "P-97"))
    // partition count ≈ ceil(97/10); repartition produced ≥ input rows / batch
    assert(out.rdd.getNumPartitions == 10)
  }

  test("empty input yields empty enrichment without calling the service") {
    val out = BatchLookup.enrich(spark, Seq.empty[Int].toDF("id"),
      new FakeLookupClient, batchSize = 10, resultSchema)
    assert(out.count() == 0)
  }
}
