package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ColumnLib
import graft.operators.SurrogateKeys

/** Coverage for the SURVEY §2 inventory items that are library/DDL surface
  * rather than gate queries: S10 (external tables), S12 (surrogate keys),
  * P12 (dtype introspection), A1 (approximate counts). */
class CoverageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("S10: external table DDL over a parquet location, then SQL") {
    spark.sql("DROP TABLE IF EXISTS graft_ext_nation")
    spark.sql(
      """CREATE TABLE graft_ext_nation USING parquet
        |LOCATION '/root/testdata/sf0.001/nation.parquet'""".stripMargin)
    val n = spark.sql("SELECT count(*) AS n FROM graft_ext_nation")
      .as[Long].head()
    assert(n == 25)
    spark.sql("DROP TABLE graft_ext_nation")
  }

  test("S12: surrogate keys stable across batches, fresh ids for new keys") {
    val empty = Seq.empty[(String, Long)].toDF("nk", "sid")
    val m1 = SurrogateKeys.assign(spark, empty,
      Seq("b", "a", "c").toDF("nk"), Seq("nk"), "sid")
    val ids1 = m1.as[(String, Long)].collect().toMap
    assert(ids1 == Map("a" -> 1L, "b" -> 2L, "c" -> 3L)) // ordered assignment
    // replay with overlap: existing ids unchanged, new key gets max+1
    val m2 = SurrogateKeys.assign(spark, m1,
      Seq("c", "d").toDF("nk"), Seq("nk"), "sid")
    val ids2 = m2.as[(String, Long)].collect().toMap
    assert(ids2 == ids1 + ("d" -> 4L))
  }

  test("SimHash bucket cap bounds skewed (band,chunk) buckets") {
    // 60 clones of one text: every (band,chunk) bucket of the clone
    // cluster holds all 60 docs → 8×C(60,2) candidate blowup uncapped.
    // Two near-identical singleton docs share ordinary-sized buckets.
    val clones = (1L to 60L).map(i => (i, "the quick brown fox jumps over"))
    val pairDocs = Seq(
      (101L, "completely different text body alpha beta gamma"),
      (102L, "completely different text body alpha beta gamma"))
    val docs = (clones ++ pairDocs).toDF("doc_id", "text")

    val uncapped = graft.operators.Sketches.simhashPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((101L, 102L)))
    assert(uncapped.count { case (a, b) => a <= 60 && b <= 60 } == 60 * 59 / 2)

    // Cap below the clone-cluster size: its buckets are dropped wholesale
    // (the documented recall cost), while the normal pair still surfaces.
    val capped = graft.operators.Sketches.simhashPairs(docs, maxBucket = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((101L, 102L)))
    assert(!capped.exists { case (a, b) => a <= 60 && b <= 60 })
  }

  test("P12: dtype introspection finds columns by type") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert(ColumnLib.columnsOfType(df, StringType).toSet ==
      Set("o_orderstatus", "o_orderpriority"))
    assert(ColumnLib.columnsOfType(df, DoubleType) == Seq("o_totalprice"))
  }

  test("ANN: LSH-bucketed top-k keeps useful recall vs brute force") {
    val dir = "/root/testdata/sf0.001"
    def neighbors(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = neighbors(graft.operators.SimilarityQueries.simCosineTopK(spark, dir))
    val lsh = neighbors(graft.operators.SimilarityQueries.simLshTopK(spark, dir))
    val recall = (exact & lsh).size.toDouble / exact.size
    // 4 hyperplanes / 16 buckets: candidates are ~1/16 of the corpus, so
    // recall well above that floor shows the buckets are similarity-aligned
    assert(recall >= 0.3, s"LSH recall $recall too low")
    assert(lsh.nonEmpty)
  }

  test("ANN: IVF-probed top-k keeps useful recall vs brute force") {
    val dir = "/root/testdata/sf0.001"
    def neighbors(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = neighbors(graft.operators.SimilarityQueries.simCosineTopK(spark, dir))
    val ivf = neighbors(graft.operators.SimilarityQueries.simIvfTopK(spark, dir))
    val recall = (exact & ivf).size.toDouble / exact.size
    // 2 probes over 16 cells scan ~1/8 of the corpus; recall well above
    // that floor shows cells are similarity-aligned
    assert(recall >= 0.3, s"IVF recall $recall too low")
    assert(ivf.nonEmpty)
  }

  test("A1: countApprox and approx_count_distinct track exact counts") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val exact = li.select(countDistinct(col("l_orderkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_orderkey"), rsd = 0.02))
      .as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
    val ca = li.rdd.countApprox(1000L, 0.95).getFinalValue().mean.toLong
    assert(ca == li.count())
  }
}
