package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PackQueries

/** Structural invariants of the no-split FFD packing (q_pack_ffd)
  * beyond the oracle's exact replay. */
class PackFfdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val budget = 2048L

  private lazy val packed = PackQueries.packFfd(spark, dir).cache()

  test("every document lands in exactly one bin; no bin over budget") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(packed.count() == docs)
    assert(packed.select(col("doc_id")).distinct().count() == docs)
    // the fixture has no single doc over the budget, so NO bin may
    // exceed it (an over-full bin would mean a split or a misplacement)
    val over = packed.filter(col("bin_fill") > budget).count()
    assert(over == 0L, s"$over bins packed over the token budget")
    val wasteBad = packed
      .filter(col("bin_waste") =!= lit(budget) - col("bin_fill")).count()
    assert(wasteBad == 0L)
  }

  test("FFD shape: at most one under-half-full bin per rank group") {
    // classic first-fit property — two bins at most half-full cannot
    // coexist (the second's first doc would have fit the first); a
    // violation means the greedy order or the fit scan regressed
    val bad = packed.select(col("bin_id"), col("bin_fill"))
      .distinct()
      .withColumn("grp", expr("bin_id div 512"))
      .filter(col("bin_fill") * 2 <= budget)
      .groupBy("grp").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .count()
    assert(bad == 0L, s"$bad rank groups hold 2+ half-empty bins")
  }

  test("deterministic across invocations") {
    val a = packed.orderBy("doc_id").collect().toSeq
    val b = PackQueries.packFfd(spark, dir).orderBy("doc_id")
      .collect().toSeq
    assert(a == b, "re-running the pack produced a different layout")
  }
}
