package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityQueries

/** Pins the certified-approximate embedding-dedup contract: the LSH path
  * never emits a false positive (exact verification makes its output a
  * strict subset of the exact all-pairs result) and its measured recall
  * stays above the design floor. */
class SimilarityDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("LSH-verified pairs are a subset of the exact all-pairs result") {
    val exact = SimilarityQueries.dedupEmbedding(spark, dir).select("id_a", "id_b")
    val apx = SimilarityQueries.dedupEmbeddingLsh(spark, dir).select("id_a", "id_b")
    assert(apx.exceptAll(exact).isEmpty, "LSH path emitted a pair the exact path lacks")
  }

  test("measured recall clears the 16x4 banding design floor") {
    val r = SimilarityQueries.dedupEmbRecall(spark, dir).collect().head
    assert(r.getAs[Long]("n_exact") > 0)
    assert(r.getAs[Double]("recall_vs_exact") >= 0.8,
      s"recall ${r.getAs[Double]("recall_vs_exact")} below design floor")
  }
}
