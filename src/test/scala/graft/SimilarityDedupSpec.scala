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

  test("IVF-cell pairs are a subset of the exact all-pairs result") {
    val exact = SimilarityQueries.dedupEmbedding(spark, dir).select("id_a", "id_b")
    val apx = SimilarityQueries.dedupEmbeddingIvf(spark, dir).select("id_a", "id_b")
    assert(apx.exceptAll(exact).isEmpty, "IVF path emitted a pair the exact path lacks")
  }

  test("measured recall clears each method's design floor") {
    val rows = SimilarityQueries.dedupEmbRecall(spark, dir).collect()
      .map(r => r.getAs[String]("method") -> r.getAs[Double]("recall_vs_exact"))
      .toMap
    assert(rows("lsh_banded") >= 0.8,
      s"LSH recall ${rows("lsh_banded")} below design floor")
    // cluster blocking at a low threshold legitimately recalls less; the
    // floor pins it from silently collapsing, the gate pins it exactly
    assert(rows("ivf_cell") >= 0.3,
      s"IVF recall ${rows("ivf_cell")} below design floor")
  }
}
