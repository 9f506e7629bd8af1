package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphCC

class GraphCCSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    GraphCC.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter)
      .as[(Long, Long)].collect().toMap

  test("transitive chain collapses to one component labeled by its min") {
    // A-B, B-C, C-D: (A,D) never appears as a pair but is the same cluster
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep separate min labels") {
    val got = cc(Seq((5L, 9L), (9L, 7L), (20L, 30L), (40L, 40L)))
    assert(got == Map(5L -> 5L, 9L -> 5L, 7L -> 5L, 20L -> 20L, 30L -> 20L,
      40L -> 40L))
  }

  test("duplicate, reversed, and self edges do not change the result") {
    val got = cc(Seq((2L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a long path needs diameter rounds and converges within the bound") {
    // path of 12 nodes: min label must walk the full diameter
    val edges = (0L until 11L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.values.toSet == Set(0L) && got.size == 12)
  }

  test("an empty edge list yields an empty labeling, not an error") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("a 10^4-node path converges within maxIter via pointer jumping") {
    // Diameter 9999 ≫ 25 rounds: pure min-propagation would fail here;
    // pointer jumping closes it in ~log2(n) rounds.
    val edges = (0L until 9999L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.values.toSet == Set(0L) && got.size == 10000)
    // The reported round count is the pointer-jumping bound, not the
    // diameter: each round at least halves pointer depth, so a 10⁴-chain
    // must close in ~log2(10⁴) ≈ 14 rounds (and certainly > 5 — a chain
    // is the worst case, not a one-round star).
    val rounds = GraphCC.lastRunRounds
    assert(rounds >= 5 && rounds <= 16,
      s"10^4-chain reported $rounds rounds — outside the O(log n) band")
  }

  test("maxIter too small for the diameter fails loudly, not half-merged") {
    val edges = (0L until 11L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException](cc(edges, maxIter = 2))
    assert(e.getMessage.contains("did not converge"))
  }
}
