package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish stream: token i repeated freq(i) times, shuffled across
    * partitions deterministically. */
  private def stream(freqs: Map[String, Int], partitions: Int) = {
    val toks = freqs.toSeq.sortBy(_._1)
      .flatMap { case (t, n) => Seq.fill(n)(t) }
    // deterministic interleave so every partition sees a mix
    toks.zipWithIndex.sortBy { case (_, i) => (i % 97, i) }.map(_._1)
      .toDS().repartition(partitions)
  }

  test("exact heavy hitters survive a tiny summary under eviction pressure") {
    // 3 heavy tokens + 400 singleton-ish tail tokens; k=8 counters per
    // partition forces constant decrement-all evictions
    val freqs = Map("alpha" -> 300, "beta" -> 200, "gamma" -> 120) ++
      (1 to 400).map(i => s"tail$i" -> 2).toMap
    val n = freqs.values.sum // 1420
    val k = 8                // threshold n/k = 177.5 → alpha, beta
    val got = Sketches.heavyHittersTokens(spark, stream(freqs, 6), k)
      .as[(String, Long)].collect().toMap
    val expected = freqs.collect {
      case (t, c) if c > n.toDouble / k => t -> c.toLong
    }.toMap
    assert(got == expected)
    assert(got.keySet == Set("alpha", "beta"))
  }

  test("threshold is strict and counts are exact at the boundary") {
    // token at exactly n/k must be EXCLUDED (strict >)
    val freqs = Map("big" -> 60, "edge" -> 25, "small" -> 15)
    val n = freqs.values.sum // 100; k=4 → threshold 25
    val got = Sketches.heavyHittersTokens(spark, stream(freqs, 4), 4)
      .as[(String, Long)].collect().toMap
    assert(got == Map("big" -> 60L))
  }

  test("single-partition degenerate stream still yields exact output") {
    val freqs = Map("x" -> 50, "y" -> 26, "z" -> 10)
    // n=86, k=3 → threshold 28.67: x qualifies, y (26) and z (10) do not
    val got = Sketches.heavyHittersTokens(spark, stream(freqs, 1), 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 50L))
  }
}
