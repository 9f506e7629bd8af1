package graft

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalQueries

/** Property certification of the tolerance-derived banded candidate
  * machinery (`phashGroupPairs`, shared by the image and audio near-dup
  * families): on seeded-random 56-bit hash sets,
  *  - UNCAPPED banding recovers EXACTLY the brute-force Hamming ≤ k pair
  *    set for every supported tolerance — the pigeonhole-losslessness
  *    claim (nBands = k+1 bands of ⌈56/nBands⌉ bits), verified against
  *    an implementation-independent O(n²) scan;
  *  - the bucket cap only ever REMOVES pairs (never invents one): the
  *    capped output is a subset of brute force at any cap. */
class BandingPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val mask56 = (1L << 56) - 1

  private def bruteForce(hs: Seq[Long], k: Int): Set[(Long, Long)] =
    (for {
      a <- hs; b <- hs if a < b
      if java.lang.Long.bitCount(a ^ b) <= k
    } yield (a, b)).toSet

  private def banded(hs: Seq[Long], k: Int,
                     maxBucket: Int): Set[(Long, Long)] = {
    val spark2 = spark
    import spark2.implicits._
    val grp = hs.toDF("phash")
      .withColumn("canon", col("phash"))
      .withColumn("n_copies", lit(1L))
    MultimodalQueries.phashGroupPairs(grp, k, maxBucket).collect()
      .map(r => (r.getAs[Long]("canon_a"), r.getAs[Long]("canon_b")))
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
  }

  test("uncapped banding equals brute force at every tolerance") {
    val rnd = new scala.util.Random(42)
    // ALL supported tolerances — k = 2/4/5 are the uneven splits
    // (nBands·chunkBits > 56) where a mis-sliced last band would lose
    // pairs while the even splits stayed green
    for (k <- 1 to 6) {
      val base = Vector.fill(50)(rnd.nextLong() & mask56)
      // seed genuine near pairs: flip 1..k random bits of some bases
      val near = base.take(25).map { h =>
        var v = h
        (1 to 1 + rnd.nextInt(k)).foreach(_ => v ^= 1L << rnd.nextInt(56))
        v
      }
      val hs = (base ++ near).distinct
      val expect = bruteForce(hs, k)
      assert(expect.nonEmpty, s"k=$k: seeding failed to produce near pairs")
      val got = banded(hs, k, Int.MaxValue)
      assert(got == expect,
        s"k=$k: banding diverged from brute force — " +
          s"missing=${(expect -- got).size} extra=${(got -- expect).size}")
    }
  }

  test("the bucket cap never invents a pair") {
    val rnd = new scala.util.Random(7)
    // skew deliberately: many hashes share low-14-bit chunk 0
    val hs = (Vector.fill(40)(rnd.nextLong() & mask56 & ~16383L) ++
      Vector.fill(40)(rnd.nextLong() & mask56)).distinct
    val expect = bruteForce(hs, 3)
    for (cap <- Seq(1, 5, Int.MaxValue)) {
      val got = banded(hs, 3, cap)
      assert(got.subsetOf(expect),
        s"cap=$cap produced pairs outside brute force: ${got -- expect}")
    }
  }
}
