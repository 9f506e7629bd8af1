package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MixQueries

/** DSIR importance-resampling selection (q_select_dsir) and its exact
  * fixed-point log2 primitive. */
class MixDsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("log2fpSql: integer fixed-point log2 underestimates true log2 by " +
      "less than 4 ULPs at 2^-16, across magnitudes and edge values") {
    import spark.implicits._
    // Edges: 1 (e=0), exact powers (fraction all-zero), power+1, the
    // mantissa-normalization boundary e=20/21, and wide magnitudes up to
    // the smoothed-product range (~2^5x).
    val vals: Seq[Long] = Seq(1L, 2L, 3L, 7L, 1023L, 1024L, 1025L,
      (1L << 20) - 1, 1L << 20, (1L << 20) + 1, (1L << 21) + 5,
      999999999999L, (1L << 40) + 12345L, (1L << 55) + 987654321L) ++
      (1 to 50).map(i => math.abs(new scala.util.Random(i).nextLong()) %
        (1L << 60) + 1)
    val got = vals.toDF("n")
      .select(col("n"), expr(MixQueries.log2fpSql("n")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (n, fp) =>
      val exact = math.log(n.toDouble) / math.log(2.0)
      val approx = fp.toDouble / 65536.0
      assert(approx <= exact + 1e-12, s"log2fp($n) overestimates: $approx > $exact")
      assert(exact - approx < 4.0 / 65536.0,
        s"log2fp($n) off by ${exact - approx} (> 4 ULPs)")
    }
    // Exact powers of two must be EXACT (the binary-length exponent path).
    got.filter { case (n, _) => (n & (n - 1)) == 0 }.foreach { case (n, fp) =>
      assert(fp == 65536L * java.lang.Long.numberOfTrailingZeros(n))
    }
  }

  test("q_select_dsir: the selected set is target-enriched (en share far " +
      "above base rate) and deterministic") {
    val sel = MixQueries.selectDsir(spark, dir).collect()
    assert(sel.length == 150)
    val enShare = sel.count(_.getAs[String]("lang") == "en").toDouble / sel.length
    // Base rate at sf0.001 is 193/500 = 0.386; hashed-bigram DSIR should
    // roughly double it (measured 0.88 at sf0.01's identical doc count).
    assert(enShare >= 0.75, s"en share $enShare — importance weights not selective")
    // Deterministic: same scores, same order, on a second plan.
    val again = MixQueries.selectDsir(spark, dir).collect()
    assert(sel.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    // Scores are the length-debiased per-feature mean of the integer
    // fixed-point sum — the division is the ONLY floating step.
    sel.foreach { r =>
      assert(r.getAs[Double]("dsir_score") ==
        r.getAs[Long]("log_w_fp").toDouble / r.getAs[Long]("n_feats").toDouble)
    }
  }

  test("overflow guard: bucket stats near 2^47 score without wrap and " +
      "rank exactly like exact real arithmetic") {
    import spark.implicits._
    // Synthetic stats with corpus totals ~2^47 per bucket group — the
    // raw smoothed products would be ~2^95, far past BIGINT. Ratios are
    // well separated (>1e-3 relative) so truncation (2^-16) and the
    // rescale's smoothing perturbation cannot reorder them.
    val rnd = new scala.util.Random(7)
    val huge = (0 until 64).map { b =>
      val cq = (1L << 45) + math.abs(rnd.nextLong()) % (1L << 46)
      val frac = 0.05 + 0.9 * ((b * 37 % 64) / 64.0)  // distinct ratios
      val ct = (cq * frac).toLong
      (b.toLong, cq, ct)
    }
    val stats = huge.toDF("b", "cq", "ct")
    val got = MixQueries.dsirBucketScores(stats).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 64)
    val nq = huge.map(_._2).sum  // may wrap? 64 * 2^46.5 ~ 2^52.5 — fine
    val nt = huge.map(_._3).sum
    val exact = huge.map { case (b, cq, ct) =>
      b -> (math.log((ct + 1.0) * (nq + 1024.0)) -
        math.log((cq + 1.0) * (nt + 1024.0)))
    }.toMap
    // no wrapped product: every fp score has a plausible magnitude
    // (|log2 ratio| < 64 in fixed-point units)
    got.values.foreach(s => assert(math.abs(s) < 64L * 65536L))
    // identical ranking
    val rankFp = got.toSeq.sortBy { case (b, s) => (s, b) }.map(_._1)
    val rankEx = exact.toSeq.sortBy { case (b, s) => (s, b) }.map(_._1)
    assert(rankFp == rankEx, "rescaled fixed-point ranking diverged")
    // and at small counts the guard is a provable no-op (sh = 0): scores
    // equal the unguarded formula computed directly
    val small = Seq((0L, 100L, 40L), (1L, 900L, 20L), (2L, 5L, 5L))
    val gotSmall = MixQueries.dsirBucketScores(small.toDF("b", "cq", "ct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (snq, snt) = (small.map(_._2).sum, small.map(_._3).sum)
    def fp(n: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
      var m = if (e <= 20) n << (20 - e) else n >> (e - 20)
      var f = 0L
      for (_ <- 1 to 16) {
        val sq = m * m
        if (sq >= (1L << 41)) { m = sq >> 21; f = f * 2 + 1 }
        else { m = sq >> 20; f = f * 2 }
      }
      f + e.toLong * 65536L
    }
    small.foreach { case (b, cq, ct) =>
      val want = fp((ct + 1) * (snq + 1024)) - fp((cq + 1) * (snt + 1024))
      assert(gotSmall(b) == want, s"sh=0 bucket $b diverged from unguarded")
    }
  }
}
