package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalQueries

/** q_mm_audio_features: the real javax.sound WAV decode must recover,
  * for every fixture payload, the features computed by an INDEPENDENT
  * re-derivation — regenerating the raw sample stream directly (not via
  * the closed-form counts the oracle uses) and folding the features over
  * it in plain Scala. */
class AudioFeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def expected(id: Long): (Int, Long, Long, Long, Long, Long) = {
    val n = 256 + (id % 1000).toInt
    val h = 2 + (id % 30).toInt
    val a = 1000 + ((id * 13) % 20000).toInt
    val b = 1000 + ((id * 7 + 500) % 20000).toInt
    val c = 1 + (id % 2).toInt
    // interleaved stream, frame by frame
    val stream = (0 until n).flatMap { i =>
      val v = if ((i / h) % 2 == 0) a else -b
      Seq.fill(c)(v)
    }
    val sumAbs = stream.map(v => math.abs(v).toLong).sum
    val peak = stream.map(v => math.abs(v).toLong).max
    val energy = stream.map(v => { val x = math.abs(v).toLong; x * x }).sum
    val zc = stream.sliding(2).count(p =>
      (p(0) < 0 && p(1) >= 0) || (p(0) >= 0 && p(1) < 0))
    (c, n.toLong, sumAbs, peak, zc.toLong, energy)
  }

  test("decoded features equal the raw-stream re-derivation for every doc") {
    val got = MultimodalQueries.mmAudioFeatures(spark, dir).collect()
    assert(got.length == 500)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (c, n, sumAbs, peak, zc, energy) = expected(id)
      assert(r.getAs[Int]("channels") == c, s"channels, doc $id")
      assert(r.getAs[Int]("sample_rate") == 8000, s"rate, doc $id")
      assert(r.getAs[Long]("n_frames") == n, s"frames, doc $id")
      assert(r.getAs[Long]("sum_abs") == sumAbs, s"sum_abs, doc $id")
      assert(r.getAs[Long]("peak") == peak, s"peak, doc $id")
      assert(r.getAs[Long]("zero_cross") == zc, s"zero_cross, doc $id")
      assert(r.getAs[Long]("energy") == energy, s"energy, doc $id")
      assert(r.getAs[Double]("mean_abs") == sumAbs.toDouble / (n * c).toDouble)
    }
  }
}
