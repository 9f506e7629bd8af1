package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalQueries

/** q_mm_video_clip_neardup semantics on sf0.001:
  *  - the decoded frame table's hashes match the grid generator's closed
  *    form (and are effectively unique — the property that makes a
  *    shared shingle MEAN a shared clip);
  *  - the recovered pair set is EXACTLY the seeded (base, trimmed
  *    re-upload) twins — no coincidence pairs;
  *  - each twin pair's shared-shingle count and Jaccard match the
  *    construction (nf−2 shared of nf−1 per side).
  */
class VideoClipNeardupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tone(fid: Long, j: Int, i: Int): Int = {
    val z = (fid * 63 + j * 9 + i + 1) % 65521L
    val w = (z * z) % 65521L
    (((w * w) % 65519L) % 256L).toInt
  }
  private def expectedHash(fid: Long): Long = {
    var h = 0L
    for (j <- 0 until 7; i <- 0 until 8)
      if (tone(fid, j, i) > tone(fid, j, i + 1)) h |= 1L << (j * 8 + i)
    h
  }

  private lazy val docIds: Seq[Long] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("decoded frame hashes match the grid closed form, near-uniquely") {
    val frames = spark.read
      .parquet(MultimodalQueries.videoClipFrameTablePath(spark, dir))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    docIds.foreach { d =>
      val nf = (3 + d % 3).toInt
      for (f <- 0 until nf)
        assert(frames((2 * d, f)) == expectedHash(d * 31 + 7L * f),
          s"base frame hash, doc $d frame $f")
      if (d % 4 == 0) {
        for (f <- 1 until nf)
          assert(frames((2 * d + 1, f - 1)) == expectedHash(d * 31 + 7L * f))
        assert(frames((2 * d + 1, nf - 1)) ==
          expectedHash(d * 31 + 7L * nf + 13L))
      }
      if (d % 4 == 2) // static clip: 3 copies of the one seeded frame
        for (f <- 0 until 3)
          assert(frames((2 * d + 1, f)) == expectedHash(d * 31 + 1),
            s"static frame hash, doc $d frame $f")
    }
    // near-uniqueness over DISTINCT fids (twin videos re-list their
    // base's frames by construction, so raw rows double-count them)
    val fids = docIds.flatMap { d =>
      val nf = (3 + d % 3).toInt
      (0 until nf).map(f => d * 31 + 7L * f) ++
        (if (d % 4 == 0) Seq(d * 31 + 7L * nf + 13L) else Nil) ++
        (if (d % 4 == 2) Seq(d * 31 + 1L) else Nil)
    }.distinct
    val hs = frames.values.toSeq.distinct
    assert(hs.size > fids.size * 9 / 10,
      "frame hashes lost their near-uniqueness — shingles would match " +
        "by coincidence again")
  }

  test("recovered pairs are exactly the seeded trimmed re-uploads, with " +
      "the constructed overlap") {
    val out = MultimodalQueries.mmVideoClipNeardup(spark, dir).collect()
      .map(r => (r.getAs[Long]("video_a"), r.getAs[Long]("video_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"),
          r.getAs[Long]("n_b"), r.getAs[Double]("jaccard"))).toMap
    val seeded = docIds.filter(_ % 4 == 0).map(d => (2 * d, 2 * d + 1)).toSet
    assert(out.keySet == seeded,
      s"pair set diverged: extra=${out.keySet -- seeded} missing=${seeded -- out.keySet}")
    seeded.foreach { case (a, b) =>
      val d = a / 2
      val nf = (3 + d % 3).toInt
      val (shared, na, nb, jac) = out((a, b))
      // base: nf-1 shingles; twin: nf-1 shingles; shared run: nf-2
      assert(na == nf - 1 && nb == nf - 1 && shared == nf - 2,
        s"overlap for doc $d: shared=$shared na=$na nb=$nb")
      assert(jac == (nf - 2).toDouble / nf.toDouble, s"jaccard for doc $d")
    }
  }

  test("curation folds every screen into the drop list: clip_dup for " +
      "twin re-uploads, static_clip for the seeded static clips, " +
      "everything else kept") {
    val out = MultimodalQueries.mmVideoCuration(spark, dir).collect()
      .map(r => r.getAs[Long]("video_id") ->
        (r.getAs[String]("kept"), r.getAs[String]("drop_reason"))).toMap
    docIds.foreach { d =>
      assert(out(2 * d) == (("true", "")), s"base video of doc $d")
      if (d % 4 == 0)
        assert(out(2 * d + 1) == (("false", "clip_dup")),
          s"twin re-upload of doc $d")
      if (d % 4 == 2)
        assert(out(2 * d + 1) == (("false", "static_clip")),
          s"static clip of doc $d")
    }
    // funnel counts: one row per video, drops = twins + statics
    val nTwins = docIds.count(_ % 4 == 0)
    val nStatic = docIds.count(_ % 4 == 2)
    assert(out.size == docIds.size + nTwins + nStatic)
    assert(out.values.count(_._1 == "false") == nTwins + nStatic)
  }
}
