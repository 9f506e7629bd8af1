package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalQueries

/** q_mm_phash_neardup semantics on sf0.001:
  *  - the REAL decode recovers the fixture generator's closed-form
  *    56-bit dHash for every (base, near-variant) image;
  *  - the seeded near-variants differ from their base by 1-3 bits —
  *    pairs exact-phash grouping provably misses (distinct hashes);
  *  - the banded + Hamming-verified gate recovers every such pair.
  */
class PhashNeardupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Closed-form dHash-56 of the grid raster — the generator's own
    * arithmetic (mirrors the DuckDB oracle CTEs, independent of the
    * decode path under test). */
  private def expectedHash(id: Long, variant: Int): Long = {
    def tone(j: Int, i: Int): Int = {
      val si =
        if (variant == 1 && j == (id % 7).toInt) {
          val i0 = (id % 8).toInt
          if (i == i0) i0 + 1 else if (i == i0 + 1) i0 else i
        } else i
      val z = (id * 48271L + j * 9 + si + 1) % 65521L
      val w = (z * z) % 65521L
      (2L * (((w * w) % 65519L) % 120L) + si % 2).toInt
    }
    var hash = 0L
    for (j <- 0 until 7; i <- 0 until 8)
      if (tone(j, i) > tone(j, i + 1)) hash |= 1L << (j * 8 + i)
    hash
  }

  private lazy val decoded: Map[Long, Long] =
    MultimodalQueries.phashFrame(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val docIds: Seq[Long] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  test("real decode recovers the closed-form hash for every fixture image") {
    assert(decoded.size == docIds.size + docIds.count(_ % 3 == 0))
    docIds.foreach { d =>
      assert(decoded(2 * d) == expectedHash(d, 0), s"base hash, doc $d")
      if (d % 3 == 0)
        assert(decoded(2 * d + 1) == expectedHash(d, 1), s"variant hash, doc $d")
    }
  }

  test("banded near-dup recovers every seeded 1-2-bit pair exact grouping misses") {
    val out = MultimodalQueries.mmPhashNeardup(spark, dir).collect()
      .map(r => (r.getAs[Long]("canon_a"), r.getAs[Long]("canon_b")) ->
        r.getAs[Int]("hamming")).toMap
    // group canon per phash, as the gate computes it
    val canonOf = decoded.toSeq.groupBy(_._2)
      .map { case (ph, imgs) => ph -> imgs.map(_._1).min }
    val seeded = docIds.filter(_ % 3 == 0).flatMap { d =>
      val (hb, hv) = (decoded(2 * d), decoded(2 * d + 1))
      val ham = java.lang.Long.bitCount(hb ^ hv)
      if (ham == 0) None else Some((d, hb, hv, ham))
    }
    // the fixture genuinely seeds near pairs, and they flip only 1-3 bits
    // (bit i0 guaranteed; only that row's i0-1, i0, i0+1 can change)
    assert(seeded.nonEmpty, "fixture must contain perturbed near pairs")
    seeded.foreach { case (d, _, _, ham) =>
      assert(ham >= 1 && ham <= 3, s"doc $d variant flipped $ham bits")
    }
    // every seeded pair: distinct phash (exact grouping MISSES it) but
    // present in the gate output as a near pair of its two groups
    seeded.foreach { case (d, hb, hv, ham) =>
      assert(hb != hv)
      val key = if (hb < hv) (canonOf(hb), canonOf(hv)) else (canonOf(hv), canonOf(hb))
      assert(out.contains(key), s"seeded near pair of doc $d missing from gate")
      assert(out(key) == ham, s"hamming for doc $d")
    }
    // and the gate only ever emits merges exact grouping missed
    assert(out.nonEmpty)
    out.values.foreach(h => assert(h >= 1 && h <= 3))
  }

  test("bucket cap drops degenerate flat-image bands but keeps pairs " +
      "agreeing on a healthy band") {
    import org.apache.spark.sql.functions.{col, lit}
    // Degenerate cluster: 200 DISTINCT hashes whose low 14 bits are all
    // zero (the flat-image / letterbox pathology: band 0's chunk — and
    // bands 2-3's, since i < 2^14 — is shared by every one of them).
    // Plus one seeded near pair (A, B) that shares healthy band-1 chunk
    // 300 and differs only in band 0 (Hamming 2).
    val spark2 = spark
    import spark2.implicits._
    val flat = (1L to 200L).map(i => i << 14)
    val a = (300L << 14) | 5L
    val b = (300L << 14) | 6L
    val grp = (flat :+ a :+ b).toDF("phash")
      .withColumn("canon", col("phash"))
      .withColumn("n_copies", lit(1L))
    // Uncapped: the 200-hash flat cluster floods the candidate join —
    // every pair agrees on band 0 (and 2, 3), so candidates are ~C(200,2).
    val uncapped = MultimodalQueries.phashGroupPairs(grp, 3, Int.MaxValue)
      .collect()
    assert(uncapped.length > 199,
      "degenerate fixture must flood the uncapped join with near pairs")
    // Capped at 10: all four degenerate buckets exceed the cap and are
    // dropped BEFORE the join; the only surviving candidate is the seeded
    // pair, which agrees on its healthy (2-member) band-1 bucket.
    val capped = MultimodalQueries.phashGroupPairs(grp, 3, 10).collect()
    assert(capped.length == 1, s"capped join kept ${capped.length} pairs")
    assert(capped.head.getAs[Long]("canon_a") == math.min(a, b) &&
      capped.head.getAs[Long]("canon_b") == math.max(a, b))
    assert(capped.head.getAs[Int]("hamming") == 2)
  }

  test("clusters are the transitive closure of the near pairs") {
    val pairs = MultimodalQueries.mmPhashNeardup(spark, dir).collect()
      .map(r => (r.getAs[Long]("canon_a"), r.getAs[Long]("canon_b")))
    val rows = MultimodalQueries.mmPhashClusters(spark, dir).collect()
    val cluster = rows.map(r => r.getAs[Long]("canon") ->
      r.getAs[Long]("cluster_id")).toMap
    // both endpoints of every near pair share one cluster, and every
    // clustered group appears in at least one pair (nodes come from edges)
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(cluster.keySet == inPairs)
    // per-cluster totals are consistent
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, rs) =>
      assert(rs.forall(_.getAs[Long]("n_groups") == rs.length))
      val total = rs.map(_.getAs[Long]("n_copies")).sum
      assert(rs.forall(_.getAs[Long]("cluster_images") == total))
      assert(rs.count(_.getAs[Int]("is_canonical") == 1) == 1)
      assert(cid == rs.map(_.getAs[Long]("canon")).min)
    }
  }
}
