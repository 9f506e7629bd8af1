package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CurationMm

/** q_curation_mm_e2e semantics on sf0.001 — the funnel-count contract:
  *  - one manifest row per document;
  *  - each per-modality screen drops EXACTLY its seeded doc set (the
  *    attachment model makes every reason a closed-form residue class);
  *  - multi-reason attribution: docs failing several screens list all
  *    of them, in screen order;
  *  - leakage safety: every cross-modality group is split-pure, and the
  *    grouping genuinely crosses modalities (a clip-twin carrier shares
  *    its predecessor's group through the video axis alone).
  */
class CurationMmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows: Map[Long, (String, String, String, Long)] =
    CurationMm.curationMmE2e(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("kept"), r.getAs[String]("drop_reasons"),
          r.getAs[String]("split"), r.getAs[Long]("group_id"))).toMap

  private lazy val docIds: Seq[Long] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

  private def reasonSet(reason: String): Set[Long] =
    rows.collect { case (d, (_, rs, _, _))
      if rs.split(",").contains(reason) => d }.toSet

  test("one row per document; kept iff no reason fires") {
    assert(rows.size == docIds.size)
    rows.foreach { case (d, (kept, reasons, _, _)) =>
      assert(kept == (if (reasons.isEmpty) "true" else "false"), s"doc $d")
    }
    assert(rows.values.count(_._1 == "true") > 0, "some documents survive")
  }

  test("per-modality funnels are exactly the seeded residue classes") {
    assert(reasonSet("image_dup") == docIds.filter(_ % 3 == 1).toSet,
      "image screen diverged from the seeded twin carriers")
    assert(reasonSet("audio_dup") == docIds.filter(_ % 5 == 1).toSet,
      "audio screen diverged from the seeded twin carriers")
    assert(reasonSet("video_dup") == docIds.filter(_ % 4 == 1).toSet,
      "clip-dup screen diverged from the seeded re-upload carriers")
    assert(reasonSet("video_static") == docIds.filter(_ % 4 == 3).toSet,
      "static screen diverged from the seeded static carriers")
    // text_dup and low_quality come from the corpus itself, not the
    // attachment model — pin only that the text screen fires somewhere
    assert(reasonSet("text_dup").nonEmpty)
  }

  test("multi-reason attribution lists every firing screen, in order") {
    // doc 13: % 3 == 1 (twin image) and % 4 == 1 (clip re-upload)
    val multi = docIds.filter(d => d % 3 == 1 && d % 4 == 1 && d % 5 != 1)
      .filterNot(d => rows(d)._2.contains("text_dup") ||
        rows(d)._2.contains("low_quality"))
    assert(multi.nonEmpty)
    multi.foreach { d =>
      assert(rows(d)._2 == "image_dup,video_dup", s"doc $d: ${rows(d)._2}")
    }
  }

  test("cross-modality groups are split-pure and genuinely cross modalities") {
    val byGroup = rows.toSeq.groupBy(_._2._4)
    byGroup.foreach { case (g, members) =>
      assert(members.map(_._2._3).distinct.size == 1,
        s"group $g mixes splits — leakage")
    }
    // a clip-twin carrier (d % 4 == 1) shares its predecessor's group
    // through the video pair edge alone
    docIds.filter(d => d % 4 == 1 && d >= 1).take(20).foreach { d =>
      assert(rows(d)._4 == rows(d - 1)._4,
        s"doc $d not co-grouped with its clip-twin source ${d - 1}")
    }
    // an image-twin carrier likewise via the image cluster edge
    docIds.filter(d => d % 3 == 1 && d >= 1).take(20).foreach { d =>
      assert(rows(d)._4 == rows(d - 1)._4,
        s"doc $d not co-grouped with its image-twin source ${d - 1}")
    }
    // and grouping is not degenerate (one giant component would make
    // the split draw meaningless — the fixture-entropy failure mode)
    assert(byGroup.size > docIds.size / 10,
      s"only ${byGroup.size} groups — grouping collapsed")
  }

  test("loader-ready packing covers exactly the kept train-split docs, " +
      "with a gapless token stream") {
    val kept = rows.collect {
      case (d, ("true", _, "train", _)) => d
    }.toSet
    assert(kept.nonEmpty)
    val packed = CurationMm.curationPackE2e(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("bin_id"), r.getAs[Long]("bin_offset")))
      .sortBy(_._1)
    assert(packed.map(_._1).toSet == kept,
      "pack assignment does not cover exactly the kept train docs")
    assert(packed.map(_._1).distinct.length == packed.length)
    // the concatenated stream is gapless: each doc starts where the
    // previous one ended (bin_id * budget + bin_offset == running sum)
    var cum = 0L
    packed.foreach { case (d, n, bin, off) =>
      assert(bin * 2048L + off == cum, s"doc $d starts at gap/overlap")
      cum += n
    }
  }
}
