package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationMm, PackQueries}

/** Structural pins for the screened pack (q_curation_pack_screened) and
  * the packing decision report (q_pack_report) beyond their oracles. */
class CurationPackScreenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("the contamination quarantine actually shrinks the pack stream") {
    // a vacuous screen (empty quarantine) would make the gate identical
    // to q_curation_pack_e2e — assert the screen FIRES at gate scale and
    // that no quarantined doc survives into the screened layout
    val e2e = CurationMm.curationPackE2e(spark, dir).cache()
    val screened = CurationMm.curationPackScreened(spark, dir).cache()
    assert(screened.count() < e2e.count(),
      "quarantine removed nothing — the screen is vacuous at gate scale")
    val leaked = screened
      .join(CurationMm.mmBenchContamination(spark, dir)
        .select(col("doc_id")).distinct(), Seq("doc_id"))
      .count()
    assert(leaked == 0L, s"$leaked quarantined docs reached the pack")
    e2e.unpersist(); screened.unpersist()
  }

  test("report rows satisfy the packing lower bounds at every budget") {
    val rows = PackQueries.packReport(spark, dir).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val budget = r.getAs[Long]("budget")
      val total = r.getAs[Long]("total_tokens")
      val chunkBins = r.getAs[Long]("chunk_bins")
      val ffdBins = r.getAs[Long]("ffd_bins")
      val padding = r.getAs[Long]("ffd_padding_tokens")
      // concatenate-and-chunk is the perfect-fill lower bound for ANY
      // no-split layout; FFD can only match or exceed it
      assert(chunkBins == (total + budget - 1) / budget)
      assert(ffdBins >= chunkBins,
        s"budget $budget: FFD used fewer bins than the perfect-fill bound")
      // padding = bins*budget - total + overfull excess, so this holds
      assert(padding >= ffdBins * budget - total,
        s"budget $budget: padding below its bin-count identity bound")
    }
  }
}
