package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationMm, CurationState}
import graft.sources.{ManagedTable, ScratchDirs}

/** The CHAIN contract (q_curation_mm_chain / q_curation_mm_chain_cdf)
  * beyond the oracle hash — the compositionality properties a production
  * loop relies on:
  *
  *  - ROUND 2 CONSUMES ROUND 1'S PUBLISHED STATE: the live chain gate's
  *    ingest reads state VERSION 2 — the version the first ingest
  *    republished — and NEVER touches the t=0 bootstrap fixture
  *    (`mmcur_base_fix`): the "a second batch cannot re-derive from t=0"
  *    requirement, pinned on the observable base-ref record and on the
  *    fixture request counters.
  *  - THE REPUBLISHED STATE IS THE PUBLISHED TABLE: the state table's
  *    manifest at v2 is row-identical to the chain table's v2 snapshot
  *    (what batch 1 published IS what batch 2 consumed — no side
  *    channel), and likewise v1 with v1: state and table versions ALIGN.
  *  - THE CHAIN CONVERGES: the live round-2 result equals the one-shot
  *    full-corpus capstone exactly (the oracle also pins this by hash;
  *    here it is pinned engine-side with no DuckDB in the loop).
  *  - THE v3 FEED IS THE ROUND-2 DELTA: inserts are exactly batch 2,
  *    and every post-batch-1 row absent from the feed survived round 2
  *    verbatim.
  */
class CurationMmChainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val chain = CurationMm.chainShared(spark, dir)
  private lazy val table = s"$chain/table"

  test("state versions align with table versions: state@v2 manifest is " +
      "exactly the chain table's v2 snapshot (and v1 with v1)") {
    assert(CurationState.version(s"$chain/state") == 2,
      "chain fixture must leave the state at v2 (bootstrap=1, batch 1=2)")
    val st = CurationState.manifest(spark, s"$chain/state", Some(2))
    val v2 = ManagedTable.readVersion(spark, table, 2)
    assert(st.exceptAll(v2).isEmpty && v2.exceptAll(st).isEmpty,
      "republished state manifest diverges from the published v2 snapshot")
    val st1 = CurationState.manifest(spark, s"$chain/state", Some(1))
    val v1 = ManagedTable.readVersion(spark, table, 1)
    assert(st1.exceptAll(v1).isEmpty && v1.exceptAll(st1).isEmpty,
      "bootstrap state manifest diverges from the table's v1 snapshot")
  }

  test("live round 2 consumes state@v2, never the t=0 fixture, and " +
      "converges to the one-shot capstone") {
    val baseFixBefore = ScratchDirs.requestedMemoCounts
      .getOrElse("mmcur_base_fix", 0L)
    val got = CurationMm.curationMmChain(spark, dir)
    val full = CurationMm.curationMmE2e(spark, dir)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty,
      "chained ingest does not converge to the full recompute")
    assert(CurationMm.lastIngestBase == s"$chain/state@v2",
      s"round 2 ran off '${CurationMm.lastIngestBase}', not round 1's " +
        "republished state version")
    val baseFixAfter = ScratchDirs.requestedMemoCounts
      .getOrElse("mmcur_base_fix", 0L)
    assert(baseFixAfter == baseFixBefore,
      "the chain gate consulted the t=0 bootstrap fixture")
  }

  test("v3 feed = the round-2 delta; unfed v2 rows survive verbatim") {
    val b2 = 400L // 4N/5 at the 500-doc fixture corpus
    val feed = ManagedTable.changes(spark, table, 3)
    val inserts = feed.filter(col("_action") === "insert")
    val updates = feed.filter(col("_action") === "update")
    assert(inserts.count() > 0 && updates.count() > 0,
      "both merge legs must fire at gate scale")
    assert(inserts.filter(col("doc_id") < b2).count() == 0 &&
      inserts.count() == 100,
      "v3 inserts must be exactly batch 2")
    val v2 = ManagedTable.readVersion(spark, table, 2).alias("b")
    val v3 = ManagedTable.readVersion(spark, table, 3).alias("f")
    val fedIds = feed.select(col("doc_id").as("_fed_id"))
    val changedOutsideFeed = v3
      .join(v2, col("f.doc_id") === col("b.doc_id"))
      .join(fedIds, col("f.doc_id") === col("_fed_id"), "left_anti")
      .filter(v3.columns.filter(_ != "doc_id")
        .map(c => !(col(s"f.$c") <=> col(s"b.$c"))).reduce(_ || _))
      .count()
    assert(changedOutsideFeed == 0L,
      s"$changedOutsideFeed post-batch-1 rows changed without a feed record")
  }
}
