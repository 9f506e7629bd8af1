package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationMm, CurationState}
import graft.sources.{ManagedTable, ScratchDirs}

/** The LIFECYCLE contract (q_curation_mm_cycle) beyond the oracle hash:
  * bootstrap → ingest → retract → ingest, every step consuming the
  * previous step's republished state, one table recording it all.
  *
  *  - ENGINE-SIDE FULL EQUALITY: the cycle's final manifest equals the
  *    one-shot capstone over a physically materialized surviving world
  *    (documents minus the mid-stream retraction) — no DuckDB in the
  *    loop.
  *  - THE TABLE IS THE AUDIT LOG: v2's feed carries the retraction's
  *    delete rows (exactly the retracted ingested docs), v3's feed the
  *    batch-2 inserts — including batch-2 docs matching the retraction
  *    residue, which were never retracted and must be admitted.
  *  - NO RESURRECTION: no retracted doc reappears in the final
  *    manifest, and the live leg consumed the post-RETRACTION state.
  */
class CurationMmCycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val b2 = 400L // 4N/5 at the 500-doc fixture corpus

  private lazy val cyc = CurationMm.cycleShared(spark, dir)
  private lazy val table = s"$cyc/table"

  test("cycle equals the capstone over the surviving world; the live " +
      "leg consumes the post-retraction state") {
    val world = ScratchDirs.fresh("mmcycle_world")
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 23 =!= 4 || col("doc_id") >= b2)
      .write.parquet(s"$world/documents.parquet")
    val expected = CurationMm.curationMmE2e(spark, world)
    val got = CurationMm.curationMmCycle(spark, dir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "lifecycle result diverges from the surviving-world recompute")
    assert(CurationMm.lastIngestBase == s"$cyc/state@v1",
      s"batch 2 ran off '${CurationMm.lastIngestBase}', not the " +
        "post-retraction state version")
    // the cycle's own state history: v0 = cloned post-batch-1 snapshot,
    // v1 = post-retraction — core and manifest twins aligned
    assert(CurationState.version(s"$cyc/state") == 1,
      "cycle fixture must leave the state at v1 (clone=0, retraction=1)")
  }

  test("the table's feeds record the lifecycle: deletes at v2, " +
      "batch-2 inserts at v3") {
    val v2feed = ManagedTable.changes(spark, table, 2)
    val dels = v2feed.filter(col("_action") === "delete")
    assert(dels.count() > 0 &&
      dels.filter(col("doc_id") % 23 =!= 4 || col("doc_id") >= b2)
        .count() == 0,
      "v2 deletes must be exactly the retracted ingested docs")
    val v3feed = ManagedTable.changes(spark, table, 3)
    val ins = v3feed.filter(col("_action") === "insert")
    assert(ins.count() == 100 && ins.filter(col("doc_id") < b2).count() == 0,
      "v3 inserts must be exactly batch 2")
    // batch-2 docs on the retraction residue were never retracted —
    // they must be ADMITTED (no over-deletion by the alive screen)
    val admitted = ManagedTable.read(spark, table)
      .filter(col("doc_id") % 23 === 4 && col("doc_id") >= b2).count()
    assert(admitted > 0, "batch-2 docs on the retraction residue must land")
    // and no retracted doc survives anywhere
    val resurrected = ManagedTable.read(spark, table)
      .filter(col("doc_id") % 23 === 4 && col("doc_id") < b2).count()
    assert(resurrected == 0L, s"$resurrected retracted docs resurrected")
  }
}
