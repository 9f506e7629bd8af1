package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationMm, CurationState, StateRef}
import graft.sources.{ManagedTable, ScratchDirs}

/** The ROLLBACK contract (q_curation_mm_restore) beyond the oracle hash —
  * what versioning the curation STATE actually buys a production loop:
  *
  *  - RESTORE IS EXACT: the rolled-back head (v2) is row-identical to
  *    the pre-ingest snapshot (v0) in EVERY state family and in the
  *    manifest — and the bad ingest stays auditable at v1 (linear
  *    history, never erased).
  *  - VERSIONS ALIGN: the state's core and manifest twin tables sit at
  *    the same version after every lifecycle step ([[CurationState
  *    .version]] hard-asserts it; here it is pinned at the fixture's
  *    final shape: v2 = clone, ingest, rollback).
  *  - REPLAY IS DETERMINISTIC: re-running the batch off the restored
  *    head republishes a state row-identical to the one the "bad"
  *    ingest published at v1 — restore-and-replay reproduces not just
  *    the manifest (the oracle pins that) but the full state, so the
  *    loop can keep chaining after a rollback.
  */
class CurationRestoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val fix = CurationMm.restoreShared(spark, dir)
  private lazy val state = s"$fix/state"

  private def famEqual(root: String, v1: Int, other: String, v2: Int,
                       fam: String): Boolean = {
    val a = CurationState.fam(spark, root, fam, Some(v1))
    val b = CurationState.fam(spark, other, fam, Some(v2))
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
  }

  test("rollback head (v2) is row-identical to the pre-ingest snapshot " +
      "(v0) in every family; the bad ingest stays auditable at v1") {
    assert(CurationState.version(state) == 2,
      "fixture must leave the state at v2 (clone=0, ingest=1, rollback=2)")
    CurationState.familyNames.foreach { f =>
      assert(famEqual(state, 2, state, 0, f),
        s"restored family '$f' diverges from the pre-ingest snapshot")
      }
    val m0 = CurationState.manifest(spark, state, Some(0))
    val m2 = CurationState.manifest(spark, state, Some(2))
    assert(m2.exceptAll(m0).isEmpty && m0.exceptAll(m2).isEmpty,
      "restored manifest diverges from the pre-ingest snapshot")
    // the rolled-back version is still time-travelable: v1 holds the
    // full post-ingest state (one family spot check + the manifest)
    val m1 = CurationState.manifest(spark, state, Some(1))
    assert(m1.count() > m0.count(),
      "v1 must still hold the post-ingest manifest (audit trail)")
  }

  test("replay off the restored head reproduces the v1 state exactly " +
      "and converges to the one-shot capstone") {
    val replay = ScratchDirs.fresh("mmrestore_replay")
    CurationState.cloneTo(spark, state, s"$replay/state") // v0 = restored head
    CurationMm.ingestReplayForSpec(spark, dir, s"$replay/table",
      StateRef(s"$replay/state"), stateOut = Some(s"$replay/state"))
    CurationState.familyNames.foreach { f =>
      assert(famEqual(s"$replay/state", 1, state, 1, f),
        s"replayed family '$f' diverges from the original ingest's v1")
    }
    val got = ManagedTable.read(spark, s"$replay/table")
    val full = CurationMm.curationMmE2e(spark, dir)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty,
      "replayed ingest does not converge to the full recompute")
  }
}
