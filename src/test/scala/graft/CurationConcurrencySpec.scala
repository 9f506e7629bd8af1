package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationMm, CurationState, StateRef}
import graft.sources.{ManagedTable, ScratchDirs}

/** Ingest-vs-retract WRITE SAFETY on the versioned curation state: a
  * production loop overlaps operations, and the failure mode that
  * matters is SILENT RESURRECTION — an ingest that derived its output
  * from state@v0 publishing OVER a retraction that moved the state to
  * v1, re-admitting pairs/artifacts of documents the retraction removed.
  *
  * The state layer prevents it by optimistic concurrency: every state
  * publish derived from version v is a CAS against v
  * ([[graft.operators.CurationState.publish]] routing through
  * [[ManagedTable.commit]]'s `_commitlock` conditional-swap). The
  * interleave is driven DETERMINISTICALLY here — the retraction lands
  * first, then an ingest pinned to the now-stale v0 runs to completion
  * and must ABORT at its state publish:
  *
  *  - the loser throws [[ManagedTable.ConcurrentWriteException]] naming
  *    the expected and live versions;
  *  - the state head is untouched by the loser (still the retraction's
  *    v1, core and manifest twins still aligned) — first-writer-wins,
  *    no lost update, no resurrection;
  *  - the loser's RUN TABLE is its own private root, so the aborted
  *    attempt leaves the shared state clean (production would re-read
  *    the new head and re-derive, exactly Delta/Iceberg's retry loop).
  */
class CurationConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val b2 = 400L // 4N/5 at the 500-doc fixture corpus

  test("a stale ingest publishing over a newer retraction aborts at the " +
      "CAS and leaves the state head untouched") {
    val arena = ScratchDirs.fresh("mmconc_arena")
    val state = s"$arena/state"
    // v0 = the standard base state (docs < 4N/5), cloned so the shared
    // fixture is never mutated
    CurationState.cloneTo(spark,
      CurationMm.baseStateRoot(spark, dir), state)
    assert(CurationState.version(state) == 0)

    // writer A (the retraction) wins: CAS v0 -> v1
    CurationMm.retractAt(spark, dir, s"$arena/rtable",
      baseState = Some(StateRef(state)), docTop = Some(b2),
      stateOut = Some(state))
    assert(CurationState.version(state) == 1,
      "retraction must have published state v1")
    val v1labels = CurationState.fam(spark, state, "labels", Some(1))
    val v1count = v1labels.count()

    // writer B (the ingest) derived from v0 — the snapshot it read is
    // immutable, the full ingest runs fine, and the PUBLISH must abort
    val ex = intercept[ManagedTable.ConcurrentWriteException] {
      CurationMm.ingestReplayForSpec(spark, dir, s"$arena/itable",
        StateRef(state, Some(0)), stateOut = Some(state))
    }
    assert(ex.getMessage.contains("expected live v0") &&
      ex.getMessage.contains("found\nv1".replace("\n", " ")),
      s"conflict message must name both versions: ${ex.getMessage}")

    // first-writer-wins: the head is still the retraction's v1, twins
    // aligned, content untouched — nothing of the loser leaked
    assert(CurationState.version(state) == 1,
      "loser must not move the state head")
    val after = CurationState.fam(spark, state, "labels", Some(1))
    assert(after.count() == v1count &&
      after.exceptAll(v1labels).isEmpty,
      "loser must not alter the published v1 content")
    // and the retraction's effect survives: no retracted doc's node in
    // the live labels (doc nodes are ≡ 0 mod 8)
    val resurrected = CurationState.fam(spark, state, "labels")
      .filter(col("node") % 8 === 0 &&
        (col("node") / 8) % 23 === 4 && col("node") / 8 < b2)
      .count()
    assert(resurrected == 0L, s"$resurrected retracted doc nodes resurrected")
  }
}
