package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CurationMm
import graft.sources.ManagedTable

/** The incremental-curation contract (q_curation_mm_incremental /
  * q_curation_mm_cdf) beyond the oracle hash:
  *
  *  - SPLIT STABILITY: a base document whose leakage group did not
  *    change NEVER migrates between train/validation/test — eval sets
  *    stay frozen under ingest. (The draw is a pure function of
  *    group_id, so the real assertion is that the incremental path
  *    never perturbs the group of an untouched component.)
  *  - The merge feed is MINIMAL and COMPLETE: exactly the changed base
  *    rows (as updates) plus the whole new batch (as inserts); every
  *    doc absent from the feed kept its base manifest row verbatim.
  *  - Both merge legs are actually exercised at gate scale (updates and
  *    inserts both non-empty), so the update-when-changed clause is
  *    tested, not just plumbed.
  */
class CurationMmIncSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val baseRoot = CurationMm.baseStateRoot(spark, dir)
  private lazy val runRoot = CurationMm.incRunShared(spark, dir)
  private lazy val base =
    graft.operators.CurationState.manifest(spark, baseRoot)
  private lazy val fin = ManagedTable.read(spark, runRoot)
  private lazy val feed = ManagedTable.changes(spark, runRoot, 2)

  test("no train/test migration without a group change") {
    val migrated = fin.alias("f")
      .join(base.alias("b"), col("f.doc_id") === col("b.doc_id"))
      .filter(col("f.group_id") === col("b.group_id") &&
        col("f.split") =!= col("b.split"))
      .count()
    assert(migrated == 0L,
      s"$migrated base docs changed split while keeping their group")
  }

  test("feed is minimal and complete; docs outside it are untouched") {
    val b = base.count()
    val inserts = feed.filter(col("_action") === "insert")
    val updates = feed.filter(col("_action") === "update")
    assert(inserts.count() > 0L && updates.count() > 0L,
      "both merge legs must fire at gate scale")
    // inserts = exactly the docs beyond the base corpus
    assert(inserts.agg(min(col("doc_id"))).head().getLong(0) == b &&
      inserts.count() == fin.count() - b,
      "insert leg must admit exactly the new batch")
    // every non-fed base doc kept its row verbatim
    val fedIds = feed.select(col("doc_id").as("_fed_id"))
    val changedOutsideFeed = fin.alias("f")
      .join(base.alias("b"), col("f.doc_id") === col("b.doc_id"))
      .join(fedIds, col("f.doc_id") === col("_fed_id"), "left_anti")
      .filter(fin.columns.filter(_ != "doc_id")
        .map(c => !(col(s"f.$c") <=> col(s"b.$c"))).reduce(_ || _))
      .count()
    assert(changedOutsideFeed == 0L,
      s"$changedOutsideFeed base rows changed without a feed record")
    // every fed update actually differs from its base row
    val vacuousUpdates = updates.alias("u")
      .join(base.alias("b"), col("u.doc_id") === col("b.doc_id"))
      .filter(fin.columns.filter(_ != "doc_id")
        .map(c => col(s"u.$c") <=> col(s"b.$c")).reduce(_ && _))
      .count()
    assert(vacuousUpdates == 0L,
      s"$vacuousUpdates update rows identical to their base row")
  }

  test("updates are driven only by group structure or screen flags") {
    // quality_score and n_tokens are pure per-doc functions — ingest can
    // never change them, so every update must differ in the group
    // columns or the keep/drop columns. (Note a flag CAN flip with both
    // group_id and group_docs unchanged: a new UNATTACHED artifact
    // bridging two per-modality clusters inside one component adds only
    // a non-doc node — so the assertable invariant is the per-doc
    // purity, not touched-component membership.)
    val bad = feed.filter(col("_action") === "update").alias("u")
      .join(base.alias("b"), col("u.doc_id") === col("b.doc_id"))
      .filter(!(col("u.quality_score") <=> col("b.quality_score")) ||
        !(col("u.n_tokens") <=> col("b.n_tokens")))
      .count()
    assert(bad == 0L,
      s"$bad updates changed a per-doc pure column — ingest corrupted " +
        "quality/token state")
  }
}
