package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationMm, GraphCC}
import graft.sources.{ManagedTable, ScratchDirs}

/** The RETRACTION contract (q_curation_mm_retract / _cdf) beyond the
  * oracle hash:
  *
  *  - ENGINE-SIDE FULL EQUALITY: the touched-components-only retraction
  *    equals the one-shot capstone over a physically filtered corpus
  *    (documents minus the retracted set re-materialized as its own
  *    world dir — every fixture re-derived, no DuckDB in the loop).
  *  - THE FEED IS A RIGHT-TO-FORGET AUDIT RECORD: delete rows are
  *    exactly the retracted doc ids with their pre-image manifest rows;
  *    every unfed doc kept its pre-retraction row verbatim.
  *  - CANON RE-ELECTION (the hard case): retracting a text cluster's
  *    MINIMUM doc re-elects the surviving member as canonical — its
  *    text_dup drop reason disappears. Pinned with a targeted
  *    single-doc retraction against a cluster DISCOVERED from the
  *    fixture (content-independent: any corpus regeneration that seeds
  *    near-dup text keeps the assertion meaningful).
  */
class CurationMmRetractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val runRoot = CurationMm.retractShared(spark, dir)
  private lazy val v1 = ManagedTable.readVersion(spark, runRoot, 1)
  private lazy val fin = ManagedTable.read(spark, runRoot)
  private lazy val feed = ManagedTable.changes(spark, runRoot, 2)

  test("retraction equals the capstone over a physically filtered corpus") {
    val world = ScratchDirs.fresh("mmretract_world")
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 23 =!= 4)
      .write.parquet(s"$world/documents.parquet")
    val expected = CurationMm.curationMmE2e(spark, world)
    assert(fin.exceptAll(expected).isEmpty && expected.exceptAll(fin).isEmpty,
      "touched-only retraction diverges from the filtered-world recompute")
  }

  test("feed: deletes are exactly the retracted pre-images; unfed rows " +
      "survive verbatim") {
    val deletes = feed.filter(col("_action") === "delete")
    val updates = feed.filter(col("_action") === "update")
    assert(updates.count() > 0, "no update rows — touched survivors missing")
    val nRetracted = v1.filter(col("doc_id") % 23 === 4).count()
    assert(deletes.count() == nRetracted &&
      deletes.filter(col("doc_id") % 23 =!= 4).count() == 0,
      "delete rows must be exactly the retracted set")
    // delete rows carry the pre-image: each equals its v1 row
    val preMismatch = deletes.drop("_action").alias("d")
      .join(v1.alias("b"), col("d.doc_id") === col("b.doc_id"))
      .filter(v1.columns.filter(_ != "doc_id")
        .map(c => !(col(s"d.$c") <=> col(s"b.$c"))).reduce(_ || _))
      .count()
    assert(preMismatch == 0L, s"$preMismatch delete rows differ from their " +
      "pre-image manifest row")
    val fedIds = feed.select(col("doc_id").as("_fed_id"))
    val changedOutsideFeed = fin.alias("f")
      .join(v1.alias("b"), col("f.doc_id") === col("b.doc_id"))
      .join(fedIds, col("f.doc_id") === col("_fed_id"), "left_anti")
      .filter(fin.columns.filter(_ != "doc_id")
        .map(c => !(col(s"f.$c") <=> col(s"b.$c"))).reduce(_ || _))
      .count()
    assert(changedOutsideFeed == 0L,
      s"$changedOutsideFeed rows changed without a feed record")
  }

  test("group maintenance is incremental: equal to the full survivor " +
      "groupBy, with the only corpus aggregate above the affected join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val top = spark.read.parquet(s"$dir/documents.parquet")
      .agg(max(col("doc_id")) + 1).head().getLong(0)
    val hash = spark.read.parquet(
      graft.operators.MultimodalQueries.phashHashTablePath(spark, dir))
    val oldGrp = graft.operators.CurationState.fam(spark,
      CurationMm.fullStateRoot(spark, dir), "imggrp")
    val pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => c % 23 === 4
    val inc = CurationMm.incrementalSurvivorGroups(hash, "img_id", 2,
      top, pred, oldGrp)
    val full = hash
      .filter(!pred(expr("img_id div 2")) && col("img_id") < 2 * top)
      .groupBy("phash")
      .agg(count(lit(1)).as("n_copies"), min(col("img_id")).as("canon"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental group maintenance diverges from the full re-derivation")
    // plan shape: two aggregates — the affected-phash distinct (over the
    // REMOVED members only: its subtree filters on the retraction
    // residue) and the re-aggregation, which sits ABOVE the affected
    // join; no aggregate consumes the unfiltered survivor relation
    val aggs = inc.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a }
    val (joined, removedOnly) =
      aggs.partition(a => a.child.collect { case j: Join => j }.nonEmpty)
    assert(joined.size == 1,
      s"exactly one aggregate must sit above the affected-phash join, " +
        s"got ${joined.size}")
    assert(removedOnly.nonEmpty && removedOnly.forall(
      _.toString.contains("% 23")),
      "every join-free aggregate must range over the removed members " +
        "only — a full-survivor groupBy leaked back in")
  }

  test("retracting a text cluster's minimum re-elects the survivor") {
    // discover a 2+-doc text cluster from the persisted cluster table,
    // retract its MINIMUM (the canonical doc), and watch the next
    // member become canonical — the hard case: the canon itself left
    val cl = spark.read.parquet(GraphCC.clusterTablePath(spark, dir))
    // survivor = the SECOND-smallest member: after the min is retracted
    // it is the new canonical whichever way the cluster splits
    val target = cl.filter(col("n_docs") >= 2)
      .groupBy(col("cluster_id")).agg(min(col("doc_id")).as("lo"),
        min(when(col("doc_id") =!= col("cluster_id"), col("doc_id")))
          .as("second"))
      .orderBy(col("cluster_id"))
      .head()
    val minDoc = target.getAs[Long]("lo")
    val survivor = target.getAs[Long]("second")
    assert(minDoc == target.getAs[Long]("cluster_id"),
      "cluster_id must be the cluster's min doc (canonical election rule)")

    val root = ScratchDirs.fresh("mmretract_targeted")
    CurationMm.retractAt(spark, dir, root, c => c === lit(minDoc))
    val before = ManagedTable.readVersion(spark, root, 1)
      .filter(col("doc_id") === survivor).head()
    val after = ManagedTable.read(spark, root)
      .filter(col("doc_id") === survivor).head()
    def reasons(r: org.apache.spark.sql.Row): Set[String] =
      r.getAs[String]("drop_reasons").split(",").filter(_.nonEmpty).toSet
    assert(reasons(before).contains("text_dup"),
      s"doc $survivor should start as a non-canonical text dup")
    assert(!reasons(after).contains("text_dup"),
      s"doc $survivor must be re-elected canonical once doc $minDoc " +
        "is retracted")
    // and the retraction feed carries exactly one delete: the old canon
    val dels = ManagedTable.changes(spark, root, 2)
      .filter(col("_action") === "delete")
    assert(dels.count() == 1 &&
      dels.head().getAs[Long]("doc_id") == minDoc)
  }
}
