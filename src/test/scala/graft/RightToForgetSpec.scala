package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CurationMm
import graft.sources.{ManagedTable, ScratchDirs}
import scala.jdk.CollectionConverters._

/** PHYSICAL right-to-forget: the retraction merge removes rows from the
  * LIVE version, but the bytes survive in (a) pre-retraction snapshots —
  * time travel reads them — and (b) the retraction feed's delete
  * PRE-IMAGES (the audit rows the CDF gate consumes). A takedown is not
  * complete until both are handled: VACUUM drops (a) (the merge
  * publishes full snapshots, so the live version never references the
  * vacuumed base), and [[ManagedTable.redactChangeFeed]] reduces (b) to
  * key + action tombstones — downstream replicas still learn WHICH keys
  * left at WHICH version (the replication contract) without the data.
  *
  * The spec drives the full sequence on its own retraction run and then
  * proves ABSENCE mechanically: every parquet file under the table root
  * is scanned for a retracted doc's payload.
  */
class RightToForgetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("vacuum + feed redaction leave no retracted payload anywhere " +
      "under the table root") {
    val root = ScratchDirs.fresh("mmforget_run")
    CurationMm.retractAt(spark, dir, root) // v1 = full manifest, v2 = merge
    val retractedIds = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 23 === 4).select("doc_id")
    val probe = retractedIds.orderBy("doc_id").head().getLong(0)

    // pre-forget: the bytes are reachable in BOTH places
    assert(ManagedTable.readVersion(spark, root, 1)
      .filter(col("doc_id") === probe).count() == 1,
      "time travel must reach the pre-retraction row before vacuum")
    val pre = ManagedTable.changes(spark, root, 2)
      .filter(col("_action") === "delete" && col("doc_id") === probe).head()
    assert(pre.getAs[String]("split") != null,
      "delete pre-image should carry payload before redaction")

    ManagedTable.vacuum(root, keep = 1)
    ManagedTable.redactChangeFeed(spark, root, 2, Seq("doc_id"),
      col("_action") === "delete")

    // the pre-retraction snapshot is physically gone
    intercept[Exception] {
      ManagedTable.readVersion(spark, root, 1).count()
    }
    // the feed still names every departed key, exactly once each...
    val feed = ManagedTable.changes(spark, root, 2)
    val dels = feed.filter(col("_action") === "delete")
    assert(dels.count() == retractedIds.count() &&
      dels.join(retractedIds, "doc_id").count() == dels.count(),
      "tombstones must name exactly the retracted keys")
    // ...but carries no payload for them
    assert(dels.filter(col("drop_reasons").isNotNull ||
      col("split").isNotNull || col("kept").isNotNull).count() == 0,
      "redacted delete rows must be key+action tombstones")
    // survivors' update post-images pass through untouched
    assert(feed.filter(col("_action") === "update" &&
      col("drop_reasons").isNull).count() == 0,
      "redaction must not touch update rows")

    // the PHYSICAL proof: scan every parquet file under the root — the
    // probe doc appears nowhere with payload (only as a null tombstone)
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    val files =
      try walk.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toVector
      finally walk.close()
    assert(files.nonEmpty)
    val leaked = files.flatMap { f =>
      val df = spark.read.parquet(f)
      if (!df.columns.contains("doc_id")) Nil
      else df.filter(col("doc_id") === probe)
        .collect().toSeq
        .filter(r => r.getAs[String]("drop_reasons") != null ||
          r.getAs[String]("split") != null)
        .map(r => (f, r))
    }
    assert(leaked.isEmpty,
      s"retracted payload survives forget: ${leaked.take(3).mkString("; ")}")
  }
}
