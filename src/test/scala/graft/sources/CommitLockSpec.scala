package graft.sources

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multi-writer contracts that must hold across EVERY publish path, not
  * just commit/commitMerge: metadata-only RENAME COLUMN and the WAP
  * publish step also move the tip, so they must serialize through the
  * same per-root commit lock (a rename racing a commit could otherwise
  * hard-link stale files into a version the commit just published), and
  * commit userMetadata must be scoped to the publishing thread (a
  * process-global would stamp writer B's commit with writer A's
  * provenance).
  *
  * The lock tests hold the package-private per-root monitor — the
  * same-JVM half of withCommitLock — and assert the publish blocks until
  * release; this is deterministic, no sleep-and-hope racing.
  */
class CommitLockSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def monitorOf(root: String): Object =
    VersionedLayout.commitMonitors.computeIfAbsent(
      Paths.get(root).toAbsolutePath.normalize.toString, _ => new Object)

  /** Run `publish` on another thread while the commit monitor is held;
    * assert it publishes nothing until the monitor releases, then
    * everything after. Returns the publishing thread's failure, if any. */
  private def assertSerializes(root: String)(publish: => Unit): Unit = {
    val entered = new CountDownLatch(1)
    var failure: Option[Throwable] = None
    val before = ManagedTable.currentVersion(root)
    val t = new Thread(() => {
      entered.countDown()
      try publish catch { case e: Throwable => failure = Some(e) }
    })
    monitorOf(root).synchronized {
      t.start()
      entered.await()
      Thread.sleep(300) // give the publisher time to reach the lock
      assert(ManagedTable.currentVersion(root) == before,
        "publish advanced the tip while another writer held the commit lock")
    }
    t.join(30000)
    assert(!t.isAlive, "publisher deadlocked on the commit lock")
    failure.foreach(throw _)
  }

  test("renameColumn waits for the commit lock before publishing") {
    val root = Files.createTempDirectory("graft_lock_rn").toString
    ManagedTable.overwrite(root, Seq((1L, "x"), (2L, "y")).toDF("k", "v"))
    assertSerializes(root) {
      ManagedTable.renameColumn(spark, root, "v", "v2")
    }
    assert(ManagedTable.currentVersion(root) == 1)
    val out = ManagedTable.read(spark, root)
    assert(out.columns.toSeq == Seq("k", "v2"))
    assert(out.count() == 2)
  }

  test("writeAuditPublish waits for the commit lock before publishing") {
    val root = Files.createTempDirectory("graft_lock_wap").toString
    ManagedTable.overwrite(root, Seq((1L, 10.0)).toDF("k", "score"))
    assertSerializes(root) {
      ManagedTable.writeAuditPublish(spark, root,
        Seq((1L, 10.0), (2L, 20.0)).toDF("k", "score"),
        Seq(graft.operators.DataQuality.Rule("score_pos",
          graft.operators.DataQuality.countWhere(col("score") <= 0))))
    }
    assert(ManagedTable.currentVersion(root) == 1)
    assert(ManagedTable.read(spark, root).count() == 2)
  }

  test("userMetadata is per-thread: a concurrent writer is never stamped " +
      "with another thread's provenance") {
    val rootA = Files.createTempDirectory("graft_meta_a").toString
    val rootB = Files.createTempDirectory("graft_meta_b").toString
    var bFailure: Option[Throwable] = None
    VersionedLayout.withUserMetadata("job=A run=1") {
      val t = new Thread(() => {
        try ManagedTable.overwrite(rootB, Seq((1, "b")).toDF("k", "v"))
        catch { case e: Throwable => bFailure = Some(e) }
      })
      t.start(); t.join(30000)
      ManagedTable.overwrite(rootA, Seq((1, "a")).toDF("k", "v"))
    }
    bFailure.foreach(throw _)
    val hA = ManagedTable.commitHistoryWithMetadata(rootA)
    val hB = ManagedTable.commitHistoryWithMetadata(rootB)
    assert(hA.head._3.contains("job=A run=1"))
    assert(hB.head._3.isEmpty,
      "thread B's commit inside thread A's scope must not carry A's metadata")
  }

  test("nested withUserMetadata scopes restore the outer value") {
    val root = Files.createTempDirectory("graft_meta_nest").toString
    VersionedLayout.withUserMetadata("outer") {
      VersionedLayout.withUserMetadata("inner") {
        ManagedTable.overwrite(root, Seq((1, "a")).toDF("k", "v")) // v0
      }
      ManagedTable.overwrite(root, Seq((1, "b")).toDF("k", "v"))   // v1
    }
    ManagedTable.overwrite(root, Seq((1, "c")).toDF("k", "v"))     // v2
    val h = ManagedTable.commitHistoryWithMetadata(root)
    assert(h.map(_._3) == Seq(Some("inner"), Some("outer"), None))
  }
}
