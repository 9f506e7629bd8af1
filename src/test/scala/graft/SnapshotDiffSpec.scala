package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SnapshotDiff
import graft.sources.{BucketedTable, ManagedTable}

class SnapshotDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diffFrames tags insert/update/delete, drops identical rows") {
    val before = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "v", "n")
    val after = Seq((2L, "b", 20), (3L, "C2", 30), (4L, "d", 40))
      .toDF("k", "v", "n")
    val got = SnapshotDiff.diffFrames(before, after, Seq("k"))
      .as[(Long, String, Int, String)].collect().sortBy(_._1)
    // k=1 only-before → delete pre-image; k=2 identical → dropped;
    // k=3 changed → update post-image; k=4 only-after → insert.
    assert(got.toSeq == Seq(
      (1L, "a", 10, "delete"),
      (3L, "C2", 30, "update"),
      (4L, "d", 40, "insert")))
  }

  test("diffFrames compares null-safely: null→value and value→null update") {
    val before = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option("c"))).toDF("k", "v")
    val after = Seq((1L, Option.empty[String]), (2L, Option("b")),
      (3L, Option("c"))).toDF("k", "v")
    val got = SnapshotDiff.diffFrames(before, after, Seq("k"))
      .select("k", "_action").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "update"), (2L, "update")))
  }

  test("diffFrames rejects mismatched schemas and unknown keys") {
    val a = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SnapshotDiff.diffFrames(a, Seq((1L, 2)).toDF("k", "n"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      SnapshotDiff.diffFrames(a, a, Seq("missing"))
    }
  }

  test("ManagedTable.diff reconstructs changes across a version range") {
    val root = Files.createTempDirectory("graft_mt_diff").toString
    val base = (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("k", "x")
    ManagedTable.overwrite(root, base)                                 // v0
    ManagedTable.update(spark, root, Map("x" -> (col("x") + 0.5)),
      where = col("k") <= 10)                                          // v1
    ManagedTable.delete(spark, root, col("k") > 90)                    // v2
    val got = ManagedTable.diff(spark, root, 0, 2, Seq("k"))
      .as[(Long, Double, String)].collect().sortBy(_._1)
    val want =
      (1 to 10).map(i => (i.toLong, i + 0.5, "update")) ++
        (91 to 100).map(i => (i.toLong, i * 1.0, "delete"))
    assert(got.toSeq == want)
  }

  test("BucketedTable.diff opens only buckets whose manifest ref changed") {
    val root = Files.createTempDirectory("graft_bt_diff").toString
    val base = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    BucketedTable.create(root, base, Seq("k"), nBuckets = 16)
    BucketedTable.merge(spark, root,
      Seq((5L, "UPDATED"), (2000L, "NEW")).toDF("k", "v"))             // v1
    val d = BucketedTable.diff(spark, root, 0, 1)
    val got = d.as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((5L, "UPDATED", "update"),
      (2000L, "NEW", "insert")))
    // manifest pruning: the scan must touch at most the ≤2 changed
    // buckets on each side — not all 16
    val touched = d.inputFiles.map(_.replaceFirst("/[^/]*$", "")).distinct
    assert(touched.length <= 4, s"diff read ${touched.length} bucket dirs")
    // diff of identical versions is empty without reading anything
    assert(BucketedTable.diff(spark, root, 1, 1).count() == 0)
  }
}
