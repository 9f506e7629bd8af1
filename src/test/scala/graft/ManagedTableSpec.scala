package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ManagedTable

class ManagedTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("create/read/merge/vacuum versioned lifecycle") {
    val root = Files.createTempDirectory("graft_tbl").toString
    val init = Seq((1, "a"), (2, "b")).toDF("k", "v")
    ManagedTable.overwrite(root, init)
    assert(ManagedTable.exists(root))
    assert(ManagedTable.currentVersion(root) == 0)
    assert(ManagedTable.read(spark, root).count() == 2)

    ManagedTable.merge(spark, root, Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"))
    assert(ManagedTable.currentVersion(root) == 1)
    val rows = ManagedTable.read(spark, root).as[(Int, String)].collect().sorted
    assert(rows.toSeq == Seq((1, "a"), (2, "B"), (3, "c")))
    // old snapshot still readable until vacuum
    assert(Files.exists(Paths.get(root, "v0")))
    ManagedTable.vacuum(root, keep = 1)
    assert(!Files.exists(Paths.get(root, "v0")))
    assert(Files.exists(Paths.get(root, "v1")))
    assert(ManagedTable.read(spark, root).count() == 3)
  }

  test("createEmpty publishes schema-only snapshot (limit 0)") {
    val root = Files.createTempDirectory("graft_tbl_e").toString
    ManagedTable.createEmpty(spark, root, Seq((1, "a")).toDF("k", "v"))
    val df = ManagedTable.read(spark, root)
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("k", "v"))
  }
}
