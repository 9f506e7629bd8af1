package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{BucketedTable, Constraints, ManagedTable}

class ConstraintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(rows: Seq[(Long, String, Double)]): String = {
    val root = Files.createTempDirectory("graft_chk").toString
    ManagedTable.overwrite(root, rows.toDF("k", "st", "total"))
    root
  }

  test("addConstraint validates existing rows and persists") {
    val root = freshTable(Seq((1L, "O", 10.0), (2L, "F", 20.0)))
    ManagedTable.addConstraint(spark, root, "total_nonneg", "total >= 0")
    assert(ManagedTable.constraintsOf(root).map(_.name) == Seq("total_nonneg"))
    // existing violation → rejected, constraint set unchanged
    intercept[IllegalArgumentException] {
      ManagedTable.addConstraint(spark, root, "impossible", "total > 15")
    }
    // duplicate name → rejected
    intercept[IllegalArgumentException] {
      ManagedTable.addConstraint(spark, root, "total_nonneg", "total >= 0")
    }
    assert(ManagedTable.constraintsOf(root).map(_.name) == Seq("total_nonneg"))
  }

  test("enforced write aborts on a violating row; pointer never swaps") {
    val root = freshTable(Seq((1L, "O", 10.0)))
    ManagedTable.addConstraint(spark, root, "total_nonneg", "total >= 0")
    val before = ManagedTable.currentVersion(root)
    intercept[Exception] {
      ManagedTable.merge(spark, root,
        Seq((2L, "O", -5.0)).toDF("k", "st", "total"), Seq("k"))
    }
    // the failed publish must not move the live pointer
    assert(ManagedTable.currentVersion(root) == before)
    assert(ManagedTable.read(spark, root).count() == 1)
    // a clean merge then passes through the same enforced path
    ManagedTable.merge(spark, root,
      Seq((2L, "O", 5.0)).toDF("k", "st", "total"), Seq("k"))
    assert(ManagedTable.read(spark, root).count() == 2)
  }

  test("SQL CHECK semantics: null-evaluating rows pass") {
    val chk = Constraints.Check("pos", "total > 0")
    val df = Seq((1L, Option(5.0)), (2L, Option.empty[Double]),
      (3L, Option(-1.0))).toDF("k", "total")
    // null total → check unknown → passes (ANSI CHECK / Delta)
    val (good, bad) = Constraints.split(df, Seq(chk))
    assert(good.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(bad.select("k").as[Long].collect().toSeq == Seq(3L))
    // enforce: the null row must NOT raise
    assert(Constraints.enforce(df.filter(col("k") =!= 3), Seq(chk))
      .count() == 2)
  }

  test("bucketed table enforces constraints on the delta-merge path") {
    val root = Files.createTempDirectory("graft_chk_bkt").toString + "/t"
    val base = (1 to 100).map(i => (i.toLong, "O", i * 1.0))
      .toDF("k", "st", "total")
    BucketedTable.create(root, base, Seq("k"), nBuckets = 4)
    BucketedTable.addConstraint(spark, root, "total_nonneg", "total >= 0")
    // violating delta aborts before the pointer swaps
    intercept[Exception] {
      BucketedTable.merge(spark, root,
        Seq((5L, "O", -1.0)).toDF("k", "st", "total"))
    }
    assert(ManagedTable // pointer check via the shared _latest protocol
      .currentVersion(root) == 0)
    assert(BucketedTable.read(spark, root).count() == 100)
    // clean delta passes through the same enforced path
    BucketedTable.merge(spark, root,
      Seq((5L, "O", 5.0), (200L, "O", 1.0)).toDF("k", "st", "total"))
    assert(BucketedTable.read(spark, root).count() == 101)
    // a pre-loaded constraint also guards CREATE
    val root2 = Files.createTempDirectory("graft_chk_bkt2").toString + "/t"
    Constraints.store(root2, Seq(Constraints.Check("pos", "total >= 0")))
    intercept[Exception] {
      BucketedTable.create(root2,
        Seq((1L, "O", -1.0)).toDF("k", "st", "total"), Seq("k"), 4)
    }
  }

  test("split partitions on ANY violated check; dropConstraint removes") {
    val checks = Seq(Constraints.Check("nonneg", "total >= 0"),
      Constraints.Check("status", "st IN ('F','O','P')"))
    val df = Seq((1L, "O", 1.0), (2L, "X", 1.0), (3L, "O", -1.0),
      (4L, "X", -1.0)).toDF("k", "st", "total")
    val (good, bad) = Constraints.split(df, checks)
    assert(good.select("k").as[Long].collect().toSeq == Seq(1L))
    assert(bad.select("k").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))

    val root = freshTable(Seq((1L, "O", 10.0)))
    ManagedTable.addConstraint(spark, root, "nonneg", "total >= 0")
    ManagedTable.dropConstraint(root, "nonneg")
    assert(ManagedTable.constraintsOf(root).isEmpty)
    // with the constraint dropped, the violating merge goes through
    ManagedTable.merge(spark, root,
      Seq((2L, "O", -5.0)).toDF("k", "st", "total"), Seq("k"))
    assert(ManagedTable.read(spark, root).count() == 2)
    intercept[IllegalArgumentException] {
      ManagedTable.dropConstraint(root, "nonneg")
    }
  }
}
