package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Merge, Salting}
import graft.pipeline.{LatestWins, Validation}

/** Property-based invariants (SURVEY §5's stated test strategy):
  * validate∘split partitions the input; latest-wins dedup is idempotent;
  * merge replay is idempotent; salted aggregation/top-k equal their plain
  * forms for any salt/k. Inputs come from seeded ScalaCheck generators
  * (the scalatest-scalacheck bridge isn't in the offline cache, so cases
  * are drawn explicitly — same coverage, deterministic replay). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowGen: Gen[List[(Int, String, Int)]] = Gen.listOf(for {
    k <- Gen.chooseNum(1, 8)
    v <- Gen.chooseNum(-100, 100)
    d <- Gen.chooseNum(1, 28)
  } yield (k, f"2024-01-$d%02d", v))

  private def cases[A](g: Gen[A], n: Int = 6): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(5 + i * 10), Seed(42L + i)))

  test("validation split partitions any input (good ∪ rejected == input)") {
    for (rows <- cases(rowGen)) {
      val df = rows.toDF("k", "dt", "v")
      val split = Validation.validate(df, Seq(
        Validation.Rule("neg", "neg", col("v") < 0),
        Validation.Rule("big", "big", col("v") > 50)))
      assert(split.good.count() + split.rejected.count() == rows.length.toLong)
      val reunion = split.good.select("k", "dt", "v")
        .unionAll(split.rejected.select("k", "dt", "v"))
      assert(reunion.except(df).count() == 0 && df.except(reunion).count() == 0)
    }
  }

  test("latest-wins dedup is idempotent") {
    for (rows <- cases(rowGen) if rows.nonEmpty) {
      val df = rows.toDF("k", "dt", "v")
      val ordering = Seq(col("dt").desc, col("v").desc)
      val once = LatestWins.dedupeAll(df, df.limit(0), Seq("k"), ordering)
      val twice = LatestWins.dedupeAll(once, once.limit(0), Seq("k"), ordering)
      assert(once.collect().toSet == twice.collect().toSet)
      assert(once.select("k").distinct().count() == once.count())
    }
  }

  test("merge replay is idempotent for any target/source pair") {
    for ((t, s) <- cases(rowGen).zip(cases(Gen.resize(10, rowGen)))) {
      val target = t.toDF("k", "dt", "v").dropDuplicates("k")
      val source = s.toDF("k", "dt", "v").dropDuplicates("k")
      val once = Merge.mergeFrames(target, source, Seq("k"))
      val twice = Merge.mergeFrames(once, source, Seq("k"))
      assert(once.collect().toSet == twice.collect().toSet)
    }
  }

  test("salted aggregation equals plain aggregation for any salt") {
    for ((rows, i) <- cases(rowGen).zipWithIndex if rows.nonEmpty) {
      val salt = 1 + (i % 7)
      val df = rows.toDF("k", "dt", "v")
      val plain = df.groupBy("k")
        .agg(sum(col("v").cast("long")).as("s"), count(lit(1)).as("n"))
      val salted = Salting.saltedAgg(df, Seq("k"), salt)(
        partials = Seq(sum(col("v").cast("long")).as("ps"),
          count(lit(1)).as("pn")),
        combine = Seq(sum(col("ps")).as("s"), sum(col("pn")).as("n")))
      assert(salted.collect().toSet == plain.collect().toSet)
    }
  }

  test("salted top-k equals windowed top-k for any k") {
    for ((rows, i) <- cases(rowGen).zipWithIndex if rows.nonEmpty) {
      val k = 1 + (i % 4)
      val df = rows.toDF("k", "dt", "v")
      val ordering = Seq(col("dt").desc, col("v").desc)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(ordering: _*)
      val plain = df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= k).drop("_rn")
      val fast = Salting.topKPerKey(df, Seq("k"), ordering, k)
      assert(fast.collect().toSet == plain.collect().toSet)
    }
  }
}
