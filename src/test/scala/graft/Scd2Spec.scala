package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd2

class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap(rows: (Int, String)*): DataFrame =
    rows.toDF("k", "attr")

  private def dimRows(df: DataFrame): Set[(Int, String, String, String, Boolean)] =
    df.select(col("k"), col("attr"), col(Scd2.FromCol), col(Scd2.ToCol),
      col(Scd2.CurCol)).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3), r.getBoolean(4))).toSet

  test("close/open/carry/insert across three snapshots") {
    val d1 = Scd2.initialize(snap(1 -> "a", 2 -> "b"), lit("2020-01-01"))
    val d2 = Scd2.merge(d1, snap(1 -> "a", 2 -> "B", 3 -> "c"),
      Seq("k"), Seq("attr"), lit("2021-01-01"))
    assert(dimRows(d2) == Set(
      (1, "a", "2020-01-01", null, true),          // unchanged: carried
      (2, "b", "2020-01-01", "2021-01-01", false), // closed
      (2, "B", "2021-01-01", null, true),          // new version
      (3, "c", "2021-01-01", null, true)))         // first version
    // Third snapshot: k=2 changes again (history accumulates), k=3
    // missing from the snapshot (stays open), k=1 unchanged.
    val d3 = Scd2.merge(d2, snap(1 -> "a", 2 -> "Z"),
      Seq("k"), Seq("attr"), lit("2022-01-01"))
    assert(dimRows(d3) == Set(
      (1, "a", "2020-01-01", null, true),
      (2, "b", "2020-01-01", "2021-01-01", false),
      (2, "B", "2021-01-01", "2022-01-01", false),
      (2, "Z", "2022-01-01", null, true),
      (3, "c", "2021-01-01", null, true)))
  }

  test("null transitions are versioned null-safely") {
    val withNulls = Seq((1, null: String), (2, "x"))
      .toDF("k", "attr")
    val d1 = Scd2.initialize(withNulls, lit("2020-01-01"))
    // null→null: no new version; "x"→null: versioned.
    val d2 = Scd2.merge(d1,
      Seq((1, null: String), (2, null: String)).toDF("k", "attr"),
      Seq("k"), Seq("attr"), lit("2021-01-01"))
    assert(dimRows(d2) == Set(
      (1, null, "2020-01-01", null, true),
      (2, "x", "2020-01-01", "2021-01-01", false),
      (2, null, "2021-01-01", null, true)))
  }

  test("asOf resolves the version live at a date") {
    val d1 = Scd2.initialize(snap(1 -> "a"), lit("2020-01-01"))
    val d2 = Scd2.merge(d1, snap(1 -> "b"), Seq("k"), Seq("attr"),
      lit("2021-01-01"))
    def at(d: String) = Scd2.asOf(d2, lit(d)).select("attr")
      .as[String].collect().toSeq
    assert(at("2020-06-15") == Seq("a"))
    assert(at("2021-01-01") == Seq("b")) // effective day belongs to the new version
    assert(at("2019-12-31").isEmpty)     // before first version
  }

  test("duplicate snapshot keys are rejected") {
    val d1 = Scd2.initialize(snap(1 -> "a"), lit("2020-01-01"))
    val merged = Scd2.merge(d1, snap(1 -> "b", 1 -> "c"),
      Seq("k"), Seq("attr"), lit("2021-01-01"))
    val ex = intercept[Exception] { merged.collect() }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(chain.contains("duplicate"))
  }
}
