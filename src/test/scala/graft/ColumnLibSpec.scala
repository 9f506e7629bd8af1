package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ColumnLib._

class ColumnLibSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("checkValidValue: three-valued logic collapses to boolean, never null") {
    val df = Seq(Some("A"), Some("X"), None).toDF("v")
      .select(checkValidValue(col("v"), Seq("A", "B"), nullAllowed = true).as("ok"))
    assert(df.collect().map(_.getBoolean(0)).toSeq == Seq(true, false, true))
    val strict = Seq(Option.empty[String]).toDF("v")
      .select(checkValidValue(col("v"), Seq("A"), nullAllowed = false).as("ok"))
    assert(strict.collect().head.getBoolean(0) == false)
  }

  test("regexpLike is a full match, not contains") {
    val df = Seq("Brand#13", "xBrand#13y").toDF("v")
      .select(regexpLike(col("v"), "Brand#[0-9]{2}").as("m"))
    assert(df.collect().map(_.getBoolean(0)).toSeq == Seq(true, false))
  }

  test("cleanPhoneNumber strips punctuation, keeps only 10-digit results") {
    val df = Seq("(555) 123-4567", "123", "55-51-23-45-67").toDF("v")
      .select(cleanPhoneNumber(col("v")).as("p"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("5551234567"), None, Some("5551234567")))
  }

  test("changeBlankToNull and squeezeSpaces") {
    val df = Seq("  ", "a  b   c").toDF("v")
      .select(changeBlankToNull(col("v")).as("n"), squeezeSpaces(col("v")).as("s"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getString(1) == "a b c")
  }

  test("prefix/strip/underscore projection machinery") {
    val df = Seq((1, "x")).toDF("a", "b")
    val pre = prefixColumns(df, "t_")
    assert(pre.columns.toSeq == Seq("t_a", "t_b"))
    assert(stripPrefix(pre, "t_").columns.toSeq == Seq("a", "b"))
    val replaced = applyUnderscoreReplacements(
      df.withColumn("_a", lit(99)).withColumn("_tmp_junk", lit(0)))
    assert(replaced.columns.toSeq == Seq("a", "b"))
    assert(replaced.collect().head.getInt(0) == 99)
  }

  test("sumColumns is horizontal row-wise addition") {
    val df = Seq((1, 2, 3)).toDF("x", "y", "z")
      .select(sumColumns(Seq(col("x"), col("y"), col("z"))).as("s"))
    assert(df.collect().head.getInt(0) == 6)
  }
}
