package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ListingRules._

class ListingRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sanitizedDate nulls pre-1900 years, keeps valid dates") {
    val out = Seq("1899-12-31", "1985-06-01", "garbage").toDF("d")
      .select(sanitizedDate(col("d")).as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDate(0) == Date.valueOf("1985-06-01"))
    assert(out(2).isNullAt(0)) // uncastable → null
  }

  test("closedDateGuard rejects dates beyond asOf+180 (injectable clock)") {
    val asOf = lit("2024-01-01").cast("date")
    val out = Seq("2024-06-28", "2024-07-01").toDF("d")
      .select(closedDateGuard(col("d"), asOf).as("d")).collect()
    assert(out(0).getDate(0) == Date.valueOf("2024-06-28")) // day 179
    assert(out(1).isNullAt(0))                              // day 182
  }

  test("lot size acre<->sqft reconciliation with decimal(16,4) semantics") {
    val df = Seq((Some(2.5), None: Option[Double]), (None, Some(21780.0)),
      (Some(1.0), Some(99999.0))).toDF("acres", "sqft")
    val out = df.select(
      lotSizeAcres(col("acres"), col("sqft")).as("a"),
      lotSizeSqft(col("acres"), col("sqft")).as("s")).collect()
    assert(out(0).getDecimal(0).doubleValue() == 2.5)
    assert(out(0).getDecimal(1).doubleValue() == 108900.0) // 2.5 * 43560
    assert(out(1).getDecimal(0).doubleValue() == 0.5)      // 21780 / 43560
    assert(out(1).getDecimal(1).doubleValue() == 21780.0)
    // both present: originals win, no recomputation
    assert(out(2).getDecimal(0).doubleValue() == 1.0)
    assert(out(2).getDecimal(1).doubleValue() == 99999.0)
  }

  test("decodeByContains: first matching bucket wins, case-insensitive") {
    val out = Seq("city water", "drilled WELL", "hauled in", "unknown src")
      .toDF("w").select(decodeByContains(col("w"), waterSourceDecode).as("d"))
      .collect()
    assert(out.map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("Public"), Some("Well"), Some("Cistern"), None))
  }

  test("address rules: unit extraction, squeeze, APN cleanup") {
    val out = Seq(("12 Main  St   # 4B", "12-34-56.78")).toDF("addr", "apn")
      .select(unitFromAddress(col("addr")).as("unit"),
        normalizedAddress(col("addr")).as("addr"),
        cleanedApn(col("apn")).as("apn")).collect().head
    assert(out.getString(0) == "4B")
    assert(out.getString(1) == "12 Main St # 4B")
    assert(out.getString(2) == "12345678")
  }

  test("pricePerSqft guards zero area; sanitizedYear bounds to short") {
    val out = Seq((250000.0, 2000.0, 1985), (100.0, 0.0, 1492))
      .toDF("p", "s", "y")
      .select(pricePerSqft(col("p"), col("s")).as("pps"),
        sanitizedYear(col("y"), lit(2024)).as("yb")).collect()
    assert(out(0).getDecimal(0).doubleValue() == 125.0)
    assert(out(0).getShort(1) == 1985)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }

  test("stateAbbrevCandidate accepts only two-letter forms") {
    val out = Seq(" tx ", "Texas").toDF("s")
      .select(stateAbbrevCandidate(col("s")).as("a")).collect()
    assert(out(0).getString(0) == "TX")
    assert(out(1).isNullAt(0))
  }
}
