package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.types.{LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the production-keying claim of the gram-keyed passes: with
  * `hashKeys = true` the gram STRING never reaches an exchange — every
  * shuffle leg carries the 8-byte xxhash64 key instead — and the results
  * are bit-identical to the string-keyed plan (collision-free corpus).
  * The value equality is ALSO oracle-gated (q_dedup_substring_hashed /
  * q_txt_lm_familiarity_hashed replay the string-keyed SQL); this spec
  * adds the plan property the oracle can't see. */
class HashedKeysSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def gramExchangeTypes(df: DataFrame): Seq[Set[Any]] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
      .collect { case e: ShuffleExchangeExec => e }
      .map(_.output.filter(_.name == "gram").map(_.dataType).toSet[Any])
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("substring spans: hashed twin shuffles 8-byte keys, same spans") {
    val str = operators.TextQueries.dedupSubstringSpans(spark, dir)
    val hashed = operators.TextQueries
      .dedupSubstringSpans(spark, dir, hashKeys = true)
    // string plan: at least one exchange carries the gram string (the
    // sanity leg — proves the probe can see what the twin must remove)
    assert(gramExchangeTypes(str).exists(_.contains(StringType)))
    val hashedGrams = gramExchangeTypes(hashed)
    assert(!hashedGrams.exists(_.contains(StringType)),
      "hashed twin still shuffles the gram string")
    assert(hashedGrams.exists(_.contains(LongType)),
      "hashed twin lost its xxhash64 shuffle key")
    assert(rows(str) == rows(hashed))
  }

  test("lm familiarity: hashed twin shuffles 8-byte keys, same scores") {
    val str = operators.TextQueries.txtLmFamiliarity(spark, dir)
    val hashed = operators.TextQueries
      .txtLmFamiliarity(spark, dir, hashKeys = true)
    assert(gramExchangeTypes(str).exists(_.contains(StringType)))
    val hashedGrams = gramExchangeTypes(hashed)
    assert(!hashedGrams.exists(_.contains(StringType)),
      "hashed twin still shuffles the gram string")
    assert(hashedGrams.exists(_.contains(LongType)),
      "hashed twin lost its xxhash64 shuffle key")
    assert(rows(str) == rows(hashed))
  }
}
