package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Catalyst's runtime bloom-filter join reduction — the shuffle-volume
  * lever for big ⋈ big joins at 100 TB. When the build side of a shuffle
  * join carries a selective filter, the optimizer plants a
  * `might_contain(bloom_filter_agg(...))` probe on the stream side's scan, so rows
  * that cannot find a partner are dropped BEFORE the exchange instead of
  * after it — at scale that converts a full-fact-table shuffle into a
  * delta-sized one without any manual semi-join plumbing. The default
  * thresholds (10 MB creation side / 10 GB probe-side scan) only arm on a
  * real cluster; this spec lowers them to prove the plan shape and that
  * the filter is purely an optimization (bit-identical results).
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val confs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // Arm at gate scale: any probe-side scan qualifies.
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
    // Force a shuffle join — a broadcast join gets its pushdown for free.
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](body: => A): A = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective build side plants a bloom probe before the fact shuffle") {
    val dir = "/root/testdata/sf0.001"
    val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("k"), col("l_quantity").as("qty"))
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"))
      .filter(col("st") === lit("P")) // selective: ~4% of orders
    def joined = fact.join(dim, "k")
    val (planWith, nWith) = withConfs {
      (joined.queryExecution.optimizedPlan.toString, joined.count())
    }
    assert(planWith.contains("might_contain") &&
      planWith.contains("bloom_filter_agg"),
      s"no runtime bloom filter in:\n$planWith")
    val nWithout = joined.count() // session defaults: threshold unarmed
    assert(nWith == nWithout && nWith > 0)
  }
}
