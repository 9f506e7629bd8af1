package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (they run sequentially in the
  * forked test JVM; per-suite sessions would pay ~5s startup each). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    graft.operators.SkewCap.registerWarnings(s)
    s
  }
}
