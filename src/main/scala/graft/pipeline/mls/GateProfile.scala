package graft.pipeline.mls

import org.apache.spark.sql.SparkSession

/** Ad-hoc wall-clock probe for the three e2e gate queries, bench-shaped
  * session (local[32], AQE on, 32 shuffle partitions). Used to measure the
  * checkpoint/repartition strategies documented in [[MlsJob2Gate.job2E2e]]:
  * the gates are planning- and stage-overhead-bound, not data-bound, so
  * every eager materialization and under-parallelized stage shows up
  * directly in the bench total. */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val gates: Seq[(String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] =
      Seq("q_job1_e2e" -> (MlsJob1Gate.job1E2e _),
        "q_job2_e2e" -> (MlsJob2Gate.job2E2e _),
        "q_job3_e2e" -> (MlsJob3Gate.job3E2e _))
    gates.foreach { case (_, q) => q(spark, sfDir).count() } // warmup
    gates.foreach { case (n, q) =>
      t(s"$n (1)")(q(spark, sfDir).count())
      t(s"$n (2)")(q(spark, sfDir).count())
    }
    spark.stop()
  }
}
