package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing probe for the sketch queries. */
object Probe {
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

    val shingleExpr =
      "array_distinct(transform(sequence(0, size(toks)-3), " +
        "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
    def base = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", expr(shingleExpr))

    // warm
    base.select(count(lit(1))).collect()

    t("scan+tokens")(spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("toks", split(col("text"), " ")).select(col("toks")).count())
    t("shingles-HOF(old)")(base.select(col("shingles")).filter(size(col("shingles")) >= 0).count())
    def nat = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("hs", graft.operators.Sketches.hashedShingles(col("toks")))
    t("shingles-native")(nat.select(col("hs")).filter(size(col("hs")) >= 0).count())
    t("minhash sig native")(nat
      .withColumn("sig", graft.functions.VectorExpressions.minhashSig(col("hs"), 64, 42L))
      .select(col("sig")).filter(size(col("sig")) >= 0).count())
    t("full dedupMinhash")(graft.operators.Sketches.dedupMinhashLsh(spark, sfDir).count())
    t("full dedupMinhash 2nd")(graft.operators.Sketches.dedupMinhashLsh(spark, sfDir).count())
    t("simhash full")(graft.operators.Sketches.dedupSimhash(spark, sfDir).count())
    t("jaccard full")(graft.operators.TextQueries.dedupJaccardShingle(spark, sfDir).count())
    spark.stop()
  }
}
