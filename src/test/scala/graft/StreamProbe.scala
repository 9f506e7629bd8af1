package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase timing for the streaming replay harness (Test-scoped). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warm
    graft.streaming.StreamGates.queries("q_stream_hourly")(spark, sfDir).count()
    (1 to 3).foreach { i =>
      t(s"hourly pass$i (no unload)") {
        graft.streaming.StreamGates.queries("q_stream_hourly")(spark, sfDir).count()
      }
    }
    (1 to 3).foreach { i =>
      org.apache.spark.sql.graftbridge.StateStoreBridge.unloadAll()
      t(s"hourly pass$i (unloadAll)") {
        graft.streaming.StreamGates.queries("q_stream_hourly")(spark, sfDir).count()
      }
    }
    // phase split: slice write vs restarts
    val ev = graft.sources.TableIO.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"), col("value"))
    // full manual hourly replay with per-restart timing
    locally {
      val root = graft.sources.ScratchDirs.fresh("probe_hourly")
      val bounds = ev.agg(min(col("ts_us")).as("_mn"), max(col("ts_us")).as("_mx"))
      t("manual slice write") {
        ev.crossJoin(bounds).withColumn("_slice",
            least(lit(2), floor((col("ts_us") - col("_mn")).cast("double") * 3 /
              (col("_mx") - col("_mn") + 1).cast("double")).cast("int")))
          .drop("_mn", "_mx")
          .write.partitionBy("_slice").parquet(s"$root/slices")
      }
      val inDir = java.nio.file.Paths.get(s"$root/in")
      java.nio.file.Files.createDirectories(inDir)
      (0 until 3).foreach { k =>
        import scala.jdk.CollectionConverters._
        val sd = java.nio.file.Paths.get(s"$root/slices/_slice=$k")
        val fs = java.nio.file.Files.list(sd)
        try fs.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet"))
          .foreach(p => java.nio.file.Files.move(p, inDir.resolve(s"s${k}_${p.getFileName}")))
        finally fs.close()
        t(s"manual hourly restart $k") {
          val q = spark.readStream.schema(ev.schema).parquet(s"$root/in")
            .withColumn("ts", timestamp_micros(col("ts_us")))
            .transform(df => graft.streaming.EventStream.hourlyCounts(df))
            .writeStream.format("parquet")
            .option("path", s"$root/agg")
            .option("checkpointLocation", s"$root/ckpt")
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
      }
      t("final read")(spark.read.parquet(s"$root/agg").count())
    }
    val root = graft.sources.ScratchDirs.fresh("probe_slices")
    t("slice write (1 pass)") {
      val bounds = ev.agg(min(col("ts_us")).as("_mn"), max(col("ts_us")).as("_mx"))
      ev.crossJoin(bounds).withColumn("_slice",
          least(lit(2), floor((col("ts_us") - col("_mn")).cast("double") * 3 /
            (col("_mx") - col("_mn") + 1).cast("double")).cast("int")))
        .drop("_mn", "_mx")
        .write.partitionBy("_slice").parquet(s"$root/slices")
    }
    // one AvailableNow restart cost on a tiny input
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    spark.range(10).selectExpr("id AS event_id", "id AS user_id",
      "(86400000000 + id*1000000) AS ts_us", "'view' AS event_type",
      "CAST(id AS DOUBLE) AS value")
      .write.mode("append").parquet(s"$root/in")
    (1 to 3).foreach { i =>
      t(s"AvailableNow restart $i (tiny)") {
        val q = spark.readStream.schema(ev.schema).parquet(s"$root/in")
          .withColumn("ts", timestamp_micros(col("ts_us")))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .writeStream.format("parquet")
          .option("path", s"$root/agg")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    spark.stop()
  }
}
