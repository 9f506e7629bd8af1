package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** State-store provider A/B at configurable state size — the measurement
  * behind SCALE.md's RocksDB-vs-default decision. The replay gates hold a
  * few thousand state rows, where the HDFS-backed in-memory map wins; this
  * tool scales the SAME shape (file-source micro-batches → keyed streaming
  * aggregation in update mode, one checkpoint commit per batch) to
  * millions of keys to find where the conclusion inverts.
  *
  * Every batch touches EVERY key (worst-case update fan-out): batch i
  * holds nKeys rows keyed 0..nKeys-1, so per commit the store rewrites
  * the full key space and the HDFS provider's per-batch delta file equals
  * a full snapshot, while RocksDB pays native puts + sst flush. Providers
  * alternate HDFS → RocksDB → RocksDB+changelog per pass; two passes,
  * per-config minimum reported.
  *
  * {{{ sbt "runMain graft.tools.StateStoreAB 4000 1000000" }}}
  */
object StateStoreAB {
  private val provKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val changelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(4000, 1000000)
    val batches = 4
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-statestore-ab")
      // 3 state partitions, matching the replay gates' harness shape.
      .config("spark.sql.shuffle.partitions", "3")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // sparse: batch 0 loads the full key space (state build), later
    // batches touch 1% — the long-lived-query shape where incremental
    // checkpointing should shine; dense: every batch rewrites every key.
    val sparse = sys.env.get("SPARK_GRAFT_SSAB_SPARSE").contains("true")

    def run(nKeys: Int, provider: String, changelog: Boolean): Double = {
      val root = Files.createTempDirectory("graft_ssab").toString
      (0 until batches).foreach { b =>
        val width = if (sparse && b > 0) math.max(1L, nKeys / 100L)
          else nKeys.toLong
        spark.range(width)
          .select((col("id") * (if (sparse && b > 0) 97L else 1L) % nKeys)
            .as("k"), lit(b).as("v"))
          .coalesce(1)
          .write.parquet(s"$root/in/b$b")
      }
      val prevProv = spark.conf.getOption(provKey)
      val prevLog = spark.conf.getOption(changelogKey)
      if (provider.nonEmpty) spark.conf.set(provKey, provider)
      spark.conf.set(changelogKey, changelog.toString)
      val t0 = System.nanoTime()
      try {
        val in = spark.readStream
          .schema("k BIGINT, v INT")
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/in/*")
        val agg = in.groupBy("k")
          .agg(count(lit(1)).as("n"), max("v").as("last"))
        val q = agg.writeStream
          .outputMode("update")
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.format("noop").mode("overwrite").save()
          }
          .start()
        q.processAllAvailable()
        q.stop()
      } finally {
        prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
        prevLog.fold(spark.conf.unset(changelogKey))(
          spark.conf.set(changelogKey, _))
        org.apache.spark.sql.graftbridge.StateStoreBridge.unloadAll()
      }
      (System.nanoTime() - t0) / 1e9
    }

    val configs = Seq(
      ("hdfs", "", false),
      ("rocksdb", rocks, false),
      ("rocksdb_changelog", rocks, true))
    sizes.foreach { nKeys =>
      // Warmup (codegen/JIT) on the smallest shape, untimed.
      run(math.min(nKeys, 1000), "", changelog = false)
      val results = (1 to 2).flatMap { pass =>
        configs.map { case (name, prov, log) =>
          val sec = run(nKeys, prov, log)
          System.err.println(f"pass $pass $name nKeys=$nKeys: $sec%.2f s")
          name -> sec
        }
      }
      val mins = results.groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
      val json = configs.map { case (name, _, _) =>
        f""""$name":${mins(name)}%.2f""" }.mkString(",")
      println(s"""{"nKeys":$nKeys,"batches":$batches,$json}""")
    }
    spark.stop()
  }
}
