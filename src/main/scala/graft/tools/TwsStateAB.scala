package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TTLConfig,
  TimeMode, TimerValues}

import graft.streaming.EventStream.{EventTs, RecentEvent}

/** ListState record-width A/B at configurable key count — the measurement
  * behind EventStream.RecentEvent's "trimmed state record" claim
  * (EventStream.scala: the full EventTs would serialize
  * event_type/event_ts/redundant ids through RocksDB every batch, ~2-3×
  * the bytes). [[graft.tools.StateStoreAB]] measured PROVIDERS on classic
  * flatMapGroupsWithState O(1)-per-key state; the trailing-n ListState
  * operator has a different growth profile — n rows per key, RocksDB-only
  * (transformWithState admits no other provider) — so the trim is the one
  * knob left, and this tool measures exactly it: the SAME trailing-5
  * processor (sort, append, takeRight, re-armed event-time timer — a
  * faithful copy of RecentFeaturesProcessor parameterized by the state
  * record) run once with the 2-field (ts_us, value) record and once
  * storing the full 6-field input row. Every batch touches every key
  * (worst-case update fan-out), so per commit RocksDB writes nKeys list
  * values of the record under test. Two passes, per-config minimum.
  *
  * {{{ sbt "runMain graft.tools.TwsStateAB 1000000" }}}
  */
object TwsStateAB {
  private val provKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** RecentFeaturesProcessor with the state record pluggable: `toState`
    * is the only difference between the trimmed and full configs. */
  private final class TrailingProcessor[S: scala.reflect.ClassTag](
      n: Int, gapMs: Long,
      enc: Encoder[S], toState: EventTs => S, tsOf: S => Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EventTs, Long] {
    @transient private var recent:
      org.apache.spark.sql.streaming.ListState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[S]("recent", enc, TTLConfig.NONE)

    override def handleInputRows(userId: Long, it: Iterator[EventTs],
                                 timerValues: TimerValues): Iterator[Long] = {
      val batch = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var buf: Vector[S] =
        if (recent.exists()) recent.get().toVector else Vector.empty
      batch.foreach { e => buf = (buf :+ toState(e)).takeRight(n) }
      recent.put(buf.toArray)
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(
        math.max(tsOf(buf.last) / 1000L + gapMs,
          timerValues.getCurrentWatermarkInMs + 1))
      Iterator.single(batch.size.toLong)
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Long] = {
      recent.clear()
      Iterator.empty
    }
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1000000)
    val batches = 4
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-tws-state-ab")
      .config("spark.sql.shuffle.partitions", "3")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(nKeys: Int, full: Boolean): Double = {
      val root = Files.createTempDirectory("graft_twsab").toString
      (0 until batches).foreach { b =>
        spark.range(nKeys.toLong)
          .select((col("id") + b * nKeys.toLong).as("event_id"),
            col("id").as("user_id"),
            (lit(1700000000000000L) + col("id") * 7L
              + b * 60000000L).as("ts_us"),
            concat(lit("event_type_"), col("id") % 7).as("event_type"),
            (col("id") % 1000).cast("double").as("value"))
          .coalesce(1)
          .write.parquet(s"$root/in/b$b")
      }
      val prevProv = spark.conf.getOption(provKey)
      spark.conf.set(provKey, rocks)
      val t0 = System.nanoTime()
      try {
        val in = spark.readStream
          .schema("event_id BIGINT, user_id BIGINT, ts_us BIGINT, " +
            "event_type STRING, value DOUBLE")
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/in/*")
          .withColumn("event_ts", timestamp_micros(col("ts_us")))
          .as[EventTs]
          .withWatermark("event_ts", "720 hours")
        val proc =
          if (full) new TrailingProcessor[EventTs](5, 1800000L,
            Encoders.product[EventTs], identity, _.ts_us)
          else new TrailingProcessor[RecentEvent](5, 1800000L,
            Encoders.product[RecentEvent],
            e => RecentEvent(e.ts_us, e.value), _.ts_us)
        val out = in.groupByKey(_.user_id)
          .transformWithState(proc, TimeMode.EventTime(),
            OutputMode.Append(), Encoders.scalaLong)
        val q = out.toDF().writeStream
          .outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.format("noop").mode("overwrite").save()
          }
          .start()
        q.processAllAvailable()
        q.stop()
      } finally {
        prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
        org.apache.spark.sql.graftbridge.StateStoreBridge.unloadAll()
      }
      (System.nanoTime() - t0) / 1e9
    }

    sizes.foreach { nKeys =>
      run(math.min(nKeys, 1000), full = false) // warmup, untimed
      val results = (1 to 2).flatMap { pass =>
        Seq("trimmed" -> false, "full" -> true).map { case (name, full) =>
          val sec = run(nKeys, full)
          System.err.println(f"pass $pass $name nKeys=$nKeys: $sec%.2f s")
          name -> sec
        }
      }
      val mins = results.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      println(f"""{"nKeys":$nKeys,"batches":$batches,""" +
        f""""trimmed":${mins("trimmed")}%.2f,"full":${mins("full")}%.2f}""")
    }
    spark.stop()
  }
}
