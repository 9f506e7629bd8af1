package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly aggregation equals the batch result") {
    // file-stream source needs a directory of its own
    val dir = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // schema from a batch read of the same files — the spec must not bake in
    // one ts encoding (the testdata has shipped nanos-as-long AND timestamp[us])
    val schema = spark.read.parquet(dir.toString).schema
    def shape(df: org.apache.spark.sql.DataFrame) =
      graft.sources.TableIO.withEpochMicros(df)
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

    val streamIn = shape(spark.readStream.schema(schema).parquet(dir.toString))
    val q = EventStream.hourlyCounts(streamIn).writeStream
      .format("memory").queryName("hourly_out").outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val batchIn = shape(spark.read.schema(schema).parquet(dir.toString))
    val expected = EventStream.hourlyCounts(batchIn)
      .collect().map(_.toSeq).toSet
    val got = spark.table("hourly_out").collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("streaming dedup keeps first arrival per fingerprint across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val named = stream.toDF().toDF("doc_id", "text", "ts")
    val q = EventStream.streamingDedup(named, "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    stream.addData((1L, "alpha", ts(1)), (2L, "beta", ts(2)), (3L, "alpha", ts(3)))
    q.processAllAvailable()
    stream.addData((4L, "alpha", ts(4)), (5L, "gamma", ts(5))) // dup in batch 2
    q.processAllAvailable(); q.stop()
    import spark.implicits._
    val kept = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 5L)) // 3 and 4 are cross-batch dups
  }

  test("dedup state is evicted behind the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val named = stream.toDS().toDF("doc_id", "text", "ts")
    val q = EventStream.streamingDedup(named, "doc_id", "text", "ts",
        horizon = "10 minutes")
      .writeStream.format("memory").queryName("dedup_evict_out")
      .outputMode("append").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    stream.addData((1L, "alpha", ts(0, 0)))
    q.processAllAvailable()
    // advance the watermark far past alpha's expiry (00:00 + 10 min)
    stream.addData((2L, "beta", ts(1, 0)))
    q.processAllAvailable()
    // alpha's fingerprint state is gone → the late duplicate is re-emitted;
    // with plain dropDuplicates this row would be suppressed forever and
    // state would grow without bound.
    stream.addData((3L, "alpha", ts(1, 1)))
    q.processAllAvailable(); q.stop()
    import spark.implicits._
    val kept = spark.table("dedup_evict_out").select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L))
  }

  test("stateful sessionization across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val min = 60L * 1000000L
    // Events sit well above epoch 0: with the event-time watermark now in
    // place, a row AT the watermark boundary is treated as late.
    val base = 1000L
    val stream = MemoryStream[Event]
    val q = EventStream.sessionize(stream.toDS(), gapMinutes = 30).writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()

    // batch 1: user 1 — two close events, then a 45-min gap
    stream.addData(
      Event(1, 1, (base + 0) * min, "a", 1.0),
      Event(2, 1, (base + 10) * min, "a", 1.0),
      Event(3, 1, (base + 55) * min, "a", 1.0))
    q.processAllAvailable()
    // batch 2: user 1 continues within gap; user 2 appears (in-watermark:
    // base+0 is inside the 1h lateness allowance behind base+55)
    stream.addData(
      Event(4, 1, (base + 70) * min, "a", 1.0),  // 15 min after event 3 → same session
      Event(5, 1, (base + 200) * min, "a", 1.0), // long gap → session 3
      Event(6, 2, (base + 0) * min, "b", 1.0))
    q.processAllAvailable(); q.stop()

    val got = spark.table("sess_out").as[(Long, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L, 6L -> 1L))
  }

  test("sessionization state survives a stop/restart from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val min = 60L * 1000000L
    val base = 1000L
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    // memory sink can't recover from a checkpoint; the parquet sink can
    val outDir = java.nio.file.Files.createTempDirectory("graft_sess_out").toString
    val stream = MemoryStream[Event]
    def start() = EventStream.sessionize(stream.toDS(), gapMinutes = 30)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    stream.addData(Event(1, 1, (base + 0) * min, "a", 1.0))
    q1.processAllAvailable(); q1.stop()

    // restart from the same checkpoint: the in-gap event must land in the
    // RESTORED session 1, not a fresh session — state came from the store
    val q2 = start()
    stream.addData(
      Event(2, 1, (base + 10) * min, "a", 1.0),  // 10 min later → session 1
      Event(3, 1, (base + 90) * min, "a", 1.0))  // 80-min gap → session 2
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(outDir).as[(Long, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("streaming attribution carries last-view state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val min = 60L * 1000000L
    val base = 1000L
    val stream = MemoryStream[Event]
    val q = EventStream.attribute(stream.toDS()).writeStream
      .format("memory").queryName("attr_out").outputMode("append").start()
    // batch 1: user 1 views twice, buys once (in-batch attribution)
    stream.addData(
      Event(1, 1, (base + 0) * min, "view", 1.0),
      Event(2, 1, (base + 5) * min, "view", 1.0),
      Event(3, 1, (base + 10) * min, "purchase", 1.0),
      Event(4, 2, (base + 10) * min, "purchase", 1.0)) // no view ever
    q.processAllAvailable()
    // batch 2: user 1 buys again — attribution comes from batch-1 STATE
    stream.addData(Event(5, 1, (base + 20) * min, "purchase", 1.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("attr_out")
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got == Map(3L -> Some((base + 5) * min), 4L -> None,
      5L -> Some((base + 5) * min)))
  }

  test("attribution view-state is evicted for idle users") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val min = 60L * 1000000L
    val base = 1000L
    val stream = MemoryStream[Event]
    val q = EventStream.attribute(stream.toDS(), horizonMinutes = 60)
      .writeStream.format("memory").queryName("attr_evict_out")
      .outputMode("append").start()
    stream.addData(Event(1, 1, (base + 0) * min, "view", 1.0))
    q.processAllAvailable()
    // far-future activity advances the watermark; a third batch triggers
    // timeout processing and evicts user 1's view state
    stream.addData(Event(2, 9, (base + 300) * min, "view", 1.0))
    q.processAllAvailable()
    stream.addData(Event(3, 8, (base + 310) * min, "view", 1.0))
    q.processAllAvailable()
    // user 1 returns: the batch twin would attribute to the base+0 view,
    // but bounded streaming state reports a direct purchase
    stream.addData(Event(4, 1, (base + 320) * min, "purchase", 1.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("attr_evict_out")
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got == Map(4L -> None), s"state survived eviction: $got")
  }

  test("streaming funnel emits stage transitions in order across batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val min = 60L * 1000000L
    val base = 1000L
    val stream = MemoryStream[Event]
    val q = EventStream.funnelStages(stream.toDS()).writeStream
      .format("memory").queryName("funnel_out").outputMode("append").start()
    // batch 1: user 1 views; a click at the SAME ts as nothing prior and a
    // pre-view click for user 2 (must not count)
    stream.addData(
      Event(1, 1, (base + 0) * min, "view", 1.0),
      Event(2, 2, (base + 0) * min, "click", 1.0), // click before any view
      Event(3, 2, (base + 1) * min, "view", 1.0))
    q.processAllAvailable()
    // batch 2: user 1 clicks then purchases (stage 2 and 3 from state);
    // user 2's second view must NOT re-emit stage 1
    stream.addData(
      Event(4, 1, (base + 2) * min, "click", 1.0),
      Event(5, 1, (base + 3) * min, "purchase", 1.0),
      Event(6, 2, (base + 4) * min, "view", 1.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("funnel_out")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1, 1L, (base + 0) * min),
      (2L, 1, 3L, (base + 1) * min),
      (1L, 2, 4L, (base + 2) * min),
      (1L, 3, 5L, (base + 3) * min)))
  }

  test("sessionization evicts idle users' state behind the watermark") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val min = 60L * 1000000L
    val stream = MemoryStream[Event]
    val q = EventStream.sessionize(stream.toDS(), gapMinutes = 30,
        horizon = "1 hour").writeStream
      .format("memory").queryName("sess_evict_out").outputMode("append").start()

    val base = 1000L
    // batch 1: user 1's only activity (timeout registered at base+30min)
    stream.addData(Event(1, 1, (base + 0) * min, "a", 1.0))
    q.processAllAvailable()
    // batch 2: user 9 far in the future → watermark advances to base+240min
    stream.addData(Event(2, 9, (base + 300) * min, "b", 1.0))
    q.processAllAvailable()
    // batch 3: another user triggers timeout processing — user 1's state
    // (expiry base+30 < watermark base+240) is evicted, emitting nothing
    stream.addData(Event(3, 8, (base + 310) * min, "b", 1.0))
    q.processAllAvailable()
    // batch 4: user 1 returns — with state evicted, numbering RESTARTS at
    // session 1; surviving state (NoTimeout behavior) would say session 2
    stream.addData(Event(4, 1, (base + 320) * min, "a", 1.0))
    q.processAllAvailable(); q.stop()

    val got = spark.table("sess_evict_out").as[(Long, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got(4L) == 1L, s"state not evicted: $got")
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("recent-features ListState (TWS) evicts idle users and restarts from empty") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val min = 60L * 1000000L
      val stream = MemoryStream[Event]
      val q = EventStream.recentFeaturesTws(stream.toDS(), n = 5,
          gapMinutes = 30, horizon = "1 hour").writeStream
        .format("memory").queryName("recent_evict_out")
        .outputMode("append").start()
      val base = 1000L
      // batch 1: user 1's only activity (timer armed at base+30min)
      stream.addData(Event(1, 1, (base + 0) * min, "a", 7.0))
      q.processAllAvailable()
      // batch 2: user 9 far in the future advances the watermark
      stream.addData(Event(2, 9, (base + 300) * min, "b", 1.0))
      q.processAllAvailable()
      // batch 3: two events for user 8 — normal in-batch accumulation —
      // and the expired timer clears user 1's history
      stream.addData(Event(3, 8, (base + 310) * min, "b", 3.0),
        Event(5, 8, (base + 311) * min, "b", 4.0))
      q.processAllAvailable()
      // batch 4: user 1 returns — with history evicted, features restart
      // from n_prev = 0 (surviving state would say n_prev = 1, gap 320min)
      stream.addData(Event(4, 1, (base + 320) * min, "a", 2.0))
      q.processAllAvailable(); q.stop()

      val rows = spark.table("recent_evict_out").collect()
        .map(r => r.getAs[Long]("event_id") ->
          ((r.getAs[Int]("n_prev"),
            Option(r.getAs[Any]("max_prev_value")),
            Option(r.getAs[Any]("gap_us"))))).toMap
      assert(rows(4L) == ((0, None, None)), s"history not evicted: $rows")
      // in-state accumulation still works where no eviction happened
      assert(rows(3L) == ((0, None, None)))
      assert(rows(5L) == ((1, Some(3.0), Some(1L * min))))
    } finally prevProv match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }
}
