package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventQueries

/** q_events_anomaly_floor: the MAD floor must flip exactly the MAD-0
  * false positive — the heartbeat's 1-count blip — while the genuine
  * flood keeps flagging, and floored results for types with MAD ≥ floor
  * stay identical to the unfloored gate. */
class AnomalyFloorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("floor suppresses the MAD-0 blip but not the flood") {
    val rows = EventQueries.eventsAnomalyFloor(spark, dir).collect()
    val hb = rows.filter(_.getAs[String]("event_type") == "uptime_ping")
    // >= 4 hours: at exactly 3 the lower median would select the 26-blip
    // (rank (3+1) div 2 = 2) and MAD would be 1, not 0 — the construction
    // below assumes the steady hours hold the median.
    assert(hb.length >= 4, "heartbeat must span at least 4 hours")
    hb.foreach { r =>
      assert(r.getAs[Long]("mad") == 0L, "heartbeat MAD must be 0")
      assert(r.getAs[Long]("mad_eff") == 2L)
      assert(r.getAs[Long]("median_events") == 25L)
    }
    val byCount = hb.groupBy(_.getAs[Long]("n_events"))
    // flood hour: adev 975 > 8 -> flagged
    assert(byCount(1000L).forall(_.getAs[Boolean]("is_anomaly")))
    // blip hour: adev 1 <= 8 -> NOT flagged (unfloored it would be: 1 > 0)
    assert(byCount(26L).forall(!_.getAs[Boolean]("is_anomaly")))
    // steady hours never flag under either rule
    assert(byCount(25L).forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("real event types with MAD >= floor are untouched by the floor") {
    val unfloored = EventQueries.eventsAnomaly(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getAs[Long]("mad"), r.getAs[Boolean]("is_anomaly")))).toMap
    val floored = EventQueries.eventsAnomalyFloor(spark, dir).collect()
      .filter(_.getAs[String]("event_type") != "uptime_ping")
    assert(floored.nonEmpty)
    floored.foreach { r =>
      val key = (r.getLong(0), r.getString(1))
      val (mad, flag) = unfloored(key)
      assert(r.getAs[Long]("mad") == mad)
      if (mad >= 2L)
        assert(r.getAs[Boolean]("is_anomaly") == flag,
          s"floor changed a MAD>=2 flag at $key")
    }
  }
}
