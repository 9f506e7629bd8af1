package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SpecialJoins

class SpecialJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join picks the latest prior row, inclusive, max-id on ties") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq(
      (1L, 10L, 7L),  // same timestamp as left t=10 -> inclusive match
      (1L, 10L, 9L),  // tie on time: greater id wins
      (1L, 15L, 3L),  // latest before t=20
      (3L, 1L, 4L))   // other key, never matched
      .toDF("k", "rt", "rid")
    val got = SpecialJoins.asOfJoin(left, right, key = "k",
        leftTime = "t", rightTime = "rt", rightTieBreak = "rid",
        payload = Seq("rid", "rt"))
      .select("lid", "rid", "rt").as[(Long, Option[Long], Option[Long])]
      .collect().toSet
    assert(got == Set(
      (100L, Some(9L), Some(10L)),  // inclusive + tie -> id 9
      (101L, Some(3L), Some(15L)),  // latest prior
      (102L, None, None)))          // no prior right row for key 2
  }

  test("as-of join carries the whole matched row, never a torn mix") {
    val left = Seq((1L, 3L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 1L, 1L, Some("a")), (1L, 2L, 2L, None))
      .toDF("k", "rt", "rid", "x")
    val got = SpecialJoins.asOfJoin(left, right, "k", "t", "rt", "rid",
        Seq("rid", "x"))
      .select("lid", "rid", "x").as[(Long, Option[Long], Option[String])]
      .collect().toSeq
    // the latest right row is (rid=2, x=NULL); per-column carry would
    // stitch (rid=2, x="a") — a row that exists nowhere
    assert(got == Seq((100L, Some(2L), None)))
  }

  test("as-of join with an empty right side keeps all left rows with nulls") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val right = Seq.empty[(Long, Long, Long)].toDF("k", "rt", "rid")
    val got = SpecialJoins.asOfJoin(left, right, "k", "t", "rt", "rid",
        Seq("rid", "rt"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq((100L, None)))
  }

  test("band join attaches exactly the covering band, whatever the width") {
    val facts = Seq(0.0, 999.99, 1000.0, 3999.0, 4000.0, 511999.9)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val bands = Seq(("a", 0.0, 1000.0), ("b", 1000.0, 4000.0),
      ("c", 4000.0, 512000.0)).toDF("band", "lo", "hi")
    val got = SpecialJoins.bandJoin(facts, bands, "v", "lo", "hi",
        bucketWidth = 4000.0)
      .select("id", "band").as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "a", 1L -> "a", 2L -> "b", 3L -> "b",
      4L -> "c", 5L -> "c"))
  }

  test("band join drops null-bounded bands silently; explode bomb still errors") {
    val facts = Seq((1L, 5.0), (2L, 50.0)).toDF("id", "v")
    val bands = Seq(("ok", Some(0.0), Some(10.0)),
      ("no_lo", None, Some(100.0)), ("no_hi", Some(0.0), None))
      .toDF("band", "lo", "hi")
    val got = SpecialJoins.bandJoin(facts, bands, "v", "lo", "hi",
        bucketWidth = 10.0)
      .select("id", "band").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "ok")) // null-bounded bands match nothing, no error
    // the guard still fires for a real explode bomb, with a usable message
    val bomb = Seq(("wide", 0.0, 1e12)).toDF("band", "lo", "hi")
    val e = intercept[Exception] {
      SpecialJoins.bandJoin(facts, bomb, "v", "lo", "hi", bucketWidth = 1.0,
        maxBucketsPerBand = 100L).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("explodes into"))
  }
}
