package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IncrementalView, Merge}
import graft.sources.{ManagedTable, MergeClauses}

class IncrementalViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val spec = IncrementalView.Spec(Seq("g"), Seq("x"))

  /** Exact measure type: incremental sums are only exact over exact
    * arithmetic (the operator's documented contract). */
  private def fact(rows: (Int, Int, java.lang.Long)*): DataFrame =
    rows.toDF("k", "g", "x")

  private def viewAsMap(df: DataFrame): Map[Int, (Long, Option[Long])] =
    df.select(col("g"), col("n"), col("sum_x")).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap

  private def mergeWithFeed(base: DataFrame, delta: DataFrame,
                            clauses: MergeClauses.Spec): DataFrame = {
    val root = Files.createTempDirectory("graft_ivm").toString
    ManagedTable.overwrite(root, base)
    ManagedTable.merge(spark, root, delta, Seq("k"), clauses,
      changeFeed = true, preImageFeed = true)
    ManagedTable.changes(spark, root, 1)
  }

  test("insert/update/delete/group-move contributions match a recompute") {
    val base = fact((1, 10, 5L), (2, 10, 7L), (3, 20, 1L), (4, 20, 2L),
      (5, 30, 9L))
    // k=2: update in place (x 7→70); k=3: update MOVES group 20→40;
    // k=5: delete empties group 30; k=6: insert into new group 40.
    val delta = Seq((2, 10, 70L, "u"), (3, 40, 11L, "u"), (5, 30, 0L, "d"),
      (6, 40, 13L, "u")).toDF("k", "g", "x", "op")
    val feed = mergeWithFeed(base, delta, MergeClauses.Spec(
      updateWhen = Some(col("s.op") === lit("u")),
      deleteWhen = Some(lit(true))))
    val maintained = IncrementalView.applyChanges(
      IncrementalView.initialize(base, spec), feed, spec)
    assert(viewAsMap(maintained) == Map(
      10 -> (2L, Some(75L)),   // 5 + 70
      20 -> (1L, Some(2L)),    // k=3 moved out
      40 -> (2L, Some(24L))))  // moved-in 11 + inserted 13; group 30 gone
  }

  test("all-null sums stay NULL, mixed groups drop nulls (SQL semantics)") {
    val base = fact((1, 1, null), (2, 1, null), (3, 2, null), (4, 2, 8L))
    // Insert a null-x row into group 1 and a valued row into group 2.
    val delta = Seq((5, 1, null: java.lang.Long),
      (6, 2, java.lang.Long.valueOf(4L))).toDF("k", "g", "x")
    val feed = mergeWithFeed(base, delta, MergeClauses.Spec())
    val maintained = IncrementalView.applyChanges(
      IncrementalView.initialize(base, spec), feed, spec)
    assert(viewAsMap(maintained) == Map(
      1 -> (3L, None),          // three rows, all null → NULL sum
      2 -> (3L, Some(12L))))
  }

  test("chained feeds equal a from-scratch aggregate of the final state") {
    val base = fact((1 to 40).map(k =>
      (k, k % 7, java.lang.Long.valueOf(k.toLong * 3))): _*)
    val root = Files.createTempDirectory("graft_ivm_chain").toString
    ManagedTable.overwrite(root, base)
    var view = IncrementalView.initialize(base, spec)
    val deltas = Seq(
      // round 1: rewrite evens into shifted groups, delete multiples of 5
      (1 to 50).filter(_ % 2 == 0).map(k =>
        (k, (k + 1) % 7, k.toLong * 10, k % 5 == 0)),
      // round 2: touch a disjoint slice incl. re-inserting deleted keys
      (1 to 50).filter(_ % 3 == 0).map(k =>
        (k, k % 5, k.toLong + 1, k % 7 == 0)))
    deltas.foreach { d =>
      val delta = d.toDF("k", "g", "x", "del")
      ManagedTable.merge(spark, root, delta, Seq("k"),
        MergeClauses.Spec(
          updateWhen = Some(!col("s.del")),
          deleteWhen = Some(lit(true)),
          insertWhen = Some(!col("s.del"))),
        changeFeed = true, preImageFeed = true)
      val v = ManagedTable.currentVersion(root)
      view = IncrementalView.applyChanges(view,
        ManagedTable.changes(spark, root, v), spec)
    }
    val expect = IncrementalView.initialize(
      ManagedTable.read(spark, root).drop("del"), spec)
    assert(viewAsMap(view) == viewAsMap(expect))
  }

  test("refreshGroups recomputes exactly the touched groups") {
    val base = fact((1, 10, 5L), (2, 10, 7L), (3, 20, 1L), (4, 30, 9L))
    val delta = Seq((2, 40, 70L, "u"), (4, 30, 0L, "d"))
      .toDF("k", "g", "x", "op")
    val feed = mergeWithFeed(base, delta, MergeClauses.Spec(
      updateWhen = Some(col("s.op") === lit("u")),
      deleteWhen = Some(lit(true))))
    val aggs = Seq(count(lit(1)).as("n"), min(col("x")).as("mn"),
      max(col("x")).as("mx"))
    val view0 = IncrementalView.initializeWith(base, Seq("g"), aggs)
    val postFact = base.as("b").join(delta.select("k").as("d"), Seq("k"),
      "left_anti").select("k", "g", "x")
      .unionByName(Seq((2, 40, 70L)).toDF("k", "g", "x"))
    val out = IncrementalView.refreshGroups(view0, feed, postFact,
      Seq("g"), aggs)
    val m = out.collect().map(r => r.getInt(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // group 10 lost k=2 (moved to 40): recomputed extrema; 20 untouched;
    // 30 emptied by the delete → absent; 40 created by the move.
    assert(m == Map(10 -> (1L, 5L, 5L), 20 -> (1L, 1L, 1L),
      40 -> (1L, 70L, 70L)))
  }

  test("feed without pre-images is rejected when it carries updates") {
    val base = fact((1, 10, 5L))
    val root = Files.createTempDirectory("graft_ivm_nopre").toString
    ManagedTable.overwrite(root, base)
    ManagedTable.merge(spark, root, fact((1, 10, 6L)), Seq("k"),
      changeFeed = true) // preImageFeed left off
    val feed = ManagedTable.changes(spark, root, 1)
    val view0 = IncrementalView.initialize(base, spec)
    val ex = intercept[Exception] {
      IncrementalView.applyChanges(view0, feed, spec).collect()
    }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(chain.contains("pre-image"))
  }
}
