package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Merge
import graft.sources.MergeClauses

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def target = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("k", "v", "n")

  test("unconditional merge: update matched, insert new, keep untouched") {
    val source = Seq((2, "B", 99), (4, "d", 40)).toDF("k", "v", "n")
    val out = Merge.mergeFrames(target, source, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1, "a", 10), (2, "B", 99), (3, "c", 30), (4, "d", 40)))
  }

  test("conditional update: only rows where values differ (null-safe)") {
    val source = Seq((1, "a", 10), (2, "CHANGED", 20)).toDF("k", "v", "n")
    val changed = !(col("t.v") <=> col("s.v")) || !(col("t.n") <=> col("s.n"))
    val out = Merge.mergeFrames(target, source, Seq("k"),
      MergeClauses.Spec(updateWhen = Some(changed)))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1, "a"), (2, "CHANGED"), (3, "c")))
  }

  test("tagged merge labels every row with the clause that produced it") {
    val source = Seq((1, "a", 10), (2, "B2", 20), (4, "d", 40)).toDF("k", "v", "n")
    val changed = !(col("t.v") <=> col("s.v"))
    val tagged = Merge.mergeFramesTagged(target, source, Seq("k"),
      MergeClauses.Spec(
        updateWhen = Some(changed),
        deleteWhen = Some(lit(true))))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(3)))
      .sortBy(_._1)
    // k=1 matched+unchanged → delete (PRE-image "a"); k=2 → update
    // (post-image "B2"); k=3 unmatched target → keep; k=4 → insert.
    assert(tagged.toSeq == Seq((1, "a", "delete"), (2, "B2", "update"),
      (3, "c", "keep"), (4, "d", "insert")))
    // mergeFrames is exactly the tagged resolution minus the deletes.
    val viaTag = tagged.filter(_._3 != "delete").map(t => (t._1, t._2))
    val direct = Merge.mergeFrames(target, source, Seq("k"),
      MergeClauses.Spec(updateWhen = Some(changed), deleteWhen = Some(lit(true))))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(direct.toSeq == viaTag.toSeq)
  }

  test("schema evolution appends source-only columns with null backfill") {
    val source = Seq((2, "B", 99, 2.5), (4, "d", 40, 4.5))
      .toDF("k", "v", "n", "score")
    val out = Merge.mergeFrames(target, source, Seq("k"),
      schemaEvolution = true)
    assert(out.columns.toSeq == Seq("k", "v", "n", "score"))
    val rows = out.collect()
      .map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(_._1)
    // kept rows (1, 3) carry the null backfill; updated/inserted carry source.
    assert(rows.toSeq == Seq((1, "a", None), (2, "B", Some(2.5)),
      (3, "c", None), (4, "d", Some(4.5))))
  }

  test("without evolution, a source missing target columns is rejected") {
    val source = Seq((2, "B")).toDF("k", "v") // lacks target column n
    val e = intercept[IllegalArgumentException] {
      Merge.mergeFrames(target, source, Seq("k"))
    }
    assert(e.getMessage.contains("schemaEvolution"))
  }

  test("matched-delete clause removes no-change rows (hist-job shape)") {
    val source = Seq((1, "a", 10), (2, "B2", 20)).toDF("k", "v", "n")
    val changed = !(col("t.v") <=> col("s.v"))
    val out = Merge.mergeFrames(target, source, Seq("k"),
      MergeClauses.Spec(
        updateWhen = Some(changed),
        deleteWhen = Some(lit(true)),       // fires only when update didn't
        insertWhen = Some(lit(true))))
      .collect().map(_.getInt(0)).sorted
    // k=1 matched+unchanged → deleted; k=2 matched+changed → updated; k=3 kept
    assert(out.toSeq == Seq(2, 3))
  }

  test("insert condition gates new keys") {
    val source = Seq((4, "d", 40), (5, "e", 50)).toDF("k", "v", "n")
    val out = Merge.mergeFrames(target, source, Seq("k"),
      MergeClauses.Spec(insertWhen = Some(col("s.n") > 45)))
      .collect().map(_.getInt(0)).sorted
    assert(out.toSeq == Seq(1, 2, 3, 5))
  }

  test("duplicate source keys are rejected, not fanned out") {
    // Delta MERGE errors on multiple source matches per target row; the
    // relational resolver must do the same instead of silently duplicating
    // the target row through the full-outer join.
    val source = Seq((2, "B", 99), (2, "B2", 98), (4, "d", 40)).toDF("k", "v", "n")
    val e = intercept[Exception] {
      Merge.mergeFrames(target, source, Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate rows")))
  }

  test("duplicate source keys matching NO target row insert-fan (Delta contract)") {
    // Delta only errors when multiple source rows match ONE TARGET row;
    // duplicates on a key absent from the target are legal and all insert.
    val source = Seq((4, "d", 40), (4, "d2", 41)).toDF("k", "v", "n")
    val out = Merge.mergeFrames(target, source, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(r => (r._1, r._2))
    assert(out.toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"), (4, "d2")))
  }

  test("non-null-safe keys: null-keyed source rows always insert (reference ON =)") {
    val t = Seq((Some(1), "a"), (None, "x")).toDF("k", "v")
    val s = Seq((Some(1), "A"), (None, "y")).toDF("k", "v")
    // With plain `=` key equality the null-keyed source row matches nothing
    // → inserted; the null-keyed target row matches nothing → kept. That is
    // the reference merge's duplicate-accumulation behavior on null keys
    // (mls_listings_hist_curated.py:185), which q_job2_e2e pins e2e.
    val out = Merge.mergeFrames(t, s, Seq("k"), nullSafeKeys = false)
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSeq
      .sortBy(r => (r._1.map(_.toString).getOrElse(""), r._2))
    assert(out == Seq((None, "x"), (None, "y"), (Some(1), "A")))
    // With <=> (default) the null keys match and update instead.
    val out2 = Merge.mergeFrames(t, s, Seq("k"))
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSeq
      .sortBy(r => (r._1.map(_.toString).getOrElse(""), r._2))
    assert(out2 == Seq((None, "y"), (Some(1), "A")))
  }

  test("merge is idempotent on replayed batches") {
    val source = Seq((2, "B", 99), (4, "d", 40)).toDF("k", "v", "n")
    val once = Merge.mergeFrames(target, source, Seq("k"))
    val twice = Merge.mergeFrames(once, source, Seq("k"))
    assert(once.collect().toSet == twice.collect().toSet)
  }
}
