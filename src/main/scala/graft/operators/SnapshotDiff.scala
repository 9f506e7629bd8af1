package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot DIFF — CDC reconstruction when no change feed was
  * recorded (the feed-less complement of `merge(..., changeFeed = true)`;
  * reference tables get the same capability from Delta's version history).
  * Given two keyed states of the same table, emits one row per difference:
  *
  *  - `insert`: key present only in `after` (after values);
  *  - `delete`: key present only in `before` (pre-image — the destroyed row);
  *  - `update`: key in both with ANY non-key column differing under
  *    null-safe `<=>` comparison (post-image `after` values).
  *
  * Identical rows are dropped — the output is delta-sized, never
  * table-sized. One full-outer shuffle join on the key plus one projected
  * select, entirely whole-stage-codegen: the same cost class as the MERGE
  * whose effect it reverse-engineers. Keys are assumed unique per side
  * (true for any MERGE-maintained table; a duplicate-keyed "snapshot" has
  * no well-defined row diff).
  */
object SnapshotDiff {

  /** Name of the appended action column (shared with [[Merge.ActionCol]]
    * so feed-driven and diff-driven consumers see one contract). */
  val ActionCol: String = Merge.ActionCol

  def diffFrames(before: DataFrame, after: DataFrame,
                 keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"diff sides disagree on columns: ${before.columns.mkString(",")} vs " +
        after.columns.mkString(","))
    val missing = keys.filterNot(before.columns.contains)
    require(missing.isEmpty, s"diff key(s) not in schema: ${missing.mkString(",")}")
    val cols = before.columns.toIndexedSeq
    val b = before.withColumn("__b_present", lit(true)).alias("b")
    val a = after.withColumn("__a_present", lit(true)).alias("a")
    val keyCond = keys.map(k => col(s"b.$k") <=> col(s"a.$k")).reduce(_ && _)
    val bPresent = col("b.__b_present").isNotNull
    val aPresent = col("a.__a_present").isNotNull
    val changed = cols.filterNot(keys.contains)
      .map(c => !(col(s"b.$c") <=> col(s"a.$c")))
      .foldLeft(lit(false))(_ || _)
    val action = when(!bPresent, lit("insert"))
      .when(!aPresent, lit("delete"))
      .when(changed, lit("update"))
      .otherwise(lit("keep"))
    // deletes carry the pre-image (only side that still has the row);
    // inserts and updates carry the after side.
    val projected = cols.map(c =>
      when(aPresent, col(s"a.$c")).otherwise(col(s"b.$c")).as(c))
    b.join(a, keyCond, "full_outer")
      .select(projected :+ action.as(ActionCol): _*)
      .filter(col(ActionCol) =!= lit("keep"))
  }
}
