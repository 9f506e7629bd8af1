package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.MergeClauses

/** Pure relational MERGE resolver (SURVEY §2.1 S5). Given target and source
  * frames sharing the target's column set, produces the post-merge frame with
  * Delta-MERGE clause semantics (update-set-* / matched-delete / insert-*,
  * each optionally conditioned — reference MERGE statements:
  * mls_listings_curated.py:329-353, mls_listings_hist_curated.py:184-210,
  * mls_listings_curated_propid_backfill.py:187-219).
  *
  * One full-outer shuffle join on the key + one projected select; entirely
  * whole-stage-codegen. At 100 TB the join shuffles both sides on the key —
  * with a bucketed target layout the target-side shuffle disappears (the
  * managed-table layer documents that refinement).
  */
object Merge {

  def mergeFrames(target: DataFrame, source: DataFrame, keys: Seq[String],
                  clauses: MergeClauses.Spec = MergeClauses.Spec()): DataFrame = {
    val cols = target.columns.toIndexedSeq
    val t = target.withColumn("__t_present", lit(true)).alias("t")
    // Delta MERGE errors when multiple source rows match one target row;
    // the full-outer-join formulation would instead silently fan the target
    // row out. Enforce the same contract: a per-key count window (the
    // source is about to be shuffled on these keys for the join anyway)
    // plus assert_true fails the job on the first duplicate key. The assert
    // is folded into the kept __s_present column — a standalone dropped
    // column would be pruned away by the optimizer, check and all.
    val keyCount = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*))
    val s = source.select(cols.map(col): _*)
      .withColumn("__key_n", keyCount)
      .withColumn("__s_present", coalesce(
        assert_true(col("__key_n") <= 1,
          lit(s"MERGE source has duplicate rows for key (${keys.mkString(", ")})"))
          .cast("boolean"),
        lit(true)))
      .drop("__key_n").alias("s")
    val keyCond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, keyCond, "full_outer")

    val tPresent = col("t.__t_present").isNotNull
    val sPresent = col("s.__s_present").isNotNull
    val matched = tPresent && sPresent
    val doUpdate = matched && clauses.updateWhen.getOrElse(lit(true))
    val doDelete = matched && !doUpdate && clauses.deleteWhen.getOrElse(lit(false))
    val doInsert = (sPresent && !tPresent) && clauses.insertWhen.getOrElse(lit(true))
    val keepRow = doUpdate || doInsert || (tPresent && !doDelete && !doUpdate)
    val takeSource = doUpdate || doInsert

    joined.filter(keepRow).select(
      cols.map(c => when(takeSource, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)): _*)
  }
}
