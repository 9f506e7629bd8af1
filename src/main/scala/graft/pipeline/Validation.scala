package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Rule-driven validation with reject quarantine — the reference's
  * validate_listings flag machinery (mls_listings_transform.py:92-128):
  * each rule contributes a 0/1 flag; `_reject_flags` is the horizontal sum;
  * `_reject_reasons` concatenates the firing rules' reasons '|'-separated
  * IN RULE ORDER (the reference relies on Python dict insertion order —
  * preserved here by taking rules as an ordered Seq).
  */
object Validation {

  /** One validation rule: row is flagged when `failWhen` is true. */
  final case class Rule(name: String, reason: String, failWhen: Column)

  final case class Split(good: DataFrame, rejected: DataFrame)

  /** Apply rules, split good/rejected (P8 — transform.py:127-128).
    * Null `failWhen` results count as not-failed (three-valued logic
    * collapsed, matching check_valid_value's never-null contract). */
  def validate(df: DataFrame, rules: Seq[Rule]): Split = {
    if (rules.isEmpty) {
      return Split(good = df, rejected = df.limit(0)
        .withColumn("_reject_flags", lit(0))
        .withColumn("_reject_reasons", lit("")))
    }
    val flagged = rules.foldLeft(df) { (acc, r) =>
      acc.withColumn(s"_flag_${r.name}",
        coalesce(r.failWhen, lit(false)).cast(IntegerType))
    }
      .withColumn("_reject_flags",
        rules.map(r => col(s"_flag_${r.name}")).reduce(_ + _))
      .withColumn("_reject_reasons", concat_ws("|",
        rules.map(r => when(col(s"_flag_${r.name}") === 1, r.reason)): _*))
    val flagCols = rules.map(r => s"_flag_${r.name}")
    Split(
      good = flagged.filter(col("_reject_flags") === 0)
        .drop("_reject_flags" +: "_reject_reasons" +: flagCols: _*),
      rejected = flagged.filter(col("_reject_flags") > 0)
        .drop(flagCols: _*))
  }
}
