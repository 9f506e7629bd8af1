package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for 100 TB-scale shuffles (SURVEY §7's scale
  * design: "salted windows instead of global orderBy().limit()").
  *
  * Spark's own mitigations cover most cases — AQE skew-join splitting,
  * partial aggregation, TakeOrderedAndProject (per-partition top-k then a
  * single k-row merge, so a global orderBy().limit() never materializes a
  * full sort). These helpers cover the remaining hot-key patterns where a
  * single reduce key would still swamp one task.
  */
object Salting {

  /** Two-phase salted aggregation: spread each hot key over `salt`
    * sub-keys for the partial phase, then combine the partials — turning
    * one task processing a hot key's N rows into `salt` tasks of N/salt.
    * `partials` computes per-(key, salt) partial aggregates; `combine`
    * merges partials per key. Works for any algebraic aggregate. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int)
               (partials: Seq[Column], combine: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(salt)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)

  /** Distributed per-key top-k that never funnels a hot key through one
    * task: phase 1 ranks within (key, input-partition) sub-groups — the
    * exchange spreads a hot key across all its input partitions' sub-keys,
    * each sorting a small slice — and keeps k rows per sub-group; phase 2
    * ranks the pruned set (≤ k·partitions rows per key) on the real key.
    * `ordering` must be a total order (include a unique tiebreak). */
  def topKPerKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column],
                 k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val local = Window.partitionBy((keys.map(col) :+ spark_partition_id()): _*)
      .orderBy(ordering: _*)
    val pruned = df.withColumn("_lrn", row_number().over(local))
      .filter(col("_lrn") <= k).drop("_lrn")
    val global = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    pruned.withColumn("_rn", row_number().over(global))
      .filter(col("_rn") <= k).drop("_rn")
  }
}
