package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stable surrogate-key assignment — the engine-side equivalent of the
  * reference's SQL Server identity reconciliation (SURVEY §2.1 S12:
  * update_final_tables_sqlserver.sql:164-201 recovers each (MLS,
  * MLSListingID)'s ListingID via joins and assigns fresh identities to new
  * keys). Here: existing mappings are preserved verbatim; new natural keys
  * get max(existing)+dense row_number.
  *
  * Scale note: the global row_number over new keys is a single-partition
  * window — correct but serial at the tail. At 100 TB-scale key churn the
  * production variant salts: ids = max + zipWithIndex-style (partition
  * offsets via a two-pass count), same determinism, full parallelism. New-
  * key batches are typically tiny relative to the mapping table, so the
  * single-partition tail is usually irrelevant.
  */
object SurrogateKeys {

  /** Returns the updated mapping table (naturalKeys..., surrogateCol). */
  def assign(spark: SparkSession, mapping: DataFrame, incoming: DataFrame,
             naturalKeys: Seq[String], surrogateCol: String): DataFrame = {
    val newKeys = incoming.select(naturalKeys.map(col): _*).distinct()
      .join(mapping, naturalKeys, "left_anti")
    val base = mapping.agg(coalesce(max(col(surrogateCol)), lit(0L)).as("m"))
    val w = Window.orderBy(naturalKeys.map(col): _*)
    val assigned = newKeys
      .withColumn("_rn", row_number().over(w).cast("long"))
      .crossJoin(broadcast(base))
      .withColumn(surrogateCol, col("m") + col("_rn"))
      .drop("_rn", "m")
    mapping.unionByName(assigned.select(mapping.columns.map(col).toIndexedSeq: _*))
  }
}
