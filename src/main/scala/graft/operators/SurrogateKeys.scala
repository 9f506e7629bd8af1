package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stable surrogate-key assignment — the engine-side equivalent of the
  * reference's SQL Server identity reconciliation (SURVEY §2.1 S12:
  * update_final_tables_sqlserver.sql:164-201 recovers each (MLS,
  * MLSListingID)'s ListingID via joins and assigns fresh identities to new
  * keys). Existing mappings are preserved verbatim; new natural keys get
  * max(existing) + their 1-based rank in natural-key order.
  *
  * Scale shape: the rank is computed WITHOUT a global single-partition
  * window. New keys are range-sorted across the cluster and indexed with
  * the two-pass zipWithIndex scheme (pass 1 counts rows per partition to
  * build offsets, pass 2 adds offset + local position) — fully parallel,
  * and deterministic because the sort order is total (keys are distinct),
  * so the assigned ids are independent of where partition boundaries fall.
  */
object SurrogateKeys {

  /** Returns the updated mapping table (naturalKeys..., surrogateCol). */
  def assign(spark: SparkSession, mapping: DataFrame, incoming: DataFrame,
             naturalKeys: Seq[String], surrogateCol: String): DataFrame = {
    val newKeys = incoming.select(naturalKeys.map(col): _*).distinct()
      .join(mapping, naturalKeys, "left_anti")
    val base = mapping.agg(coalesce(max(col(surrogateCol)), lit(0L)).as("m"))
    // Nulls pinned LAST explicitly: Spark's default asc is NULLS FIRST
    // while the DuckDB oracle's row_number ORDER BY defaults to NULLS
    // LAST — a null natural key would otherwise get divergent surrogate
    // ids across engines.
    val sorted = newKeys.sort(naturalKeys.map(k => col(k).asc_nulls_last): _*)
    val schema = sorted.schema.add("_rn", LongType, nullable = false)
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
    val assigned = indexed
      .crossJoin(broadcast(base))
      .withColumn(surrogateCol, col("m") + col("_rn"))
      .drop("_rn", "m")
    mapping.unionByName(assigned.select(mapping.columns.map(col).toIndexedSeq: _*))
  }
}
