package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** External-table DDL surface (SURVEY §2.1 S10) — the engine-side
  * equivalent of the reference's Hive DDL (ddl/listings.sql:1-131:
  * `CREATE EXTERNAL TABLE mls.listings (...133 cols...) STORED AS ORC
  * LOCATION ... TBLPROPERTIES ("orc.compress"="ZLIB")`).
  *
  * Spark-first mapping: `CREATE TABLE ... USING ORC ... LOCATION` — a
  * location-backed (unmanaged/external) table in the session catalog; DROP
  * leaves the data files in place, exactly like Hive EXTERNAL. Column DDL
  * is GENERATED from the `StructType`, so the catalog surface can never
  * drift from the schema the pipeline writes — reserved-word columns
  * (`state`, `section`, `range`) are backtick-quoted the way the
  * reference's DDL quotes them.
  */
object ExternalDdl {

  /** `name type` lines for every field, reserved-safe. */
  def columnDdl(schema: StructType): String =
    schema.fields.map(f => s"  `${f.name}` ${f.dataType.sql}").mkString(",\n")

  /** Single quotes doubled so a path like /data/o'brien or an apostrophe
    * in a comment cannot break the generated statement. */
  private def q(s: String): String = s.replace("'", "''")

  def createExternalOrc(table: String, schema: StructType, location: String,
                        comment: String = ""): String = {
    val commentClause = if (comment.nonEmpty) s"\nCOMMENT '${q(comment)}'" else ""
    s"""CREATE TABLE IF NOT EXISTS $table (
       |${columnDdl(schema)}
       |)
       |USING ORC
       |OPTIONS (compression 'zlib')$commentClause
       |LOCATION '${q(location)}'""".stripMargin
  }

  /** Drop-and-recreate the external table over `location` (the reference's
    * `DROP TABLE IF EXISTS` + `CREATE EXTERNAL TABLE` pair). Data at the
    * location survives the drop — that is the point of EXTERNAL. */
  def register(spark: SparkSession, table: String, schema: StructType,
               location: String, comment: String = ""): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(createExternalOrc(table, schema, location, comment))
  }
}
