package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** JDBC export leg (SURVEY §2.1 S11) — the engine-side replacement for the
  * reference's sqoop push to the serving database
  * (sqoop/sqoop_listings.sh:1-13: TRUNCATE the staging table via `sqoop
  * eval`, then `sqoop export` with an explicit column list, `-m 2`
  * parallelism, and `--validate` row-count checking).
  *
  * Spark-first mapping:
  *  - TRUNCATE + load  → SaveMode.Overwrite with the `truncate` option, so
  *    the existing table (indexes, grants, types) is kept and only its rows
  *    are replaced — exactly `sqoop eval TRUNCATE` + export-append;
  *  - `--columns ...`  → an explicit projection before the write;
  *  - `-m N`           → `numPartitions`: each partition opens one JDBC
  *    connection and batches inserts, so N bounds the write parallelism
  *    AND the connection load on the serving DB (at scale the DB, not
  *    Spark, is the bottleneck — keep N small like the reference's 2);
  *  - `--validate`     → a read-back COUNT(*) compared to the exported
  *    row count, failing loudly on mismatch.
  */
object JdbcExport {

  final case class Config(
      url: String,
      table: String,
      columns: Seq[String] = Nil,            // empty = all columns
      numPartitions: Int = 2,
      truncate: Boolean = true,
      validate: Boolean = true,
      options: Map[String, String] = Map.empty) // e.g. driver, user, password

  /** Export `df` into the serving table; returns the exported row count.
    * Throws IllegalStateException when validation finds a count mismatch. */
  def export(df: DataFrame, cfg: Config): Long = {
    val projected =
      if (cfg.columns.nonEmpty) df.select(cfg.columns.map(col): _*) else df
    // ONE source materialization: the row count is observed inside the same
    // job that writes (Dataset.observe rides the write's execution — no
    // second scan, and for a non-deterministic source the validated count
    // is the count of what was actually exported, not of a replay).
    val obs = org.apache.spark.sql.Observation(s"jdbc_export_${cfg.table}")
    val toWrite = projected.coalesce(cfg.numPartitions)
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    toWrite.write
      .format("jdbc")
      .mode(SaveMode.Overwrite)
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("truncate", cfg.truncate.toString)
      .options(cfg.options)
      .save()
    val written = obs.get("rows").asInstanceOf[Long]
    if (cfg.validate) {
      val reader = df.sparkSession.read.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .options(cfg.options)
      val landed = reader.load().count()
      if (landed != written)
        throw new IllegalStateException(
          s"JDBC export validation failed for ${cfg.table}: wrote $written rows, " +
            s"serving table has $landed")
    }
    written
  }
}
