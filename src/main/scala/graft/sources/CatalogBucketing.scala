package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TableIO.table

/** Native Spark catalog bucketing — the co-located-join layout for tables
  * that are JOINED repeatedly on the same key (the manual key-hash layout
  * in [[BucketedTable]] solves the delta-MERGE problem; this one solves
  * repeated join shuffles). Both sides written with `bucketBy(n, key)` +
  * `sortBy(key)` join with NO exchange and NO sort: each task zips bucket
  * i of both tables, so a 100 TB fact ⋈ 100 TB fact join moves zero
  * bytes over the network — the shuffle was paid once at write time and
  * amortizes over every subsequent join, the defining trade of a
  * warehouse layout. Bucket counts must match (or divide) across tables;
  * size buckets so one bucket of the bigger table fits a task's memory.
  * (The per-bucket in-task sort remains by default — Spark ≥ 3.0 only
  * reports bucket sort order under the legacy
  * `bucketedTableScan.outputOrdering` conf, valid when every bucket is a
  * single file, which [[writeBucketed]]'s pre-write repartition
  * guarantees.)
  */
object CatalogBucketing {

  /** Scratch layout + table names are PER-PROCESS (pid-suffixed) and the
    * gate writes are memoized per source dir: two concurrent JVMs (bench +
    * sbt test) previously shared one tmpdir path and could Overwrite each
    * other's files mid-read, and every timed bench pass re-paid the write.
    * With the suffix + memo, the write-side shuffle is paid once per
    * process (the warehouse-layout amortization this operator exists to
    * demonstrate) and the timed passes measure the exchange-free join.
    *
    * The catalog-table memo is additionally keyed on the applicationId and
    * double-checked against `catalog.tableExists`: catalog entries die with
    * the SparkContext, so a process-global memo alone would skip the write
    * after a context restart and leave `s.table(...)` resolving nothing.
    * Parquet scratch (partitionedScan) instead lands under a per-DIR
    * subpath, so a different source dir writes a different path and frames
    * returned earlier never have files swapped underneath them. All scratch
    * roots are reaped by a JVM shutdown hook — repeated bench/test runs do
    * not accumulate per-pid corpus copies. */
  private val pid = ProcessHandle.current().pid()
  private def scratch(kind: String): String = new java.io.File(
    System.getProperty("java.io.tmpdir"), s"graft_${kind}_$pid").getAbsolutePath
  // (kind, qualifier) -> source dir currently materialized
  private val written = scala.collection.mutable.Map[(String, String), String]()
  private val createdRoots = scala.collection.mutable.Set[String]()
  private lazy val reaperInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      createdRoots.synchronized(createdRoots.foreach(r =>
        ScratchDirs.deleteRecursively(java.nio.file.Paths.get(r))))))
  private def cleanupAtExit(root: String): Unit = {
    reaperInstalled
    createdRoots.synchronized { createdRoots += root }
  }

  private[sources] def docsTable = s"graft_bkt_docs_$pid"
  private[sources] def embTable = s"graft_bkt_emb_$pid"

  /** Write `df` as a bucketed+sorted catalog table at `path`. The
    * pre-write repartition on the bucket key gives ONE file per bucket
    * (bucketBy alone writes tasks × buckets files — a small-file
    * explosion AND it forces a sort back into later joins, since sorted
    * reads only hold within a single file per bucket). */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    nBuckets: Int, key: String): Unit =
    df.repartition(nBuckets, col(key))
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)

  /** q_bucketed_join: documents and embeddings land as 8-bucket tables on
    * the shared id, then join bucket-to-bucket — the plan has no exchange
    * and no sort on the join (pinned by PlanShapeSpec); only the final
    * per-label rollup shuffles. The oracle replays the join from the raw
    * parquet — bucketing must be invisible to results. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    written.synchronized {
      val key = ("bkt", s.sparkContext.applicationId)
      val live = s.catalog.tableExists(docsTable) && s.catalog.tableExists(embTable)
      if (!written.get(key).contains(dir) || !live) {
        val wh = scratch("bucketed")
        cleanupAtExit(wh)
        writeBucketed(
          table(s, dir, "documents").select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
          docsTable, s"$wh/docs", nBuckets = 8, key = "doc_id")
        writeBucketed(
          table(s, dir, "embeddings").select(col("vec_id").as("doc_id"), col("label")),
          embTable, s"$wh/emb", nBuckets = 8, key = "doc_id")
        written(key) = dir
      }
      // Frame built INSIDE the lock: a concurrent call for a different
      // source dir re-Overwrites the catalog tables, and a plan resolved
      // against the old files would read swapped-out data. Plan
      // construction is driver-cheap; execution happens later against
      // whatever snapshot the caller then holds.
      joinOnly(s)
    }
  }

  /** The join alone (tables must already exist) — used by the plan-shape
    * pin so the write isn't re-measured. */
  def joinOnly(s: SparkSession): DataFrame =
    s.table(docsTable).join(s.table(embTable), "doc_id")
      .groupBy(col("label"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))

  /** q_partitioned_scan: Hive-style `partitionBy` layout + partition
    * pruning — the directory-level complement of row-group pruning. The
    * corpus lands partitioned by language; a language-filtered read then
    * LISTS only that partition's directory (the filter resolves against
    * partition values in the driver — `PartitionFilters` in the scan, no
    * data files of other partitions are even opened). At 100 TB with
    * date+source partitions this is the difference between touching a
    * day's directory and listing the lake. The aggregate result is
    * layout-invariant — the oracle reads the raw parquet. */
  def partitionedScan(s: SparkSession, dir: String): DataFrame = {
    // Per-dir subpath: a new source dir writes somewhere NEW, so frames
    // returned for an earlier dir keep reading intact files.
    val tag = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir))
    val root = s"${scratch("partitioned")}/$tag"
    written.synchronized {
      if (!written.get(("part", dir)).contains(dir)) {
        cleanupAtExit(scratch("partitioned"))
        table(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
          .write.mode(SaveMode.Overwrite).partitionBy("lang").parquet(root)
        written(("part", dir)) = dir
      }
    }
    s.read.parquet(root)
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bucketed_join" -> (bucketedJoin _),
    "q_partitioned_scan" -> (partitionedScan _))

  val oracles: Map[String, String] = Map(
    "q_partitioned_scan" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY source""".stripMargin,
    "q_bucketed_join" ->
      """SELECT e.label, d.lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY e.label, d.lang""".stripMargin)
}
