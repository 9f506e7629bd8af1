package graft.operators

import java.nio.file.Paths
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.LatestWins
import graft.sources.{BucketedTable, ManagedTable, MergeClauses}
import graft.sources.TableIO.table

/** Oracle-checked gate queries for the table LIFECYCLE surface — the
  * reference's Delta init / MERGE / VACUUM / read-back loop (SURVEY §2.1
  * S3-S6) and the hist job's three-way MERGE (update-when-changed /
  * delete-when-no-driving-change / insert-when-changed,
  * mls_listings_hist_curated.py:184-210). These were previously covered
  * only by ScalaTest; here each runs the real side-effectful cycle against
  * a scratch table root and returns the final table state, which DuckDB
  * recomputes relationally from the same input parquet.
  */
object LifecycleQueries {

  private def freshRoot(name: String): String =
    graft.sources.ScratchDirs.fresh(name)

  /** Hist-job three-way MERGE over a change-log of per-(customer, date)
    * order activity: the target is the log derived from data through 1996,
    * the source re-derives it through 1997 with `lead()`+`<=>` change
    * flags (LatestWins.changeFlags); the MERGE updates changed snapshots,
    * DELETEs no-change snapshots, and inserts new changed ones — the exact
    * clause set of mls_listings_hist_curated.py:184-210. */
  def mergeThreeway(s: SparkSession, dir: String): DataFrame = {
    val hist = table(s, dir, "orders")
      .groupBy(col("o_custkey").as("cust"),
        col("o_orderdate").cast(StringType).as("dt"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
    def shaped(df: DataFrame): DataFrame =
      LatestWins.changeFlags(df, Seq("cust"), Seq(col("dt").desc), Seq("n_orders"))
    val target = shaped(hist.filter(col("dt") <= lit("1996-12-31")))
    val source = shaped(hist)
    Merge.mergeFrames(target, source, Seq("cust", "dt"),
      MergeClauses.Spec(
        updateWhen = Some(col("s._insert_update_flag")),
        deleteWhen = Some(!col("s._insert_update_flag")),
        insertWhen = Some(col("s._insert_update_flag"))))
      .select(col("cust"), col("dt"), col("n_orders"), col("total"),
        col("n_orders_old"), col("n_orders_changed_flag"),
        col("_insert_update_flag").as("iu_flag"))
  }

  /** ManagedTable lifecycle (S3/S4/S6): init an empty versioned table,
    * MERGE the ≤1995 per-customer latest-order state, MERGE the ≤1996
    * state with update-when-newer / delete-when-stale clauses, VACUUM old
    * versions, and read the live snapshot back. */
  def lifecycleTable(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("lifecycle")
    def custState(upTo: String): DataFrame =
      table(s, dir, "orders")
        .filter(col("o_orderdate") <= lit(upTo))
        .groupBy(col("o_custkey").as("cust"))
        .agg(max(col("o_orderdate")).cast(StringType).as("last_dt"),
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
    val b95 = custState("1995-12-31")
    ManagedTable.createEmpty(s, root, b95)
    ManagedTable.merge(s, root, b95, Seq("cust"))
    ManagedTable.merge(s, root, custState("1996-12-31"), Seq("cust"),
      MergeClauses.Spec(
        updateWhen = Some(col("s.last_dt") > col("t.last_dt")),
        deleteWhen = Some(lit(true))))
    ManagedTable.vacuum(root, keep = 1)
    ManagedTable.read(s, root)
  }

  /** BucketedTable delta-proportional MERGE: create from the ≤1995 order
    * slice (16 key-hash buckets), merge a 1995H2-1996H1 delta that updates
    * non-'F' matches, DELETEs matched 'F' rows, and inserts the 1996H1
    * keys — then read back through the manifest. The final state must be
    * byte-equal to the same merge computed relationally by DuckDB. */
  def bucketedMerge(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("bucketed")
    def shaped(f: org.apache.spark.sql.Column, tag: String): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"), lit(tag).as("tag"))
    val base = shaped(col("o_orderdate") <= lit("1995-12-31"), "base")
    val delta = shaped(col("o_orderdate").between(lit("1995-07-01"),
      lit("1996-06-30")), "delta")
    BucketedTable.create(root, base, Seq("k"), nBuckets = 16)
    BucketedTable.merge(s, root, delta,
      MergeClauses.Spec(
        updateWhen = Some(col("s.st") =!= lit("F")),
        deleteWhen = Some(lit(true))))
    BucketedTable.read(s, root)
  }

  /** Full bucketed-table LIFECYCLE (the 100 TB path): create a 16-bucket
    * versioned table from the ≤1995 order slice, chain TWO delta-proportional
    * merges (an unconditional upsert, then a conditional update/DELETE —
    * each rewriting only the buckets its delta touches), VACUUM down to the
    * live manifest, and read back through it. Reading AFTER vacuum proves
    * retention is manifest-reachability, not version age. The windows sit
    * inside the testdata's 1995-01-01..2001-08-01 date range, so the base
    * is populated and both merges hit genuine matched rows. Reference
    * cycle: mls_listings_curated.py:329-353 (MERGE) + :366-368 (vacuum). */
  def lifecycleBucketed(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("lifecycle_bucketed")
    def shaped(f: org.apache.spark.sql.Column, tag: String): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"), lit(tag).as("tag"))
    val base = shaped(col("o_orderdate") <= lit("1995-12-31"), "base")
    val d1 = shaped(col("o_orderdate").between(lit("1995-07-01"),
      lit("1996-06-30")), "d1")
    val d2 = shaped(col("o_orderdate").between(lit("1996-01-01"),
      lit("1996-12-31")), "d2")
    BucketedTable.create(root, base, Seq("k"), nBuckets = 16)
    BucketedTable.merge(s, root, d1)
    BucketedTable.merge(s, root, d2,
      MergeClauses.Spec(
        updateWhen = Some(col("s.st") =!= lit("F")),
        deleteWhen = Some(lit(true))))
    BucketedTable.vacuum(root, keep = 1)
    BucketedTable.read(s, root)
  }

  /** Shared fixture for the bucketed time-travel and compaction gates:
    * the lifecycleBucketed cycle's first half — create from the ≤1995
    * slice (populated: testdata dates start 1995-01-01), one
    * unconditional upsert of the 1995H2-1996H1 delta. */
  private def bucketedHistory(s: SparkSession, dir: String,
                              createPartitions: Int): String = {
    val root = freshRoot("bucketed_hist")
    def shaped(f: org.apache.spark.sql.Column, tag: String): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"), lit(tag).as("tag"))
    val base = shaped(col("o_orderdate") <= lit("1995-12-31"), "base")
    val d1 = shaped(col("o_orderdate").between(lit("1995-07-01"),
      lit("1996-06-30")), "d1")
    BucketedTable.create(root, base.repartition(createPartitions),
      Seq("k"), nBuckets = 16)
    BucketedTable.merge(s, root, d1)                                  // v1
    root
  }

  /** Bucketed time-travel gate (Delta `versionAsOf` on the manifest
    * layout): after the v1 merge AND a further conditional v2 merge, the
    * gate reads v1 through its HISTORICAL manifest — untouched buckets
    * resolve into v0 by reference, touched ones into v1 — proving a
    * pinned manifest still addresses exactly the files live at publish
    * time. DuckDB recomputes the post-v1 state. */
  def bucketedTimetravel(s: SparkSession, dir: String): DataFrame = {
    val root = bucketedHistory(s, dir, createPartitions = 4)
    def shaped(f: org.apache.spark.sql.Column, tag: String): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"), lit(tag).as("tag"))
    BucketedTable.merge(s, root,
      shaped(col("o_orderdate").between(lit("1996-01-01"),
        lit("1996-12-31")), "d2"),
      MergeClauses.Spec(
        updateWhen = Some(col("s.st") =!= lit("F")),
        deleteWhen = Some(lit(true))))                                // v2
    BucketedTable.readVersion(s, root, 1)
  }

  /** Bucketed OPTIMIZE gate: the table is created deliberately
    * fragmented (48-way write → dozens of files per bucket), merged, then
    * compacted to one file per fragmented bucket and vacuumed down to the
    * live manifest. The hash gate pins that the layout-only rewrite
    * preserves content exactly through the manifest indirection; the
    * partial-rewrite property (healthy buckets carried by reference) is
    * asserted in BucketedTableSpec where the filesystem is visible. */
  def bucketedOptimize(s: SparkSession, dir: String): DataFrame = {
    val root = bucketedHistory(s, dir, createPartitions = 48)
    BucketedTable.compact(s, root, maxFilesPerBucket = 2)
    BucketedTable.vacuum(root, keep = 1)
    BucketedTable.read(s, root)
  }

  /** Surrogate-key reconciliation (S12): existing (name → id) mappings are
    * preserved verbatim; new natural keys get max(existing) + their rank in
    * natural-key order — computed with the parallel sort+zipWithIndex path,
    * and checked here against DuckDB's row_number over the same sort. */
  def surrogateKeys(s: SparkSession, dir: String): DataFrame = {
    val cust = table(s, dir, "customer")
    val mapping = cust.filter(col("c_custkey") % 2 === 0)
      .select(col("c_name").as("nat_key"),
        col("c_custkey").cast("long").as("sk"))
    val incoming = cust.filter(col("c_custkey") % 3 === 0)
      .select(col("c_name").as("nat_key"))
    SurrogateKeys.assign(s, mapping, incoming, Seq("nat_key"), "sk")
  }

  /** ORC-zlib mirror sink (S7): write the frame as the reference's
    * serving mirror, read it back through the ORC reader — the gate checks
    * the round trip is lossless against the relational definition. */
  def orcMirror(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("orc_mirror")
    val df = table(s, dir, "orders").select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      col("o_totalprice").cast("double").as("total"),
      col("o_orderdate").cast("string").as("dt"))
    graft.sources.TableIO.writeOrcZlib(df, root, numFiles = 8)
    s.read.orc(root)
  }

  /** CSV round-trip (source-format breadth, sibling of the S7 ORC mirror
    * and S8 JSON-lines sink): write a projection as headered CSV — with a
    * deliberately hostile synthesized column (embedded comma + double
    * quote) so the writer's quote/escape path and the reader's unescape
    * path are both on the line — then read it back with an explicit
    * schema (no inference: at 100 TB schema inference is a full extra
    * pass). Doubles survive exactly: the writer emits Java's shortest
    * round-trip decimal form. The oracle recomputes the projection
    * relationally from the original parquet, so any quoting/typing loss
    * hash-fails. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("csv_rt")
    val df = table(s, dir, "customer").select(
      col("c_custkey").as("k"), col("c_name").as("name"),
      concat(col("c_mktsegment"), lit(", \"segment\"")).as("hostile"),
      col("c_acctbal").as("bal"), col("c_nationkey").as("nk"))
    df.repartition(2).write.mode("overwrite")
      .option("header", "true").csv(s"$root/csv")
    s.read.schema(df.schema).option("header", "true").csv(s"$root/csv")
  }

  /** External ORC table gate (S10): write the serving mirror, register a
    * location-backed external table over it with GENERATED DDL
    * (ExternalDdl ↔ ddl/listings.sql:1-131), and read back THROUGH THE
    * CATALOG — the oracle checks the whole DDL+catalog round trip is
    * lossless against the relational definition. */
  def externalTable(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("ext_table")
    val df = table(s, dir, "orders").select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      col("o_totalprice").cast("double").as("total"),
      col("o_orderdate").cast("string").as("dt"))
    graft.sources.TableIO.writeOrcZlib(df, root, numFiles = 4)
    graft.sources.ExternalDdl.register(s, "graft_gate_ext",
      df.schema, root, comment = "gate's external ORC mirror")
    s.table("graft_gate_ext")
  }

  /** JDBC serving-export gate (S11): export the nation projection into
    * embedded Derby (truncate-reload + observed-count validation — the
    * full sqoop-replacement path), then read it BACK through the JDBC
    * source; the oracle checks the export+read round trip is lossless
    * against the relational definition. Derby uppercases unquoted
    * identifiers, so the read-back re-aliases to the engine's lowercase
    * names. Idempotent across bench repeats by construction
    * (truncate-reload). */
  def jdbcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val url = "jdbc:derby:memory:graft_gate_jdbc;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val df = table(s, dir, "nation").select(
      col("n_nationkey").cast("long").as("k"),
      col("n_name").as("name"),
      col("n_regionkey").cast("long").as("rk"))
    graft.sources.JdbcExport.export(df, graft.sources.JdbcExport.Config(
      url, "NATION_SQOOP", numPartitions = 2, options = opts))
    val back = s.read.format("jdbc")
      .option("url", url).option("dbtable", "NATION_SQOOP")
      .options(opts).load()
    back.select(back.columns.map(c => col(c).as(c.toLowerCase)).toIndexedSeq: _*)
  }

  /** Hist-grain latest-wins (W2): `dedupeAll` keeps the per-key winner
    * across new ∪ curated regardless of provenance, with 'new' winning
    * exact ties — observable here via a side tag on overlapping windows. */
  def histGrain(s: SparkSession, dir: String): DataFrame = {
    def slice(lo: String, hi: String, tag: String): DataFrame =
      table(s, dir, "orders")
        .filter(col("o_orderdate").between(lit(lo), lit(hi)))
        .select(col("o_custkey").as("cust"),
          col("o_orderdate").cast("string").as("dt"),
          col("o_orderkey").as("k"), lit(tag).as("side"))
    val fresh = slice("1995-07-01", "1996-06-30", "f")
    val curated = slice("1995-01-01", "1995-12-31", "c")
    LatestWins.dedupeAll(fresh, curated, Seq("cust", "dt"), Seq(col("k").desc))
  }

  /** OPTIMIZE gate: fragment a lineitem projection into 64 small files
    * (the end state of a merge-heavy table), OPTIMIZE with z-order on
    * (part, supp), VACUUM the fragmented version away, and read the
    * compacted snapshot back. The hash gate pins CONTENT preservation —
    * the one property a layout rewrite must never break; the layout
    * properties themselves (file count hits the bin-packing target,
    * per-file z-ranges pairwise disjoint) are asserted in
    * ManagedTableSpec, where file-system shape is visible. */
  def tableOptimize(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("optimize")
    val li = table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-12-31"))
      .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"),
        col("l_partkey").as("part"), col("l_suppkey").as("supp"),
        col("l_quantity").cast(DoubleType).as("qty"),
        col("l_extendedprice").cast(DoubleType).as("price"))
    ManagedTable.overwrite(root, li.repartition(64))
    ManagedTable.optimize(s, root, targetFileBytes = 8L << 20,
      zorderBy = Seq("part", "supp"))
    ManagedTable.vacuum(root, keep = 1)
    ManagedTable.read(s, root)
  }

  /** Data-skipping gate: fragment a lineitem projection, OPTIMIZE with
    * z-order on (part, supp), ANALYZE the layout columns into the
    * per-file min/max manifest, then answer a two-sided range predicate
    * through `readWhere` — which opens only files whose manifest span
    * intersects both ranges. The hash gate pins that skipping loses no
    * row and admits no extra row (DuckDB recomputes the predicate over
    * the full table); the file-count reduction itself is asserted in
    * ManagedTableSpec where the scan's inputFiles are visible. */
  def tableSkipping(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("skipping")
    val li = table(s, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"),
        col("l_partkey").as("part"), col("l_suppkey").as("supp"),
        col("l_quantity").cast(DoubleType).as("qty"))
    ManagedTable.overwrite(root, li.repartition(64))
    // optimize auto-records the manifest for its numeric layout columns
    ManagedTable.optimize(s, root, targetFileBytes = 256L << 10,
      zorderBy = Seq("part", "supp"))
    ManagedTable.readWhere(s, root,
      Seq(("part", 10, 120), ("supp", 1, 50)))
  }

  /** String data-skipping gate: the reference's hottest filter is a string
    * `load_date BETWEEN 'a' AND 'b'` (mls_listings_curated.py:73) — ISO
    * dates, where lexicographic order IS chronological order. OPTIMIZE
    * z-orders the fragmented table on the string date (via the monotone
    * byte-prefix surrogate) + the price, auto-records lexicographic
    * min/max into the manifest, and [[ManagedTable.readWhere]] answers the
    * range with file-level pruning. The hash gate pins skipping
    * loses/admits no row vs DuckDB's full-table recompute. */
  def tableSkippingStr(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("skipping_str")
    val o = table(s, dir, "orders")
      .select(col("o_orderkey").as("k"),
        col("o_orderdate").cast(DateType).cast(StringType).as("odate"),
        col("o_totalprice").cast(DoubleType).as("price"))
    ManagedTable.overwrite(root, o.repartition(32))
    ManagedTable.optimize(s, root, targetFileBytes = 256L << 10,
      zorderBy = Seq("odate", "price"))
    ManagedTable.readWhere(s, root,
      Seq(("odate", "1995-01-01", "1995-12-31")))
  }

  /** Shared lifecycle for the time-travel and CDF gates: empty init,
    * v1 = upsert of the ≤1995 per-customer state, v2 = conditional
    * update/delete merge of the ≤1996 state — the same cycle as
    * q_lifecycle_table but WITHOUT the vacuum, so history survives. */
  private[graft] def twoMergeHistory(s: SparkSession, dir: String,
                                     changeFeed: Boolean): String =
    twoMergeHistoryAt(s, dir, changeFeed, freshRoot("history"))

  /** The feed-recording history is a deterministic SOURCE fixture consumed
    * read-only by three gates (q_table_cdf and both CDC replica gates) and
    * by every bench pass of each — memoized per sf dir so the gates time
    * their operator (CDF read / feed apply), not repeated fixture
    * synthesis. The time-travel gates keep the non-memoized path: one
    * injects a commit clock during construction. */
  private[graft] def feedHistoryShared(s: SparkSession, dir: String): String =
    graft.sources.ScratchDirs.memoized("history_feed", dir)(
      twoMergeHistoryAt(s, dir, changeFeed = true, _))

  private def twoMergeHistoryAt(s: SparkSession, dir: String,
                                changeFeed: Boolean, root: String): String = {
    def custState(upTo: String): DataFrame =
      table(s, dir, "orders")
        .filter(col("o_orderdate") <= lit(upTo))
        .groupBy(col("o_custkey").as("cust"))
        .agg(max(col("o_orderdate")).cast(StringType).as("last_dt"),
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
    val b95 = custState("1995-12-31")
    ManagedTable.createEmpty(s, root, b95)                       // v0
    ManagedTable.merge(s, root, b95, Seq("cust"),
      changeFeed = changeFeed)                                   // v1
    ManagedTable.merge(s, root, custState("1996-12-31"), Seq("cust"),
      MergeClauses.Spec(
        updateWhen = Some(col("s.last_dt") > col("t.last_dt")),
        deleteWhen = Some(lit(true))),
      changeFeed = changeFeed)                                   // v2
    root
  }

  /** Time-travel gate (Delta `versionAsOf`): after both merges the live
    * pointer is v2, but the gate returns v1 — the ≤1995 state — proving
    * a pinned read really resolves the historical snapshot, not the
    * pointer. DuckDB recomputes the ≤1995 state from orders. */
  def tableTimetravel(s: SparkSession, dir: String): DataFrame = {
    val root = twoMergeHistory(s, dir, changeFeed = false)
    ManagedTable.readVersion(s, root, 1)
  }

  /** Timestamp time-travel gate (Delta `timestampAsOf`): the same
    * two-merge history committed under an injected LOGICAL clock
    * (1000, 2000, 3000 ms — wall time is not bit-reproducible, which is
    * exactly why the clock is injectable), then read AS OF t=2500: the
    * commit log must resolve v1, the ≤1995 state — the same relational
    * oracle as the version-pinned gate, via a different resolution path. */
  def tableTimetravelTs(s: SparkSession, dir: String): DataFrame = {
    val t = new java.util.concurrent.atomic.AtomicLong(0L)
    val prev = graft.sources.VersionedLayout.commitClock
    graft.sources.VersionedLayout.commitClock = () => t.addAndGet(1000L)
    try {
      val root = twoMergeHistory(s, dir, changeFeed = false)
      ManagedTable.readAsOf(s, root, 2500L)
    } finally graft.sources.VersionedLayout.commitClock = prev
  }

  /** DESCRIBE HISTORY gate: three publishes under the injected logical
    * clock, the first and third stamped with user metadata — the run
    * provenance the reference attaches to every curated write (Delta
    * `userMetadata`, mls_listings_curated.py:325). The gate emits the
    * commit log itself (version, commit ms, metadata); the oracle is a
    * VALUES literal, putting the history/metadata surface under the hash
    * bar rather than spec-only. */
  def tableHistory(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.VersionedLayout
    val root = freshRoot("history")
    val t = new java.util.concurrent.atomic.AtomicLong(0L)
    val prev = VersionedLayout.commitClock
    VersionedLayout.commitClock = () => t.addAndGet(1000L)
    try {
      val base = table(s, dir, "region").select(col("r_regionkey").as("k"))
      VersionedLayout.withUserMetadata("job=curated from=19950101 to=19961231") {
        ManagedTable.overwrite(root, base)
      }
      ManagedTable.overwrite(root, base.limit(3)) // no metadata set
      VersionedLayout.withUserMetadata("job=backfill budget=100") {
        ManagedTable.overwrite(root, base.limit(1))
      }
      import s.implicits._
      ManagedTable.commitHistoryWithMetadata(root)
        .map { case (v, ts, m) => (v, ts, m.orNull) }
        .toDF("version", "commit_ms", "user_metadata")
    } finally VersionedLayout.commitClock = prev
  }

  /** RENAME COLUMN gate (Delta column mapping): two chained metadata-only
    * renames — zero data bytes rewritten, files hard-linked forward with
    * a physical→logical `_colmap` — then a read through the mapping. The
    * oracle recomputes the projection relationally, so a mapping that
    * dropped, double-applied, or failed to chain breaks the hash. */
  def tableRename(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("rename")
    ManagedTable.overwrite(root, table(s, dir, "orders").select(
      col("o_orderkey").as("k"), col("o_custkey").as("cust"),
      col("o_totalprice").cast("double").as("price")))
    ManagedTable.renameColumn(s, root, "price", "total_price")
    ManagedTable.renameColumn(s, root, "cust", "customer_id")
    ManagedTable.read(s, root)
  }

  /** Change-data-feed gate (Delta `table_changes`): the v2 merge records
    * its row-level changes — `update` (post-image) where the ≤1996 state
    * has newer activity, `delete` (pre-image) for matched-but-unchanged
    * customers, `insert` for customers first active in 1996. DuckDB
    * re-derives every action from the two relational states. */
  def tableCdf(s: SparkSession, dir: String): DataFrame = {
    val root = feedHistoryShared(s, dir)
    ManagedTable.changes(s, root, 2)
      .withColumnRenamed(Merge.ActionCol, "action")
  }

  /** Schema-evolution gate (Delta autoMerge): the target is the ≤1995
    * per-customer order count; the source re-derives the 1996 window
    * WITH A NEW COLUMN (`total`). The evolved merge appends the column
    * — updated/inserted rows carry source values, kept rows carry the
    * null backfill — and the published snapshot is read back with the
    * widened schema (the populated target makes the null backfill of
    * kept rows observable, not vacuous). DuckDB recomputes it as a full
    * outer join. */
  def mergeEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("evolution")
    val pre95 = table(s, dir, "orders")
      .filter(col("o_orderdate") <= lit("1995-12-31"))
      .groupBy(col("o_custkey").as("cust"))
      .agg(count(lit(1)).as("n_orders"))
    val y96 = table(s, dir, "orders")
      .filter(col("o_orderdate").between(lit("1996-01-01"), lit("1996-12-31")))
      .groupBy(col("o_custkey").as("cust"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
    ManagedTable.overwrite(root, pre95)
    ManagedTable.merge(s, root, y96, Seq("cust"), schemaEvolution = true)
    ManagedTable.read(s, root)
  }

  /** Generated-column gate (Delta GENERATED ALWAYS AS): the table defines
    * `yr = substring(dt, 1, 4)`; registering it on the populated ≤1995
    * state publishes a BACKFILL version, and the later full overwrite
    * supplies only physical columns — the table computes `yr` inside the
    * write. DuckDB re-derives the expression over raw orders, so the hash
    * pins both the backfill and the compute-on-write path. */
  def tableGenerated(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("generated")
    def shaped(upTo: String): DataFrame =
      table(s, dir, "orders")
        .filter(col("o_orderdate") <= lit(upTo))
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"))
    ManagedTable.overwrite(root, shaped("1995-12-31"))
    ManagedTable.addGeneratedColumn(s, root, "yr", "substring(dt, 1, 4)")
    ManagedTable.overwrite(root, shaped("1996-12-31"))
    ManagedTable.read(s, root)
  }

  /** Managed-table SHALLOW-CLONE gate (dir-layout twin of
    * q_bucketed_clone): the ≤1995 base becomes the source; a clone
    * branches it by hard link (zero data bytes — pinned by inode in
    * ManagedTableSpec), and the 1995H2-1996H1 delta merges into the
    * CLONE only. The gate reads the post-merge clone; DuckDB recomputes
    * the upsert relationally, and source isolation is pinned in the
    * spec. */
  def tableClone(s: SparkSession, dir: String): DataFrame = {
    val srcRoot = freshRoot("tclone_src")
    val cloneRoot = freshRoot("tclone_dst")
    def shaped(f: org.apache.spark.sql.Column): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"))
    ManagedTable.overwrite(srcRoot, shaped(col("o_orderdate") <= lit("1995-12-31")))
    ManagedTable.shallowClone(s, srcRoot, cloneRoot)
    ManagedTable.merge(s, cloneRoot,
      shaped(col("o_orderdate").between(lit("1996-01-01"), lit("1996-06-30"))),
      Seq("k"))
    ManagedTable.read(s, cloneRoot)
  }

  /** Merge-on-read UPDATE gate: an update tombstones its matched base
    * rows by address and appends their updated copies (no base file
    * rewritten — pinned by file-set in ManagedTableSpec); a stacked
    * vectorized DELETE then filters base AND appended rows; a second
    * UPDATE rewrites matched appended rows. DuckDB replays the three
    * stages relationally — any mis-addressed tombstone or lost appended
    * row breaks the hash. */
  def tableUpdateDv(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("update_dv")
    val o = table(s, dir, "orders").select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      col("o_totalprice").cast(DoubleType).as("total"),
      col("o_orderdate").cast(StringType).as("dt"))
    ManagedTable.overwrite(root, o.repartition(8))
    ManagedTable.updateVectorized(s, root,
      Map("total" -> (col("total") + lit(100000.0))),
      col("st") === lit("F"))
    ManagedTable.deleteVectorized(s, root, col("total") > lit(400000.0))
    ManagedTable.updateVectorized(s, root,
      Map("st" -> lit("X")), col("dt") < lit("1995-06-01"))
    ManagedTable.read(s, root)
  }

  /** replaceWhere gate — Delta's overwrite-a-slice contract, both forms.
    * CoW leg: 1995H1 is re-landed from a frame with a DIFFERENT
    * cardinality (odd keys dropped, totals doubled) — pinning that the op
    * replaces the slice WHOLESALE, not keyed like MERGE. MOR leg
    * ([[graft.sources.ManagedTable.overwriteWhereVectorized]]): the
    * 1996+ 'O' slice is then replaced at delta cost — matched base rows
    * tombstoned by (file, pos) address, the zero-priced replacement in
    * `_append`, no base file rewritten (pinned at IO level in
    * ManagedTableSpec). DuckDB replays both replacements relationally:
    * a keep-side leak, a slice row that survived replacement, or a
    * mis-addressed tombstone breaks the hash. */
  def tableReplaceWhere(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("replace_where")
    val o = table(s, dir, "orders").select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      col("o_totalprice").cast(DoubleType).as("total"),
      col("o_orderdate").cast(StringType).as("dt"))
    ManagedTable.overwrite(root, o.repartition(8))
    val h1 = col("dt").between(lit("1995-01-01"), lit("1995-06-30"))
    ManagedTable.overwriteWhere(s, root,
      o.filter(h1 && col("k") % 2 === 0)
        .withColumn("total", col("total") * lit(2.0)), // *2 is exponent+1: exact in both engines
      h1)
    val oSlice = col("dt") >= lit("1996-01-01") && col("st") === lit("O")
    ManagedTable.overwriteWhereVectorized(s, root,
      o.filter(oSlice).withColumn("total", lit(0.0)), oSlice)
    ManagedTable.read(s, root)
  }

  /** Bloom-index point-lookup gate: the table is hash-distributed on the
    * key (every file spans nearly the full key range — min/max skipping
    * prunes NOTHING here), analyzeBloom records a per-file filter, and
    * three readPoint probes (min key, max key, and a key that does not
    * exist) union into the gate frame. The bloom prunes to ~1 file per
    * probe (pinned via inputFiles in ManagedTableSpec); DuckDB recomputes
    * the two hits relationally — a filter that pruned a true file would
    * lose rows, a wrong equality would add them. */
  def tableBloom(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("bloom")
    val o = table(s, dir, "orders").select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("st"),
      col("o_totalprice").cast(DoubleType).as("total"))
    ManagedTable.overwrite(root, o.repartition(8, col("k")))
    ManagedTable.analyzeBloom(s, root, Seq("k"))
    val probe = o.agg(min(col("k")), max(col("k"))).head() // bounded: 1 row
    Seq(probe.getLong(0), probe.getLong(1), probe.getLong(1) + 1L)
      .map(v => ManagedTable.readPoint(s, root, "k", v))
      .reduce(_ unionByName _)
  }

  /** Write-audit-publish gate: a batch with duplicate keys is staged,
    * audited against the table's quality rules, and REJECTED — the live
    * version never moves; the clean batch then stages, audits green, and
    * publishes. The gate reads the final table: a WAP that leaked the bad
    * batch (dup keys) or lost the good one breaks the hash. The audit
    * runs on the staged files themselves — the Iceberg WAP discipline. */
  def tableWap(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataQuality.{Rule, countWhere}
    val root = freshRoot("wap")
    def shaped(f: org.apache.spark.sql.Column): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"))
    val base = shaped(col("o_orderdate") <= lit("1995-12-31"))
    ManagedTable.overwrite(root, base)
    val rules = Seq(
      Rule("k_unique", count(lit(1)) - countDistinct(col("k"))),
      Rule("dt_complete", countWhere(col("dt").isNull)))
    // bad batch: F-status rows duplicated → k_unique fails, no publish
    ManagedTable.writeAuditPublish(s, root,
      base.unionByName(base.filter(col("st") === lit("F"))), rules)
    // clean batch: distinct keys through 1996H1 → publishes
    ManagedTable.writeAuditPublish(s, root,
      shaped(col("o_orderdate") <= lit("1996-06-30")), rules)
    ManagedTable.read(s, root)
  }

  /** Merge-on-read MERGE gate — upsert at delta cost: the first
    * `mergeVectorized` tombstones matched base rows by address and appends
    * their post-images plus the inserts (no base file rewritten — pinned
    * at IO level in ManagedTableSpec); the second stacks a conditional
    * DELETE clause on top, filtering base AND previously-appended rows.
    * DuckDB replays both merges relationally — a mis-addressed tombstone,
    * a lost append survivor, or a wrong clause resolution breaks the
    * hash. */
  def tableMergeMor(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("merge_mor")
    def shaped(f: org.apache.spark.sql.Column): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"))
    ManagedTable.overwrite(root,
      shaped(col("o_orderdate") <= lit("1995-12-31")).repartition(8))
    // updates (1995H2 keys exist) + inserts (1996H1 keys are new)
    ManagedTable.mergeVectorized(s, root,
      shaped(col("o_orderdate").between(lit("1995-07-01"), lit("1996-06-30")))
        .withColumn("total", col("total") + lit(50000.0)),
      Seq("k"))
    // conditional matched-delete over 1995H1 keys: drop the big orders
    ManagedTable.mergeVectorized(s, root,
      shaped(col("o_orderdate").between(lit("1995-01-01"), lit("1995-06-30"))),
      Seq("k"),
      MergeClauses.Spec(
        updateWhen = Some(lit(false)),
        deleteWhen = Some(col("s.total") > lit(200000.0)),
        insertWhen = Some(lit(false))))
    ManagedTable.read(s, root)
  }

  /** Incremental-compaction gate: a skewed hash layout leaves one healthy
    * file and a sliver tail; `compactSmall` bin-packs ONLY the slivers and
    * hard-links the healthy file into the new version (zero data bytes —
    * pinned by inode in ManagedTableSpec). The oracle recomputes the
    * projection over raw lineitem: a compaction that loses, duplicates, or
    * corrupts any row in either the packed or the carried files breaks the
    * hash. */
  def tableCompactSmall(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("compact_small")
    val li = table(s, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"),
        col("l_quantity").cast(DoubleType).as("qty"),
        col("l_returnflag").as("rf"))
    ManagedTable.overwrite(root, li.repartition(24,
      when(col("k") % 10 === 0, col("k") % 7 + 1).otherwise(lit(0))))
    ManagedTable.compactSmall(s, root, targetFileBytes = 4L << 20)
    ManagedTable.read(s, root)
  }

  /** Deletion-vector gate — DELETE at delta cost: two stacked
    * `deleteVectorized` calls publish versions that SHARE the base
    * snapshot's files and record only deleted-row addresses (the
    * Delta/Iceberg-v3 position-delete design); the read anti-joins the
    * cumulative tombstones. No data file is rewritten (pinned at IO
    * level in ManagedTableSpec); DuckDB recomputes both predicates over
    * the raw table, so the hash match pins the tombstone addressing —
    * a wrong (file, pos) pair would surface as a missing or extra row. */
  def tableDeleteDv(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("delete_dv")
    val o = table(s, dir, "orders").select(
      col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      col("o_totalprice").cast(DoubleType).as("total"),
      col("o_orderdate").cast(StringType).as("dt"))
    ManagedTable.overwrite(root, o.repartition(8))
    ManagedTable.deleteVectorized(s, root, col("st") === lit("F"))
    ManagedTable.deleteVectorized(s, root, col("total") > lit(250000.0))
    ManagedTable.read(s, root)
  }

  /** Bucketed DELETE gate: delete the F-status pre-1995H2 rows from the
    * 16-bucket ≤1996H1 table — one pass finds the buckets holding
    * matches, only those rewrite (the narrow-predicate IO contract is
    * pinned in BucketedTableSpec), and the oracle recomputes the surviving
    * set relationally: a delete that loses a row in a carried bucket or
    * keeps one in a rewritten bucket breaks the hash. */
  def bucketedDelete(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("bucketed_del")
    val base = table(s, dir, "orders")
      .filter(col("o_orderdate") <= lit("1996-06-30"))
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").cast(DoubleType).as("total"),
        col("o_orderdate").cast(StringType).as("dt"))
    BucketedTable.create(root, base, Seq("k"), nBuckets = 16)
    BucketedTable.delete(s, root,
      col("st") === lit("F") && col("dt") < lit("1995-07-01"))
    BucketedTable.read(s, root)
  }

  /** Bucketed replaceWhere gate: the 1995H1 slice of the 16-bucket table
    * is atomically swapped for a DIFFERENT-cardinality frame (odd keys
    * dropped, totals doubled) via
    * [[graft.sources.BucketedTable.overwriteWhere]] — only buckets
    * holding slice rows or receiving replacement keys rewrite; the rest
    * carry by manifest reference (bucket-IO contract pinned in
    * BucketedTableSpec). DuckDB replays the replacement relationally. */
  def bucketedReplace(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("bucketed_rw")
    val base = table(s, dir, "orders")
      .filter(col("o_orderdate") <= lit("1996-06-30"))
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").cast(DoubleType).as("total"),
        col("o_orderdate").cast(StringType).as("dt"))
    BucketedTable.create(root, base, Seq("k"), nBuckets = 16)
    val h1 = col("dt").between(lit("1995-01-01"), lit("1995-06-30"))
    BucketedTable.overwriteWhere(s, root,
      base.filter(h1 && col("k") % 2 === 0)
        .withColumn("total", col("total") * lit(2.0)),
      h1)
    BucketedTable.read(s, root)
  }

  /** Bucketed UPDATE gate: re-price the F-status rows of the 16-bucket
    * ≤1996H1 table — only buckets holding matches rewrite (narrow-
    * predicate IO pinned in BucketedTableSpec), SET expressions see the
    * pre-update row, and DuckDB replays the CASE relationally. */
  def bucketedUpdate(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("bucketed_upd")
    val base = table(s, dir, "orders")
      .filter(col("o_orderdate") <= lit("1996-06-30"))
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").cast(DoubleType).as("total"),
        col("o_orderdate").cast(StringType).as("dt"))
    BucketedTable.create(root, base, Seq("k"), nBuckets = 16)
    BucketedTable.update(s, root,
      Map("total" -> (col("total") + lit(50000.0)), "st" -> lit("R")),
      col("st") === lit("F"))
    BucketedTable.read(s, root)
  }

  /** Bucketed schema-evolution gate: the 100 TB version of Delta
    * autoMerge. The 16-bucket target holds the ≤1995 per-customer count;
    * the 1996 source carries a NEW `total` column. The evolving merge
    * rewrites ONLY buckets containing 1996 customers, records the widened
    * schema in the new manifest, and reads fill the untouched buckets'
    * missing column with nulls — evolution never rewrites a bucket it
    * didn't touch. DuckDB recomputes the widened state as a full outer
    * join; the hash match pins both the merge values AND the null
    * backfill of never-touched buckets. */
  def bucketedEvolution(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("bucketed_evo")
    val pre95 = table(s, dir, "orders")
      .filter(col("o_orderdate") <= lit("1995-12-31"))
      .groupBy(col("o_custkey").as("cust"))
      .agg(count(lit(1)).as("n_orders"))
    val y96 = table(s, dir, "orders")
      .filter(col("o_orderdate").between(lit("1996-01-01"), lit("1996-12-31")))
      .groupBy(col("o_custkey").as("cust"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
    BucketedTable.create(root, pre95, Seq("cust"), nBuckets = 16)
    BucketedTable.merge(s, root, y96, schemaEvolution = true)
    BucketedTable.read(s, root)
  }

  /** Bucketed (delta-proportional) change-data-feed gate: the 100 TB CDC
    * path. Create the 16-bucket table from the ≤1995 slice, merge the
    * 1995H2-1996H1 delta with update-when-not-F / delete-when-F clauses
    * and the feed on — only buckets containing delta keys are read or
    * rewritten, yet the emitted feed equals the whole-table merge's feed
    * (changes can only happen in touched buckets). DuckDB re-derives
    * every action from the two slices. */
  def bucketedCdf(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("bucketed_cdf")
    def shaped(f: org.apache.spark.sql.Column, tag: String): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"), lit(tag).as("tag"))
    val base = shaped(col("o_orderdate") <= lit("1995-12-31"), "base")
    val delta = shaped(col("o_orderdate").between(lit("1995-07-01"),
      lit("1996-06-30")), "delta")
    BucketedTable.create(root, base, Seq("k"), nBuckets = 16)
    BucketedTable.merge(s, root, delta,
      MergeClauses.Spec(
        updateWhen = Some(col("s.st") =!= lit("F")),
        deleteWhen = Some(lit(true))),
      changeFeed = true)
    BucketedTable.changes(s, root, 1)
      .withColumnRenamed(Merge.ActionCol, "action")
  }

  /** Shared builder for the DML gates: v0 = the ≤1995 order projection,
    * v1 = UPDATE non-F rows (+1000.0 on total, evaluated on the
    * pre-update row), v2 = DELETE pre-1996H2 rows. */
  private def dmlHistory(s: SparkSession, dir: String): String = {
    val root = freshRoot("dml")
    val base = table(s, dir, "orders")
      .filter(col("o_orderdate") <= lit("1997-12-31"))
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").cast(DoubleType).as("total"),
        col("o_orderdate").cast(StringType).as("dt"))
    ManagedTable.overwrite(root, base)                                  // v0
    ManagedTable.update(s, root,
      Map("total" -> (col("total") + lit(1000.0))),
      where = col("st") =!= lit("F"))                                   // v1
    ManagedTable.delete(s, root, col("dt") < lit("1996-07-01"))         // v2
    root
  }

  /** DML gate (Delta UPDATE + DELETE command parity): the post-delete
    * head state. DuckDB recomputes both commands relationally. */
  def tableDml(s: SparkSession, dir: String): DataFrame =
    ManagedTable.read(s, dmlHistory(s, dir))

  /** Shared setup for the incremental-view gates: a keyed order fact
    * (≤1995), one merge of a HOSTILE delta — updates change the measure
    * AND move rows between groups (cust % 500), matched 'F' rows are
    * deleted, new keys insert — recorded as a pre-image change feed.
    * Returns (view-spec base fact, feed, post-merge fact). Measures stay
    * DecimalType end-to-end so incremental sums are exact (the operator's
    * exactness contract). */
  private def viewFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val root = freshRoot("ivm")
    def orders0 = table(s, dir, "orders")
    val base = orders0.filter(col("o_orderdate") <= lit("1995-12-31"))
      .select(col("o_orderkey").as("k"), col("o_custkey").as("cust"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("total"),
        col("o_orderstatus").as("st"))
    val delta = orders0.filter(col("o_orderdate")
        .between(lit("1995-07-01"), lit("1996-06-30")))
      .select(col("o_orderkey").as("k"),
        (col("o_custkey") % lit(500)).as("cust"),
        (col("o_totalprice").cast(DecimalType(18, 2)) +
          lit(100).cast(DecimalType(18, 2))).cast(DecimalType(18, 2))
          .as("total"),
        col("o_orderstatus").as("st"))
    ManagedTable.overwrite(root, base)
    ManagedTable.merge(s, root, delta, Seq("k"),
      MergeClauses.Spec(
        updateWhen = Some(col("s.st") =!= lit("F")),
        deleteWhen = Some(lit(true))),
      changeFeed = true, preImageFeed = true)
    (base, ManagedTable.changes(s, root, 1), ManagedTable.read(s, root))
  }

  /** Incremental-view gate (algebraic COUNT/SUM): the per-customer view
    * is initialized from the base fact, then advanced PURELY from the
    * merge's pre-image change feed — the post-merge fact is never
    * aggregated. DuckDB recomputes the merge and the aggregate from
    * scratch; a hash match proves insert/update/delete contributions
    * (including group MOVES via the update pre-image) retract and apply
    * exactly. */
  def viewIncremental(s: SparkSession, dir: String): DataFrame = {
    val (base, feed, _) = viewFixture(s, dir)
    val spec = IncrementalView.Spec(Seq("cust"), Seq("total"))
    val view0 = IncrementalView.initialize(base, spec)
    IncrementalView.applyChanges(view0, feed, spec)
      .select(col("cust"), col("n"),
        col("sum_total").cast(DoubleType).as("total_sum"))
  }

  /** Incremental-view gate over the MERGE-ON-READ feed: the same hostile
    * delta as q_view_incremental, but the upsert publishes via
    * mergeVectorized — tombstones + delta-sized appends, no snapshot
    * rewrite — and the view advances from ITS pre-image feed. At 100 TB
    * this is the composition that matters: the table update AND the view
    * maintenance are both delta-cost; nothing ever rescans the fact. The
    * oracle is q_view_incremental's by reference — the MoR feed must be
    * drop-in identical to the copy-on-write feed. */
  def viewIncrementalMor(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("ivm_mor")
    def orders0 = table(s, dir, "orders")
    val base = orders0.filter(col("o_orderdate") <= lit("1995-12-31"))
      .select(col("o_orderkey").as("k"), col("o_custkey").as("cust"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("total"),
        col("o_orderstatus").as("st"))
    val delta = orders0.filter(col("o_orderdate")
        .between(lit("1995-07-01"), lit("1996-06-30")))
      .select(col("o_orderkey").as("k"),
        (col("o_custkey") % lit(500)).as("cust"),
        (col("o_totalprice").cast(DecimalType(18, 2)) +
          lit(100).cast(DecimalType(18, 2))).cast(DecimalType(18, 2))
          .as("total"),
        col("o_orderstatus").as("st"))
    ManagedTable.overwrite(root, base)
    ManagedTable.mergeVectorized(s, root, delta, Seq("k"),
      MergeClauses.Spec(
        updateWhen = Some(col("s.st") =!= lit("F")),
        deleteWhen = Some(lit(true))),
      changeFeed = true, preImageFeed = true)
    val spec = IncrementalView.Spec(Seq("cust"), Seq("total"))
    val view0 = IncrementalView.initialize(base, spec)
    IncrementalView.applyChanges(view0, ManagedTable.changes(s, root, 1), spec)
      .select(col("cust"), col("n"),
        col("sum_total").cast(DoubleType).as("total_sum"))
  }

  /** Delta-proportional refresh gate (non-algebraic MIN/MAX): touched
    * groups — post-image keys, update pre-image keys, delete keys — are
    * recomputed from the post-merge fact; untouched groups carry forward
    * by anti-join without being read. DuckDB recomputes everything from
    * scratch, so a hash match proves the touched-group set was complete
    * (a missed moved-row pre-image group would ship a stale extremum). */
  def viewRefresh(s: SparkSession, dir: String): DataFrame = {
    val (base, feed, merged) = viewFixture(s, dir)
    val aggs = Seq(count(lit(1)).as("n"),
      min(col("total")).as("mn"), max(col("total")).as("mx"))
    val view0 = IncrementalView.initializeWith(base, Seq("cust"), aggs)
    IncrementalView.refreshGroups(view0, feed, merged, Seq("cust"), aggs)
      .select(col("cust"), col("n"),
        col("mn").cast(DoubleType).as("mn"),
        col("mx").cast(DoubleType).as("mx"))
  }

  /** SCD Type-2 gate: a per-customer dimension (latest order date +
    * order count) is initialized from the ≤1995 snapshot effective
    * 1996-01-01, then merged with the ≤1996 snapshot effective
    * 1997-01-01. Customers active in 1996 change → their first version
    * is CLOSED and a second opened; dormant customers keep one open
    * version; first-time-in-1996 customers insert. DuckDB re-derives
    * every branch from the two snapshots, so a hash match pins the
    * close/open/carry logic including the validity window stamps. */
  def scd2Dim(s: SparkSession, dir: String): DataFrame = {
    def snap(upTo: String): DataFrame =
      table(s, dir, "orders")
        .filter(col("o_orderdate") <= lit(upTo))
        .groupBy(col("o_custkey").as("cust"))
        .agg(max(col("o_orderdate")).cast(StringType).as("last_dt"),
          count(lit(1)).as("n_orders"))
    val dim1 = Scd2.initialize(snap("1995-12-31"), lit("1996-01-01"))
    Scd2.merge(dim1, snap("1996-12-31"), Seq("cust"),
      Seq("last_dt", "n_orders"), lit("1997-01-01"))
  }

  /** SCD2 point-in-time gate: read the two-merge dimension AS OF a date
    * strictly inside the first validity window. Changed customers must
    * surface their CLOSED first version (not the current one), unchanged
    * customers their open version, and 1996-only customers (opened
    * 1997-01-01) must be absent — pinning `valid_from <= asOf < valid_to`
    * with the open upper bound. DuckDB re-derives the same slice from the
    * snapshots. */
  def scd2AsOf(s: SparkSession, dir: String): DataFrame =
    Scd2.asOf(scd2Dim(s, dir), lit("1996-06-15"))

  /** SCD2 TEMPORAL-JOIN gate: each 1995-06..1997-06 order joins the
    * customer-dimension version valid AT ITS OWN ORDER DATE — orders
    * before the dimension opens (pre-1996) carry nulls (left join), 1996
    * orders hit version 1, 1997 orders hit whichever version is live
    * after the second snapshot closed changed customers. DuckDB
    * re-derives the dimension (same CTEs as q_scd2_dim) and replays the
    * validity-window join — a wrong window bound or a dropped
    * pre-dimension fact breaks the hash. */
  def scd2Join(s: SparkSession, dir: String): DataFrame = {
    val facts = table(s, dir, "orders")
      .filter(col("o_orderdate").between(lit("1995-06-01"), lit("1997-06-30")))
      .select(col("o_orderkey").as("k"), col("o_custkey").as("cust"),
        col("o_orderdate").cast(StringType).as("dt"))
    Scd2.temporalJoin(facts, scd2Dim(s, dir), Seq("cust"), col("dt"))
      .select(col("k"), col("cust"), col("dt"), col("last_dt"),
        col("n_orders"), col("valid_from"))
  }

  /** SHALLOW-CLONE gate (Delta `SHALLOW CLONE` on the bucketed layout):
    * the ≤1995 base becomes the SOURCE table; a metadata-only clone
    * branches it (zero bytes copied — asserted in BucketedTableSpec where
    * the filesystem is visible), and the 1995H2-1996H1 delta merges into
    * the CLONE copy-on-write: touched buckets materialize under the clone
    * root, untouched ones still resolve into the source's immutable v0
    * dirs by absolute reference. The gate reads the post-merge clone;
    * DuckDB recomputes the upsert relationally — a hash match proves the
    * cross-root manifest indirection loses nothing. Source isolation
    * (the source table is byte-identical after the clone's merge) is
    * pinned in the spec. */
  def bucketedClone(s: SparkSession, dir: String): DataFrame = {
    val srcRoot = freshRoot("clone_src")
    val cloneRoot = freshRoot("clone_dst")
    def shaped(f: org.apache.spark.sql.Column, tag: String): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"), lit(tag).as("tag"))
    // testdata orders span 1995-01-01..2001-08-01 — the ≤1995 base slice
    // is materially populated, so the clone genuinely references source
    // bytes and the merge genuinely hits matched rows
    val base = shaped(col("o_orderdate") <= lit("1995-12-31"), "base")
    val d1 = shaped(col("o_orderdate").between(lit("1995-07-01"),
      lit("1996-06-30")), "d1")
    BucketedTable.create(srcRoot, base, Seq("k"), nBuckets = 16)
    BucketedTable.shallowClone(srcRoot, cloneRoot)
    BucketedTable.merge(s, cloneRoot, d1)
    BucketedTable.read(s, cloneRoot)
  }

  /** Snapshot-DIFF gate (ManagedTable): reconstruct the row-level changes
    * between v0 and v2 of the DML table — an UPDATE then a DELETE, both
    * run WITHOUT a change feed — purely from the two immutable snapshots.
    * Deleted rows surface with their v0 pre-image (the original total,
    * not the updated one), updated rows with their v2 post-image, and the
    * never-touched rows (F-status rows surviving the delete window) are
    * absent. DuckDB re-derives every branch from orders. */
  def tableDiff(s: SparkSession, dir: String): DataFrame = {
    val root = dmlHistory(s, dir)
    ManagedTable.diff(s, root, 0, 2, Seq("k"))
      .withColumnRenamed(Merge.ActionCol, "action")
  }

  /** Manifest-pruned DIFF gate (BucketedTable): the lifecycleBucketed
    * cycle's two merges — an unconditional upsert then a conditional
    * update/delete — followed by `diff(v0, v2)` computed from the two
    * MANIFESTS: buckets whose entries are identical in both versions are
    * provably unchanged and never opened (pinned in BucketedTableSpec via
    * inputFiles), so the diff reads delta-proportional bytes on both
    * sides. DuckDB chains both merges relationally and diffs against the
    * base with null-safe comparison. */
  def bucketedDiff(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("bucketed_diff")
    def shaped(f: org.apache.spark.sql.Column, tag: String): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"), lit(tag).as("tag"))
    // windows sit inside the testdata's 1995+ date range so v0 holds real
    // rows and the diff exercises all three actions, not just inserts
    val base = shaped(col("o_orderdate") <= lit("1995-12-31"), "base")
    val d1 = shaped(col("o_orderdate").between(lit("1995-07-01"),
      lit("1996-06-30")), "d1")
    val d2 = shaped(col("o_orderdate").between(lit("1996-01-01"),
      lit("1996-12-31")), "d2")
    BucketedTable.create(root, base, Seq("k"), nBuckets = 16)
    BucketedTable.merge(s, root, d1)
    BucketedTable.merge(s, root, d2,
      MergeClauses.Spec(
        updateWhen = Some(col("s.st") =!= lit("F")),
        deleteWhen = Some(lit(true))))
    BucketedTable.diff(s, root, 0, 2)
      .withColumnRenamed(Merge.ActionCol, "action")
  }

  /** Bucketed RESTORE gate: after the v1 upsert AND a destructive v2
    * merge (conditional update/delete), roll back to v1 — a
    * metadata-only republish of v1's manifest as v3. The gate reads the
    * new head, which must equal the post-v1 state exactly; a restore
    * that resolved stale or partial bucket refs would hash-fail. */
  def bucketedRestore(s: SparkSession, dir: String): DataFrame = {
    val root = bucketedHistory(s, dir, createPartitions = 4)
    def shaped(f: org.apache.spark.sql.Column, tag: String): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"), lit(tag).as("tag"))
    BucketedTable.merge(s, root,
      shaped(col("o_orderdate").between(lit("1996-01-01"),
        lit("1996-12-31")), "d2"),
      MergeClauses.Spec(
        updateWhen = Some(col("s.st") =!= lit("F")),
        deleteWhen = Some(lit(true))))                                // v2
    BucketedTable.restore(s, root, 1)                                 // v3
    BucketedTable.read(s, root)
  }

  /** Point-lookup gate (the 100 TB "read one key" path): look up the
    * five smallest keys of the live bucketed table — the scan opens only
    * the manifest-resolved bucket dirs those keys hash into (pinned in
    * BucketedTableSpec via inputFiles), never the table. The driver
    * holds exactly the five requested key values. DuckDB recomputes the
    * same five rows relationally. */
  def bucketedLookup(s: SparkSession, dir: String): DataFrame = {
    val root = bucketedHistory(s, dir, createPartitions = 4)
    val keys = BucketedTable.read(s, root).select("k").orderBy("k")
      .limit(5).collect().map(_.getLong(0)).toSeq // bounded: 5 values
    BucketedTable.lookup(s, root, keys)
  }

  /** CHECK-constraint gate (Delta `ADD CONSTRAINT` + the reference's
    * validate-split pattern at the table boundary): the ≤1995 base table
    * gets two constraints (non-negative total, known status codes); the
    * 1995H2-1996H1 delta arrives with synthesized violations (every
    * 10th key's total negated, every 13th key's status corrupted).
    * Quarantine-mode ingestion splits the delta — violating rows are
    * diverted, clean rows merge through the ENFORCED write path (the
    * publish itself re-checks every row) — and the gate returns the live
    * table and the quarantine zone in one tagged frame. DuckDB recomputes
    * both zones relationally. */
  def tableConstraints(s: SparkSession, dir: String): DataFrame = {
    val root = freshRoot("constraints")
    def shaped(f: org.apache.spark.sql.Column): DataFrame =
      table(s, dir, "orders").filter(f)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast(DoubleType).as("total"),
          col("o_orderdate").cast(StringType).as("dt"))
    val base = shaped(col("o_orderdate") <= lit("1995-12-31"))
    ManagedTable.overwrite(root, base)
    ManagedTable.addConstraint(s, root, "total_nonneg", "total >= 0")
    ManagedTable.addConstraint(s, root, "known_status", "st IN ('F','O','P')")
    val delta = shaped(col("o_orderdate").between(lit("1995-07-01"),
        lit("1996-06-30")))
      .withColumn("total",
        when(col("k") % 10 === 0, -col("total")).otherwise(col("total")))
      .withColumn("st",
        when(col("k") % 13 === 0, lit("X")).otherwise(col("st")))
    val (clean, quarantined) =
      graft.sources.Constraints.split(delta, ManagedTable.constraintsOf(root))
    ManagedTable.merge(s, root, clean, Seq("k"))
    ManagedTable.read(s, root).withColumn("zone", lit("live"))
      .unionByName(quarantined.withColumn("zone", lit("quarantine")))
  }

  /** RESTORE gate: roll the DML table back to v1 (post-update,
    * pre-delete). The rollback republishes v1's content as v3 —
    * history stays linear — and the gate returns the new head, which
    * must equal the update-only state. */
  def tableRestore(s: SparkSession, dir: String): DataFrame = {
    val root = dmlHistory(s, dir)
    ManagedTable.restore(s, root, 1)                                    // v3
    ManagedTable.read(s, root)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bucketed_clone" -> (bucketedClone _),
    "q_bucketed_restore" -> (bucketedRestore _),
    "q_bucketed_lookup" -> (bucketedLookup _),
    "q_table_diff" -> (tableDiff _),
    "q_bucketed_diff" -> (bucketedDiff _),
    "q_table_constraints" -> (tableConstraints _),
    "q_table_dml" -> (tableDml _),
    "q_table_delete_dv" -> (tableDeleteDv _),
    "q_table_merge_mor" -> (tableMergeMor _),
    "q_table_wap" -> (tableWap _),
    "q_table_bloom" -> (tableBloom _),
    "q_table_update_dv" -> (tableUpdateDv _),
    "q_table_replace_where" -> (tableReplaceWhere _),
    "q_table_compact_small" -> (tableCompactSmall _),
    "q_table_generated" -> (tableGenerated _),
    "q_table_clone" -> (tableClone _),
    "q_table_restore" -> (tableRestore _),
    "q_view_incremental" -> (viewIncremental _),
    "q_view_incremental_mor" -> (viewIncrementalMor _),
    "q_view_refresh" -> (viewRefresh _),
    "q_scd2_dim" -> (scd2Dim _),
    "q_scd2_asof" -> (scd2AsOf _),
    "q_scd2_join" -> (scd2Join _),
    "q_bucketed_cdf" -> (bucketedCdf _),
    "q_merge_evolution" -> (mergeEvolution _),
    "q_bucketed_evolution" -> (bucketedEvolution _),
    "q_bucketed_delete" -> (bucketedDelete _),
    "q_bucketed_update" -> (bucketedUpdate _),
    "q_bucketed_replace" -> (bucketedReplace _),
    "q_merge_threeway" -> (mergeThreeway _),
    "q_lifecycle_table" -> (lifecycleTable _),
    "q_table_optimize" -> (tableOptimize _),
    "q_table_skipping" -> (tableSkipping _),
    "q_table_skipping_str" -> (tableSkippingStr _),
    "q_table_timetravel" -> (tableTimetravel _),
    "q_table_timetravel_ts" -> (tableTimetravelTs _),
    "q_table_history" -> (tableHistory _),
    "q_table_rename" -> (tableRename _),
    "q_table_cdf" -> (tableCdf _),
    "q_csv_roundtrip" -> (csvRoundtrip _),
    "q_bucketed_merge" -> (bucketedMerge _),
    "q_bucketed_timetravel" -> (bucketedTimetravel _),
    "q_bucketed_optimize" -> (bucketedOptimize _),
    "q_lifecycle_bucketed" -> (lifecycleBucketed _),
    "q_s12_surrogate_keys" -> (surrogateKeys _),
    "q_s7_orc_mirror" -> (orcMirror _),
    "q_s10_external_table" -> (externalTable _),
    "q_s11_jdbc_roundtrip" -> (jdbcRoundtrip _),
    "q_w2_hist_grain" -> (histGrain _))

  /** The SCD2 dimension state the scd2Dim fixture produces — shared by
    * the dimension gate and the temporal-join gate's dim CTE. */
  private val scd2DimSql =
    """WITH s1 AS (
      |  SELECT o_custkey AS cust, CAST(max(o_orderdate) AS VARCHAR) AS last_dt,
      |    COUNT(*) AS n_orders
      |  FROM orders WHERE o_orderdate <= DATE '1995-12-31' GROUP BY 1),
      |s2 AS (
      |  SELECT o_custkey AS cust, CAST(max(o_orderdate) AS VARCHAR) AS last_dt,
      |    COUNT(*) AS n_orders
      |  FROM orders WHERE o_orderdate <= DATE '1996-12-31' GROUP BY 1),
      |chg AS (
      |  SELECT s1.cust FROM s1 JOIN s2 ON s1.cust = s2.cust
      |  WHERE s1.last_dt <> s2.last_dt OR s1.n_orders <> s2.n_orders)
      |SELECT s1.cust, s1.last_dt, s1.n_orders,
      |  '1996-01-01' AS valid_from, '1997-01-01' AS valid_to,
      |  FALSE AS is_current
      |FROM s1 WHERE s1.cust IN (SELECT cust FROM chg)
      |UNION ALL
      |SELECT s2.cust, s2.last_dt, s2.n_orders,
      |  '1997-01-01', CAST(NULL AS VARCHAR), TRUE
      |FROM s2 WHERE s2.cust IN (SELECT cust FROM chg)
      |UNION ALL
      |SELECT s1.cust, s1.last_dt, s1.n_orders,
      |  '1996-01-01', CAST(NULL AS VARCHAR), TRUE
      |FROM s1 JOIN s2 ON s1.cust = s2.cust
      |WHERE s1.cust NOT IN (SELECT cust FROM chg)
      |UNION ALL
      |SELECT s2.cust, s2.last_dt, s2.n_orders,
      |  '1997-01-01', CAST(NULL AS VARCHAR), TRUE
      |FROM s2 LEFT JOIN s1 ON s2.cust = s1.cust WHERE s1.cust IS NULL""".stripMargin

  private val ordersMirrorSql =
    """SELECT o_orderkey AS k, o_orderstatus AS st,
      |  CAST(o_totalprice AS DOUBLE) AS total,
      |  CAST(o_orderdate AS VARCHAR) AS dt
      |FROM orders""".stripMargin

  /** Post-v1 state of the bucketedHistory fixture AND the clone gate's
    * copy-on-write result: an unconditional upsert of the 1995H2-1996H1
    * delta into the ≤1995 base. */
  private val bucketedPostV1Sql =
    """WITH b AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(o_totalprice AS DOUBLE) AS total,
      |    CAST(o_orderdate AS VARCHAR) AS dt, 'base' AS tag
      |  FROM orders WHERE o_orderdate <= DATE '1995-12-31'),
      |d AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(o_totalprice AS DOUBLE) AS total,
      |    CAST(o_orderdate AS VARCHAR) AS dt, 'd1' AS tag
      |  FROM orders
      |  WHERE o_orderdate BETWEEN DATE '1995-07-01' AND DATE '1996-06-30')
      |SELECT coalesce(d.k, b.k) AS k,
      |  CASE WHEN d.k IS NOT NULL THEN d.st ELSE b.st END AS st,
      |  CASE WHEN d.k IS NOT NULL THEN d.total ELSE b.total END AS total,
      |  CASE WHEN d.k IS NOT NULL THEN d.dt ELSE b.dt END AS dt,
      |  CASE WHEN d.k IS NOT NULL THEN d.tag ELSE b.tag END AS tag
      |FROM b FULL OUTER JOIN d ON b.k = d.k""".stripMargin

  private val dmlUpdatedSql =
    """SELECT o_orderkey AS k, o_orderstatus AS st,
      |  CASE WHEN o_orderstatus <> 'F'
      |       THEN CAST(o_totalprice AS DOUBLE) + 1000.0
      |       ELSE CAST(o_totalprice AS DOUBLE) END AS total,
      |  CAST(o_orderdate AS VARCHAR) AS dt
      |FROM orders WHERE o_orderdate <= DATE '1997-12-31'""".stripMargin

  /** Shared oracle CTE for the incremental-view gates: DuckDB recomputes
    * the fixture's merge (update-when-not-F / delete-when-F / insert)
    * from scratch — keeps ∪ updates ∪ inserts. */
  private val viewMergedCte =
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_custkey AS cust,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS total, o_orderstatus AS st
      |  FROM orders WHERE o_orderdate <= DATE '1995-12-31'),
      |d AS (
      |  SELECT o_orderkey AS k, o_custkey % 500 AS cust,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2))
      |         + CAST(100 AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS total,
      |    o_orderstatus AS st
      |  FROM orders
      |  WHERE o_orderdate BETWEEN DATE '1995-07-01' AND DATE '1996-06-30'),
      |merged AS (
      |  SELECT base.cust AS cust, base.total AS total
      |  FROM base LEFT JOIN d ON base.k = d.k WHERE d.k IS NULL
      |  UNION ALL
      |  SELECT d.cust, d.total FROM base JOIN d ON base.k = d.k
      |  WHERE d.st <> 'F'
      |  UNION ALL
      |  SELECT d.cust, d.total FROM d LEFT JOIN base ON d.k = base.k
      |  WHERE base.k IS NULL)
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_bucketed_clone" -> bucketedPostV1Sql,
    "q_bucketed_restore" -> bucketedPostV1Sql,
    "q_bucketed_lookup" ->
      (s"WITH m AS (\n$bucketedPostV1Sql\n)\n" +
        """SELECT k, st, total, dt, tag FROM m
          |WHERE k IN (SELECT k FROM m ORDER BY k LIMIT 5)""".stripMargin),
    "q_table_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt
        |  FROM orders WHERE o_orderdate <= DATE '1997-12-31')
        |SELECT k, st,
        |  CASE WHEN dt >= '1996-07-01' THEN total + 1000.0 ELSE total END AS total,
        |  dt,
        |  CASE WHEN dt < '1996-07-01' THEN 'delete' ELSE 'update' END AS action
        |FROM base
        |WHERE dt < '1996-07-01' OR st <> 'F'""".stripMargin,
    "q_bucketed_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt, 'base' AS tag
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31'),
        |d1 AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt, 'd1' AS tag
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1995-07-01' AND DATE '1996-06-30'),
        |d2 AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt, 'd2' AS tag
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
        |m1 AS (
        |  SELECT coalesce(d.k, b.k) AS k,
        |    CASE WHEN d.k IS NOT NULL THEN d.st ELSE b.st END AS st,
        |    CASE WHEN d.k IS NOT NULL THEN d.total ELSE b.total END AS total,
        |    CASE WHEN d.k IS NOT NULL THEN d.dt ELSE b.dt END AS dt,
        |    CASE WHEN d.k IS NOT NULL THEN d.tag ELSE b.tag END AS tag
        |  FROM base b FULL OUTER JOIN d1 d ON b.k = d.k),
        |m2 AS (
        |  SELECT coalesce(d.k, m.k) AS k,
        |    CASE WHEN d.k IS NOT NULL THEN d.st ELSE m.st END AS st,
        |    CASE WHEN d.k IS NOT NULL THEN d.total ELSE m.total END AS total,
        |    CASE WHEN d.k IS NOT NULL THEN d.dt ELSE m.dt END AS dt,
        |    CASE WHEN d.k IS NOT NULL THEN d.tag ELSE m.tag END AS tag
        |  FROM m1 m FULL OUTER JOIN d2 d ON m.k = d.k
        |  WHERE (m.k IS NOT NULL AND d.k IS NULL)
        |     OR (d.k IS NOT NULL AND m.k IS NULL)
        |     OR (m.k IS NOT NULL AND d.k IS NOT NULL AND d.st <> 'F'))
        |SELECT coalesce(a.k, b.k) AS k,
        |  CASE WHEN a.k IS NOT NULL THEN a.st ELSE b.st END AS st,
        |  CASE WHEN a.k IS NOT NULL THEN a.total ELSE b.total END AS total,
        |  CASE WHEN a.k IS NOT NULL THEN a.dt ELSE b.dt END AS dt,
        |  CASE WHEN a.k IS NOT NULL THEN a.tag ELSE b.tag END AS tag,
        |  CASE WHEN b.k IS NULL THEN 'insert'
        |       WHEN a.k IS NULL THEN 'delete'
        |       ELSE 'update' END AS action
        |FROM base b FULL OUTER JOIN m2 a ON b.k = a.k
        |WHERE b.k IS NULL OR a.k IS NULL
        |   OR a.st IS DISTINCT FROM b.st
        |   OR a.total IS DISTINCT FROM b.total
        |   OR a.dt IS DISTINCT FROM b.dt
        |   OR a.tag IS DISTINCT FROM b.tag""".stripMargin,
    "q_table_constraints" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31'),
        |d AS (
        |  SELECT k, CASE WHEN k % 13 = 0 THEN 'X' ELSE st END AS st,
        |    CASE WHEN k % 10 = 0 THEN -total ELSE total END AS total, dt
        |  FROM (
        |    SELECT o_orderkey AS k, o_orderstatus AS st,
        |      CAST(o_totalprice AS DOUBLE) AS total,
        |      CAST(o_orderdate AS VARCHAR) AS dt
        |    FROM orders
        |    WHERE o_orderdate BETWEEN DATE '1995-07-01' AND DATE '1996-06-30')),
        |good AS (SELECT * FROM d WHERE total >= 0 AND st IN ('F','O','P')),
        |bad AS (SELECT * FROM d WHERE NOT (total >= 0 AND st IN ('F','O','P'))),
        |merged AS (
        |  SELECT coalesce(g.k, b.k) AS k,
        |    CASE WHEN g.k IS NOT NULL THEN g.st ELSE b.st END AS st,
        |    CASE WHEN g.k IS NOT NULL THEN g.total ELSE b.total END AS total,
        |    CASE WHEN g.k IS NOT NULL THEN g.dt ELSE b.dt END AS dt
        |  FROM base b FULL OUTER JOIN good g ON b.k = g.k)
        |SELECT k, st, total, dt, 'live' AS zone FROM merged
        |UNION ALL
        |SELECT k, st, total, dt, 'quarantine' AS zone FROM bad""".stripMargin,
    "q_view_incremental" -> (viewMergedCte +
      """SELECT cust, COUNT(*) AS n, CAST(SUM(total) AS DOUBLE) AS total_sum
        |FROM merged GROUP BY cust""".stripMargin),
    // The MoR feed must be drop-in identical to the copy-on-write feed —
    // same oracle by construction.
    "q_view_incremental_mor" -> (viewMergedCte +
      """SELECT cust, COUNT(*) AS n, CAST(SUM(total) AS DOUBLE) AS total_sum
        |FROM merged GROUP BY cust""".stripMargin),
    "q_view_refresh" -> (viewMergedCte +
      """SELECT cust, COUNT(*) AS n, CAST(MIN(total) AS DOUBLE) AS mn,
        |  CAST(MAX(total) AS DOUBLE) AS mx
        |FROM merged GROUP BY cust""".stripMargin),
    "q_scd2_dim" -> scd2DimSql,
    // Temporal join: the dim CTE is the q_scd2_dim oracle verbatim; each
    // fact attaches the version valid at its own date (string-ISO compare
    // on both engines — timestamps render identically).
    "q_scd2_join" -> (s"WITH dim AS (\n$scd2DimSql\n)\n" +
      """SELECT f.o_orderkey AS k, f.o_custkey AS cust,
        |  CAST(f.o_orderdate AS VARCHAR) AS dt,
        |  d.last_dt, d.n_orders, d.valid_from
        |FROM orders f
        |LEFT JOIN dim d ON d.cust = f.o_custkey
        |  AND d.valid_from <= CAST(f.o_orderdate AS VARCHAR)
        |  AND (d.valid_to IS NULL OR d.valid_to > CAST(f.o_orderdate AS VARCHAR))
        |WHERE f.o_orderdate BETWEEN DATE '1995-06-01' AND DATE '1997-06-30'""".stripMargin),
    "q_scd2_asof" ->
      """WITH s1 AS (
        |  SELECT o_custkey AS cust, CAST(max(o_orderdate) AS VARCHAR) AS last_dt,
        |    COUNT(*) AS n_orders
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31' GROUP BY 1),
        |s2 AS (
        |  SELECT o_custkey AS cust, CAST(max(o_orderdate) AS VARCHAR) AS last_dt,
        |    COUNT(*) AS n_orders
        |  FROM orders WHERE o_orderdate <= DATE '1996-12-31' GROUP BY 1),
        |chg AS (
        |  SELECT s1.cust FROM s1 JOIN s2 ON s1.cust = s2.cust
        |  WHERE s1.last_dt <> s2.last_dt OR s1.n_orders <> s2.n_orders)
        |SELECT s1.cust, s1.last_dt, s1.n_orders,
        |  '1996-01-01' AS valid_from,
        |  CASE WHEN s1.cust IN (SELECT cust FROM chg)
        |       THEN '1997-01-01' ELSE CAST(NULL AS VARCHAR) END AS valid_to,
        |  s1.cust NOT IN (SELECT cust FROM chg) AS is_current
        |FROM s1""".stripMargin,
    "q_table_dml" ->
      (dmlUpdatedSql + " AND o_orderdate >= DATE '1996-07-01'"),
    "q_table_clone" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31'),
        |d AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-06-30')
        |SELECT coalesce(d.k, base.k) AS k,
        |  CASE WHEN d.k IS NOT NULL THEN d.st ELSE base.st END AS st,
        |  CASE WHEN d.k IS NOT NULL THEN d.total ELSE base.total END AS total,
        |  CASE WHEN d.k IS NOT NULL THEN d.dt ELSE base.dt END AS dt
        |FROM base FULL JOIN d ON base.k = d.k""".stripMargin,
    "q_table_generated" ->
      """SELECT o_orderkey AS k, o_orderstatus AS st,
        |  CAST(o_totalprice AS DOUBLE) AS total,
        |  CAST(o_orderdate AS VARCHAR) AS dt,
        |  substring(CAST(o_orderdate AS VARCHAR), 1, 4) AS yr
        |FROM orders WHERE o_orderdate <= DATE '1996-12-31'""".stripMargin,
    "q_table_compact_small" ->
      """SELECT l_orderkey AS k, l_linenumber AS ln,
        |  CAST(l_quantity AS DOUBLE) AS qty, l_returnflag AS rf
        |FROM lineitem""".stripMargin,
    "q_table_bloom" ->
      """SELECT o_orderkey AS k, o_orderstatus AS st,
        |  CAST(o_totalprice AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderkey IN ((SELECT min(o_orderkey) FROM orders),
        |                     (SELECT max(o_orderkey) FROM orders))""".stripMargin,
    "q_table_wap" ->
      """SELECT o_orderkey AS k, o_orderstatus AS st,
        |  CAST(o_totalprice AS DOUBLE) AS total,
        |  CAST(o_orderdate AS VARCHAR) AS dt
        |FROM orders WHERE o_orderdate <= DATE '1996-06-30'""".stripMargin,
    "q_table_merge_mor" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31'),
        |d1 AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) + 50000.0 AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1995-07-01' AND DATE '1996-06-30'),
        |m1 AS (
        |  SELECT * FROM d1
        |  UNION ALL
        |  SELECT b.* FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM d1 WHERE d1.k = b.k)),
        |d2 AS (
        |  SELECT o_orderkey AS k FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'
        |    AND CAST(o_totalprice AS DOUBLE) > 200000.0)
        |SELECT m1.* FROM m1
        |WHERE NOT EXISTS (SELECT 1 FROM d2 WHERE d2.k = m1.k)""".stripMargin,
    "q_table_update_dv" ->
      """WITH s1 AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CASE WHEN o_orderstatus = 'F'
        |         THEN CAST(o_totalprice AS DOUBLE) + 100000.0
        |         ELSE CAST(o_totalprice AS DOUBLE) END AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt
        |  FROM orders),
        |s2 AS (SELECT * FROM s1 WHERE NOT (total > 400000.0))
        |SELECT k,
        |  CASE WHEN dt < '1995-06-01' THEN 'X' ELSE st END AS st,
        |  total, dt
        |FROM s2""".stripMargin,
    "q_table_delete_dv" ->
      """SELECT o_orderkey AS k, o_orderstatus AS st,
        |  CAST(o_totalprice AS DOUBLE) AS total,
        |  CAST(o_orderdate AS VARCHAR) AS dt
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F')
        |  AND NOT (CAST(o_totalprice AS DOUBLE) > 250000.0)""".stripMargin,
    "q_table_replace_where" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt
        |  FROM orders),
        |v1 AS (
        |  SELECT * FROM o
        |  WHERE NOT (dt BETWEEN '1995-01-01' AND '1995-06-30')
        |  UNION ALL
        |  SELECT k, st, total * 2.0 AS total, dt FROM o
        |  WHERE dt BETWEEN '1995-01-01' AND '1995-06-30' AND k % 2 = 0)
        |SELECT * FROM v1 WHERE NOT (dt >= '1996-01-01' AND st = 'O')
        |UNION ALL
        |SELECT k, st, 0.0 AS total, dt FROM o
        |WHERE dt >= '1996-01-01' AND st = 'O'""".stripMargin,
    "q_table_restore" -> dmlUpdatedSql,
    "q_bucketed_cdf" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt, 'base' AS tag
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31'),
        |d AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt, 'delta' AS tag
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1995-07-01' AND DATE '1996-06-30')
        |SELECT d.k,
        |  CASE WHEN base.k IS NULL OR d.st <> 'F' THEN d.st ELSE base.st END AS st,
        |  CASE WHEN base.k IS NULL OR d.st <> 'F' THEN d.total ELSE base.total END AS total,
        |  CASE WHEN base.k IS NULL OR d.st <> 'F' THEN d.dt ELSE base.dt END AS dt,
        |  CASE WHEN base.k IS NULL OR d.st <> 'F' THEN d.tag ELSE base.tag END AS tag,
        |  CASE WHEN base.k IS NULL THEN 'insert'
        |       WHEN d.st <> 'F' THEN 'update' ELSE 'delete' END AS action
        |FROM d LEFT JOIN base ON d.k = base.k""".stripMargin,
    "q_merge_evolution" ->
      """WITH t AS (
        |  SELECT o_custkey AS cust, COUNT(*) AS n_orders
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31' GROUP BY 1),
        |s AS (
        |  SELECT o_custkey AS cust, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  GROUP BY 1)
        |SELECT coalesce(s.cust, t.cust) AS cust,
        |  CASE WHEN s.cust IS NOT NULL THEN s.n_orders
        |       ELSE t.n_orders END AS n_orders,
        |  s.total AS total
        |FROM t FULL JOIN s ON t.cust = s.cust""".stripMargin,
    "q_bucketed_update" ->
      """SELECT o_orderkey AS k,
        |  CASE WHEN o_orderstatus = 'F' THEN 'R' ELSE o_orderstatus END AS st,
        |  CASE WHEN o_orderstatus = 'F'
        |       THEN CAST(o_totalprice AS DOUBLE) + 50000.0
        |       ELSE CAST(o_totalprice AS DOUBLE) END AS total,
        |  CAST(o_orderdate AS VARCHAR) AS dt
        |FROM orders WHERE o_orderdate <= DATE '1996-06-30'""".stripMargin,
    "q_bucketed_delete" ->
      """SELECT o_orderkey AS k, o_orderstatus AS st,
        |  CAST(o_totalprice AS DOUBLE) AS total,
        |  CAST(o_orderdate AS VARCHAR) AS dt
        |FROM orders
        |WHERE o_orderdate <= DATE '1996-06-30'
        |  AND NOT (o_orderstatus = 'F'
        |           AND CAST(o_orderdate AS VARCHAR) < '1995-07-01')""".stripMargin,
    "q_bucketed_replace" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt
        |  FROM orders WHERE o_orderdate <= DATE '1996-06-30')
        |SELECT * FROM o
        |WHERE NOT (dt BETWEEN '1995-01-01' AND '1995-06-30')
        |UNION ALL
        |SELECT k, st, total * 2.0 AS total, dt FROM o
        |WHERE dt BETWEEN '1995-01-01' AND '1995-06-30' AND k % 2 = 0""".stripMargin,
    "q_bucketed_evolution" ->
      """WITH t AS (
        |  SELECT o_custkey AS cust, COUNT(*) AS n_orders
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31' GROUP BY 1),
        |s AS (
        |  SELECT o_custkey AS cust, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  GROUP BY 1)
        |SELECT coalesce(s.cust, t.cust) AS cust,
        |  CASE WHEN s.cust IS NOT NULL THEN s.n_orders
        |       ELSE t.n_orders END AS n_orders,
        |  s.total AS total
        |FROM t FULL JOIN s ON t.cust = s.cust""".stripMargin,
    "q_table_timetravel" ->
      """SELECT o_custkey AS cust, CAST(max(o_orderdate) AS VARCHAR) AS last_dt,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderdate <= DATE '1995-12-31' GROUP BY 1""".stripMargin,
    "q_table_rename" ->
      """SELECT o_orderkey AS k, o_custkey AS customer_id,
        |  CAST(o_totalprice AS DOUBLE) AS total_price
        |FROM orders""".stripMargin,
    "q_table_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS INTEGER), CAST(1000 AS BIGINT),
        |   'job=curated from=19950101 to=19961231'),
        |  (CAST(1 AS INTEGER), CAST(2000 AS BIGINT), CAST(NULL AS VARCHAR)),
        |  (CAST(2 AS INTEGER), CAST(3000 AS BIGINT), 'job=backfill budget=100'))
        |  AS t(version, commit_ms, user_metadata)""".stripMargin,
    // timestampAsOf must land exactly where versionAsOf lands: shared bar.
    "q_table_timetravel_ts" ->
      """SELECT o_custkey AS cust, CAST(max(o_orderdate) AS VARCHAR) AS last_dt,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderdate <= DATE '1995-12-31' GROUP BY 1""".stripMargin,
    "q_table_cdf" ->
      """WITH t AS (
        |  SELECT o_custkey AS cust, CAST(max(o_orderdate) AS VARCHAR) AS last_dt,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31' GROUP BY 1),
        |s AS (
        |  SELECT o_custkey AS cust, CAST(max(o_orderdate) AS VARCHAR) AS last_dt,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderdate <= DATE '1996-12-31' GROUP BY 1)
        |SELECT s.cust,
        |  CASE WHEN t.cust IS NULL OR s.last_dt > t.last_dt
        |       THEN s.last_dt ELSE t.last_dt END AS last_dt,
        |  CASE WHEN t.cust IS NULL OR s.last_dt > t.last_dt
        |       THEN s.n_orders ELSE t.n_orders END AS n_orders,
        |  CASE WHEN t.cust IS NULL OR s.last_dt > t.last_dt
        |       THEN s.total ELSE t.total END AS total,
        |  CASE WHEN t.cust IS NULL THEN 'insert'
        |       WHEN s.last_dt > t.last_dt THEN 'update'
        |       ELSE 'delete' END AS action
        |FROM s LEFT JOIN t ON s.cust = t.cust""".stripMargin,
    "q_table_skipping" ->
      """SELECT l_orderkey AS k, l_linenumber AS ln, l_partkey AS part,
        |  l_suppkey AS supp, CAST(l_quantity AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_partkey BETWEEN 10 AND 120
        |  AND l_suppkey BETWEEN 1 AND 50""".stripMargin,
    "q_table_skipping_str" ->
      """SELECT o_orderkey AS k,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
        |  CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders
        |WHERE CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
        |  BETWEEN '1995-01-01' AND '1995-12-31'""".stripMargin,
    "q_table_optimize" ->
      """SELECT l_orderkey AS k, l_linenumber AS ln, l_partkey AS part,
        |  l_suppkey AS supp, CAST(l_quantity AS DOUBLE) AS qty,
        |  CAST(l_extendedprice AS DOUBLE) AS price
        |FROM lineitem WHERE l_shipdate <= DATE '1998-12-31'""".stripMargin,
    "q_s7_orc_mirror" -> ordersMirrorSql,
    "q_csv_roundtrip" ->
      """SELECT c_custkey AS k, c_name AS name,
        |  c_mktsegment || ', "segment"' AS hostile,
        |  c_acctbal AS bal, c_nationkey AS nk
        |FROM customer""".stripMargin,
    "q_s11_jdbc_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
        |  CAST(n_regionkey AS BIGINT) AS rk
        |FROM nation""".stripMargin,
    "q_s10_external_table" -> ordersMirrorSql,
    "q_w2_hist_grain" ->
      """WITH f AS (
        |  SELECT o_custkey AS cust, CAST(o_orderdate AS VARCHAR) AS dt,
        |         o_orderkey AS k, 'f' AS side
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1995-07-01' AND DATE '1996-06-30'),
        |c AS (
        |  SELECT o_custkey AS cust, CAST(o_orderdate AS VARCHAR) AS dt,
        |         o_orderkey AS k, 'c' AS side
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'),
        |u AS (SELECT * FROM f UNION ALL SELECT * FROM c),
        |r AS (SELECT *, row_number() OVER (PARTITION BY cust, dt
        |        ORDER BY k DESC, side DESC) AS rn FROM u)
        |SELECT cust, dt, k, side FROM r WHERE rn = 1""".stripMargin,
    "q_s12_surrogate_keys" ->
      """WITH mapping AS (
        |  SELECT c_name AS nat_key, CAST(c_custkey AS BIGINT) AS sk
        |  FROM customer WHERE c_custkey % 2 = 0),
        |inc AS (SELECT DISTINCT c_name AS nat_key FROM customer
        |        WHERE c_custkey % 3 = 0),
        |new_keys AS (
        |  SELECT i.nat_key FROM inc i
        |  LEFT JOIN mapping m ON i.nat_key = m.nat_key WHERE m.nat_key IS NULL),
        |mx AS (SELECT coalesce(max(sk), 0) AS m FROM mapping)
        |SELECT nat_key, sk FROM mapping
        |UNION ALL
        |SELECT nat_key,
        |  CAST(m + row_number() OVER (ORDER BY nat_key) AS BIGINT) AS sk
        |FROM new_keys CROSS JOIN mx""".stripMargin,
    "q_merge_threeway" ->
      """WITH hist AS (
        |  SELECT o_custkey AS cust, CAST(o_orderdate AS VARCHAR) AS dt,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1, 2),
        |src AS (
        |  SELECT cust, dt, n_orders, total,
        |    lead(n_orders) OVER (PARTITION BY cust ORDER BY dt DESC) AS n_orders_old
        |  FROM hist),
        |src_f AS (
        |  SELECT *, NOT (n_orders IS NOT DISTINCT FROM n_orders_old) AS chg FROM src),
        |tgt AS (
        |  SELECT cust, dt, n_orders, total,
        |    lead(n_orders) OVER (PARTITION BY cust ORDER BY dt DESC) AS n_orders_old
        |  FROM hist WHERE dt <= '1996-12-31'),
        |tgt_f AS (
        |  SELECT *, NOT (n_orders IS NOT DISTINCT FROM n_orders_old) AS chg FROM tgt)
        |SELECT
        |  coalesce(s.cust, t.cust) AS cust, coalesce(s.dt, t.dt) AS dt,
        |  CASE WHEN s.cust IS NOT NULL AND s.chg THEN s.n_orders ELSE t.n_orders END AS n_orders,
        |  CASE WHEN s.cust IS NOT NULL AND s.chg THEN s.total ELSE t.total END AS total,
        |  CASE WHEN s.cust IS NOT NULL AND s.chg THEN s.n_orders_old ELSE t.n_orders_old END AS n_orders_old,
        |  CASE WHEN s.cust IS NOT NULL AND s.chg THEN s.chg ELSE t.chg END AS n_orders_changed_flag,
        |  CASE WHEN s.cust IS NOT NULL AND s.chg THEN s.chg ELSE t.chg END AS iu_flag
        |FROM tgt_f t FULL OUTER JOIN src_f s ON t.cust = s.cust AND t.dt = s.dt
        |WHERE (s.cust IS NOT NULL AND s.chg)
        |   OR (t.cust IS NOT NULL AND s.cust IS NULL)""".stripMargin,
    "q_lifecycle_table" ->
      """WITH l95 AS (
        |  SELECT o_custkey AS cust, CAST(max(o_orderdate) AS VARCHAR) AS last_dt,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31' GROUP BY 1),
        |l96 AS (
        |  SELECT o_custkey AS cust, CAST(max(o_orderdate) AS VARCHAR) AS last_dt,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderdate <= DATE '1996-12-31' GROUP BY 1)
        |SELECT l96.cust, l96.last_dt, l96.n_orders, l96.total
        |FROM l96 LEFT JOIN l95 ON l96.cust = l95.cust
        |WHERE l95.cust IS NULL OR l96.last_dt > l95.last_dt""".stripMargin,
    "q_bucketed_timetravel" -> bucketedPostV1Sql,
    "q_bucketed_optimize" -> bucketedPostV1Sql,
    "q_lifecycle_bucketed" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt, 'base' AS tag
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31'),
        |d1 AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt, 'd1' AS tag
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1995-07-01' AND DATE '1996-06-30'),
        |d2 AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt, 'd2' AS tag
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
        |m1 AS (
        |  SELECT coalesce(d.k, b.k) AS k,
        |    CASE WHEN d.k IS NOT NULL THEN d.st ELSE b.st END AS st,
        |    CASE WHEN d.k IS NOT NULL THEN d.total ELSE b.total END AS total,
        |    CASE WHEN d.k IS NOT NULL THEN d.dt ELSE b.dt END AS dt,
        |    CASE WHEN d.k IS NOT NULL THEN d.tag ELSE b.tag END AS tag
        |  FROM base b FULL OUTER JOIN d1 d ON b.k = d.k)
        |SELECT coalesce(d.k, m.k) AS k,
        |  CASE WHEN d.k IS NOT NULL THEN d.st ELSE m.st END AS st,
        |  CASE WHEN d.k IS NOT NULL THEN d.total ELSE m.total END AS total,
        |  CASE WHEN d.k IS NOT NULL THEN d.dt ELSE m.dt END AS dt,
        |  CASE WHEN d.k IS NOT NULL THEN d.tag ELSE m.tag END AS tag
        |FROM m1 m FULL OUTER JOIN d2 d ON m.k = d.k
        |WHERE (m.k IS NOT NULL AND d.k IS NULL)
        |   OR (d.k IS NOT NULL AND m.k IS NULL)
        |   OR (m.k IS NOT NULL AND d.k IS NOT NULL AND d.st <> 'F')""".stripMargin,
    "q_bucketed_merge" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt, 'base' AS tag
        |  FROM orders WHERE o_orderdate <= DATE '1995-12-31'),
        |d AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(o_totalprice AS DOUBLE) AS total,
        |    CAST(o_orderdate AS VARCHAR) AS dt, 'delta' AS tag
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1995-07-01' AND DATE '1996-06-30')
        |SELECT coalesce(d.k, b.k) AS k,
        |  CASE WHEN d.k IS NOT NULL THEN d.st ELSE b.st END AS st,
        |  CASE WHEN d.k IS NOT NULL THEN d.total ELSE b.total END AS total,
        |  CASE WHEN d.k IS NOT NULL THEN d.dt ELSE b.dt END AS dt,
        |  CASE WHEN d.k IS NOT NULL THEN d.tag ELSE b.tag END AS tag
        |FROM b FULL OUTER JOIN d ON b.k = d.k
        |WHERE (b.k IS NOT NULL AND d.k IS NULL)
        |   OR (d.k IS NOT NULL AND b.k IS NULL)
        |   OR (b.k IS NOT NULL AND d.k IS NOT NULL AND d.st <> 'F')""".stripMargin)
}
