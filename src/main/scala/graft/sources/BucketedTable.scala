package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Hash-bucketed managed table — the 100 TB upgrade of [[ManagedTable]]'s
  * whole-snapshot MERGE. The table is split into `nBuckets` key-hash
  * buckets; each version directory materializes ONLY the buckets the merge
  * touched, and a manifest maps every bucket to the newest version that
  * holds it (a miniature LSM/Iceberg-style metadata layer, built from
  * public designs):
  *
  * {{{
  *   <root>/v0/b00000/ ... b00031/      initial full write
  *   <root>/v1/b00007/                  merge that touched bucket 7 only
  *   <root>/v1/_manifest                bucket -> "v0" | "v1" (one line each)
  *   <root>/_latest                     live version pointer (atomic swap)
  * }}}
  *
  * MERGE cost is therefore proportional to the DELTA: the source is
  * bucketed, only manifest entries for source buckets are read and
  * rewritten, and untouched buckets are carried forward by reference.
  * At 100 TB with a daily delta touching 1% of buckets, the rewrite is
  * ~1 TB instead of 100 TB — and the merge join only shuffles the touched
  * buckets' rows. Readers always see one consistent manifest (immutable
  * version dirs + atomic pointer swap, same protocol as ManagedTable).
  */
object BucketedTable extends VersionedLayout {

  /** `schema` is the table's LOGICAL schema, versioned with the manifest
    * (`_schema.json`, the Delta/Iceberg schema-in-the-log design): after a
    * schema-evolving merge, untouched buckets still hold files WITHOUT the
    * new columns — reading through the recorded schema fills them with
    * nulls (the parquet reader's missing-column behavior), so evolution
    * never rewrites a bucket it didn't touch. `None` only for tables
    * created before schemas were recorded (reads fall back to
    * file-inferred schema). */
  final case class Meta(version: Int, nBuckets: Int, keys: Seq[String],
                        manifest: Map[Int, String],
                        schema: Option[org.apache.spark.sql.types.StructType])

  private def bucketCol(keys: Seq[String], nBuckets: Int) =
    pmod(hash(keys.map(col): _*), lit(nBuckets))

  private def readMeta(root: String): Meta =
    readMetaAt(root, currentVersion(root))

  private def readMetaAt(root: String, v: Int): Meta = {
    val lines = Files.readAllLines(Paths.get(root, s"v$v", "_manifest")).asScala
    val header = lines.head.split(",") // nBuckets,key1;key2
    val schemaFile = Paths.get(root, s"v$v", "_schema.json")
    val schema =
      if (Files.exists(schemaFile))
        Some(org.apache.spark.sql.types.DataType
          .fromJson(Files.readString(schemaFile))
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      else None
    Meta(v, header(0).toInt, header(1).split(";").toIndexedSeq,
      lines.tail.map { l =>
        val Array(b, ver) = l.split(",", 2); b.toInt -> ver
      }.toMap, schema)
  }

  private def writeVersion(root: String, version: Int, nBuckets: Int,
                           keys: Seq[String], manifest: Map[Int, String],
                           schema: Option[org.apache.spark.sql.types.StructType])
      : Unit = {
    val dir = Paths.get(root, s"v$version")
    Files.createDirectories(dir)
    schema.foreach(s0 => Files.writeString(dir.resolve("_schema.json"), s0.json))
    val body = (s"$nBuckets,${keys.mkString(";")}" +:
      manifest.toSeq.sortBy(_._1).map { case (b, v) => s"$b,$v" }).mkString("\n")
    Files.writeString(dir.resolve("_manifest"), body)
    swapPointer(root, version)
  }

  /** A reader pinned to the meta's recorded schema when one exists —
    * bucket files predating a schema evolution lack the new columns and
    * must read as null-filled, not fail or drop them. */
  private def readerFor(spark: SparkSession, meta: Meta) =
    meta.schema.fold(spark.read)(s0 => spark.read.schema(s0))

  /** A manifest entry is either a local version name ("v3") or — after a
    * [[shallowClone]] — an ABSOLUTE version-dir path into another table's
    * root ("/…/src/v3"): the clone's untouched buckets resolve straight
    * into the source table's immutable files, zero bytes copied. */
  private def bucketDir(root: String, ver: String, b: Int): String =
    if (ver.startsWith("/")) f"$ver/b$b%05d" else f"$root/$ver/b$b%05d"

  /** Scoped directory listing — `Files.list` holds an OS directory handle
    * until closed; consume the iterator inside `f` only. */
  private def listDir[A](dir: Path)(f: Iterator[Path] => A): A = {
    val st = Files.list(dir)
    try f(st.iterator().asScala) finally st.close()
  }

  private def hasParquet(dir: String): Boolean =
    listDir(Paths.get(dir))(_.exists(_.getFileName.toString.endsWith(".parquet")))

  /** Remove the partitionBy staging dir once its buckets are moved out. */
  private def dropStaging(root: String, ver: Int): Unit = {
    ScratchDirs.deleteRecursively(Paths.get(s"$root/v$ver/_data"))
  }

  /** Initial full write: every bucket lands in v0. */
  def create(root: String, df: DataFrame, keys: Seq[String], nBuckets: Int): Unit = {
    val withB = Constraints.enforce(df, Constraints.load(root))
      .withColumn("_bucket", bucketCol(keys, nBuckets))
    withB.write.mode("overwrite").partitionBy("_bucket")
      .parquet(s"$root/v0/_data")
    // Rename spark's _bucket=N dirs into stable bucket dirs so the manifest
    // can address them individually.
    (0 until nBuckets).foreach { b =>
      val src = Paths.get(s"$root/v0/_data/_bucket=$b")
      val dst = Paths.get(bucketDir(root, "v0", b))
      if (Files.exists(src)) Files.move(src, dst)
      else Files.createDirectories(dst) // empty bucket
    }
    dropStaging(root, 0)
    writeVersion(root, 0, nBuckets, keys,
      (0 until nBuckets).map(_ -> "v0").toMap, Some(df.schema))
  }

  /** Read the live table (all buckets via the manifest). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val meta = readMeta(root)
    readAt(spark, root, meta)
  }

  /** Time travel (Delta `versionAsOf` on the bucketed layout): resolve a
    * HISTORICAL manifest and read through it. Version dirs are immutable
    * and untouched buckets are carried by reference, so the old manifest
    * still addresses exactly the files that were live then — unless
    * vacuum's reachability sweep has reclaimed them, which fails here
    * with a clear error instead of a silent partial read. */
  def readVersion(spark: SparkSession, root: String, version: Int): DataFrame = {
    val live = currentVersion(root)
    // Same guard as ManagedTable.readVersion: a dir above the published
    // pointer is an in-flight publish or crash orphan, never served.
    require(version <= live,
      s"version $version of $root is not published yet (live is v$live)")
    require(Files.exists(Paths.get(root, s"v$version", "_manifest")),
      s"version $version of $root is not on disk (vacuumed or never " +
        s"published); live is v$live")
    val meta = readMetaAt(root, version)
    meta.manifest.foreach { case (b, ver) =>
      require(Files.exists(Paths.get(bucketDir(root, ver, b))),
        s"bucket $b of version $version ($ver) was vacuumed away")
    }
    readAt(spark, root, meta)
  }

  private def readAt(spark: SparkSession, root: String, meta: Meta): DataFrame = {
    val paths = meta.manifest.toSeq.sortBy(_._1)
      .map { case (b, ver) => bucketDir(root, ver, b) }
      .filter(hasParquet)
    readerFor(spark, meta).parquet(paths: _*)
  }

  /** RESTORE (Delta `RESTORE TABLE ... TO VERSION AS OF` on the bucketed
    * layout): republish a historical version's MANIFEST as the new head —
    * a metadata-only rollback (zero data bytes move; bucket dirs are
    * immutable and simply become referenced again). History stays linear:
    * the rollback is itself a version, so it can be time-traveled past or
    * restored again, and vacuum's reachability sweep protects every
    * bucket the restored manifest references. */
  def restore(spark: SparkSession, root: String, version: Int): Unit = {
    val meta = readMetaAt(root, version)
    meta.manifest.foreach { case (b, ver) =>
      require(Files.exists(Paths.get(bucketDir(root, ver, b))),
        s"cannot restore to v$version: bucket $b ($ver) was vacuumed away")
    }
    val live = currentVersion(root)
    // The restored head carries the restored version's SCHEMA too — a
    // rollback past a schema evolution narrows the table back.
    writeVersion(root, live + 1, meta.nBuckets, meta.keys, meta.manifest,
      meta.schema)
  }

  /** Point lookup — the 100 TB "read one key" path: the key hashes to
    * exactly one bucket, the live manifest names the one version dir
    * holding that bucket, and the scan opens ONLY those dirs —
    * 1/nBuckets of the table per looked-up key, however large the table.
    * Values must match the key column's stored type exactly (Murmur3 of
    * an int and a long differ). Single-column keys; composite-keyed
    * tables filter through [[read]]. The bucket ids are computed by one
    * length-bounded local job so driver and executors share one hash
    * implementation. */
  def lookup(spark: SparkSession, root: String, values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "lookup needs at least one key value")
    val meta = readMeta(root)
    require(meta.keys.size == 1,
      s"point lookup supports single-column keys; table has ${meta.keys}")
    val bucketCols = values.map(v => pmod(hash(lit(v)), lit(meta.nBuckets)))
    val row = spark.range(1).select(bucketCols: _*).head()
    val buckets = values.indices.map(row.getInt).distinct.sorted
    val paths = buckets.map(b => bucketDir(root, meta.manifest(b), b))
      .filter(hasParquet)
    val key = meta.keys.head
    if (paths.isEmpty) readAt(spark, root, meta).limit(0)
    else readerFor(spark, meta).parquet(paths: _*)
      .filter(col(key).isin(values: _*))
  }

  /** SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE src`): publish a
    * new table at `cloneRoot` whose v0 manifest references the SOURCE
    * table's live bucket dirs by absolute path — a metadata-only
    * operation: zero data bytes move, cost is O(nBuckets) manifest lines.
    * Subsequent merges into the clone are copy-on-write: touched buckets
    * materialize under the clone's own root while untouched ones keep
    * resolving into the source's immutable version dirs. At 100 TB this
    * branches a table for a dev/test/backfill experiment in milliseconds
    * and pays storage only for what diverges; the source is never written.
    *
    * Caveat (Delta shallow clones share it): VACUUM on the SOURCE sweeps
    * only the source's own retained manifests, so it can reclaim dirs a
    * clone still references — retain enough source versions for the
    * clone's lifetime. The clone's own vacuum walks only `cloneRoot` and
    * can never delete source files. */
  def shallowClone(sourceRoot: String, cloneRoot: String): Unit = {
    require(!exists(cloneRoot), s"clone target $cloneRoot already exists")
    val meta = readMeta(sourceRoot)
    val srcAbs = Paths.get(sourceRoot).toAbsolutePath.toString
    writeVersion(cloneRoot, 0, meta.nBuckets, meta.keys,
      meta.manifest.map { case (b, ver) =>
        b -> (if (ver.startsWith("/")) ver else s"$srcAbs/$ver")
      }, meta.schema)
  }

  /** Snapshot DIFF driven by the manifests (no recorded change feed
    * needed): insert/update/delete rows between two published versions,
    * tagged in `_action` ([[graft.operators.SnapshotDiff]] semantics —
    * deletes carry the pre-image, updates the post-image, identical rows
    * dropped). Buckets whose manifest entries are IDENTICAL in both
    * versions are provably unchanged (version dirs are immutable) and are
    * never opened: diffing two adjacent daily versions of a 100 TB table
    * reads only the buckets the day's merges touched, on BOTH sides. */
  def diff(spark: SparkSession, root: String,
           fromVersion: Int, toVersion: Int): DataFrame = {
    Seq(fromVersion, toVersion).foreach { v =>
      require(Files.exists(Paths.get(root, s"v$v", "_manifest")),
        s"version $v of $root is not on disk (vacuumed or never published)")
    }
    val mA = readMetaAt(root, fromVersion)
    val mB = readMetaAt(root, toVersion)
    require(mA.nBuckets == mB.nBuckets && mA.keys == mB.keys,
      s"diff across re-bucketing: v$fromVersion is (${mA.nBuckets}, " +
        s"${mA.keys.mkString(",")}), v$toVersion is (${mB.nBuckets}, " +
        s"${mB.keys.mkString(",")})")
    val changedBuckets = mA.manifest.keys.toSeq.sorted
      .filter(b => mA.manifest(b) != mB.manifest(b))
    def paths(meta: Meta): Seq[String] =
      changedBuckets.map(b => bucketDir(root, meta.manifest(b), b))
        .filter(hasParquet)
    val (pA, pB) = (paths(mA), paths(mB))
    // A side can be file-less (a version published before any data landed,
    // or a merge that emptied its buckets) — borrow the schema from
    // whichever side has files. Both sides empty → nothing ever differed.
    // Each side reads through its OWN version's recorded schema, so a
    // diff across a schema evolution sees pre-evolution rows null-filled.
    lazy val schemaOnly: DataFrame =
      spark.read.parquet((pA ++ pB).head).limit(0)
    def side(meta: Meta, p: Seq[String]): DataFrame =
      if (p.nonEmpty) readerFor(spark, meta).parquet(p: _*) else schemaOnly
    if (pA.isEmpty && pB.isEmpty)
      // no bucket of either version holds a row the other could lack;
      // an all-empty table has no schema on disk to type a frame with
      return spark.emptyDataFrame
        .withColumn(graft.operators.Merge.ActionCol, lit(""))
    graft.operators.SnapshotDiff.diffFrames(side(mA, pA), side(mB, pB), mB.keys)
  }

  /** Keyed MERGE touching only the buckets that contain source keys.
    * With `changeFeed`, the merge also lands its row-level changes as
    * `_changes/v<next>` BEFORE the pointer swap — and because a merge can
    * only insert/update/delete inside buckets containing source keys, the
    * delta-proportional feed equals the feed a whole-table merge would
    * produce: CDC cost scales with the delta, never the table. */
  def merge(spark: SparkSession, root: String, source: DataFrame,
            clauses: MergeClauses.Spec = MergeClauses.Spec(),
            changeFeed: Boolean = false,
            preImageFeed: Boolean = false,
            schemaEvolution: Boolean = false): Unit = {
    import graft.operators.Merge
    val meta = readMeta(root)
    val srcB = source.withColumn("_bucket", bucketCol(meta.keys, meta.nBuckets))
      .persist()
    // try/finally: an aborted merge (e.g. a CHECK-constraint violation in
    // the write) must not leave the source cache or the feed checkpoint
    // pinned in a session that catches the failure.
    try mergeInner(spark, root, meta, srcB, clauses, changeFeed, preImageFeed,
      schemaEvolution)
    finally srcB.unpersist()
  }

  /** OPTIMISTIC-CONCURRENCY merge — [[ManagedTable.commit]]'s multi-writer
    * contract on the bucketed layout. The caller names the version its
    * source derived from; the CAS check runs FIRST, under the shared
    * per-root monitor + cross-process file lock, and the delta-sized
    * merge + publish then complete while the lock is held — so a stale
    * writer fails fast ([[ManagedTable.ConcurrentWriteException]] carries
    * the new live version: re-read, re-derive, retry) before writing any
    * bucket, and racing writers can never interleave into one version
    * dir. Holding the lock through the (delta-proportional) merge is the
    * deliberate trade vs the managed table's stage-then-swap: bucket
    * writes land directly in `v<next>`, so there is no staged dir to
    * CAS-move, and a bucketed merge's cost is bounded by the touched
    * buckets, not the table. Single-writer tables keep using [[merge]];
    * mixing the two on one table forfeits the guarantee. */
  def commitMerge(spark: SparkSession, root: String, expectedVersion: Int,
                  source: DataFrame,
                  clauses: MergeClauses.Spec = MergeClauses.Spec()): Unit =
    withCommitLock(root) {
      val live = currentVersion(root)
      if (live != expectedVersion)
        throw new ManagedTable.ConcurrentWriteException(
          root, expectedVersion, live)
      merge(spark, root, source, clauses)
    }

  private def mergeInner(spark: SparkSession, root: String, meta: Meta,
                         srcB: DataFrame, clauses: MergeClauses.Spec,
                         changeFeed: Boolean, preImageFeed: Boolean,
                         schemaEvolution: Boolean): Unit = {
    import graft.operators.Merge
    val touched = srcB.select("_bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val touchedSet = touched.toSet

    val targetPaths = touched
      .map(b => bucketDir(root, meta.manifest(b), b))
      .filter(hasParquet)
    // Touched buckets may predate a schema evolution — read them through
    // the recorded table schema (null-filled), not file inference.
    val target =
      if (targetPaths.nonEmpty)
        readerFor(spark, meta).parquet(targetPaths.toIndexedSeq: _*)
      else meta.schema match {
        case Some(s0) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s0)
        case None => srcB.drop("_bucket").limit(0)
      }

    val next = meta.version + 1
    // With a feed, one merge join resolves snapshot AND feed (lazy
    // localCheckpoint — materialized by the feed write, reused by the
    // snapshot write); without one, the plain plan is left untouched.
    val taggedRaw = Merge
      .mergeFramesTagged(target, srcB.drop("_bucket"), meta.keys, clauses,
        schemaEvolution = schemaEvolution, preImage = preImageFeed)
    val tagged =
      if (changeFeed) taggedRaw.localCheckpoint(eager = false) else taggedRaw
    try {
      if (changeFeed)
        tagged.filter(col(Merge.ActionCol) =!= lit("keep"))
          .write.mode("overwrite").parquet(s"$root/_changes/v$next")
      val merged = Constraints.enforce(
          tagged
            .filter(col(Merge.ActionCol) =!= lit("delete"))
            .drop(Merge.ActionCol, Merge.PreCol), // PreCol-drop no-op sans feed
          Constraints.load(root))
        .withColumn("_bucket", bucketCol(meta.keys, meta.nBuckets))
      merged.write.mode("overwrite").partitionBy("_bucket")
        .parquet(s"$root/v$next/_data")
      touched.foreach { b =>
        val src = Paths.get(s"$root/v$next/_data/_bucket=$b")
        val dst = Paths.get(bucketDir(root, s"v$next", b))
        if (Files.exists(src)) Files.move(src, dst)
        else Files.createDirectories(dst) // bucket emptied by matched-delete
      }
      dropStaging(root, next)
      val manifest = meta.manifest.map { case (b, ver) =>
        b -> (if (touchedSet(b)) s"v$next" else ver)
      }
      // An evolving merge widens the recorded schema; untouched buckets
      // keep their narrow files and read null-filled through it.
      writeVersion(root, next, meta.nBuckets, meta.keys, manifest,
        Some(merged.drop("_bucket").schema))
    } finally {
      if (changeFeed) tagged.unpersist()
    }
  }

  /** DELETE at bucket-delta cost: one pass finds the buckets that hold
    * matching rows, and ONLY those buckets are rewritten without the
    * matches — untouched buckets carry forward by manifest reference,
    * the same delta-proportional contract as [[merge]]. A predicate on
    * the bucket key touches only the keys' buckets; a broad predicate
    * degrades gracefully toward a full rewrite (never past it). Rows
    * where `where` is null are KEPT — SQL DELETE semantics. With
    * `changeFeed`, deleted pre-images land as `_changes/v<next>` before
    * the pointer swap. No-op (no version published) when nothing
    * matches. */
  def delete(spark: SparkSession, root: String, where: Column,
             changeFeed: Boolean = false): Unit = {
    import graft.operators.Merge
    val meta = readMeta(root)
    val hit = coalesce(where, lit(false))
    val withB = readAt(spark, root, meta)
      .withColumn("_bucket", bucketCol(meta.keys, meta.nBuckets))
    val touched = withB.filter(hit).select("_bucket").distinct()
      .collect().map(_.getInt(0)).sorted // bounded: <= nBuckets ids
    if (touched.isEmpty) return
    val touchedSet = touched.toSet
    val next = meta.version + 1
    val touchedPaths = touched
      .map(b => bucketDir(root, meta.manifest(b), b)).filter(hasParquet)
    val touchedRows = readerFor(spark, meta)
      .parquet(touchedPaths.toIndexedSeq: _*)
    if (changeFeed)
      touchedRows.filter(hit)
        .withColumn(Merge.ActionCol, lit("delete"))
        .write.mode("overwrite").parquet(s"$root/_changes/v$next")
    val kept = touchedRows.filter(!hit)
      .withColumn("_bucket", bucketCol(meta.keys, meta.nBuckets))
    kept.write.mode("overwrite").partitionBy("_bucket")
      .parquet(s"$root/v$next/_data")
    touched.foreach { b =>
      val src = Paths.get(s"$root/v$next/_data/_bucket=$b")
      val dst = Paths.get(bucketDir(root, s"v$next", b))
      if (Files.exists(src)) Files.move(src, dst)
      else Files.createDirectories(dst) // bucket emptied entirely
    }
    dropStaging(root, next)
    writeVersion(root, next, meta.nBuckets, meta.keys,
      meta.manifest.map { case (b, ver) =>
        b -> (if (touchedSet(b)) s"v$next" else ver)
      }, meta.schema)
  }

  /** UPDATE at bucket-delta cost — the bucketed twin of
    * [[ManagedTable.update]]: one pass finds the buckets holding rows
    * satisfying `where`, only those rewrite with each `set` column
    * re-evaluated (expressions see the PRE-update row), and untouched
    * buckets carry by manifest reference. Null-predicate rows are
    * untouched (SQL UPDATE); CHECK constraints ride the rewrite. With
    * `changeFeed`, post-images land as `_changes/v<next>` before the
    * swap. No-op when nothing matches. */
  def update(spark: SparkSession, root: String, set: Map[String, Column],
             where: Column = lit(true), changeFeed: Boolean = false): Unit = {
    import graft.operators.Merge
    val meta = readMeta(root)
    val hit = coalesce(where, lit(false))
    val withB = readAt(spark, root, meta)
      .withColumn("_bucket", bucketCol(meta.keys, meta.nBuckets))
    val touched = withB.filter(hit).select("_bucket").distinct()
      .collect().map(_.getInt(0)).sorted // bounded: <= nBuckets ids
    if (touched.isEmpty) return
    val touchedSet = touched.toSet
    val next = meta.version + 1
    val touchedPaths = touched
      .map(b => bucketDir(root, meta.manifest(b), b)).filter(hasParquet)
    val touchedRows = readerFor(spark, meta)
      .parquet(touchedPaths.toIndexedSeq: _*)
    val cols = touchedRows.columns.toIndexedSeq
    val bad = set.keySet -- cols.toSet
    require(bad.isEmpty, s"UPDATE SET references missing column(s): " +
      bad.mkString(", "))
    require((set.keySet & meta.keys.toSet).isEmpty,
      s"UPDATE SET must not touch bucket key(s) ${meta.keys.mkString(", ")} " +
        "— a key change moves the row across buckets; use merge")
    // hit evaluated on the PRE-update row, carried through the projection
    val flagged = touchedRows.withColumn("__hit", hit)
    val updated = flagged.select(cols.map(c =>
      when(col("__hit"), set.getOrElse(c, col(c))).otherwise(col(c)).as(c)) :+
      col("__hit"): _*)
    if (changeFeed)
      updated.filter(col("__hit")).drop("__hit")
        .withColumn(Merge.ActionCol, lit("update"))
        .write.mode("overwrite").parquet(s"$root/_changes/v$next")
    val rewritten = Constraints.enforce(updated.drop("__hit"),
        Constraints.load(root))
      .withColumn("_bucket", bucketCol(meta.keys, meta.nBuckets))
    rewritten.write.mode("overwrite").partitionBy("_bucket")
      .parquet(s"$root/v$next/_data")
    touched.foreach { b =>
      val src = Paths.get(s"$root/v$next/_data/_bucket=$b")
      val dst = Paths.get(bucketDir(root, s"v$next", b))
      if (Files.exists(src)) Files.move(src, dst)
      else Files.createDirectories(dst)
    }
    dropStaging(root, next)
    writeVersion(root, next, meta.nBuckets, meta.keys,
      meta.manifest.map { case (b, ver) =>
        b -> (if (touchedSet(b)) s"v$next" else ver)
      }, meta.schema)
  }

  /** OVERWRITE WHERE at bucket-delta cost — the bucketed twin of
    * [[ManagedTable.overwriteWhere]] (Delta `replaceWhere`): atomically
    * replace exactly the rows satisfying `where` with `df`, rewriting
    * ONLY the buckets that hold matching rows or receive replacement
    * rows; every other bucket carries by manifest reference. The
    * replacement is not keyed — any cardinality, including dropping or
    * aggregating the slice — but each replacement row must satisfy
    * `where` (asserted while the touched-bucket set is computed, so a
    * violating row aborts before any file is written), and predicate-null
    * rows are KEPT. At 100 TB replacing one source's slice rewrites the
    * handful of buckets its keys hash into, not the table. CHECK
    * constraints ride the rewrite. */
  def overwriteWhere(spark: SparkSession, root: String, df: DataFrame,
                     where: Column): Unit = {
    val meta = readMeta(root)
    val hit = coalesce(where, lit(false))
    val withB = readAt(spark, root, meta)
      .withColumn("_bucket", bucketCol(meta.keys, meta.nBuckets))
    val cols = readAt(spark, root, meta).columns.toIndexedSeq
    val guarded = ManagedTable.assertSatisfies(
      df.select(cols.map(col): _*), hit) // fails fast on missing cols
    val replB = guarded.withColumn("_bucket",
      bucketCol(meta.keys, meta.nBuckets))
    // Both collects are bounded (<= nBuckets ids); evaluating replB's
    // buckets executes the insertion assert BEFORE any write starts.
    val touched = (withB.filter(hit).select("_bucket").distinct()
        .collect().map(_.getInt(0)) ++
      replB.select("_bucket").distinct().collect().map(_.getInt(0)))
      .distinct.sorted
    if (touched.isEmpty) return
    val touchedSet = touched.toSet
    val next = meta.version + 1
    val touchedPaths = touched
      .map(b => bucketDir(root, meta.manifest(b), b)).filter(hasParquet)
    val kept =
      if (touchedPaths.isEmpty) replB.filter(lit(false))
      else readerFor(spark, meta).parquet(touchedPaths.toIndexedSeq: _*)
        .filter(!hit)
        .withColumn("_bucket", bucketCol(meta.keys, meta.nBuckets))
    val rewritten = Constraints.enforce(
        kept.unionByName(replB).drop("_bucket"), Constraints.load(root))
      .withColumn("_bucket", bucketCol(meta.keys, meta.nBuckets))
    rewritten.write.mode("overwrite").partitionBy("_bucket")
      .parquet(s"$root/v$next/_data")
    touched.foreach { b =>
      val src = Paths.get(s"$root/v$next/_data/_bucket=$b")
      val dst = Paths.get(bucketDir(root, s"v$next", b))
      if (Files.exists(src)) Files.move(src, dst)
      else Files.createDirectories(dst)
    }
    dropStaging(root, next)
    writeVersion(root, next, meta.nBuckets, meta.keys,
      meta.manifest.map { case (b, ver) =>
        b -> (if (touchedSet(b)) s"v$next" else ver)
      }, meta.schema)
  }

  /** OPTIMIZE for the bucketed layout: every merge leaves its touched
    * buckets as fresh single-write dirs, but a bucket that keeps catching
    * deltas accumulates one rewrite per merge only — the real
    * fragmentation at 100 TB comes from high-frequency SMALL merges
    * writing many small files per touched bucket. `compact` rewrites ONLY
    * buckets fragmented past `maxFilesPerBucket` into one file each,
    * published as a new version whose manifest carries every healthy
    * bucket forward by reference — the same delta-proportional contract
    * as the merge itself: rewrite cost scales with the FRAGMENTED bytes,
    * never the table. Content is untouched (a layout-only version, like
    * [[ManagedTable.optimize]]); readers of prior versions are
    * unaffected, and vacuum's reachability sweep reclaims the fragmented
    * dirs once no retained manifest references them. */
  def compact(spark: SparkSession, root: String,
              maxFilesPerBucket: Int = 4): Unit = {
    val meta = readMeta(root)
    def nFiles(b: Int): Int = {
      val dir = Paths.get(bucketDir(root, meta.manifest(b), b))
      if (!Files.exists(dir)) 0
      else listDir(dir)(_.count(_.getFileName.toString.endsWith(".parquet")))
    }
    val fragmented = meta.manifest.keys.toSeq.sorted
      .filter(nFiles(_) > maxFilesPerBucket)
    if (fragmented.isEmpty) return
    val next = meta.version + 1
    val paths = fragmented.map(b => bucketDir(root, meta.manifest(b), b))
    // One partition per fragmented bucket: rows hash-route by the bucket
    // id itself, so each partitionBy dir receives exactly one file.
    val compacted = readerFor(spark, meta).parquet(paths: _*)
      .withColumn("_bucket", bucketCol(meta.keys, meta.nBuckets))
      .repartition(fragmented.size, col("_bucket"))
    compacted.write.mode("overwrite").partitionBy("_bucket")
      .parquet(s"$root/v$next/_data")
    fragmented.foreach { b =>
      val src = Paths.get(s"$root/v$next/_data/_bucket=$b")
      val dst = Paths.get(bucketDir(root, s"v$next", b))
      if (Files.exists(src)) Files.move(src, dst)
      else Files.createDirectories(dst) // all-empty files compacted away
    }
    dropStaging(root, next)
    val fragSet = fragmented.toSet
    writeVersion(root, next, meta.nBuckets, meta.keys,
      meta.manifest.map { case (b, ver) =>
        b -> (if (fragSet(b)) s"v$next" else ver)
      }, meta.schema)
  }

  /** VACUUM for the bucketed layout (reference semantics:
    * DeltaTable.vacuum, mls_listings_curated.py:366-368). Unlike
    * [[ManagedTable.vacuum]], old version dirs cannot simply be dropped by
    * age: the live manifest carries untouched buckets forward BY REFERENCE,
    * so an old dir may still host live data. Retention is therefore
    * manifest-reachability — keep the newest `keep` manifests, keep every
    * bucket dir some retained manifest references, and delete the rest
    * (unreferenced bucket dirs, then version dirs left with nothing).
    * Deletion cost is proportional to the GARBAGE, never the table. */
  def vacuum(root: String, keep: Int = 1): Unit = {
    val live = currentVersion(root)
    vacuumRetaining(root, (math.max(0, live - keep + 1) to live)
      .filter(v => Files.exists(Paths.get(root, s"v$v", "_manifest"))))
  }

  /** Retention-DURATION vacuum — same policy knob as
    * [[ManagedTable.vacuum(root:String,retainHours:Double)*]] (the
    * reference's `delta_table.vacuum(hours)`): retain manifests whose
    * commit time (from the shared `_history` log) is within `retainHours`
    * of now, always including the live manifest; then run the same
    * manifest-reachability sweep, so any bucket dir a retained manifest
    * references survives regardless of its own age. */
  def vacuum(root: String, retainHours: Double): Unit = {
    require(retainHours >= 0, s"vacuum: retainHours=$retainHours")
    val live = currentVersion(root)
    val cutoff =
      VersionedLayout.commitClock() - (retainHours * 3600 * 1000).toLong
    val commitTimes: Map[Int, Long] = commitHistory(root).toMap
    val withManifest = listDir(Paths.get(root))(
        _.filter(_.getFileName.toString.matches("v\\d+"))
          .map(_.getFileName.toString.drop(1).toInt).toVector.sorted)
      .filter(v => Files.exists(Paths.get(root, s"v$v", "_manifest")))
    vacuumRetaining(root, withManifest.filter(v =>
      v == live || commitTimes.get(v).forall(_ >= cutoff)))
  }

  private def vacuumRetaining(root: String, retained: Seq[Int]): Unit = {
    val referenced: Set[(Int, String)] = retained.flatMap { v =>
      readMetaAt(root, v).manifest.toSeq.map { case (b, ver) => (b, ver) }
    }.toSet
    listDir(Paths.get(root))(
        _.filter(_.getFileName.toString.matches("v\\d+")).toList)
      .foreach { vdir =>
        val vname = vdir.getFileName.toString
        listDir(vdir)(_.filter(_.getFileName.toString.matches("b\\d{5}")).toList)
          .foreach { bdir =>
            val b = bdir.getFileName.toString.drop(1).toInt
            if (!referenced((b, vname))) ScratchDirs.deleteRecursively(bdir)
          }
        if (!retained.contains(vname.drop(1).toInt)) {
          val hostsLiveBuckets = listDir(vdir)(
            _.exists(_.getFileName.toString.matches("b\\d{5}")))
          if (!hostsLiveBuckets) ScratchDirs.deleteRecursively(vdir)
        }
      }
    // Change feeds age with their version's manifest retention (a feed is
    // never referenced by a later manifest, so age alone decides).
    val changesDir = Paths.get(root, "_changes")
    if (Files.exists(changesDir)) {
      val listing = Files.list(changesDir)
      try listing.iterator().asScala
        .filter(p => p.getFileName.toString.matches("v\\d+"))
        .filter(p => !retained.contains(p.getFileName.toString.drop(1).toInt))
        .toList.foreach(ScratchDirs.deleteRecursively)
      finally listing.close()
    }
  }
}
