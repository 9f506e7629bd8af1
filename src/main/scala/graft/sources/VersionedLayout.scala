package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Protocol shared by the two versioned table layouts ([[ManagedTable]]'s
  * whole-snapshot dirs, [[BucketedTable]]'s manifest-routed buckets):
  *
  *  - the `_latest` pointer file — readers resolve it, writers publish a
  *    new immutable version dir and then atomically swap the pointer, the
  *    same tip-swap discipline Delta/Iceberg put on their log head (a
  *    conditional-put on object storage);
  *  - CHECK constraints ([[Constraints]] storage + enforcement contract);
  *  - the `_changes/v<N>` change-feed dirs a `merge(..., changeFeed=true)`
  *    records before its pointer swap.
  *
  * Keeping this in one place stops the two layouts drifting apart on the
  * pieces whose semantics MUST agree (a reader of either layout sees the
  * same pointer/constraint/CDF behavior); everything layout-specific —
  * snapshot shape, time travel resolution, vacuum reachability, merge
  * routing — stays in the concrete objects.
  */
private[sources] trait VersionedLayout {

  /** Read the live version of the table at `root`. */
  def read(spark: SparkSession, root: String): DataFrame

  /** Time travel — read a pinned published version. */
  def readVersion(spark: SparkSession, root: String, version: Int): DataFrame

  /** Time travel by TIMESTAMP (Delta `timestampAsOf`): read the version
    * that was live at `timestampMs`, resolved through the commit log. */
  final def readAsOf(spark: SparkSession, root: String,
                     timestampMs: Long): DataFrame =
    readVersion(spark, root, versionAsOfTimestamp(root, timestampMs))

  // ---- pointer protocol -------------------------------------------------

  protected final def latestFile(root: String): Path = Paths.get(root, "_latest")

  /** Serialize a commit's CAS section against EVERY writer of `root`:
    * same-JVM threads on a per-root monitor (a `FileChannel.lock()` from
    * two threads of one JVM throws OverlappingFileLockException instead of
    * waiting), other processes on the `_commitlock` file lock — the
    * filesystem stand-in for the conditional-put a lakehouse log tip uses
    * on object storage. Shared by both layouts so their multi-writer
    * semantics cannot drift. */
  protected final def withCommitLock[A](root: String)(body: => A): A = {
    val monitor = VersionedLayout.commitMonitors.computeIfAbsent(
      Paths.get(root).toAbsolutePath.normalize.toString, _ => new Object)
    monitor.synchronized {
      Files.createDirectories(Paths.get(root))
      val ch = java.nio.channels.FileChannel.open(
        Paths.get(root, "_commitlock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try body finally lock.release()
      } finally ch.close()
    }
  }

  final def exists(root: String): Boolean = Files.exists(latestFile(root))

  /** The live published version number. */
  final def currentVersion(root: String): Int =
    Files.readString(latestFile(root)).trim.toInt

  /** Atomically publish `version` as the live pointer. The version dir
    * must already be fully materialized — after this move, any reader may
    * resolve it. The commit-history line (version, commit millis) lands
    * BEFORE the swap: a readable version always has its commit time. */
  protected final def swapPointer(root: String, version: Int): Unit = {
    Files.createDirectories(Paths.get(root))
    // Optional third field: user-supplied commit metadata (Delta's
    // `userMetadata`, stamped by the reference on every curated write —
    // mls_listings_curated.py:325). URL-encoded to stay TSV-safe.
    val meta = VersionedLayout.userMetadata
      .map(m => "\t" + java.net.URLEncoder.encode(m, "UTF-8"))
      .getOrElse("")
    Files.write(Paths.get(root, "_history"),
      s"$version\t${VersionedLayout.commitClock()}$meta\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    val tmp = Paths.get(root, s"_latest.tmp$version")
    Files.writeString(tmp, version.toString)
    Files.move(tmp, latestFile(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The commit log: (version, commit millis) in publish order —
    * Delta's DESCRIBE HISTORY spine. Empty for tables created before
    * histories were recorded. */
  final def commitHistory(root: String): Seq[(Int, Long)] = {
    val f = Paths.get(root, "_history")
    if (!Files.exists(f)) Seq.empty
    else Files.readString(f).linesIterator.filter(_.nonEmpty).map { line =>
      val fields = line.split("\t", 3)
      fields(0).toInt -> fields(1).toLong
    }.toSeq
  }

  /** The commit log WITH each commit's user metadata (Delta's DESCRIBE
    * HISTORY `userMetadata` column): (version, commit millis, metadata).
    * Metadata is None for commits made without [[VersionedLayout
    * .userMetadata]] set. */
  final def commitHistoryWithMetadata(root: String)
      : Seq[(Int, Long, Option[String])] = {
    val f = Paths.get(root, "_history")
    if (!Files.exists(f)) Seq.empty
    else Files.readString(f).linesIterator.filter(_.nonEmpty).map { line =>
      line.split("\t", 3) match {
        case Array(v, ts, m) =>
          (v.toInt, ts.toLong, Some(java.net.URLDecoder.decode(m, "UTF-8")))
        case Array(v, ts) => (v.toInt, ts.toLong, None)
        case other => sys.error(s"bad history line '$line' in $root")
      }
    }.toSeq
  }

  /** The newest version committed at or before `timestampMs` — Delta's
    * `timestampAsOf` resolution. Fails clearly when the timestamp
    * precedes the first commit or no history was recorded. */
  final def versionAsOfTimestamp(root: String, timestampMs: Long): Int = {
    val h = commitHistory(root)
    require(h.nonEmpty, s"no commit history recorded for $root")
    val at = h.filter(_._2 <= timestampMs)
    require(at.nonEmpty,
      s"timestamp $timestampMs precedes the first commit (${h.head._2}) of $root")
    at.map(_._1).max
  }

  // ---- CHECK constraints ------------------------------------------------

  /** CHECK constraints currently attached to the table (empty when none
    * were ever added). Enforcement rides every publish — a violating row
    * aborts the write before the pointer swaps, so readers can never
    * observe a constraint-breaking version. */
  final def constraintsOf(root: String): Seq[Constraints.Check] =
    Constraints.load(root)

  /** ALTER TABLE ADD CONSTRAINT (Delta CheckConstraint semantics): the
    * expression must hold on every EXISTING row — one validation scan now
    * buys write-time-only enforcement forever after. A row violates only
    * when the expression is exactly FALSE — null passes, like ANSI CHECK. */
  final def addConstraint(spark: SparkSession, root: String, name: String,
                          sqlExpr: String): Unit =
    Constraints.add(root, read(spark, root), name, sqlExpr)

  /** ALTER TABLE DROP CONSTRAINT. */
  final def dropConstraint(root: String, name: String): Unit =
    Constraints.drop(root, name)

  // ---- change feed ------------------------------------------------------

  /** Read the change feed a `merge(..., changeFeed = true)` recorded when
    * it published `version` — delta-sized rows tagged insert / update
    * (post-image) / delete (pre-image with `preImageFeed`). Delta's
    * `table_changes()` on these layouts. */
  final def changes(spark: SparkSession, root: String, version: Int): DataFrame = {
    val dir = Paths.get(root, "_changes", s"v$version")
    require(Files.exists(dir),
      s"no change feed for version $version of $root (merge ran without " +
        "changeFeed, feed vacuumed, or not a merge-published version)")
    spark.read.parquet(dir.toString)
  }

  /** Change feeds across a CLOSED version range, each row stamped with its
    * `_version` — Delta's `table_changes(from, to)`. Every version in the
    * range must have a recorded feed (a silent gap would silently corrupt
    * any downstream replica). */
  final def changes(spark: SparkSession, root: String,
                    fromVersion: Int, toVersion: Int): DataFrame = {
    require(fromVersion <= toVersion,
      s"empty version range [$fromVersion, $toVersion]")
    (fromVersion to toVersion)
      .map(v => changes(spark, root, v).withColumn("_version", lit(v)))
      .reduce(_ unionByName _)
  }
}

object VersionedLayout {
  /** Per-canonical-root intra-JVM commit monitors (see [[VersionedLayout
    * .withCommitLock]]). */
  private[sources] val commitMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Wall-clock source for commit timestamps — injectable so tests and
    * oracle gates can pin a deterministic history (the gate queries must
    * be bit-reproducible; wall time is not). Production callers never
    * touch it. */
  @volatile private[graft] var commitClock: () => Long =
    () => System.currentTimeMillis()

  /** User-supplied metadata stamped on commits published from WITHIN a
    * [[withUserMetadata]] scope — Delta's per-write
    * `.option("userMetadata", ...)` (the reference sets it per curated
    * write, mls_listings_curated.py:325). Read back via
    * [[VersionedLayout.commitHistoryWithMetadata]].
    *
    * Thread-scoped (a plain ThreadLocal, not a process global or an
    * inheritable one): the layouts support same-JVM concurrent writers,
    * and a commit from ANY other thread — pre-existing or spawned inside
    * the scope — must NOT be stamped with this scope's provenance.
    * Pointer swaps run on the publishing caller's thread, so the
    * thread-local scope is exactly the per-write scope. */
  private val userMetadataVar = new ThreadLocal[Option[String]] {
    override def initialValue(): Option[String] = None
  }

  /** The metadata in scope on the CURRENT thread (what [[swapPointer]]
    * stamps); None outside any [[withUserMetadata]] scope. */
  def userMetadata: Option[String] = userMetadataVar.get()

  /** Run `body` with `userMetadata` set for publishes on THIS thread —
    * nested scopes restore the outer value; writers on other threads are
    * unaffected. */
  def withUserMetadata[A](meta: String)(body: => A): A = {
    val prior = userMetadataVar.get()
    userMetadataVar.set(Some(meta))
    try body finally userMetadataVar.set(prior)
  }
}
