package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.ManagedTable

/** The curation lifecycle's STATE, versioned under the managed-table
  * layer — the same history / time-travel / write-audit-publish
  * discipline the published manifest already rides (reference precedent:
  * every curated artifact goes through the versioned table,
  * mls_listings_curated.py:132-160; the state between ingests deserves
  * no less, because rolling back a bad ingest means restoring the STATE,
  * not just the manifest).
  *
  * Physical shape: every non-manifest family the lifecycle carries
  * (labels, textcl, imgcl, audcl, imggrp, audgrp, viddup, vidstatic) is
  * a pure 64-bit-id frame, so all eight share one `(fam, a, b, c)`
  * physical schema and live in ONE managed table (`<root>/core`) — a
  * lifecycle step is ONE atomic pointer swap for the whole core state,
  * not eight swaps that can tear. The manifest keeps its string-typed
  * schema in a twin table (`<root>/manifest`); [[publish]] bumps both
  * exactly once per step, so their version numbers stay aligned forever
  * (CurationStateSpec pins it; the object-storage production form would
  * put both in one commit-log entry, which the twin-table discipline
  * approximates on a filesystem).
  *
  * Family pruning at scale: [[publish]] hands the writer the eight
  * frames as separate union children, so every output file holds a
  * single family and a `fam = 'x'` read prunes on parquet min/max stats
  * — a per-family read scans that family's bytes, not the state.
  *
  * Concurrency: a reader resolves the live version ONCE ([[StateRef]]
  * pins it), giving the whole consuming run a consistent snapshot; a
  * writer that derived its output from version v publishes with
  * `expectedVersion = v` and the table layer's optimistic CAS
  * ([[ManagedTable.commit]]) aborts loudly if anyone else moved the
  * state first — an ingest racing a retraction can never silently
  * resurrect what the retraction removed (CurationConcurrencySpec).
  */
private[graft] object CurationState {

  /** Core family → its logical column names (≤ 3, all long-typed). */
  private val fams: Map[String, Seq[String]] = Map(
    "labels" -> Seq("node", "component"),
    "textcl" -> Seq("doc_id", "cluster_id"),
    "imgcl" -> Seq("canon", "cluster_id"),
    "audcl" -> Seq("canon", "cluster_id"),
    "imggrp" -> Seq("phash", "n_copies", "canon"),
    "audgrp" -> Seq("phash", "n_copies", "canon"),
    "viddup" -> Seq("vid"),
    "vidstatic" -> Seq("vid"))

  private[graft] val familyNames: Set[String] = fams.keySet

  private val slots = Seq("a", "b", "c")

  private def coreRoot(root: String) = s"$root/core"
  private def manifestRoot(root: String) = s"$root/manifest"

  private def encode(fam: String, df: DataFrame): DataFrame =
    df.select(lit(fam).as("fam") +:
      slots.zipWithIndex.map { case (s, i) =>
        val cols = fams(fam)
        (if (i < cols.length) col(cols(i)).cast("long")
         else lit(null).cast("long")).as(s)
      }: _*)

  private def decode(core: DataFrame, fam: String): DataFrame = {
    val cols = fams(fam)
    core.filter(col("fam") === fam)
      .select(cols.zipWithIndex.map { case (c, i) => col(slots(i)).as(c) }: _*)
  }

  def exists(root: String): Boolean = ManagedTable.exists(coreRoot(root))

  /** The state's live version — asserting the core/manifest twin tables
    * never drifted apart (every publish bumps both exactly once). */
  def version(root: String): Int = {
    val cv = ManagedTable.currentVersion(coreRoot(root))
    val mv = ManagedTable.currentVersion(manifestRoot(root))
    require(cv == mv,
      s"state $root torn: core at v$cv but manifest at v$mv")
    cv
  }

  /** Read one core family at the live version or a pinned one. */
  def fam(s: SparkSession, root: String, name: String,
          version: Option[Int] = None): DataFrame =
    decode(version
      .map(v => ManagedTable.readVersion(s, coreRoot(root), v))
      .getOrElse(ManagedTable.read(s, coreRoot(root))), name)

  /** Read the manifest at the live version or a pinned one. */
  def manifest(s: SparkSession, root: String,
               version: Option[Int] = None): DataFrame =
    version.map(v => ManagedTable.readVersion(s, manifestRoot(root), v))
      .getOrElse(ManagedTable.read(s, manifestRoot(root)))

  /** Publish one lifecycle step: all eight core families in one table
    * version, the manifest in its twin — each bumped exactly once.
    * `expectedVersion` makes the publish a CAS: it succeeds only if the
    * state is STILL at that version, else [[ManagedTable
    * .ConcurrentWriteException]] (first-writer-wins; the loser must
    * re-read and re-derive). The core commits first, so a losing racer
    * aborts before touching the manifest and the twins stay aligned. */
  def publish(s: SparkSession, root: String,
              frames: Map[String, DataFrame], manifest: DataFrame,
              expectedVersion: Option[Int] = None): Unit = {
    require(frames.keySet == fams.keySet,
      s"state publish must carry every family; missing " +
        s"${fams.keySet -- frames.keySet}, unknown ${frames.keySet -- fams.keySet}")
    // deterministic family order; separate union children keep output
    // files family-pure for stats-level pruning on read
    val core = fams.keys.toSeq.sorted.map(f => encode(f, frames(f)))
      .reduce(_ unionByName _)
    val cr = coreRoot(root); val mr = manifestRoot(root)
    expectedVersion match {
      case Some(v) =>
        ManagedTable.commit(s, cr, v, core)
        ManagedTable.commit(s, mr, v, manifest)
      case None =>
        if (!ManagedTable.exists(cr)) {
          ManagedTable.createEmpty(s, cr, core)
          ManagedTable.createEmpty(s, mr, manifest)
        }
        ManagedTable.overwrite(cr, core)
        ManagedTable.overwrite(mr, manifest)
    }
  }

  /** ROLLBACK: republish version `v`'s content as the new head of both
    * twins — the rollback is itself a versioned event (linear history,
    * like Delta RESTORE), so it can be audited or rolled back again. */
  def restore(s: SparkSession, root: String, v: Int): Unit = {
    ManagedTable.restore(s, coreRoot(root), v)
    ManagedTable.restore(s, manifestRoot(root), v)
  }

  /** Shallow-clone a state's live snapshot into a fresh root (v0 =
    * source's live content, hard-linked — zero data bytes copied). The
    * clone has its own independent history: experiments (a trial
    * retraction, a what-if ingest) run on clones without mutating the
    * production state's version line. */
  def cloneTo(s: SparkSession, srcRoot: String, dstRoot: String): Unit = {
    ManagedTable.shallowClone(s, coreRoot(srcRoot), coreRoot(dstRoot))
    ManagedTable.shallowClone(s, manifestRoot(srcRoot), manifestRoot(dstRoot))
  }
}

/** A handle to a state root, optionally pinned to a version. An
  * unpinned ref resolves the live version ONCE per consuming run
  * ([[pin]]), so every family read inside that run sees one consistent
  * snapshot even if a writer publishes mid-run — and the resolved
  * version is the CAS base for any publish derived from it. */
private[graft] final case class StateRef(root: String,
                                         version: Option[Int] = None) {
  def fam(s: SparkSession, name: String): DataFrame =
    CurationState.fam(s, root, name, version)
  def manifest(s: SparkSession): DataFrame =
    CurationState.manifest(s, root, version)
  /** Resolve to a pinned snapshot (no-op if already pinned). */
  def pin: StateRef =
    if (version.isDefined) this
    else copy(version = Some(CurationState.version(root)))
  def describe: String = version.map(v => s"$root@v$v").getOrElse(root)
}
