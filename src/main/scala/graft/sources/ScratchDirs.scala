package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Local-filesystem helpers shared by the table layer and the
  * side-effectful gate queries — one home for the recursive-delete idiom
  * (with the walk stream closed) instead of per-caller copies. */
object ScratchDirs {

  /** Delete `p` and everything under it if it exists. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally st.close()
    }

  /** Empty scratch dir under the build tree (safe to delete/rewrite on
    * every call — bench runs each gate several times). */
  def fresh(name: String): String = {
    val p = Paths.get("target", "gate_tmp", name).toAbsolutePath
    deleteRecursively(p)
    p.toString
  }

  /** Build-once fixture scratch: the FIRST call per (name, key) in this
    * JVM wipes and rebuilds the dir via `build`; later calls return the
    * same root untouched. For deterministic gate FIXTURES (source-of-truth
    * tables, replay slices, static indexes) that gate invocations consume
    * READ-ONLY: the bench times every gate over several passes, and
    * re-synthesizing a bit-identical fixture each pass re-times setup, not
    * the operator under test — in production the source table/corpus
    * exists once and every consumer reads it. Distinct `key`s (e.g.
    * different sf dirs) get distinct roots; the lock is re-entrant, so a
    * fixture build may itself request another fixture. */
  private val memoRoots = scala.collection.mutable.HashMap.empty[(String, String), String]
  def memoized(name: String, key: String)(build: String => Unit): String =
    memoRoots.synchronized {
      requestCount(name) = requestCount.getOrElse(name, 0L) + 1L
      memoRoots.getOrElseUpdate((name, key), {
        // collision-resistant key digest: two distinct keys sharing a
        // 32-bit hashCode would otherwise share (and silently overwrite)
        // one root while memoRoots kept both keys pointing at it
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(key.getBytes("UTF-8")).take(8)
          .map("%02x".format(_)).mkString
        val root = fresh(s"memo_${name}_" + digest)
        build(root)
        root
      })
    }

  /** The persisted-parquet fixture idiom in one place: build `frame`
    * once per (name, key), write it under the memo root, return the
    * parquet path — the shape every decode-once/persisted-artifact table
    * (hash, group, pair, segment, cluster, manifest) shares. One helper
    * instead of per-site copies kills the mismatched-subdir copy-paste
    * class and keeps every such cache visible to the [[memoized]]
    * audit. */
  def persistedParquet(name: String, key: String)(
      frame: => org.apache.spark.sql.DataFrame): String = {
    val root = memoized(name, key)(r => frame.write.parquet(s"$r/data"))
    s"$root/data"
  }

  /** Every fixture name ever requested through [[memoized]] in this JVM —
    * the observable the bench-honesty guard pins: e2e gates must drive
    * their pipeline on EVERY invocation (they are the bench's only honest
    * full-pipeline timings), so their run roots must never appear here.
    * Only the CLI gates' published runs (`*cli_run`) and read-only
    * fixtures (`*_raw`/`*_fix`/`*_orc`/...) are legitimate entries.
    * EVERY in-JVM artifact cache must route its lookup through
    * [[memoized]] (a bare ConcurrentHashMap is invisible here — the r14
    * audit bypass); [[requestedMemoCounts]] exposes per-name request
    * counts so a guard can assert a cache is consulted on every
    * invocation, not just the first. */
  private val requestCount = scala.collection.mutable.HashMap.empty[String, Long]
  def requestedMemoNames: Set[String] =
    memoRoots.synchronized(requestCount.keySet.toSet)
  def requestedMemoCounts: Map[String, Long] =
    memoRoots.synchronized(requestCount.toMap)
}
