package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (MinHash/SimHash/Jaccard output) into dedup DECISIONS: documents
  * A-B and B-C are the same cluster even though (A,C) never surfaced as a
  * candidate pair, so keeping "one doc per pair" under-deletes. A real
  * corpus dedup keeps one representative per component (the reference
  * pipeline has no graph step — this is part of the 100 TB extension
  * surface alongside the sketch dedups).
  *
  * Algorithm: min-label propagation with POINTER JUMPING (the
  * "hash-to-min" family — Rastogi et al., "Finding Connected Components in
  * Map-Reduce in Logarithmic Rounds", ICDE 2013; Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014). Each round:
  * (1) propagate: label'(v) = min label over v's in-neighbors (self-loops
  * carry v's own label, so labels only decrease); (2) jump: label''(v) =
  * label'(label'(v)) — label values are always node ids of the same
  * component, so the label table composes with itself and the pointer
  * depth roughly halves per round. Propagation alone needs O(diameter)
  * rounds; with jumping a path graph closes in O(log n) rounds (a 10⁴-node
  * chain converges in ~14 — covered by GraphCCSpec), so `maxIter` = 25
  * bounds components up to ~2²⁵ diameter rather than 25 hops. Convergence
  * is detected from the propagation result alone (a propagation fixed
  * point is provably fully-converged: the max label in a component at a
  * fixed point spreads to the whole component, and labels are node ids
  * bounded below by the component minimum). The old label rides the
  * aggregation as `self_label`, so no extra join per round, and the
  * convergence count is read off the SAME driver action that materializes
  * the round's propagation (persist + one count) — one action per round,
  * not checkpoint-then-scan.
  *
  * Scale posture: the adjacency is checkpointed once (upstream pair
  * generation never re-executes), labels are checkpointed per round so the
  * plan stays constant-size, convergence is one narrow filter-scan on a
  * monotonically-decreasing label table, and nothing ever collects to the
  * driver.
  */
object GraphCC {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.GraphCC")

  /** Round count of the most recent [[connectedComponents]] run in this
    * JVM — the observable the no-silent-caps discipline asks for on the
    * iteration axis (a pathological component should show up as a round
    * count drifting toward `maxIter` long before the exhaustion error).
    * Diagnostic only: concurrent runs last-write-win. */
  private val lastRoundsA = new java.util.concurrent.atomic.AtomicInteger(-1)
  private[graft] def lastRunRounds: Int = lastRoundsA.get()

  /** Components of the undirected graph given by `edges` (two long-typed
    * columns `aCol`, `bCol`; duplicate and self edges are fine). Returns
    * (`node`, `component`) for every node incident to ≥1 edge, where
    * `component` is the smallest node id reachable — deterministic, so
    * hash-exact oracles can replay it. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    val a = col(aCol).as("src"); val b = col(bCol).as("dst")
    // Symmetric closure + self-loops: one propagation step then reads
    // min(self, neighbors). Checkpoint so upstream (often a whole sketch
    // pipeline) runs once, not once per round.
    val adj = edges.select(a, b)
      .unionByName(edges.select(b.as("src"), a.as("dst")))
      .unionByName(edges.select(a, a.as("dst")))
      .unionByName(edges.select(b.as("src"), b.as("dst")))
      .distinct()
      .repartition(col("src"))
      .localCheckpoint()

    var labels = adj.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("component"))
      .localCheckpoint()
    var converged = false
    var rounds = 0
    var nNodes = 0L
    var prevRound: Option[DataFrame] = None
    while (!converged && rounds < maxIter) {
      // Propagate. The self-loop row (dst==src) carries dst's own current
      // label through the join, so min() can only lower it AND the group
      // knows its pre-round label — convergence needs no join against the
      // previous table.
      //
      // ONE driver action per round: the propagation result is persisted
      // and the not-yet-converged count is read off the SAME job that
      // materializes it (count() fills the cache as it scans) — previously
      // this was a checkpoint-materialize job PLUS a separate isEmpty
      // scan. The plan above the persist stays constant-size because its
      // inputs (`adj`, `labels`) are themselves checkpoints.
      val next = adj
        .join(labels, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("component")).as("component"),
          min(when(col("src") === col("dst"), col("component")))
            .as("self_label"))
        .persist()
      // The SAME single action now also reads the node count — the
      // completion log line costs no extra job.
      val st = next.agg(
        count(lit(1)).as("_n"),
        coalesce(sum(when(col("component") < col("self_label"), lit(1L))
          .otherwise(lit(0L))), lit(0L)).as("_nc")).head()
      nNodes = st.getLong(0)
      converged = st.getLong(1) == 0L
      labels =
        if (converged)
          // Final labels detach from the cache (reading it, so this last
          // checkpoint job is a cache scan) and the round cache unpins
          // below — nothing stays persisted after the call.
          next.select(col("node"), col("component")).localCheckpoint()
        else {
          // Pointer jump: label ← label(label). Every label value is a
          // node id in the same component, so the inner self-join always
          // matches; checkpoint keeps the next round's plan constant-size.
          val compact = next.select(col("node"), col("component"))
          compact.alias("x")
            .join(compact.select(col("node").as("jn"),
              col("component").as("jc")).alias("y"),
              col("x.component") === col("y.jn"))
            .select(col("x.node").as("node"), col("y.jc").as("component"))
            .localCheckpoint()
        }
      // The previous round's propagation cache is dead once this round's
      // labels (checkpointed) exist.
      prevRound.foreach(_.unpersist(blocking = false))
      prevRound = if (converged) { next.unpersist(blocking = false); None }
                  else Some(next)
      rounds += 1
    }
    lastRoundsA.set(rounds)
    if (!converged) {
      // Drain the last round's cache before failing — a caller catching
      // the error must not inherit pinned blocks.
      prevRound.foreach(_.unpersist(blocking = false))
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds - " +
          "component pointer depth exceeds the bound (~2^maxIter diameter " +
          "with jumping); raise maxIter")
    }
    // One completion line per run — convergence behavior is observable
    // (the no-silent-caps discipline on the iteration axis). The edge
    // count is a scan of the already-materialized adjacency checkpoint.
    log.info(s"connectedComponents converged: rounds=$rounds " +
      s"nodes=$nNodes edges=${adj.count()}")
    labels
  }

  /** q_dedup_cc: exact shingle-Jaccard near-dup pairs (the PPJoin path,
    * q_dedup_jaccard) → connected components → cluster id (min doc_id),
    * cluster size, and the canonical-keep flag. This is the full scale
    * path of corpus dedup: candidate pairs → verified pairs → components
    * → keep one representative per cluster. Feeding the EXACT pair set
    * (not the MinHash candidates) keeps this gate's correctness
    * independent of sketch recall — the oracle recomputes the same exact
    * pairs by brute force. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = TextQueries.dedupJaccardShingle(s, dir)
      .select(col("doc_a"), col("doc_b"))
    val cc = connectedComponents(pairs, "doc_a", "doc_b")
    cc.select(col("node").as("doc_id"), col("component").as("cluster_id"))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .withColumn("is_canonical",
        when(col("doc_id") === col("cluster_id"), 1).otherwise(0))
  }

  /** PERSISTED text near-dup PAIR table (doc_a, doc_b): the exact PPJoin
    * pair set written once per sf dir. Pairs are the artifact every
    * incremental consumer keys on — the cluster table below closes over
    * them, and a BASE-corpus replay (the incremental curation fixture)
    * is a pure id filter of them, because a Jaccard pair depends only on
    * its two endpoint documents. q_dedup_jaccard stays the live leg. */
  private[operators] def pairTablePath(s: SparkSession, dir: String): String =
    graft.sources.ScratchDirs.persistedParquet("txt_prs_fix", dir)(
      TextQueries.dedupJaccardShingle(s, dir).select(col("doc_a"), col("doc_b")))

  /** PERSISTED text-cluster table: [[dedupClusters]]' labels written
    * once per sf dir — the decode-once/persisted-artifact discipline
    * (the mm_clippairs_fix precedent) applied to the text axis: cluster
    * labels are a multi-consumer curation artifact (leakage-safe splits,
    * the multimodal manifest), and each consumer should pay a FileScan,
    * not a re-run of the PPJoin + CC pipeline. Built off the persisted
    * pair table (one PPJoin total across both fixtures). q_dedup_cc
    * stays the LIVE leg — it times (and certifies) the cluster
    * computation itself; so does q_curation_e2e, the text pipeline's own
    * composed gate. */
  private[operators] def clusterTablePath(s: SparkSession, dir: String): String =
    graft.sources.ScratchDirs.persistedParquet("txt_cc_fix", dir) {
      val cc = connectedComponents(
        s.read.parquet(pairTablePath(s, dir)), "doc_a", "doc_b")
      cc.select(col("node").as("doc_id"), col("component").as("cluster_id"))
        .withColumn("n_docs",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .withColumn("is_canonical",
          when(col("doc_id") === col("cluster_id"), 1).otherwise(0))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_cc" -> (dedupClusters _))

  /** The oracle recomputes components by transitive closure (recursive CTE)
    * over the exact all-pairs Jaccard pairs — the same exact pair set the
    * Spark side now verifies via PPJoin, so the gate carries no
    * sketch-recall assumption. */
  val oracles: Map[String, String] = Map(
    "q_dedup_cc" ->
      """WITH RECURSIVE
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |      CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |      CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
        |        AS jaccard
        |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |  WHERE jaccard >= 0.5),
        |edges AS (
        |  SELECT doc_a AS s, doc_b AS d FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, r) AS (
        |  SELECT s, s FROM edges
        |  UNION
        |  SELECT e.s, r.r FROM edges e JOIN reach r ON e.d = r.node),
        |cc AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
        |SELECT node AS doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS n_docs,
        |  CAST(CASE WHEN node = cluster_id THEN 1 ELSE 0 END AS INTEGER)
        |    AS is_canonical
        |FROM cc""".stripMargin)
}
