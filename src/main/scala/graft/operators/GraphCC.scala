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
  * Algorithm: iterative min-label propagation on DataFrames (the
  * "hash-to-min" family — Rastogi et al., "Finding Connected Components in
  * Map-Reduce in Logarithmic Rounds", ICDE 2013; the large-star/small-star
  * variant of Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC 2014 trades per-round cost for provable O(log²n) rounds on
  * adversarial chains). Each round is two shuffles (join labels to the
  * adjacency, min-aggregate per node) and converges in O(component
  * diameter) rounds. Near-dup graphs are dense LSH-bucket cliques with tiny
  * diameters, so 2-3 rounds close them; `maxIter` fails LOUDLY rather than
  * returning a half-merged clustering if fed a pathological chain.
  *
  * Scale posture: the adjacency is checkpointed once (upstream pair
  * generation never re-executes), labels are checkpointed per round so the
  * plan stays constant-size, convergence is one `isEmpty` on a
  * monotonically-shrinking diff, and nothing ever collects to the driver.
  */
object GraphCC {

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
    while (!converged && rounds < maxIter) {
      // label'(d) = min over edges (s,d) of label(s); self-loops carry the
      // node's current label, so labels only ever decrease.
      val next = adj
        .join(labels, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("component")).as("component"))
        .localCheckpoint()
      converged = next.alias("n")
        .join(labels.alias("o"), "node")
        .filter(col("n.component") < col("o.component"))
        .isEmpty
      labels = next
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds - " +
          "component diameter exceeds the bound; raise maxIter or switch " +
          "to a large-star/small-star round structure")
    labels
  }

  /** q_dedup_cc: MinHash-LSH near-dup pairs → connected components →
    * cluster id (min doc_id), cluster size, and the canonical-keep flag.
    * This is the full scale path of corpus dedup: sketch → candidate pairs
    * → verified pairs → components → keep one representative per cluster. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Sketches.dedupMinhashLsh(s, dir).select(col("doc_a"), col("doc_b"))
    val cc = connectedComponents(pairs, "doc_a", "doc_b")
    cc.select(col("node").as("doc_id"), col("component").as("cluster_id"))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .withColumn("is_canonical",
        when(col("doc_id") === col("cluster_id"), 1).otherwise(0))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_cc" -> (dedupClusters _))

  /** The oracle recomputes components by transitive closure (recursive CTE)
    * over the exact all-pairs Jaccard pairs — which equal the verified
    * MinHash pairs on this corpus (same equivalence the q_dedup_minhash
    * oracle rests on). */
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
