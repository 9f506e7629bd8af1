package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{DataQuality, GraphCC, MixQueries, TextQueries}

/** Runnable end-to-end demo of the training-data curation pipeline over
  * the testdata `documents` table — the composition story for the
  * extension operators the gates check one at a time:
  *
  * {{{ sbt "runMain graft.pipeline.CurationDemo /root/testdata/sf0.001 /tmp/graft_curation" }}}
  *
  * Stages: (1) data-quality intake gate — hard rules abort the run,
  * advisory rules print; (2) near-duplicate clustering (exact-Jaccard
  * pairs → connected components) keeps one canonical document per
  * cluster; (3) heuristic quality filter; (4) leakage-safe train/
  * validation/test assignment (splits drawn per CLUSTER, so near-dups
  * never straddle); (5) the curated corpus lands as parquet plus a
  * per-split summary — the funnel counts print at each stage.
  */
object CurationDemo {

  /** Rules whose violation aborts intake; the rest are advisory. */
  private val hardRules = Set("doc_id_unique", "text_complete", "n_chars_consistent")

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: graft.pipeline.CurationDemo <sfDir> <outDir>\n" +
          "  e.g. graft.pipeline.CurationDemo /root/testdata/sf0.001 /tmp/graft_curation")
      sys.exit(1)
    }
    val Array(sfDir, outDir) = args.take(2)
    val spark = graft.GraftSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir)
    spark.stop()
  }

  /** Body split out so the spec can drive it on an existing session. */
  def run(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    // 1. intake gate
    val dq = DataQuality.dqReport(spark, sfDir).collect()
    dq.foreach { r =>
      val (rule, bad) = (r.getString(0), r.getLong(1))
      if (bad > 0 && hardRules(rule))
        throw new IllegalStateException(s"intake gate failed: $rule has $bad violations")
      if (bad > 0) println(s"[curation] advisory: $rule has $bad violations")
    }

    val docs = graft.sources.TableIO.table(spark, sfDir, "documents")
    val n0 = docs.count()

    // 2. near-dup clustering, run ONCE — both the drop set and the
    // cluster-aware split derive from the same labeling (the checkpoint
    // inside connectedComponents makes the reuse free)
    val clusters = GraphCC.dedupClusters(spark, sfDir)
    val dropIds = clusters.filter(col("is_canonical") === 0).select("doc_id")
    // 3. quality filter
    val quality = TextQueries.txtQuality(spark, sfDir)
      .select(col("doc_id"), col("quality_score"), col("n_tokens"))
    // 4. leakage-safe split (cluster-aware, computed BEFORE the drop so
    // the canonical keeps its cluster's assignment)
    val splits = MixQueries.splitLeakageFrom(docs,
      clusters.select(col("doc_id"), col("cluster_id"))).select("doc_id", "split")

    val curated = docs
      .join(dropIds, Seq("doc_id"), "left_anti")
      .join(quality, "doc_id")
      .filter(col("quality_score") >= 2)
      .join(splits, "doc_id")
    val summary = curated.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))

    curated.write.mode("overwrite").parquet(s"$outDir/corpus")
    graft.sources.TableIO.writeJsonLines(summary.coalesce(1), s"$outDir/summary")

    val n1 = n0 - dropIds.count()
    val n2 = curated.count()
    println(s"[curation] docs=$n0 after-dedup=$n1 after-quality+split=$n2 -> $outDir")
  }
}
