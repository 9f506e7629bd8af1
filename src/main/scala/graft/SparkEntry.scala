package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator family from SURVEY §2
  * (plus the large-scale pipeline extension operators: dedup, similarity,
  * text analysis, multimodal); `oracleSql` carries the DuckDB-equivalent SQL
  * for every hash-checkable query. Column names are aliased identically on
  * both sides — the driver sorts columns by name before hashing values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * broadcast-dim join + exact grouped aggregation (SURVEY §2.3/§2.5). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.j1BroadcastDims(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++ MixQueries.queries ++
      EventQueries.queries ++ SpecialJoins.queries ++ DataQuality.queries ++
      Sketches.queries ++ GraphCC.queries ++ PackQueries.queries ++
      CurationMm.queries ++
      Clustering.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      LifecycleQueries.queries ++ graft.sources.CatalogBucketing.queries ++
      graft.streaming.StreamGates.queries ++
      graft.enrich.EnrichGuardGate.queries ++
      graft.pipeline.mls.MlsJob1Gate.queries ++
      graft.pipeline.mls.MlsJob2Gate.queries ++
      graft.pipeline.mls.MlsJob3Gate.queries ++
      graft.pipeline.mls.MlsJobCliGate.queries ++
      graft.pipeline.mls.MlsEnrichMssqlGate.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++ MixQueries.oracles ++
      EventQueries.oracles ++ SpecialJoins.oracles ++ DataQuality.oracles ++
      Sketches.oracles ++ GraphCC.oracles ++ PackQueries.oracles ++
      CurationMm.oracles ++
      Clustering.oracles ++
      SimilarityQueries.oracles ++ MultimodalQueries.oracles ++
      LifecycleQueries.oracles ++ graft.sources.CatalogBucketing.oracles ++
      graft.streaming.StreamGates.oracles ++
      graft.enrich.EnrichGuardGate.oracles ++
      graft.pipeline.mls.MlsJob1Gate.oracles ++
      graft.pipeline.mls.MlsJob2Gate.oracles ++
      graft.pipeline.mls.MlsJob3Gate.oracles ++
      graft.pipeline.mls.MlsJobCliGate.oracles ++
      graft.pipeline.mls.MlsEnrichMssqlGate.oracles
}
