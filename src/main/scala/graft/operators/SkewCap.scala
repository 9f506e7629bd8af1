package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The windowed count-and-drop skew guard every banded candidate join
  * here uses (simhash bands, phash/audio-fingerprint bands, clip
  * shingles), with the drop made OBSERVABLE — the no-silent-caps
  * discipline: a cap that fires at a larger sf would otherwise remove
  * candidate pairs with no signal beyond a far-away oracle hash mismatch.
  *
  * Observability is two-layered, both zero-cost on the data path:
  *  - `observe()` attaches a CollectMetrics node carrying the number of
  *    rows the cap removed and the largest bucket seen — the counts ride
  *    the exchange the join already pays (no extra job, no extra pass),
  *    and [[registerWarnings]] logs a WARN with the metric name and
  *    counts whenever a query completes with a non-zero drop. Metric
  *    names are per CALL SITE (`*_cap`), not per helper, because one
  *    query may compose several capped families (the multimodal curation
  *    capstone) and Spark requires observed-metric names to be unique
  *    within a plan unless the subtrees are identical.
  *  - [[droppedCount]] exposes the same count as an eager scalar for
  *    oracle-scale asserts (the caps must NEVER fire at gate scale — the
  *    DuckDB replays are capless, so a firing cap IS a correctness
  *    divergence there; CapObservabilitySpec pins this for every capped
  *    family).
  */
object SkewCap {

  /** Drop rows whose (keys) bucket exceeds `cap`, observing the removal.
    * The windowed count rides the partitionBy(keys) exchange the caller's
    * self-join needs anyway. `metric` must be unique per call site and
    * end in `_cap` for [[registerWarnings]] to pick it up.
    *
    * `failOnDrop` turns the cap into a build-time ASSERTION: instead of
    * silently (well, observably) removing the bucket, the job FAILS on
    * the first over-cap row. This is the contract for persisted fixture /
    * base-state builds: their DuckDB oracle replays are CAPLESS, and the
    * incremental-curation base replay additionally assumes the persisted
    * pair tables are exactly the uncapped pair set — a cap that fires
    * during such a build is a correctness divergence, not a skew guard,
    * so it must stop the build loudly. Zero extra jobs: the assert is an
    * `assert_true` folded into the row filter of the build's own write
    * job (the Merge dup-guard idiom). */
  def dropOverCap(df: DataFrame, keys: Seq[Column], cap: Int,
                  metric: String, failOnDrop: Boolean = false): DataFrame = {
    val counted = df
      .withColumn("_bucket_n", count(lit(1)).over(Window.partitionBy(keys: _*)))
      .observe(metric,
        coalesce(sum(when(col("_bucket_n") > cap, lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("rows_dropped"),
        coalesce(max(col("_bucket_n")), lit(0L)).as("max_bucket"))
    val keep =
      if (!failOnDrop) col("_bucket_n") <= cap
      // assert_true returns null on pass; folded into the filter so the
      // optimizer cannot prune the check away.
      else coalesce(assert_true(col("_bucket_n") <= cap,
          lit(s"skew cap '$metric' fired during a fixture/base-state " +
            "build - the capless oracle replay would diverge; raise the " +
            "cap or shrink the fixture")).cast("boolean"), lit(true)) &&
        col("_bucket_n") <= cap
    counted.filter(keep).drop("_bucket_n")
  }

  /** Eager count of the rows [[dropOverCap]] would remove — the
    * oracle-scale assert form (the capless-DuckDB contract). */
  def droppedCount(df: DataFrame, keys: Seq[Column], cap: Int): Long =
    df.withColumn("_bucket_n", count(lit(1)).over(Window.partitionBy(keys: _*)))
      .filter(col("_bucket_n") > cap)
      .count()

  /** Log a WARN whenever any `*_cap` observed metric completes a query
    * with rows_dropped > 0 — the runtime signal that a skew cap removed
    * candidate pairs (expected at degenerate-corpus scale, a correctness
    * alarm at oracle scale). Idempotent per session — the registry holds
    * the session WEAKLY, so a stopped session is not pinned for the JVM
    * lifetime in a long-lived multi-session process. Emitted through
    * slf4j (Spark's own logging backend), so the signal lands in the log
    * stream, not a possibly-redirected stderr. */
  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.SkewCap")
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
  def registerWarnings(spark: SparkSession): Unit =
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              // The field guard keeps an unrelated observe() node that
              // happens to end in `_cap` from throwing inside the
              // listener on every completion.
              if (name.endsWith("_cap") &&
                  row.schema.fieldNames.contains("rows_dropped")) {
                val dropped = Option(row.getAs[Any]("rows_dropped"))
                  .map(_.toString.toLong).getOrElse(0L)
                if (dropped > 0L) {
                  val maxB =
                    if (row.schema.fieldNames.contains("max_bucket"))
                      Option(row.getAs[Any]("max_bucket"))
                        .map(_.toString).getOrElse("?")
                    else "?"
                  log.warn(
                    s"skew cap '$name' dropped $dropped banded rows " +
                      s"(max bucket $maxB) — candidate pairs agreeing " +
                      "only on dropped buckets are lost")
                }
              }
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    }
}
