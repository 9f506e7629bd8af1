package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewCap

/** The no-silent-caps contract (SkewCap):
  *  - every capped family's gate runs with ZERO cap drops at oracle
  *    scale (the DuckDB replays are capless, so a firing cap there IS a
  *    correctness divergence — this is the oracle-scale assert form);
  *  - the observe() metric actually fires and reports the drop when a
  *    cap DOES trigger (synthetic degenerate bucket), so a production
  *    run gets a per-query signal instead of silent pair loss.
  */
class CapObservabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val seen =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private lazy val listener = {
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.endsWith("_cap") &&
              row.schema.fieldNames.contains("rows_dropped"))
            seen.merge(name,
              Option(row.getAs[Any]("rows_dropped"))
                .map(_.toString.toLong).getOrElse(0L),
              (a, b) => math.max(a, b))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    l
  }

  private def awaitMetric(name: String): Long = {
    var waited = 0
    while (!seen.containsKey(name) && waited < 20000) {
      Thread.sleep(100); waited += 100
    }
    assert(seen.containsKey(name),
      s"observed metric '$name' never arrived — the cap went silent")
    seen.get(name)
  }

  test("every capped family reports ZERO drops at oracle scale") {
    listener
    // Each test reads only the runs IT triggers: drop whatever earlier
    // suites/tests on the shared session reported under the same metric
    // names (the max-merge would otherwise return a stale maximum).
    seen.clear()
    val gates = Seq(
      "q_dedup_simhash" -> "simhash_band_cap",
      "q_mm_phash_neardup" -> "phash_band_cap",
      "q_mm_audio_neardup" -> "audio_band_cap",
      "q_mm_video_clip_neardup" -> "clip_shingle_cap",
      "q_mm_audio_clip_neardup" -> "audio_shingle_cap",
      // the incremental ingest's banded delta probes (one metric per
      // modality; one gate drives both)
      "q_curation_mm_incremental" -> "img_inc_cap",
      "q_curation_mm_incremental" -> "aud_inc_cap")
    gates.map(_._1).distinct.foreach { gate =>
      SparkEntry.queries(gate)(spark, dir).count()
    }
    gates.foreach { case (gate, metric) =>
      assert(awaitMetric(metric) == 0L,
        s"$gate dropped banded rows at oracle scale — the capless DuckDB " +
          "replay would diverge")
    }
  }

  test("a firing cap is observable: metric reports the removed rows and " +
      "droppedCount agrees") {
    listener
    seen.clear()
    val spark2 = spark
    import spark2.implicits._
    // degenerate bucket: 50 rows share one key, 3 rows are singletons
    val df = (Seq.fill(50)(7L) ++ Seq(1L, 2L, 3L)).toDF("k")
    assert(SkewCap.droppedCount(df, Seq(col("k")), 10) == 50L)
    val kept = SkewCap.dropOverCap(df, Seq(col("k")), 10, "spec_fire_cap")
      .count()
    assert(kept == 3L)
    assert(awaitMetric("spec_fire_cap") == 50L,
      "firing cap did not report its removed rows")
  }
}
