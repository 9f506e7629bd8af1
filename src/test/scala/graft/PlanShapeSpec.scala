package graft

import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-SHAPE regression guard: the scale posture of each operator family
  * is a property of its physical plan (shuffle count, broadcast choice),
  * not of any one run's timing — a refactor that silently adds an
  * exchange passes every value-level gate and still loses an order of
  * magnitude at 100 TB. These tests pin the shuffle budget of
  * representative queries. AQE is disabled around the plan build (and
  * restored after) so `executedPlan` is the static physical plan with
  * every Exchange visible and countable. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def exchanges(name: String): (Int, Int) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
      (plan.collect { case e: ShuffleExchangeExec => e }.size,
        plan.collect { case e: BroadcastExchangeExec => e }.size)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("scan-side operators shuffle nothing") {
    // incl. the real-decode media gates: container parse, pixel/PCM read,
    // and in-loop segmentation all run where the bytes are
    for (q <- Seq("q_txt_repetition", "q_split_assign", "q_s13_schema_project",
      "q_txt_tokens", "q_txt_redact", "q_mm_binary_meta", "q_chunk_windows",
      "q_mm_video_frames", "q_mm_audio_features", "q_mm_audio_segments")) {
      val (sh, _) = exchanges(q)
      assert(sh == 0, s"$q grew a shuffle")
    }
  }

  test("media dedup gates pay exactly the two-phase distinct budget") {
    // groupBy on the content hash with a count-distinct alongside plans
    // as the standard two-exchange distinct-expand — never a third
    // (which would mean the decode subtree was duplicated into a
    // second plan branch).
    for (q <- Seq("q_mm_audio_dedup", "q_mm_video_frame_dedup")) {
      val (sh, _) = exchanges(q)
      assert(sh == 2, s"$q expected 2 shuffles, got $sh")
    }
  }

  test("data mixing broadcasts the rate dim, shuffles nothing") {
    val (sh, bc) = exchanges("q_mix_sample")
    assert(sh == 0, "q_mix_sample grew a shuffle")
    assert(bc == 1, "rate dim no longer broadcast")
  }

  test("single-key window/agg operators shuffle exactly once") {
    for (q <- Seq("q_events_funnel", "q_w1_latest_wins", "q_dedup_exact",
      "q_events_attribution", "q_w4_minmax_window", "q_shuffle_shard",
      "q_sample_stratified")) {
      val (sh, _) = exchanges(q)
      assert(sh == 1, s"$q expected 1 shuffle, got $sh")
    }
  }

  test("DSIR: one bucket-stats exchange, one bounded totals window, one " +
      "per-doc aggregation; score table broadcasts back") {
    val (sh, bc) = exchanges("q_select_dsir")
    // Shuffle 1: the 1024-bucket stats groupBy (map-side combined);
    // shuffle 2: the single-partition totals window (B rows, bounded);
    // shuffle 3: the per-doc score aggregation; the global top-k is a
    // TakeOrderedAndProject (no Exchange node). The score table must
    // BROADCAST back — a fourth shuffle means either the corpus is being
    // exchanged to meet the B-row score table, or the gram-explode
    // subtree got duplicated into a second plan branch (the
    // scalar-crossJoin totals shape this operator was refactored away
    // from: it doubled the corpus scan).
    assert(sh == 3, s"q_select_dsir expected 3 shuffles, got $sh")
    assert(bc == 1, s"q_select_dsir expected 1 broadcast, got $bc")
  }

  for ((q, fix) <- Seq("q_mm_phash_neardup" -> "memo_mm_phgrp_fix",
    "q_mm_audio_neardup" -> "memo_mm_afpgrp_fix"))
  test(s"$q reads the persisted group table; the banded exchange is " +
      "REUSED by the self-join, never recomputed") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan
      val re = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => e
      }.size
      // Exactly one ReusedExchange: the right side of the band self-join
      // reads the left's banded shuffle output, so the group-table scan
      // + banding explode run ONCE.
      assert(re == 1, s"band self-join no longer reuses the banded exchange ($re)")
      val sh = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      // 2 shuffles: the (band, chunk) join exchange (the maxBucket cap's
      // count window rides it) and the pair distinct. The old third — the
      // collapse groupBy — was paid once when the persisted group table
      // was built (decode-once discipline).
      assert(sh == 2, s"$q expected 2 shuffles, got $sh")
      val wins = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.size
      assert(wins == 2, s"expected the bucket-cap window on both join sides, got $wins")
      val planStr = plan.toString
      assert(planStr.contains(fix),
        s"$q no longer reads the persisted group table")
      assert(!planStr.contains("Scan ExistingRDD"),
        s"$q re-decodes payloads inline instead of scanning the table")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("perceptual cluster + image-dedup gates ride the persisted hash " +
      "tables, never an inline re-decode") {
    for ((q, fix) <- Seq("q_mm_phash_clusters" -> "memo_mm_phgrp_fix",
      "q_mm_audio_clusters" -> "memo_mm_afpgrp_fix",
      "q_mm_phash_dedup" -> "memo_mm_phash_fix")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains(fix), s"$q no longer reads $fix")
      // (the cluster gates' CC labels legitimately arrive as checkpoint
      // RDDs; the hash SOURCE must still be the persisted table, which
      // the fixture-name assert above pins)
      if (q == "q_mm_phash_dedup")
        assert(!plan.contains("Scan ExistingRDD"),
          s"$q re-decodes payloads inline instead of scanning the table")
    }
  }

  test("incremental novelty consumes the PERSISTED known-grams table, " +
      "not a live recompute of batch 1's attribution") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_txt_novelty_incremental")(spark, dir)
        .queryExecution.executedPlan.toString
      // the known table arrives as a parquet READ of the per-dir fixture
      // (production: yesterday's table on disk) — both consumers (batch-1
      // self-score, batch-2 screen) scan it
      assert(plan.contains("memo_novelty_known_fix"),
        "known-grams table no longer read from the persisted fixture")
      assert(plan.linesIterator
        .count(l => l.contains("FileScan parquet") &&
          l.contains("memo_novelty_known_fix")) == 2,
        "expected exactly 2 scans of the persisted known table")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  for ((q, fix) <- Seq("q_mm_video_clip_neardup" -> "memo_mm_frames2_fix",
    "q_mm_audio_clip_neardup" -> "memo_mm_aseg_fix"))
  test(s"$q: shingles assemble in one per-id exchange over the persisted " +
      "table, the DF cap rides the shingle exchange, the self-join reuses it") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan
      val sh = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      val re = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => e
      }.size
      // 3 shuffles: the per-id shingle assembly groupBy, the shingle
      // exchange (cap window + join distribution), the pair aggregation.
      // The n_sh window rides the id groupBy's partitioning and the
      // join's right side REUSES the shingle exchange.
      assert(sh == 3, s"$q expected 3 shuffles, got $sh")
      assert(re == 1, s"shingle self-join no longer reuses its exchange ($re)")
      assert(plan.toString.contains(fix),
        s"$q no longer reads the persisted table $fix")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("split leakage reads the PERSISTED text-cluster table, never a " +
      "re-run of the PPJoin + CC pipeline") {
    val plan = SparkEntry.queries("q_split_leakage")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("memo_txt_cc_fix"),
      "q_split_leakage no longer reads the persisted cluster table")
    assert(!plan.contains("Scan ExistingRDD"),
      "q_split_leakage re-runs the CC pipeline inline")
  }

  test("loader-ready packing reads the PERSISTED manifest, never a re-run " +
      "of the curation composition") {
    // The prefix-sum checkpoint detaches the final plan from its source,
    // so the pin rides the memo registry (the BenchHonestySpec pattern):
    // every invocation must request the manifest fixture.
    import graft.sources.ScratchDirs
    val c0 = ScratchDirs.requestedMemoCounts.getOrElse("mm_manifest_fix", 0L)
    SparkEntry.queries("q_curation_pack_e2e")(spark, dir).count()
    val c1 = ScratchDirs.requestedMemoCounts.getOrElse("mm_manifest_fix", 0L)
    SparkEntry.queries("q_curation_pack_e2e")(spark, dir).count()
    val c2 = ScratchDirs.requestedMemoCounts.getOrElse("mm_manifest_fix", 0L)
    assert(c1 > c0 && c2 > c1,
      "q_curation_pack_e2e no longer routes through the persisted manifest")
  }

  test("the multimodal capstone runs ONE live closure: per-modality " +
      "cluster labels arrive as persisted FileScans") {
    val plan = SparkEntry.queries("q_curation_mm_e2e")(spark, dir)
      .queryExecution.executedPlan
    val planStr = plan.toString
    // (the persisted PAIR tables feed the cross-modality CC's internal
    // jobs, behind its checkpoint — only the label tables are visible in
    // the final manifest plan)
    for (fix <- Seq("memo_mm_phcc_fix", "memo_mm_afcc_fix",
        "memo_txt_cc_fix"))
      assert(planStr.contains(fix),
        s"capstone no longer reads the persisted $fix table")
    // exactly one checkpoint scan — the CROSS-modality closure, the only
    // CC the capstone still pays live; a second one means an image/audio
    // cluster closure got re-inlined (string form: AQE wraps the tree,
    // so node collect() does not traverse it)
    val rddScans = "Scan ExistingRDD".r.findAllIn(planStr).size
    assert(rddScans == 1,
      s"capstone expected 1 checkpoint scan (the cross-modality CC), " +
        s"got $rddScans")
    // a Generate = the banding explode re-inlined (the pair tables exist
    // so consumers never pay the banded self-join again)
    assert(!planStr.contains("Generate "),
      "capstone re-runs a banding explode")
  }

  test("video curation reads BOTH persisted artifacts (frame + clip-pair " +
      "tables) and never re-runs the shingle pipeline") {
    val plan = SparkEntry.queries("q_mm_video_curation")(spark, dir)
      .queryExecution.executedPlan
    val planStr = plan.toString
    assert(planStr.contains("memo_mm_frames2_fix"),
      "curation no longer reads the persisted frame table")
    assert(planStr.contains("memo_mm_clippairs_fix"),
      "curation no longer reads the persisted clip-pair table")
    // a Generate here = the shingle explode got re-inlined (the pair
    // table exists so consumers never pay the self-join again)
    val gens = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.size
    assert(gens == 0, s"curation re-runs the shingle explode ($gens Generate)")
    assert(!planStr.contains("Scan ExistingRDD"),
      "curation re-decodes frames inline instead of scanning the table")
  }

  test("video frame consumers read the persisted frame table, never a " +
      "second decode pass") {
    for (q <- Seq("q_mm_video_frame_dedup", "q_mm_video_stats")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("memo_mm_frames_fix"),
        s"$q no longer reads the persisted frame table")
      assert(!plan.contains("Scan ExistingRDD"),
        s"$q re-decodes frames inline instead of scanning the table")
    }
  }

  test("rolling novelty's end-of-day merge is DELTA-sized: one batch-2 " +
      "gram explode plus a scan of the persisted known table") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val merge = graft.operators.TextQueries.noveltyKnownMerge(spark, dir)
        .queryExecution.executedPlan
      val planStr = merge.toString
      assert(planStr.contains("memo_novelty_roll_fix"),
        "merge leg no longer reads the persisted known-grams table")
      // exactly ONE Generate: batch 2's gram explode (the day's delta).
      // A second one would mean batch 1's corpus-scale attribution is
      // being recomputed for the table update.
      val gens = merge.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }.size
      assert(gens == 1, s"merge leg expected 1 gram explode, got $gens")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("anomaly gates: all medians/MAD windows share one event_type " +
      "exchange over the bounded hourly frame") {
    // q_events_anomaly: shuffle 1 the corpus hourly groupBy, shuffle 2
    // the event_type windows (rn/cnt/median/rn2/mad all one partition
    // spec). The floor twin adds the heartbeat derivation: distinct
    // observed hours (3) and the bounded min/max window over them (4);
    // the flag windows still collapse into ONE event_type exchange.
    val (sh1, _) = exchanges("q_events_anomaly")
    assert(sh1 == 2, s"q_events_anomaly expected 2 shuffles, got $sh1")
    val (sh2, _) = exchanges("q_events_anomaly_floor")
    assert(sh2 == 4, s"q_events_anomaly_floor expected 4 shuffles, got $sh2")
  }

  test("ANN queries broadcast queries and never shuffle the corpus scan") {
    for (q <- Seq("q_sim_cosine_topk", "q_sim_knn_label")) {
      val (sh, bc) = exchanges(q)
      // exactly ONE shuffle — the per-query ranking window over scored
      // rows (the vote aggregation reuses the query_id partitioning); the
      // corpus side must stay shuffle-free, so a second exchange IS the
      // regression this guard exists to catch
      assert(sh == 1, s"$q expected exactly 1 shuffle, got $sh")
      assert(bc >= 1, s"$q no longer broadcasts the query side")
    }
  }

  test("embedding dedup distributes O(n^2) as a shuffled equi-join") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.operators.SimilarityQueries.dedupEmbedding(spark, dir)
        .queryExecution.executedPlan
      // Triangle blocking must plan as a sort-merge/hash EQUI-join on the
      // (lo, hi) block-pair key — a BroadcastNestedLoop or Cartesian here
      // means the blocking stopped reaching the join and every executor
      // re-scans the corpus.
      val cartesians = plan.collect {
        case e: org.apache.spark.sql.execution.joins.CartesianProductExec => e
        case e: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => e
      }
      assert(cartesians.isEmpty, "pair join degenerated to a cross product")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size <= 2, s"expected the two join-side exchanges, got ${shuffles.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("embedding dedup block count scales with parallelism, floored at 8") {
    // The derived B = max(8, ceil(sqrt(2p))): floor binds up to p=32;
    // 1000 executors x 4 cores -> B=90 -> 4095 reduce groups.
    def derive(p: Int) = math.max(8, math.ceil(math.sqrt(2.0 * p)).toInt)
    assert(derive(4) == 8 && derive(32) == 8 && derive(4000) == 90)
    // Output-invariance of the blocking: explicit B values agree.
    val a = graft.operators.SimilarityQueries.dedupEmbedding(spark, dir, nBlocks = 3)
      .orderBy("id_a", "id_b").collect().toSeq
    val b = graft.operators.SimilarityQueries.dedupEmbedding(spark, dir, nBlocks = 11)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("projection pruning and filter pushdown reach the parquet scan") {
    def scans(name: String) = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    // q_p1 projects a 2-column prefix of the 9-column customer table: a
    // scan reading more than the projected+filtered columns lost pruning.
    val p1 = scans("q_p1_prefix_project")
    assert(p1.nonEmpty && p1.forall(_.schema.fields.length <= 3),
      s"q_p1 scan reads ${p1.map(_.schema.fields.length).mkString(",")} columns")
    // q_p6 filters on l_quantity: the predicate must appear in the scan's
    // PushedFilters, not only in a post-scan Filter node.
    val p6 = scans("q_p6_filters")
    assert(p6.exists(_.metadata.getOrElse("PushedFilters", "[]").contains("l_quantity")),
      "q_p6 filter no longer pushed to the parquet reader")
  }

  test("bucketed tables join with no exchange and no sort") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // disable broadcast: at gate scale the small side would broadcast and
    // hide the property under test — the 100 TB case is big ⋈ big, where
    // the bucketed layout is what saves the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.CatalogBucketing.bucketedJoin(spark, dir).count()
      val plan = graft.sources.CatalogBucketing.joinOnly(spark)
        .queryExecution.executedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, "expected a shuffled-family join over buckets")
      // the join subtree must be exchange-free: the bucket layout already
      // co-locates both sides, so nothing crosses the network. (An
      // in-task SortExec per bucket remains — since 3.0 Spark doesn't
      // trust bucket sort order by default; the legacy
      // bucketedTableScan.outputOrdering conf restores sort-free reads
      // when every bucket is one file, which writeBucketed guarantees.)
      joins.foreach { j =>
        assert(j.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          "bucketed join grew an exchange")
      }
      val totalSh = plan.collect { case e: ShuffleExchangeExec => e }.size
      assert(totalSh == 1, s"expected only the rollup exchange, got $totalSh")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("partitioned scan prunes to the filtered partition") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_partitioned_scan")(spark, dir)
        .queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      assert(scans.nonEmpty)
      // the lang filter must resolve at partition-listing time, and only
      // the en/ directory's files may be selected
      assert(scans.exists(_.metadata.getOrElse("PartitionFilters", "")
        .contains("lang")), "lang filter not applied as a partition filter")
      scans.foreach { s =>
        assert(s.selectedPartitions.partitionCount == 1,
          s"expected 1 pruned partition, got ${s.selectedPartitions.partitionCount}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("leakage split attaches clusters with an equi-join, never a loop") {
    // q_split_leakage's eager CC half keeps it out of the sweep below;
    // guard the lazy half directly with an inline cluster labeling.
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = graft.sources.TableIO.table(spark, dir, "documents")
      val clusters = Seq((3L, 1L), (7L, 1L)).toDF("doc_id", "cluster_id")
      val plan = graft.operators.MixQueries.splitLeakageFrom(docs, clusters)
        .queryExecution.executedPlan
      val loops = plan.collect {
        case e: org.apache.spark.sql.execution.joins.CartesianProductExec => e
        case e: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => e
      }
      assert(loops.isEmpty, "cluster attach degenerated to a nested loop")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("SCD2 temporal join plans as an equi-join, never a nested loop") {
    // The validity-range predicate must ride as a RESIDUAL on the key
    // equi-join — a raw BETWEEN join would plan BNLJ and die at scale.
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val facts = Seq((1L, 10L, "2024-02-01")).toDF("k", "cust", "dt")
      val dim = Seq((10L, "a", "2024-01-01", null.asInstanceOf[String], true))
        .toDF("cust", "attr", "valid_from", "valid_to", "is_current")
      val plan = graft.operators.Scd2
        .temporalJoin(facts, dim, Seq("cust"), org.apache.spark.sql.functions.col("dt"))
        .queryExecution.executedPlan
      val loops = plan.collect {
        case e: org.apache.spark.sql.execution.joins.CartesianProductExec => e
        case e: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => e
      }
      assert(loops.isEmpty, "temporal join degenerated to a nested loop:\n" + plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("no gate plan contains an accidental cross join") {
    // Sweep the lazily-planned gates (eagerly-executing gates — e2e jobs,
    // CC, lifecycle, JDBC — are excluded to keep the suite fast; their
    // shapes are pinned individually or audited via Explain).
    // BNLJ is allowed only where the broadcast side is tiny BY
    // CONSTRUCTION: the disjunctive dim join (SURVEY J2), the brute-force
    // ANN family (≤ nQueries broadcast rows against one corpus scan — the
    // documented O(n·q) contract), and TF-IDF's one-row corpus-size join.
    val swept = Seq(
      "q_j1_broadcast_dims", "q_j2_disjunctive_join", "q_j5_coalesce_lookup",
      "q_j11_inner_attach", "q_dedup_exact", "q_dedup_jaccard",
      "q_dedup_minhash", "q_dedup_simhash", "q_dedup_embedding",
      "q_dedup_embedding_lsh", "q_dedup_embedding_ivf", "q_w1_salted_skew",
      "q_dedup_incremental", "q_sim_cosine_topk", "q_sim_lsh_topk",
      "q_sim_ivf_topk", "q_sim_knn_label", "q_sim_recall", "q_txt_tfidf",
      "q_txt_boilerplate", "q_txt_contamination", "q_mix_sample",
      "q_split_assign", "q_sample_stratified", "q_sketch_heavy",
      "q_star_join", "q_asof_join", "q_range_join", "q_dq_report",
      "q_u2_union_precedence", "q_w1_latest_wins", "q_w2_hist_grain",
      "q_events_funnel", "q_events_attribution", "q_events_wau")
    // q_sketch_heavy's one-row total attaches via crossJoin(broadcast),
    // the same tiny-by-construction contract as TF-IDF's corpus size.
    val allowedBnlj = Set("q_j2_disjunctive_join", "q_sim_cosine_topk",
      "q_sim_knn_label", "q_sim_recall", "q_txt_tfidf", "q_sketch_heavy")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try for (q <- swept) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.joins.CartesianProductExec => e
      }.isEmpty, s"$q plans a CartesianProduct")
      val bnlj = plan.collect {
        case e: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => e
      }
      assert(bnlj.isEmpty || allowedBnlj(q), s"$q plans a BroadcastNestedLoopJoin")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("snapshot diff is one full-outer join; heavy hitters broadcast") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.functions._
      // diffFrames: one exchange per side of the full-outer key join —
      // a third exchange or a nested-loop fallback would break the
      // "same cost class as the MERGE" contract
      val orders = spark.read
        .parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast("double").as("total"))
      val before = orders.filter(col("k") % 3 =!= 0)
      val after = orders.filter(col("k") % 2 =!= 0)
      val dPlan = graft.operators.SnapshotDiff
        .diffFrames(before, after, Seq("k"))
        .queryExecution.executedPlan
      assert(dPlan.collect {
        case e: ShuffleExchangeExec => e }.size <= 2)
      assert(dPlan.collect {
        case e: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => e
        case e: org.apache.spark.sql.execution.joins.CartesianProductExec => e
      }.isEmpty, "diff must stay an equi-join")

      // heavy hitters: the candidate semi-join must BROADCAST the
      // candidates (≤ partitions×k rows) — shuffling the token stream
      // for it would move the full corpus
      val hPlan = SparkEntry.queries("q_sketch_heavy")(spark, dir)
        .queryExecution.executedPlan
      val semiJoins = hPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType.sql == "LEFT SEMI" => j
      }
      assert(semiJoins.nonEmpty, "candidate filter is no longer a broadcast semi-join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("distinct-style aggregations stay within the two-phase budget") {
    for (q <- Seq("q_sketch_theta", "q_corpus_stats", "q_events_transitions")) {
      val (sh, _) = exchanges(q)
      assert(sh <= 2, s"$q expected <=2 shuffles, got $sh")
    }
  }

  test("star join broadcasts every dim; dq report is one aggregation pass") {
    val (starSh, starBc) = exchanges("q_star_join")
    // fact⋈orders pays the real exchanges (+ the final rollup); the
    // customer→nation→region chain must all broadcast at this scale
    assert(starSh <= 3, s"q_star_join expected <=3 shuffles, got $starSh")
    assert(starBc >= 3, s"q_star_join dims no longer broadcast (got $starBc)")
    // one scan; the uniqueness rule's exact countDistinct adds the
    // standard distinct-expand exchange on top of the final agg exchange
    val (dqSh, _) = exchanges("q_dq_report")
    assert(dqSh <= 2, s"q_dq_report expected <=2 shuffles, got $dqSh")
  }

  test("as-of joins once on the key; range join never goes nested-loop") {
    val (sh, _) = exchanges("q_asof_join")
    assert(sh == 1, s"as-of union-window expected 1 shuffle, got $sh")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_range_join")(spark, dir)
        .queryExecution.executedPlan
      val loops = plan.collect {
        case e: org.apache.spark.sql.execution.joins.CartesianProductExec => e
        case e: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => e
      }
      assert(loops.isEmpty, "band join degenerated to a nested loop")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("boilerplate df join shuffles, never broadcasts or windows the grams") {
    // Three exchanges (grams->join, df agg, doc_id agg) and NO window or
    // broadcast: a BroadcastExchange means the df side regressed to a
    // toy-scale plan (df is O(distinct n-grams)); a Window node means the
    // hot-gram groups became one unsplittable task each — AQE skew
    // handling only slices shuffled joins.
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_txt_boilerplate")(spark, dir)
        .queryExecution.executedPlan
      assert(plan.collect { case e: BroadcastExchangeExec => e }.isEmpty,
        "df side got broadcast")
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
        "df computed as an unsplittable window")
      val sh = plan.collect { case e: ShuffleExchangeExec => e }.size
      assert(sh <= 3, s"expected <=3 shuffles, got $sh")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("k-means assignment is map-only; balanced sample adds one shuffle") {
    // Centroids ride the plan as literals, so the assignment itself must
    // be a pure projection over the scan — an exchange here means the
    // argmin stopped being broadcast-shaped and the corpus is moving.
    // (The Lloyd training rounds execute eagerly inside the call; these
    // pins are on the returned frame's plan.)
    val (shA, _) = exchanges("q_cluster_kmeans")
    assert(shA == 0, s"q_cluster_kmeans assignment grew a shuffle ($shA)")
    // The per-cluster cap is one window over the assignment: exactly one
    // exchange on cluster id.
    val (shS, _) = exchanges("q_cluster_sample")
    assert(shS == 1, s"q_cluster_sample expected 1 shuffle, got $shS")
  }
}
