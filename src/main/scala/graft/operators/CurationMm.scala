package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.sources.TableIO.table
import graft.sources.{ManagedTable, MergeClauses, ScratchDirs}

/** The multimodal curation CAPSTONE: one corpus manifest over documents
  * carrying image/audio/video attachments, composing every per-modality
  * screen the engine owns — text near-dup clusters, the heuristic quality
  * bar, image perceptual clusters, audio fingerprint clusters, and the
  * video clip-dup + static screens — into a single published keep/drop
  * list with MULTI-REASON drop attribution (the MLS `_reject_reasons`
  * concat_ws precedent, mls_listings_transform.py:118) and
  * leakage-safe train/validation/test splits drawn per CROSS-MODALITY
  * cluster: two documents sharing a text cluster, a perceptual image or
  * audio cluster, or a reused video clip always co-assign, so no near
  * duplicate of a training document can leak into eval through ANY
  * modality.
  *
  * Attachment model: document d carries image `2d` / audio `4d` /
  * video `2d` — except that every doc ≡ 1 (mod 3) carries its
  * predecessor's near-variant image twin, every doc ≡ 1 (mod 5) its
  * predecessor's perceptual audio twin, every doc ≡ 1 (mod 4) its
  * predecessor's trimmed clip re-upload, and every doc ≡ 3 (mod 4) its
  * predecessor's static clip (all attachments the per-modality fixtures
  * already seed — pure closed-form functions of doc_id, so the DuckDB
  * oracle replays the whole composition from the per-modality closed
  * forms; doc ids are contiguous from 0, so each referenced predecessor
  * artifact exists).
  *
  * Scale shape: every perceptual input is a PERSISTED artifact — hash /
  * fingerprint / frame / PAIR / CLUSTER-LABEL tables, decode and
  * per-modality closure each paid once per sf dir — so the capstone's
  * live work is the one CROSS-MODALITY group closure (checkpointed
  * star-alternation CC, O(log² n) rounds, nothing collected) plus bounded
  * joins against drop sets that are tiny next to the corpus. The
  * cross-modality graph encodes heterogeneous nodes in disjoint strides
  * (doc d → 8d, text cluster c → 8c+1, image group canon g → 8g+2,
  * audio group canon → 8g+3, video → 8v+4), so ONE generic CC covers
  * all four modalities without per-modality plumbing.
  *
  * Beyond the one-shot capstone, [[curationMmIncremental]] is the
  * PRODUCTION loop: a new document batch merged into the persisted
  * cluster/manifest state through the table layer — the reference's own
  * incremental micro-merge shape (union new ∪ curated → re-window →
  * MERGE, mls_listings_curated.py:132-160) lifted to the curation axis —
  * and [[curationCdf]] publishes the per-round keep/drop DELTA as the
  * change-data-feed artifact a downstream training-data consumer polls.
  */
object CurationMm {

  private val mmSplitSalt = "splitmm:"

  /** Attachment table: (doc_id, img, aud, vid) — see the object doc. */
  private def attachments(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"))
      .withColumn("img",
        when(col("doc_id") % 3 === 1, (col("doc_id") - 1) * 2 + 1)
          .otherwise(col("doc_id") * 2))
      .withColumn("aud",
        when(col("doc_id") % 5 === 1, (col("doc_id") - 1) * 4 + 3)
          .otherwise(col("doc_id") * 4))
      .withColumn("vid",
        when(col("doc_id") % 4 === 1 || col("doc_id") % 4 === 3,
          (col("doc_id") - 1) * 2 + 1)
          .otherwise(col("doc_id") * 2))

  /** Everything the manifest assembly and the cross-modality graph need,
    * decoupled from WHERE the frames come from: the full capstone reads
    * persisted tables, the incremental base fixture reads id-FILTERED
    * persisted tables (every per-modality artifact is a pure function of
    * its endpoints, so a base-corpus replay is a pure id filter), and
    * the incremental merge path swaps in delta-updated frames. */
  private final case class MmInputs(
      att: DataFrame,       // doc_id, img, aud, vid
      docs: DataFrame,      // doc_id
      textCl: DataFrame,    // doc_id, cluster_id, is_canonical
      quality: DataFrame,   // doc_id, quality_score, n_tokens
      imgMember: DataFrame, // img_id, canon
      imgPairs: DataFrame,  // canon_a, canon_b
      imgCl: DataFrame,     // canon, cluster_id
      audMember: DataFrame, // audio_id, canon
      audPairs: DataFrame,  // canon_a, canon_b
      audCl: DataFrame,     // canon, cluster_id
      vidPairs: DataFrame,  // video_a, video_b
      vidDup: DataFrame,    // vid
      vidStatic: DataFrame) // vid

  /** Full-corpus inputs: pure FileScans of the persisted per-sf-dir
    * artifact tables (hash/group/pair/cluster/frame) — no decode, no
    * banded join, no per-modality CC at capstone time. */
  private def modalFull(s: SparkSession, dir: String): MmInputs = {
    val frames = s.read.parquet(
      MultimodalQueries.videoClipFrameTablePath(s, dir))
    val vidPairs = s.read.parquet(
        MultimodalQueries.videoClipPairTablePath(s, dir))
      .select(col("video_a"), col("video_b"))
    MmInputs(
      att = attachments(s, dir),
      docs = table(s, dir, "documents").select(col("doc_id")),
      textCl = s.read.parquet(GraphCC.clusterTablePath(s, dir))
        .select(col("doc_id"), col("cluster_id"), col("is_canonical")),
      quality = TextQueries.txtQuality(s, dir)
        .select(col("doc_id"), col("quality_score"), col("n_tokens")),
      imgMember = s.read.parquet(
          MultimodalQueries.phashHashTablePath(s, dir))
        .join(MultimodalQueries.phashGroups(s, dir).select("phash", "canon"),
          "phash")
        .select(col("img_id"), col("canon")),
      imgPairs = s.read.parquet(MultimodalQueries.phashPairTablePath(s, dir)),
      imgCl = s.read.parquet(MultimodalQueries.phashClusterTablePath(s, dir)),
      audMember = s.read.parquet(
          MultimodalQueries.audioFpHashTablePath(s, dir))
        .join(MultimodalQueries.audioFpGroups(s, dir).select("phash", "canon"),
          "phash")
        .select(col("audio_id"), col("canon")),
      audPairs = s.read.parquet(
        MultimodalQueries.audioFpPairTablePath(s, dir)),
      audCl = s.read.parquet(
        MultimodalQueries.audioFpClusterTablePath(s, dir)),
      vidPairs = vidPairs,
      vidDup = vidPairs.select(col("video_b").as("vid")).distinct(),
      vidStatic = frames.groupBy("video_id")
        .agg(countDistinct(col("phash")).as("nd"))
        .filter(col("nd") === 1)
        .select(col("video_id").as("vid")))
  }

  /** The cross-modality leakage graph: encoded-node edge list over ONE
    * id space (strides ×8 — see the object doc). */
  private def encodedEdges(m: MmInputs): DataFrame = {
    val doc8 = (col("doc_id") * 8).as("s")
    m.textCl.select(doc8, (col("cluster_id") * 8 + 1).as("t"))
      .unionByName(m.att.join(m.imgMember, m.att("img") === m.imgMember("img_id"))
        .select(doc8, (col("canon") * 8 + 2).as("t")))
      .unionByName(m.imgPairs.select((col("canon_a") * 8 + 2).as("s"),
        (col("canon_b") * 8 + 2).as("t")))
      .unionByName(m.att.join(m.audMember, m.att("aud") === m.audMember("audio_id"))
        .select(doc8, (col("canon") * 8 + 3).as("t")))
      .unionByName(m.audPairs.select((col("canon_a") * 8 + 3).as("s"),
        (col("canon_b") * 8 + 3).as("t")))
      .unionByName(m.att.select(doc8, (col("vid") * 8 + 4).as("t")))
      .unionByName(m.vidPairs.select((col("video_a") * 8 + 4).as("s"),
        (col("video_b") * 8 + 4).as("t")))
  }

  /** Manifest assembly over prepared inputs: one row per document in
    * `m.docs` — (doc_id, kept, drop_reasons, split, group_id, group_docs,
    * quality_score, n_tokens). A document is kept iff NO screen fires;
    * every screen that fires is listed in `drop_reasons`, comma-joined
    * in screen order (text_dup, low_quality, image_dup, audio_dup,
    * video_dup, video_static). `group_id` is the document's
    * cross-modality leakage component (encoded-node minimum —
    * deterministic, hash-replayable) and `group_docs` its document count
    * — the dup-cluster size downstream consumers weight or cap by, and
    * the column that makes incremental ingest visible on UNMOVED base
    * docs (their group grew, so their row updates through the merge
    * feed); the split is the standard salted-hash 90/5/5 draw on the
    * group. The group window is computed over `m.docs`' own rows, which
    * is exact for every caller: components never straddle the doc set
    * (full corpus, base corpus, or the touched-component set — a touched
    * component's docs are all touched). */
  private def manifestFrom(m: MmInputs, docGroups: DataFrame): DataFrame = {
    val textDrop = m.textCl.filter(col("is_canonical") === 0)
      .select(col("doc_id")).withColumn("f_text", lit(true))
    def perceptualDrop(member: DataFrame, idCol: String, attCol: String,
                       cl: DataFrame, flag: String): DataFrame =
      m.att.join(member, m.att(attCol) === member(idCol))
        .join(cl.select(col("canon"), col("cluster_id").as("_cl")),
          Seq("canon"), "left")
        .filter(col(attCol) =!= col("canon") ||
          (col("_cl").isNotNull && col("_cl") =!= col("canon")))
        .select(col("doc_id")).withColumn(flag, lit(true))
    val imgDrop = perceptualDrop(m.imgMember, "img_id", "img", m.imgCl, "f_img")
    val audDrop = perceptualDrop(m.audMember, "audio_id", "aud", m.audCl, "f_aud")
    val vidDupDrop = m.att.join(m.vidDup, Seq("vid"))
      .select(col("doc_id")).withColumn("f_vdup", lit(true))
    val vidStaticDrop = m.att.join(m.vidStatic, Seq("vid"))
      .select(col("doc_id")).withColumn("f_vstatic", lit(true))

    m.docs.join(m.quality, "doc_id")
      .join(textDrop, Seq("doc_id"), "left")
      .join(imgDrop, Seq("doc_id"), "left")
      .join(audDrop, Seq("doc_id"), "left")
      .join(vidDupDrop, Seq("doc_id"), "left")
      .join(vidStaticDrop, Seq("doc_id"), "left")
      .join(docGroups, "doc_id")
      .withColumn("drop_reasons", concat_ws(",",
        when(col("f_text"), lit("text_dup")),
        when(col("quality_score") < 2, lit("low_quality")),
        when(col("f_img"), lit("image_dup")),
        when(col("f_aud"), lit("audio_dup")),
        when(col("f_vdup"), lit("video_dup")),
        when(col("f_vstatic"), lit("video_static"))))
      .withColumn("kept", (col("drop_reasons") === "").cast(StringType))
      .withColumn("bucket",
        MixQueries.saltedDraw(mmSplitSalt, col("group_id")) % 100L)
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "validation")
          .otherwise("test"))
      .withColumn("group_docs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("group_id"))))
      .select(col("doc_id"), col("kept"), col("drop_reasons"), col("split"),
        col("group_id"), col("group_docs"), col("quality_score"),
        col("n_tokens"))
  }

  /** Cross-modality doc groups for a prepared input set: the one live CC
    * the capstone pays, then doc nodes decoded back out. */
  private def docGroupsOf(m: MmInputs): DataFrame =
    GraphCC.connectedComponents(encodedEdges(m), "s", "t")
      .filter(col("node") % 8 === 0)
      .select(expr("node div 8").as("doc_id"),
        col("component").as("group_id"))

  /** q_curation_mm_e2e: the one-shot manifest over the full corpus. */
  def curationMmE2e(s: SparkSession, dir: String): DataFrame = {
    val m = modalFull(s, dir)
    manifestFrom(m, docGroupsOf(m))
  }

  // -------------------------------------------------------------------
  // Incremental curation: merge a NEW batch into persisted state
  // -------------------------------------------------------------------

  /** The base/new cut: the last fifth of the doc id space plays the
    * incoming batch, everything below it the already-curated corpus.
    * Pure closed form of the corpus size, so the DuckDB oracle replays
    * the same cut. */
  private def baseCut(s: SparkSession, dir: String): Long =
    table(s, dir, "documents")
      .agg(expr("4 * (max(doc_id) + 1) div 5")).head().getLong(0)
  private val baseCutSql = "(SELECT 4 * (MAX(all_docs.doc_id) + 1) // 5 " +
    "FROM documents all_docs)"

  /** Base-corpus inputs: every per-modality artifact restricted to the
    * ids the base corpus owns (docs < B ⇒ images < 2B, audios < 4B,
    * videos < 2B). Pair tables filter EXACTLY to the base run's pairs
    * because a near-dup pair depends only on its two endpoints and
    * group canons only shrink as ids grow (new ids are larger, so a
    * base group's canon is already the global minimum); the per-modality
    * and cross-modality closures are then recomputed over the filtered
    * inputs — paid once, at fixture build. */
  /** Base-restricted hash table + its exact-hash groups — ONE definition
    * of the (filter, groupBy, canon) rule shared by [[modalBase]] and the
    * persisted group dumps in [[baseStateRoot]], so the base-cut or canon
    * rule can never silently diverge between them. */
  private def baseHashGroups(s: SparkSession, path: String, idCol: String,
                             maxId: Long): (DataFrame, DataFrame) = {
    val hash = s.read.parquet(path).filter(col(idCol) < maxId)
    (hash, hash.groupBy("phash")
      .agg(count(lit(1)).as("n_copies"), min(idCol).as("canon")))
  }

  private def modalBase(s: SparkSession, dir: String, b: Long): MmInputs = {
    val (imgHash, imgGroups) = baseHashGroups(s,
      MultimodalQueries.phashHashTablePath(s, dir), "img_id", 2 * b)
    val imgPairs = s.read.parquet(MultimodalQueries.phashPairTablePath(s, dir))
      .filter(col("canon_a") < 2 * b && col("canon_b") < 2 * b)
    val (audHash, audGroups) = baseHashGroups(s,
      MultimodalQueries.audioFpHashTablePath(s, dir), "audio_id", 4 * b)
    val audPairs = s.read.parquet(MultimodalQueries.audioFpPairTablePath(s, dir))
      .filter(col("canon_a") < 4 * b && col("canon_b") < 4 * b)
    val vidPairs = s.read.parquet(
        MultimodalQueries.videoClipPairTablePath(s, dir))
      .filter(col("video_a") < 2 * b && col("video_b") < 2 * b)
      .select(col("video_a"), col("video_b"))
    val textPairs = s.read.parquet(GraphCC.pairTablePath(s, dir))
      .filter(col("doc_b") < b) // doc_a < doc_b, so both endpoints base
    val textCc = GraphCC.connectedComponents(textPairs, "doc_a", "doc_b")
    def ccLabels(pairs: DataFrame): DataFrame =
      GraphCC.connectedComponents(pairs, "canon_a", "canon_b")
        .select(col("node").as("canon"), col("component").as("cluster_id"))
    MmInputs(
      att = attachments(s, dir).filter(col("doc_id") < b),
      docs = table(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < b),
      textCl = textCc.select(col("node").as("doc_id"),
        col("component").as("cluster_id"),
        when(col("node") === col("component"), 1).otherwise(0)
          .as("is_canonical")),
      quality = TextQueries.txtQuality(s, dir)
        .select(col("doc_id"), col("quality_score"), col("n_tokens"))
        .filter(col("doc_id") < b),
      imgMember = imgHash.join(imgGroups.select("phash", "canon"), "phash")
        .select(col("img_id"), col("canon")),
      imgPairs = imgPairs,
      imgCl = ccLabels(imgPairs),
      audMember = audHash.join(audGroups.select("phash", "canon"), "phash")
        .select(col("audio_id"), col("canon")),
      audPairs = audPairs,
      audCl = ccLabels(audPairs),
      vidPairs = vidPairs,
      vidDup = vidPairs.select(col("video_b").as("vid")).distinct(),
      vidStatic = s.read.parquet(
          MultimodalQueries.videoClipFrameTablePath(s, dir))
        .filter(col("video_id") < 2 * b)
        .groupBy("video_id")
        .agg(countDistinct(col("phash")).as("nd"))
        .filter(col("nd") === 1)
        .select(col("video_id").as("vid")))
  }

  /** Persisted BASE curation state — what a production deployment would
    * hold between ingests: the published manifest, the encoded-node
    * component labels, the per-modality cluster labels and group tables,
    * and the video drop set. Built once per sf dir (the "bootstrap"
    * run); every incremental invocation consumes it read-only. */
  private[graft] def baseStateRoot(s: SparkSession, dir: String): String =
    ScratchDirs.memoized("mmcur_base_fix", dir) { r =>
      val b = baseCut(s, dir)
      val m = modalBase(s, dir, b)
      val labels = GraphCC.connectedComponents(encodedEdges(m), "s", "t")
        .localCheckpoint() // docGroups + the labels dump share one CC run
      labels.write.parquet(s"$r/labels")
      val docGroups = labels.filter(col("node") % 8 === 0)
        .select(expr("node div 8").as("doc_id"),
          col("component").as("group_id"))
      manifestFrom(m, docGroups).write.parquet(s"$r/manifest")
      m.textCl.select("doc_id", "cluster_id").write.parquet(s"$r/textcl")
      m.imgCl.write.parquet(s"$r/imgcl")
      m.audCl.write.parquet(s"$r/audcl")
      baseHashGroups(s, MultimodalQueries.phashHashTablePath(s, dir),
        "img_id", 2 * b)._2.write.parquet(s"$r/imggrp")
      baseHashGroups(s, MultimodalQueries.audioFpHashTablePath(s, dir),
        "audio_id", 4 * b)._2.write.parquet(s"$r/audgrp")
      m.vidDup.write.parquet(s"$r/viddup")
      m.vidStatic.write.parquet(s"$r/vidstatic")
    }

  /** Incremental connected components by SUPERNODE CONTRACTION: the base
    * run's labels are a complete connectivity summary, so each delta-edge
    * endpoint is first REPLACED by its base component id (a left join;
    * genuinely new nodes pass through), the star-alternation CC runs on
    * the contracted graph — DELTA-sized: only components the new batch
    * actually touches participate, so rounds AND per-round volume are
    * independent of corpus size — and one left join expands the result
    * back over all base nodes (untouched components keep their base
    * label via the coalesce). Returns (node, component) for every base
    * node plus every new node incident to a delta edge, exactly equal to
    * a full CC over base∪delta edges: contraction preserves connectivity
    * by construction, and minima agree because each contracted node id
    * is itself the minimum of what it replaced. */
  private def incrementalCc(baseLabels: DataFrame,
                            delta: DataFrame): DataFrame = {
    val bl = baseLabels.select(col("node"), col("component"))
    val contracted = delta.toDF("a", "b")
      .join(bl.select(col("node").as("a"), col("component").as("ca")),
        Seq("a"), "left")
      .join(bl.select(col("node").as("b"), col("component").as("cb")),
        Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("s"),
        coalesce(col("cb"), col("b")).as("t"))
    val small = GraphCC.connectedComponents(contracted, "s", "t")
    val baseFinal = bl
      .join(small.select(col("node").as("component"),
        col("component").as("_final")), Seq("component"), "left")
      .select(col("node"), coalesce(col("_final"), col("component"))
        .as("component"))
    val newFinal = small
      .join(bl.select(col("node")), Seq("node"), "left_anti")
    baseFinal.unionByName(newFinal)
  }

  /** Banded delta pairs over a combined (phash, n_copies, canon) group
    * frame: every near pair (Hamming ≤ `maxHamming`) with at least one
    * NEW-group endpoint (`isNew` over `canon`). The corpus side carries
    * the windowed skew cap ([[SkewCap.dropOverCap]], observable); the
    * probe side is the new groups only, so cost is O(delta × colliding
    * band buckets), never corpus². Emitted un-normalized (both
    * orientations may appear for new-new pairs) — the CC consumer
    * symmetrizes anyway. */
  private def deltaHashPairs(groups: DataFrame, isNew: Column,
                             maxHamming: Int, capMetric: String): DataFrame = {
    val banded = MultimodalQueries.bandedHash(
      groups.select(col("phash"), col("canon")), maxHamming)
    val corp = SkewCap.dropOverCap(banded,
      Seq(col("band"), col("chunk")), 100000, capMetric)
    // No broadcast hint: the probe side is delta-SIZED, not delta-SMALL
    // (an ingest batch can be any fraction of the corpus), so the join
    // strategy is left to the planner — AQE broadcasts a small probe at
    // runtime and falls back to shuffle join beyond the broadcast limit.
    val probe = banded.filter(isNew)
    corp.alias("a")
      .join(probe.alias("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.phash") =!= col("b.phash"))
      .select(col("a.phash").as("ph_a"), col("b.phash").as("ph_b"),
        col("a.canon").as("canon_a"), col("b.canon").as("canon_b"))
      .distinct()
      .filter(bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= maxHamming)
      .select(col("canon_a"), col("canon_b"))
  }

  /** Stage-timing probe (diagnostic only, env-gated): wraps the eager
    * points of the incremental run so a bench investigation can see
    * where per-invocation time goes without a profiler. */
  private implicit class StagedFrame(df: DataFrame) {
    def localCheckpointStaged(name: String): DataFrame =
      staged(name)(df.localCheckpoint())
  }

  private def staged[T](name: String)(f: => T): T =
    if (!sys.env.contains("SPARK_GRAFT_STAGE_TIMING")) f
    else {
      val t0 = System.nanoTime(); val r = f
      System.err.println(
        f"[stage] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
          s"(cc_rounds=${GraphCC.lastRunRounds})")
      r
    }

  /** The incremental ingest at `root`: bootstrap the table from the
    * persisted base manifest, then MERGE the recomputed rows of every
    * TOUCHED component (plus all new docs) — see [[curationMmIncremental]]
    * for the semantics. Returns the table root (v2 = post-merge, with
    * the v2 change feed recorded). */
  private def incrementalRunAt(s: SparkSession, dir: String,
                               root: String): String = {
    val b = staged("basecut")(baseCut(s, dir))
    val base = baseStateRoot(s, dir)
    val baseManifest = s.read.parquet(s"$base/manifest")
    val baseLabels = s.read.parquet(s"$base/labels")

    val att = attachments(s, dir)
    val newAtt = att.filter(col("doc_id") >= b)

    // --- text: probe the persisted shingle index with the new batch's
    // prefixes only (materialized below, in ONE barrier with the
    // image/audio probes) ---
    val deltaTextPairsLazy = TextQueries
      .incrementalPairsAgainstAll(s, dir, col("doc_id") >= b,
        shingleIndex =
          Some(s.read.parquet(TextQueries.shingleTablePath(s, dir))))

    // --- image/audio: group-table MERGE (base groups ∪ new hashes),
    // then banded delta probe, then label CC over base labels + delta ---
    // (only phash → canon is consumed downstream — the delta probe and
    // the memberships; copy counts stay in the persisted group tables)
    def combined(baseGrp: DataFrame, newHash: DataFrame, idCol: String)
        : DataFrame =
      baseGrp.select(col("phash"), col("canon"))
        .unionByName(newHash.select(col("phash"), col(idCol).as("canon")))
        .groupBy("phash")
        .agg(min(col("canon")).as("canon"))
    val newImgHash = s.read.parquet(
        MultimodalQueries.phashHashTablePath(s, dir))
      .filter(col("img_id") >= 2 * b)
    val imgGroups = combined(s.read.parquet(s"$base/imggrp"), newImgHash,
      "img_id")
    val deltaImgPairsLazy = deltaHashPairs(imgGroups, col("canon") >= 2 * b,
      3, "img_inc_cap")
    val newAudHash = s.read.parquet(
        MultimodalQueries.audioFpHashTablePath(s, dir))
      .filter(col("audio_id") >= 4 * b)
    val audGroups = combined(s.read.parquet(s"$base/audgrp"), newAudHash,
      "audio_id")
    val deltaAudPairsLazy = deltaHashPairs(audGroups, col("canon") >= 4 * b,
      3, "aud_inc_cap")

    // --- ONE materialization barrier for all three probes: the probe
    // pipelines run as parallel stages of a single job (instead of three
    // driver-synchronized checkpoints), and every downstream consumer
    // (both closures, the encoded edges, the touched set) reads the
    // cached blocks ---
    val deltaPairs = staged("delta_probe")(
      deltaTextPairsLazy.toDF("a", "b").withColumn("m", lit(0))
        .unionByName(deltaImgPairsLazy.toDF("a", "b").withColumn("m", lit(1)))
        .unionByName(deltaAudPairsLazy.toDF("a", "b").withColumn("m", lit(2)))
        .localCheckpoint())
    val deltaTextPairs = deltaPairs.filter(col("m") === 0)
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
    val deltaImgPairs = deltaPairs.filter(col("m") === 1)
      .select(col("a").as("canon_a"), col("b").as("canon_b"))
    val deltaAudPairs = deltaPairs.filter(col("m") === 2)
      .select(col("a").as("canon_a"), col("b").as("canon_b"))

    // --- ONE local-closure update for all three per-modality label
    // sets: text docs, image canons, and audio canons live in disjoint
    // mod-3 strides of a shared id space (the cross-modality encoding
    // trick), and the update itself is the CONTRACTED incremental CC —
    // base labels collapse to supernodes, so the closure graph is
    // delta-sized regardless of corpus size. Strides never connect, so
    // component minima decode exactly per stride. ---
    def enc(df: DataFrame, aCol: String, bCol: String, k: Int): DataFrame =
      df.select((col(aCol) * 3 + k).as("ea"), (col(bCol) * 3 + k).as("eb"))
    // checkpointed: three decoded consumers sit inside the merge's one
    // materialized plan — without it the expansion joins run three times
    val localCl = staged("local_cc")(incrementalCc(
      enc(s.read.parquet(s"$base/textcl"), "doc_id", "cluster_id", 0)
        .unionByName(enc(s.read.parquet(s"$base/imgcl"), "canon", "cluster_id", 1))
        .unionByName(enc(s.read.parquet(s"$base/audcl"), "canon", "cluster_id", 2))
        .toDF("node", "component"),
      enc(deltaTextPairs, "doc_a", "doc_b", 0)
        .unionByName(enc(deltaImgPairs, "canon_a", "canon_b", 1))
        .unionByName(enc(deltaAudPairs, "canon_a", "canon_b", 2)))
      .localCheckpoint())
    def dec(k: Int, idName: String): DataFrame =
      localCl.filter(col("node") % 3 === k)
        .select(expr(s"(node - $k) div 3").as(idName),
          expr(s"(component - $k) div 3").as("cluster_id"))
    val textCl = dec(0, "doc_id")
      .withColumn("is_canonical",
        when(col("doc_id") === col("cluster_id"), 1).otherwise(0))
    val imgCl = dec(1, "canon")
    val audCl = dec(2, "canon")

    // --- video: the persisted clip-pair table IS the probe index — the
    // new-incident slice is a pure id filter (pairs are normalized
    // video_a < video_b and new ids are larger, so a new endpoint is
    // always video_b). In production the same slice falls out of probing
    // the persisted shingle table with the new clips' shingles. ---
    val deltaVidPairs = s.read.parquet(
        MultimodalQueries.videoClipPairTablePath(s, dir))
      .filter(col("video_b") >= 2 * b)
      .select(col("video_a"), col("video_b"))
    val vidDup = s.read.parquet(s"$base/viddup")
      .unionByName(deltaVidPairs.select(col("video_b").as("vid")))
      .distinct()
    // static flags are per-video and immutable: persisted base set ∪ the
    // new batch's videos only — a delta-sized aggregation
    val vidStatic = s.read.parquet(s"$base/vidstatic")
      .unionByName(s.read.parquet(
          MultimodalQueries.videoClipFrameTablePath(s, dir))
        .filter(col("video_id") >= 2 * b)
        .groupBy("video_id").agg(countDistinct(col("phash")).as("nd"))
        .filter(col("nd") === 1).select(col("video_id").as("vid")))

    // --- combined memberships for NEW attachments (may resolve to BASE
    // canons: a re-uploaded base artifact joins its existing group) ---
    def memberOf(hashTable: DataFrame, groups: DataFrame,
                 idCol: String): DataFrame =
      hashTable.join(groups.select("phash", "canon"), "phash")
        .select(col(idCol), col("canon"))
    val imgHashAll = s.read.parquet(
      MultimodalQueries.phashHashTablePath(s, dir))
    val audHashAll = s.read.parquet(
      MultimodalQueries.audioFpHashTablePath(s, dir))
    val imgMember = memberOf(imgHashAll, imgGroups, "img_id")
    val audMember = memberOf(audHashAll, audGroups, "audio_id")

    // --- the incremental cross-modality closure: contracted CC over
    // the delta edges (base components as supernodes), expanded back
    // over the base labels — O(log delta-diameter) rounds over a
    // delta-sized graph ---
    val doc8 = (col("doc_id") * 8).as("s")
    val deltaEdges = deltaTextPairs
      .select((col("doc_a") * 8).as("s"), (col("doc_b") * 8).as("t"))
      .unionByName(newAtt.join(imgMember, newAtt("img") === imgMember("img_id"))
        .select(doc8, (col("canon") * 8 + 2).as("t")))
      .unionByName(deltaImgPairs.select((col("canon_a") * 8 + 2).as("s"),
        (col("canon_b") * 8 + 2).as("t")))
      .unionByName(newAtt.join(audMember, newAtt("aud") === audMember("audio_id"))
        .select(doc8, (col("canon") * 8 + 3).as("t")))
      .unionByName(deltaAudPairs.select((col("canon_a") * 8 + 3).as("s"),
        (col("canon_b") * 8 + 3).as("t")))
      .unionByName(newAtt.select(doc8, (col("vid") * 8 + 4).as("t")))
      .unionByName(deltaVidPairs.select((col("video_a") * 8 + 4).as("s"),
        (col("video_b") * 8 + 4).as("t")))
      .localCheckpointStaged("delta_edges")
    // checkpointed: the expanded labels feed docGroups AND the
    // touched-component join, both inside the merge's materialized plan
    val labels = staged("encoded_cc")(
      incrementalCc(baseLabels, deltaEdges).localCheckpoint())
    val docGroups = labels.filter(col("node") % 8 === 0)
      .select(expr("node div 8").as("doc_id"), col("component").as("group_id"))

    // --- touched components: everything a delta edge reaches. Docs in
    // UNtouched components keep their base manifest row verbatim (their
    // component's node set, edges, minimum, and every drop flag are
    // provably unchanged), so only touched rows are recomputed and only
    // CHANGED rows enter the merge feed. ---
    val touched = deltaEdges.select(col("s").as("node"))
      .unionByName(deltaEdges.select(col("t").as("node"))).distinct()
      .join(labels, "node")
      .select(col("component")).distinct()
    val touchedDocs = staged("touched")(docGroups
      .join(touched, docGroups("group_id") === touched("component"))
      .select(col("doc_id"), col("group_id"))
      .localCheckpoint()) // small; read by att, docs, and the group join

    val mInc = MmInputs(
      att = att.join(touchedDocs.select("doc_id"), "doc_id"),
      docs = touchedDocs.select("doc_id"),
      textCl = textCl,
      quality = TextQueries.txtQuality(s, dir)
        .select(col("doc_id"), col("quality_score"), col("n_tokens")),
      imgMember = imgMember, imgPairs = deltaImgPairs, imgCl = imgCl,
      audMember = audMember, audPairs = deltaAudPairs, audCl = audCl,
      vidPairs = deltaVidPairs, vidDup = vidDup, vidStatic = vidStatic)
    val recomputed = manifestFrom(mInc, touchedDocs)

    // --- publish through the table layer: bootstrap v1 = the base
    // manifest (a straight publish — no keys to resolve against the
    // empty v0), v2 = the incremental MERGE (update only when the row
    // actually changed; insert the new batch) with its change feed ---
    staged("bootstrap") {
      ManagedTable.createEmpty(s, root, baseManifest)
      ManagedTable.overwrite(root, baseManifest)
    }
    val changedCols = Seq("kept", "drop_reasons", "split", "group_id",
      "group_docs", "quality_score", "n_tokens")
    staged("merge") {
      ManagedTable.merge(s, root, recomputed, Seq("doc_id"),
        MergeClauses.Spec(updateWhen = Some(changedCols
          .map(c => !(col(s"t.$c") <=> col(s"s.$c"))).reduce(_ || _))),
        changeFeed = true)
    }
    root
  }

  /** q_curation_mm_incremental: the PRODUCTION curation loop — the last
    * fifth of the corpus arrives as a new batch and is merged into the
    * persisted base state: text near-dups probed new-vs-corpus off the
    * shingle prefixes, image/audio group tables merge-updated and probed
    * via the banded delta join, video reuse sliced off the persisted
    * pair index, all closures re-converged INCREMENTALLY (base labels as
    * star edges + delta edges — never a full-corpus pair join), and the
    * manifest published by MERGE: update-when-changed for touched base
    * docs, insert for the batch. The oracle is the FULL-RECOMPUTE
    * manifest over the combined corpus — hash equality proves the
    * incremental path converges to exactly the one-shot capstone, and
    * untouched groups keep their base rows verbatim (split stability;
    * CurationMmIncSpec pins the no-migration property). */
  def curationMmIncremental(s: SparkSession, dir: String): DataFrame =
    ManagedTable.read(s,
      incrementalRunAt(s, dir, ScratchDirs.fresh("mmcur_inc_live")))

  /** The incremental run's published table, memoized per sf dir — the
    * read-only fixture the CDF gate (and the spec) consume;
    * q_curation_mm_incremental stays the live leg that re-runs the whole
    * ingest per invocation. */
  private[graft] def incRunShared(s: SparkSession, dir: String): String =
    ScratchDirs.memoized("mmcur_inc_fix", dir)(incrementalRunAt(s, dir, _))

  /** q_curation_mm_cdf: the per-round keep/drop DELTA — the change feed
    * the incremental MERGE recorded at v2, i.e. exactly the rows a
    * downstream training-data consumer must act on (new docs admitted,
    * base docs whose keep/split/group changed), without diffing two
    * manifest snapshots. Oracle: combined-manifest rows minus the
    * base-manifest state (insert = not in base, update = differing
    * row). */
  def curationCdf(s: SparkSession, dir: String): DataFrame =
    ManagedTable.changes(s, incRunShared(s, dir), 2)
      .withColumnRenamed(Merge.ActionCol, "action")

  /** PERSISTED manifest: the capstone's output written once per sf dir —
    * the manifest IS the published curation artifact (that is the point
    * of publishing it), and downstream loader-side consumers pay a
    * FileScan. q_curation_mm_e2e stays the LIVE leg driving the full
    * composition per invocation. */
  private[graft] def manifestTablePath(s: SparkSession, dir: String): String =
    ScratchDirs.persistedParquet("mm_manifest_fix", dir)(
      curationMmE2e(s, dir))

  /** q_curation_pack_e2e: the LOADER-READY end of the pipeline — the
    * published manifest's kept TRAIN-split documents packed into
    * fixed-`budget`-token training sequences (the concatenate-and-chunk
    * layout, [[PackQueries.packSequences]]'s distributed two-pass prefix
    * sum over the FILTERED doc_id-ordered token stream). This is the
    * composition a training job actually consumes: curation decided WHAT
    * survives and WHERE it may appear (kept, split); packing decides the
    * physical sequence layout — and running it off the persisted
    * manifest proves the artifact is sufficient for the loader (no
    * side-channel back into the curation pipeline). Scale shape: one
    * manifest FileScan + the parallel prefix sum (range sort + partial
    * sums + broadcast bases — no single-partition window at any corpus
    * size). */
  /** q_curation_mm_report: the CORPUS CARD of the published manifest —
    * the one-page summary a data team ships with each curation round
    * (and the artifact reviewers diff between rounds): per split, the
    * document/kept counts, the kept token budget, the leakage-group
    * count with the largest group, and the per-screen drop counts
    * (reason OCCURRENCES — a multi-reason doc counts once per screen it
    * failed, the multi-reason attribution made aggregable). One manifest
    * FileScan + one groupBy; group stats ride the same exchange via
    * distinct-on-group aggregation. */
  def curationMmReport(s: SparkSession, dir: String): DataFrame = {
    val m = s.read.parquet(manifestTablePath(s, dir))
      .withColumn("reasons", split(col("drop_reasons"), ","))
    def reason(r: String) =
      sum(when(array_contains(col("reasons"), r), 1L).otherwise(0L))
        .as(s"n_$r")
    m.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept") === "true", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept") === "true", col("n_tokens").cast("long"))
          .otherwise(0L)).as("kept_tokens"),
        countDistinct(col("group_id")).as("n_groups"),
        max(col("group_docs")).as("max_group_docs"),
        reason("text_dup"), reason("low_quality"), reason("image_dup"),
        reason("audio_dup"), reason("video_dup"), reason("video_static"))
  }

  def curationPackE2e(s: SparkSession, dir: String,
                      budget: Long = 2048L): DataFrame = {
    val kept = s.read.parquet(manifestTablePath(s, dir))
      .filter(col("kept") === "true" && col("split") === "train")
      .select(col("doc_id"),
        col("n_tokens").cast(org.apache.spark.sql.types.LongType)
          .as("n_tokens"))
    PackQueries.withExclusivePrefixSum(s, kept,
        Seq(col("doc_id").asc), "n_tokens")
      .select(col("doc_id"), col("n_tokens"),
        expr(s"cum_before div $budget").as("bin_id"),
        (col("cum_before") % budget).as("bin_offset"))
  }

  /** q_mm_bench_contamination: the CROSS-MODAL contamination screen —
    * the leakage the text n-gram screen (q_txt_contamination) cannot
    * see: a benchmark IMAGE or AUDIO clip re-used inside the training
    * corpus. Artifacts with id ≡ 3 (mod 7) stand in for a published
    * benchmark's media (the doc_id % 20 == 7 precedent on the
    * attachment axis); every KEPT TRAIN-split document (per the
    * persisted manifest — the split the model actually trains on) whose
    * attachment is perceptually within Hamming ≤ 3 of a benchmark
    * artifact is reported per modality with its benchmark-hit count and
    * closest distance. Exact re-use is hamming 0; the banded join also
    * catches re-encodes.
    *
    * Scale shape: manifest + hash tables are persisted FileScans; the
    * benchmark side is small by definition and BROADCASTS banded, so
    * the screen is one scan of the train-side hashes — the daily-eval
    * hygiene cost a 100 TB corpus can afford. */
  def mmBenchContamination(s: SparkSession, dir: String,
                           maxHamming: Int = 3): DataFrame = {
    val train = s.read.parquet(manifestTablePath(s, dir))
      .filter(col("kept") === "true" && col("split") === "train")
      .select(col("doc_id"))
    val att = attachments(s, dir).join(train, "doc_id")
    def banded(df: DataFrame) = MultimodalQueries.bandedHash(df, maxHamming)
    def leg(hashPath: String, idCol: String, attCol: String,
            modality: String): DataFrame = {
      val hash = s.read.parquet(hashPath)
      val docH = att.select(col("doc_id"), col(attCol).as("aid"))
        .join(hash.withColumnRenamed(idCol, "aid"), "aid")
        .select(col("doc_id"), col("phash"))
      val bench = hash.filter(col(idCol) % 7 === 3)
        .select(col(idCol).as("bench_id"), col("phash"))
      // no broadcast hint: a REAL benchmark set is fixed-size and would
      // broadcast on its own; this stand-in scales with the corpus, so
      // the strategy stays with the planner (AQE broadcasts when small)
      banded(docH).alias("a")
        .join(banded(bench).alias("b"),
          col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk"))
        .withColumn("hamming",
          bit_count(col("a.phash").bitwiseXOR(col("b.phash")))
            .cast(org.apache.spark.sql.types.IntegerType))
        .filter(col("hamming") <= maxHamming)
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("bench_id")).as("n_bench_hits"),
          min(col("hamming")).as("min_hamming"))
        .withColumn("modality", lit(modality))
    }
    leg(MultimodalQueries.phashHashTablePath(s, dir), "img_id", "img", "image")
      .unionByName(
        leg(MultimodalQueries.audioFpHashTablePath(s, dir), "audio_id", "aud",
          "audio"))
      .select(col("doc_id"), col("modality"), col("n_bench_hits"),
        col("min_hamming"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation_mm_e2e" -> (curationMmE2e _),
    "q_curation_mm_incremental" -> (curationMmIncremental _),
    "q_curation_mm_cdf" -> (curationCdf _),
    "q_mm_bench_contamination" ->
      ((s: SparkSession, d: String) => mmBenchContamination(s, d)),
    "q_curation_mm_report" -> (curationMmReport _),
    "q_curation_pack_e2e" ->
      ((s: SparkSession, d: String) => curationPackE2e(s, d)))

  /** Composition oracle: every stage is its own gate's closed form —
    * the per-modality CTE prefixes replayed in isolated subquery scopes
    * (no CTE-name collisions), per-modality transitive closures as
    * recursive CTEs, then the cross-modality closure over the same
    * encoded-node graph the Spark leg builds. An edit to any modality's
    * bar is an edit to this oracle too.
    *
    * `docsFilter` restricts the document universe: the manifest is a
    * pure function of the documents relation (every fixture CTE derives
    * from it), so the BASE-corpus replay — needed by the CDF delta
    * oracle — is the same text with every `FROM documents` retargeted at
    * a filtered `docs_u` CTE (a bare-name substitution, so aliases like
    * `FROM documents d` survive; the CTE definition is prepended AFTER
    * the substitution so its own `FROM documents` stays literal). */
  private def manifestOracleOver(docsFilter: Option[String]): String = {
      val tq = TextQueries.oracles("q_txt_quality")
      val tcc = GraphCC.oracles("q_dedup_cc")
      val im = MultimodalQueries.phashPairCtes
      val au = MultimodalQueries.audioFpCtes
      val vc = MultimodalQueries.videoClipCtes
      val full =
      s"""WITH RECURSIVE
         |att AS MATERIALIZED (SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 1 THEN (doc_id - 1) * 2 + 1
         |         ELSE doc_id * 2 END AS img,
         |    CASE WHEN doc_id % 5 = 1 THEN (doc_id - 1) * 4 + 3
         |         ELSE doc_id * 4 END AS aud,
         |    CASE WHEN doc_id % 4 IN (1, 3) THEN (doc_id - 1) * 2 + 1
         |         ELSE doc_id * 2 END AS vid
         |  FROM documents),
         |tq AS MATERIALIZED (SELECT doc_id, quality_score, n_tokens FROM ($tq) tqx),
         |tcc AS MATERIALIZED (SELECT doc_id, cluster_id, is_canonical FROM ($tcc) tcx),
         |imm AS MATERIALIZED (SELECT img_id, canon FROM (WITH $im
         |  SELECT ph.img_id, grp.canon FROM ph
         |  JOIN grp ON ph.phash = grp.phash) imq),
         |imp AS MATERIALIZED (SELECT canon_a, canon_b FROM (WITH $im
         |  SELECT canon_a, canon_b FROM near) ipq),
         |ie AS MATERIALIZED (SELECT canon_a AS s, canon_b AS d FROM imp
         |  UNION SELECT canon_b, canon_a FROM imp),
         |ireach(node, r) AS (SELECT s, s FROM ie
         |  UNION SELECT e.s, r.r FROM ie e JOIN ireach r ON e.d = r.node),
         |icc AS MATERIALIZED (SELECT node, MIN(r) AS cl FROM ireach GROUP BY node),
         |amm AS MATERIALIZED (SELECT audio_id, canon FROM (WITH $au
         |  SELECT fp.audio_id, grp.canon FROM fp
         |  JOIN grp ON fp.fh = grp.fh) amq),
         |aup AS MATERIALIZED (SELECT canon_a, canon_b FROM (WITH $au
         |  SELECT canon_a, canon_b FROM near) apq),
         |ae AS MATERIALIZED (SELECT canon_a AS s, canon_b AS d FROM aup
         |  UNION SELECT canon_b, canon_a FROM aup),
         |areach(node, r) AS (SELECT s, s FROM ae
         |  UNION SELECT e.s, r.r FROM ae e JOIN areach r ON e.d = r.node),
         |acc AS MATERIALIZED (SELECT node, MIN(r) AS cl FROM areach GROUP BY node),
         |vpr AS MATERIALIZED (SELECT video_a, video_b FROM (WITH $vc
         |  SELECT video_a, video_b FROM pr) vpq),
         |vst AS MATERIALIZED (SELECT vid FROM (WITH $vc
         |  SELECT vid, COUNT(DISTINCT phash) AS nd FROM sq GROUP BY vid) vsq
         |  WHERE nd = 1),
         |td AS MATERIALIZED (SELECT doc_id FROM tcc WHERE is_canonical = 0),
         |idp AS MATERIALIZED (SELECT att.doc_id FROM att JOIN imm ON att.img = imm.img_id
         |  LEFT JOIN icc ON icc.node = imm.canon
         |  WHERE att.img <> imm.canon
         |    OR (icc.node IS NOT NULL AND icc.cl <> imm.canon)),
         |adp AS MATERIALIZED (SELECT att.doc_id FROM att JOIN amm ON att.aud = amm.audio_id
         |  LEFT JOIN acc ON acc.node = amm.canon
         |  WHERE att.aud <> amm.canon
         |    OR (acc.node IS NOT NULL AND acc.cl <> amm.canon)),
         |vdp AS MATERIALIZED (SELECT doc_id FROM att
         |  WHERE vid IN (SELECT DISTINCT video_b FROM vpr)),
         |vsp AS MATERIALIZED (SELECT att.doc_id FROM att JOIN vst ON att.vid = vst.vid),
         |e0 AS MATERIALIZED (
         |  SELECT doc_id * 8 AS s, cluster_id * 8 + 1 AS t FROM tcc
         |  UNION ALL SELECT att.doc_id * 8, imm.canon * 8 + 2
         |    FROM att JOIN imm ON att.img = imm.img_id
         |  UNION ALL SELECT canon_a * 8 + 2, canon_b * 8 + 2 FROM imp
         |  UNION ALL SELECT att.doc_id * 8, amm.canon * 8 + 3
         |    FROM att JOIN amm ON att.aud = amm.audio_id
         |  UNION ALL SELECT canon_a * 8 + 3, canon_b * 8 + 3 FROM aup
         |  UNION ALL SELECT doc_id * 8, vid * 8 + 4 FROM att
         |  UNION ALL SELECT video_a * 8 + 4, video_b * 8 + 4 FROM vpr),
         |ge AS MATERIALIZED (SELECT s, t FROM e0 UNION SELECT t, s FROM e0),
         |greach(node, r) AS (SELECT s, s FROM ge
         |  UNION SELECT e.s, r.r FROM ge e JOIN greach r ON e.t = r.node),
         |gcc AS MATERIALIZED (SELECT node, MIN(r) AS comp FROM greach GROUP BY node),
         |gd AS MATERIALIZED (SELECT node // 8 AS doc_id, comp AS group_id,
         |  CAST(COUNT(*) OVER (PARTITION BY comp) AS BIGINT) AS group_docs
         |  FROM gcc WHERE node % 8 = 0),
         |rs AS MATERIALIZED (SELECT d.doc_id,
         |    concat_ws(',',
         |      CASE WHEN td.doc_id IS NOT NULL THEN 'text_dup' END,
         |      CASE WHEN tq.quality_score < 2 THEN 'low_quality' END,
         |      CASE WHEN idp.doc_id IS NOT NULL THEN 'image_dup' END,
         |      CASE WHEN adp.doc_id IS NOT NULL THEN 'audio_dup' END,
         |      CASE WHEN vdp.doc_id IS NOT NULL THEN 'video_dup' END,
         |      CASE WHEN vsp.doc_id IS NOT NULL THEN 'video_static' END)
         |      AS drop_reasons,
         |    tq.quality_score, tq.n_tokens
         |  FROM documents d
         |  JOIN tq ON tq.doc_id = d.doc_id
         |  LEFT JOIN td ON td.doc_id = d.doc_id
         |  LEFT JOIN idp ON idp.doc_id = d.doc_id
         |  LEFT JOIN adp ON adp.doc_id = d.doc_id
         |  LEFT JOIN vdp ON vdp.doc_id = d.doc_id
         |  LEFT JOIN vsp ON vsp.doc_id = d.doc_id)
         |SELECT rs.doc_id,
         |  CAST(rs.drop_reasons = '' AS STRING) AS kept,
         |  rs.drop_reasons,
         |  CASE WHEN b.bucket < 90 THEN 'train'
         |       WHEN b.bucket < 95 THEN 'validation'
         |       ELSE 'test' END AS split,
         |  gd.group_id, gd.group_docs, rs.quality_score, rs.n_tokens
         |FROM rs
         |JOIN gd ON gd.doc_id = rs.doc_id
         |JOIN (SELECT doc_id,
         |    ${MixQueries.saltedDrawSql(mmSplitSalt, "group_id")} % 100
         |      AS bucket
         |  FROM gd) b
         |  ON b.doc_id = rs.doc_id""".stripMargin
      docsFilter match {
        case None => full
        case Some(f) =>
          // Define docs_u once, in the OUTERMOST CTE list only (nested
          // recursive scopes — the text-cluster oracle — see it through
          // standard CTE scoping; a second definition would collide).
          val b = full.replace("FROM documents", "FROM docs_u")
          val marker = "WITH RECURSIVE\n"
          val at = b.indexOf(marker) + marker.length
          b.substring(0, at) +
            s"docs_u AS MATERIALIZED (SELECT * FROM documents WHERE $f),\n" +
            b.substring(at)
      }
  }

  /** The capstone manifest's oracle SQL — also nested by the pack
    * oracle (the loader must see exactly the published manifest), the
    * incremental oracle (incremental must equal full recompute), and
    * the CDF oracle (the delta is combined minus base). */
  private val manifestOracle: String = manifestOracleOver(None)
  private val baseManifestOracle: String =
    manifestOracleOver(Some(s"doc_id < $baseCutSql"))

  val oracles: Map[String, String] = Map(
    "q_curation_mm_e2e" -> manifestOracle,
    // Incremental ingest converges to the one-shot capstone on the
    // combined corpus — the oracle IS the full-recompute closed form.
    "q_curation_mm_incremental" -> manifestOracle,
    // The v2 change feed: combined-manifest rows not present (insert) or
    // different (update) in the base-manifest state. Post-images, like
    // the feed; no delete clause fires, so no delete rows.
    "q_curation_mm_cdf" ->
      s"""WITH cm AS MATERIALIZED ($manifestOracle),
         |bm AS MATERIALIZED ($baseManifestOracle)
         |SELECT cm.doc_id, cm.kept, cm.drop_reasons, cm.split,
         |  cm.group_id, cm.group_docs, cm.quality_score, cm.n_tokens,
         |  CASE WHEN bm.doc_id IS NULL THEN 'insert' ELSE 'update' END
         |    AS action
         |FROM cm LEFT JOIN bm ON bm.doc_id = cm.doc_id
         |WHERE bm.doc_id IS NULL
         |   OR NOT (cm.kept IS NOT DISTINCT FROM bm.kept
         |       AND cm.drop_reasons IS NOT DISTINCT FROM bm.drop_reasons
         |       AND cm.split IS NOT DISTINCT FROM bm.split
         |       AND cm.group_id IS NOT DISTINCT FROM bm.group_id
         |       AND cm.group_docs IS NOT DISTINCT FROM bm.group_docs
         |       AND cm.quality_score IS NOT DISTINCT FROM bm.quality_score
         |       AND cm.n_tokens IS NOT DISTINCT FROM bm.n_tokens)""".stripMargin,
    // The corpus card: one aggregation over the manifest closed form.
    "q_curation_mm_report" ->
      s"""WITH m AS MATERIALIZED ($manifestOracle),
         |r AS (SELECT split, kept, group_id, group_docs, n_tokens,
         |    string_split(drop_reasons, ',') AS reasons
         |  FROM m)
         |SELECT split,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN kept = 'true' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(SUM(CASE WHEN kept = 'true' THEN n_tokens ELSE 0 END)
         |    AS BIGINT) AS kept_tokens,
         |  CAST(COUNT(DISTINCT group_id) AS BIGINT) AS n_groups,
         |  CAST(MAX(group_docs) AS BIGINT) AS max_group_docs,
         |  CAST(SUM(CASE WHEN list_contains(reasons, 'text_dup')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_text_dup,
         |  CAST(SUM(CASE WHEN list_contains(reasons, 'low_quality')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
         |  CAST(SUM(CASE WHEN list_contains(reasons, 'image_dup')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_image_dup,
         |  CAST(SUM(CASE WHEN list_contains(reasons, 'audio_dup')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_audio_dup,
         |  CAST(SUM(CASE WHEN list_contains(reasons, 'video_dup')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_video_dup,
         |  CAST(SUM(CASE WHEN list_contains(reasons, 'video_static')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_video_static
         |FROM r GROUP BY split""".stripMargin,
    // Train-side attachment hashes (manifest split × closed-form hash
    // CTEs) banded against the ≡3 (mod 7) benchmark artifacts, exact
    // Hamming verify, per-(doc, modality) hit count + closest distance.
    "q_mm_bench_contamination" ->
      s"""WITH mf AS MATERIALIZED ($manifestOracle),
         |tr AS MATERIALIZED (SELECT doc_id FROM mf
         |  WHERE kept = 'true' AND split = 'train'),
         |ax AS MATERIALIZED (SELECT tr.doc_id,
         |    CASE WHEN tr.doc_id % 3 = 1 THEN (tr.doc_id - 1) * 2 + 1
         |         ELSE tr.doc_id * 2 END AS img,
         |    CASE WHEN tr.doc_id % 5 = 1 THEN (tr.doc_id - 1) * 4 + 3
         |         ELSE tr.doc_id * 4 END AS aud
         |  FROM tr),
         |iph AS MATERIALIZED (SELECT img_id, phash FROM (WITH
         |  ${MultimodalQueries.phashPairCtes}
         |  SELECT img_id, phash FROM ph) ipx),
         |afp AS MATERIALIZED (SELECT audio_id, fh AS phash FROM (WITH
         |  ${MultimodalQueries.audioFpCtes}
         |  SELECT audio_id, fh FROM fp) afx),
         |legs AS (
         |  SELECT ax.doc_id, 'image' AS modality, ib.img_id AS bench_id,
         |      bit_count(xor(ia.phash, ib.phash)) AS hamming
         |    FROM ax JOIN iph ia ON ax.img = ia.img_id
         |    JOIN iph ib ON ib.img_id % 7 = 3
         |      AND EXISTS (SELECT 1 FROM range(0, 4) b
         |        WHERE (ia.phash >> CAST(b.range * 14 AS BIGINT)) & 16383
         |            = (ib.phash >> CAST(b.range * 14 AS BIGINT)) & 16383)
         |    WHERE bit_count(xor(ia.phash, ib.phash)) <= 3
         |  UNION ALL
         |  SELECT ax.doc_id, 'audio', ab.audio_id,
         |      bit_count(xor(aa.phash, ab.phash))
         |    FROM ax JOIN afp aa ON ax.aud = aa.audio_id
         |    JOIN afp ab ON ab.audio_id % 7 = 3
         |      AND EXISTS (SELECT 1 FROM range(0, 4) b
         |        WHERE (aa.phash >> CAST(b.range * 14 AS BIGINT)) & 16383
         |            = (ab.phash >> CAST(b.range * 14 AS BIGINT)) & 16383)
         |    WHERE bit_count(xor(aa.phash, ab.phash)) <= 3)
         |SELECT doc_id, modality,
         |  CAST(COUNT(DISTINCT bench_id) AS BIGINT) AS n_bench_hits,
         |  CAST(MIN(hamming) AS INTEGER) AS min_hamming
         |FROM legs GROUP BY doc_id, modality""".stripMargin,
    // Loader-ready packing over the published manifest: kept train-split
    // docs, doc_id-ordered exclusive token prefix sum, 2048-token bins —
    // the q_pack_sequences closed form on the manifest oracle's output.
    "q_curation_pack_e2e" ->
      s"""WITH m AS MATERIALIZED (SELECT doc_id,
         |    CAST(n_tokens AS BIGINT) AS n_tokens
         |  FROM ($manifestOracle) mm
         |  WHERE kept = 'true' AND split = 'train'),
         |c AS (SELECT doc_id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum_before
         |  FROM m)
         |SELECT doc_id, n_tokens,
         |  cum_before // 2048 AS bin_id,
         |  cum_before % 2048 AS bin_offset
         |FROM c""".stripMargin)
}
