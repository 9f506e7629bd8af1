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
    val frames = graft.sources.TableIO.readStatic(s, 
      MultimodalQueries.videoClipFrameTablePath(s, dir))
    val vidPairs = graft.sources.TableIO.readStatic(s, 
        MultimodalQueries.videoClipPairTablePath(s, dir))
      .select(col("video_a"), col("video_b"))
    MmInputs(
      att = attachments(s, dir),
      docs = table(s, dir, "documents").select(col("doc_id")),
      textCl = graft.sources.TableIO.readStatic(s, GraphCC.clusterTablePath(s, dir))
        .select(col("doc_id"), col("cluster_id"), col("is_canonical")),
      quality = graft.sources.TableIO.readStatic(s, TextQueries.qualityTablePath(s, dir)),
      imgMember = graft.sources.TableIO.readStatic(s, 
          MultimodalQueries.phashHashTablePath(s, dir))
        .join(MultimodalQueries.phashGroups(s, dir).select("phash", "canon"),
          "phash")
        .select(col("img_id"), col("canon")),
      imgPairs = graft.sources.TableIO.readStatic(s, MultimodalQueries.phashPairTablePath(s, dir)),
      imgCl = graft.sources.TableIO.readStatic(s, MultimodalQueries.phashClusterTablePath(s, dir)),
      audMember = graft.sources.TableIO.readStatic(s, 
          MultimodalQueries.audioFpHashTablePath(s, dir))
        .join(MultimodalQueries.audioFpGroups(s, dir).select("phash", "canon"),
          "phash")
        .select(col("audio_id"), col("canon")),
      audPairs = graft.sources.TableIO.readStatic(s, 
        MultimodalQueries.audioFpPairTablePath(s, dir)),
      audCl = graft.sources.TableIO.readStatic(s, 
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

  /** max(doc_id) + 1 — the exclusive top of the contiguous doc id space;
    * every cut below is a pure closed form of it, so the DuckDB oracle
    * replays the same cuts. Memoized per dir (the corpus is a read-only
    * fixture): a live gate otherwise pays this driver-blocking scalar
    * aggregation twice per invocation. */
  private val topMemo = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def corpusTop(s: SparkSession, dir: String): Long =
    topMemo.getOrElseUpdate(dir,
      table(s, dir, "documents")
        .agg(max(col("doc_id")) + 1).head().getLong(0))

  /** The base/new cut: the last fifth of the doc id space plays the
    * incoming batch, everything below it the already-curated corpus. */
  private def baseCut(s: SparkSession, dir: String): Long =
    4L * corpusTop(s, dir) / 5L
  private val baseCutSql = "(SELECT 4 * (MAX(all_docs.doc_id) + 1) // 5 " +
    "FROM documents all_docs)"
  private val chainCutSql = "(SELECT 3 * (MAX(all_docs.doc_id) + 1) // 5 " +
    "FROM documents all_docs)"

  /** The chain's first cut (a 60/20/20 layout: base < 3N/5, batch 1 =
    * [3N/5, 4N/5), batch 2 = [4N/5, N) — so the chain's final state is
    * the FULL corpus and the one-shot manifest oracle applies). */
  private def chainCut(s: SparkSession, dir: String): Long =
    3L * corpusTop(s, dir) / 5L

  /** Base-corpus inputs: every per-modality artifact restricted to the
    * ids the base corpus owns (docs < B ⇒ images < 2B, audios < 4B,
    * videos < 2B).
    *
    * THE CUTS ARE EXACT, including at the batch boundary: the fixture id
    * scheme encodes the GENERATING document into the artifact id (doc d
    * generates images {2d} ∪ {2d+1 | d ≡ 0 mod 3}, audio {4d, +1 | d≡0
    * mod 3, +2 | d≡0 mod 4, +3 | d≡0 mod 5}, videos {2d} ∪ {2d+1 | d ≡
    * 0,2 mod 4}), so generating-doc(a) = a div 2 (images/videos) or
    * a div 4 (audio), and `a < 2B ⟺ a div 2 < B ⟺ generated by a base
    * doc` — no gap, no overlap. The boundary twins 2B−1 / 4B−1 LOOK like
    * new-batch artifacts because the first new doc B ATTACHES them (doc
    * B ≡ 1 mod 3/5, or odd, attaches its predecessor's twin), but they
    * are GENERATED by base doc B−1 — the attachment model's "every
    * referenced predecessor artifact exists" guarantee is exactly this
    * fact — and a standalone base-corpus run would therefore contain
    * them and their pairs. The DuckDB base replay agrees: its artifact
    * CTEs derive ids from the filtered documents relation (docs_u),
    * which generates exactly the same universe. CurationMmCutSpec pins
    * the equivalence mechanically against a PHYSICALLY truncated corpus
    * at an adversarial cut B ≡ 1 (mod 60) — every boundary-twin class
    * at once.
    *
    * Pair tables filter EXACTLY to the base run's pairs
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
    val hash = graft.sources.TableIO.readStatic(s, path).filter(col(idCol) < maxId)
    (hash, hash.groupBy("phash")
      .agg(count(lit(1)).as("n_copies"), min(idCol).as("canon")))
  }

  private def modalBase(s: SparkSession, dir: String, b: Long): MmInputs = {
    val (imgHash, imgGroups) = baseHashGroups(s,
      MultimodalQueries.phashHashTablePath(s, dir), "img_id", 2 * b)
    val imgPairs = graft.sources.TableIO.readStatic(s, MultimodalQueries.phashPairTablePath(s, dir))
      .filter(col("canon_a") < 2 * b && col("canon_b") < 2 * b)
    val (audHash, audGroups) = baseHashGroups(s,
      MultimodalQueries.audioFpHashTablePath(s, dir), "audio_id", 4 * b)
    val audPairs = graft.sources.TableIO.readStatic(s, MultimodalQueries.audioFpPairTablePath(s, dir))
      .filter(col("canon_a") < 4 * b && col("canon_b") < 4 * b)
    val vidPairs = graft.sources.TableIO.readStatic(s, 
        MultimodalQueries.videoClipPairTablePath(s, dir))
      .filter(col("video_a") < 2 * b && col("video_b") < 2 * b)
      .select(col("video_a"), col("video_b"))
    val textPairs = graft.sources.TableIO.readStatic(s, GraphCC.pairTablePath(s, dir))
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
      quality = graft.sources.TableIO.readStatic(s, TextQueries.qualityTablePath(s, dir))
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
      vidStatic = graft.sources.TableIO.readStatic(s, 
          MultimodalQueries.videoClipFrameTablePath(s, dir))
        .filter(col("video_id") < 2 * b)
        .groupBy("video_id")
        .agg(countDistinct(col("phash")).as("nd"))
        .filter(col("nd") === 1)
        .select(col("video_id").as("vid")))
  }

  /** Build the persisted curation STATE at doc cut `b` into `r` — what a
    * production deployment holds between ingests: the published
    * manifest, the encoded-node component labels, the per-modality
    * cluster labels and group tables, and the video drop sets. The state
    * is published through [[CurationState]] — the managed-table layer,
    * so every lifecycle step is a VERSION (v1 = this bootstrap) with
    * history, time travel, restore, and optimistic concurrency, exactly
    * like the manifest table. [[ingestAt]] consumes the state read-only
    * at a pinned version AND (via its `stateOut`) republishes the next
    * version after an ingest — one format for bootstrap state and
    * post-ingest state is what makes the loop CHAIN: batch n+1 runs off
    * batch n's published state, never off t=0. */
  private[graft] def buildBaseState(s: SparkSession, dir: String, b: Long,
                                    r: String): Unit = {
    val m = modalBase(s, dir, b)
    val labels = GraphCC.connectedComponents(encodedEdges(m), "s", "t")
      .localCheckpoint() // docGroups + the labels dump share one CC run
    val docGroups = labels.filter(col("node") % 8 === 0)
      .select(expr("node div 8").as("doc_id"),
        col("component").as("group_id"))
    CurationState.publish(s, r, Map(
      "labels" -> labels,
      "textcl" -> m.textCl.select("doc_id", "cluster_id"),
      "imgcl" -> m.imgCl,
      "audcl" -> m.audCl,
      "imggrp" -> baseHashGroups(s,
        MultimodalQueries.phashHashTablePath(s, dir), "img_id", 2 * b)._2,
      "audgrp" -> baseHashGroups(s,
        MultimodalQueries.audioFpHashTablePath(s, dir), "audio_id", 4 * b)._2,
      "viddup" -> m.vidDup,
      "vidstatic" -> m.vidStatic),
      manifestFrom(m, docGroups))
  }

  /** Persisted BASE curation state at the standard 4/5 cut, built once
    * per sf dir (the "bootstrap" run); every single-ingest invocation
    * consumes it read-only. */
  private[graft] def baseStateRoot(s: SparkSession, dir: String): String =
    ScratchDirs.memoized("mmcur_base_fix", dir)(
      buildBaseState(s, dir, baseCut(s, dir), _))

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
      // Hamming filter BEFORE the distinct (guide §2.3 — filter is
      // per-row codegen, the distinct is an exchange): band collisions
      // that fail the radius never reach the shuffle, and duplicates of
      // surviving pairs are dropped by the same distinct as before.
      .filter(bit_count(col("a.phash").bitwiseXOR(col("b.phash")))
        <= maxHamming)
      .select(col("a.canon").as("canon_a"), col("b.canon").as("canon_b"))
      .distinct()
  }

  /** Stage-timing probe (diagnostic only, env-gated): wraps the eager
    * points of the incremental run so a bench investigation can see
    * where per-invocation time goes without a profiler. */
  private implicit class StagedFrame(df: DataFrame) {
    def localCheckpointStaged(name: String): DataFrame =
      staged(name)(df.localCheckpoint())
  }

  private lazy val stageLog = {
    // The probe is env-gated diagnostics: when explicitly requested,
    // force the graft logger past Spark's post-init WARN default so the
    // lines actually land in the log stream.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.CurationMm", org.apache.logging.log4j.Level.INFO)
    org.slf4j.LoggerFactory.getLogger("graft.CurationMm")
  }

  private def staged[T](name: String)(f: => T): T =
    if (!sys.env.contains("SPARK_GRAFT_STAGE_TIMING")) f
    else {
      val t0 = System.nanoTime(); val r = f
      stageLog.info(
        f"[stage] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
          s"(cc_rounds=${GraphCC.lastRunRounds})")
      r
    }

  /** The ingest base-state ref (root@version) consumed by the most
    * recent [[ingestAt]] in this JVM — the observable
    * CurationMmChainSpec pins: a chained round must consume the PREVIOUS
    * round's published state, never the t=0 bootstrap fixture.
    * Diagnostic only: concurrent runs last-write-win. */
  private val lastIngestBaseA =
    new java.util.concurrent.atomic.AtomicReference[String]("")
  private[graft] def lastIngestBase: String = lastIngestBaseA.get()

  /** ONE incremental ingest: merge the document batch [`lo`, `hi`) into
    * the persisted curation state at `baseRoot` (the [[buildBaseState]]
    * layout), publishing through the managed table at `root`.
    *
    *  - `bootstrap` = true first initializes the table from the base
    *    manifest (v1 = base state, v2 = the merge); false merges into
    *    the table's current snapshot — a CHAINED round.
    *  - `stateOut` = Some(root) republishes the POST-ingest state as the
    *    next VERSION of the [[CurationState]] table at that root,
    *    closing the production loop: the next batch runs off this
    *    ingest's output with no access to t=0 state (the chain gate
    *    proves a second batch converges off it, hash-equal to the full
    *    recompute). When the out root IS the base root, the publish is
    *    an optimistic CAS against the version this ingest read — a
    *    concurrent writer (a racing retraction) makes the publish abort
    *    loudly instead of silently overwriting its effects.
    *
    * The batch's artifact ids are [stride·lo, stride·hi) — exact by the
    * generating-doc id encoding (see [[modalBase]]). All label closures
    * run as ONE fused contracted CC: the cross-modality component graph
    * (even ids) and the three per-modality cluster-label graphs (odd
    * ids, mod-3 strides inside) are disjoint id spaces, so a single
    * incremental CC re-converges every label set in one run — halving
    * the fixed per-round driver cost the two sequential closures paid. */
  private def ingestAt(s: SparkSession, dir: String, root: String,
                       baseState: StateRef, lo: Long, hi: Long,
                       bootstrap: Boolean,
                       stateOut: Option[String] = None,
                       aliveDoc: Column => Column = _ => lit(true)): Unit = {
    // `aliveDoc` marks which corpus documents still EXIST (post-
    // retraction ingest): corpus-side probe inputs — the shingle index,
    // the artifact hash tables, the video pair slice — filter through it
    // so an ingest can never resurrect a retracted document's pairs or
    // artifacts. Default: everything alive (the plain ingest).
    //
    // Pin the state version ONCE: every family read below sees one
    // consistent snapshot even if a writer publishes mid-ingest, and the
    // pinned version is the CAS base for this ingest's own state publish.
    val base = baseState.pin
    lastIngestBaseA.set(base.describe)
    val baseLabels = base.fam(s, "labels")

    val att = attachments(s, dir)
    val inBatch = col("doc_id") >= lo && col("doc_id") < hi
    val newAtt = att.filter(inBatch)

    // --- text: probe the persisted shingle index with the new batch's
    // prefixes only (materialized below, in ONE barrier with the
    // image/audio probes) ---
    val deltaTextPairsLazy = TextQueries
      .incrementalPairsAgainstAll(s, dir, inBatch,
        shingleIndex =
          Some(graft.sources.TableIO.readStatic(s, TextQueries.shingleTablePath(s, dir))
            .filter(aliveDoc(col("doc_id")))))

    // --- image/audio: group-table MERGE (base groups ∪ new hashes),
    // then banded delta probe, then the fused label closure below.
    // n_copies rides the same groupBy so the republished state keeps the
    // [[buildBaseState]] group-table schema. ---
    def combined(baseGrp: DataFrame, newHash: DataFrame, idCol: String)
        : DataFrame =
      baseGrp.select(col("phash"), col("n_copies"), col("canon"))
        .unionByName(newHash.select(col("phash"),
          lit(1L).as("n_copies"), col(idCol).as("canon")))
        .groupBy("phash")
        .agg(sum(col("n_copies")).as("n_copies"), min(col("canon")).as("canon"))
    val newImgHash = graft.sources.TableIO.readStatic(s, 
        MultimodalQueries.phashHashTablePath(s, dir))
      .filter(col("img_id") >= 2 * lo && col("img_id") < 2 * hi)
      .filter(aliveDoc(expr("img_id div 2")))
    val imgGroups = combined(base.fam(s, "imggrp"), newImgHash,
      "img_id")
    val deltaImgPairsLazy = deltaHashPairs(imgGroups, col("canon") >= 2 * lo,
      3, "img_inc_cap")
    val newAudHash = graft.sources.TableIO.readStatic(s, 
        MultimodalQueries.audioFpHashTablePath(s, dir))
      .filter(col("audio_id") >= 4 * lo && col("audio_id") < 4 * hi)
      .filter(aliveDoc(expr("audio_id div 4")))
    val audGroups = combined(base.fam(s, "audgrp"), newAudHash,
      "audio_id")
    val deltaAudPairsLazy = deltaHashPairs(audGroups, col("canon") >= 4 * lo,
      3, "aud_inc_cap")

    // --- video: the persisted clip-pair table IS the probe index — the
    // batch-incident slice is a pure id filter (pairs are normalized
    // video_a < video_b and new ids are larger, so a batch endpoint is
    // always video_b). In production the same slice falls out of probing
    // the persisted shingle table with the new clips' shingles. ---
    val deltaVidPairs = graft.sources.TableIO.readStatic(s, 
        MultimodalQueries.videoClipPairTablePath(s, dir))
      .filter(col("video_b") >= 2 * lo && col("video_b") < 2 * hi)
      .filter(aliveDoc(expr("video_a div 2")) &&
        aliveDoc(expr("video_b div 2")))
      .select(col("video_a"), col("video_b"))
    val vidDup = base.fam(s, "viddup")
      .unionByName(deltaVidPairs.select(col("video_b").as("vid")))
      .distinct()
    // static flags are per-video and immutable: persisted base set ∪ the
    // new batch's videos only — a delta-sized aggregation
    val vidStatic = base.fam(s, "vidstatic")
      .unionByName(graft.sources.TableIO.readStatic(s, 
          MultimodalQueries.videoClipFrameTablePath(s, dir))
        .filter(col("video_id") >= 2 * lo && col("video_id") < 2 * hi)
        .filter(aliveDoc(expr("video_id div 2")))
        .groupBy("video_id").agg(countDistinct(col("phash")).as("nd"))
        .filter(col("nd") === 1).select(col("video_id").as("vid")))

    // --- combined memberships for NEW attachments (may resolve to BASE
    // canons: a re-uploaded base artifact joins its existing group) ---
    def memberOf(hashTable: DataFrame, groups: DataFrame,
                 idCol: String): DataFrame =
      hashTable.join(groups.select("phash", "canon"), "phash")
        .select(col(idCol), col("canon"))
    val imgHashAll = graft.sources.TableIO.readStatic(s, 
        MultimodalQueries.phashHashTablePath(s, dir))
      .filter(aliveDoc(expr("img_id div 2")))
    val audHashAll = graft.sources.TableIO.readStatic(s, 
        MultimodalQueries.audioFpHashTablePath(s, dir))
      .filter(aliveDoc(expr("audio_id div 4")))
    val imgMember = memberOf(imgHashAll, imgGroups, "img_id")
    val audMember = memberOf(audHashAll, audGroups, "audio_id")

    // --- batch-incident edge legs that do NOT derive from the probe
    // outputs (attachment→canon membership, attachment→video, the
    // persisted video pair slice), pre-encoded to the 8-stride edge
    // space so they ride the SAME materialization barrier as the probes
    // (m = 3 below) — previously a second driver-synchronized checkpoint
    // per ingest whose only NEW work was exactly these legs (guide §2.4:
    // one explicit barrier, not two; no exchange-reuse dependence — the
    // probe legs and these legs are disjoint subtrees of one job) ---
    val doc8 = col("doc_id") * 8
    val edgeExtrasLazy =
      newAtt.join(imgMember, newAtt("img") === imgMember("img_id"))
        .select(doc8.as("a"), (col("canon") * 8 + 2).as("b"))
      .unionByName(newAtt.join(audMember,
          newAtt("aud") === audMember("audio_id"))
        .select(doc8.as("a"), (col("canon") * 8 + 3).as("b")))
      .unionByName(newAtt.select(doc8.as("a"), (col("vid") * 8 + 4).as("b")))
      .unionByName(deltaVidPairs.select((col("video_a") * 8 + 4).as("a"),
        (col("video_b") * 8 + 4).as("b")))

    // --- ONE materialization barrier for the three probes AND the edge
    // extras: the pipelines run as parallel stages of a single job
    // (instead of driver-synchronized checkpoints), and every downstream
    // consumer (both closures, the encoded edges, the touched set) reads
    // the cached blocks through cheap per-row re-encodings ---
    val deltaPairs = staged("delta_probe")(
      deltaTextPairsLazy.toDF("a", "b").withColumn("m", lit(0))
        .unionByName(deltaImgPairsLazy.toDF("a", "b").withColumn("m", lit(1)))
        .unionByName(deltaAudPairsLazy.toDF("a", "b").withColumn("m", lit(2)))
        .unionByName(edgeExtrasLazy.withColumn("m", lit(3)))
        .localCheckpoint())
    val deltaTextPairs = deltaPairs.filter(col("m") === 0)
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
    val deltaImgPairs = deltaPairs.filter(col("m") === 1)
      .select(col("a").as("canon_a"), col("b").as("canon_b"))
    val deltaAudPairs = deltaPairs.filter(col("m") === 2)
      .select(col("a").as("canon_a"), col("b").as("canon_b"))

    // --- the cross-modality delta edges (8-stride encoding): pair legs
    // re-encode per-row off the checkpointed blocks, the m=3 legs are
    // already encoded — no second materialization ---
    val deltaEdges = deltaPairs.filter(col("m") === 0)
      .select((col("a") * 8).as("s"), (col("b") * 8).as("t"))
      .unionByName(deltaPairs.filter(col("m") === 1)
        .select((col("a") * 8 + 2).as("s"), (col("b") * 8 + 2).as("t")))
      .unionByName(deltaPairs.filter(col("m") === 2)
        .select((col("a") * 8 + 3).as("s"), (col("b") * 8 + 3).as("t")))
      .unionByName(deltaPairs.filter(col("m") === 3)
        .select(col("a").as("s"), col("b").as("t")))

    // --- ONE FUSED incremental closure for EVERY label set: the
    // cross-modality component graph rides the EVEN ids (node → 2·node)
    // and the three per-modality cluster-label graphs ride the ODD ids
    // (text docs / image canons / audio canons in mod-3 strides, then
    // node → 2·node + 1). Parities never connect and both encodings are
    // monotone, so one contracted CC — base labels collapse to
    // supernodes, cost scales with the DELTA — re-converges all four
    // label sets in a single run (one driver loop instead of two), and
    // component minima decode exactly per parity/stride. ---
    def enc3(df: DataFrame, aCol: String, bCol: String, k: Int): DataFrame =
      df.select((col(aCol) * 3 + k).as("ea"), (col(bCol) * 3 + k).as("eb"))
    val baseLocal = enc3(base.fam(s, "textcl"), "doc_id", "cluster_id", 0)
      .unionByName(enc3(base.fam(s, "imgcl"), "canon", "cluster_id", 1))
      .unionByName(enc3(base.fam(s, "audcl"), "canon", "cluster_id", 2))
    val deltaLocal = enc3(deltaTextPairs, "doc_a", "doc_b", 0)
      .unionByName(enc3(deltaImgPairs, "canon_a", "canon_b", 1))
      .unionByName(enc3(deltaAudPairs, "canon_a", "canon_b", 2))
    // checkpointed: the decoded consumers (docGroups, the touched join,
    // three cluster-label frames) all sit inside the merge's one
    // materialized plan — without it the expansion joins re-run per leg
    val fused = staged("fused_cc")(incrementalCc(
      baseLabels.select((col("node") * 2).as("node"),
          (col("component") * 2).as("component"))
        .unionByName(baseLocal.select((col("ea") * 2 + 1).as("node"),
          (col("eb") * 2 + 1).as("component"))),
      deltaEdges.select((col("s") * 2).as("s"), (col("t") * 2).as("t"))
        .unionByName(deltaLocal.select((col("ea") * 2 + 1).as("s"),
          (col("eb") * 2 + 1).as("t"))))
      .localCheckpoint())
    val labels = fused.filter(col("node") % 2 === 0)
      .select(expr("node div 2").as("node"),
        expr("component div 2").as("component"))
    val localCl = fused.filter(col("node") % 2 === 1)
      .select(expr("(node - 1) div 2").as("node"),
        expr("(component - 1) div 2").as("component"))
    def dec(k: Int, idName: String): DataFrame =
      localCl.filter(col("node") % 3 === k)
        .select(expr(s"(node - $k) div 3").as(idName),
          expr(s"(component - $k) div 3").as("cluster_id"))
    val textCl = dec(0, "doc_id")
      .withColumn("is_canonical",
        when(col("doc_id") === col("cluster_id"), 1).otherwise(0))
    val imgCl = dec(1, "canon")
    val audCl = dec(2, "canon")
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
      // persisted per-doc artifact, probed by id like every other input
      quality = graft.sources.TableIO.readStatic(s, TextQueries.qualityTablePath(s, dir)),
      imgMember = imgMember, imgPairs = deltaImgPairs, imgCl = imgCl,
      audMember = audMember, audPairs = deltaAudPairs, audCl = audCl,
      vidPairs = deltaVidPairs, vidDup = vidDup, vidStatic = vidStatic)
    val recomputed = manifestFrom(mInc, touchedDocs)

    // --- publish through the table layer: bootstrap v1 = the base
    // manifest (a straight publish — no keys to resolve against the
    // empty v0), then the incremental MERGE (update only when the row
    // actually changed; insert the new batch) with its change feed ---
    if (bootstrap) staged("bootstrap") {
      val baseManifest = base.manifest(s)
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
    // --- republish the post-ingest state for the NEXT batch (the chain
    // contract: same versioned table [[buildBaseState]] bootstraps, so a
    // chained round never reaches back to t=0). Same-root publishes CAS
    // against the version this ingest READ — a concurrent writer makes
    // the publish fail loudly instead of silently losing its update. ---
    stateOut.foreach { out =>
      staged("state_out") {
        CurationState.publish(s, out, Map(
          "labels" -> labels,
          "textcl" -> textCl.select("doc_id", "cluster_id"),
          "imgcl" -> imgCl,
          "audcl" -> audCl,
          "imggrp" -> imgGroups,
          "audgrp" -> audGroups,
          "viddup" -> vidDup,
          "vidstatic" -> vidStatic),
          ManagedTable.read(s, root),
          expectedVersion = if (out == base.root) base.version else None)
      }
    }
  }

  /** The standard single-ingest run: last fifth of the corpus merged
    * into the bootstrap base state. Returns the table root (v2 =
    * post-merge, with the v2 change feed recorded). */
  private def incrementalRunAt(s: SparkSession, dir: String,
                               root: String): String = {
    ingestAt(s, dir, root, StateRef(baseStateRoot(s, dir)),
      staged("basecut")(baseCut(s, dir)), corpusTop(s, dir),
      bootstrap = true)
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

  /** The CHAINED incremental run, memoized per sf dir — TWO successive
    * ingests over a 60/20/20 corpus cut against ONE versioned state
    * table: base state built at 3N/5 (state v1), batch 1 = [3N/5, 4N/5)
    * ingested with post-state republication (state v2), batch 2 =
    * [4N/5, N) ingested OFF STATE v2 — the second round has no access
    * to the t=0 bootstrap, and every lifecycle step is a state VERSION
    * aligned with the run table's versions (state v1 pairs with table
    * v1 = the base manifest, state v2 with table v2 = post-batch-1).
    * Layout under the memo root: `state` (the [[CurationState]] root),
    * `table` (v1 = base manifest, v2 = post-batch-1, v3 = post-batch-2,
    * with change feeds at v2 and v3). */
  private[graft] def chainShared(s: SparkSession, dir: String): String =
    ScratchDirs.memoized("mmcur_chain_fix", dir) { r =>
      val top = corpusTop(s, dir)
      val b1 = chainCut(s, dir); val b2 = baseCut(s, dir)
      buildBaseState(s, dir, b1, s"$r/state")
      ingestAt(s, dir, s"$r/table", StateRef(s"$r/state"), b1, b2,
        bootstrap = true, stateOut = Some(s"$r/state"))
      ingestAt(s, dir, s"$r/table", StateRef(s"$r/state"), b2, top,
        bootstrap = false)
    }

  /** q_curation_mm_chain: the COMPOSITIONALITY gate — the property a
    * production loop actually relies on: an ingest's republished state
    * is sufficient base state for the NEXT ingest. The LIVE leg re-runs
    * round 2 per invocation off the memoized round-1 output state (a
    * read-only fixture — built by an INGEST, not by the from-scratch
    * bootstrap), publishing to a fresh table. The oracle is the
    * FULL-RECOMPUTE manifest: hash equality proves base(60%) → +batch1
    * → +batch2 converges to the one-shot capstone, i.e. incremental
    * ingest composes. CurationMmChainSpec additionally pins that round
    * 2 consumed round 1's state root (never the t=0 fixture) and that
    * the state table's v2 manifest is row-identical to the chain
    * table's v2. */
  def curationMmChain(s: SparkSession, dir: String): DataFrame = {
    val chain = chainShared(s, dir)
    val root = ScratchDirs.fresh("mmcur_chain_live")
    // pinned at v2 = batch 1's republished state (time travel: the live
    // head is also v2, but the pin documents WHICH step round 2 builds on)
    ingestAt(s, dir, root, StateRef(s"$chain/state", Some(2)),
      baseCut(s, dir), corpusTop(s, dir), bootstrap = true)
    ManagedTable.read(s, root)
  }

  /** q_curation_mm_chain_cdf: the chain table's v3 change feed — exactly
    * the ROUND-2 delta (batch-2 docs as inserts, post-batch-1 rows whose
    * group/keep state changed as updates). The oracle is the same closed
    * form as q_curation_mm_cdf: round 2's pre-state (post-batch-1, cut
    * 4N/5) is hash-equal to a from-scratch base at that cut — the
    * compositionality claim restated on the feed itself. */
  def curationChainCdf(s: SparkSession, dir: String): DataFrame =
    ManagedTable.changes(s, s"${chainShared(s, dir)}/table", 3)
      .withColumnRenamed(Merge.ActionCol, "action")

  // -------------------------------------------------------------------
  // Retraction: the right-to-forget path through the curation axis
  // -------------------------------------------------------------------

  /** The retraction batch's closed form (every 23rd document, offset 4 —
    * includes text-cluster minima and video-pair canons at fixture
    * scale, so canon re-election is exercised, and the DuckDB oracle
    * replays the same predicate). A RETRACTED document vanishes from the
    * corpus along with every artifact it GENERATED (id div stride ∈ R —
    * the takedown removes the upload's media; another document's
    * attachment to that media dangles, exactly like the closed-form
    * oracle world where the artifact CTEs derive only from surviving
    * documents). */
  private val retractMod = 23L
  private val retractRes = 4L
  private def retracted(c: Column): Column = c % retractMod === retractRes
  private val retractKeepSql = s"doc_id % $retractMod <> $retractRes"

  /** Persisted FULL-corpus curation state (the [[buildBaseState]] layout
    * at cut N) — what a production deployment holds after the whole
    * corpus is ingested, and therefore the state a retraction batch
    * mutates. Built once per sf dir. */
  private[graft] def fullStateRoot(s: SparkSession, dir: String): String =
    ScratchDirs.memoized("mmcur_full_fix", dir)(
      buildBaseState(s, dir, corpusTop(s, dir), _))

  /** Post-retraction group-table maintenance, INCREMENTAL form — the
    * merge-delete discipline on the persisted group state instead of a
    * corpus-wide re-derivation: the AFFECTED phashes are exactly the
    * removed members' hashes (retraction-batch-sized), groups not
    * holding a removed member carry their persisted row over verbatim
    * (an anti-join — no aggregation), and only the affected phashes
    * re-aggregate their SURVIVING members to re-elect the canon (min
    * over survivors; a group whose last member died yields no row and
    * vanishes). Equal to the full `groupBy(phash)` over survivors by
    * construction — CurationMmRetractSpec pins the equality AND that
    * the only corpus-relation aggregate in the plan sits above the
    * affected-phash join. */
  private[graft] def incrementalSurvivorGroups(
      hash: DataFrame, idCol: String, stride: Int, top: Long,
      pred: Column => Column, oldGrp: DataFrame): DataFrame = {
    val gen = expr(s"$idCol div $stride")
    val bounded = col(idCol) < stride * top
    val affected = hash.filter(pred(gen) && bounded)
      .select(col("phash")).distinct()
    val reagg = hash.filter(!pred(gen) && bounded)
      .join(affected, Seq("phash")) // removed-batch-sized probe
      .groupBy("phash")
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("canon"))
    oldGrp.select(col("phash"), col("n_copies"), col("canon"))
      .join(affected, Seq("phash"), "left_anti")
      .unionByName(reagg)
  }

  /** One RETRACTION pass against the full-corpus state, published
    * through the managed table at `root` (v1 = the pre-retraction
    * manifest, v2 = the retraction MERGE: matched-DELETE for retracted
    * docs, update-when-changed for surviving docs of touched components,
    * with the change feed recording delete pre-images and update
    * post-images).
    *
    * Deletion is the direction incremental ingest cannot express:
    * removing a node can SPLIT a component, shrink clusters, and
    * re-elect canons (including when the retracted doc owned the
    * canonical copy), so touched components re-converge FROM SCRATCH —
    * but ONLY touched components. The touched set is exact: a manifest
    * row can change only through (a) a retracted doc's own component
    * (its text pairs and attachment edges vanish there), (b) the
    * component of a removed artifact's group canon (membership, canon
    * election, and the group's pair edges change there — every doc
    * attached to such a group is co-component with the canon node by its
    * attachment edge), or (c) the component of a removed video node
    * (clip-pair dup status and static flags — attachers are
    * co-component via their vid edge). Components containing none of
    * those nodes keep their rows verbatim.
    *
    * Scale shape: seeds and probes are id filters + joins against the
    * persisted full-state tables (the generating-doc id encoding makes
    * "artifacts of retracted docs" a pure filter); the surviving group
    * tables are maintained INCREMENTALLY off the persisted state
    * ([[incrementalSurvivorGroups]] — unaffected groups carry over by
    * anti-join, only removed members' phashes re-aggregate, so group
    * maintenance scales with the retraction batch, not the corpus);
    * old pair tables REMAP through phash to post-election
    * canons (a pair is a property of its two hashes, so the pair set
    * only shrinks — no banded join re-runs); and every closure (text,
    * image, audio cluster labels AND the cross-modality groups) runs as
    * ONE fused from-scratch CC over the touched subgraph only — raw text
    * pairs stand in for the cluster-hub edges (transitively identical
    * connectivity, and cluster nodes 8c+1 can never be component minima
    * since their cluster's min doc 8c is smaller). */
  private[graft] def retractAt(s: SparkSession, dir: String, root: String,
                               pred: Column => Column = retracted,
                               baseState: Option[StateRef] = None,
                               docTop: Option[Long] = None,
                               bootstrap: Boolean = true,
                               stateOut: Option[String] = None): Unit = {
    // `baseState`/`docTop` retarget the retraction at ANY published state
    // (default: the full-corpus state) — the lifecycle-cycle composition
    // retracts from a mid-chain ingest's output. `docTop` bounds the
    // state's doc-id universe so globally recomputed artifacts (group
    // tables) never pull in not-yet-ingested ids; `stateOut` republishes
    // the post-retraction state as the next [[CurationState]] version so
    // the NEXT ingest can consume it (same-root publishes CAS against
    // the version this retraction read, like [[ingestAt]]).
    val full = baseState.getOrElse(StateRef(fullStateRoot(s, dir))).pin
    val top = docTop.getOrElse(corpusTop(s, dir))
    val labels = full.fam(s, "labels")
    val manifest = full.manifest(s)
    val retractedDocs = table(s, dir, "documents").select(col("doc_id"))
      .filter(pred(col("doc_id")) && col("doc_id") < top)

    val imgHashAll = graft.sources.TableIO.readStatic(s, 
      MultimodalQueries.phashHashTablePath(s, dir))
    val audHashAll = graft.sources.TableIO.readStatic(s, 
      MultimodalQueries.audioFpHashTablePath(s, dir))
    def removedOf(hash: DataFrame, idCol: String, stride: Int): DataFrame =
      hash.filter(pred(expr(s"$idCol div $stride")) && col(idCol) < stride * top)
    def survivingOf(hash: DataFrame, idCol: String, stride: Int): DataFrame =
      hash.filter(!pred(expr(s"$idCol div $stride")) && col(idCol) < stride * top)

    // --- seed nodes → touched components (see the contract above).
    // Seeds absent from the labels (never had an edge) cannot affect any
    // manifest row, so the inner join is the correct semantics. ---
    val seedNodes = retractedDocs.select((col("doc_id") * 8).as("node"))
      .unionByName(removedOf(imgHashAll, "img_id", 2)
        .join(full.fam(s, "imggrp").select("phash", "canon"), "phash")
        .select((col("canon") * 8 + 2).as("node")))
      .unionByName(removedOf(audHashAll, "audio_id", 4)
        .join(full.fam(s, "audgrp").select("phash", "canon"), "phash")
        .select((col("canon") * 8 + 3).as("node")))
      .unionByName(graft.sources.TableIO.readStatic(s, 
          MultimodalQueries.videoClipFrameTablePath(s, dir))
        .select(col("video_id")).distinct()
        .filter(pred(expr("video_id div 2")))
        .select((col("video_id") * 8 + 4).as("node")))
      .distinct()
    val touchedComps = labels.join(seedNodes, "node")
      .select(col("component")).distinct()
    val touchedLabeled = labels
      .join(touchedComps, Seq("component"))
      .localCheckpointStaged("r_touched")
    val touchedDocs = touchedLabeled.filter(col("node") % 8 === 0)
      .select(expr("node div 8").as("doc_id"))
    val survivors = touchedDocs.filter(!pred(col("doc_id")))
    def touchedArt(k: Int, idName: String): DataFrame =
      touchedLabeled.filter(col("node") % 8 === k)
        .select(expr(s"(node - $k) div 8").as(idName))

    val att = attachments(s, dir)
    val attT = att.join(survivors, "doc_id")

    // --- text: surviving pairs among touched docs (pairs never cross
    // components, and a pair to a retracted doc dies with it) ---
    val textPairsT = graft.sources.TableIO.readStatic(s, GraphCC.pairTablePath(s, dir))
      .join(survivors.select(col("doc_id").as("doc_a")), Seq("doc_a"))
      .join(survivors.select(col("doc_id").as("doc_b")), Seq("doc_b"))

    // --- image/audio: post-retraction group tables maintained
    // INCREMENTALLY off the persisted state (the MERGE-delete shape):
    // groups whose phash lost no member carry over verbatim, only the
    // affected phashes re-aggregate their survivors — the only
    // aggregated relation is removed-member-derived, so the cost scales
    // with the retraction batch, never the corpus. Old pairs then remap
    // through phash to the re-elected canons, restricted to touched
    // components ---
    val imgGroupsS = incrementalSurvivorGroups(imgHashAll, "img_id", 2,
      top, pred, full.fam(s, "imggrp"))
    val audGroupsS = incrementalSurvivorGroups(audHashAll, "audio_id", 4,
      top, pred, full.fam(s, "audgrp"))
    def remapPairs(oldPairs: DataFrame, oldGrp: DataFrame,
                   newGrp: DataFrame, touchedCanon: DataFrame): DataFrame =
      oldPairs
        .join(touchedCanon.select(col("id").as("canon_a")), Seq("canon_a"))
        .join(oldGrp.select(col("canon").as("canon_a"),
          col("phash").as("ph_a")), Seq("canon_a"))
        .join(oldGrp.select(col("canon").as("canon_b"),
          col("phash").as("ph_b")), Seq("canon_b"))
        .join(newGrp.select(col("phash").as("ph_a"),
          col("canon").as("na")), Seq("ph_a"))
        .join(newGrp.select(col("phash").as("ph_b"),
          col("canon").as("nb")), Seq("ph_b"))
        .select(col("na").as("canon_a"), col("nb").as("canon_b"))
    val imgPairsT = remapPairs(
      graft.sources.TableIO.readStatic(s, MultimodalQueries.phashPairTablePath(s, dir)),
      full.fam(s, "imggrp"), imgGroupsS, touchedArt(2, "id"))
    val audPairsT = remapPairs(
      graft.sources.TableIO.readStatic(s, MultimodalQueries.audioFpPairTablePath(s, dir)),
      full.fam(s, "audgrp"), audGroupsS, touchedArt(3, "id"))
    def memberOfS(hash: DataFrame, groups: DataFrame, idCol: String,
                  stride: Int): DataFrame =
      survivingOf(hash, idCol, stride)
        .join(groups.select("phash", "canon"), "phash")
        .select(col(idCol), col("canon"))
    val imgMemberS = memberOfS(imgHashAll, imgGroupsS, "img_id", 2)
    val audMemberS = memberOfS(audHashAll, audGroupsS, "audio_id", 4)

    // --- video: surviving pairs (endpoints are artifacts — both must
    // survive), touched-scoped; static flags filter the persisted set ---
    val vidPairsT = graft.sources.TableIO.readStatic(s, 
        MultimodalQueries.videoClipPairTablePath(s, dir))
      .join(touchedArt(4, "id").select(col("id").as("video_a")),
        Seq("video_a"))
      .filter(!pred(expr("video_a div 2")) &&
        !pred(expr("video_b div 2")) && col("video_b") < 2 * top)
      .select(col("video_a"), col("video_b"))
    val vidDupT = vidPairsT.select(col("video_b").as("vid")).distinct()
    val vidStaticT = full.fam(s, "vidstatic")
      .filter(!pred(expr("vid div 2")))

    // --- ONE fused from-scratch closure over the touched subgraph:
    // cross-modality groups on EVEN ids (raw text pairs as doc-doc
    // edges), the three per-modality cluster-label graphs on ODD ids
    // (mod-3 strides) — the incremental path's fusion, without
    // contraction (deletion re-converges from scratch) ---
    val doc8 = (col("doc_id") * 8).as("s")
    val crossEdges = textPairsT
      .select((col("doc_a") * 8).as("s"), (col("doc_b") * 8).as("t"))
      .unionByName(attT.join(imgMemberS, attT("img") === imgMemberS("img_id"))
        .select(doc8, (col("canon") * 8 + 2).as("t")))
      .unionByName(imgPairsT.select((col("canon_a") * 8 + 2).as("s"),
        (col("canon_b") * 8 + 2).as("t")))
      .unionByName(attT.join(audMemberS, attT("aud") === audMemberS("audio_id"))
        .select(doc8, (col("canon") * 8 + 3).as("t")))
      .unionByName(audPairsT.select((col("canon_a") * 8 + 3).as("s"),
        (col("canon_b") * 8 + 3).as("t")))
      .unionByName(attT.select(doc8, (col("vid") * 8 + 4).as("t")))
      .unionByName(vidPairsT.select((col("video_a") * 8 + 4).as("s"),
        (col("video_b") * 8 + 4).as("t")))
    def enc3(df: DataFrame, aCol: String, bCol: String, k: Int): DataFrame =
      df.select((col(aCol) * 3 + k).as("ea"), (col(bCol) * 3 + k).as("eb"))
    val localEdges = enc3(textPairsT, "doc_a", "doc_b", 0)
      .unionByName(enc3(imgPairsT, "canon_a", "canon_b", 1))
      .unionByName(enc3(audPairsT, "canon_a", "canon_b", 2))
    val fused = staged("r_fused_cc")(GraphCC.connectedComponents(
      crossEdges.select((col("s") * 2).as("s"), (col("t") * 2).as("t"))
        .unionByName(localEdges.select((col("ea") * 2 + 1).as("s"),
          (col("eb") * 2 + 1).as("t"))),
      "s", "t", inputDistinctPairs = true)
      .withColumnRenamed("node", "n").withColumnRenamed("component", "c")
      .localCheckpoint())
    // group ids live in the 8-stride encoded space (the full manifest's
    // convention), so the fused (×2) component min decodes by div 2.
    // Every doc carries an unconditional vid edge, so the inner join
    // covers all survivors.
    val docGroupsT = survivors.join(
      fused.filter(col("n") % 16 === 0)
        .select(expr("n div 16").as("doc_id"), expr("c div 2").as("group_id")),
      Seq("doc_id"))
    val localCl = fused.filter(col("n") % 2 === 1)
      .select(expr("(n - 1) div 2").as("node"),
        expr("(c - 1) div 2").as("component"))
    def dec(k: Int, idName: String): DataFrame =
      localCl.filter(col("node") % 3 === k)
        .select(expr(s"(node - $k) div 3").as(idName),
          expr(s"(component - $k) div 3").as("cluster_id"))
    val textClT = dec(0, "doc_id")
      .withColumn("is_canonical",
        when(col("doc_id") === col("cluster_id"), 1).otherwise(0))

    val mT = MmInputs(
      att = attT,
      docs = survivors,
      textCl = textClT,
      quality = graft.sources.TableIO.readStatic(s, TextQueries.qualityTablePath(s, dir)),
      imgMember = imgMemberS, imgPairs = imgPairsT, imgCl = dec(1, "canon"),
      audMember = audMemberS, audPairs = audPairsT, audCl = dec(2, "canon"),
      vidPairs = vidPairsT, vidDup = vidDupT, vidStatic = vidStaticT)
    val recomputed = manifestFrom(mT, docGroupsT)

    // --- publish: v1 = the pre-retraction manifest, v2 = the retraction
    // MERGE — matched-DELETE on the retraction flag (the reference's
    // hist delete-clause semantics), update-when-changed for touched
    // survivors, change feed on ---
    if (bootstrap) staged("r_bootstrap") {
      ManagedTable.createEmpty(s, root, manifest)
      ManagedTable.overwrite(root, manifest)
    }
    val changedCols = Seq("kept", "drop_reasons", "split", "group_id",
      "group_docs", "quality_score", "n_tokens")
    val src = recomputed.withColumn("_retract", lit(false))
      .unionByName(manifest.join(retractedDocs, Seq("doc_id"))
        .withColumn("_retract", lit(true)))
    staged("r_merge") {
      ManagedTable.merge(s, root, src, Seq("doc_id"),
        MergeClauses.Spec(
          updateWhen = Some(!col("s._retract") && changedCols
            .map(c => !(col(s"t.$c") <=> col(s"s.$c"))).reduce(_ || _)),
          deleteWhen = Some(col("s._retract"))),
        changeFeed = true)
    }
    // --- republish the post-retraction state: untouched components keep
    // their base rows verbatim (their nodes, labels, clusters, and drop
    // sets are provably unchanged), touched components carry the
    // re-converged values, removed nodes appear in neither — stitched in
    // the same [[buildBaseState]] layout so the next ingest composes. ---
    stateOut.foreach { out =>
      staged("r_state_out") {
        CurationState.publish(s, out, Map(
          "labels" -> labels.join(touchedComps, Seq("component"), "left_anti")
            .unionByName(fused.filter(col("n") % 2 === 0)
              .select(expr("n div 2").as("node"),
                expr("c div 2").as("component"))),
          "textcl" -> full.fam(s, "textcl")
            .join(touchedDocs, Seq("doc_id"), "left_anti")
            .unionByName(textClT.select("doc_id", "cluster_id")),
          "imgcl" -> full.fam(s, "imgcl")
            .join(touchedArt(2, "canon"), Seq("canon"), "left_anti")
            .unionByName(dec(1, "canon")),
          "audcl" -> full.fam(s, "audcl")
            .join(touchedArt(3, "canon"), Seq("canon"), "left_anti")
            .unionByName(dec(2, "canon")),
          "imggrp" -> imgGroupsS,
          "audgrp" -> audGroupsS,
          "viddup" -> full.fam(s, "viddup")
            .join(touchedArt(4, "vid"), Seq("vid"), "left_anti")
            .unionByName(vidDupT),
          "vidstatic" -> vidStaticT),
          ManagedTable.read(s, root),
          expectedVersion = if (out == full.root) full.version else None)
      }
    }
  }

  /** q_curation_mm_retract: the RIGHT-TO-FORGET gate — a retraction
    * batch (every 23rd doc) removed from the published full-corpus
    * manifest through the table layer's matched-DELETE clause, with
    * touched components re-converged from scratch (cluster shrinkage,
    * canon re-election — including minima the retracted docs owned —
    * and component splits all land). The oracle is the full recompute
    * over `documents` minus the retracted set. */
  def curationMmRetract(s: SparkSession, dir: String): DataFrame = {
    val root = ScratchDirs.fresh("mmcur_retract_live")
    retractAt(s, dir, root)
    ManagedTable.read(s, root)
  }

  /** The retraction run's published table, memoized per sf dir — the
    * read-only fixture the retraction CDF gate (and the spec) consume;
    * q_curation_mm_retract stays the live leg. */
  private[graft] def retractShared(s: SparkSession, dir: String): String =
    ScratchDirs.memoized("mmcur_retract_fix", dir)(retractAt(s, dir, _))

  /** q_curation_mm_retract_cdf: the retraction's change feed — DELETE
    * rows carrying the pre-image of every retracted manifest row (the
    * record a right-to-forget audit consumes) plus update post-images
    * for surviving rows whose group/keep state changed. */
  def curationRetractCdf(s: SparkSession, dir: String): DataFrame =
    ManagedTable.changes(s, retractShared(s, dir), 2)
      .withColumnRenamed(Merge.ActionCol, "action")

  // -------------------------------------------------------------------
  // The full lifecycle: ingest → retract → ingest, each step off the
  // previous step's republished state
  // -------------------------------------------------------------------

  /** The LIFECYCLE fixture, memoized per sf dir: the chain's post-batch-1
    * state (docs < 4N/5) suffers a RETRACTION (every 23rd doc of the
    * ingested corpus), then batch 2 = [4N/5, N) ingests off the
    * POST-RETRACTION state — three different operations, each consuming
    * the previous one's published state, one table recording it all
    * (v1 = post-batch-1 manifest, v2 = the retraction merge with delete
    * rows, v3 = the batch-2 merge with inserts). The batch-2 ingest runs
    * with the `aliveDoc` screen so retracted documents' pairs and
    * artifacts can never be resurrected by corpus-side probes. */
  private[graft] def cycleShared(s: SparkSession, dir: String): String =
    ScratchDirs.memoized("mmcur_cycle_fix", dir) { r =>
      val top = corpusTop(s, dir); val b2 = baseCut(s, dir)
      val chain = chainShared(s, dir)
      // shallow-clone the chain's post-batch-1 state (live = v2) into
      // this fixture's own version line: clone v0 = chain v2 content —
      // the cycle's history stays self-contained and the chain fixture
      // is never mutated by a downstream composition
      CurationState.cloneTo(s, s"$chain/state", s"$r/state")
      retractAt(s, dir, s"$r/table", retracted,
        baseState = Some(StateRef(s"$r/state")), docTop = Some(b2),
        bootstrap = true, stateOut = Some(s"$r/state")) // CAS v0 -> v1
      ingestAt(s, dir, s"$r/table", StateRef(s"$r/state", Some(1)), b2, top,
        bootstrap = false,
        aliveDoc = c => !(retracted(c) && c < b2))
    }

  /** q_curation_mm_cycle: the FULL-LIFECYCLE gate — ingest composes with
    * retraction: the live leg ingests batch 2 off the memoized
    * POST-RETRACTION state (itself the product of bootstrap → ingest →
    * retract, each step consuming the previous step's output), and the
    * oracle is the one-shot capstone over the cycle's surviving world
    * (documents minus the docs retracted mid-stream). Hash equality
    * proves the three state-republishing operations compose in any
    * order a production loop would run them. */
  def curationMmCycle(s: SparkSession, dir: String): DataFrame = {
    val cyc = cycleShared(s, dir)
    val b2 = baseCut(s, dir)
    val root = ScratchDirs.fresh("mmcur_cycle_live")
    // v1 = the post-retraction state version the fixture published
    ingestAt(s, dir, root, StateRef(s"$cyc/state", Some(1)), b2,
      corpusTop(s, dir),
      bootstrap = true, aliveDoc = c => !(retracted(c) && c < b2))
    ManagedTable.read(s, root)
  }

  /** Spec-only window onto [[ingestAt]]: replay the standard batch-2
    * ingest off an arbitrary state ref (CurationRestoreSpec re-runs the
    * rolled-back batch and pins state-replay determinism;
    * CurationConcurrencySpec drives a STALE ref into the CAS). */
  private[graft] def ingestReplayForSpec(s: SparkSession, dir: String,
      root: String, base: StateRef, stateOut: Option[String] = None,
      bootstrap: Boolean = true): Unit =
    ingestAt(s, dir, root, base, baseCut(s, dir), corpusTop(s, dir),
      bootstrap = bootstrap, stateOut = stateOut)

  /** The ROLLBACK fixture, memoized per sf dir: the chain's post-batch-1
    * state is shallow-cloned into its own version line (v0), batch 2 is
    * ingested WITH state republication (v1 = post-batch-2 — playing the
    * "bad ingest" a production loop wants to undo), and the state is
    * RESTORED to v0 (v2 = the rollback — itself a versioned event with
    * linear history, so the bad ingest stays auditable at v1). The run
    * table records v1 = post-batch-1 manifest, v2 = the batch-2 merge. */
  private[graft] def restoreShared(s: SparkSession, dir: String): String =
    ScratchDirs.memoized("mmcur_restore_fix", dir) { r =>
      val chain = chainShared(s, dir)
      CurationState.cloneTo(s, s"$chain/state", s"$r/state") // v0 = post-b1
      ingestAt(s, dir, s"$r/table", StateRef(s"$r/state"), baseCut(s, dir),
        corpusTop(s, dir), bootstrap = true,
        stateOut = Some(s"$r/state"))                        // v1 = post-b2
      CurationState.restore(s, s"$r/state", 0)               // v2 = rollback
    }

  /** q_curation_mm_restore: the RESTORE-AND-REPLAY gate — the property
    * that makes VERSIONED curation state operationally useful: a
    * production loop rolls back a bad ingest by restoring the state to
    * the pre-ingest version and re-running the batch. The live leg
    * ingests batch 2 off the ROLLED-BACK state head (v2 = restored
    * pre-batch-2 content) and the oracle is the one-shot capstone over
    * the full corpus: hash equality proves the restored state is
    * sufficient to replay the ingest to exactly the same answer.
    * CurationRestoreSpec additionally pins restored-content equality
    * (v2 == v0), state-replay determinism, and core/manifest version
    * alignment at every step. */
  def curationMmRestore(s: SparkSession, dir: String): DataFrame = {
    val r = restoreShared(s, dir)
    val root = ScratchDirs.fresh("mmcur_restore_live")
    ingestAt(s, dir, root, StateRef(s"$r/state"), baseCut(s, dir),
      corpusTop(s, dir), bootstrap = true)
    ManagedTable.read(s, root)
  }

  /** q_curation_mm_retract_b1: retraction at CHAIN scale — the takedown
    * batch lies ENTIRELY inside the most recently INGESTED batch
    * (batch 1 = [3N/5, 4N/5)): the retracted docs' artifacts sit in
    * groups the chain's own ingest merge-updated and in components its
    * contracted closure created, so the touched-set machinery, canon
    * re-election and pair remaps run against state the INGEST admitted,
    * not bootstrap-built state. Runs read-only off the chain's
    * post-batch-1 state (pinned v2). Oracle: the one-shot capstone over
    * docs < 4N/5 minus the batch-1 takedown residue (docsFilter closed
    * form). */
  def curationMmRetractB1(s: SparkSession, dir: String): DataFrame = {
    val chain = chainShared(s, dir)
    val root = ScratchDirs.fresh("mmcur_retractb1_live")
    val b1 = chainCut(s, dir)
    retractAt(s, dir, root, c => c % 17 === 2 && c >= b1,
      baseState = Some(StateRef(s"$chain/state", Some(2))),
      docTop = Some(baseCut(s, dir)))
    ManagedTable.read(s, root)
  }

  /** Persisted TAKEDOWN table: the id list a production right-to-forget
    * request actually arrives as (a takedown names documents, not an
    * arithmetic residue). Synthesized once per sf dir from a closed form
    * so the DuckDB oracle can replay the set — the ENGINE only ever
    * reads the table. */
  private[graft] def takedownTablePath(s: SparkSession, dir: String): String =
    ScratchDirs.persistedParquet("mm_takedown_fix", dir)(
      table(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") % 31 === 5))

  /** q_curation_mm_retract_list: the LIST-DRIVEN retraction twin — the
    * persisted takedown TABLE, not an arithmetic predicate, drives
    * [[retractAt]]: the id list is collected (bounded: takedown lists
    * are human-issued and hit-sized — hard-capped, loudly) and pushed
    * into every seed/filter site as a broadcast-literal `isin` (Spark
    * compiles >10 ids to an InSet, so the predicate travels with the
    * task closures and applies at the scan — no join, no shuffle),
    * proving the retraction path does not depend on pushdown of an
    * arithmetic form. Same touched-set machinery as the residue twin;
    * the oracle replays the takedown set's closed form. */
  def curationMmRetractList(s: SparkSession, dir: String): DataFrame = {
    val ids = graft.sources.TableIO.readStatic(s, takedownTablePath(s, dir))
      .collect().map(_.getLong(0)).toSeq
    require(ids.length <= 100000,
      s"takedown list of ${ids.length} ids exceeds the driver-side bound " +
        "— route bulk deletions through the residue/join form instead")
    val root = ScratchDirs.fresh("mmcur_retractlist_live")
    retractAt(s, dir, root, c => c.isInCollection(ids))
    ManagedTable.read(s, root)
  }

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
    val m = graft.sources.TableIO.readStatic(s, manifestTablePath(s, dir))
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
    val kept = graft.sources.TableIO.readStatic(s, manifestTablePath(s, dir))
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

  /** q_curation_pack_screened: the contamination screen CONSUMED — the
    * packing input is the kept train split ANTI-JOINED against the
    * cross-modal benchmark-contamination quarantine
    * ([[mmBenchContamination]]'s hit set): a document whose image or
    * audio perceptually matches a benchmark artifact never reaches a
    * training sequence, closing the loop q_mm_bench_contamination only
    * reported. Scale shape: the quarantine is benchmark-hit-sized (tiny
    * by definition), so the anti-join broadcasts; everything else is the
    * [[curationPackE2e]] prefix-sum layout over the screened stream. */
  def curationPackScreened(s: SparkSession, dir: String,
                           budget: Long = 2048L): DataFrame = {
    val kept = graft.sources.TableIO.readStatic(s, manifestTablePath(s, dir))
      .filter(col("kept") === "true" && col("split") === "train")
      .select(col("doc_id"),
        col("n_tokens").cast(org.apache.spark.sql.types.LongType)
          .as("n_tokens"))
    val quarantine = mmBenchContamination(s, dir)
      .select(col("doc_id")).distinct()
    val clean = kept.join(quarantine, Seq("doc_id"), "left_anti")
    PackQueries.withExclusivePrefixSum(s, clean,
        Seq(col("doc_id").asc), "n_tokens")
      .select(col("doc_id"), col("n_tokens"),
        expr(s"cum_before div $budget").as("bin_id"),
        (col("cum_before") % budget).as("bin_offset"))
  }

  /** q_curation_pack_chosen: the packing DECISION CONSUMED — the analog
    * of the screen-consumption gate one level up: q_pack_report
    * tabulates the fragmentation-vs-padding trade per candidate budget;
    * this gate PICKS the waste-minimizing budget (argmin of
    * chunk_crossing_frac + ffd_padding_frac, ties to the smaller
    * budget) and emits the screened train stream packed at it, with the
    * chosen budget riding along as a column. The argmin is a
    * driver-side read of the 4-row report (bounded by the candidate
    * list — a config decision, not a data collect); everything else is
    * the [[curationPackScreened]] prefix-sum layout. The oracle
    * composes the report's closed form, the same argmin, and the
    * screened pack closed form parameterized by the chosen budget. */
  def curationPackChosen(s: SparkSession, dir: String): DataFrame = {
    val rep = PackQueries.packReport(s, dir)
      .select(col("budget"),
        (col("chunk_crossing_frac") + col("ffd_padding_frac")).as("w"))
      .collect() // one row per candidate budget — bounded by the list
    val best = rep.map(r => (r.getDouble(1), r.getLong(0))).min._2
    curationPackScreened(s, dir, best).withColumn("budget", lit(best))
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
    val train = graft.sources.TableIO.readStatic(s, manifestTablePath(s, dir))
      .filter(col("kept") === "true" && col("split") === "train")
      .select(col("doc_id"))
    val att = attachments(s, dir).join(train, "doc_id")
    def banded(df: DataFrame) = MultimodalQueries.bandedHash(df, maxHamming)
    def leg(hashPath: String, idCol: String, attCol: String,
            modality: String): DataFrame = {
      val hash = graft.sources.TableIO.readStatic(s, hashPath)
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
    "q_curation_mm_chain" -> (curationMmChain _),
    "q_curation_mm_chain_cdf" -> (curationChainCdf _),
    "q_curation_mm_retract" -> (curationMmRetract _),
    "q_curation_mm_retract_cdf" -> (curationRetractCdf _),
    "q_curation_mm_cycle" -> (curationMmCycle _),
    "q_curation_mm_restore" -> (curationMmRestore _),
    "q_curation_mm_retract_b1" -> (curationMmRetractB1 _),
    "q_curation_mm_retract_list" -> (curationMmRetractList _),
    "q_mm_bench_contamination" ->
      ((s: SparkSession, d: String) => mmBenchContamination(s, d)),
    "q_curation_mm_report" -> (curationMmReport _),
    "q_curation_pack_e2e" ->
      ((s: SparkSession, d: String) => curationPackE2e(s, d)),
    "q_curation_pack_screened" ->
      ((s: SparkSession, d: String) => curationPackScreened(s, d)),
    "q_curation_pack_chosen" -> (curationPackChosen _))

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
  /** The post-retraction world: the manifest is a pure function of the
    * documents relation, so right-to-forget is the same docsFilter
    * machinery with the keep predicate. */
  private val retractManifestOracle: String =
    manifestOracleOver(Some(retractKeepSql))

  /** The change-feed closed form shared by the single-ingest CDF gate
    * and the chain's v3 CDF gate: combined-manifest rows not present
    * (insert) or different (update) in the pre-state — which for BOTH
    * gates is the base manifest at the 4N/5 cut (the chain's round-2
    * pre-state is hash-equal to it; that equality IS the chain claim).
    * Post-images, like the feed; no delete clause fires, so no delete
    * rows. */
  private lazy val cdfOracle: String =
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
       |       AND cm.n_tokens IS NOT DISTINCT FROM bm.n_tokens)""".stripMargin

  /** Train-side attachment hashes (manifest split x closed-form hash
    * CTEs) banded against the ≡3 (mod 7) benchmark artifacts, exact
    * Hamming verify, per-(doc, modality) hit count + closest distance
    * (the q_mm_bench_contamination closed form) — a val because the
    * screened-pack oracle nests it as the quarantine set. */
  private lazy val benchContaminationOracle: String =
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
         |FROM legs GROUP BY doc_id, modality""".stripMargin

  /** The screened-pack closed form, parameterized over the bin budget
    * (a literal for the fixed-budget gate, a scalar subquery for the
    * report-argmin gate) — one text, so the two gates cannot drift. */
  private def screenedPackOracle(prefix: String, budgetExpr: String,
                                 budgetCol: Option[String]): String =
    s"""WITH ${prefix}cq AS MATERIALIZED (SELECT DISTINCT doc_id FROM
       |  ($benchContaminationOracle) cqx),
       |m AS MATERIALIZED (SELECT doc_id,
       |    CAST(n_tokens AS BIGINT) AS n_tokens
       |  FROM ($manifestOracle) mm
       |  WHERE kept = 'true' AND split = 'train'
       |    AND doc_id NOT IN (SELECT doc_id FROM cq)),
       |c AS (SELECT doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum_before
       |  FROM m)
       |SELECT doc_id, n_tokens,
       |  cum_before // $budgetExpr AS bin_id,
       |  cum_before % $budgetExpr AS bin_offset${budgetCol.map(c => ",\n  " + c).getOrElse("")}
       |FROM c""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_curation_mm_e2e" -> manifestOracle,
    // Incremental ingest converges to the one-shot capstone on the
    // combined corpus — the oracle IS the full-recompute closed form.
    "q_curation_mm_incremental" -> manifestOracle,
    // The chained run converges to the same closed form: base(60%) +
    // batch1 + batch2, round 2 running off round 1's republished state.
    "q_curation_mm_chain" -> manifestOracle,
    // Restore-and-replay converges to the same closed form: the rolled-
    // back state replays batch 2 to exactly the one-shot capstone.
    "q_curation_mm_restore" -> manifestOracle,
    "q_curation_mm_cdf" -> cdfOracle,
    "q_curation_mm_chain_cdf" -> cdfOracle,
    // Retraction converges to the one-shot manifest over the surviving
    // documents — right-to-forget as a docsFilter of the closed form.
    "q_curation_mm_retract" -> retractManifestOracle,
    // The full lifecycle's surviving world: everything except the docs
    // retracted mid-stream (they had been ingested — doc_id below the
    // second batch's cut — and were removed before batch 2 arrived).
    "q_curation_mm_cycle" -> manifestOracleOver(Some(
      s"(doc_id % $retractMod <> $retractRes OR doc_id >= $baseCutSql)")),
    // Chain-scale retraction: the post-batch-1 world (docs < 4N/5)
    // minus a takedown batch lying entirely inside batch 1.
    "q_curation_mm_retract_b1" -> manifestOracleOver(Some(
      s"doc_id < $baseCutSql AND NOT (doc_id % 17 = 2 " +
        s"AND doc_id >= $chainCutSql)")),
    // List-driven retraction: the oracle replays the persisted takedown
    // table's closed form (the engine consumes only the table).
    "q_curation_mm_retract_list" ->
      manifestOracleOver(Some("doc_id % 31 <> 5")),
    // The retraction feed: delete rows carry the PRE-image (the full
    // manifest's retracted rows); update rows the post-image of every
    // surviving row that changed.
    "q_curation_mm_retract_cdf" ->
      s"""WITH cm AS MATERIALIZED ($retractManifestOracle),
         |fm AS MATERIALIZED ($manifestOracle)
         |SELECT fm.doc_id, fm.kept, fm.drop_reasons, fm.split,
         |  fm.group_id, fm.group_docs, fm.quality_score, fm.n_tokens,
         |  'delete' AS action
         |FROM fm WHERE NOT (${retractKeepSql.replace("doc_id", "fm.doc_id")})
         |UNION ALL
         |SELECT cm.doc_id, cm.kept, cm.drop_reasons, cm.split,
         |  cm.group_id, cm.group_docs, cm.quality_score, cm.n_tokens,
         |  'update' AS action
         |FROM cm JOIN fm ON fm.doc_id = cm.doc_id
         |WHERE NOT (cm.kept IS NOT DISTINCT FROM fm.kept
         |       AND cm.drop_reasons IS NOT DISTINCT FROM fm.drop_reasons
         |       AND cm.split IS NOT DISTINCT FROM fm.split
         |       AND cm.group_id IS NOT DISTINCT FROM fm.group_id
         |       AND cm.group_docs IS NOT DISTINCT FROM fm.group_docs
         |       AND cm.quality_score IS NOT DISTINCT FROM fm.quality_score
         |       AND cm.n_tokens IS NOT DISTINCT FROM fm.n_tokens)""".stripMargin,
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
    "q_mm_bench_contamination" -> benchContaminationOracle,
    // The screen CONSUMED: the pack stream minus the quarantine —
    // the loader-ready closed form over the anti-joined doc set.
    "q_curation_pack_screened" -> screenedPackOracle("", "2048", None),
    // The decision CONSUMED: the report's argmin budget (in SQL) drives
    // the same screened pack closed form.
    "q_curation_pack_chosen" -> screenedPackOracle(
      s"""rep AS MATERIALIZED (${PackQueries.oracles("q_pack_report")}),
         |chosen AS MATERIALIZED (SELECT budget FROM rep
         |  ORDER BY chunk_crossing_frac + ffd_padding_frac, budget
         |  LIMIT 1),
         |""".stripMargin,
      "(SELECT budget FROM chosen)",
      Some("(SELECT budget FROM chosen) AS budget")),
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
