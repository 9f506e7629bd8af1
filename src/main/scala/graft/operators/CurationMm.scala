package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.sources.TableIO.table

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
  * Scale shape: every perceptual input is a PERSISTED artifact (hash /
  * fingerprint / frame / clip-pair tables — decode paid once per sf
  * dir); the per-modality cluster closures and the cross-modality group
  * closure run through the same checkpointed pointer-jumping CC as the
  * text pipeline (GraphCC — O(log n) rounds, nothing collected); the
  * manifest itself is one quality scan plus bounded left joins against
  * drop sets that are tiny next to the corpus. The cross-modality graph
  * encodes heterogeneous nodes in disjoint strides (doc d → 8d, text
  * cluster c → 8c+1, image group canon g → 8g+2, audio group canon →
  * 8g+3, video → 8v+4), so ONE generic CC covers all four modalities
  * without per-modality plumbing.
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

  /** q_curation_mm_e2e: the manifest — one row per document:
    * (doc_id, kept, drop_reasons, split, group_id, quality_score,
    * n_tokens). A document is kept iff NO screen fires; every screen
    * that fires is listed in `drop_reasons`, comma-joined in screen
    * order (text_dup, low_quality, image_dup, audio_dup, video_dup,
    * video_static). `group_id` is the document's cross-modality leakage
    * component (encoded-node minimum — deterministic, hash-replayable);
    * the split is the standard salted-hash 90/5/5 draw on it. */
  def curationMmE2e(s: SparkSession, dir: String): DataFrame = {
    val att = attachments(s, dir)
    val docs = table(s, dir, "documents").select(col("doc_id"))

    // --- text: near-dup clusters from the PERSISTED table (the
    // pipeline the corpus already ran — q_dedup_cc / q_curation_e2e
    // stay the live legs timing it) + quality bar ---
    val textCl = s.read.parquet(GraphCC.clusterTablePath(s, dir))
      .select(col("doc_id"), col("cluster_id"), col("is_canonical"))
    val quality = TextQueries.txtQuality(s, dir)
      .select(col("doc_id"), col("quality_score"), col("n_tokens"))

    // --- image: persisted hash/group tables -> banded pairs -> CC ---
    val imgMember = s.read.parquet(
        MultimodalQueries.phashHashTablePath(s, dir))
      .join(MultimodalQueries.phashGroups(s, dir).select("phash", "canon"),
        "phash")
      .select(col("img_id"), col("canon"))
    val imgPairs = MultimodalQueries
      .phashGroupPairs(MultimodalQueries.phashGroups(s, dir), 3,
        capMetric = "img_cc_cap")
      .select(col("canon_a"), col("canon_b"))
      .localCheckpoint(true) // bounded: near-pair groups
    val imgCl = GraphCC.connectedComponents(imgPairs, "canon_a", "canon_b")
      .select(col("node").as("canon"), col("component").as("img_cluster"))

    // --- audio: same pipeline on the fingerprint tables ---
    val audMember = s.read.parquet(
        MultimodalQueries.audioFpHashTablePath(s, dir))
      .join(MultimodalQueries.audioFpGroups(s, dir).select("phash", "canon"),
        "phash")
      .select(col("audio_id"), col("canon"))
    val audPairs = MultimodalQueries
      .phashGroupPairs(MultimodalQueries.audioFpGroups(s, dir), 3,
        capMetric = "aud_cc_cap")
      .select(col("canon_a"), col("canon_b"))
      .localCheckpoint(true)
    val audCl = GraphCC.connectedComponents(audPairs, "canon_a", "canon_b")
      .select(col("node").as("canon"), col("component").as("aud_cluster"))

    // --- video: persisted clip-pair + frame tables (the curation gate's
    // own inputs, scanned, never recomputed) ---
    val vidPairs = s.read.parquet(
      MultimodalQueries.videoClipPairTablePath(s, dir))
      .select(col("video_a"), col("video_b"))
    val vidDup = vidPairs.select(col("video_b").as("vid")).distinct()
      .withColumn("f_vdup", lit(true))
    val vidStatic = s.read.parquet(
        MultimodalQueries.videoClipFrameTablePath(s, dir))
      .groupBy("video_id")
      .agg(countDistinct(col("phash")).as("nd"))
      .filter(col("nd") === 1)
      .select(col("video_id").as("vid"))
      .withColumn("f_vstatic", lit(true))

    // --- per-modality drop sets at the DOCUMENT level ---
    val textDrop = textCl.filter(col("is_canonical") === 0)
      .select(col("doc_id")).withColumn("f_text", lit(true))
    def perceptualDrop(member: DataFrame, idCol: String, attCol: String,
                       cl: DataFrame, clCol: String, flag: String): DataFrame =
      att.join(member, att(attCol) === member(idCol))
        .join(cl, Seq("canon"), "left")
        .filter(col(attCol) =!= col("canon") ||
          (col(clCol).isNotNull && col(clCol) =!= col("canon")))
        .select(col("doc_id")).withColumn(flag, lit(true))
    val imgDrop = perceptualDrop(imgMember, "img_id", "img",
      imgCl, "img_cluster", "f_img")
    val audDrop = perceptualDrop(audMember, "audio_id", "aud",
      audCl, "aud_cluster", "f_aud")
    val vidDupDrop = att.join(vidDup, Seq("vid")).select("doc_id", "f_vdup")
    val vidStaticDrop = att.join(vidStatic, Seq("vid"))
      .select("doc_id", "f_vstatic")

    // --- cross-modality leakage groups: ONE CC over encoded nodes ---
    val doc8 = (col("doc_id") * 8).as("s")
    val edges = textCl.select(doc8, (col("cluster_id") * 8 + 1).as("t"))
      .unionByName(att.join(imgMember, att("img") === imgMember("img_id"))
        .select(doc8, (col("canon") * 8 + 2).as("t")))
      .unionByName(imgPairs.select((col("canon_a") * 8 + 2).as("s"),
        (col("canon_b") * 8 + 2).as("t")))
      .unionByName(att.join(audMember, att("aud") === audMember("audio_id"))
        .select(doc8, (col("canon") * 8 + 3).as("t")))
      .unionByName(audPairs.select((col("canon_a") * 8 + 3).as("s"),
        (col("canon_b") * 8 + 3).as("t")))
      .unionByName(att.select(doc8, (col("vid") * 8 + 4).as("t")))
      .unionByName(vidPairs.select((col("video_a") * 8 + 4).as("s"),
        (col("video_b") * 8 + 4).as("t")))
    val docGroups = GraphCC.connectedComponents(edges, "s", "t")
      .filter(col("node") % 8 === 0)
      .select(expr("node div 8").as("doc_id"),
        col("component").as("group_id"))

    // --- the manifest ---
    docs.join(quality, "doc_id")
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
      .select(col("doc_id"), col("kept"), col("drop_reasons"), col("split"),
        col("group_id"), col("quality_score"), col("n_tokens"))
  }

  /** PERSISTED manifest: the capstone's output written once per sf dir —
    * the manifest IS the published curation artifact (that is the point
    * of publishing it), and downstream loader-side consumers pay a
    * FileScan. q_curation_mm_e2e stays the LIVE leg driving the full
    * composition per invocation. */
  private[graft] def manifestTablePath(s: SparkSession, dir: String): String =
    graft.sources.ScratchDirs.persistedParquet("mm_manifest_fix", dir)(
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation_mm_e2e" -> (curationMmE2e _),
    "q_curation_pack_e2e" ->
      ((s: SparkSession, d: String) => curationPackE2e(s, d)))

  /** Composition oracle: every stage is its own gate's closed form —
    * the per-modality CTE prefixes replayed in isolated subquery scopes
    * (no CTE-name collisions), per-modality transitive closures as
    * recursive CTEs, then the cross-modality closure over the same
    * encoded-node graph the Spark leg builds. An edit to any modality's
    * bar is an edit to this oracle too. */
  /** The capstone manifest's oracle SQL — also nested by the pack
    * oracle (the loader must see exactly the published manifest). */
  private val manifestOracle: String = {
      val tq = TextQueries.oracles("q_txt_quality")
      val tcc = GraphCC.oracles("q_dedup_cc")
      val im = MultimodalQueries.phashPairCtes
      val au = MultimodalQueries.audioFpCtes
      val vc = MultimodalQueries.videoClipCtes
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
         |gd AS MATERIALIZED (SELECT node // 8 AS doc_id, comp AS group_id FROM gcc
         |  WHERE node % 8 = 0),
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
         |  gd.group_id, rs.quality_score, rs.n_tokens
         |FROM rs
         |JOIN gd ON gd.doc_id = rs.doc_id
         |JOIN (SELECT doc_id,
         |    ${MixQueries.saltedDrawSql(mmSplitSalt, "group_id")} % 100
         |      AS bucket
         |  FROM gd) b
         |  ON b.doc_id = rs.doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_curation_mm_e2e" -> manifestOracle,
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
