package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.sources.TableIO.table

/** Event-stream operators over the `events` table, batch form. The same
  * transforms run under Structured Streaming (see graft.streaming) — the
  * reference itself is batch-only (SURVEY §2.9), so batch is the parity
  * surface and streaming is the scale-path extension.
  */
object EventQueries {

  /** The events table, normalized to the epoch-µs discipline regardless of
    * how the parquet writer encoded `ts` (nanos-as-long BIGINT, TIMESTAMP,
    * or TIMESTAMP_NTZ) — see `TableIO.withEpochMicros` for the dispatch.
    * `ts` is re-derived from `ts_us` so every downstream operator sees one
    * canonical (UTC, µs) TimestampType column. */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.TableIO.events(s, dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))

  /** Tumbling-window aggregation: events per (hour, type) with exact sums.
    * Streaming equivalent: `groupBy(window($"ts", "1 hour"), $"event_type")`
    * with a watermark; identical results on a closed input. */
  def eventsHourly(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast(DecimalType(28, 6))).cast(DoubleType).as("sum_value"))

  /** q_events_anomaly: robust volume-anomaly flags over the hourly series —
    * per event_type, the median and MAD (median absolute deviation) of
    * hourly event counts, each picked by EXACT integer rank selection
    * (row_number == (n+1) div 2, the same convention-free lower-median
    * pick as q_txt_quantiles — interpolating percentile functions differ
    * across engines), and an hour flagged when |count − median| > 4·MAD.
    * All quantities are exact integers, so both engines agree bit-for-bit
    * (a MAD of 0 — over half the hours identical — flags ANY deviation,
    * the standard hypersensitivity of MAD on discrete series; real
    * deployments fall back to a floor, which would be one `greatest`).
    * The monitoring pass that catches a broken feed or a bot flood from
    * volume alone. Scale shape: the corpus pays only the hourly groupBy
    * (map-side combined); both medians are windows over the HOURLY series
    * (rows = hours × types, tiny forever), sharing one event_type
    * exchange. */
  def eventsAnomaly(s: SparkSession, dir: String): DataFrame =
    anomalyFlags(eventsHourlyCounts(s, dir), madFloor = 0L)
      .select("hour_epoch", "event_type", "n_events", "median_events",
        "mad", "is_anomaly")

  /** The hourly (hour_epoch, event_type, n_events) series every anomaly
    * variant starts from — the one corpus-scale exchange. */
  private def eventsHourlyCounts(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Core of [[eventsAnomaly]] over any hourly series: exact-integer
    * median/MAD per event_type plus the `greatest(mad, madFloor)` MAD
    * floor — the standard guard against MAD's hypersensitivity on
    * discrete series (>half the hours identical ⇒ MAD = 0 ⇒ without a
    * floor EVERY deviating hour flags, however small). `madFloor = 0` is
    * a no-op (MAD ≥ 0), so the unfloored gate shares this code path. */
  private[graft] def anomalyFlags(hourly: DataFrame, madFloor: Long): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    hourly
      .withColumn("rn", row_number().over(
        byType.orderBy(col("n_events"), col("hour_epoch"))))
      .withColumn("cnt", count(lit(1)).over(byType))
      .withColumn("median_events",
        max(when(col("rn") === expr("(cnt + 1) div 2"), col("n_events")))
          .over(byType))
      .withColumn("adev", abs(col("n_events") - col("median_events")))
      .withColumn("rn2", row_number().over(
        byType.orderBy(col("adev"), col("hour_epoch"))))
      .withColumn("mad",
        max(when(col("rn2") === expr("(cnt + 1) div 2"), col("adev")))
          .over(byType))
      .withColumn("mad_eff", greatest(col("mad"), lit(madFloor)))
      .withColumn("is_anomaly", col("adev") > lit(4) * col("mad_eff"))
  }

  /** q_events_anomaly_floor: [[eventsAnomaly]] with the MAD floor LIVE and
    * a degenerate series in view. The real event feed never produces a
    * MAD-0 type at gate scale, so the hourly series is augmented with a
    * deterministic heartbeat type (`uptime_ping`: exactly 25 events every
    * observed hour, except 26 in the last hour — a broken-clock blip — and
    * 1000 in the first — a genuine flood). With >= 4 observed hours (the
    * events fixture spans hundreds) its MAD is 0 by construction:
    * unfloored, BOTH deviating hours flag (the blip is a false positive);
    * with `greatest(mad, 2)` only the 40σ-equivalent flood survives —
    * the floor's effect is hash-visible row by row. The heartbeat derives
    * from the observed hour set alone (min/max via an unpartitioned window
    * over the bounded hourly frame — hours × types rows, tiny forever, the
    * DSIR stats-window precedent), so the DuckDB oracle replays it
    * exactly; real types pay the floor too (their MAD ≥ 1 at this scale,
    * so `greatest` only ever raises a 0). */
  def eventsAnomalyFloor(s: SparkSession, dir: String, madFloor: Long = 2L): DataFrame = {
    val wAll = Window.partitionBy() // bounded: the distinct observed hours
    val heartbeat = eventsHourlyCounts(s, dir)
      .select(col("hour_epoch")).distinct()
      .withColumn("min_h", min("hour_epoch").over(wAll))
      .withColumn("max_h", max("hour_epoch").over(wAll))
      .select(col("hour_epoch"), lit("uptime_ping").as("event_type"),
        when(col("hour_epoch") === col("min_h"), 1000L)
          .when(col("hour_epoch") === col("max_h"), 26L)
          .otherwise(25L).as("n_events"))
    anomalyFlags(eventsHourlyCounts(s, dir).unionByName(heartbeat), madFloor)
      .select("hour_epoch", "event_type", "n_events", "median_events",
        "mad", "mad_eff", "is_anomaly")
  }

  /** Sessionization: a new session starts after a >30-minute inactivity gap;
    * session ids via running sum of gap flags. One shuffle on user_id; at
    * 100 TB this is the standard sessionize shape (skew-safe because the
    * per-user window is processed within a partition after hash exchange). */
  def eventsSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("us", col("ts_us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("session_seq"))
  }

  /** Semi-structured extraction from the JSON `props` column. */
  def eventsJsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"))

  /** Ordered funnel per user: earliest view, earliest click STRICTLY AFTER
    * that view, earliest purchase strictly after that click — the ordered
    * progression semantics (a click before the first view doesn't count)
    * that a plain per-type min would get wrong. Three layered conditional
    * window-mins share ONE user_id partitioning, so Catalyst plans a
    * single exchange with three Window passes, and the per-user collapse
    * reuses the same partitioning — one shuffle total, the sessionize
    * shape. Timestamps emit as epoch-µs bigints (ns/µs dtype drift
    * otherwise — see eventsHourly). */
  def eventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val staged = events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .withColumn("fv",
        min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("fc",
        min(when(col("event_type") === "click" && col("ts_us") > col("fv"),
          col("ts_us"))).over(w))
      .withColumn("fp",
        min(when(col("event_type") === "purchase" && col("ts_us") > col("fc"),
          col("ts_us"))).over(w))
    staged.groupBy(col("user_id"))
      .agg(max(col("fv")).as("first_view_us"),
        max(col("fc")).as("first_click_us"),
        max(col("fp")).as("first_purchase_us"))
      .withColumn("stage",
        when(col("first_purchase_us").isNotNull, 3)
          .when(col("first_click_us").isNotNull, 2)
          .when(col("first_view_us").isNotNull, 1)
          .otherwise(0))
  }

  /** As-of attribution: each purchase joined to the most recent view AT OR
    * BEFORE it for the same user — the "as-of join" operator class Spark
    * has no built-in for. The scalable shape is NOT a range/theta join
    * (quadratic in events-per-user): sort each user's merged event stream
    * once and carry the running max view-time forward — a single user_id
    * exchange + one window pass, linear in events, regardless of how many
    * views precede each purchase. Rows with no preceding view keep a null
    * attribution (the observable "direct purchase" case). */
  def eventsAttribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"))
      .withColumn("last_view_us",
        max(when(col("event_type") === "view", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts_us").as("purchase_us"), col("last_view_us"),
        (col("ts_us") - col("last_view_us")).as("gap_us"))
  }

  /** Day-over-day retention: per day, the distinct active users (DAU) and
    * how many of them return the NEXT day. The (day, user) activity set is
    * distinct-reduced FIRST — one shuffle with map-side partials collapses
    * raw event volume to at most days×users rows — and then LAZILY
    * checkpointed: the self-join's two references (and the broadcast
    * build, when the reduced set is small enough to broadcast) share one
    * computation of it, so raw events are scanned and shuffled exactly
    * once. Day emits as an ISO string (DATE dtypes drift between
    * engines). */
  def eventsRetention(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
      .localCheckpoint(eager = false)
    daily.alias("a")
      .join(daily.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.d") === date_add(col("a.d"), 1), "left")
      .groupBy(col("a.d").as("d"))
      .agg(countDistinct(col("a.user_id")).as("dau"),
        countDistinct(when(col("b.d").isNotNull, col("a.user_id")))
          .as("retained"))
      .select(col("d").cast(StringType).as("day"), col("dau"), col("retained"),
        (col("retained").cast(DoubleType) / col("dau").cast(DoubleType))
          .as("retention_rate"))
  }

  /** First-order behavior transition matrix: counts of (event_type →
    * next event_type) per user timeline — the Markov-chain input for
    * behavior modeling and bot detection. One user_id exchange for the
    * lead() window, then a tiny (type, type) aggregation that combines
    * map-side. */
  def eventsTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Rolling 7-day active users per day. The raw stream is first
    * distinct-reduced to (day, user) — at most days×users rows — and each
    * activity day then fans out to the `windowDays` report days it
    * contributes to (offset explode), because `count DISTINCT over a
    * range window` is not an algebraic aggregate any engine can partial.
    * The fan-out factor is the window length, applied AFTER the
    * reduction, so cost is windowDays × (days×users), independent of raw
    * event volume. */
  def eventsWau(s: SparkSession, dir: String, windowDays: Int = 7): DataFrame =
    events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
      .withColumn("off", explode(sequence(lit(0), lit(windowDays - 1))))
      .select(expr("date_add(d, off)").cast(StringType).as("day"),
        col("user_id"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))

  /** Rolling 1-hour per-user event count — a RANGE frame over epoch µs
    * (`rangeBetween` on the numeric time), the time-series smoothing
    * window the row-count frames (W1-W7) cannot express: each row's frame
    * is every same-user event within the trailing hour, however many rows
    * that is. One shuffle on user_id; the frame scan is linear per
    * partition (sliding lower bound advances monotonically). At 100 TB
    * the user partitioning carries it — no per-row re-sort, no self-join
    * (the naive equivalent is events ⨝ events per user, quadratic). */
  def eventsRolling(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, Window.currentRow)
    events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"))
      .withColumn("n_trailing_1h", count(lit(1)).over(w))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_rolling" -> (eventsRolling _),
    "q_events_hourly" -> (eventsHourly _),
    "q_events_anomaly" -> (eventsAnomaly _),
    "q_events_anomaly_floor" ->
      ((s: SparkSession, d: String) => eventsAnomalyFloor(s, d)),
    "q_events_sessionize" -> (eventsSessionize _),
    "q_events_json_extract" -> (eventsJsonExtract _),
    "q_events_funnel" -> (eventsFunnel _),
    "q_events_attribution" -> (eventsAttribution _),
    "q_events_retention" -> (eventsRetention _),
    "q_events_transitions" -> (eventsTransitions _),
    "q_events_wau" -> ((s: SparkSession, d: String) => eventsWau(s, d)))

  val oracles: Map[String, String] = Map(
    "q_events_rolling" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |    AS n_trailing_1h
        |FROM events""".stripMargin,
    "q_events_hourly" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_events_anomaly_floor" ->
      """WITH h0 AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |hrs AS (SELECT DISTINCT hour_epoch,
        |    MIN(hour_epoch) OVER () AS min_h, MAX(hour_epoch) OVER () AS max_h
        |  FROM h0),
        |h AS (SELECT * FROM h0
        |  UNION ALL
        |  SELECT hour_epoch, 'uptime_ping' AS event_type,
        |    CASE WHEN hour_epoch = min_h THEN 1000
        |         WHEN hour_epoch = max_h THEN 26 ELSE 25 END AS n_events
        |  FROM hrs),
        |r1 AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY n_events, hour_epoch) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt FROM h),
        |m1 AS (SELECT *,
        |    MAX(CASE WHEN rn = (cnt + 1) // 2 THEN n_events END)
        |      OVER (PARTITION BY event_type) AS median_events FROM r1),
        |a1 AS (SELECT *, ABS(n_events - median_events) AS adev FROM m1),
        |r2 AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY adev, hour_epoch) AS rn2 FROM a1),
        |m2 AS (SELECT *,
        |    MAX(CASE WHEN rn2 = (cnt + 1) // 2 THEN adev END)
        |      OVER (PARTITION BY event_type) AS mad FROM r2)
        |SELECT hour_epoch, event_type, n_events, median_events, mad,
        |  GREATEST(mad, 2) AS mad_eff,
        |  (adev > 4 * GREATEST(mad, 2)) AS is_anomaly FROM m2""".stripMargin,
    "q_events_anomaly" ->
      """WITH h AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |r1 AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY n_events, hour_epoch) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt FROM h),
        |m1 AS (SELECT *,
        |    MAX(CASE WHEN rn = (cnt + 1) // 2 THEN n_events END)
        |      OVER (PARTITION BY event_type) AS median_events FROM r1),
        |a1 AS (SELECT *, ABS(n_events - median_events) AS adev FROM m1),
        |r2 AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY adev, hour_epoch) AS rn2 FROM a1),
        |m2 AS (SELECT *,
        |    MAX(CASE WHEN rn2 = (cnt + 1) // 2 THEN adev END)
        |      OVER (PARTITION BY event_type) AS mad FROM r2)
        |SELECT hour_epoch, event_type, n_events, median_events, mad,
        |  (adev > 4 * mad) AS is_anomaly FROM m2""".stripMargin,
    "q_events_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM x)
        |SELECT user_id, event_id,
        |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM y""".stripMargin,
    "q_events_json_extract" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        |FROM events""".stripMargin,
    "q_events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
        |        OVER (PARTITION BY user_id) AS fv FROM e),
        |c AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND us > fv THEN us END)
        |        OVER (PARTITION BY user_id) AS fc FROM v),
        |p AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > fc THEN us END)
        |        OVER (PARTITION BY user_id) AS fp FROM c)
        |SELECT user_id,
        |  MAX(fv) AS first_view_us,
        |  MAX(fc) AS first_click_us,
        |  MAX(fp) AS first_purchase_us,
        |  CASE WHEN MAX(fp) IS NOT NULL THEN 3
        |       WHEN MAX(fc) IS NOT NULL THEN 2
        |       WHEN MAX(fv) IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM p GROUP BY user_id""".stripMargin,
    "q_events_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |m AS (SELECT *,
        |    MAX(CASE WHEN event_type = 'view' THEN us END) OVER (
        |      PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_us
        |  FROM e)
        |SELECT event_id, user_id, us AS purchase_us, last_view_us,
        |  us - last_view_us AS gap_us
        |FROM m WHERE event_type = 'purchase'""".stripMargin,
    "q_events_retention" ->
      """WITH daily AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |j AS (
        |  SELECT a.d, a.user_id, b.user_id AS nxt
        |  FROM daily a LEFT JOIN daily b
        |    ON a.user_id = b.user_id AND b.d = a.d + 1)
        |SELECT CAST(d AS VARCHAR) AS day,
        |  COUNT(DISTINCT user_id) AS dau,
        |  COUNT(DISTINCT CASE WHEN nxt IS NOT NULL THEN user_id END) AS retained,
        |  CAST(COUNT(DISTINCT CASE WHEN nxt IS NOT NULL THEN user_id END) AS DOUBLE)
        |    / CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS retention_rate
        |FROM j GROUP BY d""".stripMargin,
    "q_events_transitions" ->
      """WITH x AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) ASC, event_id ASC) AS next_type
        |  FROM events)
        |SELECT event_type, next_type, COUNT(*) AS n
        |FROM x WHERE next_type IS NOT NULL
        |GROUP BY event_type, next_type""".stripMargin,
    "q_events_wau" ->
      """WITH daily AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |x AS (
        |  SELECT d + CAST(o.o AS INTEGER) AS day, user_id
        |  FROM daily CROSS JOIN (SELECT unnest(range(0, 7)) AS o) o)
        |SELECT CAST(day AS VARCHAR) AS day, COUNT(DISTINCT user_id) AS wau
        |FROM x GROUP BY day""".stripMargin)
}
