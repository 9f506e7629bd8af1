package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.functions.ColumnLib
import graft.schema.SchemaLoader
import graft.sources.TableIO.table

/** Correctness-gate queries covering the relational operator inventory of
  * SURVEY §2 (scans/unions, projections/filters, broadcast dim joins,
  * windows, top-k, merge semantics), each expressed over the driver's TPC-H
  * style testdata with a DuckDB oracle.
  *
  * Hash-stability rules used throughout (the driver hash-compares values):
  *  - monetary aggregates go through exact decimal arithmetic
  *    (`cast(... as decimal)` → sum → `cast(double)`), never float sums,
  *    so results are order-independent and bit-identical to DuckDB;
  *  - every window/top-k ordering ends in a unique key so ties cannot
  *    reorder results between engines;
  *  - no `round()` on raw doubles (Spark rounds via shortest-decimal-string,
  *    DuckDB via scaled-integer — they disagree near .5 boundaries).
  */
object RelationalQueries {

  /** Exact, order-independent sum of a 2-decimal monetary double column. */
  private def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType)

  // S1 + U1: multi-scan positional union with per-scan pushed filter
  // (reference: mls_listings_curated.py:71-77).
  def s1ScanUnion(s: SparkSession, dir: String): DataFrame = {
    val a = table(s, dir, "lineitem").filter("l_shipdate < '1997-01-01'")
    val b = table(s, dir, "lineitem").filter("l_shipdate >= '1997-01-01'")
    a.unionAll(b).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast(LongType).as("qty"))
  }

  // P1: column-prefix projection (reference: mls_listings_transform.py:58-62).
  def p1PrefixProject(s: SparkSession, dir: String): DataFrame =
    ColumnLib.prefixColumns(table(s, dir, "nation"), "listings_")

  // P6 + P7: SQL-string filter + expression filters
  // (reference: mls_listings_curated.py:73,75).
  def p6Filters(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .filter("l_shipdate between '1995-06-01' and '1996-06-01'")
      .filter(col("l_returnflag").isin("A", "R") && col("l_quantity") > 25)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))

  // P8 + §2.8: validation flags, reasons concat, reject split
  // (reference: mls_listings_transform.py:104-128).
  def p8ValidateSplit(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
    val flagged = o
      .withColumn("_f_price", (col("o_totalprice") > 400000).cast(IntegerType))
      .withColumn("_f_stale", (col("o_orderdate") < lit("1996-01-01")).cast(IntegerType))
      .withColumn("_f_pri", col("o_orderpriority").contains("URGENT").cast(IntegerType))
      .withColumn("_reject_flags",
        ColumnLib.sumColumns(Seq(col("_f_price"), col("_f_stale"), col("_f_pri"))))
      .withColumn("_reject_reasons", concat_ws("|",
        when(col("_f_price") === 1, "price_too_high"),
        when(col("_f_stale") === 1, "stale_order"),
        when(col("_f_pri") === 1, "urgent_priority")))
    flagged.filter(col("_reject_flags") > 0)
      .select(col("o_orderkey"), col("_reject_flags").as("reject_flags"),
        col("_reject_reasons").as("reject_reasons"))
  }

  // P9: distinct / dropDuplicates (reference: mls_listings_transform.py:80,502).
  def p9Distinct(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer").select("c_nationkey", "c_mktsegment").distinct()

  // J1/J3-style broadcast dim joins + exact grouped aggregation
  // (reference: mls_listings_transform.py:65-73).
  def j1BroadcastDims(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
    val c = table(s, dir, "customer")
    val n = table(s, dir, "nation")
    val r = table(s, dir, "region")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
      .groupBy(col("r_name"), col("n_name"))
      .agg(moneySum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  // J2: disjunctive-theta broadcast left join (plans as BroadcastNestedLoop,
  // fine at dim scale — reference: mls_listings_transform.py:66,71).
  def j2DisjunctiveJoin(s: SparkSession, dir: String): DataFrame = {
    val n = table(s, dir, "nation")
    val r = table(s, dir, "region")
    n.join(broadcast(r),
        col("n_regionkey") === col("r_regionkey") || col("n_name") === col("r_name"),
        "left")
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
  }

  // J5/J6: repeated aliased joins to one dim, results coalesced
  // (reference: mls_listings_transform.py:365-388).
  def j5CoalesceLookup(s: SparkSession, dir: String): DataFrame = {
    val sup = table(s, dir, "supplier")
    val n1 = table(s, dir, "nation").filter(col("n_nationkey") < 10)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("n1_name"))
    val n2 = table(s, dir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("n2_name"))
    sup.join(broadcast(n1), col("s_nationkey") === col("n1_key"), "left")
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"), "left")
      .select(col("s_suppkey"),
        coalesce(col("n1_name"), col("n2_name")).as("nation_name"),
        col("n1_name").isNotNull.as("from_primary"))
  }

  // J11: enriched-subset inner join back to the main set
  // (reference: mls_listings_curated.py:238-242).
  def j11InnerAttach(s: SparkSession, dir: String): DataFrame = {
    val enriched = table(s, dir, "customer").filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    table(s, dir, "orders")
      .join(enriched, col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_name"), col("c_acctbal"))
  }

  // U2 + W3: union of tagged snapshots + row_number precedence on desc(_from)
  // ('new' > 'curated' lexicographically — reference:
  // mls_listings_curated.py:132-135,258-271).
  def u2UnionPrecedence(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
    val curated = o.filter(col("o_orderdate") >= lit("1996-01-01"))
      .withColumn("_from", lit("curated"))
    val fresh = o.filter(col("o_orderdate") >= lit("1997-01-01"))
      .withColumn("_from", lit("new"))
    val w = Window.partitionBy(col("o_orderkey")).orderBy(col("_from").desc)
    curated.union(fresh)
      .withColumn("_rownum", row_number().over(w))
      .filter(col("_rownum") === 1)
      .select(col("o_orderkey"), col("_from").as("src"), col("o_totalprice"))
  }

  // W1: latest-record-wins window dedup (reference: mls_listings_curated.py:142-147).
  def w1LatestWins(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    table(s, dir, "orders")
      .withColumn("_rownum", row_number().over(w))
      .filter(col("_rownum") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
  }

  // W4 + A3: min/max aggregates over an unbounded partition window
  // (reference: mls_listings_curated.py:144-159).
  def w4MinMaxWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    table(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      min(col("o_orderdate")).over(w).as("first_order_dt"),
      max(col("o_totalprice")).over(w).as("max_price"),
      count(lit(1)).over(w).as("n_orders"))
  }

  // W6: lead() previous-version values + null-safe-equality change flags
  // (reference: mls_listings_hist_curated.py:139-156).
  def w6LeadChanged(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    table(s, dir, "orders")
      .withColumn("prev_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("price_changed", !(col("o_totalprice") <=> col("prev_price")))
      .select(col("o_custkey"), col("o_orderkey"), col("prev_price"),
        col("price_changed"))
  }

  // O1: global prioritized top-k with explicit null placement
  // (reference: mls_listings_curated.py:224-227) → TakeOrderedAndProject.
  def o1TopKNulls(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .withColumn("pri", when(col("o_orderpriority") === "3-MEDIUM", lit(null).cast(StringType))
        .otherwise(col("o_orderpriority")))
      .orderBy(col("pri").desc_nulls_first, col("o_totalprice").asc, col("o_orderkey").asc)
      .limit(50)
      .select(col("o_orderkey"), col("pri"), col("o_totalprice"))

  // O1-scale: per-key top-k via two-phase salted ranking (Salting.topKPerKey)
  // — the 100 TB-safe form of the windowed top-k, oracle-checked to be
  // identical to the plain window.
  def o1SaltedTopK(s: SparkSession, dir: String): DataFrame =
    Salting.topKPerKey(table(s, dir, "orders"), Seq("o_custkey"),
      Seq(col("o_orderdate").desc, col("o_orderkey").desc), k = 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))

  /** q_w1_salted_skew: the latest-wins window under DELIBERATE key skew —
    * ~80% of lineitem rows collapse onto one 'HOT' key, the hot-key shape
    * that swamps a single task in the plain W1 full shuffle at 100 TB.
    * [[Salting.topKPerKey]]'s two-phase plan (per-input-partition local
    * rank prunes to ≤1 row per sub-group, then the global rank sees ≤
    * nPartitions rows per key) must produce EXACTLY the plain window's
    * answer — the oracle replays the unsalted row_number, so the gate is
    * the identity proof. Ordering is total (shipdate, orderkey,
    * linenumber), which two-phase ranking requires. */
  def w1SaltedSkew(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem").select(
      when(pmod(col("l_orderkey"), lit(10)) < 8, lit("HOT"))
        .otherwise(concat(lit("k"),
          pmod(col("l_orderkey"), lit(50)).cast(StringType))).as("skew_key"),
      col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    Salting.topKPerKey(li, Seq("skew_key"),
      Seq(col("l_shipdate").desc, col("l_orderkey").desc,
        col("l_linenumber").desc), k = 1)
      .select(col("skew_key"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"))
  }

  /** q_sql_recursive_cte: WITH RECURSIVE (Spark 4's recursive CTE —
    * engine-completeness next to rollup/cube/pivot): the full ancestor
    * closure of a synthesized parent-chain hierarchy (parent(k)=⌊k/2⌋),
    * self-terminating when the chain reaches the root. Scale note: each
    * iteration is one self-equi-join Catalyst plans like any other;
    * total work ∝ closure size (n·log n here) — the same economics as
    * GraphCC's logarithmic closure, expressed in pure SQL. Integer division
    * spelled FLOOR(x/2.0) because a plain BIGINT cast of a double rounds
    * half-even in DuckDB but truncates in Spark. */
  def sqlRecursiveCte(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "customer").selectExpr(
        "CAST(c_custkey AS BIGINT) AS k",
        "CAST(FLOOR(c_custkey / 2.0) AS BIGINT) AS parent")
      .filter(col("k") > 1 && col("k") <= 1000)
      .createOrReplaceTempView("graft_edges")
    s.sql(
      """WITH RECURSIVE anc(node, ancestor, depth) AS (
        |  SELECT k, parent, 1 FROM graft_edges
        |  UNION ALL
        |  SELECT a.node, e.parent, a.depth + 1
        |  FROM anc a JOIN graft_edges e ON a.ancestor = e.k)
        |SELECT node, ancestor, CAST(depth AS INTEGER) AS depth
        |FROM anc""".stripMargin)
  }

  /** q_sql_lateral: LATERAL correlated subquery — per-driving-row
    * subqueries with their own ORDER BY/LIMIT, the SQL spelling of
    * per-key top-n (Catalyst decorrelates it into the same join+window
    * shape the DataFrame form plans, so there is no hidden nested loop).
    * Identical SQL runs on both engines. */
  def sqlLateral(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "region").createOrReplaceTempView("graft_region")
    table(s, dir, "nation").createOrReplaceTempView("graft_nation")
    s.sql(
      """SELECT r.r_name AS region, t.n_name AS nation
        |FROM graft_region r, LATERAL (
        |  SELECT n_name FROM graft_nation n
        |  WHERE n.n_regionkey = r.r_regionkey
        |  ORDER BY n_name LIMIT 2) t""".stripMargin)
  }

  /** q_agg_unpivot: SQL-standard UNPIVOT (the inverse of q_agg_pivot) —
    * wide per-group metrics melted to (group, metric, value) rows, the
    * shape metric stores and long-format reporting ingest. One grouped
    * aggregation then a zero-shuffle expand projection. */
  def aggUnpivot(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem")
    s.sql(
      """SELECT l_returnflag, metric, val FROM (
        |  SELECT l_returnflag,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |         COUNT(*) AS n_rows
        |  FROM graft_lineitem GROUP BY l_returnflag)
        |UNPIVOT (val FOR metric IN (sum_qty, n_rows))""".stripMargin)
  }

  // A-extension: grouped aggregation (TPC-H Q1 shape) with exact decimal money.
  def aggPricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    val ep = col("l_extendedprice").cast(DecimalType(18, 2))
    val disc = col("l_discount").cast(DecimalType(18, 2))
    val tax = col("l_tax").cast(DecimalType(18, 2))
    val one = lit(1).cast(DecimalType(18, 2))
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(LongType)).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(ep * (one - disc)).cast(DoubleType).as("sum_disc_price"),
        sum(ep * (one - disc) * (one + tax)).cast(DoubleType).as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  // Engine-completeness beyond the reference's surface: multi-level
  // aggregation (rollup), pivot, semi/anti joins, intersect/except — a user
  // switching from any SQL workload gets these for free from Catalyst.
  def aggRollup(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(LongType)).as("sum_qty"))

  def aggCube(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(LongType)).as("sum_qty"))

  /** GROUPING SETS with grouping_id disambiguation — the general form
    * cube/rollup specialize; one expand+aggregate pass, partials combine
    * map-side exactly like a plain groupBy (the expand multiplies rows by
    * the set count BEFORE the shuffle, the documented trade of every
    * grouping-sets engine). */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(col("l_quantity").cast(LongType)).as("sum_qty"))

  /** Analytic-window gallery over a deterministic (value, key) order:
    * ntile bucketing, percent_rank, cume_dist, nth_value — the remaining
    * rank-family functions W1-W6 do not cover. One window shuffle on the
    * partition key; percent_rank/cume_dist are integer-ratio divisions,
    * bit-portable across engines (IEEE-exact, no transcendentals). */
  def windowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    table(s, dir, "orders").select(
      col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
      ntile(8).over(w).as("bucket8"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      nth_value(col("o_orderkey"), 3).over(w).as("third_k"))
  }

  def aggPivot(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))

  def setSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders").filter(col("o_totalprice") > 300000)
    val withBig = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_big_order").as("segment"))
    val withoutBig = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_big_order").as("segment"))
    withBig.unionAll(withoutBig)
  }

  def setIntersectExcept(s: SparkSession, dir: String): DataFrame = {
    val early = table(s, dir, "orders").filter(col("o_orderdate") < "1996-01-01")
      .select(col("o_custkey"))
    val late = table(s, dir, "orders").filter(col("o_orderdate") >= "1997-01-01")
      .select(col("o_custkey"))
    early.intersect(late).withColumn("membership", lit("both_eras"))
      .unionAll(early.except(late).withColumn("membership", lit("early_only")))
  }

  // §2.8 scalar-function gallery: strings.
  def fStrings(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      lower(col("p_type")).as("type_lower"),
      length(col("p_name")).as("name_len"),
      substring(col("p_name"), 1, 8).as("name_head"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_type"), "[aeiou]", "").as("type_novowel"),
      regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
      (instr(col("p_type"), "BRASS") > 0).as("has_brass"),
      expr("left(p_brand, 5)").as("brand_head"),
      expr("replace(p_name, ' ', '_')").as("name_snake"),
      md5(col("p_name")).as("name_md5"),
      size(split(col("p_name"), " ")).as("name_words"),
      ColumnLib.cleanPhoneNumber(concat(col("p_partkey").cast(StringType),
        lit("-555-000111"))).as("fake_phone"),
      ColumnLib.changeBlankToNull(trim(col("p_brand"))).as("brand_nn"),
      ColumnLib.regexpLike(col("p_brand"), "Brand#[0-9]{2}").as("brand_shape_ok"))

  // §2.8 scalar-function gallery: dates/timestamps.
  def fDatetime(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
    val d = col("o_orderdate").cast(DateType)
    // Date-typed outputs are rendered as ISO strings: DuckDB DATE surfaces as
    // a midnight timestamp through pandas/pyarrow, which would hash-mismatch
    // a true date value even when both engines agree.
    o.select(
      col("o_orderkey"),
      date_format(d, "yyyy-MM-dd").as("order_date"),
      year(d).as("order_year"),
      month(d).as("order_month"),
      dayofmonth(d).as("order_day"),
      date_format(date_add(d, 180), "yyyy-MM-dd").as("plus_180"),
      date_format(last_day(d), "yyyy-MM-dd").as("month_end"),
      date_format(trunc(d, "MM"), "yyyy-MM-dd").as("month_start"),
      datediff(lit("1999-01-01").cast(DateType), d).as("days_to_1999"),
      unix_timestamp(col("o_orderdate")).as("epoch_sec"))
  }

  // Array / higher-order-function gallery over the embedding column
  // (size, lambda filter, element_at, array_min/max, array_sort) — the
  // HOF surface a vector-bearing pipeline leans on. All codegen'd native
  // expressions, no UDFs; artifacts are structural (counts, raw element
  // pass-throughs, comparisons) so floats cross engines byte-exact with
  // no arithmetic-reassociation risk.
  def fArrays(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).as("n_dims"),
      size(filter(col("embedding"), x => x > lit(0f))).as("n_pos"),
      element_at(col("embedding"), 1).as("first_v"),
      array_max(col("embedding")).as("max_v"),
      array_min(col("embedding")).as("min_v"),
      element_at(array_sort(col("embedding")), 3).as("third_smallest"))

  // §2.8 scalar-function gallery: conditionals / null logic
  // (nested when/otherwise decode, coalesce, null-safe eq, between, isin).
  def fConditional(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
    o.select(
      col("o_orderkey"),
      when(col("o_orderpriority") === "1-URGENT", 1)
        .when(col("o_orderpriority") === "2-HIGH", 2)
        .when(col("o_orderpriority") === "3-MEDIUM", 3)
        .when(col("o_orderpriority") === "4-NOT SPECIFIED", 4)
        .otherwise(5).as("pri_rank"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_decoded"),
      (col("o_orderstatus") <=> lit("F")).as("is_final"),
      col("o_totalprice").between(50000, 100000).as("mid_price"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("is_hot"),
      ColumnLib.checkValidValue(col("o_orderstatus"), Seq("F", "O", "P"),
        nullAllowed = false).as("status_valid"))
  }

  // S5 merge semantics, expressed relationally (same resolver the managed
  // table layer uses — reference MERGE: mls_listings_curated.py:329-353).
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val target = o.filter(col("o_orderkey") % 3 =!= 0)
    val source = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
    Merge.mergeFrames(target, source, Seq("o_orderkey"))
  }

  // S13: externally-declared JSON schema → StructType → projection
  // (reference: mls_listings_schema.json format + get_schema).
  def s13SchemaProject(s: SparkSession, dir: String): DataFrame = {
    val schemaJson =
      """{"type":"struct","fields":[
        |{"name":"l_orderkey","type":"long","nullable":true,"metadata":{}},
        |{"name":"l_shipdate","type":"timestamp","nullable":true,"metadata":{}},
        |{"name":"l_returnflag","type":"string","nullable":true,"metadata":{}}]}""".stripMargin
    val schema = SchemaLoader.fromJsonString(schemaJson)
    ColumnLib.projectToSchema(table(s, dir, "lineitem"), schema)
  }

  // S8: JSON-lines serialization of whole rows
  // (reference: mls_listings_curated.py:293-308).
  def s8JsonLines(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "nation").select(
      to_json(struct(col("n_nationkey"), col("n_name"))).as("json_row"))

  // S9: temp-view registration + SQL entry point (the reference feeds its
  // MERGE through createOrReplaceTempView + spark.sql —
  // mls_listings_curated.py:329-331).
  def s9TempViewSql(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "supplier").createOrReplaceTempView("graft_supplier")
    table(s, dir, "nation").createOrReplaceTempView("graft_nation")
    s.sql(
      """SELECT n.n_name AS nation_name, COUNT(*) AS n_suppliers,
        |       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS sum_acctbal
        |FROM graft_supplier s
        |JOIN graft_nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin)
  }

  /** q_star_join: the canonical 5-table star — fact (lineitem) ⋈ orders,
    * then the customer→nation→region dimension chain, region-filtered and
    * rolled up by nation × order year. The point is what CATALYST does
    * with it when the plan is declarative: the region filter prunes
    * before the joins, dims broadcast (AQE picks up customer from runtime
    * stats at gate scale; at 100 TB it shuffles and everything smaller
    * still broadcasts), and only the fact⋈orders join pays a real
    * exchange. Revenue is the double product (IEEE-exact cross-engine)
    * summed as decimal (associative — partition-order-proof). */
  def starJoin(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin("ASIA", "EUROPE"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("order_year"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_star_join" -> (starJoin _),
    "q_s1_scan_union" -> (s1ScanUnion _),
    "q_p1_prefix_project" -> (p1PrefixProject _),
    "q_p6_filters" -> (p6Filters _),
    "q_p8_validate_split" -> (p8ValidateSplit _),
    "q_p9_distinct" -> (p9Distinct _),
    "q_j1_broadcast_dims" -> (j1BroadcastDims _),
    "q_j2_disjunctive_join" -> (j2DisjunctiveJoin _),
    "q_j5_coalesce_lookup" -> (j5CoalesceLookup _),
    "q_j11_inner_attach" -> (j11InnerAttach _),
    "q_u2_union_precedence" -> (u2UnionPrecedence _),
    "q_w1_latest_wins" -> (w1LatestWins _),
    "q_w4_minmax_window" -> (w4MinMaxWindow _),
    "q_w6_lead_changed" -> (w6LeadChanged _),
    "q_o1_topk_nulls" -> (o1TopKNulls _),
    "q_o1_salted_topk" -> (o1SaltedTopK _),
    "q_w1_salted_skew" -> (w1SaltedSkew _),
    "q_sql_recursive_cte" -> (sqlRecursiveCte _),
    "q_sql_lateral" -> (sqlLateral _),
    "q_agg_unpivot" -> (aggUnpivot _),
    "q_agg_pricing_summary" -> (aggPricingSummary _),
    "q_agg_rollup" -> (aggRollup _),
    "q_agg_cube" -> (aggCube _),
    "q_agg_grouping_sets" -> (aggGroupingSets _),
    "q_w7_analytics" -> (windowAnalytics _),
    "q_agg_pivot" -> (aggPivot _),
    "q_set_semi_anti" -> (setSemiAnti _),
    "q_set_intersect_except" -> (setIntersectExcept _),
    "q_f_strings" -> (fStrings _),
    "q_f_datetime" -> (fDatetime _),
    "q_f_conditional" -> (fConditional _),
    "q_f_arrays" -> (fArrays _),
    "q_merge_upsert" -> (mergeUpsert _),
    "q_s13_schema_project" -> (s13SchemaProject _),
    "q_s8_json_lines" -> (s8JsonLines _),
    "q_s9_temp_view_sql" -> (s9TempViewSql _))

  val oracles: Map[String, String] = Map(
    "q_star_join" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(28, 6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA', 'EUROPE')
        |GROUP BY n_name, year(o_orderdate)""".stripMargin,
    "q_s1_scan_union" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem WHERE l_shipdate < '1997-01-01'
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem WHERE l_shipdate >= '1997-01-01'""".stripMargin,
    "q_p1_prefix_project" ->
      """SELECT n_nationkey AS listings_n_nationkey, n_name AS listings_n_name,
        |n_regionkey AS listings_n_regionkey FROM nation""".stripMargin,
    "q_p6_filters" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_shipdate BETWEEN '1995-06-01' AND '1996-06-01'
        |AND l_returnflag IN ('A','R') AND l_quantity > 25""".stripMargin,
    "q_p8_validate_split" ->
      """WITH flagged AS (
        |  SELECT o_orderkey,
        |    CAST(o_totalprice > 400000 AS INTEGER) AS f_price,
        |    CAST(o_orderdate < '1996-01-01' AS INTEGER) AS f_stale,
        |    CAST(o_orderpriority LIKE '%URGENT%' AS INTEGER) AS f_pri
        |  FROM orders)
        |SELECT o_orderkey, f_price + f_stale + f_pri AS reject_flags,
        |  concat_ws('|',
        |    CASE WHEN f_price = 1 THEN 'price_too_high' END,
        |    CASE WHEN f_stale = 1 THEN 'stale_order' END,
        |    CASE WHEN f_pri = 1 THEN 'urgent_priority' END) AS reject_reasons
        |FROM flagged WHERE f_price + f_stale + f_pri > 0""".stripMargin,
    "q_p9_distinct" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "q_j1_broadcast_dims" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_j2_disjunctive_join" ->
      """SELECT n_nationkey, n_name, r_name FROM nation
        |LEFT JOIN region ON n_regionkey = r_regionkey OR n_name = r_name""".stripMargin,
    "q_j5_coalesce_lookup" ->
      """SELECT s_suppkey,
        |  COALESCE(n1.n1_name, n2.n_name) AS nation_name,
        |  n1.n1_name IS NOT NULL AS from_primary
        |FROM supplier
        |LEFT JOIN (SELECT n_nationkey AS n1_key, n_name AS n1_name FROM nation
        |           WHERE n_nationkey < 10) n1 ON s_nationkey = n1.n1_key
        |LEFT JOIN nation n2 ON s_nationkey = n2.n_nationkey""".stripMargin,
    "q_j11_inner_attach" ->
      """SELECT o_orderkey, c_name, c_acctbal FROM orders
        |JOIN (SELECT c_custkey, c_name, c_acctbal FROM customer
        |      WHERE c_acctbal > 9000) c ON o_custkey = c_custkey""".stripMargin,
    "q_u2_union_precedence" ->
      """WITH unioned AS (
        |  SELECT o_orderkey, 'curated' AS src, o_totalprice, o_orderdate
        |  FROM orders WHERE o_orderdate >= '1996-01-01'
        |  UNION ALL
        |  SELECT o_orderkey, 'new' AS src, o_totalprice, o_orderdate
        |  FROM orders WHERE o_orderdate >= '1997-01-01'),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY src DESC) AS rn
        |  FROM unioned)
        |SELECT o_orderkey, src, o_totalprice FROM ranked WHERE rn = 1""".stripMargin,
    "q_w1_latest_wins" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "q_w4_minmax_window" ->
      """SELECT o_orderkey, o_custkey,
        |  min(o_orderdate) OVER (PARTITION BY o_custkey) AS first_order_dt,
        |  max(o_totalprice) OVER (PARTITION BY o_custkey) AS max_price,
        |  count(*) OVER (PARTITION BY o_custkey) AS n_orders
        |FROM orders""".stripMargin,
    "q_w6_lead_changed" ->
      """SELECT o_custkey, o_orderkey, prev_price,
        |  o_totalprice IS DISTINCT FROM prev_price AS price_changed
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    lead(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS prev_price
        |  FROM orders)""".stripMargin,
    "q_o1_topk_nulls" ->
      """SELECT o_orderkey, pri, o_totalprice FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderpriority = '3-MEDIUM' THEN NULL
        |         ELSE o_orderpriority END AS pri,
        |    o_totalprice
        |  FROM orders)
        |ORDER BY pri DESC NULLS FIRST, o_totalprice ASC, o_orderkey ASC
        |LIMIT 50""".stripMargin,
    "q_o1_salted_topk" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn <= 2""".stripMargin,
    "q_sql_lateral" ->
      """SELECT r.r_name AS region, t.n_name AS nation
        |FROM region r, LATERAL (
        |  SELECT n_name FROM nation n
        |  WHERE n.n_regionkey = r.r_regionkey
        |  ORDER BY n_name LIMIT 2) t""".stripMargin,
    "q_agg_unpivot" ->
      """SELECT l_returnflag, metric, val FROM (
        |  SELECT l_returnflag,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |         COUNT(*) AS n_rows
        |  FROM lineitem GROUP BY l_returnflag)
        |UNPIVOT (val FOR metric IN (sum_qty, n_rows))""".stripMargin,
    "q_sql_recursive_cte" ->
      """WITH RECURSIVE edges AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k,
        |         CAST(FLOOR(c_custkey / 2.0) AS BIGINT) AS parent
        |  FROM customer WHERE c_custkey > 1 AND c_custkey <= 1000),
        |anc(node, ancestor, depth) AS (
        |  SELECT k, parent, 1 FROM edges
        |  UNION ALL
        |  SELECT a.node, e.parent, a.depth + 1
        |  FROM anc a JOIN edges e ON a.ancestor = e.k)
        |SELECT node, ancestor, CAST(depth AS INTEGER) AS depth
        |FROM anc""".stripMargin,
    "q_w1_salted_skew" ->
      """WITH l AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 8 THEN 'HOT'
        |              ELSE 'k' || CAST(l_orderkey % 50 AS VARCHAR) END AS skew_key,
        |         l_orderkey, l_linenumber, l_shipdate
        |  FROM lineitem)
        |SELECT skew_key, l_orderkey, l_linenumber, l_shipdate FROM (
        |  SELECT *, row_number() OVER (PARTITION BY skew_key
        |    ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
        |  FROM l) WHERE rn = 1""".stripMargin,
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) *
        |       (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_f_arrays" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS n_dims,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
        |  embedding[1] AS first_v,
        |  list_max(embedding) AS max_v,
        |  list_min(embedding) AS min_v,
        |  list_sort(embedding)[3] AS third_smallest
        |FROM embeddings""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())""".stripMargin,
    "q_w7_analytics" ->
      """SELECT o_orderkey AS k, o_orderpriority AS prio,
        |  CAST(ntile(8) OVER w AS INTEGER) AS bucket8,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(o_orderkey, 3) OVER w AS third_k
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q_agg_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_set_semi_anti" ->
      """WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |SELECT c_custkey, 'has_big_order' AS segment FROM customer
        |WHERE EXISTS (SELECT 1 FROM big WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_big_order' AS segment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM big WHERE o_custkey = c_custkey)""".stripMargin,
    "q_set_intersect_except" ->
      """WITH early AS (SELECT o_custkey FROM orders WHERE o_orderdate < '1996-01-01'),
        |late AS (SELECT o_custkey FROM orders WHERE o_orderdate >= '1997-01-01')
        |SELECT o_custkey, 'both_eras' AS membership
        |FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late)
        |UNION ALL
        |SELECT o_custkey, 'early_only' AS membership
        |FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late)""".stripMargin,
    "q_f_strings" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  lower(p_type) AS type_lower,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  substring(p_name, 1, 8) AS name_head,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  position('BRASS' IN p_type) > 0 AS has_brass,
        |  left(p_brand, 5) AS brand_head,
        |  replace(p_name, ' ', '_') AS name_snake,
        |  md5(p_name) AS name_md5,
        |  CAST(length(string_split(p_name, ' ')) AS INTEGER) AS name_words,
        |  CASE WHEN substring(p_partkey || '-555-000111', 1, 3) IN ('000','111','999','123')
        |         THEN NULL
        |       WHEN length(replace(replace(replace(replace(p_partkey || '-555-000111',
        |              '-',''),'(',''),')',''),' ','')) = 10
        |        AND NOT contains(lower(replace(replace(replace(replace(p_partkey || '-555-000111',
        |              '-',''),'(',''),')',''),' ','')), 'x')
        |         THEN replace(replace(replace(replace(p_partkey || '-555-000111',
        |              '-',''),'(',''),')',''),' ','')
        |       WHEN length(replace(replace(replace(replace(p_partkey || '-555-000111',
        |              '-',''),'(',''),')',''),' ','')) > 10
        |        AND contains(lower(replace(replace(replace(replace(p_partkey || '-555-000111',
        |              '-',''),'(',''),')',''),' ','')), 'x')
        |         THEN substring(replace(replace(replace(replace(p_partkey || '-555-000111',
        |              '-',''),'(',''),')',''),' ',''), 1, 10)
        |       END AS fake_phone,
        |  CASE WHEN trim(p_brand) = '' THEN NULL ELSE trim(p_brand) END AS brand_nn,
        |  regexp_full_match(p_brand, 'Brand#[0-9]{2}') AS brand_shape_ok
        |FROM part""".stripMargin,
    "q_f_datetime" ->
      """SELECT o_orderkey,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
        |  CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |  CAST(day(o_orderdate) AS INTEGER) AS order_day,
        |  strftime(CAST(o_orderdate AS DATE) + 180, '%Y-%m-%d') AS plus_180,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |  strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER)
        |    AS days_to_1999,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
        |FROM orders""".stripMargin,
    "q_f_conditional" ->
      """SELECT o_orderkey,
        |  CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
        |    WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
        |    ELSE 5 END AS pri_rank,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_decoded,
        |  o_orderstatus IS NOT DISTINCT FROM 'F' AS is_final,
        |  o_totalprice BETWEEN 50000 AND 100000 AS mid_price,
        |  o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_hot,
        |  CASE WHEN o_orderstatus IS NULL THEN FALSE
        |       ELSE o_orderstatus IN ('F','O','P') END AS status_valid
        |FROM orders""".stripMargin,
    "q_merge_upsert" ->
      """WITH target AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 3 <> 0),
        |source AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 0)
        |SELECT * FROM source
        |UNION ALL
        |SELECT * FROM target t
        |WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)""".stripMargin,
    "q_s13_schema_project" ->
      "SELECT l_orderkey, l_shipdate, l_returnflag FROM lineitem",
    "q_s8_json_lines" ->
      """SELECT CAST(to_json(struct_pack(n_nationkey := n_nationkey,
        |  n_name := n_name)) AS VARCHAR) AS json_row FROM nation""".stripMargin,
    "q_s9_temp_view_sql" ->
      """SELECT n_name AS nation_name, COUNT(*) AS n_suppliers,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS sum_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
}
