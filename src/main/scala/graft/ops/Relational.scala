package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** General analytics over the relational fixture tables — the payload
  * metadata side of a vector corpus at scale (Qdrant payloads →
  * columns, SURVEY.md §1.2), plus the bench-volume queries over
  * `lineitem` (the only fixture that reaches 600k rows at sf0.1).
  *
  * Scale notes per query:
  *  - q1-style aggregation: map-side partial agg, one shuffle on the
  *    two low-cardinality group keys.
  *  - join pipeline: dimension sides are broadcast (no shuffle of the
  *    fact table); only the final group-by shuffles, and AQE coalesces
  *    its partitions.
  *  - window: partitioned by a bounded key (supplier), ordered by a
  *    total per-partition order so running sums are deterministic.
  *  - events/JSON: `get_json_object` is a codegen'd path expression,
  *    not a UDF.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary. */
  def pricingSummary(li: DataFrame): DataFrame =
    li.filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-shaped top-revenue orders: broadcast the filtered
    * customer dim, join facts, aggregate revenue. */
  def topRevenueOrders(cust: DataFrame, ord: DataFrame, li: DataFrame, k: Int): DataFrame =
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust.filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(k)

  /** Running revenue per supplier (deterministic: total order inside
    * each partition via (shipdate, orderkey, linenumber)). */
  def runningRevenue(li: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.filter(col("l_suppkey") <= 2)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(col("l_extendedprice")).over(w), 2).as("running_rev"))
  }

  /** Rolling 7-day spend per customer — a RANGE window frame over
    * event TIME, not row position: each order sums every order by the
    * same customer within the trailing week, however many rows that
    * is (the rows-frame running total beside it cannot express "last
    * 7 days"). The frame bound is epoch-microsecond arithmetic so both
    * engines cut identical frames; the sum runs on exact integer
    * CENTS (`round(price*100)` kills the double representation error
    * BEFORE the cast) because a time-range frame has no deterministic
    * addition order to pin a float sum with — DuckDB segment-trees
    * its range frames. One shuffle on o_custkey; frames never cross
    * partitions, so the plan is a sort within each customer's rows —
    * scale-safe at any customer cardinality. */
  def rollingSpend(orders: DataFrame): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("ts_us"))
      .rangeBetween(-weekUs, 0L)
    orders
      .select(col("o_orderkey"), col("o_custkey"),
        // o_orderdate ships as TIMESTAMP_NTZ; the cast is an identity
        // under the pinned UTC session timezone
        unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("spend_7d_cents", sum(col("cents")).over(w))
      .withColumn("n_7d", count(lit(1)).over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("spend_7d_cents"), col("n_7d"))
  }

  /** JSON property extraction + aggregation over the events stream
    * table (payload-style semi-structured column). */
  def eventJsonStats(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("k")), 6).as("avg_k"),
        max(col("k")).as("max_k"))

  /** Tumbling-window event counts (batch form; the streaming form with
    * watermark lives in graft.streaming.Streams and feeds the same
    * oracle). */
  def eventWindowCounts(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  // -- query/oracle registry ---------------------------------------

  /** Interval (range) join without an equi-key, bucketed so it scales:
    * pairs of events where 0 < ts(b) − ts(a) ≤ `windowUs`. The naive
    * formulation — join on the inequality alone — has no equi-key, so
    * Spark plans a nested-loop/cartesian join: O(n²) and a driver OOM
    * at any real size (the DuckDB oracle states exactly that naive
    * semantics, which its IEJoin executes fine at oracle scale). The
    * scale formulation buckets time into `windowUs`-wide cells: a
    * match can only sit in a's cell or the next one, so the left side
    * fans out to 2 bucket keys, the join is a plain EQUI-join on the
    * bucket (shuffle-partitionable, AQE-skew-splittable), and the
    * exact inequality filters the candidates. Integer micros
    * throughout — no float time math. */
  def rangeJoinBucketed(events: DataFrame, windowUs: Long): DataFrame =
    rangeJoinBucketed(events, windowUs,
      maxCandidatePairs = RangeJoinMaxCandidates, forceQuadratic = false)

  /** Candidate-pair bound above which [[rangeJoinBucketed]] refuses
    * without `forceQuadratic`: 2³¹ candidates ≈ tens of GB of joined
    * rows before the exact filter — the scale at which the r13 honest
    * sweep exhausted 70 GB of scratch materializing the answer. */
  val RangeJoinMaxCandidates: Long = 1L << 31

  /** [[rangeJoinBucketed]] with the r14 OUTPUT-VOLUME guard (VERDICT
    * r13 #3): the bucketed plan is the standard interval-join shape
    * and its WORK is linear — but its OUTPUT is Σ over buckets of
    * (a-side fan-out × b-side population), which grows ∝ density²
    * when the time axis is fixed while rows multiply (the r13 100×
    * sweep died exhausting scratch on 23B pairs: the spill WAS the
    * answer being materialized). A real corpus usually extends the
    * time axis as it grows — window population then stays ~flat — but
    * one hot window in a skewed workload hits the same wall, so the
    * operator now estimates its candidate volume with one linear
    * pre-pass (Σ cᵦ·(cᵦ+cᵦ₋₁) over per-bucket counts — exact, not a
    * heuristic) and refuses loudly above `maxCandidatePairs`; a caller
    * that truly wants the quadratic output passes `forceQuadratic`
    * (the lineDedup/forceExact pattern). */
  def rangeJoinBucketed(
      events: DataFrame, windowUs: Long,
      maxCandidatePairs: Long,
      forceQuadratic: Boolean): DataFrame = {
    // spread + share: THREE consumers read this projection (the
    // guard's bucket counts, the exploded a-side, the b-side) — the
    // explicit-width spread parallelizes the ts-decode/fan-out off an
    // unsplittable scan AND its exchange is reused by all three
    // consumers instead of three scans (Spread.byKey scaladoc)
    val ev = Spread.byKey(
      events.select(col("event_id"), unix_micros(col("ts")).as("tus")),
      col("event_id"))
    if (!forceQuadratic) {
      // candidates = Σ cᵦ·(cᵦ + cᵦ₋₁) exactly as the plan fans out,
      // computed on the bucket-count frame (one row per non-empty
      // window) via an adjacent-bucket equi-join — distributed, no
      // global-order window: the count frame itself grows with a
      // time-extending corpus and must not funnel through one task
      val counts = ev.groupBy(expr(s"tus div $windowUs").as("bkt"))
        .agg(count(lit(1)).as("c"))
      val prev = counts.select((col("bkt") + 1).as("bkt"), col("c").as("cPrev"))
      val est = counts.join(prev, Seq("bkt"), "left")
        .agg(coalesce(sum(col("c") * (col("c") + coalesce(col("cPrev"), lit(0L)))),
          lit(0L)).as("cand"))
        .head.getLong(0) // coalesce: sum over ZERO buckets is null, not 0
      require(est <= maxCandidatePairs,
        s"rangeJoinBucketed would materialize ~$est candidate pairs " +
          s"(> $maxCandidatePairs): within-window population grows the " +
          "OUTPUT quadratically when rows densify a fixed time range. " +
          "Narrow windowUs, pre-filter the stream, or pass " +
          "forceQuadratic = true to pay for exactly this output.")
    }
    val a = ev.select(col("event_id").as("a_id"), col("tus").as("ta"),
      explode(array(expr(s"tus div $windowUs"),
        expr(s"tus div $windowUs") + 1)).as("bkt"))
    val b = ev.select(col("event_id").as("b_id"), col("tus").as("tb"),
      expr(s"tus div $windowUs").as("bkt"))
    a.join(b, Seq("bkt"))
      .filter(col("tb") > col("ta") && col("tb") <= col("ta") + windowUs)
      .select(col("a_id"), col("b_id"), (col("tb") - col("ta")).as("gap_us"))
  }

  /** Batch sessionization (gaps-and-islands): a new session starts at
    * every gap > `gapUs` within a user's ordered events; sessions are
    * the running sum of start flags. The batch twin of the streaming
    * `s_sessionize` operator — one shuffle on user_id, windows ordered
    * by (ts, event_id) for a total per-user order, all-integer math. */
  def sessionizeBatch(events: DataFrame, gapUs: Long): DataFrame = {
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tus"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    ev
      .withColumn("new_s",
        when(lag(col("tus"), 1).over(w).isNull ||
          col("tus") - lag(col("tus"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sess",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("tus")).as("start_us"), max(col("tus")).as("end_us"),
        count(lit(1)).as("n_events"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_range_join" -> ((s, dir) =>
      rangeJoinBucketed(graft.Tables.events(s, dir), windowUs = 600L * 1000000L)
        .orderBy(col("a_id"), col("b_id"))),

    "r_gaps_islands" -> ((s, dir) =>
      sessionizeBatch(graft.Tables.events(s, dir), gapUs = 1800L * 1000000L)
        .orderBy(col("user_id"), col("sess"))),

    "r_q1_pricing" -> ((s, dir) =>
      pricingSummary(t(s, dir, "lineitem"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Correlated-aggregate subquery shape (orders above their
    // customer's average): the oracle states the correlated form; the
    // engine states the DECORRELATED plan a scale-out engine must run
    // — one window-avg over the per-customer partition, then a filter.
    // No per-row subquery execution, one shuffle on the correlation
    // key.
    "r_above_avg_orders" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
      o.withColumn("cust_avg", avg(col("o_totalprice")).over(w))
        .filter(col("o_totalprice") > col("cust_avg"))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"),
          // 6dp, NOT 2dp: a money average lands on exact .xx5 halves,
          // where DuckDB rounds the binary double down and Spark's
          // round goes through the decimal string and rounds up; at
          // 6dp a multiple of 1/1200 can never hit a halfway point
          round(col("cust_avg"), 6).as("cust_avg"))
        .orderBy(col("o_orderkey"))
    }),
    "r_q3_top_orders" -> ((s, dir) =>
      topRevenueOrders(t(s, dir, "customer"), t(s, dir, "orders"), t(s, dir, "lineitem"), 10)),

    // Strict sequential funnel (view → click → purchase, each stage
    // completed within 6 hours of the previous stage's FIRST
    // completion — the deadline is what makes a funnel a funnel; the
    // unbounded variant saturates on any long-lived user base): the
    // conversion query every event pipeline serves. Three per-user
    // aggregates chained by conditional mins — each stage is a
    // filter + min-agg over the events already shuffled on user_id,
    // never a per-user subquery.
    "r_events_funnel" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, Seq("user_id"))
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 6 HOUR"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id"))
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 6 HOUR"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      ev.agg(countDistinct(col("user_id")).as("n_users")).crossJoin(
          t1.agg(count(lit(1)).as("n_viewed"))).crossJoin(
          t2.agg(count(lit(1)).as("n_clicked"))).crossJoin(
          t3.agg(count(lit(1)).as("n_purchased")))
    }),

    // Weekly cohort retention: users grouped by their first-activity
    // ISO week, counted in each later week they return — the
    // triangle every growth dashboard draws. Two shuffles total: the
    // per-user first-week aggregate and the (cohort, offset)
    // distinct-count; offsets are exact integer week arithmetic.
    "r_retention" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
      ev.join(cohort, Seq("user_id"))
        .select(col("user_id"), col("cw"),
          (datediff(col("w"), col("cw")) / 7).cast("long").as("offset_w"))
        .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
          col("offset_w"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("offset_w"))
    }),

    // Per-user event-type transition matrix (first-order Markov): the
    // behavioral-analytics staple behind "what do users do after X".
    // One shuffle on user_id for the lag window (total per-user order
    // on (ts, event_id)), then a map-side-combinable count keyed on
    // the bounded (prev, next) type pair; probabilities are exact
    // integer ratios per row.
    "r_events_markov" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = ev
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      trans
        .withColumn("row_n",
          sum(col("n")).over(Window.partitionBy(col("prev_type"))))
        .select(col("prev_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / col("row_n").cast("double"), 6)
            .as("p"))
        .orderBy(col("prev_type"), col("next_type"))
    }),

    // Top 3-step behavioral paths (order-2 sequence mining, the
    // companion to the order-1 Markov matrix): every consecutive
    // type-triple within a user's ordered stream, ranked by frequency.
    // Same single user_id shuffle — the two lags share one window —
    // then a bounded-key count and a TakeOrderedAndProject cut.
    "r_events_paths" -> ((s, dir) => {
      val ev = graft.Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ev
        .withColumn("t1", lag(col("event_type"), 2).over(w))
        .withColumn("t2", lag(col("event_type"), 1).over(w))
        .filter(col("t1").isNotNull)
        .select(concat_ws(">", col("t1"), col("t2"), col("event_type"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path").asc)
        .limit(10)
    }),

    // TPC-H Q10 shape: revenue lost to returns per customer — the
    // returned-item report. Fact filter (returnflag) pushes to the
    // scan, orders join shuffles on the key, the small customer dim
    // broadcasts, top-20 cut is TakeOrderedAndProject.
    "r_returned_customers" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("lost_revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("lost_revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q14 shape: promo revenue share — conditional aggregation
    // (CASE inside sum) over a broadcast dimension join, one year of
    // fact rows. The ratio-of-sums form computes BOTH aggregates in
    // the same pass; a naive two-query formulation would scan the
    // fact table twice. Guarded division (ANSI): an empty window
    // yields NULL, not an error.
    "r_promo_revenue" -> ((s, dir) => {
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val promo = sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
      val total = sum(rev)
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          round(when(total =!= 0.0, lit(100.0) * promo / total), 6)
            .as("promo_pct"),
          round(promo, 2).as("promo_rev"),
          round(total, 2).as("total_rev"))
    }),

    // TPC-H Q18 shape: large-volume orders — a HAVING aggregate over
    // the fact table whose survivors join BACK to the facts and dims
    // for detail rows. Scale shape: the having-filter output is tiny
    // (the point of the pattern), so the back-join broadcasts it;
    // the fact table is scanned twice by design — materializing a
    // corpus-sized aggregate to avoid the second scan would cost more
    // than the scan at 100 TB.
    "r_big_orders" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 300)
      li.join(broadcast(big), Seq("l_orderkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("o_orderkey"), col("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("total_qty"))
        .agg(count(lit(1)).as("n_lines"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    }),

    // TPC-H Q6 shape: the pure scan-filter-aggregate revenue forecast.
    // Every predicate pushes to the parquet scan (date range + two
    // numeric ranges), no join, no shuffle beyond the single-row final
    // agg — the simplest query whose 100 TB plan is IO-bound by design.
    "r_q6_forecast" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))),

    // TPC-H Q5 shape: six-table join, local-supplier restriction
    // (c_nationkey = s_nationkey), region + year selection, revenue
    // per nation. Scale shape: nation/region are broadcast explicitly,
    // the fact-side joins shuffle on their keys, AQE reorders the rest
    // — the multi-join planning case the two/three-table queries
    // don't exercise.
    "r_q5_region_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),
    // TPC-H Q4 shape: EXISTS correlated subquery → LEFT SEMI join.
    // The semi join never materializes lineitem columns and
    // deduplicates matches inside the join operator — the planning
    // shape an inner-join + distinct formulation would get wrong
    // (wider shuffle, then a second dedup exchange).
    "r_q4_order_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val late = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(late,
          col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // As-of join (operator Spark lacks natively, composed from
    // built-ins per the preference order): each click matched to the
    // most recent prior-or-simultaneous signup by the same user. The
    // union-then-running-window formulation is the sort-merge as-of:
    // ONE shuffle on the partition key and a single ordered pass —
    // no per-row range probe, no point-lookup join, so it scales as
    // a plain window aggregation. Ties at the same microsecond count
    // the signup as prior (kind sorts signups first).
    "r_asof_join" -> ((s, dir) => {
      val u = graft.Tables.events(s, dir)
        .filter(col("event_type").isin("signup", "click"))
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          when(col("event_type") === "signup", 0).otherwise(1).as("kind"),
          col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("signup_id",
          last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("user_id"), col("event_id").as("click_id"), col("signup_id"))
        .orderBy(col("user_id"), col("click_id"))
    }),

    "r_window_running" -> ((s, dir) =>
      runningRevenue(t(s, dir, "lineitem"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))),
    // RANGE (time-interval) window frame — trailing 7-day spend.
    "r_window_range" -> ((s, dir) =>
      rollingSpend(t(s, dir, "orders"))
        .orderBy(col("o_orderkey"))),
    // PIVOT: events per type per day — wide-format reporting shape.
    "r_pivot_events" -> ((s, dir) =>
      graft.Tables.events(s, dir)
        .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .groupBy(col("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("day"))),

    // ROLLUP subtotal hierarchy over the payload-style group keys.
    "r_rollup_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // CUBE with an explicit grouping-id column: the bitmask
    // disambiguates "NULL because subtotal" from a genuinely NULL
    // dimension value — the correctness detail rollup reports usually
    // get wrong. Both engines assign bit 2^0 to the LAST grouping
    // column.
    "r_cube_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("gid"),
          asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // set operators: segment customers who did / did not place orders.
    "r_setops_customers" -> ((s, dir) => {
      val withOrders = t(s, dir, "orders").select(col("o_custkey").as("custkey")).distinct()
      val building = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val both = withOrders.intersect(building)
        .withColumn("relation", lit("ordered_building"))
      val noOrders = building.except(withOrders)
        .withColumn("relation", lit("building_no_orders"))
      both.unionByName(noOrders).orderBy(col("relation"), col("custkey"))
    }),

    "r_events_json" -> ((s, dir) =>
      eventJsonStats(graft.Tables.events(s, dir)).orderBy(col("event_type"))),
    "r_events_window" -> ((s, dir) =>
      eventWindowCounts(graft.Tables.events(s, dir))
        .orderBy(col("window_start"), col("event_type")))
  )

  def oracles: Map[String, String] = Map(
    "r_above_avg_orders" ->
      """SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price,
        |  ROUND((SELECT avg(o2.o_totalprice) FROM orders o2
        |         WHERE o2.o_custkey = o.o_custkey), 6) AS cust_avg
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "r_range_join" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS tus FROM events)
        |SELECT a.event_id AS a_id, b.event_id AS b_id, b.tus - a.tus AS gap_us
        |FROM ev a JOIN ev b
        |  ON b.tus > a.tus AND b.tus <= a.tus + 600000000
        |ORDER BY a_id, b_id""".stripMargin,

    "r_gaps_islands" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |f AS (SELECT user_id, event_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |      OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (SELECT user_id, tus,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM f)
        |SELECT user_id, sess::BIGINT AS sess, min(tus) AS start_us, max(tus) AS end_us,
        |  count(*) AS n_events
        |FROM s GROUP BY sess, user_id ORDER BY user_id, sess""".stripMargin,

    "r_q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(sum(l_quantity), 2) AS sum_qty,
        |  ROUND(sum(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(avg(l_quantity), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "r_q6_forecast" ->
      """SELECT ROUND(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "r_events_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN t1 ON t1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > t1.t1
        |    AND e.ts <= t1.t1 + INTERVAL 6 HOUR GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN t2 ON t2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
        |    AND e.ts <= t2.t2 + INTERVAL 6 HOUR GROUP BY e.user_id)
        |SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
        |  (SELECT count(*) FROM t1) AS n_viewed,
        |  (SELECT count(*) FROM t2) AS n_clicked,
        |  (SELECT count(*) FROM t3) AS n_purchased""".stripMargin,

    "r_retention" ->
      """WITH w AS (SELECT user_id, date_trunc('week', ts) AS w FROM events),
        |c AS (SELECT user_id, min(w) AS cw FROM w GROUP BY user_id)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
        |  (date_diff('day', cw, w.w) // 7)::BIGINT AS offset_w,
        |  count(DISTINCT w.user_id) AS n_users
        |FROM w JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, offset_w""".stripMargin,

    "r_events_paths" ->
      """WITH p AS (SELECT
        |    lag(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t1,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t2,
        |    event_type AS t3
        |  FROM events)
        |SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
        |FROM p WHERE t1 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 10""".stripMargin,

    "r_events_markov" ->
      """WITH tr AS (SELECT prev_type, event_type AS next_type FROM (
        |    SELECT event_type,
        |      lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS prev_type
        |    FROM events) z
        |  WHERE prev_type IS NOT NULL),
        |c AS (SELECT prev_type, next_type, count(*)::BIGINT AS n
        |  FROM tr GROUP BY prev_type, next_type)
        |SELECT prev_type, next_type, n,
        |  ROUND(n::DOUBLE / (sum(n) OVER (PARTITION BY prev_type))::DOUBLE, 6) AS p
        |FROM c ORDER BY prev_type, next_type""".stripMargin,

    "r_returned_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        |  ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_mktsegment
        |ORDER BY lost_revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "r_promo_revenue" ->
      """SELECT
        |  ROUND(CASE WHEN sum(l_extendedprice * (1 - l_discount)) <> 0
        |    THEN 100.0 * sum(CASE WHEN p_type = 'PROMO'
        |        THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
        |      / sum(l_extendedprice * (1 - l_discount)) END, 6) AS promo_pct,
        |  ROUND(sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2) AS promo_rev,
        |  ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin,

    "r_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |SELECT c_name, o_orderkey, o_orderdate,
        |  ROUND(o_totalprice, 2) AS o_totalprice, total_qty,
        |  count(*) AS n_lines
        |FROM lineitem JOIN big USING (l_orderkey)
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name, o_orderkey, o_orderdate, ROUND(o_totalprice, 2), total_qty
        |ORDER BY o_totalprice DESC, o_orderkey ASC""".stripMargin,

    "r_q3_top_orders" ->
      """SELECT l_orderkey, o_orderdate,
        |  ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "r_q5_region_revenue" ->
      """SELECT n_name, ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,

    "r_asof_join" ->
      """WITH u AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |    CASE event_type WHEN 'signup' THEN 0 ELSE 1 END AS kind, event_id
        |  FROM events WHERE event_type IN ('signup', 'click')),
        |w AS (SELECT *, last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, kind, event_id
        |      ROWS UNBOUNDED PRECEDING) AS signup_id
        |  FROM u)
        |SELECT user_id, event_id AS click_id, signup_id FROM w WHERE kind = 1
        |ORDER BY user_id, click_id""".stripMargin,

    "r_q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "r_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  ROUND((sum(l_extendedprice) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 2) AS running_rev
        |FROM lineitem WHERE l_suppkey <= 2
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    // identical µs frame bounds, identical integer-cents sum — the
    // RANGE frame is exact across engines by construction
    "r_window_range" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS ts_us,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  CAST(sum(cents) OVER w AS BIGINT) AS spend_7d_cents,
        |  count(*) OVER w AS n_7d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY ts_us
        |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "r_pivot_events" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "r_rollup_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "r_cube_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
        |  ROUND(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "r_setops_customers" ->
      """WITH wo AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
        |bld AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT custkey, 'ordered_building' AS relation FROM (SELECT custkey FROM wo INTERSECT SELECT custkey FROM bld) z
        |UNION ALL
        |SELECT custkey, 'building_no_orders' AS relation FROM (SELECT custkey FROM bld EXCEPT SELECT custkey FROM wo) z
        |ORDER BY relation, custkey""".stripMargin,

    "r_events_json" ->
      """SELECT event_type, count(*) AS n,
        |  ROUND(avg(json_extract_string(props, '$.k')::BIGINT), 6) AS avg_k,
        |  max(json_extract_string(props, '$.k')::BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "r_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  count(*) AS n, ROUND(sum(value), 6) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin
  )
}
