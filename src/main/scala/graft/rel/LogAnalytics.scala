package graft.rel

import graft.QueryRegistry
import graft.functions.PolyEval.poly_eval
import graft.io.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Log-analytics operators over the `events` stream table (the
  * harness's north-star category): gap-based sessionization, pivoted
  * type×day matrices, dispersion statistics, and the full ranking-window
  * family — all oracle-checked.
  */
object LogAnalytics extends QueryRegistry {

  private def events(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "events")

  /** Gap-based sessionization (gap > 30 min ⇒ new session): the classic
    * lag → boundary flag → running-sum session id, then per-session
    * rollup. One shuffle on user_id; session assembly is window-local.
    */
  q("la_sessionize",
    """WITH flags AS (
      |  SELECT user_id, event_id,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |              OR CAST(floor(epoch(ts)) AS BIGINT) -
      |                 CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, event_id, sec,
      |         sum(new_session) OVER (PARTITION BY user_id
      |            ORDER BY sec, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flags)
      |SELECT CAST(user_id AS BIGINT) AS user_id,
      |       CAST(session_id AS INT) AS session_id,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(max(sec) - min(sec) AS BIGINT) AS duration_s
      |FROM sessions GROUP BY user_id, session_id""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flags = events(s, d).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), col("ts"))
      .withColumn("new_session",
        when(lag("ts", 1).over(w).isNull ||
          col("sec") - unix_timestamp(lag("ts", 1).over(w)) > 1800, 1)
          .otherwise(0))
    val ws = Window.partitionBy("user_id").orderBy("sec", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flags
      .withColumn("session_id", sum("new_session").over(ws).cast("int"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max("sec") - min("sec")).as("duration_s"))
  }

  /** Gap sessionization via Spark's native `session_window` operator
    * (merging windows). Both engines work on second-floored timestamps
    * so the gap boundary is integral and exact. Spark's session window
    * end is INCLUSIVE (verified empirically at sf0.1: a gap of exactly
    * 1800s merges), so a new session opens only when `t - last > gap` —
    * the oracle's lag formulation uses the same strict condition.
    */
  q("la_session_window",
    """WITH flags AS (
      |  SELECT user_id, event_id,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |              OR CAST(floor(epoch(ts)) AS BIGINT) -
      |                 CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, sec,
      |         sum(new_session) OVER (PARTITION BY user_id
      |            ORDER BY sec, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flags)
      |SELECT CAST(user_id AS BIGINT) AS user_id,
      |       min(sec) AS session_start,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM sessions GROUP BY user_id, sid""") { (s, d) =>
    events(s, d)
      .select(col("user_id"),
        timestamp_seconds(unix_timestamp(col("ts"))).as("tsec"))
      .groupBy(col("user_id"),
        session_window(col("tsec"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"))
  }

  /** Pivot: events per (day, type) as a wide matrix. */
  q("la_pivot_types",
    """SELECT CAST(ts AS DATE) AS day,
      |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
      |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
      |FROM events GROUP BY 1""") { (s, d) =>
    events(s, d)
      .groupBy(col("ts").cast("date").as("day"))
      .pivot("event_type",
        Seq("click", "view", "error", "signup", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }

  /** Dispersion statistics per type (sample stddev/variance, median). */
  q("la_stats",
    """SELECT event_type,
      |       round(stddev_samp(value), 4) AS sd,
      |       round(var_samp(value), 4) AS variance,
      |       round(median(value), 4) AS med,
      |       round(min(value), 4) AS mn, round(max(value), 4) AS mx
      |FROM events GROUP BY event_type""") { (s, d) =>
    events(s, d).groupBy("event_type").agg(
      round(stddev_samp(col("value")), 4).as("sd"),
      round(var_samp(col("value")), 4).as("variance"),
      round(median(col("value")), 4).as("med"),
      round(min(col("value")), 4).as("mn"),
      round(max(col("value")), 4).as("mx"))
  }

  /** Signup→purchase conversion funnel per user (conditional mins +
    * derived flag).
    */
  q("la_conversion",
    """WITH f AS (
      |  SELECT user_id,
      |         min(CASE WHEN event_type = 'signup'
      |             THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS signup_sec,
      |         min(CASE WHEN event_type = 'purchase'
      |             THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS purchase_sec
      |  FROM events GROUP BY user_id)
      |SELECT CAST(user_id AS BIGINT) AS user_id, signup_sec, purchase_sec,
      |       CAST(CASE WHEN signup_sec IS NOT NULL AND purchase_sec IS NOT NULL
      |            AND purchase_sec >= signup_sec THEN 1 ELSE 0 END AS INT) AS converted
      |FROM f""") { (s, d) =>
    events(s, d).groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup",
          unix_timestamp(col("ts")))).as("signup_sec"),
        min(when(col("event_type") === "purchase",
          unix_timestamp(col("ts")))).as("purchase_sec"))
      .withColumn("converted",
        when(col("signup_sec").isNotNull && col("purchase_sec").isNotNull &&
          col("purchase_sec") >= col("signup_sec"), 1).otherwise(0))
  }

  /** Exact interpolated quantiles per type at fixed 1e-4 precision
    * (percentile ≡ DuckDB quantile_cont, both over the ×10⁴
    * scaled-integer view of `value`). The quantized domain is the
    * 100 TB shape: exact `percentile` keeps a value→count map per
    * group, and on a continuous double column that map grows with the
    * data (unbounded per-group state); on the integer view its size is
    * bounded by 10⁴·range(value) — a constant for a bounded-domain
    * metric, independent of row count. `la_approx_quantiles` (KLL
    * sketch, bounded state unconditionally) is the companion for
    * unbounded domains.
    */
  q("la_quantiles",
    """WITH b AS (SELECT event_type,
      |                  CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |           FROM events)
      |SELECT event_type,
      |       round(quantile_cont(vu, 0.25) / 10000.0, 4) AS p25,
      |       round(quantile_cont(vu, 0.5) / 10000.0, 4) AS p50,
      |       round(quantile_cont(vu, 0.75) / 10000.0, 4) AS p75,
      |       round(quantile_cont(vu, 0.95) / 10000.0, 4) AS p95
      |FROM b GROUP BY event_type""") { (s, d) =>
    events(s, d)
      .select(col("event_type"),
        expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
      .groupBy("event_type").agg(
        round(expr("percentile(vu, 0.25)") / 10000.0, 4).as("p25"),
        round(expr("percentile(vu, 0.5)") / 10000.0, 4).as("p50"),
        round(expr("percentile(vu, 0.75)") / 10000.0, 4).as("p75"),
        round(expr("percentile(vu, 0.95)") / 10000.0, 4).as("p95"))
  }

  /** Benford first-digit audit (Newcomb 1881 / Benford 1938; the
    * classic fabricated-numbers screen — organic multiplicative data
    * leads with digit d at probability log₁₀(1+1/d), manufactured
    * values don't): per event type, the observed first-significant-
    * digit distribution of the ×10⁴ integer view vs the Benford
    * expectation (the nine log₁₀ constants hardcoded in ppm — no
    * engine log anywhere), plus a χ²-shaped divergence
    * Σ (obs_ppm − exp_ppm)² div exp_ppm per type. The first digit
    * comes from INTEGER-to-string truncation (identical formatting on
    * both engines), never floor(log₁₀(v)) — which knife-edges at
    * exact powers of ten.
    *
    * Scale shape: one map-combined (type, digit) count — ≤ 9 rows per
    * type after the single exchange; the divergence is a per-type
    * window over those 9 rows. Zeros carry no leading digit and are
    * excluded (reported implicitly via n vs the type's row count
    * elsewhere). The synthetic testdata is uniform, not Benford —
    * the audit publishes the distance, it does not assert conformity.
    */
  /** Shared oracle for `dq_benford` and its streaming twin
    * `st_benford` — one definition, the twins cannot drift.
    */
  val benfordSql: String =
    """WITH b AS (SELECT event_type,
      |                  CAST(substr(CAST(CAST(floor(abs(value) * 10000
      |                    + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
      |                    AS d
      |           FROM events
      |           WHERE CAST(floor(abs(value) * 10000 + 0.5) AS BIGINT)
      |                 > 0),
      |e AS (SELECT CAST(unnest([1,2,3,4,5,6,7,8,9]) AS INT) AS d,
      |             CAST(unnest([301030, 176091, 124939, 96910, 79181,
      |                          66947, 57992, 51153, 45757]) AS BIGINT)
      |               AS exp_ppm),
      |o AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS c
      |      FROM b GROUP BY 1, 2),
      |ty AS (SELECT DISTINCT event_type FROM o),
      |g AS (SELECT ty.event_type, e.d, e.exp_ppm, coalesce(o.c, 0) AS c
      |      FROM ty CROSS JOIN e
      |      LEFT JOIN o ON o.event_type = ty.event_type AND o.d = e.d),
      |p AS (SELECT event_type, d, c, exp_ppm,
      |             CAST(c * 1000000 //
      |               sum(c) OVER (PARTITION BY event_type) AS BIGINT)
      |               AS obs_ppm
      |      FROM g)
      |SELECT event_type, d, CAST(c AS BIGINT) AS n_obs, obs_ppm, exp_ppm,
      |       CAST(sum((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)
      |              // exp_ppm) OVER (PARTITION BY event_type)
      |         AS BIGINT) AS benford_div_u
      |FROM p""".stripMargin

  /** First-significant-digit column of the ×10⁴ integer view (shared
    * by the batch entry and the streaming twin's map stage).
    */
  def benfordDigit: org.apache.spark.sql.Column =
    substring(expr("CAST(floor(abs(value) * 10000 + 0.5) AS BIGINT)")
      .cast("string"), 1, 1).cast("int")

  /** The post-count Benford math shared by `dq_benford` and
    * `st_benford`: takes the (event_type, d, c) observed-digit counts
    * (types×9-bounded — the streaming twin's complete-mode state) and
    * joins the hardcoded expectation + the divergence window.
    */
  def benfordRollup(o: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exp = o.sparkSession.range(0, 1).select(explode(array(
        Seq((1, 301030L), (2, 176091L), (3, 124939L), (4, 96910L),
          (5, 79181L), (6, 66947L), (7, 57992L), (8, 51153L),
          (9, 45757L)).map { case (dg, p) =>
          struct(lit(dg).as("d"), lit(p).as("exp_ppm")) }: _*)).as("x"))
      .select(col("x.d").as("d"), col("x.exp_ppm").as("exp_ppm"))
    val ty = o.select("event_type").distinct()
    val byType = Window.partitionBy("event_type")
    ty.crossJoin(broadcast(exp))
      .join(o, Seq("event_type", "d"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("obs_ppm",
        expr("c * 1000000 div sum(c) over (partition by event_type)"))
      .select(col("event_type"), col("d"), col("c").as("n_obs"),
        col("obs_ppm"), col("exp_ppm"))
      .withColumn("benford_div_u",
        sum(expr("(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) div exp_ppm"))
          .over(byType))
  }

  q("dq_benford", benfordSql) { (s, d) =>
    benfordRollup(events(s, d)
      .filter(expr("CAST(floor(abs(value) * 10000 + 0.5) AS BIGINT) > 0"))
      .select(col("event_type"), benfordDigit.as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c")))
  }

  /** Robust outlier audit via median/MAD (Hampel's rule, |x − med| >
    * 3·1.4826·MAD — the robust alternative to z-scores that a single
    * extreme value cannot poison, since median and MAD both have 50%
    * breakdown): per event type, the LOWER median and lower-median
    * absolute deviation on the ×10⁴ integer grid (explicit rule:
    * smallest grid value whose cumulative count covers half — no
    * interpolated quantile, so no engine-ulp knife edge anywhere), and
    * the outlier gate as the integer cross-multiplication
    * au·10⁴ > 44478·MAD (3·1.4826 = 4.4478 exactly).
    *
    * Scale shape: ONE corpus aggregate builds the (type, value) grid;
    * the median, the deviation grid, the MAD, and the outlier count
    * all derive from grids (per-type window state = distinct values,
    * the la_quantiles contract) — the corpus is scanned once. A
    * >50%-constant type degrades to MAD = 0 (every deviation flags),
    * the standard MAD degeneracy — a modeling signal, not a bug.
    */
  q("la_mad_outliers",
    """WITH b AS (SELECT event_type,
      |                  CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |           FROM events),
      |g AS (SELECT event_type, vu, CAST(count(*) AS BIGINT) AS c
      |      FROM b GROUP BY 1, 2),
      |cm AS (SELECT event_type, vu, c,
      |              sum(c) OVER (PARTITION BY event_type ORDER BY vu
      |                ROWS UNBOUNDED PRECEDING) AS cum,
      |              sum(c) OVER (PARTITION BY event_type) AS n
      |       FROM g),
      |med AS (SELECT event_type, min(vu) AS med_u, max(n) AS n
      |        FROM cm WHERE cum * 2 >= n GROUP BY 1),
      |ad AS (SELECT g.event_type, abs(vu - med_u) AS au,
      |              CAST(sum(c) AS BIGINT) AS c
      |       FROM g JOIN med ON med.event_type = g.event_type
      |       GROUP BY 1, 2),
      |cm2 AS (SELECT event_type, au, c,
      |               sum(c) OVER (PARTITION BY event_type ORDER BY au
      |                 ROWS UNBOUNDED PRECEDING) AS cum,
      |               sum(c) OVER (PARTITION BY event_type) AS n
      |        FROM ad),
      |mad AS (SELECT event_type, min(au) AS mad_u
      |        FROM cm2 WHERE cum * 2 >= n GROUP BY 1)
      |SELECT ad.event_type, CAST(max(med.n) AS BIGINT) AS n,
      |       CAST(max(med_u) AS BIGINT) AS med_u,
      |       CAST(max(mad_u) AS BIGINT) AS mad_u,
      |       CAST(sum(CASE WHEN au * 10000 > mad_u * 44478 THEN c
      |                     ELSE 0 END) AS BIGINT) AS n_outliers,
      |       CAST(sum(CASE WHEN au * 10000 > mad_u * 44478 THEN c
      |                     ELSE 0 END) * 1000000 // max(med.n) AS BIGINT)
      |         AS outlier_ppm
      |FROM ad JOIN med ON med.event_type = ad.event_type
      |        JOIN mad ON mad.event_type = ad.event_type
      |GROUP BY 1""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy("event_type")
    val g = events(s, d)
      .select(col("event_type"),
        expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
      .groupBy("event_type", "vu").agg(count(lit(1)).as("c"))
    val cm = g
      .withColumn("cum", sum("c").over(byType.orderBy("vu")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("c").over(byType))
    val med = cm.filter(col("cum") * 2 >= col("n"))
      .groupBy("event_type").agg(min("vu").as("med_u"), max("n").as("n"))
    val ad = g.join(med, "event_type")
      .groupBy(col("event_type"), abs(col("vu") - col("med_u")).as("au"))
      .agg(sum("c").as("c"))
    val cm2 = ad
      .withColumn("cum", sum("c").over(byType.orderBy("au")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("c").over(byType))
    val mad = cm2.filter(col("cum") * 2 >= col("n"))
      .groupBy("event_type").agg(min("au").as("mad_u"))
    ad.join(med, "event_type").join(mad, "event_type")
      .groupBy("event_type")
      .agg(max("n").as("n"), max("med_u").as("med_u"),
        max("mad_u").as("mad_u"),
        sum(when(col("au") * 10000 > col("mad_u") * 44478, col("c"))
          .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"), col("med_u"), col("mad_u"),
        col("n_outliers"),
        expr("n_outliers * 1000000 div n").as("outlier_ppm"))
  }

  /** Approximate quantiles with a quantitative error bound, same
    * pattern as the HLL entry: the sketch value itself can't
    * hash-match (KLL/GK internals differ by engine), so the entry
    * outputs the EXACT p50 plus a flag that Spark's
    * approx_percentile(·, 0.5, 10000) landed inside the exact
    * [p49, p51] rank envelope — 100× looser than the sketch's 1e-4
    * rank-error guarantee, so the flag is deterministically 1, and any
    * sketch regression flips it.
    */
  q("la_approx_quantiles",
    """SELECT event_type,
      |       round(quantile_cont(value, 0.5), 4) AS p50,
      |       CAST(1 AS INT) AS kll_within_bounds
      |FROM events GROUP BY event_type""") { (s, d) =>
    events(s, d).groupBy("event_type").agg(
      round(expr("percentile(value, 0.5)"), 4).as("p50"),
      expr("approx_percentile(value, 0.5, 10000)").as("approx"),
      expr("percentile(value, 0.49)").as("lo"),
      expr("percentile(value, 0.51)").as("hi"))
      .select(col("event_type"), col("p50"),
        (col("approx") >= col("lo") && col("approx") <= col("hi"))
          .cast("int").as("kll_within_bounds"))
  }

  /** Ranking-window family: ntile, percent_rank, cume_dist,
    * first/last value over the full frame.
    */
  q("la_window_family",
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
      |       CAST(c_nationkey AS INT) AS c_nationkey,
      |       CAST(ntile(4) OVER w AS INT) AS quartile,
      |       CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pct_rank_u,
      |       CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cdist_u,
      |       first_value(c_acctbal) OVER w2 AS top_bal,
      |       last_value(c_acctbal) OVER w2 AS bottom_bal
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
      |       w2 AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""") { (s, d) =>
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(s, d, "customer").select(
      col("c_custkey"), col("c_nationkey"),
      ntile(4).over(w).as("quartile"),
      // floor-scaling instead of round: k/n ranks are exact doubles in
      // both engines, but can terminate exactly on a .5 decimal where
      // Java (shortest-repr) and C (binary) rounding disagree; floor of
      // the identical double is engine-independent
      floor(percent_rank().over(w) * 1000000).cast("long").as("pct_rank_u"),
      floor(cume_dist().over(w) * 1000000).cast("long").as("cdist_u"),
      first_value(col("c_acctbal")).over(w2).as("top_bal"),
      last_value(col("c_acctbal")).over(w2).as("bottom_bal"))
  }

  /** RANGE frame (value-based, vs the ROWS frames elsewhere): trailing
    * one-hour window per user keyed on epoch seconds. RANGE makes tied
    * timestamps peers — the frame is a pure function of the VALUE, so
    * the result is deterministic under any tie order, where a ROWS
    * frame would not be. Aggregates chosen order-independent (count,
    * max) — a windowed float sum would accumulate in engine-specific
    * order.
    */
  q("la_range_frame",
    """SELECT CAST(event_id AS BIGINT) AS event_id,
      |       CAST(user_id AS BIGINT) AS user_id,
      |       CAST(count(*) OVER win AS BIGINT) AS n_trailing_hr,
      |       max(value) OVER win AS max_trailing_hr
      |FROM events
      |WINDOW win AS (PARTITION BY user_id
      |               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""") {
    (s, d) =>
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-3600, 0)
    events(s, d).select(col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("n_trailing_hr"),
      max(col("value")).over(w).as("max_trailing_hr"))
  }

  /** Gap-fill resample with LOCF (last observation carried forward):
    * per (user, type) series on a weekly grid — generate the dense
    * index span per key (`sequence` + explode, map-local off a tiny
    * bounds aggregate), left-join the observed composites, and fill
    * holes with `last(v, ignoreNulls)` over an unbounded-preceding
    * frame. Values are rounded BEFORE the fill so both engines carry
    * forward identical doubles; the first grid row is always observed
    * (the span starts at the key's min), so value_ff is never null.
    */
  q("ts_gapfill_locf",
    """WITH comp AS (
      |  SELECT user_id, event_type,
      |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
      |              // 7 AS INT) AS wk,
      |         round(avg(value), 6) AS v
      |  FROM events GROUP BY 1, 2, 3),
      |b AS (SELECT user_id, event_type, min(wk) AS w0, max(wk) AS w1
      |      FROM comp GROUP BY 1, 2),
      |grid AS (SELECT user_id, event_type,
      |                CAST(unnest(generate_series(w0, w1)) AS INT) AS wk
      |         FROM b),
      |j AS (SELECT g.user_id, g.event_type, g.wk, c.v
      |      FROM grid g LEFT JOIN comp c USING (user_id, event_type, wk))
      |SELECT CAST(user_id AS BIGINT) AS user_id, event_type, wk,
      |       CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap,
      |       last_value(v IGNORE NULLS)
      |         OVER (PARTITION BY user_id, event_type ORDER BY wk
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS value_ff
      |FROM j""") { (s, d) =>
    val wk = floor(datediff(col("ts").cast("date"),
      lit("2024-01-01").cast("date")) / 7).cast("int")
    val comp = events(s, d)
      .groupBy(col("user_id"), col("event_type"), wk.as("wk"))
      .agg(round(avg(col("value")), 6).as("v"))
    val grid = comp.groupBy("user_id", "event_type")
      .agg(min(col("wk")).as("w0"), max(col("wk")).as("w1"))
      .select(col("user_id"), col("event_type"),
        explode(sequence(col("w0"), col("w1"))).as("wk"))
    val w = Window.partitionBy("user_id", "event_type").orderBy("wk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(comp, Seq("user_id", "event_type", "wk"), "left")
      .select(col("user_id"), col("event_type"), col("wk"),
        col("v").isNull.cast("int").as("is_gap"),
        last(col("v"), ignoreNulls = true).over(w).as("value_ff"))
  }

  /** Linear-interpolation gap-fill (the LOCF entry's complement):
    * holes get lerp(prev, next) by grid distance — prev/idx from an
    * ignoreNulls `last` over the preceding frame, next/idx from an
    * ignoreNulls `first` over the following frame. The interpolated
    * value is emitted floor-scaled to integer micro-units: the lerp of
    * two 6-dp endpoints can land exactly on a decimal half-boundary
    * where Java and C round() disagree, but floor of the identical
    * IEEE double (same ops, same association on both engines) cannot.
    * Trailing gaps (no next value) fall back to the previous value.
    */
  q("ts_gapfill_lerp",
    """WITH comp AS (
      |  SELECT user_id, event_type,
      |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
      |              // 7 AS INT) AS wk,
      |         round(avg(value), 6) AS v
      |  FROM events GROUP BY 1, 2, 3),
      |b AS (SELECT user_id, event_type, min(wk) AS w0, max(wk) AS w1
      |      FROM comp GROUP BY 1, 2),
      |grid AS (SELECT user_id, event_type,
      |                CAST(unnest(generate_series(w0, w1)) AS INT) AS wk
      |         FROM b),
      |j AS (SELECT g.user_id, g.event_type, g.wk, c.v
      |      FROM grid g LEFT JOIN comp c USING (user_id, event_type, wk)),
      |f AS (SELECT user_id, event_type, wk, v,
      |        last_value(v IGNORE NULLS) OVER wp AS pv,
      |        last_value(CASE WHEN v IS NOT NULL THEN wk END IGNORE NULLS)
      |          OVER wp AS pw,
      |        first_value(v IGNORE NULLS) OVER wf AS nv,
      |        first_value(CASE WHEN v IS NOT NULL THEN wk END IGNORE NULLS)
      |          OVER wf AS nw
      |      FROM j
      |      WINDOW wp AS (PARTITION BY user_id, event_type ORDER BY wk
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |             wf AS (PARTITION BY user_id, event_type ORDER BY wk
      |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT CAST(user_id AS BIGINT) AS user_id, event_type, wk,
      |       CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap,
      |       CAST(floor((CASE
      |          WHEN v IS NOT NULL THEN v
      |          WHEN nv IS NULL THEN pv
      |          ELSE pv + (nv - pv) * (wk - pw) / (nw - pw)
      |        END) * 1000000) AS BIGINT) AS value_u
      |FROM f""") { (s, d) =>
    val wk = floor(datediff(col("ts").cast("date"),
      lit("2024-01-01").cast("date")) / 7).cast("int")
    val comp = events(s, d)
      .groupBy(col("user_id"), col("event_type"), wk.as("wk"))
      .agg(round(avg(col("value")), 6).as("v"))
    val grid = comp.groupBy("user_id", "event_type")
      .agg(min(col("wk")).as("w0"), max(col("wk")).as("w1"))
      .select(col("user_id"), col("event_type"),
        explode(sequence(col("w0"), col("w1"))).as("wk"))
    val wp = Window.partitionBy("user_id", "event_type").orderBy("wk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("user_id", "event_type").orderBy("wk")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wkIfObs = when(col("v").isNotNull, col("wk"))
    val lerp = col("pv") + (col("nv") - col("pv")) *
      (col("wk") - col("pw")) / (col("nw") - col("pw"))
    grid.join(comp, Seq("user_id", "event_type", "wk"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
      .withColumn("pw", last(wkIfObs, ignoreNulls = true).over(wp))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wf))
      .withColumn("nw", first(wkIfObs, ignoreNulls = true).over(wf))
      .select(col("user_id"), col("event_type"), col("wk"),
        col("v").isNull.cast("int").as("is_gap"),
        floor((when(col("v").isNotNull, col("v"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(lerp)) * 1000000).cast("long").as("value_u"))
  }

  /** OHLC resampling (the candlestick/downsample op): per
    * (event_type, day), open/close are the exact values of the first
    * and last event — picked by struct-min/max over (ts, event_id,
    * value), where the unique event_id makes the order total, so the
    * pick is deterministic and NO double arithmetic happens (picked
    * doubles hash exactly; only the volume is summed, through the ×1e4
    * scaled-integer view so long sums commute). One shuffle on the
    * (type, day) key with partial min/max/sum aggregation map-side —
    * per-group state is three structs and two longs regardless of
    * group size, the right shape at any scale.
    */
  q("ts_ohlc",
    """SELECT event_type, CAST(ts AS DATE) AS day,
      |       (min(struct_pack(ts := ts, event_id := event_id,
      |                        value := value))).value AS open,
      |       max(value) AS high, min(value) AS low,
      |       (max(struct_pack(ts := ts, event_id := event_id,
      |                        value := value))).value AS close,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |            AS BIGINT) AS vol_u
      |FROM events GROUP BY 1, 2""") { (s, d) =>
    events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)"))
          .as("vol_u"))
  }

  /** Ordered conversion funnel (signup → click → purchase, each step
    * within 7 days of the previous): per user, step k's timestamp is
    * the EARLIEST qualifying event strictly after step k−1 — min over
    * timestamps, so ties cannot make the result ambiguous. Each stage
    * is one aggregate + one equi join keyed by user_id (the step-k
    * survivor table only ever shrinks), and interval arithmetic is
    * exact on µs timestamps — no doubles anywhere.
    */
  q("la_funnel",
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2
      |       FROM events e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1
      |         AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3
      |       FROM events e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |         AND e.ts <= s2.t2 + INTERVAL 7 DAY GROUP BY 1)
      |SELECT 1 AS step, 'signup' AS event_type,
      |       CAST(count(*) AS BIGINT) AS n_users FROM s1
      |UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2
      |UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3""") {
    (s, d) =>
    val ev = events(s, d)
    def nextStep(prev: org.apache.spark.sql.DataFrame, tPrev: String,
        etype: String, tOut: String) =
      ev.join(prev, Seq("user_id"))
        .filter(col("event_type") === etype && col("ts") > col(tPrev) &&
          col("ts") <= col(tPrev) + expr("INTERVAL 7 DAYS"))
        .groupBy("user_id").agg(min(col("ts")).as(tOut))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = nextStep(s1, "t1", "click", "t2")
    val s3 = nextStep(s2, "t2", "purchase", "t3")
    def cnt(df: org.apache.spark.sql.DataFrame, step: Int, et: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(et).as("event_type"),
          col("n_users"))
    cnt(s1, 1, "signup").unionAll(cnt(s2, 2, "click"))
      .unionAll(cnt(s3, 3, "purchase"))
  }

  /** Rolling z-score anomaly flag over the daily composite — the
    * monitoring op. Baseline = the previous ≤7 days (current day
    * excluded, so an anomalous day cannot mask itself); the 3σ test
    * runs in cross-multiplied integer form,
    * (n·x − Σ)² > 9·(n·Σx² − Σ²), so there is no sqrt, no division,
    * and no float: the flag is bit-stable in any aggregation order.
    * x is the day's MEAN scaled value (sum div count), which keeps
    * every term ≤ ~1e13 — far from long overflow at any corpus size
    * (totals would overflow the square at scale; means cannot).
    * One shuffle to the daily composite, then a keyed 7-row window.
    */
  q("ts_anomaly",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) //
      |              count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, day, x,
      |         CAST(count(x) OVER pw AS BIGINT) AS n_prev,
      |         CAST(coalesce(sum(x) OVER pw, 0) AS BIGINT) AS s_prev,
      |         CAST(coalesce(sum(x * x) OVER pw, 0) AS BIGINT) AS ss_prev
      |  FROM daily
      |  WINDOW pw AS (PARTITION BY event_type ORDER BY day
      |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, day, x, n_prev,
      |       CAST(CASE WHEN n_prev >= 4 AND
      |              (n_prev * x - s_prev) * (n_prev * x - s_prev) >
      |              9 * (n_prev * ss_prev - s_prev * s_prev)
      |            THEN 1 ELSE 0 END AS INT) AS is_anomaly
      |FROM w""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(expr("sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("x"))
    val pw = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    val flagged = daily
      .withColumn("n_prev", count(col("x")).over(pw))
      .withColumn("s_prev", coalesce(sum(col("x")).over(pw), lit(0L)))
      .withColumn("ss_prev",
        coalesce(sum(col("x") * col("x")).over(pw), lit(0L)))
    flagged.select(col("event_type"), col("day"), col("x"), col("n_prev"),
      (col("n_prev") >= 4 &&
        (col("n_prev") * col("x") - col("s_prev")) *
          (col("n_prev") * col("x") - col("s_prev")) >
          lit(9L) * (col("n_prev") * col("ss_prev") -
            col("s_prev") * col("s_prev")))
        .cast("int").as("is_anomaly"))
  }

  /** As-of join: each event picks the latest prior per-type daily state
    * (odd days only, so the lookback crosses days). Spark composes the
    * operator (AsOf.join); the oracle uses DuckDB's native ASOF JOIN —
    * semantics must agree exactly.
    */
  q("asof_join",
    """WITH state AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         round(avg(value), 6) AS day_avg
      |  FROM events
      |  WHERE day(ts) % 2 = 1
      |  GROUP BY event_type, date_trunc('day', ts)),
      |probe AS (
      |  SELECT event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events)
      |SELECT CAST(p.event_id AS BIGINT) AS event_id, s.st AS state_t, s.day_avg
      |FROM probe p ASOF LEFT JOIN state s
      |  ON p.event_type = s.event_type AND p.sec >= s.st""") { (s, d) =>
    val ev = events(s, d)
    val state = ev.filter(dayofmonth(col("ts")) % 2 === 1)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(round(avg("value"), 6).as("day_avg"))
    val probe = ev.select(col("event_id"), col("event_type"),
      unix_timestamp(col("ts")).as("sec"))
    AsOf.join(probe, state, keys = Seq("event_type"),
        leftTime = "sec", rightTime = "st",
        stateCols = Seq("st", "day_avg"))
      .select(col("event_id"), col("st").as("state_t"), col("day_avg"))
  }

  /** Same as-of semantics through the NATIVE operator
    * (graft.plans.AsOfJoinExec — custom LogicalPlan + Strategy +
    * single-pass sort-merge SparkPlan); identical DuckDB ASOF oracle, so
    * the custom physical operator is hash-checked row-for-row against an
    * independent engine.
    */
  q("asof_join_native",
    """WITH state AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         round(avg(value), 6) AS day_avg
      |  FROM events
      |  WHERE day(ts) % 2 = 1
      |  GROUP BY event_type, date_trunc('day', ts)),
      |probe AS (
      |  SELECT event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events)
      |SELECT CAST(p.event_id AS BIGINT) AS event_id, s.st AS state_t, s.day_avg
      |FROM probe p ASOF LEFT JOIN state s
      |  ON p.event_type = s.event_type AND p.sec >= s.st""") { (s, d) =>
    val ev = events(s, d)
    val state = ev.filter(dayofmonth(col("ts")) % 2 === 1)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(round(avg("value"), 6).as("day_avg"))
    val probe = ev.select(col("event_id"), col("event_type"),
      unix_timestamp(col("ts")).as("sec"))
    AsOf.joinNative(probe, state, keys = Seq("event_type"),
        leftTime = "sec", rightTime = "st",
        stateCols = Seq("st", "day_avg"))
      .select(col("event_id"), col("st").as("state_t"), col("day_avg"))
  }

  /** Pure range join (no equi key): events inside derived campaign
    * windows. Spark would plan the raw inequality join as
    * BroadcastNestedLoopJoin; RangeJoin buckets the time axis to turn it
    * into an equi join (see graft.rel.RangeJoin). Oracle uses DuckDB's
    * native inequality join (IEJoin) — an independent algorithm
    * producing the identical pair set.
    */
  q("rng_point_in_interval",
    """WITH pts AS (
      |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, value
      |  FROM events),
      |wins AS (
      |  SELECT DISTINCT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS wd
      |  FROM events WHERE day(ts) % 3 = 0),
      |iv AS (SELECT wd, wd + 21600 AS cs, wd + 64800 AS ce FROM wins)
      |SELECT wd AS window_day, CAST(count(*) AS BIGINT) AS n_events,
      |       round(avg(value), 6) AS avg_value
      |FROM pts JOIN iv ON pts.t >= iv.cs AND pts.t < iv.ce
      |GROUP BY wd""") { (s, d) =>
    val ev = events(s, d)
    val pts = ev.select(col("event_id"),
      unix_timestamp(col("ts")).as("t"), col("value"))
    val ivs = ev.filter(dayofmonth(col("ts")) % 3 === 0)
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("wd"))
      .distinct()
      .select(col("wd"), (col("wd") + 21600).as("cs"),
        (col("wd") + 64800).as("ce"))
    RangeJoin.pointInInterval(pts, ivs, "t", "cs", "ce",
        bucketWidth = 21600L)
      .groupBy(col("wd").as("window_day"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col("value")), 6).as("avg_value"))
  }

  /** Interval x interval OVERLAP join (the point-in-interval entry's
    * big sibling): order fulfillment spans [orderdate, orderdate + 1 +
    * key % 20) against 14-day promo windows on a 4-week grid. Both
    * sides bucket-explode to an equi join; a pair sharing several
    * buckets is kept only in its first shared bucket, so the result
    * needs no distinct. Aggregates are exact integers (count + key
    * checksum). Oracle: DuckDB's native inequality join.
    */
  q("rng_interval_overlap",
    """WITH o AS (
      |  SELECT o_orderkey,
      |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
      |           AS ls0
      |  FROM orders),
      |li AS (SELECT o_orderkey, ls0 AS ls, ls0 + 1 + o_orderkey % 20 AS le
      |       FROM o),
      |w AS (SELECT DISTINCT (ls0 // 28) * 28 AS rs FROM o
      |      WHERE (ls0 // 28) % 3 = 0),
      |iv AS (SELECT rs, rs + 14 AS re FROM w)
      |SELECT rs AS window_start, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      |FROM li JOIN iv ON li.ls < iv.re AND iv.rs < li.le
      |GROUP BY rs""") { (s, d) =>
    val o = Tables.load(s, d, "orders")
    val od = datediff(col("o_orderdate").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val left = o.select(col("o_orderkey"), od.as("ls"),
      (od + 1 + col("o_orderkey") % 20).as("le"))
    val right = o.select(od.as("d"))
      .select(expr("(d div 28) * 28").as("rs"))
      .filter(expr("(rs div 28) % 3 = 0")).distinct()
      .select(col("rs"), (col("rs") + 14).as("re"))
    RangeJoin.intervalOverlapJoin(left, right, "ls", "le", "rs", "re",
        bucketWidth = 16L)
      .groupBy(col("rs").as("window_start"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_orderkey")).as("key_sum"))
  }

  /** 2-D spatial join (point-in-box with two OVERLAPPING box
    * families): events as integer points (user axis × scaled-value
    * axis) against derived query rectangles — the
    * [[RangeJoin.pointInBox]] double-bucketing, where a pure 2-D
    * inequality join would plan as BroadcastNestedLoopJoin. Some
    * points fall in both families (the families overlap on purpose),
    * proving multi-box matches survive with no dedup. Oracle: DuckDB's
    * native inequality join over the identical box derivation.
    */
  q("rng_spatial_join",
    """WITH pts AS (
      |  SELECT event_id, CAST(user_id AS BIGINT) AS px,
      |         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS py
      |  FROM events),
      |g AS (SELECT DISTINCT (user_id // 30) * 30 AS d FROM events),
      |boxes AS (
      |  SELECT 'a' AS family, d AS x1, d + 20 AS x2,
      |         CAST(100000 AS BIGINT) AS y1, CAST(800000 AS BIGINT) AS y2
      |  FROM g
      |  UNION ALL
      |  SELECT 'b', d + 10, d + 40,
      |         CAST(300000 AS BIGINT), CAST(1200000 AS BIGINT)
      |  FROM g)
      |SELECT family, CAST(x1 AS BIGINT) AS x1,
      |       CAST(count(*) AS BIGINT) AS n_points,
      |       CAST(sum(py) AS BIGINT) AS py_sum
      |FROM pts JOIN boxes
      |  ON px >= x1 AND px < x2 AND py >= y1 AND py < y2
      |GROUP BY family, x1""") { (s, d) =>
    val pts = events(s, d).select(col("event_id"),
      col("user_id").as("px"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("py"))
    val g = events(s, d)
      .select(expr("(user_id div 30) * 30").as("d")).distinct()
    val boxes = g.select(lit("a").as("family"), col("d").as("x1"),
        (col("d") + 20).as("x2"), lit(100000L).as("y1"),
        lit(800000L).as("y2"))
      .union(g.select(lit("b"), col("d") + 10, col("d") + 40,
        lit(300000L), lit(1200000L)))
    RangeJoin.pointInBox(pts, boxes, "px", "py",
        "x1", "y1", "x2", "y2", cellW = 16L, cellH = 262144L)
      .groupBy(col("family"), col("x1"))
      .agg(count(lit(1)).as("n_points"), sum(col("py")).as("py_sum"))
  }

  /** Robust dispersion per group: median absolute deviation around the
    * per-type median (the outlier-resistant stddev used by the K4
    * kernel internally, exposed as a relational op), at fixed 1e-4
    * precision. Two passes: the group medians broadcast back onto the
    * rows, then the deviation median — `percentile` ≡ DuckDB
    * `quantile_cont` exactly, both over the ×10⁴ scaled-integer view
    * so per-group aggregation state is bounded by 10⁴·range(value)
    * (the deviations land on a half-integer grid: ≤ 2·10⁴·range
    * distinct entries), not by row count — the same bounded-state
    * argument as `la_quantiles`.
    */
  q("la_mad",
    """WITH b AS (SELECT event_type,
      |                  CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |           FROM events),
      |med AS (
      |  SELECT event_type, quantile_cont(vu, 0.5) AS m
      |  FROM b GROUP BY 1)
      |SELECT e.event_type, round(min(m) / 10000.0, 6) AS median_v,
      |       round(quantile_cont(abs(e.vu - m), 0.5) / 10000.0, 6) AS mad
      |FROM b e JOIN med USING (event_type)
      |GROUP BY e.event_type""") { (s, d) =>
    val b = events(s, d).select(col("event_type"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
    val med = b.groupBy("event_type")
      .agg(expr("percentile(vu, 0.5)").as("m"))
    b.join(broadcast(med), Seq("event_type"))
      .groupBy("event_type")
      .agg(round(min(col("m")) / 10000.0, 6).as("median_v"),
        round(expr("percentile(abs(vu - m), 0.5)") / 10000.0, 6).as("mad"))
  }

  /** User-journey transition mining: consecutive event-type pairs per
    * user in time order (ties broken on event_id, so the sequence is
    * deterministic), counted corpus-wide — the top-paths primitive
    * behind funnel exploration. One user-keyed window + one pair-keyed
    * count, both map-combinable.
    */
  q("la_journey_transitions",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS next_type
      |  FROM events)
      |SELECT event_type AS from_type, next_type AS to_type,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM seq WHERE next_type IS NOT NULL
      |GROUP BY 1, 2""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Cohort retention grid: users grouped by first-activity week,
    * counted by distinct activity in each subsequent week offset — the
    * classic retention triangle. Two aggregations (first-week per
    * user, then distinct users per cell); all integer arithmetic.
    */
  q("la_cohort_retention",
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
      |              // 7 AS INT) AS wk
      |  FROM events),
      |coh AS (SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY 1)
      |SELECT cohort_wk, CAST(a.wk - c.cohort_wk AS INT) AS wk_offset,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM act a JOIN coh c USING (user_id)
      |GROUP BY 1, 2""") { (s, d) =>
    val wk = floor(datediff(col("ts").cast("date"),
      lit("2024-01-01").cast("date")) / 7).cast("int")
    val act = events(s, d).select(col("user_id"), wk.as("wk")).distinct()
    val coh = act.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    act.join(coh, Seq("user_id"))
      .groupBy(col("cohort_wk"),
        (col("wk") - col("cohort_wk")).cast("int").as("wk_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Gini concentration of per-user activity — the "how concentrated
    * is my traffic/corpus on few heavy users?" audit (0 = uniform,
    * →1 = one user dominates). Exact integer arithmetic end to end:
    * G·10⁶ = ((n+1)·S − 2·ΣC) · 10⁶ div (n·S) where C is the inclusive
    * prefix sum of counts in (count, user_id) ascending order — the
    * rank-weighted sum Σi·xᵢ is recovered from ΣC via
    * Σi·xᵢ = (n+1)·S − ΣC, so no per-rank multiply is needed.
    *
    * The global prefix sum is the distributed TWO-PHASE form (the
    * budgetSelect/tokenize-rank machinery): range exchange tiles the
    * ascending order, the cumsum window is PARTITIONED by
    * spark_partition_id (per-task state = its own slice), and the
    * final reduction happens in ONE action — a single numParts-row
    * groupBy(pid) collect carrying (count, Σx, Σlocal-cumsum, total)
    * per tile, from which the driver recovers ΣC = Σ_pid(offset·n_pid
    * + Σlc_pid) with BigInt arithmetic. One action matters for
    * correctness, not just cost: RangePartitioner's reservoir-sample
    * seed depends on the RDD id, so two separate jobs over the
    * unpersisted repartitionByRange lineage can derive DIFFERENT range
    * boundaries, and job-1 offsets applied to job-2's partitioning
    * would be silently wrong once partitions outgrow the sample size
    * (r8 advisory). Never an unpartitioned Window.orderBy, which would
    * stream every user through one task. BigInt on the bounded driver
    * side also removes the old n·S < 9·10¹² ppm overflow bound.
    */
  q("la_gini",
    """WITH cnt AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x
      |             FROM events GROUP BY 1),
      |c AS (SELECT x, sum(x) OVER (ORDER BY x, user_id) AS cum FROM cnt)
      |SELECT CAST(count(*) AS BIGINT) AS n_users,
      |       CAST(sum(x) AS BIGINT) AS total_events,
      |       CAST(((count(*) + 1) * sum(x) - 2 * sum(cum)) * 1000000 //
      |            (count(*) * sum(x)) AS BIGINT) AS gini_ppm
      |FROM c""") { (s, d) =>
    val cnt = events(s, d).groupBy("user_id")
      .agg(count(lit(1)).as("x"))
    val numParts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = cnt
      .repartitionByRange(numParts, col("x").asc, col("user_id").asc)
      .sortWithinPartitions(col("x").asc, col("user_id").asc)
      .withColumn("pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(col("x").asc, col("user_id").asc)
    val local = ranged.withColumn("lc", sum(col("x")).over(w))
    val tiles = local.groupBy("pid")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("lc")).as("slc"), max(col("lc")).as("tot"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    val nUsers = tiles.map(_._2).sum
    val totalEvents = tiles.map(_._3).sum
    var off = BigInt(0)
    var sc = BigInt(0)
    tiles.foreach { case (_, n, _, slc, tot) =>
      sc += off * n + slc
      off += tot
    }
    val giniPpm =
      if (nUsers == 0L || totalEvents == 0L) 0L
      else (((BigInt(nUsers) + 1) * totalEvents - 2 * sc) * 1000000 /
        (BigInt(nUsers) * totalEvents)).toLong
    import s.implicits._
    Seq((nUsers, totalEvents, giniPpm))
      .toDF("n_users", "total_events", "gini_ppm")
  }

  /** RFM customer segmentation: per-user recency (days since last
    * activity vs the corpus horizon), frequency (event count) and
    * monetary (×10⁴ integer value sum), each scored into quintiles
    * against corpus-level cut points — the classic marketing/activity
    * segmentation (recency scores INVERT: most recent = 5).
    *
    * Determinism: all three metrics are exact integers; the quintile
    * cut points are interpolated percentiles of integers, whose exact
    * values are rationals with denominator 5 — `round(.,6)` therefore
    * collapses the engines' 1-ulp interpolation-order difference while
    * never sitting near a true rounding boundary, and the score
    * comparisons (integer > rounded threshold) are identical on both
    * engines. Never a global ntile(): at 10⁹ users an unpartitioned
    * rank window collapses onto one task — cut points come from ONE
    * single-row percentile aggregate broadcast back (the
    * t_quality_bins pattern), scoring is a map-local array compare.
    */
  q("la_rfm",
    """WITH peru AS (
      |  SELECT user_id,
      |         CAST(floor(epoch(max(date_trunc('day', ts)))) AS BIGINT)
      |           AS last_day,
      |         CAST(count(*) AS BIGINT) AS freq,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |           AS BIGINT) AS mon_u
      |  FROM events GROUP BY user_id),
      |mx AS (SELECT max(last_day) AS maxd FROM peru),
      |m AS (SELECT user_id, (mx.maxd - last_day) // 86400 AS rec_days,
      |             freq, mon_u
      |      FROM peru, mx),
      |c AS (SELECT
      |  list_transform(quantile_cont(rec_days, [0.2, 0.4, 0.6, 0.8]),
      |    x -> round(x, 6)) AS rc,
      |  list_transform(quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]),
      |    x -> round(x, 6)) AS fc,
      |  list_transform(quantile_cont(mon_u, [0.2, 0.4, 0.6, 0.8]),
      |    x -> round(x, 6)) AS mc
      |  FROM m)
      |SELECT CAST(user_id AS BIGINT) AS user_id,
      |       CAST(rec_days AS BIGINT) AS rec_days, freq, mon_u,
      |       CAST(5 - len(list_filter(rc, x -> rec_days > x)) AS INT)
      |         AS r_score,
      |       CAST(1 + len(list_filter(fc, x -> freq > x)) AS INT)
      |         AS f_score,
      |       CAST(1 + len(list_filter(mc, x -> mon_u > x)) AS INT)
      |         AS m_score
      |FROM m, c""") { (s, d) =>
    val peru = events(s, d).groupBy(col("user_id")).agg(
      unix_timestamp(max(date_trunc("day", col("ts")))).as("last_day"),
      count(lit(1)).as("freq"),
      expr("sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))").as("mon_u"))
    val mx = peru.agg(max("last_day").as("maxd"))
    val m = peru.crossJoin(broadcast(mx))
      .select(col("user_id"), expr("(maxd - last_day) div 86400").as("rec_days"),
        col("freq"), col("mon_u"))
    val cuts = m.agg(
      expr("transform(percentile(rec_days, array(0.2D, 0.4D, 0.6D, 0.8D)), x -> round(x, 6))").as("rc"),
      expr("transform(percentile(freq, array(0.2D, 0.4D, 0.6D, 0.8D)), x -> round(x, 6))").as("fc"),
      expr("transform(percentile(mon_u, array(0.2D, 0.4D, 0.6D, 0.8D)), x -> round(x, 6))").as("mc"))
    m.crossJoin(broadcast(cuts))
      .select(col("user_id"), col("rec_days"), col("freq"), col("mon_u"),
        expr("CAST(5 - size(filter(rc, x -> rec_days > x)) AS INT)").as("r_score"),
        expr("CAST(1 + size(filter(fc, x -> freq > x)) AS INT)").as("f_score"),
        expr("CAST(1 + size(filter(mc, x -> mon_u > x)) AS INT)").as("m_score"))
  }

  /** RFM, SCALE PATH: identical scoring shape to [[la_rfm]] but the
    * quintile cut points come from `approx_percentile` (Greenwald-
    * Khanna summaries — state bounded by the accuracy parameter, 10⁴
    * here, REGARDLESS of domain cardinality). The exact twin's
    * `percentile` buffers a value→count map that is O(users) in the
    * single final aggregation task when the domain is ~distinct per
    * user (mon_u, the ×10⁴ monetary sum) — the r6 la_quantiles failure
    * class, and an executor-memory wall at 10⁹ users. Cuts only drive
    * quintile SCORES, so approximation shifts a sliver of users one
    * bucket at boundaries — semantically acceptable for segmentation;
    * the exact entry stays the oracle anchor at test scale.
    *
    * Approx cut values are engine-specific, so the oracle pins what IS
    * deterministic: n_users (DuckDB counts independently) and four
    * structural flags that hold by construction for ANY cut array —
    * every score lands in 1..5, and each score is monotone in its
    * metric (checked scale-safely on the ≤15-row (metric, score)
    * interval table: a violation needs a lower score's max metric to
    * exceed a higher score's min — never an unpartitioned sort over
    * users). r_score inverts recency, so its monotone check runs on
    * −rec_days.
    */
  q("la_rfm_approx",
    """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |       CAST(1 AS INT) AS r_in_range,
      |       CAST(1 AS INT) AS f_in_range,
      |       CAST(1 AS INT) AS m_in_range,
      |       CAST(1 AS INT) AS r_monotone,
      |       CAST(1 AS INT) AS f_monotone,
      |       CAST(1 AS INT) AS m_monotone
      |FROM events""") { (s, d) =>
    val peru = events(s, d).groupBy(col("user_id")).agg(
      unix_timestamp(max(date_trunc("day", col("ts")))).as("last_day"),
      count(lit(1)).as("freq"),
      expr("sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))").as("mon_u"))
    val mx = peru.agg(max("last_day").as("maxd"))
    val m = peru.crossJoin(broadcast(mx))
      .select(col("user_id"),
        expr("(maxd - last_day) div 86400").as("rec_days"),
        col("freq"), col("mon_u"))
    val cuts = m.agg(
      expr("approx_percentile(rec_days, array(0.2D, 0.4D, 0.6D, 0.8D), 10000)").as("rc"),
      expr("approx_percentile(freq, array(0.2D, 0.4D, 0.6D, 0.8D), 10000)").as("fc"),
      expr("approx_percentile(mon_u, array(0.2D, 0.4D, 0.6D, 0.8D), 10000)").as("mc"))
    val scored = m.crossJoin(broadcast(cuts))
      .select(col("user_id"), col("rec_days"), col("freq"), col("mon_u"),
        expr("CAST(5 - size(filter(rc, x -> rec_days > x)) AS INT)").as("r_score"),
        expr("CAST(1 + size(filter(fc, x -> freq > x)) AS INT)").as("f_score"),
        expr("CAST(1 + size(filter(mc, x -> mon_u > x)) AS INT)").as("m_score"))
    // (metric, score) interval table: ≤15 rows, barriered because the
    // monotonicity self-join reads it THREE times (each read otherwise
    // re-runs the full events scan). r12: this was a lazy `.persist`
    // with no unpersist — the session-lifetime leak class
    // PersistLeakAuditSpec exists to catch (CacheManager plan-dedup
    // silently fed the cached table to every later run, so the bench's
    // warm reps timed a cache no first call sees). The eager
    // localCheckpoint is the sanctioned barrier: 15 rows materialized
    // once per call, nothing registered in CacheManager.
    val iv = scored
      .select(expr("""stack(3,
          'r', -rec_days, r_score,
          'f', freq,      f_score,
          'm', mon_u,     m_score) AS (metric, v, score)"""))
      .groupBy("metric", "score")
      .agg(count(lit(1)).as("cnt"), min(col("v")).as("mn"),
        max(col("v")).as("mx"))
      .localCheckpoint(true)
    val lo = iv.select(col("metric"), col("score").as("s_lo"),
      col("mx").as("lo_mx"))
    val hi = iv.select(col("metric").as("metric_h"),
      col("score").as("s_hi"), col("mn").as("hi_mn"))
    val viol = lo.join(hi, col("metric") === col("metric_h") &&
        col("s_lo") < col("s_hi") && col("lo_mx") > col("hi_mn"))
      .groupBy(col("metric")).agg(count(lit(1)).as("n_viol"))
    iv.join(viol, Seq("metric"), "left")
      .groupBy(col("metric"))
      .agg(sum(col("cnt")).as("n"),
        (min(col("score")) >= 1 && max(col("score")) <= 5).cast("int")
          .as("in_range"),
        (coalesce(max(col("n_viol")), lit(0L)) === 0).cast("int")
          .as("monotone"))
      .agg(
        max(when(col("metric") === "r", col("n"))).as("n_users"),
        max(when(col("metric") === "r", col("in_range"))).as("r_in_range"),
        max(when(col("metric") === "f", col("in_range"))).as("f_in_range"),
        max(when(col("metric") === "m", col("in_range"))).as("m_in_range"),
        max(when(col("metric") === "r", col("monotone"))).as("r_monotone"),
        max(when(col("metric") === "f", col("monotone"))).as("f_monotone"),
        max(when(col("metric") === "m", col("monotone"))).as("m_monotone"))
  }

  /** Data-profiling report (the ANALYZE/stats-collection op): one row
    * per column with row/null/distinct counts and min/max rendered as
    * engine-stable strings (BIGINTs and raw strings only — the double
    * column profiles through its ×10⁴ scaled-integer view, since
    * double→string formatting is engine-specific). One pass over the
    * table: a single wide aggregate (Spark plans the multi-column
    * distinct via Expand — the GROUPING SETS machinery), then a stack()
    * unpivot of the 1-row result.
    */
  q("la_profile",
    """WITH b AS (SELECT event_id, user_id, event_type,
      |                  CAST(floor(value * 10000 + 0.5) AS BIGINT) AS value_u,
      |                  props
      |           FROM events)
      |SELECT 'event_id' AS col_name, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
      |       CAST(min(event_id) AS VARCHAR) AS min_s,
      |       CAST(max(event_id) AS VARCHAR) AS max_s
      |FROM b
      |UNION ALL
      |SELECT 'user_id', CAST(count(*) AS BIGINT),
      |       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(DISTINCT user_id) AS BIGINT),
      |       CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
      |FROM b
      |UNION ALL
      |SELECT 'event_type', CAST(count(*) AS BIGINT),
      |       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(DISTINCT event_type) AS BIGINT),
      |       min(event_type), max(event_type)
      |FROM b
      |UNION ALL
      |SELECT 'value_u', CAST(count(*) AS BIGINT),
      |       CAST(sum(CASE WHEN value_u IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(DISTINCT value_u) AS BIGINT),
      |       CAST(min(value_u) AS VARCHAR), CAST(max(value_u) AS VARCHAR)
      |FROM b
      |UNION ALL
      |SELECT 'props', CAST(count(*) AS BIGINT),
      |       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(DISTINCT props) AS BIGINT), min(props), max(props)
      |FROM b""") { (s, d) =>
    val cols = Seq("event_id", "user_id", "event_type", "value_u", "props")
    val base = events(s, d).select(col("event_id"), col("user_id"),
      col("event_type"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("value_u"),
      col("props"))
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        count_distinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', null_$c, nd_$c, min_$c, max_$c").mkString(", ")
    base.agg(aggs.head, aggs.tail: _*)
      .select(col("n"), expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_null, n_distinct, min_s, max_s)"))
      .select(col("col_name"), col("n"), col("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** SCD2 validity-interval assembly (the warehouse history-build op):
    * collapse each user's event-type timeline into maximal runs of the
    * same type, emitting one version row per run with
    * [valid_from, valid_to) in integer seconds (valid_to NULL on the
    * open current version). Classic gaps-and-islands: lag → change
    * flag → running-sum version id → per-run rollup → lead for the
    * exclusive end. Every window is keyed by user_id, so state is
    * bounded by one user's history and the plan is one shuffle on
    * user_id reused across all four steps — nothing here grows with
    * corpus size.
    */
  q("la_scd2",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events),
      |flags AS (
      |  SELECT user_id, event_id, event_type, sec,
      |         CASE WHEN lag(event_type) OVER w IS NULL
      |              OR lag(event_type) OVER w <> event_type
      |              THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      |runs AS (
      |  SELECT user_id, event_type, sec,
      |         sum(chg) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      |  FROM flags),
      |hist AS (
      |  SELECT user_id, CAST(version AS INT) AS version,
      |         min(event_type) AS event_type,
      |         min(sec) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
      |  FROM runs GROUP BY user_id, version)
      |SELECT user_id, version, event_type, valid_from,
      |       lead(valid_from) OVER (PARTITION BY user_id
      |                              ORDER BY valid_from, version) AS valid_to,
      |       n_events
      |FROM hist""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("chg",
        when(lag("event_type", 1).over(w).isNull ||
          lag("event_type", 1).over(w) =!= col("event_type"), 1).otherwise(0))
      .withColumn("version", sum("chg").over(ws).cast("int"))
      .groupBy("user_id", "version")
      .agg(min("event_type").as("event_type"),
        min("sec").as("valid_from"), count(lit(1)).as("n_events"))
    hist.withColumn("valid_to",
        lead("valid_from", 1).over(
          Window.partitionBy("user_id").orderBy("valid_from", "version")))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"))
  }

  /** Winsorized (clipped) robust statistics per group: clamp values to
    * the [p05, p95] band before aggregating, reporting the cut points,
    * clip counts, and the winsorized mean. Cut points come from exact
    * `percentile` over the ×10⁴ scaled-integer view (bounded per-group
    * state — the `la_quantiles` argument), land on the half-integer
    * grid (exactly representable doubles), and broadcast back onto the
    * rows, so the clamp and the sum are bit-stable in any aggregation
    * order. Two shuffles on event_type; nothing unbounded.
    */
  q("la_winsorized",
    """WITH b AS (SELECT event_type,
      |                  CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |           FROM events),
      |cuts AS (
      |  SELECT event_type, quantile_cont(vu, 0.05) AS lo,
      |         quantile_cont(vu, 0.95) AS hi
      |  FROM b GROUP BY 1)
      |SELECT e.event_type,
      |       round(min(lo) / 10000.0, 4) AS lo_v,
      |       round(min(hi) / 10000.0, 4) AS hi_v,
      |       CAST(sum(CASE WHEN vu < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
      |       CAST(sum(CASE WHEN vu > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
      |       round(sum(greatest(least(CAST(vu AS DOUBLE), hi), lo))
      |             / count(*) / 10000.0, 6) AS win_mean
      |FROM b e JOIN cuts USING (event_type)
      |GROUP BY e.event_type""") { (s, d) =>
    val b = events(s, d).select(col("event_type"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
    val cuts = b.groupBy("event_type").agg(
      expr("percentile(vu, 0.05)").as("lo"),
      expr("percentile(vu, 0.95)").as("hi"))
    b.join(broadcast(cuts), Seq("event_type"))
      .groupBy("event_type")
      .agg(round(min("lo") / 10000.0, 4).as("lo_v"),
        round(min("hi") / 10000.0, 4).as("hi_v"),
        sum(when(col("vu") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("vu") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        round(sum(greatest(least(col("vu").cast("double"), col("hi")),
          col("lo"))) / count(lit(1)) / 10000.0, 6).as("win_mean"))
  }

  /** Integer EWMA smoothing (α = 1/4) over the per-type daily
    * composite: s₁ = x₁, sₜ = (3·sₜ₋₁ + xₜ) div 4 — the recursion
    * every operand of which is a non-negative long, so truncating and
    * flooring division agree and Spark's `div` replays DuckDB's `//`
    * bit for bit. Daily means come from the ×10⁴ integer view
    * (sum div count — order-independent), the fold itself is the
    * `aggregate` higher-order function over the type-keyed sorted day
    * array (pure column expressions, whole-stage codegen, no UDF), and
    * the oracle is a RECURSIVE CTE — a genuinely different evaluation
    * mechanism computing the identical integer sequence. Per-key state
    * is bounded by the day count (time-bounded, not data-bounded); a
    * longer horizon would key by (type, year) and chain.
    */
  q("ts_ewma",
    """WITH RECURSIVE daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY date_trunc('day', ts)) AS rn
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |r AS (
      |  SELECT event_type, st, xu, rn, xu AS s FROM daily WHERE rn = 1
      |  UNION ALL
      |  SELECT d.event_type, d.st, d.xu, d.rn, (3 * r.s + d.xu) // 4
      |  FROM r JOIN daily d
      |    ON d.event_type = r.event_type AND d.rn = r.rn + 1)
      |SELECT event_type, st, xu, CAST(s AS BIGINT) AS ewma_u FROM r""") {
    (s, d) =>
      val daily = events(s, d)
        .groupBy(col("event_type"),
          unix_timestamp(date_trunc("day", col("ts"))).as("st"))
        .agg(expr(
          "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
          .as("xu"))
      daily.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("st"), col("xu"))))
          .as("days"))
        .select(col("event_type"), explode(expr(
          """aggregate(
            |  days,
            |  CAST(named_struct('out', array(), 's', -1L) AS
            |    STRUCT<out: ARRAY<STRUCT<st: BIGINT, xu: BIGINT,
            |                             s: BIGINT>>, s: BIGINT>),
            |  (acc, x) -> named_struct(
            |    'out', concat(acc.out, array(named_struct(
            |      'st', x.st, 'xu', x.xu,
            |      's', CASE WHEN size(acc.out) = 0 THEN x.xu
            |                ELSE (3 * acc.s + x.xu) div 4 END))),
            |    's', CASE WHEN size(acc.out) = 0 THEN x.xu
            |              ELSE (3 * acc.s + x.xu) div 4 END)).out
            |""".stripMargin)).as("e"))
        .select(col("event_type"), col("e.st").as("st"),
          col("e.xu").as("xu"), col("e.s").as("ewma_u"))
  }

  /** Holt double-exponential smoothing (level + trend, α=β=1/4) of the
    * per-type daily composite — the forecasting step up from the EWMA:
    * a linear-trend series is tracked instead of lagged. State is two
    * ×10⁴ integer micro-unit registers folded in day order:
    * l' = (x + 3(l+b)) div 4, b' = ((l'−l) + 3b) div 4, plus the
    * one-step-ahead forecast l+b per day. Integer `div` truncates
    * toward zero in BOTH engines (Spark `div`, DuckDB `//` — verified
    * on negative operands, which the trend register does hit), so the
    * fold is bit-exact cross-engine with no float smoothing constants.
    * Scale: same contract as ts_ewma — the corpus reaches the per-type
    * fold only as day rows (map-combined composite first); fold state
    * is two longs per type.
    */
  q("ts_holt",
    """WITH RECURSIVE daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY date_trunc('day', ts)) AS rn
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |r AS (
      |  SELECT event_type, st, xu, rn, xu AS l, CAST(0 AS BIGINT) AS b
      |  FROM daily WHERE rn = 1
      |  UNION ALL
      |  SELECT d.event_type, d.st, d.xu, d.rn,
      |         (d.xu + 3 * (r.l + r.b)) // 4,
      |         (((d.xu + 3 * (r.l + r.b)) // 4 - r.l) + 3 * r.b) // 4
      |  FROM r JOIN daily d
      |    ON d.event_type = r.event_type AND d.rn = r.rn + 1)
      |SELECT event_type, st, xu, CAST(l AS BIGINT) AS level_u,
      |       CAST(b AS BIGINT) AS trend_u,
      |       CAST(l + b AS BIGINT) AS forecast_u
      |FROM r""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("st"), col("xu"))))
        .as("days"))
      .select(col("event_type"), explode(expr(
        """aggregate(
          |  days,
          |  CAST(named_struct('out', array(), 'l', -1L, 'b', 0L) AS
          |    STRUCT<out: ARRAY<STRUCT<st: BIGINT, xu: BIGINT,
          |                             l: BIGINT, b: BIGINT>>,
          |           l: BIGINT, b: BIGINT>),
          |  (acc, x) -> CASE WHEN size(acc.out) = 0 THEN named_struct(
          |      'out', array(named_struct('st', x.st, 'xu', x.xu,
          |        'l', x.xu, 'b', 0L)),
          |      'l', x.xu, 'b', 0L)
          |    ELSE named_struct(
          |      'out', concat(acc.out, array(named_struct(
          |        'st', x.st, 'xu', x.xu,
          |        'l', (x.xu + 3 * (acc.l + acc.b)) div 4,
          |        'b', (((x.xu + 3 * (acc.l + acc.b)) div 4 - acc.l)
          |              + 3 * acc.b) div 4))),
          |      'l', (x.xu + 3 * (acc.l + acc.b)) div 4,
          |      'b', (((x.xu + 3 * (acc.l + acc.b)) div 4 - acc.l)
          |            + 3 * acc.b) div 4) END).out
          |""".stripMargin)).as("h"))
      .select(col("event_type"), col("h.st").as("st"),
        col("h.xu").as("xu"), col("h.l").as("level_u"),
        col("h.b").as("trend_u"),
        (col("h.l") + col("h.b")).as("forecast_u"))
  }

  /** Holt–Winters-style seasonal smoothing of the per-type daily
    * composite: FIXED additive day-of-week indices (per-dow mean
    * deviation from the per-type mean — the STL-fixed-seasonal
    * variant, not the recursive γ update, so the indices are one
    * non-recursive aggregate) followed by the exact integer Holt
    * level+trend fold of `ts_holt` on the DE-SEASONALIZED series.
    * Emits per day the seasonal index, level, trend, and the
    * re-seasonalized fitted level. All state is ×10⁴ integer; `div`
    * truncation matches DuckDB `//` on the negative operands the
    * de-seasonalized series does hit (the ts_holt contract). Scale:
    * the corpus reaches the per-type fold only as day rows; seasonal
    * indices are a 7-row-per-type broadcastable join.
    */
  q("ts_holt_winters",
    """WITH RECURSIVE daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY date_trunc('day', ts)) AS rn
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |mu AS (
      |  SELECT event_type, CAST(sum(xu) // count(*) AS BIGINT) AS m
      |  FROM daily GROUP BY 1),
      |sea AS (
      |  SELECT d.event_type, (d.st // 86400 + 4) % 7 AS dow,
      |         CAST(sum(d.xu) // count(*) AS BIGINT) - m.m AS su
      |  FROM daily d JOIN mu m ON m.event_type = d.event_type
      |  GROUP BY d.event_type, (d.st // 86400 + 4) % 7, m.m),
      |des AS (
      |  SELECT d.event_type, d.st, d.rn, d.xu, s.su, d.xu - s.su AS xd
      |  FROM daily d JOIN sea s ON s.event_type = d.event_type
      |    AND s.dow = (d.st // 86400 + 4) % 7),
      |r AS (
      |  SELECT event_type, st, xu, su, rn, xd AS l, CAST(0 AS BIGINT) AS b
      |  FROM des WHERE rn = 1
      |  UNION ALL
      |  SELECT d.event_type, d.st, d.xu, d.su, d.rn,
      |         (d.xd + 3 * (r.l + r.b)) // 4,
      |         (((d.xd + 3 * (r.l + r.b)) // 4 - r.l) + 3 * r.b) // 4
      |  FROM r JOIN des d
      |    ON d.event_type = r.event_type AND d.rn = r.rn + 1)
      |SELECT event_type, st, xu, su AS season_u,
      |       CAST(l AS BIGINT) AS level_u, CAST(b AS BIGINT) AS trend_u,
      |       CAST(l + su AS BIGINT) AS refit_u
      |FROM r""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val mu = daily.groupBy("event_type")
      .agg(expr("CAST(sum(xu) div count(*) AS BIGINT)").as("m"))
    val sea = daily.join(mu, "event_type")
      .groupBy(col("event_type"),
        expr("(st div 86400 + 4) % 7").as("dow"), col("m"))
      .agg(expr("CAST(sum(xu) div count(*) AS BIGINT)").as("md"))
      .select(col("event_type"), col("dow"), (col("md") - col("m")).as("su"))
    val des = daily
      .withColumn("dow", expr("(st div 86400 + 4) % 7"))
      .join(sea, Seq("event_type", "dow"))
      .withColumn("xd", col("xu") - col("su"))
    des.groupBy("event_type")
      .agg(sort_array(collect_list(
        struct(col("st"), col("xu"), col("su"), col("xd")))).as("days"))
      .select(col("event_type"), explode(expr(
        """aggregate(
          |  days,
          |  CAST(named_struct('out', array(), 'l', -1L, 'b', 0L) AS
          |    STRUCT<out: ARRAY<STRUCT<st: BIGINT, xu: BIGINT,
          |                             su: BIGINT, l: BIGINT, b: BIGINT>>,
          |           l: BIGINT, b: BIGINT>),
          |  (acc, x) -> CASE WHEN size(acc.out) = 0 THEN named_struct(
          |      'out', array(named_struct('st', x.st, 'xu', x.xu,
          |        'su', x.su, 'l', x.xd, 'b', 0L)),
          |      'l', x.xd, 'b', 0L)
          |    ELSE named_struct(
          |      'out', concat(acc.out, array(named_struct(
          |        'st', x.st, 'xu', x.xu, 'su', x.su,
          |        'l', (x.xd + 3 * (acc.l + acc.b)) div 4,
          |        'b', (((x.xd + 3 * (acc.l + acc.b)) div 4 - acc.l)
          |              + 3 * acc.b) div 4))),
          |      'l', (x.xd + 3 * (acc.l + acc.b)) div 4,
          |      'b', (((x.xd + 3 * (acc.l + acc.b)) div 4 - acc.l)
          |            + 3 * acc.b) div 4) END).out
          |""".stripMargin)).as("h"))
      .select(col("event_type"), col("h.st").as("st"),
        col("h.xu").as("xu"), col("h.su").as("season_u"),
        col("h.l").as("level_u"), col("h.b").as("trend_u"),
        (col("h.l") + col("h.su")).as("refit_u"))
  }

  /** Sample autocorrelation (lags 1–5) of the per-type daily composite
    * — the seasonality/memory diagnostic run before picking kernel
    * windows (a strong lag-7 ACF says "weekly", near-zero ACF says the
    * series is noise and a trend fit is wasted work). Everything up to
    * the single final division is INTEGER: the daily series is the ×10⁴
    * scaled view (sum div count), deviations center on the floored
    * integer mean, and numerator/denominator are long sums of integer
    * products — order-independent, so the oracle match is exact, not
    * rounding-lucky (deviations ≤ 5.6e6 ⇒ products ≤ 3.2e13, years of
    * days away from overflow). Scale: one (type, day) aggregation off
    * the scan; the window runs over per-type DAILY rows — time-bounded
    * state like ts_ewma, one exchange on event_type.
    */
  q("ts_acf",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |mu AS (
      |  SELECT event_type,
      |         CAST(sum(xu) // count(*) AS BIGINT) AS m,
      |         CAST(count(*) AS BIGINT) AS n_days
      |  FROM daily GROUP BY event_type),
      |dev AS (
      |  SELECT d.event_type, m.n_days, d.st, d.xu - m.m AS dv
      |  FROM daily d JOIN mu m USING (event_type)),
      |led AS (
      |  SELECT event_type, n_days, dv,
      |         lead(dv, 1) OVER w AS d1, lead(dv, 2) OVER w AS d2,
      |         lead(dv, 3) OVER w AS d3, lead(dv, 4) OVER w AS d4,
      |         lead(dv, 5) OVER w AS d5
      |  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY st)),
      |sums AS (
      |  SELECT event_type, max(n_days) AS n_days,
      |         sum(dv * dv) AS den,
      |         sum(dv * d1) AS s1, sum(dv * d2) AS s2,
      |         sum(dv * d3) AS s3, sum(dv * d4) AS s4,
      |         sum(dv * d5) AS s5
      |  FROM led GROUP BY event_type)
      |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
      |       CAST(l AS INT) AS lag,
      |       round(CAST([s1, s2, s3, s4, s5][l] AS DOUBLE) /
      |             CAST(den AS DOUBLE), 6) AS acf
      |FROM sums, unnest(generate_series(1, 5)) AS g(l)""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val mu = daily.groupBy("event_type")
      .agg(expr("sum(xu) div count(*)").as("m"),
        count(lit(1)).as("n_days"))
    val w = Window.partitionBy("event_type").orderBy("st")
    val led = daily.join(mu, "event_type")
      .withColumn("dv", col("xu") - col("m"))
      .select(col("event_type") +: col("n_days") +: col("dv") +:
        (1 to 5).map(l => lead(col("dv"), l).over(w).as(s"d$l")): _*)
    val aggs = max(col("n_days")).as("n_days") +:
      sum(col("dv") * col("dv")).as("den") +:
      (1 to 5).map(l => sum(col("dv") * col(s"d$l")).as(s"s$l"))
    val sums = led.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    sums.select(col("event_type"), col("n_days"), col("den"),
        posexplode(array((1 to 5).map(l => col(s"s$l")): _*))
          .as(Seq("p", "num")))
      .select(col("event_type"), col("n_days"),
        (col("p") + 1).cast("int").as("lag"),
        round(col("num").cast("double") /
          col("den").cast("double"), 6).as("acf"))
  }

  /** Chi-square test of independence for event_type × hour-of-day (the
    * "is traffic mix time-invariant" diagnostic). Observed counts come
    * from ONE map-combined aggregation over the scan; marginals and the
    * statistic are re-aggregations of the ≤ |types|·24-row cell table,
    * so nothing after the first exchange is data-sized. Per-cell terms
    * use the integer identity (O·N − R·C)²/(N·R·C): the difference is
    * an exact long (≤ ~1e10 here), squared in double, so the only
    * float steps are shared verbatim by the oracle. Long arithmetic
    * holds to N ≈ 1e9 rows; past that the term computation moves to
    * double with negligible statistical effect.
    */
  q("la_chisq",
    """WITH cells AS (
      |  SELECT event_type, CAST(hour(ts) AS INT) AS hr,
      |         CAST(count(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY 1),
      |ct AS (SELECT hr, sum(o) AS c FROM cells GROUP BY 1),
      |n AS (SELECT sum(o) AS n FROM cells),
      |terms AS (
      |  SELECT CAST(coalesce(cl.o, 0) * n.n - rt.r * ct.c AS DOUBLE) AS dd,
      |         CAST(n.n * rt.r * ct.c AS DOUBLE) AS e
      |  FROM rt CROSS JOIN ct CROSS JOIN n
      |       LEFT JOIN cells cl
      |         ON cl.event_type = rt.event_type AND cl.hr = ct.hr)
      |SELECT (SELECT CAST(n AS BIGINT) FROM n) AS n,
      |       CAST(count(*) AS BIGINT) AS n_cells,
      |       CAST((SELECT count(*) FROM rt) - 1 AS BIGINT) *
      |         ((SELECT count(*) FROM ct) - 1) AS dof,
      |       round(sum(dd * dd / e), 6) AS chi2
      |FROM terms""") { (s, d) =>
    val cells = events(s, d)
      .groupBy(col("event_type"), hour(col("ts")).cast("int").as("hr"))
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy("event_type").agg(sum("o").as("r"))
    val ct = cells.groupBy("hr").agg(sum("o").as("c"))
    val n = cells.agg(sum("o").as("n"))
    val dof = broadcast(rt.agg(count(lit(1)).as("nr"))
      .crossJoin(ct.agg(count(lit(1)).as("nc")))
      .select(((col("nr") - 1) * (col("nc") - 1)).as("dof")))
    // the grid is marginals × marginals (≤ |types|·24 rows), so empty
    // cells — which a groupBy over observed rows cannot produce — still
    // contribute their (0·N − R·C)²/(N·R·C) = R·C/N term
    rt.crossJoin(ct).crossJoin(broadcast(n))
      .join(cells, Seq("event_type", "hr"), "left")
      .select(col("n"),
        (coalesce(col("o"), lit(0L)) * col("n") - col("r") * col("c"))
          .cast("double").as("dd"),
        (col("n") * col("r") * col("c")).cast("double").as("e"))
      .groupBy("n")
      .agg(count(lit(1)).as("n_cells"),
        round(sum(col("dd") * col("dd") / col("e")), 6).as("chi2"))
      .crossJoin(dof)
      .select(col("n"), col("n_cells"), col("dof"), col("chi2"))
  }

  /** Cross-correlation matrix of the per-type daily composites (which
    * signals co-move — the feature-redundancy / leading-indicator scan
    * run before anyone builds a model on the series). Same integer
    * discipline as ts_acf: Pearson terms n·Σxy − Σx·Σy stay EXACT
    * longs (day count is time-bounded ≈400 regardless of corpus size,
    * xu ≤ 5.6e6 ⇒ every product ≤ ~5e18), and the only floats are the
    * two sqrt's and one division, written identically in both engines.
    * The pair join runs on the ≤types×days aggregate, not the scan.
    */
  q("ts_xcorr",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(a.xu) AS BIGINT) AS sa,
      |         CAST(sum(b.xu) AS BIGINT) AS sb,
      |         CAST(sum(a.xu * a.xu) AS BIGINT) AS saa,
      |         CAST(sum(b.xu * b.xu) AS BIGINT) AS sbb,
      |         CAST(sum(a.xu * b.xu) AS BIGINT) AS sab
      |  FROM daily a JOIN daily b
      |    ON a.st = b.st AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, n,
      |       round(CAST(n * sab - sa * sb AS DOUBLE) /
      |             (sqrt(CAST(n * saa - sa * sa AS DOUBLE)) *
      |              sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6) AS r
      |FROM pairs""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val a = daily.select(col("event_type").as("type_a"), col("st"),
      col("xu").as("xa"))
    val b = daily.select(col("event_type").as("type_b"),
      col("st").as("st_b"), col("xu").as("xb"))
    a.join(b, col("st") === col("st_b") && col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n"),
        sum("xa").as("sa"), sum("xb").as("sb"),
        sum(col("xa") * col("xa")).as("saa"),
        sum(col("xb") * col("xb")).as("sbb"),
        sum(col("xa") * col("xb")).as("sab"))
      .select(col("type_a"), col("type_b"), col("n"),
        round((col("n") * col("sab") - col("sa") * col("sb")).cast("double") /
          (sqrt((col("n") * col("saa") - col("sa") * col("sa"))
            .cast("double")) *
           sqrt((col("n") * col("sbb") - col("sb") * col("sb"))
            .cast("double"))), 6).as("r"))
  }

  /** Welch's two-sample t-test per event type between the user-parity
    * halves (the A/B-experiment readout op). Partial sums/sum-squares
    * accumulate as DECIMAL(38,0) — exact at ANY corpus size (a long
    * Σx² overflows past ~1e6 rows of this value range; DuckDB's
    * HUGEINT sums are the same fix on the oracle side) — and the
    * aggregation is one map-combined exchange on (type, arm). The
    * t statistic and Welch–Satterthwaite df are the only float math,
    * written identically in both engines over identical integers.
    */
  q("la_ab_ttest",
    """WITH obs AS (
      |  SELECT event_type, user_id % 2 = 0 AS arm_a,
      |         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |  FROM events),
      |arms AS (
      |  SELECT event_type,
      |         CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |         CAST(sum(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
      |         sum(CASE WHEN arm_a THEN vu ELSE 0 END) AS sa,
      |         sum(CASE WHEN arm_a THEN 0 ELSE vu END) AS sb,
      |         sum(CASE WHEN arm_a THEN vu * vu ELSE 0 END) AS saa,
      |         sum(CASE WHEN arm_a THEN 0 ELSE vu * vu END) AS sbb
      |  FROM obs GROUP BY 1),
      |st AS (
      |  SELECT event_type, na, nb,
      |         CAST(sa AS DOUBLE) / na AS ma, CAST(sb AS DOUBLE) / nb AS mb,
      |         (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) *
      |            (CAST(sa AS DOUBLE) / na)) / (na - 1) / na AS qa,
      |         (CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) *
      |            (CAST(sb AS DOUBLE) / nb)) / (nb - 1) / nb AS qb
      |  FROM arms)
      |SELECT event_type, na, nb,
      |       round(ma / 10000, 6) AS mean_a, round(mb / 10000, 6) AS mean_b,
      |       round((ma - mb) / sqrt(qa + qb), 6) AS t_stat,
      |       round((qa + qb) * (qa + qb) /
      |             (qa * qa / (na - 1) + qb * qb / (nb - 1)), 6) AS df
      |FROM st""") { (s, d) =>
    val dec = "decimal(38,0)"
    val obs = events(s, d)
      .select(col("event_type"), (col("user_id") % 2 === 0).as("arm_a"),
        expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
    val arms = obs.groupBy("event_type")
      .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("na"),
        sum(when(col("arm_a"), 0L).otherwise(1L)).as("nb"),
        sum(when(col("arm_a"), col("vu")).otherwise(0L).cast(dec)).as("sa"),
        sum(when(col("arm_a"), 0L).otherwise(col("vu")).cast(dec)).as("sb"),
        sum(when(col("arm_a"), col("vu") * col("vu")).otherwise(0L)
          .cast(dec)).as("saa"),
        sum(when(col("arm_a"), 0L).otherwise(col("vu") * col("vu"))
          .cast(dec)).as("sbb"))
    val ma = col("sa").cast("double") / col("na")
    val mb = col("sb").cast("double") / col("nb")
    val qa = (col("saa").cast("double") -
      col("sa").cast("double") * (col("sa").cast("double") / col("na"))) /
      (col("na") - 1) / col("na")
    val qb = (col("sbb").cast("double") -
      col("sb").cast("double") * (col("sb").cast("double") / col("nb"))) /
      (col("nb") - 1) / col("nb")
    arms.select(col("event_type"), col("na"), col("nb"),
      round(ma / 10000, 6).as("mean_a"), round(mb / 10000, 6).as("mean_b"),
      round((ma - mb) / sqrt(qa + qb), 6).as("t_stat"),
      round((qa + qb) * (qa + qb) /
        (qa * qa / (col("na") - 1) + qb * qb / (col("nb") - 1)), 6).as("df"))
  }

  /** Key-distribution skew profiler (the pre-join diagnostics op): one
    * row summarizing how hot the hottest key is before you commit to a
    * shuffle on it — key count, max/median/p99 per-key row counts, and
    * the top key's corpus share in ppm. The per-key count aggregation
    * is map-side combined 8-byte keys; the profile aggregate's
    * `percentile` state is O(distinct count-values) ≤ max per-key
    * count — bounded by the hottest key, not the corpus.
    */
  q("la_key_skew",
    """WITH c AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY user_id)
      |SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |       CAST(sum(n) AS BIGINT) AS total,
      |       CAST(max(n) AS BIGINT) AS max_n,
      |       round(quantile_cont(n, 0.5), 4) AS p50_n,
      |       round(quantile_cont(n, 0.99), 4) AS p99_n,
      |       CAST(max(n) * 1000000 // sum(n) AS BIGINT) AS top_share_ppm
      |FROM c""") { (s, d) =>
    events(s, d).groupBy("user_id").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_keys"), sum("n").as("total"),
        max("n").as("max_n"),
        round(expr("percentile(n, 0.5)"), 4).as("p50_n"),
        round(expr("percentile(n, 0.99)"), 4).as("p99_n"),
        expr("max(n) * 1000000 div sum(n)").as("top_share_ppm"))
  }

  /** Time-weighted average per user (trapezoidal integration between
    * consecutive observations — the irregular-sampling mean where a
    * value holds influence proportional to how long it stood). All
    * integer: twice the trapezoid area is (t₂−t₁)·(v₁+v₂) on the ×10⁴
    * view, summed exactly in longs, divided once by 2·span. Ordering
    * is total (sec, event_id), so tie pairing is deterministic in both
    * engines. One user-keyed window + one aggregation; zero-span users
    * (no elapsed time) drop out.
    */
  q("ts_twa",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |  FROM events),
      |p AS (
      |  SELECT user_id, sec, vu,
      |         lead(sec) OVER w AS sec2, lead(vu) OVER w AS vu2
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id))
      |SELECT user_id,
      |       CAST(max(sec) - min(sec) AS BIGINT) AS span_s,
      |       CAST(sum((sec2 - sec) * (vu + vu2))
      |            // (2 * (max(sec) - min(sec))) AS BIGINT) AS twa_u
      |FROM p GROUP BY user_id
      |HAVING max(sec) - min(sec) > 0""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"),
        expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
      .withColumn("sec2", lead("sec", 1).over(w))
      .withColumn("vu2", lead("vu", 1).over(w))
      .groupBy("user_id")
      .agg((max("sec") - min("sec")).as("span_s"),
        sum((col("sec2") - col("sec")) * (col("vu") + col("vu2")))
          .as("area2"))
      .filter(col("span_s") > 0)
      .select(col("user_id"), col("span_s"),
        expr("area2 div (2 * span_s)").as("twa_u"))
  }

  /** Period-over-period deltas (the dashboard DoD/WoW op): day-over-day
    * and week-over-week differences plus the week-over-week relative
    * change in ppm, over the per-type daily composite. The composite is
    * map-side combined; both lags ride one type-keyed window. A
    * negative numerator divides identically in both engines
    * (truncation — verified (-7)//4 = -1 in DuckDB = Spark's div).
    */
  q("ts_pop",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts))
      |SELECT event_type, st, xu,
      |       xu - lag(xu, 1) OVER w AS dod_u,
      |       xu - lag(xu, 7) OVER w AS wow_u,
      |       CASE WHEN lag(xu, 7) OVER w > 0
      |            THEN CAST((xu - lag(xu, 7) OVER w) * 1000000
      |                      // lag(xu, 7) OVER w AS BIGINT)
      |       END AS wow_ppm
      |FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY st)""") {
    (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("st")
      events(s, d)
        .groupBy(col("event_type"),
          unix_timestamp(date_trunc("day", col("ts"))).as("st"))
        .agg(expr(
          "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
          .as("xu"))
        .withColumn("lag1", lag("xu", 1).over(w))
        .withColumn("lag7", lag("xu", 7).over(w))
        .select(col("event_type"), col("st"), col("xu"),
          (col("xu") - col("lag1")).as("dod_u"),
          (col("xu") - col("lag7")).as("wow_u"),
          when(col("lag7") > 0,
            expr("(xu - lag7) * 1000000 div lag7")).as("wow_ppm"))
  }

  /** Percent-of-parent hierarchy shares (the drill-down dashboard op):
    * each (type, day) cell's share of its day in ppm, and each day's
    * share of the corpus — two levels of the same rollup read side by
    * side. Cell and day counts are map-combined; the grand total is
    * the house 1-row broadcast; no windows at all.
    */
  q("la_share_parent",
    """WITH cell AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |day AS (SELECT st, CAST(sum(n) AS BIGINT) AS day_n FROM cell
      |        GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS all_n FROM cell)
      |SELECT event_type, cell.st, n, day_n,
      |       CAST(n * 1000000 // day_n AS BIGINT) AS of_day_ppm,
      |       CAST(day_n * 1000000 // all_n AS BIGINT) AS day_of_all_ppm
      |FROM cell JOIN day ON cell.st = day.st, tot""") { (s, d) =>
    val cell = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(count(lit(1)).as("n"))
    val day = cell.groupBy("st").agg(sum("n").as("day_n"))
    val tot = cell.agg(sum("n").as("all_n"))
    cell.join(day, "st").crossJoin(broadcast(tot))
      .select(col("event_type"), col("st"), col("n"), col("day_n"),
        expr("n * 1000000 div day_n").as("of_day_ppm"),
        expr("day_n * 1000000 div all_n").as("day_of_all_ppm"))
  }

  /** Cumulative distinct users per type (the DAU/unique-growth curve):
    * a user counts on their FIRST day per type — min-day per
    * (type, user) is map-combined — then daily first-sight counts
    * accumulate over a type-keyed window whose state is one long and
    * whose input is day rows, not events.
    */
  q("la_cum_uniques",
    """WITH fs AS (
      |  SELECT event_type, user_id,
      |         min(CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT))
      |           AS fd
      |  FROM events GROUP BY 1, 2),
      |daily AS (
      |  SELECT event_type, fd AS st, CAST(count(*) AS BIGINT) AS new_users
      |  FROM fs GROUP BY 1, 2)
      |SELECT event_type, st, new_users,
      |       CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY st
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS cum_users
      |FROM daily""") { (s, d) =>
    val w = Window.partitionBy("event_type").orderBy("st")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(unix_timestamp(date_trunc("day", col("ts")))).as("fd"))
      .groupBy(col("event_type"), col("fd").as("st"))
      .agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum("new_users").over(w))
  }

  /** Session entry/exit matrix (the landing/bounce analysis op): for
    * each gap-sessionized visit, the first and last event types —
    * struct-min/max over (sec, event_id, type), deterministic because
    * event_id makes the order total (the OHLC pick) — counted into the
    * (entry, exit) transition matrix. One user-keyed exchange for the
    * session build, then a matrix-sized aggregation.
    */
  q("la_entry_exit",
    """WITH flags AS (
      |  SELECT user_id, event_id, event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |              OR CAST(floor(epoch(ts)) AS BIGINT) -
      |                 CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |              THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, event_id, event_type, sec,
      |         sum(ns) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flags),
      |ee AS (
      |  SELECT user_id, sid,
      |         min(struct_pack(sec := sec, event_id := event_id,
      |                         event_type := event_type)) AS a,
      |         max(struct_pack(sec := sec, event_id := event_id,
      |                         event_type := event_type)) AS b
      |  FROM sess GROUP BY 1, 2)
      |SELECT (a).event_type AS entry_type, (b).event_type AS exit_type,
      |       CAST(count(*) AS BIGINT) AS n_sessions
      |FROM ee GROUP BY 1, 2""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ws = Window.partitionBy("user_id").orderBy("sec", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"), col("ts"))
      .withColumn("ns",
        when(lag("ts", 1).over(w).isNull ||
          col("sec") - unix_timestamp(lag("ts", 1).over(w)) > 1800, 1)
          .otherwise(0))
      .withColumn("sid", sum("ns").over(ws))
      .groupBy("user_id", "sid")
      .agg(
        min(struct(col("sec"), col("event_id"), col("event_type"))).as("a"),
        max(struct(col("sec"), col("event_id"), col("event_type"))).as("b"))
      .groupBy(col("a.event_type").as("entry_type"),
        col("b.event_type").as("exit_type"))
      .agg(count(lit(1)).as("n_sessions"))
  }

  /** Inter-arrival latency histogram in log₂ buckets (the production
    * histogram shape): per-user gaps between consecutive events,
    * bucketed by binary magnitude — bucket = length(bin(dt)), an
    * exact integer in both engines, with [lo, hi] bounds from shifts.
    * One user-keyed window, then a ~32-row aggregation.
    */
  q("la_interarrival_hist",
    """WITH gaps AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT)
      |         - lag(CAST(floor(epoch(ts)) AS BIGINT))
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dt
      |  FROM events),
      |b AS (SELECT CAST(length(bin(dt)) AS INT) AS bucket FROM gaps
      |      WHERE dt IS NOT NULL)
      |SELECT bucket,
      |       CAST(CASE WHEN bucket = 1 THEN 0
      |                 ELSE (1 << (bucket - 1)) END AS BIGINT) AS lo_s,
      |       CAST((1 << bucket) - 1 AS BIGINT) AS hi_s,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM b GROUP BY bucket""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("dt", col("sec") - lag("sec", 1).over(w))
      .filter(col("dt").isNotNull)
      .select(length(bin(col("dt"))).cast("int").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        when(col("bucket") === 1, 0L)
          .otherwise(expr("shiftleft(1L, bucket - 1)")).as("lo_s"),
        expr("shiftleft(1L, bucket) - 1").as("hi_s"),
        col("n"))
  }

  /** Conversion-latency quantiles (the funnel companion): distribution
    * of first-signup → first-purchase delay over converted users, on
    * integer seconds — `percentile` ≡ `quantile_cont`, state bounded
    * by distinct delay values (≤ the time span, a constant for a
    * bounded retention horizon). One user-keyed aggregation, then a
    * single-row reduce.
    */
  q("la_convert_latency",
    """WITH f AS (
      |  SELECT user_id,
      |         min(CASE WHEN event_type = 'signup'
      |             THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS s,
      |         min(CASE WHEN event_type = 'purchase'
      |             THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS p
      |  FROM events GROUP BY user_id),
      |c AS (SELECT p - s AS lat FROM f
      |      WHERE s IS NOT NULL AND p IS NOT NULL AND p >= s)
      |SELECT CAST(count(*) AS BIGINT) AS n_converted,
      |       CAST(min(lat) AS BIGINT) AS min_s,
      |       round(quantile_cont(lat, 0.25), 4) AS p25_s,
      |       round(quantile_cont(lat, 0.5), 4) AS p50_s,
      |       round(quantile_cont(lat, 0.75), 4) AS p75_s,
      |       CAST(max(lat) AS BIGINT) AS max_s
      |FROM c""") { (s, d) =>
    events(s, d).groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup",
          unix_timestamp(col("ts")))).as("s"),
        min(when(col("event_type") === "purchase",
          unix_timestamp(col("ts")))).as("p"))
      .filter(col("s").isNotNull && col("p").isNotNull &&
        col("p") >= col("s"))
      .select((col("p") - col("s")).as("lat"))
      .agg(count(lit(1)).as("n_converted"),
        min("lat").as("min_s"),
        round(expr("percentile(lat, 0.25)"), 4).as("p25_s"),
        round(expr("percentile(lat, 0.5)"), 4).as("p50_s"),
        round(expr("percentile(lat, 0.75)"), 4).as("p75_s"),
        max("lat").as("max_s"))
  }

  /** One-sided integer CUSUM drift detection over the per-type daily
    * composite: Sₜ = max(0, Sₜ₋₁ + xₜ − μ) with μ the type's own mean
    * day — pure add/subtract/max on longs, so there is NO division
    * semantics to reconcile at all; the fold is the same aggregate-HOF
    * vs RECURSIVE-CTE pairing as `ts_ewma`. Complements the
    * independent-day z-score (`ts_anomaly`) with the classic
    * accumulated-drift statistic.
    */
  q("ts_cusum",
    """WITH RECURSIVE daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY date_trunc('day', ts)) AS rn
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |mu AS (SELECT event_type, CAST(sum(xu) // count(*) AS BIGINT) AS m
      |       FROM daily GROUP BY 1),
      |r AS (
      |  SELECT d.event_type, d.st, d.xu, d.rn,
      |         greatest(CAST(0 AS BIGINT), d.xu - mu.m) AS s
      |  FROM daily d JOIN mu USING (event_type) WHERE d.rn = 1
      |  UNION ALL
      |  SELECT d.event_type, d.st, d.xu, d.rn,
      |         greatest(CAST(0 AS BIGINT), r.s + d.xu - mu.m)
      |  FROM r JOIN daily d ON d.event_type = r.event_type
      |                     AND d.rn = r.rn + 1
      |       JOIN mu ON mu.event_type = d.event_type)
      |SELECT event_type, st, xu, CAST(s AS BIGINT) AS cusum_u FROM r""") {
    (s, d) =>
      val daily = events(s, d)
        .groupBy(col("event_type"),
          unix_timestamp(date_trunc("day", col("ts"))).as("st"))
        .agg(expr(
          "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
          .as("xu"))
      val mu = daily.groupBy("event_type")
        .agg(expr("sum(xu) div count(*)").as("m"))
      daily.join(broadcast(mu), "event_type")
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("st"), col("xu"),
          col("m")))).as("days"))
        .select(col("event_type"), explode(expr(
          """aggregate(
            |  days,
            |  CAST(named_struct('out', array(), 's', 0L) AS
            |    STRUCT<out: ARRAY<STRUCT<st: BIGINT, xu: BIGINT,
            |                             s: BIGINT>>, s: BIGINT>),
            |  (acc, x) -> named_struct(
            |    'out', concat(acc.out, array(named_struct(
            |      'st', x.st, 'xu', x.xu,
            |      's', greatest(0L, acc.s + x.xu - x.m)))),
            |    's', greatest(0L, acc.s + x.xu - x.m))).out
            |""".stripMargin)).as("e"))
        .select(col("event_type"), col("e.st").as("st"),
          col("e.xu").as("xu"), col("e.s").as("cusum_u"))
  }

  /** Data-quality constraint audit (the expectation-suite op): five
    * rules checked in ONE pass — a single wide aggregate over the
    * table, unpivoted to (rule, n_violations) rows, the la_profile
    * shape. Per-rule counts are conditional sums (map-combined);
    * nothing scans the table twice.
    */
  q("dq_constraints",
    """WITH a AS (
      |  SELECT
      |    CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
      |         AS BIGINT) AS v_id_null,
      |    CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS v_id_dup,
      |    CAST(sum(CASE WHEN value < 0 OR value > 10000 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS v_value_range,
      |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-01'
      |              OR ts >= TIMESTAMP '2025-01-01' THEN 1 ELSE 0 END)
      |         AS BIGINT) AS v_ts_window,
      |    CAST(sum(CASE WHEN event_type NOT IN
      |              ('click','view','purchase','signup','error')
      |              THEN 1 ELSE 0 END) AS BIGINT) AS v_type_domain
      |  FROM events)
      |SELECT 'id_not_null' AS rule, v_id_null AS n_violations FROM a
      |UNION ALL SELECT 'id_unique', v_id_dup FROM a
      |UNION ALL SELECT 'value_range', v_value_range FROM a
      |UNION ALL SELECT 'ts_window', v_ts_window FROM a
      |UNION ALL SELECT 'type_domain', v_type_domain FROM a""") { (s, d) =>
    val a = events(s, d).agg(
      sum(when(col("event_id").isNull, 1L).otherwise(0L)).as("v_id_null"),
      (count(lit(1)) - count_distinct(col("event_id"))).as("v_id_dup"),
      sum(when(col("value") < 0 || col("value") > 10000, 1L)
        .otherwise(0L)).as("v_value_range"),
      sum(when(col("ts") < lit("2024-01-01").cast("timestamp") ||
        col("ts") >= lit("2025-01-01").cast("timestamp"), 1L)
        .otherwise(0L)).as("v_ts_window"),
      sum(when(!col("event_type").isInCollection(
        Seq("click", "view", "purchase", "signup", "error")), 1L)
        .otherwise(0L)).as("v_type_domain"))
    a.select(expr(
      """stack(5,
        |  'id_not_null', v_id_null,
        |  'id_unique', v_id_dup,
        |  'value_range', v_value_range,
        |  'ts_window', v_ts_window,
        |  'type_domain', v_type_domain) AS (rule, n_violations)
        |""".stripMargin))
  }

  /** Data-completeness audit (the freshness/coverage op): per type,
    * days observed vs the corpus calendar span — missing days surface
    * silently-dropped partitions before they poison a training run.
    * Distinct-day counts are map-combined; the corpus span is a 1-row
    * broadcast.
    */
  q("dq_completeness",
    """WITH d AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st
      |  FROM events),
      |span AS (
      |  SELECT (max(st) - min(st)) // 86400 + 1 AS span_days FROM d),
      |t AS (SELECT event_type, CAST(count(DISTINCT st) AS BIGINT) AS days,
      |             CAST(count(*) AS BIGINT) AS n_rows
      |      FROM d GROUP BY 1)
      |SELECT event_type, n_rows, days,
      |       CAST(span_days AS BIGINT) AS span_days,
      |       CAST(span_days - days AS BIGINT) AS missing_days
      |FROM t, span""") { (s, d) =>
    val dd = events(s, d).select(col("event_type"),
      unix_timestamp(date_trunc("day", col("ts"))).as("st"))
    val span = dd.agg(
      (((max("st") - min("st")) / 86400).cast("long") + 1)
        .as("span_days"))
    dd.groupBy("event_type")
      .agg(count_distinct(col("st")).as("days"),
        count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("n_rows"), col("days"),
        col("span_days"),
        (col("span_days") - col("days")).as("missing_days"))
  }

  /** k-anonymity audit (the privacy gate a dataset clears before
    * release — Sweeney 2002): rows sharing a quasi-identifier tuple
    * (event_type, hour-of-day, value kilobucket) form an equivalence
    * class; a class smaller than k=5 re-identifies its members. Per
    * event_type: class count, the minimum class size (the table's k),
    * how many classes and rows sit below the threshold, and the
    * at-risk share in exact ppm. Two map-combined aggregations — the
    * class table is bounded by the QI domain (|types|·24·|buckets|),
    * so the second pass is tiny regardless of corpus size; nothing
    * here grows with rows beyond the first combine. The value bucket
    * floors an IEEE division both engines compute identically.
    */
  /** ONE oracle text for the batch audit and its streaming twin
    * (`st_k_anon`) — the shared-builder rule, so the two cannot
    * drift.
    */
  val kAnonSql: String =
    """WITH qi AS (
      |  SELECT event_type,
      |         CAST(extract(hour FROM ts) AS INT) AS hr,
      |         CAST(floor(value / 1000) AS BIGINT) AS vb
      |  FROM events),
      |cls AS (SELECT event_type, hr, vb, count(*) AS k
      |        FROM qi GROUP BY 1, 2, 3)
      |SELECT event_type,
      |       CAST(sum(k) AS BIGINT) AS n_rows,
      |       CAST(count(*) AS BIGINT) AS n_classes,
      |       CAST(min(k) AS BIGINT) AS k_min,
      |       CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_risk_classes,
      |       CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
      |         AS n_rows_at_risk,
      |       CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000000
      |            // sum(k) AS BIGINT) AS risk_ppm,
      |       CAST(CASE WHEN min(k) >= 5 THEN 1 ELSE 0 END AS INT)
      |         AS k5_anonymous
      |FROM cls GROUP BY event_type""".stripMargin

  /** The per-type rollup over the QI-class-count table — shared by the
    * batch audit and the streaming twin's post-pass (the class table
    * is QI-domain-bounded in both).
    */
  def kAnonRollup(cls: DataFrame): DataFrame =
    cls.groupBy("event_type")
      .agg(sum("k").as("n_rows"),
        count(lit(1)).as("n_classes"),
        min("k").as("k_min"),
        sum(when(col("k") < 5, 1L).otherwise(0L)).as("n_risk_classes"),
        sum(when(col("k") < 5, col("k")).otherwise(0L))
          .as("n_rows_at_risk"))
      .select(col("event_type"), col("n_rows"), col("n_classes"),
        col("k_min"), col("n_risk_classes"), col("n_rows_at_risk"),
        expr("n_rows_at_risk * 1000000L div n_rows").as("risk_ppm"),
        (col("k_min") >= 5).cast("int").as("k5_anonymous"))

  q("dq_k_anon", kAnonSql) { (s, d) =>
    val qi = events(s, d).select(col("event_type"),
      hour(col("ts")).as("hr"),
      floor(col("value") / 1000).cast("long").as("vb"))
    kAnonRollup(
      qi.groupBy("event_type", "hr", "vb").agg(count(lit(1)).as("k")))
  }

  /** Top user journeys (full-path analysis): each user's event-type
    * sequence in (sec, event_id) total order joined into a path
    * string, counted corpus-wide, top-20 by (count desc, path) — a
    * total order, so the cut is deterministic. The per-user sorted
    * collect is bounded by one user's history (the kernel contract);
    * the path table is users-sized, then shrinks to distinct paths.
    */
  q("la_top_paths",
    """WITH seq AS (
      |  SELECT user_id,
      |         string_agg(event_type, '>' ORDER BY
      |           CAST(floor(epoch(ts)) AS BIGINT), event_id) AS path
      |  FROM events GROUP BY user_id)
      |SELECT path, CAST(count(*) AS BIGINT) AS n_users
      |FROM seq GROUP BY path
      |ORDER BY n_users DESC, path LIMIT 20""") { (s, d) =>
    events(s, d)
      .select(col("user_id"),
        struct(unix_timestamp(col("ts")).as("sec"), col("event_id"),
          col("event_type")).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(expr(
        "array_join(transform(es, x -> x.event_type), '>')").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  /** Multi-touch attribution (first/last/linear models in one pass):
    * every purchase collects the clicks by the same user in the
    * preceding 7 days — user_id is an EQUI key, so this is a hash
    * join with the time window as residual (the bucketed RangeJoin is
    * for pure-inequality cases; with an equi key the planner already
    * avoids BNLJ) — then per purchase: first-touch click, last-touch
    * click (struct-min/max total-order picks), click count, and the
    * linear-model share (10⁶ div n). Purchases with no clicks drop
    * (no touch to attribute).
    */
  q("la_attribution",
    """WITH c AS (
      |  SELECT user_id, event_id AS click_id,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS cs
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, event_id AS purchase_id,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS ps
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id,
      |       (min(struct_pack(cs := c.cs, click_id := c.click_id))).click_id
      |         AS first_click,
      |       (max(struct_pack(cs := c.cs, click_id := c.click_id))).click_id
      |         AS last_click,
      |       CAST(count(*) AS BIGINT) AS n_touches,
      |       CAST(1000000 // count(*) AS BIGINT) AS linear_ppm
      |FROM p JOIN c ON c.user_id = p.user_id
      |            AND c.cs >= p.ps - 604800 AND c.cs < p.ps
      |GROUP BY p.purchase_id""") { (s, d) =>
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_timestamp(col("ts")).as("cs"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"),
        unix_timestamp(col("ts")).as("ps"))
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("cs") >= col("ps") - 604800 && col("cs") < col("ps"))
      .groupBy("purchase_id")
      .agg(
        min(struct(col("cs"), col("click_id"))).getField("click_id")
          .as("first_click"),
        max(struct(col("cs"), col("click_id"))).getField("click_id")
          .as("last_click"),
        count(lit(1)).as("n_touches"),
        expr("1000000L div count(*)").as("linear_ppm"))
  }

  /** Poisson-bootstrap confidence interval for the per-type mean value
    * (Chamandy et al. 2012, "Estimating uncertainty for massive data
    * streams" — the distributed bootstrap: resampling-with-replacement
    * over n rows is impossible at scale, but each row's per-replica
    * multiplicity is approximately independent Poisson(1), which needs
    * only a per-row draw). Draws are DETERMINISTIC: the native
    * splitmix64 of (event_id, replica) — an integer key, codegen'd,
    * no string/hash materialization — inverted through the exact
    * integer Poisson(1) CDF thresholds (top 48 bits vs a literal
    * table in 2⁻⁴⁸ units — no RNG state, no float comparison), so any
    * cluster layout and the oracle produce identical replicas (the
    * oracle replays splitmix64 in mod-2⁶⁴ HUGEINT arithmetic).
    * Replica means are exact integer ratios; the CI picks the
    * 3rd/98th of the 100 sorted replica means.
    *
    * Scale shape: the B=100 replica explode is the method's honest
    * cost, but it map-combines immediately — the exchange carries
    * (type, replica) partial sums, B·types·partitions rows, never the
    * exploded data; the CI step sorts a 100-element list per type.
    */
  q("la_bootstrap_ci", {
    val th = Seq(103548857136060L, 207097714272121L, 258872142840152L,
      276130285696162L, 280444821410164L, 281307728552965L,
      281451546410098L, 281472091818260L)
    val cSql = th.map(t => s"CASE WHEN u48 >= $t THEN 1 ELSE 0 END")
      .mkString(" + ")
    // splitmix64 in mod-2^64 HUGEINT arithmetic — the shared
    // SplitMix64Sql toolkit (XOR via 32-bit halves, split products)
    import graft.functions.SplitMix64Sql.mixAliases
    s"""WITH ev AS (SELECT event_type, event_id,
       |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS xu FROM events),
       |rep AS (SELECT event_type, event_id, xu,
       |    unnest(generate_series(1, 100)) AS b FROM ev),
       |mx AS (SELECT event_type, b, xu,
       |    CAST(event_id * 128 + b AS HUGEINT) AS x0,
       |    $mixAliases,
       |    CAST(x4 // 65536 AS BIGINT) AS u48
       |  FROM rep),
       |cc AS (SELECT event_type, b, xu, $cSql AS c FROM mx),
       |rb AS (SELECT event_type, b,
       |    CAST(sum(c * xu) // sum(c) AS BIGINT) AS mu
       |  FROM cc GROUP BY 1, 2),
       |ci AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_replicas,
       |    list_sort(list(mu)) AS ms FROM rb GROUP BY 1),
       |pt AS (SELECT event_type,
       |    CAST(sum(xu) // count(*) AS BIGINT) AS mean_u,
       |    CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1)
       |SELECT pt.event_type, pt.n, pt.mean_u, ci.n_replicas,
       |       CAST(ms[3] AS BIGINT) AS lo_u,
       |       CAST(ms[98] AS BIGINT) AS hi_u
       |FROM pt JOIN ci USING (event_type)""".stripMargin
  }) { (s, d) =>
    import graft.functions.SplitMix64.splitmix64
    val th = Seq(103548857136060L, 207097714272121L, 258872142840152L,
      276130285696162L, 280444821410164L, 281307728552965L,
      281451546410098L, 281472091818260L)
    val ev = events(s, d).select(col("event_type"), col("event_id"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("xu"))
    // the draw is the native splitmix64 of (event_id, replica) — an
    // integer key, no string/md5 materialization (30x cheaper; the
    // md5 path measured 57 s at sf0.1, this one ~2 s); top 48 bits
    // land in the same [0, 2^48) domain as the threshold table
    val rep = ev.select(col("event_type"), col("event_id"), col("xu"),
      explode(sequence(lit(1), lit(100))).as("b"))
      .withColumn("u48", shiftrightunsigned(
        splitmix64(col("event_id") * 128 + col("b")), 16))
    val c = th.map(t => when(col("u48") >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    // no c>0 filter: zero-multiplicity rows add 0 to both sums — same
    // result, and the filter would re-evaluate the cascade per row
    val rb = rep.withColumn("c", c)
      .groupBy("event_type", "b")
      .agg(expr("CAST(sum(c * xu) div sum(c) AS BIGINT)").as("mu"))
    val ci = rb.groupBy("event_type")
      .agg(count(lit(1)).as("n_replicas"),
        sort_array(collect_list(col("mu"))).as("ms"))
      .select(col("event_type"), col("n_replicas"),
        element_at(col("ms"), 3).as("lo_u"),
        element_at(col("ms"), 98).as("hi_u"))
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(xu) div count(*) AS BIGINT)").as("mean_u"))
      .join(ci, Seq("event_type"))
      .select(col("event_type"), col("n"), col("mean_u"),
        col("n_replicas"), col("lo_u"), col("hi_u"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per event type between the
    * user-parity arms (distribution-shift readout the t-test can't give:
    * sensitive to shape, not just the mean). The ECDF gap is computed on
    * the ×10⁴ integer value grid, so the per-type state after the first
    * aggregation is bounded by the VALUE DOMAIN (≤ ~5M distinct grid
    * points here), not the corpus — the same bounded-grid trick as
    * `la_quantiles`. Shape: one map-combined shuffle to
    * (type, grid-value), one per-type window over the bounded grid, one
    * final aggregate; cross products go through DECIMAL(38,0) so the
    * numerator max |ca·nb − cb·na| is exact at any corpus size.
    */
  q("la_ks_test",
    """WITH obs AS (
      |  SELECT event_type, user_id % 2 = 0 AS arm_a,
      |         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |  FROM events),
      |vals AS (
      |  SELECT event_type, vu,
      |         CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |         CAST(sum(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM obs GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, vu, ca, cb,
      |         CAST(sum(ca) OVER w AS BIGINT) AS cca,
      |         CAST(sum(cb) OVER w AS BIGINT) AS ccb
      |  FROM vals
      |  WINDOW w AS (PARTITION BY event_type ORDER BY vu
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (
      |  SELECT event_type, CAST(sum(ca) AS BIGINT) AS na,
      |         CAST(sum(cb) AS BIGINT) AS nb
      |  FROM vals GROUP BY 1)
      |SELECT c.event_type, na, nb,
      |       round(CAST(max(abs(CAST(cca AS DECIMAL(38,0)) * nb -
      |                          CAST(ccb AS DECIMAL(38,0)) * na)) AS DOUBLE)
      |             / (CAST(na AS DOUBLE) * nb), 6) AS ks_d
      |FROM cum c JOIN tot t ON c.event_type = t.event_type
      |GROUP BY 1, 2, 3""") { (s, d) =>
    val dec = "decimal(38,0)"
    val obs = events(s, d).select(col("event_type"),
      (col("user_id") % 2 === 0).as("arm_a"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
    val vals = obs.groupBy("event_type", "vu")
      .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm_a"), 0L).otherwise(1L)).as("cb"))
    val w = Window.partitionBy("event_type").orderBy("vu")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .withColumn("cca", sum("ca").over(w))
      .withColumn("ccb", sum("cb").over(w))
    val tot = vals.groupBy("event_type")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
    cum.join(broadcast(tot), "event_type")
      .groupBy(col("event_type"), col("na"), col("nb"))
      .agg(max(abs(col("cca").cast(dec) * col("nb") -
        col("ccb").cast(dec) * col("na"))).as("d_num"))
      .select(col("event_type"), col("na"), col("nb"),
        round(col("d_num").cast("double") /
          (col("na").cast("double") * col("nb")), 6).as("ks_d"))
  }

  /** Mann–Whitney U rank-sum test per event type between the user-parity
    * arms — the non-parametric sibling of `la_ab_ttest` (robust to the
    * heavy-tailed values where the t-test's normality lean is weakest).
    * Average-rank tie handling on the ×10⁴ grid stays integral by
    * carrying 2·rank: for a grid value with c_< values below it and t
    * tied at it, 2·avg_rank = 2·c_< + t + 1, so 2·R_A and 2·U_A are
    * exact DECIMAL(38,0) integers at any corpus size. The normal
    * approximation z uses the standard tie-corrected variance; the
    * float expression is written token-identically in both engines.
    * Same bounded-grid shape as `la_ks_test`: state after the first
    * shuffle is the value domain, not the corpus.
    */
  q("la_mannwhitney",
    """WITH obs AS (
      |  SELECT event_type, user_id % 2 = 0 AS arm_a,
      |         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |  FROM events),
      |vals AS (
      |  SELECT event_type, vu,
      |         CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |         CAST(sum(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM obs GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, ca, cb,
      |         CAST(sum(ca) OVER w AS BIGINT) AS cca,
      |         CAST(sum(cb) OVER w AS BIGINT) AS ccb
      |  FROM vals
      |  WINDOW w AS (PARTITION BY event_type ORDER BY vu
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |st AS (
      |  SELECT event_type,
      |         CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
      |         sum(CAST(ca AS DECIMAL(38,0)) *
      |             (2 * ((cca - ca) + (ccb - cb)) + (ca + cb) + 1)) AS two_ra,
      |         sum(CAST(ca + cb AS DECIMAL(38,0)) * (ca + cb) * (ca + cb)
      |             - (ca + cb)) AS tie3
      |  FROM cum GROUP BY 1),
      |uu AS (
      |  SELECT event_type, na, nb,
      |         two_ra - CAST(na AS DECIMAL(38,0)) * (na + 1) AS u2a, tie3
      |  FROM st)
      |SELECT event_type, na, nb,
      |       round(CAST(u2a AS DOUBLE) / 2, 1) AS u_a,
      |       round((CAST(u2a AS DOUBLE) - CAST(na AS DOUBLE) * nb) /
      |             (2 * sqrt(CAST(na AS DOUBLE) * nb / 12.0 *
      |              ((na + nb + 1) - CAST(tie3 AS DOUBLE) /
      |               (CAST(na + nb AS DOUBLE) * (na + nb - 1))))), 6) AS z
      |FROM uu""") { (s, d) =>
    val dec = "decimal(38,0)"
    val obs = events(s, d).select(col("event_type"),
      (col("user_id") % 2 === 0).as("arm_a"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
    val vals = obs.groupBy("event_type", "vu")
      .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm_a"), 0L).otherwise(1L)).as("cb"))
    val w = Window.partitionBy("event_type").orderBy("vu")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .withColumn("cca", sum("ca").over(w))
      .withColumn("ccb", sum("cb").over(w))
    val st = cum.groupBy("event_type")
      .agg(sum("ca").as("na"), sum("cb").as("nb"),
        sum(col("ca").cast(dec) *
          (lit(2) * ((col("cca") - col("ca")) + (col("ccb") - col("cb"))) +
            (col("ca") + col("cb")) + 1)).as("two_ra"),
        sum((col("ca") + col("cb")).cast(dec) *
          (col("ca") + col("cb")) * (col("ca") + col("cb")) -
          (col("ca") + col("cb"))).as("tie3"))
    st.select(col("event_type"), col("na"), col("nb"),
        (col("two_ra") - col("na").cast(dec) * (col("na") + 1)).as("u2a"),
        col("tie3"))
      .select(col("event_type"), col("na"), col("nb"),
        round(col("u2a").cast("double") / 2, 1).as("u_a"),
        round((col("u2a").cast("double") -
          col("na").cast("double") * col("nb")) /
          (lit(2) * sqrt(col("na").cast("double") * col("nb") / 12.0 *
            ((col("na") + col("nb") + 1) - col("tie3").cast("double") /
              ((col("na") + col("nb")).cast("double") *
                (col("na") + col("nb") - 1))))), 6).as("z"))
  }

  /** Forecast-accuracy backtest per event type: one-step naive (lag-1)
    * vs seasonal-naive (lag-7) absolute error over the daily mean
    * series, plus MASE (Hyndman & Koehler 2006) — the standard "is
    * your seasonal model beating persistence?" gate run before
    * trusting `ts_holt_winters`. Exact integers end to end on the
    * ×10⁴ day-mean grid: summed absolute errors, floor-divided MAEs,
    * and mase_ppm = mae_snaive·10⁶ div mae_naive replayed identically
    * by the oracle (dividing the pre-floored MAEs keeps every product
    * under 2⁶³ at any horizon). Lags are observation lags over the
    * BOUNDED day grid — per-type window state is the calendar, not
    * the corpus.
    */
  q("ts_mase",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |lagd AS (
      |  SELECT event_type, st, xu,
      |         lag(xu, 1) OVER w AS x1, lag(xu, 7) OVER w AS x7
      |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY st)),
      |agg AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |         CAST(count(x1) AS BIGINT) AS n_naive,
      |         CAST(count(x7) AS BIGINT) AS n_snaive,
      |         CAST(coalesce(sum(abs(xu - x1)), 0) AS BIGINT) AS sae_naive,
      |         CAST(coalesce(sum(abs(xu - x7)), 0) AS BIGINT) AS sae_snaive
      |  FROM lagd GROUP BY 1),
      |mae AS (
      |  SELECT event_type, n_days, n_naive, n_snaive,
      |         CASE WHEN n_naive > 0
      |              THEN CAST(sae_naive // n_naive AS BIGINT) END
      |           AS mae_naive_u,
      |         CASE WHEN n_snaive > 0
      |              THEN CAST(sae_snaive // n_snaive AS BIGINT) END
      |           AS mae_snaive_u
      |  FROM agg)
      |SELECT event_type, n_days, n_naive, n_snaive,
      |       mae_naive_u, mae_snaive_u,
      |       CASE WHEN mae_naive_u > 0 AND mae_snaive_u IS NOT NULL
      |            THEN CAST(mae_snaive_u * 1000000 // mae_naive_u
      |                      AS BIGINT) END AS mase_ppm
      |FROM mae""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val w = Window.partitionBy("event_type").orderBy("st")
    val lagd = daily
      .withColumn("x1", lag("xu", 1).over(w))
      .withColumn("x7", lag("xu", 7).over(w))
    val agg = lagd.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        count(col("x1")).as("n_naive"),
        count(col("x7")).as("n_snaive"),
        coalesce(sum(abs(col("xu") - col("x1"))), lit(0L)).as("sae_naive"),
        coalesce(sum(abs(col("xu") - col("x7"))), lit(0L)).as("sae_snaive"))
    agg.select(col("event_type"), col("n_days"), col("n_naive"),
        col("n_snaive"),
        when(col("n_naive") > 0,
          expr("sae_naive div n_naive")).as("mae_naive_u"),
        when(col("n_snaive") > 0,
          expr("sae_snaive div n_snaive")).as("mae_snaive_u"))
      .withColumn("mase_ppm",
        when(col("mae_naive_u") > 0 && col("mae_snaive_u").isNotNull,
          expr("mae_snaive_u * 1000000L div mae_naive_u")))
  }

  /** Kaplan-Meier survival of user lifetimes per event type — the
    * censoring-aware retention curve (a plain churn histogram
    * understates survival because still-active users haven't churned
    * YET). Lifetime = last−first active day; users last seen within
    * 7 days of the stream's end are right-censored (they reduce the
    * at-risk set but contribute no event). S(t) chains the product
    * Π(1 − dᵢ/nᵢ) as exact ppm integers — sᵢ = sᵢ₋₁·(nᵢ−dᵢ) div nᵢ
    * over ascending t — via the type-keyed sorted-array fold
    * (`ts_holt`'s shape: the corpus reaches the fold only as
    * duration-grid rows; the oracle replays with a recursive CTE
    * carrying the identical floor division). At-risk counts are a
    * descending cumulative sum over the bounded duration grid.
    */
  q("la_kaplan_meier",
    """WITH RECURSIVE dy AS (
      |  SELECT event_type, user_id,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS dy
      |  FROM events),
      |lif AS (SELECT event_type, user_id, min(dy) AS f, max(dy) AS l
      |        FROM dy GROUP BY 1, 2),
      |gm AS (SELECT event_type, max(l) AS gmax FROM lif GROUP BY 1),
      |base AS (
      |  SELECT l.event_type, (l.l - l.f) // 86400 AS t,
      |         CASE WHEN l.l >= gm.gmax - 604800 THEN 1 ELSE 0 END AS cens
      |  FROM lif l JOIN gm ON gm.event_type = l.event_type),
      |dt AS (SELECT event_type, t, CAST(count(*) AS BIGINT) AS m,
      |              CAST(sum(1 - cens) AS BIGINT) AS d
      |       FROM base GROUP BY 1, 2),
      |risk AS (
      |  SELECT event_type, t, d,
      |         CAST(sum(m) OVER (PARTITION BY event_type ORDER BY t DESC
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |              AS BIGINT) AS n,
      |         CAST(row_number() OVER (PARTITION BY event_type
      |              ORDER BY t) AS BIGINT) AS rn
      |  FROM dt),
      |r AS (
      |  SELECT event_type, t, d, n, rn,
      |         CAST(1000000 * (n - d) // n AS BIGINT) AS s
      |  FROM risk WHERE rn = 1
      |  UNION ALL
      |  SELECT x.event_type, x.t, x.d, x.n, x.rn,
      |         CAST((r.s * (x.n - x.d)) // x.n AS BIGINT)
      |  FROM r JOIN risk x ON x.event_type = r.event_type
      |                    AND x.rn = r.rn + 1)
      |SELECT event_type, t AS t_days, d AS n_events, n AS n_risk,
      |       s AS s_ppm
      |FROM r""") { (s, d) =>
    val lif = events(s, d)
      .select(col("event_type"), col("user_id"),
        unix_timestamp(date_trunc("day", col("ts"))).as("dy"))
      .groupBy("event_type", "user_id")
      .agg(min("dy").as("f"), max("dy").as("l"))
    val gm = lif.groupBy("event_type").agg(max("l").as("gmax"))
    val base = lif.join(gm, "event_type")
      .select(col("event_type"),
        expr("(l - f) div 86400").as("t"),
        when(col("l") >= col("gmax") - 604800L, 1L).otherwise(0L)
          .as("cens"))
    val dt = base.groupBy("event_type", "t")
      .agg(count(lit(1)).as("m"), sum(lit(1L) - col("cens")).as("d"))
    val w = Window.partitionBy("event_type").orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = dt.withColumn("n", sum("m").over(w))
    risk.groupBy("event_type")
      .agg(sort_array(collect_list(
        struct(col("t"), col("d"), col("n")))).as("rows"))
      .select(col("event_type"), explode(expr(
        """aggregate(rows,
          |  CAST(named_struct('out', array(), 's', 1000000L) AS
          |    STRUCT<out: ARRAY<STRUCT<t: BIGINT, d: BIGINT,
          |                             n: BIGINT, s: BIGINT>>,
          |           s: BIGINT>),
          |  (acc, x) -> named_struct(
          |    'out', concat(acc.out, array(named_struct(
          |      't', x.t, 'd', x.d, 'n', x.n,
          |      's', (acc.s * (x.n - x.d)) div x.n))),
          |    's', (acc.s * (x.n - x.d)) div x.n),
          |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("event_type"), col("r.t").as("t_days"),
        col("r.d").as("n_events"), col("r.n").as("n_risk"),
        col("r.s").as("s_ppm"))
  }

  /** Difference-in-differences estimate per event type: user-parity
    * arms (the la_ks/la_ab_ttest convention), pre/post periods split
    * at the midpoint of the observed day range (deterministic integer
    * pivot). The four cell means live on the ×10⁴ grid as exact
    * floor-divided integers and did_u = (postA−preA)−(postB−preB)
    * replays as pure BIGINT arithmetic. One map-combined aggregate;
    * state = 4 cells per event type regardless of volume.
    */
  q("la_diff_in_diff",
    """WITH b AS (
      |  SELECT event_type, user_id % 2 = 0 AS arm_a,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |  FROM events),
      |piv AS (
      |  SELECT event_type,
      |         min(st) + (max(st) - min(st)) // 2 AS pvt
      |  FROM b GROUP BY 1),
      |cells AS (
      |  SELECT b.event_type,
      |         CAST(sum(CASE WHEN arm_a AND st < pvt THEN vu ELSE 0 END)
      |              AS BIGINT) AS s_pre_a,
      |         CAST(sum(CASE WHEN arm_a AND st < pvt THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_pre_a,
      |         CAST(sum(CASE WHEN arm_a AND st >= pvt THEN vu ELSE 0 END)
      |              AS BIGINT) AS s_post_a,
      |         CAST(sum(CASE WHEN arm_a AND st >= pvt THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_post_a,
      |         CAST(sum(CASE WHEN NOT arm_a AND st < pvt THEN vu ELSE 0 END)
      |              AS BIGINT) AS s_pre_b,
      |         CAST(sum(CASE WHEN NOT arm_a AND st < pvt THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_pre_b,
      |         CAST(sum(CASE WHEN NOT arm_a AND st >= pvt THEN vu ELSE 0 END)
      |              AS BIGINT) AS s_post_b,
      |         CAST(sum(CASE WHEN NOT arm_a AND st >= pvt THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_post_b
      |  FROM b JOIN piv ON piv.event_type = b.event_type
      |  GROUP BY 1)
      |SELECT event_type,
      |       n_pre_a, n_post_a, n_pre_b, n_post_b,
      |       CAST(s_pre_a // n_pre_a AS BIGINT) AS pre_a_u,
      |       CAST(s_post_a // n_post_a AS BIGINT) AS post_a_u,
      |       CAST(s_pre_b // n_pre_b AS BIGINT) AS pre_b_u,
      |       CAST(s_post_b // n_post_b AS BIGINT) AS post_b_u,
      |       CAST((s_post_a // n_post_a - s_pre_a // n_pre_a) -
      |            (s_post_b // n_post_b - s_pre_b // n_pre_b)
      |            AS BIGINT) AS did_u
      |FROM cells
      |WHERE n_pre_a > 0 AND n_post_a > 0 AND n_pre_b > 0 AND n_post_b > 0
      |""") { (s, d) =>
    val b = events(s, d).select(col("event_type"),
      (col("user_id") % 2 === 0).as("arm_a"),
      unix_timestamp(date_trunc("day", col("ts"))).as("st"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
    val piv = b.groupBy("event_type")
      .agg(expr("min(st) + (max(st) - min(st)) div 2").as("pvt"))
    def cell(p: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
      sum(when(p, v).otherwise(0L))
    val cells = b.join(piv, "event_type")
      .groupBy("event_type")
      .agg(
        cell(col("arm_a") && col("st") < col("pvt"), col("vu")).as("s_pre_a"),
        cell(col("arm_a") && col("st") < col("pvt"), lit(1L)).as("n_pre_a"),
        cell(col("arm_a") && col("st") >= col("pvt"), col("vu")).as("s_post_a"),
        cell(col("arm_a") && col("st") >= col("pvt"), lit(1L)).as("n_post_a"),
        cell(!col("arm_a") && col("st") < col("pvt"), col("vu")).as("s_pre_b"),
        cell(!col("arm_a") && col("st") < col("pvt"), lit(1L)).as("n_pre_b"),
        cell(!col("arm_a") && col("st") >= col("pvt"), col("vu")).as("s_post_b"),
        cell(!col("arm_a") && col("st") >= col("pvt"), lit(1L)).as("n_post_b"))
    cells
      .filter(col("n_pre_a") > 0 && col("n_post_a") > 0 &&
        col("n_pre_b") > 0 && col("n_post_b") > 0)
      .select(col("event_type"),
        col("n_pre_a"), col("n_post_a"), col("n_pre_b"), col("n_post_b"),
        expr("s_pre_a div n_pre_a").as("pre_a_u"),
        expr("s_post_a div n_post_a").as("post_a_u"),
        expr("s_pre_b div n_pre_b").as("pre_b_u"),
        expr("s_post_b div n_post_b").as("post_b_u"),
        expr("""(s_post_a div n_post_a - s_pre_a div n_pre_a) -
               |(s_post_b div n_post_b - s_pre_b div n_pre_b)"""
          .stripMargin).as("did_u"))
  }

  /** Single-breakpoint binary segmentation per event type (the first
    * split CUSUM's drift statistic only hints at): the day t whose
    * left/right mean gap is largest. The standard mean-shift scan,
    * kept EXACT: with prefix sum Sₗ over the ×10⁴ day means, the gap
    * |Sₗ/t − Sᵣ/(T−t)| ranks by the µ-scaled integer
    * num·10⁶ div (t·(T−t)) where num = |Sₗ·(T−t) − Sᵣ·t| — one
    * DECIMAL-exact product, floor-divided identically by both engines
    * (all positive), tie-broken to the earliest day. Window state is
    * the per-type day grid (the calendar, not the corpus); guard
    * segments of ≥ 2 days on each side.
    */
  q("ts_breakpoint",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |cum AS (
      |  SELECT event_type, st, xu,
      |         CAST(row_number() OVER w AS BIGINT) AS rn,
      |         CAST(sum(xu) OVER w AS BIGINT) AS sl,
      |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS t_n,
      |         CAST(sum(xu) OVER (PARTITION BY event_type) AS BIGINT) AS s_n
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY st
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |cand AS (
      |  SELECT event_type, st, rn, t_n,
      |         sl // rn AS mean_left_u,
      |         (s_n - sl) // (t_n - rn) AS mean_right_u,
      |         CAST(abs(CAST(sl AS HUGEINT) * (t_n - rn) -
      |                  CAST(s_n - sl AS HUGEINT) * rn) * 1000000
      |              // (rn * (t_n - rn)) AS BIGINT) AS score_u
      |  FROM cum WHERE rn >= 2 AND rn <= t_n - 2),
      |best AS (
      |  SELECT event_type, st, rn, t_n, mean_left_u, mean_right_u, score_u,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY score_u DESC, rn) AS pick
      |  FROM cand)
      |SELECT event_type, st AS split_day, CAST(rn AS BIGINT) AS split_idx,
      |       t_n AS n_days, CAST(mean_left_u AS BIGINT) AS mean_left_u,
      |       CAST(mean_right_u AS BIGINT) AS mean_right_u, score_u
      |FROM best WHERE pick = 1""") { (s, d) =>
    val dec = "decimal(38,0)"
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val w = Window.partitionBy("event_type").orderBy("st")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("event_type")
    val cum = daily
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("st")).cast("long"))
      .withColumn("sl", sum("xu").over(w))
      .withColumn("t_n", count(lit(1)).over(whole))
      .withColumn("s_n", sum("xu").over(whole))
    val cand = cum
      .filter(col("rn") >= 2 && col("rn") <= col("t_n") - 2)
      .select(col("event_type"), col("st"), col("rn"), col("t_n"),
        expr("sl div rn").as("mean_left_u"),
        expr("(s_n - sl) div (t_n - rn)").as("mean_right_u"),
        expr(s"""abs(CAST(sl AS $dec) * (t_n - rn) -
                |    CAST(s_n - sl AS $dec) * rn) * 1000000
                |  div (rn * (t_n - rn))""".stripMargin).as("score_u"))
    cand.withColumn("pick", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("score_u").desc, col("rn"))))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("st").as("split_day"),
        col("rn").as("split_idx"), col("t_n").as("n_days"),
        col("mean_left_u"), col("mean_right_u"), col("score_u"))
  }

  /** Spearman rank correlation between event value and hour-of-day per
    * event type — the monotone-association audit (does this metric
    * drift across the day?) that Pearson (`x_corr`) misses under
    * nonlinearity and heavy tails. NEVER a global row rank: with ties
    * handled by average ranks, every row at grid value v shares rank
    * (2·c_<(v) + t(v) + 1)/2, so ranks live on the BOUNDED grid —
    * cumulative counts over the ×10⁴ value grid and the 24-hour grid,
    * carried as 2·rank to stay integral. Spearman = Pearson on those
    * ranks, accumulated over the joint (value, hour) grid in exact
    * DECIMAL(38,0); the only corpus-sized pass is the first
    * map-combined joint-grid count. The final float combination is
    * written token-identically in both engines.
    */
  q("la_spearman",
    """WITH obs AS (
      |  SELECT event_type, CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu,
      |         CAST(hour(ts) AS BIGINT) AS hu
      |  FROM events),
      |joint AS (
      |  SELECT event_type, vu, hu, CAST(count(*) AS BIGINT) AS c
      |  FROM obs GROUP BY 1, 2, 3),
      |mx AS (SELECT event_type, vu, CAST(sum(c) AS BIGINT) AS cx
      |       FROM joint GROUP BY 1, 2),
      |mxr AS (
      |  SELECT event_type, vu,
      |         2 * (CAST(sum(cx) OVER w AS BIGINT) - cx) + cx + 1 AS rx2
      |  FROM mx
      |  WINDOW w AS (PARTITION BY event_type ORDER BY vu
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |my AS (SELECT event_type, hu, CAST(sum(c) AS BIGINT) AS cy
      |       FROM joint GROUP BY 1, 2),
      |myr AS (
      |  SELECT event_type, hu,
      |         2 * (CAST(sum(cy) OVER w AS BIGINT) - cy) + cy + 1 AS ry2
      |  FROM my
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hu
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |j AS (SELECT joint.event_type, c, rx2, ry2
      |      FROM joint
      |      JOIN mxr USING (event_type, vu)
      |      JOIN myr USING (event_type, hu)),
      |st AS (
      |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
      |         sum(CAST(c AS DECIMAL(38,0)) * rx2) AS sx,
      |         sum(CAST(c AS DECIMAL(38,0)) * ry2) AS sy,
      |         sum(CAST(c AS DECIMAL(38,0)) * rx2 * rx2) AS sxx,
      |         sum(CAST(c AS DECIMAL(38,0)) * ry2 * ry2) AS syy,
      |         sum(CAST(c AS DECIMAL(38,0)) * rx2 * ry2) AS sxy
      |  FROM j GROUP BY 1)
      |SELECT event_type, n,
      |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
      |              CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |             sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
      |                   CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |                  (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
      |                   CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |         AS rho_s
      |FROM st""") { (s, d) =>
    val dec = "decimal(38,0)"
    val obs = events(s, d).select(col("event_type"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"),
      hour(col("ts")).cast("long").as("hu"))
    val joint = obs.groupBy("event_type", "vu", "hu")
      .agg(count(lit(1)).as("c"))
    def rank2(grid: String, cnt: String, out: String) = {
      val w = Window.partitionBy("event_type").orderBy(grid)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joint.groupBy(col("event_type"), col(grid))
        .agg(sum("c").as(cnt))
        .withColumn(out,
          lit(2) * (sum(cnt).over(w) - col(cnt)) + col(cnt) + 1)
        .drop(cnt)
    }
    val j = joint
      .join(rank2("vu", "cx", "rx2"), Seq("event_type", "vu"))
      .join(rank2("hu", "cy", "ry2"), Seq("event_type", "hu"))
    j.groupBy("event_type")
      .agg(sum("c").as("n"),
        sum(col("c").cast(dec) * col("rx2")).as("sx"),
        sum(col("c").cast(dec) * col("ry2")).as("sy"),
        sum(col("c").cast(dec) * col("rx2") * col("rx2")).as("sxx"),
        sum(col("c").cast(dec) * col("ry2") * col("ry2")).as("syy"),
        sum(col("c").cast(dec) * col("rx2") * col("ry2")).as("sxy"))
      .select(col("event_type"), col("n"),
        round((col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          sqrt((col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
            (col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("rho_s"))
  }

  /** Benford first-significant-digit audit of the value column — the
    * classic fabricated-/templated-data screen (natural multi-scale
    * measurements follow log10(1+1/d); synthetic or clipped feeds
    * don't). The first digit is exact INTEGER string arithmetic on the
    * ×10⁴ grid (leading char of the BIGINT's decimal form — no
    * log10() float knife-edge at powers of ten), shares are ppm floor
    * divisions, and the 9 Benford reference shares are compile-time
    * literals — so the 9-row audit hash-matches. One map-combined
    * aggregate; the digit domain is 9 regardless of corpus size.
    */
  q("la_benford", {
    val bf = Seq(301029, 176091, 124938, 96910, 79181, 66946, 57991,
      51152, 45757)
    val vals = bf.zipWithIndex.map { case (p, i) => s"(${i + 1}, $p)" }
      .mkString(", ")
    s"""WITH v AS (SELECT CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
       |           FROM events WHERE value > 0),
       |fd AS (SELECT CAST(substr(CAST(vu AS VARCHAR), 1, 1) AS INT) AS digit
       |       FROM v WHERE vu >= 1),
       |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM fd GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c),
       |bf AS (SELECT * FROM (VALUES $vals) AS t(digit, benford_ppm))
       |SELECT c.digit, c.n,
       |       CAST(c.n * 1000000 // t AS BIGINT) AS share_ppm,
       |       CAST(bf.benford_ppm AS INT) AS benford_ppm,
       |       CAST(c.n * 1000000 // t AS BIGINT) - bf.benford_ppm AS dev_ppm
       |FROM c JOIN bf USING (digit), tot""".stripMargin
  }) { (s, d) =>
    val bf = Seq(301029, 176091, 124938, 96910, 79181, 66946, 57991,
      51152, 45757)
    val spark = s
    import spark.implicits._
    val bfDf = bf.zipWithIndex.map { case (p, i) => (i + 1, p) }
      .toDF("digit", "benford_ppm")
    val fd = events(s, d).filter(col("value") > 0)
      .select(expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
      .filter(col("vu") >= 1)
      .select(substring(col("vu").cast("string"), 1, 1).cast("int")
        .as("digit"))
    val c = fd.groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = c.agg(sum("n").as("t"))
    c.crossJoin(broadcast(tot)).join(broadcast(bfDf), "digit")
      .select(col("digit"), col("n"),
        expr("n * 1000000L div t").as("share_ppm"), col("benford_ppm"),
        (expr("n * 1000000L div t") - col("benford_ppm")).as("dev_ppm"))
  }

  /** Theil–Sen robust trend slope of the per-type daily composite —
    * the breakdown-resistant sibling of `k1_regr_slope` (a single
    * corrupted day moves OLS arbitrarily; the median pairwise slope
    * tolerates ~29% outliers). Pairs are formed AFTER the daily
    * aggregation, so the self-join is O(days²) per type — bounded by
    * the calendar span squared (a year ⇒ ~66k pairs/type), never by
    * the corpus. The median is the lower median (rank ⌈n/2⌉) over a
    * total order (slope double, then dy, dx) — the IEEE quotient
    * CAST(dy AS DOUBLE)/dx is bit-identical across engines for equal
    * integer inputs, so the oracle hash-matches without a grid trick.
    * Shape: one map-combined daily aggregation, one per-type
    * self-join + window — all exchanges on event_type.
    */
  q("ts_theil_sen",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
      |           AS xd,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |p AS (
      |  SELECT a.event_type, b.xu - a.xu AS dy, b.xd - a.xd AS dx
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.xd < b.xd),
      |r AS (
      |  SELECT event_type, CAST(dy AS DOUBLE) / dx AS sl, dy, dx,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY CAST(dy AS DOUBLE) / dx, dy, dx) AS rn,
      |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
      |           AS n_pairs
      |  FROM p)
      |SELECT event_type, n_pairs, round(sl, 6) AS sen_slope
      |FROM r WHERE rn = (n_pairs + 1) // 2""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('day', ts)) div 86400").as("xd"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val a = daily.as("a")
    val b = daily.as("b")
    val p = a.join(b,
        col("a.event_type") === col("b.event_type") &&
          col("a.xd") < col("b.xd"))
      .select(col("a.event_type").as("event_type"),
        (col("b.xu") - col("a.xu")).as("dy"),
        (col("b.xd") - col("a.xd")).as("dx"))
      .withColumn("sl", col("dy").cast("double") / col("dx"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("sl"), col("dy"), col("dx"))
    p.withColumn("rn", row_number().over(w))
      .withColumn("n_pairs",
        count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("event_type"), col("n_pairs"),
        round(col("sl"), 6).as("sen_slope"))
  }

  /** Ljung–Box portmanteau whiteness test (lags 1–5) on the per-type
    * daily composite — the "is there ANY serial structure left"
    * companion to `ts_acf` (and the standard residual gate after
    * `ts_holt`/`ts_holt_winters`): Q = n(n+2)·Σ r_k²/(n−k). The
    * autocorrelation numerators/denominator are the SAME exact
    * integer sums as ts_acf (order-independent longs); the only float
    * steps are the final token-identical expression shared with the
    * oracle, so the match is exact, not rounding-lucky. Shape: one
    * (type, day) map-combined aggregation, one per-type window over
    * daily rows — time-bounded state, one exchange on event_type.
    */
  q("ts_ljung_box",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |mu AS (
      |  SELECT event_type,
      |         CAST(sum(xu) // count(*) AS BIGINT) AS m,
      |         CAST(count(*) AS BIGINT) AS n_days
      |  FROM daily GROUP BY event_type),
      |dev AS (
      |  SELECT d.event_type, m.n_days, d.st, d.xu - m.m AS dv
      |  FROM daily d JOIN mu m USING (event_type)),
      |led AS (
      |  SELECT event_type, n_days, dv,
      |         lead(dv, 1) OVER w AS d1, lead(dv, 2) OVER w AS d2,
      |         lead(dv, 3) OVER w AS d3, lead(dv, 4) OVER w AS d4,
      |         lead(dv, 5) OVER w AS d5
      |  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY st)),
      |sums AS (
      |  SELECT event_type, max(n_days) AS n_days,
      |         sum(dv * dv) AS den,
      |         sum(dv * d1) AS s1, sum(dv * d2) AS s2,
      |         sum(dv * d3) AS s3, sum(dv * d4) AS s4,
      |         sum(dv * d5) AS s5
      |  FROM led GROUP BY event_type)
      |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
      |       round(CAST(n_days AS DOUBLE) * (n_days + 2) *
      |         ((((CAST(s1 AS DOUBLE) / CAST(den AS DOUBLE)) *
      |            (CAST(s1 AS DOUBLE) / CAST(den AS DOUBLE)) / (n_days - 1) +
      |            (CAST(s2 AS DOUBLE) / CAST(den AS DOUBLE)) *
      |            (CAST(s2 AS DOUBLE) / CAST(den AS DOUBLE)) / (n_days - 2)) +
      |            (CAST(s3 AS DOUBLE) / CAST(den AS DOUBLE)) *
      |            (CAST(s3 AS DOUBLE) / CAST(den AS DOUBLE)) / (n_days - 3)) +
      |            (CAST(s4 AS DOUBLE) / CAST(den AS DOUBLE)) *
      |            (CAST(s4 AS DOUBLE) / CAST(den AS DOUBLE)) / (n_days - 4) +
      |            (CAST(s5 AS DOUBLE) / CAST(den AS DOUBLE)) *
      |            (CAST(s5 AS DOUBLE) / CAST(den AS DOUBLE)) / (n_days - 5)),
      |         6) AS q_lb
      |FROM sums""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val mu = daily.groupBy("event_type")
      .agg(expr("sum(xu) div count(*)").as("m"),
        count(lit(1)).as("n_days"))
    val w = Window.partitionBy("event_type").orderBy("st")
    val led = daily.join(mu, "event_type")
      .withColumn("dv", col("xu") - col("m"))
      .select(col("event_type") +: col("n_days") +: col("dv") +:
        (1 to 5).map(l => lead(col("dv"), l).over(w).as(s"d$l")): _*)
    val aggs = max(col("n_days")).as("n_days") +:
      sum(col("dv") * col("dv")).as("den") +:
      (1 to 5).map(l => sum(col("dv") * col(s"d$l")).as(s"s$l"))
    val sums = led.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    def r(l: Int) = col(s"s$l").cast("double") / col("den").cast("double")
    def term(l: Int) = r(l) * r(l) / (col("n_days") - l)
    // FP addition is non-associative, so the summation grouping must be
    // token-identical to the oracle text. The SQL has no parens around
    // the t4+t5 pair, so SQL left-associativity yields
    // ((((t1 + t2) + t3) + t4) + t5) — mirror exactly (r9 advisory: the
    // previous (t4 + t5) grouping could differ by ~1 ulp pre-round and
    // flip a knife-edge rounded value between engines).
    val q15 = (((term(1) + term(2)) + term(3)) + term(4)) + term(5)
    sums.select(col("event_type"), col("n_days"),
      round(col("n_days").cast("double") * (col("n_days") + 2) * q15, 6)
        .as("q_lb"))
  }

  /** Dynamic-time-warping distance between every PAIR of event types'
    * daily composites — the alignment-tolerant series similarity that
    * `ts_xcorr`'s fixed-lag correlation can't give (two series with
    * the same shape but drifting phase correlate poorly at every
    * single lag; DTW warps time to match them). Exact integers end to
    * end: cost = |Δxu| on the ×10⁴ grid, and the full O(n·m) DP runs
    * as ONE linear fold over the flattened cell sequence with a
    * sliding (m+1)-wide window as the accumulator (A holds
    * D[k−m−1..k−1], so left/up/diag are A[end]/A[2]/A[1]; border
    * cells read an INF sentinel) — no recursion, no UDF, and the
    * identical fold replays in DuckDB list_reduce, so the oracle
    * hash-matches bit for bit. Scale: the series are CALENDAR-bounded
    * (the K1–K5 kernel contract — days, never rows), pairs are
    * types², and each pair's fold is O(n·m) cells × O(m) window copy
    * — at a year of days ~49M long-copies per pair, still bounded by
    * the calendar; for multi-year horizons the Sakoe-Chiba banded
    * twin `ts_dtw_pairs_banded` caps |i−j| and shrinks both factors
    * (r10 — parity-spec'd against this full form in DtwBandSpec).
    */
  q("ts_dtw_pairs",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |ser AS (
      |  SELECT event_type, list(xu ORDER BY st) AS ys,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM daily GROUP BY 1),
      |p AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         a.n AS n_a, b.n AS n_b, a.ys AS xs, b.ys AS ys
      |  FROM ser a JOIN ser b ON a.event_type < b.event_type),
      |dpp AS (
      |  SELECT type_a, type_b, n_a, n_b,
      |    list_reduce(
      |      list_prepend(
      |        list_transform(range(0, CAST(n_b + 1 AS INT)),
      |                       z -> CAST(9000000000000000 AS BIGINT)),
      |        list_transform(range(0, CAST(n_a * n_b AS INT)),
      |                       k -> [CAST(k AS BIGINT)])),
      |      (A, kk) -> list_append(
      |        A[2:],
      |        abs(xs[CAST(kk[1] // n_b AS INT) + 1] -
      |            ys[CAST(kk[1] % n_b AS INT) + 1]) +
      |        CASE WHEN kk[1] = 0 THEN 0
      |             ELSE least(
      |               CASE WHEN kk[1] % n_b = 0
      |                    THEN CAST(9000000000000000 AS BIGINT)
      |                    ELSE A[len(A)] END,
      |               CASE WHEN kk[1] // n_b = 0
      |                    THEN CAST(9000000000000000 AS BIGINT)
      |                    ELSE A[2] END,
      |               CASE WHEN kk[1] % n_b = 0 OR kk[1] // n_b = 0
      |                    THEN CAST(9000000000000000 AS BIGINT)
      |                    ELSE A[1] END) END)) AS dp
      |  FROM p)
      |SELECT type_a, type_b, n_a, n_b,
      |       CAST(dp[len(dp)] AS BIGINT) AS dtw_u,
      |       CAST(dp[len(dp)] // (n_a + n_b) AS BIGINT) AS dtw_per_step_u
      |FROM dpp""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val ser = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("st"), col("xu"))))
        .as("days"))
      .select(col("event_type"),
        expr("transform(days, x -> x.xu)").as("ys"),
        size(col("days")).cast("long").as("n"))
    val a = ser.as("a")
    val b = ser.as("b")
    a.join(b, col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        col("a.ys").as("xs"), col("b.ys").as("ys"))
      .withColumn("dtw_u", expr(
        """element_at(
          |  aggregate(
          |    sequence(0L, n_a * n_b - 1),
          |    array_repeat(9000000000000000L, CAST(n_b + 1 AS INT)),
          |    (A, k) -> concat(
          |      slice(A, 2, size(A) - 1),
          |      array(
          |        abs(element_at(xs, CAST(k div n_b AS INT) + 1) -
          |            element_at(ys, CAST(k % n_b AS INT) + 1)) +
          |        CASE WHEN k = 0L THEN 0L
          |             ELSE least(
          |               CASE WHEN k % n_b = 0 THEN 9000000000000000L
          |                    ELSE element_at(A, size(A)) END,
          |               CASE WHEN k div n_b = 0 THEN 9000000000000000L
          |                    ELSE element_at(A, 2) END,
          |               CASE WHEN k % n_b = 0 OR k div n_b = 0
          |                    THEN 9000000000000000L
          |                    ELSE element_at(A, 1) END) END))),
          |  -1)""".stripMargin))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("dtw_u"), expr("dtw_u div (n_a + n_b)").as("dtw_per_step_u"))
  }

  /** Sakoe-Chiba BANDED DTW (Sakoe & Chiba 1978) — the scale path for
    * multi-year horizons the full `ts_dtw_pairs` docstring promises:
    * warping is restricted to |i−j| ≤ band (phase drift beyond `band`
    * days is no longer considered alignment), so the DP visits
    * n_a·w cells of a FIXED-WIDTH band (w = 2·band_eff+1, cell c in
    * row i maps to column j = i + c − band_eff; out-of-range columns
    * are INF pad) instead of n_a·n_b — and the fold's accumulator
    * window shrinks from m+1 to w, cutting the per-cell copy the same
    * way. Total long-copies drop from n·m·(m+1) to n·w² (~600× at a
    * 2-year daily series with band 14). band_eff =
    * max(band, |n_a−n_b|) per pair — the standard validity floor
    * (a monotone path must bridge the length gap). Neighbor offsets in
    * the w-window: diag = A[1] (k−w), up = A[2] (k−w+1), left =
    * A[end]; the answer sits at window position band_eff+1+n_b−n_a.
    * Same exact-integer grid as the full form; DuckDB replays the
    * identical banded fold, and DtwBandSpec pins (a) banded ≡ full
    * when band ≥ series length and (b) banded ≥ full always.
    */
  q("ts_dtw_pairs_banded",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |ser AS (
      |  SELECT event_type, list(xu ORDER BY st) AS ys,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM daily GROUP BY 1),
      |p AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         a.n AS n_a, b.n AS n_b, a.ys AS xs, b.ys AS ys,
      |         greatest(CAST(14 AS BIGINT), abs(a.n - b.n)) AS band_eff,
      |         2 * greatest(CAST(14 AS BIGINT), abs(a.n - b.n)) + 1 AS w
      |  FROM ser a JOIN ser b ON a.event_type < b.event_type),
      |dpp AS (
      |  SELECT type_a, type_b, n_a, n_b, band_eff, w,
      |    list_reduce(
      |      list_prepend(
      |        list_transform(range(0, CAST(w AS INT)),
      |                       z -> CAST(9000000000000000 AS BIGINT)),
      |        list_transform(range(0, CAST(n_a * w AS INT)),
      |                       k -> [CAST(k AS BIGINT)])),
      |      (A, kk) -> list_append(
      |        A[2:],
      |        CASE WHEN (kk[1] // w) + (kk[1] % w) - band_eff < 0
      |                  OR (kk[1] // w) + (kk[1] % w) - band_eff >= n_b
      |             THEN CAST(9000000000000000 AS BIGINT)
      |             ELSE abs(xs[CAST(kk[1] // w AS INT) + 1] -
      |                      ys[CAST((kk[1] // w) + (kk[1] % w) - band_eff
      |                              AS INT) + 1]) +
      |                  CASE WHEN kk[1] // w = 0
      |                            AND (kk[1] % w) - band_eff = 0 THEN 0
      |                       ELSE least(
      |                         CASE WHEN kk[1] % w = 0
      |                                   OR (kk[1] // w) + (kk[1] % w)
      |                                      - band_eff = 0
      |                              THEN CAST(9000000000000000 AS BIGINT)
      |                              ELSE A[len(A)] END,
      |                         CASE WHEN kk[1] // w = 0 OR kk[1] % w = w - 1
      |                              THEN CAST(9000000000000000 AS BIGINT)
      |                              ELSE A[2] END,
      |                         CASE WHEN kk[1] // w = 0
      |                                   OR (kk[1] // w) + (kk[1] % w)
      |                                      - band_eff = 0
      |                              THEN CAST(9000000000000000 AS BIGINT)
      |                              ELSE A[1] END) END
      |        END)) AS dp
      |  FROM p)
      |SELECT type_a, type_b, n_a, n_b,
      |       CAST(dp[CAST(band_eff + 1 + n_b - n_a AS INT)] AS BIGINT)
      |         AS dtw_band_u,
      |       CAST(dp[CAST(band_eff + 1 + n_b - n_a AS INT)] // (n_a + n_b)
      |            AS BIGINT) AS dtw_band_per_step_u
      |FROM dpp""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val ser = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("st"), col("xu"))))
        .as("days"))
      .select(col("event_type"),
        expr("transform(days, x -> x.xu)").as("ys"),
        size(col("days")).cast("long").as("n"))
    val a = ser.as("a")
    val b = ser.as("b")
    a.join(b, col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        col("a.ys").as("xs"), col("b.ys").as("ys"))
      .withColumn("band_eff",
        greatest(lit(14L), abs(col("n_a") - col("n_b"))))
      .withColumn("w", lit(2L) * col("band_eff") + 1L)
      .withColumn("dtw_band_u", expr(
        """element_at(
          |  aggregate(
          |    sequence(0L, n_a * w - 1),
          |    array_repeat(9000000000000000L, CAST(w AS INT)),
          |    (A, k) -> concat(
          |      slice(A, 2, size(A) - 1),
          |      array(
          |        CASE WHEN (k div w) + (k % w) - band_eff < 0
          |                  OR (k div w) + (k % w) - band_eff >= n_b
          |             THEN 9000000000000000L
          |             ELSE abs(element_at(xs, CAST(k div w AS INT) + 1) -
          |                      element_at(ys,
          |                        CAST((k div w) + (k % w) - band_eff
          |                             AS INT) + 1)) +
          |                  CASE WHEN k div w = 0L
          |                            AND (k % w) - band_eff = 0L THEN 0L
          |                       ELSE least(
          |                         CASE WHEN k % w = 0L
          |                                   OR (k div w) + (k % w)
          |                                      - band_eff = 0L
          |                              THEN 9000000000000000L
          |                              ELSE element_at(A, size(A)) END,
          |                         CASE WHEN k div w = 0L OR k % w = w - 1
          |                              THEN 9000000000000000L
          |                              ELSE element_at(A, 2) END,
          |                         CASE WHEN k div w = 0L
          |                                   OR (k div w) + (k % w)
          |                                      - band_eff = 0L
          |                              THEN 9000000000000000L
          |                              ELSE element_at(A, 1) END) END
          |        END))),
          |  CAST(band_eff + 1 + n_b - n_a AS INT))""".stripMargin))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("dtw_band_u"),
        expr("dtw_band_u div (n_a + n_b)").as("dtw_band_per_step_u"))
  }

  /** Chow structural-break F-test at the series midpoint: does fitting
    * SEPARATE lines to the two halves of the per-type daily composite
    * beat one pooled line — the inferential companion to
    * `ts_breakpoint` (which locates a break; this one says whether the
    * break is statistically real):
    * F = ((RSS_p − RSS₁ − RSS₂)/2) / ((RSS₁+RSS₂)/(n−4)).
    * Every sufficient statistic (n, Σt, Σy, Σty, Σt², Σy² per half,
    * pooled = their sums) is an exact DECIMAL(38,0) — both halves
    * pivot out of ONE conditional aggregation, so there is a single
    * (type, day) exchange and a types-sized row after it. The three
    * RSS values and F are a short chain of named double columns
    * evaluated token-identically by the oracle, NULL-guarded for
    * degenerate halves (constant t, n ≤ 4). Day index t is rebased to
    * the per-type minimum so t² stays ≤ span², epoch-magnitude-proof.
    */
  q("ts_chow_test",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
      |           AS xd,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |b AS (
      |  SELECT event_type, CAST(min(xd) AS BIGINT) AS x0,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM daily GROUP BY 1),
      |r AS (
      |  SELECT d.event_type, b.n, d.xu AS y, d.xd - b.x0 AS t,
      |         CASE WHEN row_number() OVER (PARTITION BY d.event_type
      |                ORDER BY d.xd) * 2 <= b.n THEN 1 ELSE 2 END AS seg
      |  FROM daily d JOIN b USING (event_type)),
      |s AS (
      |  SELECT event_type, max(n) AS n,
      |         CAST(sum(CASE WHEN seg = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n1,
      |         sum(CASE WHEN seg = 1 THEN CAST(t AS HUGEINT) ELSE 0 END) AS st1,
      |         sum(CASE WHEN seg = 1 THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy1,
      |         sum(CASE WHEN seg = 1 THEN CAST(t AS HUGEINT) * y ELSE 0 END) AS sty1,
      |         sum(CASE WHEN seg = 1 THEN CAST(t AS HUGEINT) * t ELSE 0 END) AS stt1,
      |         sum(CASE WHEN seg = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy1,
      |         CAST(sum(CASE WHEN seg = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n2,
      |         sum(CASE WHEN seg = 2 THEN CAST(t AS HUGEINT) ELSE 0 END) AS st2,
      |         sum(CASE WHEN seg = 2 THEN CAST(y AS HUGEINT) ELSE 0 END) AS sy2,
      |         sum(CASE WHEN seg = 2 THEN CAST(t AS HUGEINT) * y ELSE 0 END) AS sty2,
      |         sum(CASE WHEN seg = 2 THEN CAST(t AS HUGEINT) * t ELSE 0 END) AS stt2,
      |         sum(CASE WHEN seg = 2 THEN CAST(y AS HUGEINT) * y ELSE 0 END) AS syy2
      |  FROM r GROUP BY 1),
      |f AS (
      |  SELECT event_type, n, n1, n2,
      |         CAST(n1 AS DOUBLE) * CAST(stt1 AS DOUBLE) -
      |           CAST(st1 AS DOUBLE) * CAST(st1 AS DOUBLE) AS vx1,
      |         CAST(n1 AS DOUBLE) * CAST(sty1 AS DOUBLE) -
      |           CAST(st1 AS DOUBLE) * CAST(sy1 AS DOUBLE) AS cx1,
      |         CAST(n1 AS DOUBLE) * CAST(syy1 AS DOUBLE) -
      |           CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE) AS vy1,
      |         CAST(n2 AS DOUBLE) * CAST(stt2 AS DOUBLE) -
      |           CAST(st2 AS DOUBLE) * CAST(st2 AS DOUBLE) AS vx2,
      |         CAST(n2 AS DOUBLE) * CAST(sty2 AS DOUBLE) -
      |           CAST(st2 AS DOUBLE) * CAST(sy2 AS DOUBLE) AS cx2,
      |         CAST(n2 AS DOUBLE) * CAST(syy2 AS DOUBLE) -
      |           CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE) AS vy2,
      |         CAST(n AS DOUBLE) * CAST(stt1 + stt2 AS DOUBLE) -
      |           CAST(st1 + st2 AS DOUBLE) * CAST(st1 + st2 AS DOUBLE) AS vxp,
      |         CAST(n AS DOUBLE) * CAST(sty1 + sty2 AS DOUBLE) -
      |           CAST(st1 + st2 AS DOUBLE) * CAST(sy1 + sy2 AS DOUBLE) AS cxp,
      |         CAST(n AS DOUBLE) * CAST(syy1 + syy2 AS DOUBLE) -
      |           CAST(sy1 + sy2 AS DOUBLE) * CAST(sy1 + sy2 AS DOUBLE) AS vyp
      |  FROM s),
      |g AS (
      |  SELECT event_type, n, n1, n2,
      |         CASE WHEN vx1 = 0 THEN NULL
      |              ELSE (vy1 - cx1 * cx1 / vx1) / CAST(n1 AS DOUBLE)
      |         END AS rss1,
      |         CASE WHEN vx2 = 0 THEN NULL
      |              ELSE (vy2 - cx2 * cx2 / vx2) / CAST(n2 AS DOUBLE)
      |         END AS rss2,
      |         CASE WHEN vxp = 0 THEN NULL
      |              ELSE (vyp - cxp * cxp / vxp) / CAST(n AS DOUBLE)
      |         END AS rssp
      |  FROM f)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days, n1, n2,
      |       CASE WHEN n <= 4 OR rss1 IS NULL OR rss2 IS NULL
      |                 OR rssp IS NULL OR rss1 + rss2 = 0 THEN NULL
      |            ELSE round(((rssp - rss1 - rss2) / 2) /
      |                       ((rss1 + rss2) / (n - 4)), 6) END AS f_chow
      |FROM g""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('day', ts)) div 86400").as("xd"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val b = daily.groupBy("event_type")
      .agg(min("xd").as("x0"), count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("xd")
    val r = daily.join(b, "event_type")
      .select(col("event_type"), col("n"), col("xu").as("y"),
        (col("xd") - col("x0")).as("t"),
        when(row_number().over(w) * 2 <= col("n"), 1).otherwise(2)
          .as("seg"))
    val dec = "decimal(38,0)"
    def seg(i: Int, e: String, alias: String) =
      sum(when(col("seg") === i, expr(e).cast(dec)).otherwise(lit(0)))
        .as(alias)
    val st = r.groupBy("event_type").agg(
      max("n").as("n"),
      sum(when(col("seg") === 1, 1L).otherwise(0L)).as("n1"),
      seg(1, "t", "st1"), seg(1, "y", "sy1"), seg(1, "t * y", "sty1"),
      seg(1, "t * t", "stt1"), seg(1, "y * y", "syy1"),
      sum(when(col("seg") === 2, 1L).otherwise(0L)).as("n2"),
      seg(2, "t", "st2"), seg(2, "y", "sy2"), seg(2, "t * y", "sty2"),
      seg(2, "t * t", "stt2"), seg(2, "y * y", "syy2"))
    def d2(c: org.apache.spark.sql.Column) = c.cast("double")
    val f = st.select(col("event_type"), col("n"), col("n1"), col("n2"),
      (d2(col("n1")) * d2(col("stt1")) - d2(col("st1")) * d2(col("st1")))
        .as("vx1"),
      (d2(col("n1")) * d2(col("sty1")) - d2(col("st1")) * d2(col("sy1")))
        .as("cx1"),
      (d2(col("n1")) * d2(col("syy1")) - d2(col("sy1")) * d2(col("sy1")))
        .as("vy1"),
      (d2(col("n2")) * d2(col("stt2")) - d2(col("st2")) * d2(col("st2")))
        .as("vx2"),
      (d2(col("n2")) * d2(col("sty2")) - d2(col("st2")) * d2(col("sy2")))
        .as("cx2"),
      (d2(col("n2")) * d2(col("syy2")) - d2(col("sy2")) * d2(col("sy2")))
        .as("vy2"),
      (d2(col("n")) * d2(col("stt1") + col("stt2")) -
        d2(col("st1") + col("st2")) * d2(col("st1") + col("st2")))
        .as("vxp"),
      (d2(col("n")) * d2(col("sty1") + col("sty2")) -
        d2(col("st1") + col("st2")) * d2(col("sy1") + col("sy2")))
        .as("cxp"),
      (d2(col("n")) * d2(col("syy1") + col("syy2")) -
        d2(col("sy1") + col("sy2")) * d2(col("sy1") + col("sy2")))
        .as("vyp"))
    def rss(vy: String, cx: String, vx: String, nn: org.apache.spark.sql.Column) =
      when(col(vx) === 0, lit(null).cast("double"))
        .otherwise((col(vy) - col(cx) * col(cx) / col(vx)) /
          nn.cast("double"))
    val g = f.select(col("event_type"), col("n"), col("n1"), col("n2"),
      rss("vy1", "cx1", "vx1", col("n1")).as("rss1"),
      rss("vy2", "cx2", "vx2", col("n2")).as("rss2"),
      rss("vyp", "cxp", "vxp", col("n")).as("rssp"))
    g.select(col("event_type"), col("n").as("n_days"), col("n1"),
      col("n2"),
      when(col("n") <= 4 || col("rss1").isNull || col("rss2").isNull ||
        col("rssp").isNull || col("rss1") + col("rss2") === 0,
        lit(null).cast("double"))
        .otherwise(round(((col("rssp") - col("rss1") - col("rss2")) / 2) /
          ((col("rss1") + col("rss2")) / (col("n") - 4)), 6))
        .as("f_chow"))
  }

  /** Partial autocorrelation (lags 1–3) of the per-type daily
    * composite via the closed-form Durbin–Levinson recursion — the
    * AR-order picker that `ts_acf` alone can't give (an AR(1) series
    * shows geometric ACF at every lag but PACF cuts off after 1):
    * φ₁₁ = r₁, φ₂₂ = (r₂−r₁²)/(1−r₁²),
    * φ₃₃ = (r₃−φ₂₁r₂−φ₂₂r₁)/(1−φ₂₁r₁−φ₂₂r₂) with φ₂₁ = r₁−φ₂₂r₁.
    * The r_k inputs are the SAME exact integer sums as ts_acf
    * (order-independent longs); every float step after that is a
    * short chain of named columns evaluated token-identically by the
    * oracle, with NULL guards on the three degenerate denominators
    * (constant or perfectly-correlated series) instead of ANSI
    * divide-by-zero. Shape identical to ts_acf: one (type, day)
    * aggregation, one per-type window over daily rows.
    */
  q("ts_pacf",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |mu AS (
      |  SELECT event_type,
      |         CAST(sum(xu) // count(*) AS BIGINT) AS m,
      |         CAST(count(*) AS BIGINT) AS n_days
      |  FROM daily GROUP BY event_type),
      |dev AS (
      |  SELECT d.event_type, m.n_days, d.st, d.xu - m.m AS dv
      |  FROM daily d JOIN mu m USING (event_type)),
      |led AS (
      |  SELECT event_type, n_days, dv,
      |         lead(dv, 1) OVER w AS d1, lead(dv, 2) OVER w AS d2,
      |         lead(dv, 3) OVER w AS d3
      |  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY st)),
      |sums AS (
      |  SELECT event_type, max(n_days) AS n_days,
      |         sum(dv * dv) AS den,
      |         sum(dv * d1) AS s1, sum(dv * d2) AS s2,
      |         sum(dv * d3) AS s3
      |  FROM led GROUP BY event_type),
      |r AS (
      |  SELECT event_type, n_days,
      |         CASE WHEN den = 0 THEN NULL
      |              ELSE CAST(s1 AS DOUBLE) / CAST(den AS DOUBLE) END AS r1,
      |         CASE WHEN den = 0 THEN NULL
      |              ELSE CAST(s2 AS DOUBLE) / CAST(den AS DOUBLE) END AS r2,
      |         CASE WHEN den = 0 THEN NULL
      |              ELSE CAST(s3 AS DOUBLE) / CAST(den AS DOUBLE) END AS r3
      |  FROM sums),
      |p2 AS (
      |  SELECT *, CASE WHEN 1 - r1 * r1 = 0 THEN NULL
      |            ELSE (r2 - r1 * r1) / (1 - r1 * r1) END AS f22
      |  FROM r),
      |p3 AS (SELECT *, r1 - f22 * r1 AS f21 FROM p2),
      |p4 AS (
      |  SELECT *, CASE WHEN 1 - f21 * r1 - f22 * r2 = 0 THEN NULL
      |            ELSE (r3 - f21 * r2 - f22 * r1) /
      |                 (1 - f21 * r1 - f22 * r2) END AS f33
      |  FROM p3)
      |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
      |       CAST(l AS INT) AS lag, round([r1, f22, f33][l], 6) AS pacf
      |FROM p4, unnest(generate_series(1, 3)) AS g(l)""") { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val mu = daily.groupBy("event_type")
      .agg(expr("sum(xu) div count(*)").as("m"),
        count(lit(1)).as("n_days"))
    val w = Window.partitionBy("event_type").orderBy("st")
    val led = daily.join(mu, "event_type")
      .withColumn("dv", col("xu") - col("m"))
      .select(col("event_type") +: col("n_days") +: col("dv") +:
        (1 to 3).map(l => lead(col("dv"), l).over(w).as(s"d$l")): _*)
    val aggs = max(col("n_days")).as("n_days") +:
      sum(col("dv") * col("dv")).as("den") +:
      (1 to 3).map(l => sum(col("dv") * col(s"d$l")).as(s"s$l"))
    val sums = led.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    def rk(l: Int) = when(col("den") === 0, lit(null).cast("double"))
      .otherwise(col(s"s$l").cast("double") / col("den").cast("double"))
    val p = sums
      .withColumn("r1", rk(1)).withColumn("r2", rk(2))
      .withColumn("r3", rk(3))
      .withColumn("f22",
        when(lit(1) - col("r1") * col("r1") === 0,
          lit(null).cast("double"))
          .otherwise((col("r2") - col("r1") * col("r1")) /
            (lit(1) - col("r1") * col("r1"))))
      .withColumn("f21", col("r1") - col("f22") * col("r1"))
      .withColumn("f33",
        when(lit(1) - col("f21") * col("r1") - col("f22") * col("r2") === 0,
          lit(null).cast("double"))
          .otherwise(
            (col("r3") - col("f21") * col("r2") - col("f22") * col("r1")) /
              (lit(1) - col("f21") * col("r1") - col("f22") * col("r2"))))
    p.select(col("event_type"), col("n_days"),
        posexplode(array(col("r1"), col("f22"), col("f33")))
          .as(Seq("p", "v")))
      .select(col("event_type"), col("n_days"),
        (col("p") + 1).cast("int").as("lag"),
        round(col("v"), 6).as("pacf"))
  }

  /** Weekly seasonality strength as the day-of-week eta² (variance
    * explained: SS_between/SS_total of the 7 day-of-week groups over
    * the per-type daily composite) — the cheap "does this series have
    * a weekly pulse" gate run before paying for `k5_stl_components`
    * or `ts_holt_winters`'s seasonal state. Exact integers end to
    * end: both sums of squares expand around the FLOORED means
    * (mg = s_g div n_g, μ = s div n — the ts_acf centering
    * discipline, so no second data pass is needed: SSB and SST come
    * from one (type, dow) aggregation via Σx², Σng·mg², Σng·mg in
    * HUGEINT/DECIMAL(38,0)), and eta²_ppm is one floor division.
    * NULL on a constant series (SST = 0). Shape: one map-combined
    * shuffle to (type, day), one to (type, dow) — ≤ 7 rows per type
    * after that, nothing data-sized past the first exchange.
    */
  q("ts_seasonal_strength",
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS st,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              // count(*) AS BIGINT) AS xu
      |  FROM events GROUP BY event_type, date_trunc('day', ts)),
      |g AS (
      |  SELECT event_type, (st // 86400 + 4) % 7 AS dow,
      |         CAST(count(*) AS BIGINT) AS ng,
      |         CAST(sum(xu) AS BIGINT) AS sg,
      |         sum(CAST(xu AS HUGEINT) * xu) AS ssg
      |  FROM daily GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, CAST(sum(ng) AS BIGINT) AS n,
      |         CAST(sum(sg) AS BIGINT) AS s, sum(ssg) AS ss
      |  FROM g GROUP BY 1),
      |b AS (
      |  SELECT g.event_type, m.n, m.s, m.ss, m.s // m.n AS mu,
      |         sum(CAST(g.ng AS HUGEINT) * (g.sg // g.ng) * (g.sg // g.ng))
      |           AS smm,
      |         sum(CAST(g.ng AS HUGEINT) * (g.sg // g.ng)) AS sm
      |  FROM g JOIN m USING (event_type)
      |  GROUP BY 1, 2, 3, 4, 5),
      |f AS (
      |  SELECT event_type, n,
      |         smm - 2 * CAST(mu AS HUGEINT) * sm +
      |           CAST(mu AS HUGEINT) * mu * n AS ssb,
      |         ss - 2 * CAST(mu AS HUGEINT) * s +
      |           CAST(mu AS HUGEINT) * mu * n AS sst
      |  FROM b)
      |SELECT event_type, n AS n_days,
      |       CAST(CASE WHEN sst = 0 THEN NULL
      |            ELSE ssb * 1000000 // sst END AS BIGINT) AS eta2_ppm
      |FROM f""") { (s, d) =>
    val dec = "decimal(38,0)"
    val daily = events(s, d)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("st"))
      .agg(expr(
        "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) div count(*)")
        .as("xu"))
    val g = daily
      .groupBy(col("event_type"), expr("((st div 86400) + 4) % 7").as("dow"))
      .agg(count(lit(1)).as("ng"), sum("xu").as("sg"),
        sum(col("xu").cast(dec) * col("xu")).as("ssg"))
    val m = g.groupBy("event_type")
      .agg(sum("ng").as("n"), sum("sg").as("s"), sum("ssg").as("ss"))
    val b = g.join(m, "event_type")
      .withColumn("mg", expr("sg div ng"))
      .groupBy(col("event_type"), col("n"), col("s"), col("ss"),
        expr("s div n").as("mu"))
      .agg(sum(col("ng").cast(dec) * col("mg") * col("mg")).as("smm"),
        sum(col("ng").cast(dec) * col("mg")).as("sm"))
    b.select(col("event_type"), col("n"),
        (col("smm") - lit(2) * col("mu").cast(dec) * col("sm") +
          col("mu").cast(dec) * col("mu") * col("n")).as("ssb"),
        (col("ss") - lit(2) * col("mu").cast(dec) * col("s") +
          col("mu").cast(dec) * col("mu") * col("n")).as("sst"))
      .select(col("event_type"), col("n").as("n_days"),
        when(col("sst") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST((ssb * 1000000) div sst AS BIGINT)"))
          .as("eta2_ppm"))
  }

  /** Kruskal–Wallis rank analysis with Dunn-style per-group z-scores:
    * the k-sample extension of `la_mannwhitney` — for EACH event type,
    * how far its tie-corrected mean rank (over the global value grid)
    * sits from the all-types expectation (N+1)/2, in units of the
    * null standard error sqrt((N+1)(N−nᵢ)·C/(12nᵢ)) with the tie
    * correction C = 1 − Σ(t³−t)/(N³−N). Per-group rows instead of the
    * scalar H so every float step consumes only THAT group's exact
    * integers plus global exact integers — no cross-group float
    * summation whose order could differ between engines (H itself
    * would need Σᵢ Rᵢ²/nᵢ, an order-sensitive float sum; the z-rows
    * carry strictly more information anyway). 2·rank stays integral
    * via the la_mannwhitney identity (2·avg_rank = 2·c_below + t + 1)
    * in DECIMAL(38,0), exact to N ≈ 10¹⁸. State after the first
    * shuffle is the value DOMAIN (the ×10⁴ grid), not the corpus —
    * the la_quantiles bounded-grid shape; the global grid cumsum is a
    * single-partition window over grid rows only.
    */
  q("la_kruskal_dunn",
    """WITH obs AS (
      |  SELECT event_type, CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |  FROM events),
      |grid AS (
      |  SELECT event_type, vu, CAST(count(*) AS BIGINT) AS c
      |  FROM obs GROUP BY 1, 2),
      |gv AS (SELECT vu, CAST(sum(c) AS BIGINT) AS tv FROM grid GROUP BY 1),
      |cum AS (
      |  SELECT vu, tv,
      |         CAST(sum(tv) OVER (ORDER BY vu
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS BIGINT) - tv AS below
      |  FROM gv),
      |tr AS (
      |  SELECT g.event_type, CAST(sum(g.c) AS BIGINT) AS n_i,
      |         sum(CAST(g.c AS DECIMAL(38,0)) * (2 * cu.below + cu.tv + 1))
      |           AS two_r
      |  FROM grid g JOIN cum cu ON g.vu = cu.vu GROUP BY 1),
      |gl AS (
      |  SELECT CAST(sum(tv) AS BIGINT) AS n,
      |         sum(CAST(tv AS DECIMAL(38,0)) * tv * tv - tv) AS tie3
      |  FROM gv),
      |se AS (
      |  SELECT event_type, n_i, n, two_r,
      |         sqrt((CAST(n AS DOUBLE) + 1) * (CAST(n AS DOUBLE) - n_i) *
      |              (1 - CAST(tie3 AS DOUBLE) /
      |               (CAST(n AS DOUBLE) * n * n - n)) / (12 * n_i)) AS sd
      |  FROM tr, gl)
      |SELECT event_type, n_i, n,
      |       round(CAST(two_r AS DOUBLE) / (2 * CAST(n_i AS DOUBLE)), 6)
      |         AS mean_rank,
      |       CASE WHEN sd = 0 THEN NULL ELSE
      |         round((CAST(two_r AS DOUBLE) / (2 * CAST(n_i AS DOUBLE)) -
      |                (CAST(n AS DOUBLE) + 1) / 2) / sd, 6) END AS z
      |FROM se""") { (s, d) =>
    val dec = "decimal(38,0)"
    val obs = events(s, d).select(col("event_type"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
    val grid = obs.groupBy("event_type", "vu")
      .agg(count(lit(1)).as("c"))
    val gv = grid.groupBy("vu").agg(sum("c").as("tv"))
    val cum = gv.withColumn("below",
      sum("tv").over(Window.orderBy("vu")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - col("tv"))
    val tr = grid.join(cum, "vu")
      .groupBy("event_type")
      .agg(sum("c").as("n_i"),
        sum(col("c").cast(dec) *
          (lit(2) * col("below") + col("tv") + 1)).as("two_r"))
    val glob = gv.agg(sum("tv").as("n"),
      sum(col("tv").cast(dec) * col("tv") * col("tv") - col("tv"))
        .as("tie3"))
    val nD = col("n").cast("double")
    val meanRank = col("two_r").cast("double") /
      (lit(2) * col("n_i").cast("double"))
    tr.crossJoin(broadcast(glob))
      .withColumn("sd",
        sqrt((nD + 1) * (nD - col("n_i")) *
          (lit(1) - col("tie3").cast("double") /
            (nD * col("n") * col("n") - col("n"))) /
          (lit(12) * col("n_i"))))
      .select(col("event_type"), col("n_i"), col("n"),
        round(meanRank, 6).as("mean_rank"),
        when(col("sd") === 0, lit(null).cast("double"))
          .otherwise(round((meanRank - (nD + 1) / 2) / col("sd"), 6))
          .as("z"))
  }

  /** Per-stream freshness audit — the third leg of the DQ suite
    * (constraints say values are sane, completeness says days exist;
    * this one says the feed is ALIVE): per event type, the last event
    * time, its staleness against the freshest stream (a dead producer
    * shows up as a growing gap even while its historical data passes
    * every other check), and 1-day/7-day arrival counts. One
    * map-combined aggregate + a 1-row global-max broadcast — output
    * is types-sized, exact integer seconds end to end.
    */
  q("dq_freshness",
    """WITH t AS (SELECT event_type,
      |                  CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |           FROM events),
      |g AS (SELECT CAST(max(sec) AS BIGINT) AS gmax FROM t)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(max(sec) AS BIGINT) AS last_sec,
      |       CAST(g.gmax - max(sec) AS BIGINT) AS staleness_s,
      |       CAST(sum(CASE WHEN sec >= g.gmax - 86400 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_last_day,
      |       CAST(sum(CASE WHEN sec >= g.gmax - 604800 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_last_week
      |FROM t, g GROUP BY event_type, g.gmax""") { (s, d) =>
    val t = events(s, d).select(col("event_type"),
      expr("unix_timestamp(ts)").as("sec"))
    val g = t.agg(max("sec").as("gmax"))
    t.crossJoin(broadcast(g))
      .groupBy("event_type", "gmax")
      .agg(count(lit(1)).as("n_events"), max("sec").as("last_sec"),
        sum(when(col("sec") >= col("gmax") - 86400, 1L).otherwise(0L))
          .as("n_last_day"),
        sum(when(col("sec") >= col("gmax") - 604800, 1L).otherwise(0L))
          .as("n_last_week"))
      .select(col("event_type"), col("n_events"), col("last_sec"),
        (col("gmax") - col("last_sec")).as("staleness_s"),
        col("n_last_day"), col("n_last_week"))
  }

  /** Minimum detectable effect (80% power, two-sided α = 0.05) for the
    * user-parity A/B arms per event type — the "is this experiment even
    * worth running at this n" calculator that belongs next to
    * `la_ab_ttest` (which tests an effect after the fact; this one
    * says what effect the current sample could ever see):
    * MDE = (z_{α/2} + z_β)·sqrt(s₁²/n₁ + s₂²/n₂) with the two z's as
    * compile-time literals (2.801585 = 1.959964 + 0.841621). Variances
    * come from exact HUGEINT/DECIMAL sums on the ×10⁴ grid (one
    * map-combined aggregate, types-sized output); the sqrt/division
    * chain is token-identical with the oracle, NULL on degenerate
    * arms (n ≤ 1 or zero variance handled by the float path).
    */
  private[graft] val powerMdeSql: String =
    """WITH obs AS (
      |  SELECT event_type, user_id % 2 = 0 AS arm_a,
      |         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |  FROM events),
      |s AS (
      |  SELECT event_type,
      |         CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |         sum(CASE WHEN arm_a THEN CAST(vu AS HUGEINT) ELSE 0 END) AS sa,
      |         sum(CASE WHEN arm_a THEN CAST(vu AS HUGEINT) * vu ELSE 0 END)
      |           AS ssa,
      |         CAST(sum(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
      |         sum(CASE WHEN arm_a THEN 0 ELSE CAST(vu AS HUGEINT) END) AS sb,
      |         sum(CASE WHEN arm_a THEN 0 ELSE CAST(vu AS HUGEINT) * vu END)
      |           AS ssb
      |  FROM obs GROUP BY 1),
      |v AS (
      |  SELECT event_type, na, nb, sa, sb,
      |         (CAST(na AS DOUBLE) * CAST(ssa AS DOUBLE) -
      |          CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) /
      |         (CAST(na AS DOUBLE) * (na - 1)) AS va,
      |         (CAST(nb AS DOUBLE) * CAST(ssb AS DOUBLE) -
      |          CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) /
      |         (CAST(nb AS DOUBLE) * (nb - 1)) AS vb
      |  FROM s WHERE na > 1 AND nb > 1)
      |SELECT event_type, na AS n_a, nb AS n_b,
      |       round(2.801585 * sqrt(va / na + vb / nb), 4) AS mde_u,
      |       round(2.801585 * sqrt(va / na + vb / nb) /
      |             ((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / (na + nb)),
      |             6) AS mde_rel
      |FROM v"""

  q("la_power_mde", powerMdeSql) { (s, d) => powerMde(events(s, d)) }

  /** The la_power_mde transform over any events(-shaped) frame — ONE
    * aggregation level plus row-local float math, so the identical
    * code runs on a stream in complete mode (`st_power_mde`).
    */
  def powerMde(ev: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val obs = ev.select(col("event_type"),
      (col("user_id") % 2 === 0).as("arm_a"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
    val st = obs.groupBy("event_type").agg(
      sum(when(col("arm_a"), 1L).otherwise(0L)).as("na"),
      sum(when(col("arm_a"), col("vu").cast(dec)).otherwise(lit(0)))
        .as("sa"),
      sum(when(col("arm_a"), col("vu").cast(dec) * col("vu"))
        .otherwise(lit(0))).as("ssa"),
      sum(when(col("arm_a"), 0L).otherwise(1L)).as("nb"),
      sum(when(col("arm_a"), lit(0)).otherwise(col("vu").cast(dec)))
        .as("sb"),
      sum(when(col("arm_a"), lit(0))
        .otherwise(col("vu").cast(dec) * col("vu"))).as("ssb"))
    def d2(c: org.apache.spark.sql.Column) = c.cast("double")
    val v = st.filter(col("na") > 1 && col("nb") > 1)
      .withColumn("va",
        (d2(col("na")) * d2(col("ssa")) - d2(col("sa")) * d2(col("sa"))) /
          (d2(col("na")) * (col("na") - 1)))
      .withColumn("vb",
        (d2(col("nb")) * d2(col("ssb")) - d2(col("sb")) * d2(col("sb"))) /
          (d2(col("nb")) * (col("nb") - 1)))
    val mde = lit(2.801585) *
      sqrt(col("va") / col("na") + col("vb") / col("nb"))
    v.select(col("event_type"), col("na").as("n_a"), col("nb").as("n_b"),
      round(mde, 4).as("mde_u"),
      round(mde / ((d2(col("sa")) + d2(col("sb"))) /
        (col("na") + col("nb"))), 6).as("mde_rel"))
  }

  /** Sample-ratio-mismatch guard for the user-parity A/B split — the
    * first check any experiment readout must pass (a biased
    * randomizer invalidates every downstream metric; SRM is the
    * canonical symptom): χ²(1df) of DISTINCT-USER arm counts against
    * the expected 50/50, flagged at the 0.05 critical value 3.841459.
    * Randomization units are USERS, not events — counting events
    * would let a single heavy user fake (or mask) a mismatch. One
    * distinct-user aggregate (map-combined (type, user) exchange),
    * types-sized output; χ² = (n_a−n_b)²/(n_a+n_b) from exact longs,
    * and the flag boundary compares a quotient of integers — both
    * engines derive the identical double.
    */
  q("la_srm",
    """WITH u AS (
      |  SELECT DISTINCT event_type, user_id, user_id % 2 = 0 AS arm_a
      |  FROM events),
      |c AS (
      |  SELECT event_type,
      |         CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |         CAST(sum(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
      |  FROM u GROUP BY 1)
      |SELECT event_type, na AS n_a, nb AS n_b,
      |       round(CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb), 6)
      |         AS chi2,
      |       CAST(CASE WHEN CAST((na - nb) * (na - nb) AS DOUBLE) /
      |                      (na + nb) > 3.841459
      |            THEN 1 ELSE 0 END AS INT) AS srm_flag
      |FROM c""") { (s, d) =>
    val u = events(s, d)
      .select(col("event_type"), col("user_id"),
        (col("user_id") % 2 === 0).as("arm_a")).distinct()
    val c = u.groupBy("event_type")
      .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("na"),
        sum(when(col("arm_a"), 0L).otherwise(1L)).as("nb"))
    val chi = ((col("na") - col("nb")) * (col("na") - col("nb")))
      .cast("double") / (col("na") + col("nb"))
    c.select(col("event_type"), col("na").as("n_a"), col("nb").as("n_b"),
      round(chi, 6).as("chi2"),
      when(chi > 3.841459, 1).otherwise(0).cast("int").as("srm_flag"))
  }

  /** Benjamini–Hochberg FDR control over the per-type A/B Welch
    * z-tests — the multiple-testing step every metrics platform runs
    * when one experiment readout spans many metrics/segments (testing
    * 5 types at α=0.05 uncorrected inflates the family error to
    * ~23%). z comes from the same exact DECIMAL arm sums as
    * `la_power_mde`; the two-sided p uses the Abramowitz–Stegun
    * 26.2.17 polynomial tail (|error| < 7.5e-8, far inside the round-6
    * grid) written token-identically in both engines, and the BH
    * step-up (largest rank k with p₍ᵢ₎ ≤ α·i/m; reject ranks ≤ k)
    * runs on the ROUNDED p₆ so the accept/reject boundary is a
    * deterministic grid compare, not a float knife-edge. The rank
    * window is FAMILY-sized (one row per type) — the only
    * unpartitioned window is over m test rows, never data.
    */
  q("la_bh_fdr",
    """WITH obs AS (
      |  SELECT event_type, user_id % 2 = 0 AS arm_a,
      |         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vu
      |  FROM events),
      |s AS (
      |  SELECT event_type,
      |         CAST(sum(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |         sum(CASE WHEN arm_a THEN CAST(vu AS HUGEINT) ELSE 0 END) AS sa,
      |         sum(CASE WHEN arm_a THEN CAST(vu AS HUGEINT) * vu ELSE 0 END)
      |           AS ssa,
      |         CAST(sum(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
      |         sum(CASE WHEN arm_a THEN 0 ELSE CAST(vu AS HUGEINT) END) AS sb,
      |         sum(CASE WHEN arm_a THEN 0 ELSE CAST(vu AS HUGEINT) * vu END)
      |           AS ssb
      |  FROM obs GROUP BY 1),
      |z AS (
      |  SELECT event_type, na, nb,
      |         (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) /
      |         sqrt((CAST(na AS DOUBLE) * CAST(ssa AS DOUBLE) -
      |               CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) /
      |              (CAST(na AS DOUBLE) * (na - 1)) / na +
      |              (CAST(nb AS DOUBLE) * CAST(ssb AS DOUBLE) -
      |               CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) /
      |              (CAST(nb AS DOUBLE) * (nb - 1)) / nb) AS zv
      |  FROM s WHERE na > 1 AND nb > 1
      |    AND (CAST(na AS HUGEINT) * ssa - sa * sa > 0
      |         OR CAST(nb AS HUGEINT) * ssb - sb * sb > 0)),
      |p AS (
      |  SELECT event_type, zv,
      |         round(2 * (0.3989422804014327 * exp(-0.5 * abs(zv) * abs(zv))
      |           * (1 / (1 + 0.2316419 * abs(zv)))
      |           * (0.319381530 + (1 / (1 + 0.2316419 * abs(zv)))
      |           * (-0.356563782 + (1 / (1 + 0.2316419 * abs(zv)))
      |           * (1.781477937 + (1 / (1 + 0.2316419 * abs(zv)))
      |           * (-1.821255978 + (1 / (1 + 0.2316419 * abs(zv)))
      |           * 1.330274429))))), 6) AS p6
      |  FROM z),
      |r AS (
      |  SELECT event_type, zv, p6,
      |         row_number() OVER (ORDER BY p6, event_type) AS rk,
      |         CAST(count(*) OVER () AS BIGINT) AS m
      |  FROM p),
      |k AS (
      |  SELECT coalesce(max(CASE WHEN p6 * m <= 0.05 * rk THEN rk END), 0)
      |           AS kmax
      |  FROM r)
      |SELECT event_type, round(zv, 6) AS z, p6 AS p,
      |       CAST(rk AS INT) AS rk, m,
      |       CAST(CASE WHEN rk <= kmax THEN 1 ELSE 0 END AS INT)
      |         AS rejected
      |FROM r, k""") { (s, d) =>
    val dec = "decimal(38,0)"
    val obs = events(s, d).select(col("event_type"),
      (col("user_id") % 2 === 0).as("arm_a"),
      expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").as("vu"))
    val st = obs.groupBy("event_type").agg(
      sum(when(col("arm_a"), 1L).otherwise(0L)).as("na"),
      sum(when(col("arm_a"), col("vu").cast(dec)).otherwise(lit(0)))
        .as("sa"),
      sum(when(col("arm_a"), col("vu").cast(dec) * col("vu"))
        .otherwise(lit(0))).as("ssa"),
      sum(when(col("arm_a"), 0L).otherwise(1L)).as("nb"),
      sum(when(col("arm_a"), lit(0)).otherwise(col("vu").cast(dec)))
        .as("sb"),
      sum(when(col("arm_a"), lit(0))
        .otherwise(col("vu").cast(dec) * col("vu"))).as("ssb"))
    def d2(c: org.apache.spark.sql.Column) = c.cast("double")
    val z = st.filter(col("na") > 1 && col("nb") > 1 &&
        (col("na").cast(dec) * col("ssa") - col("sa") * col("sa") > 0 ||
          col("nb").cast(dec) * col("ssb") - col("sb") * col("sb") > 0))
      .withColumn("zv",
        (d2(col("sa")) / col("na") - d2(col("sb")) / col("nb")) /
          sqrt((d2(col("na")) * d2(col("ssa")) -
            d2(col("sa")) * d2(col("sa"))) /
            (d2(col("na")) * (col("na") - 1)) / col("na") +
            (d2(col("nb")) * d2(col("ssb")) -
              d2(col("sb")) * d2(col("sb"))) /
              (d2(col("nb")) * (col("nb") - 1)) / col("nb")))
    val t = lit(1) / (lit(1) + lit(0.2316419) * abs(col("zv")))
    val p = z.withColumn("p6",
      round(lit(2) * (lit(0.3989422804014327) *
        exp(lit(-0.5) * abs(col("zv")) * abs(col("zv"))) * t *
        (lit(0.319381530) + t * (lit(-0.356563782) + t *
          (lit(1.781477937) + t * (lit(-1.821255978) + t *
            lit(1.330274429)))))), 6))
    val r = p
      .withColumn("rk",
        row_number().over(Window.orderBy(col("p6"), col("event_type"))))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy()))
    val k = r.agg(coalesce(max(when(
        col("p6") * col("m") <= lit(0.05) * col("rk"), col("rk"))),
      lit(0)).as("kmax"))
    r.crossJoin(broadcast(k))
      .select(col("event_type"), round(col("zv"), 6).as("z"),
        col("p6").as("p"), col("rk").cast("int").as("rk"), col("m"),
        when(col("rk") <= col("kmax"), 1).otherwise(0).cast("int")
          .as("rejected"))
  }

  /** CUPED variance reduction (Deng et al. 2013) per event type: split
    * the observed time range at its midpoint, use each user's
    * FIRST-half value sum as the pre-experiment covariate for their
    * second-half metric, and report θ = cov(pre, post)/var(pre) plus
    * the achievable variance reduction ρ² — the "how much smaller
    * could this experiment be" readout computed BEFORE any experiment
    * runs. Two map-combined exchanges ((type) bounds broadcast back,
    * then (type, user) conditional sums), users-sized state, and all
    * five covariance sufficient statistics are exact DECIMAL(38,0);
    * θ and ρ² are token-identical float quotients, NULL on degenerate
    * variances. Missing halves count as 0 (the standard
    * new-user-imputation convention, stated here).
    */
  q("la_cuped",
    """WITH bnd AS (
      |  SELECT event_type,
      |         (CAST(min(floor(epoch(ts))) AS BIGINT) +
      |          CAST(max(floor(epoch(ts))) AS BIGINT)) // 2 AS mid
      |  FROM events GROUP BY 1),
      |u AS (
      |  SELECT e.event_type, e.user_id,
      |         CAST(sum(CASE WHEN CAST(floor(epoch(e.ts)) AS BIGINT) < b.mid
      |              THEN CAST(floor(e.value * 10000 + 0.5) AS BIGINT)
      |              ELSE 0 END) AS BIGINT) AS pre,
      |         CAST(sum(CASE WHEN CAST(floor(epoch(e.ts)) AS BIGINT) >= b.mid
      |              THEN CAST(floor(e.value * 10000 + 0.5) AS BIGINT)
      |              ELSE 0 END) AS BIGINT) AS post
      |  FROM events e JOIN bnd b USING (event_type)
      |  GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         sum(CAST(pre AS HUGEINT)) AS sp,
      |         sum(CAST(post AS HUGEINT)) AS so,
      |         sum(CAST(pre AS HUGEINT) * pre) AS spp,
      |         sum(CAST(post AS HUGEINT) * post) AS soo,
      |         sum(CAST(pre AS HUGEINT) * post) AS spo
      |  FROM u GROUP BY 1),
      |v AS (
      |  SELECT event_type, n,
      |         CAST(n AS DOUBLE) * CAST(spo AS DOUBLE) -
      |           CAST(sp AS DOUBLE) * CAST(so AS DOUBLE) AS cxy,
      |         CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) -
      |           CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) AS vx,
      |         CAST(n AS DOUBLE) * CAST(soo AS DOUBLE) -
      |           CAST(so AS DOUBLE) * CAST(so AS DOUBLE) AS vy
      |  FROM s)
      |SELECT event_type, n AS n_users,
      |       CASE WHEN vx = 0 THEN NULL
      |            ELSE round(cxy / vx, 6) END AS theta,
      |       CASE WHEN vx = 0 OR vy = 0 THEN NULL
      |            ELSE round(cxy * cxy / (vx * vy), 6)
      |       END AS var_reduction
      |FROM v""") { (s, d) =>
    val dec = "decimal(38,0)"
    val bnd = events(s, d).groupBy("event_type")
      .agg(expr(
        "(min(unix_timestamp(ts)) + max(unix_timestamp(ts))) div 2")
        .as("mid"))
    val u = events(s, d).join(broadcast(bnd), "event_type")
      .groupBy("event_type", "user_id")
      .agg(
        sum(when(expr("unix_timestamp(ts)") < col("mid"),
          expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)"))
          .otherwise(0L)).as("pre"),
        sum(when(expr("unix_timestamp(ts)") >= col("mid"),
          expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)"))
          .otherwise(0L)).as("post"))
    val st = u.groupBy("event_type").agg(count(lit(1)).as("n"),
      sum(col("pre").cast(dec)).as("sp"),
      sum(col("post").cast(dec)).as("so"),
      sum(col("pre").cast(dec) * col("pre")).as("spp"),
      sum(col("post").cast(dec) * col("post")).as("soo"),
      sum(col("pre").cast(dec) * col("post")).as("spo"))
    def d2(c: org.apache.spark.sql.Column) = c.cast("double")
    val v = st.select(col("event_type"), col("n"),
      (d2(col("n")) * d2(col("spo")) - d2(col("sp")) * d2(col("so")))
        .as("cxy"),
      (d2(col("n")) * d2(col("spp")) - d2(col("sp")) * d2(col("sp")))
        .as("vx"),
      (d2(col("n")) * d2(col("soo")) - d2(col("so")) * d2(col("so")))
        .as("vy"))
    v.select(col("event_type"), col("n").as("n_users"),
      when(col("vx") === 0, lit(null).cast("double"))
        .otherwise(round(col("cxy") / col("vx"), 6)).as("theta"),
      when(col("vx") === 0 || col("vy") === 0, lit(null).cast("double"))
        .otherwise(round(col("cxy") * col("cxy") /
          (col("vx") * col("vy")), 6)).as("var_reduction"))
  }

  /** Herfindahl–Hirschman concentration of per-user value share within
    * each event type — the "is this metric carried by three whales"
    * audit that complements `la_gini` (HHI weighs the head; Gini the
    * whole curve) and `la_key_skew` (which measures row counts, not
    * value mass). Exact integers end to end: per-user sums on the ×10⁴
    * grid, Σs² and (Σs)² in DECIMAL(38,0) (safe to ~10¹⁵ total grid
    * mass ⇒ ~10⁹ users × 10⁶ value), one ppm floor division replayed
    * bit for bit by the oracle, and the effective-user count is the
    * integer reciprocal 10¹²//hhi. Shape: one map-combined shuffle to
    * (type, user), then a types-sized re-aggregation — nothing after
    * the first exchange is data-sized.
    */
  q("la_hhi",
    """WITH su AS (
      |  SELECT event_type, user_id,
      |         CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
      |              AS BIGINT) AS s
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
      |         sum(CAST(s AS HUGEINT) * s) AS ss,
      |         CAST(sum(s) AS HUGEINT) AS st
      |  FROM su GROUP BY 1)
      |SELECT event_type, n_users,
      |       CAST(ss * 1000000 // (st * st) AS BIGINT) AS hhi_ppm,
      |       CAST(CASE WHEN ss * 1000000 // (st * st) = 0 THEN NULL
      |            ELSE 1000000000000 // (ss * 1000000 // (st * st)) END
      |            AS BIGINT) AS eff_users_ppm
      |FROM t""") { (s, d) =>
    val dec = "decimal(38,0)"
    val su = events(s, d)
      .groupBy("event_type", "user_id")
      .agg(expr("sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))").as("s"))
    val t = su.groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum(col("s").cast(dec) * col("s")).as("ss"),
        sum("s").cast(dec).as("st"))
    t.withColumn("hhi_ppm",
        expr("CAST((ss * 1000000) div (st * st) AS BIGINT)"))
      .select(col("event_type"), col("n_users"), col("hhi_ppm"),
        when(col("hhi_ppm") === 0, lit(null).cast("long"))
          .otherwise(expr("1000000000000 div hhi_ppm"))
          .as("eff_users_ppm"))
  }

  /** K2 Horner evaluation via the native poly_eval expression; oracle
    * replicates the exact Horner operation order.
    */
  q("k2_poly_eval",
    """SELECT CAST(event_id AS BIGINT) AS event_id,
      |       round(((0.5 * (value / 7.0) + 2.0) * (value / 7.0) + 1.0), 6) AS yhat
      |FROM events WHERE event_id < 2000""") { (s, d) =>
    events(s, d).filter(col("event_id") < 2000).select(
      col("event_id"),
      round(poly_eval(array(lit(1.0), lit(2.0), lit(0.5)),
        col("value") / 7.0), 6).as("yhat"))
  }
}
