package graft.operators

import graft.{Det, Q, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.E — window functions.
  *
  * Reference evidence: ordered node assembly within a way
  * (`/root/reference/README.md:80-81`) and latest-per-snapshot dedupe
  * (`/root/reference/osm_etl.py:13`) are ranking/frame computations.
  *
  * Scale note: a window is one shuffle on its partition keys + one
  * per-partition sort. All specs below partition on a high-cardinality key
  * (custkey/user_id) so state per key stays tiny at 100 TB; none uses a
  * global (unpartitioned) window, which would funnel the data to one task.
  * Window ORDER BY keys are total within each partition (unique tiebreaker
  * column included) so row_number/ntile/frames are deterministic.
  */
object Windows {

  // orders per customer in date order; o_orderkey breaks date ties.
  private val byCust = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate"), col("o_orderkey"))
  private val byCustSql = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"

  // events per user in event-time order; (user_id, ts) is unique (FIXTURES.md).
  private val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
  private val byUserSql = "PARTITION BY user_id ORDER BY ts"

  val all: Seq[Q] = Seq(
    Q(
      "win_row_number",
      s"""SELECT o_orderkey, o_custkey,
         |       row_number() OVER ($byCustSql) AS order_seq
         |FROM orders
         |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
                row_number().over(byCust).as("order_seq"))
        .orderBy(col("o_orderkey"))
    },

    Q(
      "win_rank_dense",
      """SELECT c_custkey, c_mktsegment,
        |       rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_rank,
        |       dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_dense_rank
        |FROM customer
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      // rank/dense_rank are tie-stable: equal c_acctbal peers get equal
      // ranks, so no tiebreaker is needed for determinism.
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
      T.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
                rank().over(w).as("bal_rank"),
                dense_rank().over(w).as("bal_dense_rank"))
        .orderBy(col("c_custkey"))
    },

    Q(
      "win_ntile",
      """SELECT o_orderkey, o_orderpriority,
        |       ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS price_quartile
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      // ntile depends on row order → o_orderkey tiebreaker makes it total.
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
                ntile(4).over(w).as("price_quartile"))
        .orderBy(col("o_orderkey"))
    },

    Q(
      "win_lag_lead",
      s"""SELECT event_id, user_id,
         |       lag(value)  OVER ($byUserSql) AS prev_value,
         |       lead(value) OVER ($byUserSql) AS next_value
         |FROM events
         |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      // Adjacent-row access = the reference's consecutive-node→segment
      // pairing (README.md:80-81), on the event stream.
      T.events(s, d)
        .select(col("event_id"), col("user_id"),
                lag(col("value"), 1).over(byUser).as("prev_value"),
                lead(col("value"), 1).over(byUser).as("next_value"))
        .orderBy(col("event_id"))
    },

    Q(
      "win_running_sum",
      s"""SELECT o_orderkey, o_custkey,
         |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
         |         ($byCustSql ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_spend
         |FROM orders
         |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
                round(sum(Det.dec2(col("o_totalprice"))).over(w).cast("double"), 2)
                  .as("running_spend"))
        .orderBy(col("o_orderkey"))
    },

    Q(
      "win_moving_avg",
      s"""SELECT event_id, user_id,
         |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
         |             / count(*) OVER w, 4) AS moving_avg
         |FROM events
         |WINDOW w AS ($byUserSql ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      // Decimal sum / count instead of avg(double): frame-internal fp
      // summation order then cannot flip a rounding boundary vs the oracle.
      val w = byUser.rowsBetween(-3, 0)
      T.events(s, d)
        .select(col("event_id"), col("user_id"),
                round(sum(Det.dec2(col("value"))).over(w).cast("double")
                        / count(lit(1)).over(w), 4).as("moving_avg"))
        .orderBy(col("event_id"))
    },

    Q(
      "win_range_frame",
      """SELECT event_id, user_id,
        |       count(*) OVER w AS n_last_hour,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 2) AS sum_last_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      // Event-time band aggregate: RANGE frame over epoch seconds.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3600, 0)
      T.events(s, d)
        .select(col("event_id"), col("user_id"),
                count(lit(1)).over(w).as("n_last_hour"),
                round(sum(Det.dec2(col("value"))).over(w).cast("double"), 2)
                  .as("sum_last_hour"))
        .orderBy(col("event_id"))
    },

    Q(
      "win_first_last",
      s"""SELECT o_orderkey, o_custkey,
         |       first_value(o_totalprice) OVER w AS first_price,
         |       last_value(o_totalprice)  OVER w AS latest_price
         |FROM orders
         |WINDOW w AS ($byCustSql ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      // Explicit full frame: default frame ends at CURRENT ROW, which makes
      // last_value a silent no-op — a classic window footgun.
      val w = byCust.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
                first(col("o_totalprice")).over(w).as("first_price"),
                last(col("o_totalprice")).over(w).as("latest_price"))
        .orderBy(col("o_orderkey"))
    },

    Q(
      "win_nth_value",
      """SELECT o_orderkey, o_custkey,
        |       nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      // nth_value over an explicit full frame (same footgun as first/last:
      // the default frame ends at CURRENT ROW, hiding later rows). Order
      // key includes the unique orderkey so "2nd" is well-defined.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
                nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy(col("o_orderkey"))
    },

    Q(
      "win_percent_cume",
      """SELECT c_custkey,
        |       percent_rank() OVER w AS bal_pct_rank,
        |       cume_dist()    OVER w AS bal_cume_dist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      // Relative-standing windows (percentile position within a segment).
      // The order key includes the unique custkey so ranks are total —
      // both outputs are then exact small-integer ratios, bit-identical
      // across engines and partitionings.
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      T.customer(s, d)
        .select(col("c_custkey"),
                percent_rank().over(w).as("bal_pct_rank"),
                cume_dist().over(w).as("bal_cume_dist"))
        .orderBy(col("c_custkey"))
    },

    Q(
      "win_session_window",
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |g AS (
        |  SELECT user_id, event_id, ms,
        |         CASE WHEN lag(ms) OVER w IS NULL
        |              OR ms - lag(ms) OVER w >= 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |s AS (
        |  SELECT user_id, ms,
        |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM g)
        |SELECT user_id, min(ms) AS start_ms, max(ms) + 1800000 AS end_ms,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_ms""".stripMargin
    ) { (s, d) =>
      // Spark's NATIVE session_window aggregate in batch — the builtin
      // twin of event_sessionize's first-principles lag+cumsum build,
      // and the oracle cross-validates the two constructions against
      // each other. One boundary subtlety the oracle states exactly:
      // session_window's end is EXCLUSIVE (end = last event + gap), so
      // an event arriving at exactly prev + gap starts a NEW session —
      // the break predicate is >= gap, where event_sessionize's is
      // > gap. Plan shape: one shuffle on user_id, then Spark's
      // UpdatingSessionsExec merges islands in-partition — same
      // one-exchange contract as the manual build, and the same
      // operator Structured Streaming uses for stream_session, so
      // batch and stream sessions provably share semantics.
      T.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
                unix_millis(col("session_window.start")).as("start_ms"),
                unix_millis(col("session_window.end")).as("end_ms"),
                col("n_events"))
        .orderBy(col("user_id"), col("start_ms"))
    },

    Q(
      "win_fill_forward",
      """SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |       CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v,
        |       last_value(CASE WHEN event_type = 'view' THEN NULL ELSE value END IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM events
        |ORDER BY user_id, ms, event_id""".stripMargin
    ) { (s, d) =>
      // Forward fill (LOCF) — the telemetry gap-filling idiom: carry the
      // last observed reading across missing samples ('view' rows stand
      // in for the sensor's silent ticks). IGNORE NULLS turns the frame
      // into RUNNING STATE: one pass per partition holding only the most
      // recent non-null — never a per-row rescan of the preceding frame
      // — so the cost is one user_id shuffle + an in-partition sort,
      // the same single-exchange contract as every window key. The
      // (ts, event_id) order is total, values pass through with zero
      // arithmetic, and leading nulls stay null on both engines.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, d)
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"),
                when(col("event_type") === "view", lit(null).cast("double"))
                  .otherwise(col("value")).as("v"))
        .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
        .orderBy(col("user_id"), col("ms"), col("event_id"))
    },

    Q(
      "win_rolling_slope",
      """WITH d AS (
        |  SELECT event_type,
        |         CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, day, n,
        |         CAST(count(*) OVER w AS BIGINT) AS k,
        |         CAST(sum(day) OVER w AS BIGINT) AS sx,
        |         CAST(sum(n) OVER w AS BIGINT) AS sy,
        |         CAST(sum(day * n) OVER w AS BIGINT) AS sxy,
        |         CAST(sum(day * day) OVER w AS BIGINT) AS sxx
        |  FROM d
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, n, k,
        |       CASE WHEN k * sxx - sx * sx = 0 THEN NULL
        |            ELSE round(CAST(k * sxy - sx * sy AS DOUBLE)
        |                       / CAST(k * sxx - sx * sx AS DOUBLE), 6)
        |       END AS slope_per_day
        |FROM m
        |ORDER BY event_type NULLS FIRST, day""".stripMargin
    ) { (s, d) =>
      // ROLLING regression slope — the windowed trend detector ("is
      // this event type's daily volume ramping?") that pairs
      // agg_linear_regr's per-group fit with a moving 7-day frame:
      // four exact BIGINT moment sums (x = day, y = count — both exact
      // integers, so every window sum is exact and partition-order
      // independent) and the closed-form slope (kΣxy − ΣxΣy)/(kΣxx −
      // (Σx)²) as ONE IEEE division of exact integers, identical
      // formula text both engines, final-only 6-dp round. The
      // single-row frame at each partition start has a zero
      // denominator — reported NULL, never divided. Facts collapse to
      // the bounded types×days table FIRST (one scan, one bounded-key
      // aggregate); all five window sums share one (event_type)
      // exchange + one day sort, frames never rescan (running
      // subtract). At 100 TB the window input is |types×days|, not
      // events.
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      T.events(s, d)
        .groupBy(col("event_type"),
                 expr("CAST(floor(unix_millis(ts) / 86400000) AS BIGINT)").as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("k", count(lit(1)).over(w))
        .withColumn("sx", sum(col("day")).over(w))
        .withColumn("sy", sum(col("n")).over(w))
        .withColumn("sxy", sum(col("day") * col("n")).over(w))
        .withColumn("sxx", sum(col("day") * col("day")).over(w))
        .select(col("event_type"), col("day"), col("n"), col("k"),
          expr("""CASE WHEN k * sxx - sx * sx = 0 THEN NULL
                 |     ELSE round(CAST(k * sxy - sx * sy AS DOUBLE)
                 |                / CAST(k * sxx - sx * sx AS DOUBLE), 6)
                 |END""".stripMargin).as("slope_per_day"))
        .orderBy(col("event_type"), col("day"))
    },

    Q(
      "win_lin_interp",
      """WITH b AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |         CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
        |  FROM events),
        |f AS (
        |  SELECT event_id, user_id, ms, v,
        |         last_value(v IGNORE NULLS) OVER wp AS pv,
        |         last_value(CASE WHEN v IS NULL THEN NULL ELSE ms END IGNORE NULLS) OVER wp AS pm,
        |         first_value(v IGNORE NULLS) OVER wn AS nv,
        |         first_value(CASE WHEN v IS NULL THEN NULL ELSE ms END IGNORE NULLS) OVER wn AS nm
        |  FROM b
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY ms, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY user_id ORDER BY ms, event_id
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, ms, v,
        |       CASE WHEN v IS NOT NULL THEN v
        |            WHEN pv IS NULL THEN nv
        |            WHEN nv IS NULL THEN pv
        |            WHEN nm = pm THEN pv
        |            ELSE pv + (nv - pv) * (CAST(ms - pm AS DOUBLE) / CAST(nm - pm AS DOUBLE))
        |       END AS v_interp
        |FROM f
        |ORDER BY user_id, ms, event_id""".stripMargin
    ) { (s, d) =>
      // Linear gap INTERPOLATION — win_fill_forward's sibling: instead
      // of carrying the last reading flat across a gap (a step
      // function), draw the line between the surrounding observations
      // and read it off at each missing sample's own timestamp — the
      // time-series resampling idiom (pandas interpolate('time'),
      // TimescaleDB interpolate()). Two running-state passes over ONE
      // (user_id) exchange + ONE (ms, event_id) sort: the forward frame
      // carries (prev value, prev observed ms), the mirrored frame
      // carries (next value, next ms) — Spark plans both Window nodes
      // on the same sorted exchange (no second shuffle; the reversed
      // frame is a backward scan, not a re-sort), each holding O(1)
      // state per partition, so the key scales exactly like
      // win_fill_forward at 100 TB. Determinism: the interpolation
      // arithmetic is ONE shared expression text over exact integer ms
      // and parquet-identical doubles — identical IEEE ops both
      // engines, so the unrounded v_interp hashes bit-stably. Edges
      // pinned: leading gap → next observation (backfill), trailing gap
      // → previous (forward fill), all-null partition → NULL, equal
      // surrounding timestamps → previous value (guards the 0/0).
      val wp = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      T.events(s, d)
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"),
                when(col("event_type") === "view", lit(null).cast("double"))
                  .otherwise(col("value")).as("v"))
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
        .withColumn("pm", last(when(col("v").isNull, lit(null).cast("long"))
          .otherwise(col("ms")), ignoreNulls = true).over(wp))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wn))
        .withColumn("nm", first(when(col("v").isNull, lit(null).cast("long"))
          .otherwise(col("ms")), ignoreNulls = true).over(wn))
        .select(col("event_id"), col("user_id"), col("ms"), col("v"),
          expr("""CASE WHEN v IS NOT NULL THEN v
                 |     WHEN pv IS NULL THEN nv
                 |     WHEN nv IS NULL THEN pv
                 |     WHEN nm = pm THEN pv
                 |     ELSE pv + (nv - pv) * (CAST(ms - pm AS DOUBLE) / CAST(nm - pm AS DOUBLE))
                 |END""".stripMargin).as("v_interp"))
        .orderBy(col("user_id"), col("ms"), col("event_id"))
    },

    Q(
      "win_rolling_median",
      """WITH c AS (
        |  SELECT event_type, CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n,
        |       round(quantile_cont(n, 0.5) OVER (PARTITION BY event_type ORDER BY day
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
        |FROM c ORDER BY event_type NULLS FIRST, day""".stripMargin
    ) { (s, d) =>
      // Rolling 7-day MEDIAN of daily volume per event type — the
      // outlier-robust smoothing baseline `event_anomaly`'s mean/σ
      // z-score is not (one spike day drags a rolling mean for a week;
      // the median shrugs it off). An aggregate-as-window-function:
      // percentile over a ROWS frame runs per-partition after the ONE
      // (event_type)-keyed exchange of the collapsed daily counts —
      // the window input is days × types, never facts. The median
      // interpolates two exact integer counts the same way in both
      // engines (the agg_percentile-proven percentile ≡ quantile_cont
      // recipe), so even the .5 midpoints hash identically.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      T.events(s, d)
        .select(col("event_type"), day.as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
        .withColumn("med7", round(expr("percentile(n, 0.5)").over(w), 4))
        .orderBy(col("event_type"), col("day"))
    },

    Q(
      "win_hampel",
      """WITH c AS (
        |  SELECT event_type, CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT c.event_type, c.day + g.g AS day, c.n AS nb
        |  FROM c CROSS JOIN generate_series(-3, 3) g(g)),
        |m AS (
        |  SELECT w.event_type, w.day, c.n, quantile_cont(w.nb, 0.5) AS med
        |  FROM w JOIN c ON c.event_type = w.event_type AND c.day = w.day
        |  GROUP BY 1, 2, 3),
        |md AS (
        |  SELECT w.event_type, w.day, quantile_cont(abs(w.nb - m.med), 0.5) AS mad
        |  FROM w JOIN m ON m.event_type = w.event_type AND m.day = w.day
        |  GROUP BY 1, 2)
        |SELECT m.event_type, m.day, m.n,
        |       round(m.med, 4) AS med7, round(md.mad, 4) AS mad7,
        |       abs(m.n - m.med) > 4.4478 * md.mad AS is_outlier,
        |       round(CASE WHEN abs(m.n - m.med) > 4.4478 * md.mad
        |                  THEN m.med ELSE CAST(m.n AS DOUBLE) END, 4) AS repaired
        |FROM m JOIN md ON md.event_type = m.event_type AND md.day = m.day
        |ORDER BY m.event_type, m.day""".stripMargin
    ) { (s, d) =>
      // Hampel filter - the rolling outlier REPAIR rung above
      // win_rolling_median's smoothing: a point farther than
      // k*1.4826*MAD from the centered 7-day rolling median is replaced
      // BY that median (the standard telemetry de-spiker; 1.4826 scales
      // MAD to sigma under normality, k = 3, spliced as the single
      // 4.4478 literal so both engines compare the identical double).
      // MAD needs the window's own median per element, which no SQL
      // window frame can express - so the centered window materializes
      // through the offset-join device (win_rolling_corr's
      // generate_series trick re-expressed as explode(sequence), a pure
      // equi-join on (type, day)) and TWO grouped percentile passes
      // compute median then MAD. Everything runs on the collapsed daily
      // table - days x types x 7 rows, never facts; medians interpolate
      // exact integers (and exact .5 midpoints) identically in both
      // engines, the agg_percentile-proven recipe.
      val c = T.events(s, d)
        .select(col("event_type"),
                floor(unix_millis(col("ts")) / 86400000L).cast("long").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
      val w = c.select(col("event_type"), col("n").as("nb"),
                       explode(expr("sequence(-3, 3)")).as("g"),
                       (col("day") + col("g")).as("day"))
        .select(col("event_type"), col("day"), col("nb"))
      val m = w.join(c, Seq("event_type", "day"))
        .groupBy(col("event_type"), col("day"), col("n"))
        .agg(expr("percentile(nb, 0.5)").as("med"))
      val md = w.join(m.select(col("event_type"), col("day"), col("med")),
                      Seq("event_type", "day"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("percentile(abs(nb - med), 0.5)").as("mad"))
      m.join(md, Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("n"),
                round(col("med"), 4).as("med7"), round(col("mad"), 4).as("mad7"),
                (abs(col("n") - col("med")) > lit(4.4478) * col("mad")).as("is_outlier"),
                round(when(abs(col("n") - col("med")) > lit(4.4478) * col("mad"),
                           col("med")).otherwise(col("n").cast("double")), 4).as("repaired"))
        .orderBy(col("event_type"), col("day"))
    },

    Q(
      "win_rolling_corr",
      """WITH e AS (
        |  SELECT CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         count(*) FILTER (WHERE event_type = 'view')     AS nv,
        |         count(*) FILTER (WHERE event_type = 'purchase') AS np
        |  FROM events GROUP BY 1),
        |x AS (
        |  SELECT e.day + g.g AS day,
        |         CAST(count(*) AS BIGINT)        AS n,
        |         CAST(sum(nv) AS BIGINT)         AS sx,
        |         CAST(sum(np) AS BIGINT)         AS sy,
        |         CAST(sum(nv * np) AS BIGINT)    AS sxy,
        |         CAST(sum(nv * nv) AS BIGINT)    AS sxx,
        |         CAST(sum(np * np) AS BIGINT)    AS syy
        |  FROM e CROSS JOIN generate_series(0, 6) g(g)
        |  GROUP BY 1)
        |SELECT e.day, e.nv AS n_view, e.np AS n_purchase,
        |       CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL
        |            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
        |                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
        |       END AS corr7
        |FROM e JOIN x ON e.day = x.day
        |ORDER BY e.day""".stripMargin
    ) { (s, d) =>
      // Trailing-7-calendar-day correlation between view and purchase
      // daily volumes — the demand-coupling readout behind "do views
      // still convert?" drift alarms. Two deliberate choices:
      // (1) NOT the built-in corr() (Spark and DuckDB both use
      // incremental covariance updates whose last ulp differs): raw
      // INTEGER moment sums (n, Σx, Σy, Σxy, Σx², Σy² — daily counts
      // are integers, so every sum is exact) with the closed form
      // applied as the IDENTICAL IEEE expression text in both engines
      // — the agg_linear_regr recipe, rolled. Zero variance (constant
      // week) yields NULL by the same integer predicate on both sides.
      // (2) NOT an unpartitioned window (the event_rfm lesson): each
      // day's counts fan out to the ≤7 report days they contribute to
      // via a generator (`explode(sequence)` — the event_dau_rolling
      // pattern), so the rollup is an ordinary distributed day-keyed
      // aggregate with calendar-RANGE semantics, and no single-task
      // WindowExec exists at any scale. The fan-out input is the
      // COLLAPSED daily table — calendar-bounded, never facts. At
      // extreme volumes (≥1e9 events/day) the BIGINT squares need
      // DECIMAL moments — documented, not needed at any tested scale.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val e = T.events(s, d)
        .select(day.as("day"), col("event_type"))
        .groupBy(col("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("nv"),
             sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      val x = e
        .select(col("day"), col("nv"), col("np"),
                explode(sequence(lit(0L), lit(6L))).as("g"))
        .groupBy((col("day") + col("g")).as("day"))
        .agg(count(lit(1)).as("n"),
             sum(col("nv")).as("sx"), sum(col("np")).as("sy"),
             sum(col("nv") * col("np")).as("sxy"),
             sum(col("nv") * col("nv")).as("sxx"),
             sum(col("np") * col("np")).as("syy"))
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      e.join(x, "day")
        .select(col("day"), col("nv").as("n_view"), col("np").as("n_purchase"),
                when(vx * vy === 0, lit(null).cast("double"))
                  .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
                                   / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))), 6))
                  .as("corr7"))
        .orderBy(col("day"))
    },

    Q(
      "win_ewma",
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |x AS (
        |  SELECT event_type, e.day + g.g AS day,
        |         CAST(sum(n * (64 >> g.g)) AS BIGINT) AS num,
        |         CAST(sum(64 >> g.g) AS BIGINT)       AS den
        |  FROM e CROSS JOIN generate_series(0, 6) g(g)
        |  GROUP BY 1, 2)
        |SELECT e.event_type, e.day, e.n,
        |       round(CAST(x.num AS DOUBLE) / x.den, 4) AS ewma7
        |FROM e JOIN x ON e.event_type = x.event_type AND e.day = x.day
        |ORDER BY e.event_type, e.day""".stripMargin
    ) { (s, d) =>
      // Exponentially weighted moving average (half-life 1 day, 7-day
      // horizon) of daily volume per event type — the recency-weighted
      // smoother between win_moving_avg (all days equal) and "just use
      // yesterday". EWMA is RECURSIVE and so inexpressible as a window
      // aggregate in either engine; the kernel instead uses EXACT
      // DYADIC weights: contribution of a day at lag g is n·2^(6−g), so
      // numerator and denominator are exact BIGINT sums (powers of two
      // shift, never round) and the smoothed value is ONE IEEE division
      // of two exact integers — no float accumulation order exists to
      // drift. Same fan-out shape as win_rolling_corr: each day emits
      // its ≤7 weighted contributions through a generator, the rollup
      // is an ordinary (type, day)-keyed aggregate over the COLLAPSED
      // daily table, and no WindowExec appears at any scale.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val e = T.events(s, d)
        .select(col("event_type"), day.as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
      val x = e
        .select(col("event_type"), col("day"), col("n"),
                explode(sequence(lit(0L), lit(6L))).as("g"))
        .groupBy(col("event_type"), (col("day") + col("g")).as("day"))
        .agg(sum(col("n") * expr("shiftright(64L, cast(g as int))")).as("num"),
             sum(expr("shiftright(64L, cast(g as int))")).as("den"))
      e.join(x, Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("n"),
                round(col("num").cast("double") / col("den"), 4).as("ewma7"))
        .orderBy(col("event_type"), col("day"))
    },

    Q(
      "win_drawdown",
      """WITH c AS (
        |  SELECT user_id, ts,
        |         sum(CAST(value AS DECIMAL(18,2))) OVER
        |           (PARTITION BY user_id ORDER BY ts
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM events),
        |p AS (
        |  SELECT user_id, cum,
        |         max(cum) OVER (PARTITION BY user_id ORDER BY ts
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM c)
        |SELECT user_id,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       round(CAST(max(peak) AS DOUBLE), 2) AS peak,
        |       round(CAST(max(peak - cum) AS DOUBLE), 2) AS max_drawdown
        |FROM p GROUP BY user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      // Maximum drawdown of each user's running value balance — the
      // risk/quality metric every monitoring stack computes over a
      // cumulative series (peak-to-trough of Σ value in event-time
      // order). Two STACKED running frames (running sum, then running
      // max of that sum) share one (user_id, ts) sort, so the plan is a
      // single exchange + sort with both WindowExecs on top — no second
      // shuffle; the final per-user rollup reuses the same hash key.
      // All accumulation is exact DECIMAL(18,2): running sums and maxes
      // are order-independent per (user_id, ts) — (user_id, ts) is
      // unique per FIXTURES.md — so the result is bit-identical
      // cross-engine and stable under any repartitioning; doubles appear
      // only in the final per-user display cast. At 100 TB the window
      // partitions on high-cardinality user_id — per-key state is one
      // decimal, never a global funnel.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, d)
        .select(col("user_id"), col("ts"),
                sum(graft.Det.dec2(col("value"))).over(w).as("cum"))
        .withColumn("peak", max(col("cum")).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             round(max(col("peak")).cast("double"), 2).as("peak"),
             round(max(col("peak") - col("cum")).cast("double"), 2).as("max_drawdown"))
        .orderBy(col("user_id"))
    }
  )
}
