package graft.operators

import graft.{Caches, Gate, Q, T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-analytics operators over the `events` fixture: gap-based
  * sessionization and ordered funnel analysis — the batch counterparts of
  * §2.H's streaming session windows (the reference's serving DB answers
  * the same "user activity" questions over its loaded tables,
  * `/root/reference/README.md:93`).
  *
  * Both operators key every shuffle on `user_id`, the natural
  * distribution key of an event log: at 100 TB the event table arrives
  * hash-partitioned (or bucketed) by user, so the window sort and the
  * per-stage aggregates below are one exchange each — and the per-user
  * stage tables that funnel joins consume are corpus-fraction-sized,
  * so they ride the size-gated broadcast ([[graft.Gate.bcast]]).
  *
  * All timestamps are compared and emitted as epoch milliseconds
  * (`unix_millis` / DuckDB `epoch_ms`): exact BIGINT arithmetic in both
  * engines, no cross-engine timestamp-precision hazard in the oracle
  * hash (fixture values are µs; ms floor-truncation agrees bit-for-bit).
  */
object EventOps {

  /** The `event_absorbing` DuckDB oracle: the same 6-step absorption
    * unroll as the Spark loop, generated from one step template (the
    * pagerank device) — exact integer ppm, one `//` per state per step
    * after the exact sum. */
  private[operators] def absorbingOracleSql: String = {
    def step(k: Int): String = {
      val prev = if (k == 1) "h0" else s"h${k - 1}"
      s"""h$k AS (SELECT st.event_type,
         |  CASE WHEN st.event_type = 'purchase' THEN CAST(1000000 AS BIGINT)
         |       ELSE CAST(coalesce(sv.pv, 0) AS BIGINT) END AS p
         |  FROM states st LEFT JOIN (
         |    SELECT c.from_type AS event_type,
         |           CAST(sum(c.n * h.p) AS BIGINT) // max(t.n_from) AS pv
         |    FROM c JOIN $prev h ON h.event_type = c.to_type
         |           JOIN t ON t.from_type = c.from_type
         |    GROUP BY 1) sv ON sv.event_type = st.event_type)""".stripMargin
    }
    s"""WITH o AS (
       |  SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events
       |  WHERE event_type IS NOT NULL),
       |p0 AS (
       |  SELECT event_type AS from_type,
       |         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS to_type
       |  FROM o),
       |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n FROM p0
       |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1),
       |states AS (SELECT DISTINCT from_type AS event_type FROM c
       |           UNION SELECT DISTINCT to_type FROM c),
       |h0 AS (SELECT event_type,
       |              CASE WHEN event_type = 'purchase' THEN CAST(1000000 AS BIGINT)
       |                   ELSE CAST(0 AS BIGINT) END AS p
       |       FROM states),
       |${(1 to 6).map(step).mkString(",\n")}
       |SELECT event_type, p AS p_conv6_ppm FROM h6 ORDER BY event_type""".stripMargin
  }

  /** Retention-decay-fit output expressions — the cupedSelect device:
    * OLS slope/intercept over exact BIGINT moment sums, plus the
    * half-life the decay rate implies, rendered once for both engines. */
  private[operators] val retentionFitSelect: String = {
    val slope = "(CAST(n * stl - st * sl AS DOUBLE) / CAST(n * stt - st * st AS DOUBLE))"
    Seq(
      s"round(-($slope), 6) AS lambda_milli",
      s"round(CAST(sl AS DOUBLE) / n - $slope * (CAST(st AS DOUBLE) / n), 6) AS intercept_milli",
      s"round(693.1471805599453 / (-($slope)), 4) AS half_life_days"
    ).mkString(",\n")
  }

  /** Power-analysis output expressions (the cupedSelect device):
    * mean / sample variance from exact integer-cent moments, and the
    * per-arm n for a 5% MDE at α=0.05 two-sided, power 0.8 — rendered
    * once so both engines evaluate the identical IEEE expression.
    * z_{α/2} = Φ⁻¹(0.975), z_β = Φ⁻¹(0.8) as exact double literals. */
  private[operators] val powerSelect: String = {
    val vr = "((CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv) / (10000.0 * n * (n - 1.0)))"
    val mean = "(CAST(sv AS DOUBLE) / (100.0 * n))"
    val zz = "((1.959963984540054 + 0.8416212335729143) * (1.959963984540054 + 0.8416212335729143))"
    Seq(
      s"round($mean, 4) AS mean_value",
      s"round($vr, 6) AS variance",
      s"CAST(ceil(2.0 * $zz * $vr / ((0.05 * $mean) * (0.05 * $mean))) AS BIGINT) AS n_per_arm"
    ).mkString(",\n")
  }

  /** Binary-segmentation gain expressions for `event_changepoint` (the
    * cupedSelect device): the SSE reduction of splitting a segment after
    * local index i, from exact BIGINT prefix sums — numerators are exact
    * integer products CAST once to DOUBLE (tot ≤ ~3e9 keeps tot² inside
    * BIGINT — the event_cusum overflow-bound class), each division is
    * one IEEE op, so the argmax ranking compares IDENTICAL doubles in
    * both engines. Level-1 splits the full series (nd, tot); level-2
    * splits the [1..i1] and (i1..nd] halves around the level-1 winner
    * (preS = prefix at i1). */
  private[operators] val cpGain1: String =
    "(CAST(pre * pre AS DOUBLE) / i + CAST((tot - pre) * (tot - pre) AS DOUBLE) / (nd - i)" +
      " - CAST(tot * tot AS DOUBLE) / nd)"
  private[operators] val cpGainL: String =
    "(CAST(pre * pre AS DOUBLE) / i + CAST((preS - pre) * (preS - pre) AS DOUBLE) / (i1 - i)" +
      " - CAST(preS * preS AS DOUBLE) / i1)"
  private[operators] val cpGainR: String =
    "(CAST((pre - preS) * (pre - preS) AS DOUBLE) / (i - i1)" +
      " + CAST((tot - pre) * (tot - pre) AS DOUBLE) / (nd - i)" +
      " - CAST((tot - preS) * (tot - preS) AS DOUBLE) / (nd - i1))"

  /** Difference-in-differences output expressions (the cupedSelect
    * device): per-cell means from exact cent sums, DiD estimate =
    * (treat post−pre) − (control post−pre), rendered once for both
    * engines. */
  private[operators] val didSelect: String = {
    def mean(g: String, p: String) = s"(CAST(sv_${g}_$p AS DOUBLE) / (100.0 * n_${g}_$p))"
    Seq(
      s"round(${mean("a", "pre")}, 4) AS mean_ctl_pre",
      s"round(${mean("a", "post")}, 4) AS mean_ctl_post",
      s"round(${mean("b", "pre")}, 4) AS mean_trt_pre",
      s"round(${mean("b", "post")}, 4) AS mean_trt_post",
      s"round((${mean("b", "post")} - ${mean("b", "pre")}) - (${mean("a", "post")} - ${mean("a", "pre")}), 6) AS did"
    ).mkString(",\n")
  }

  /** Benford output expressions (the cupedSelect device): the nine
    * log10(1 + 1/d) probabilities as exact double literals, expected
    * count in ppm, and the per-cell χ² term rounded once to integer
    * micros so the per-type rollup is an exact BIGINT sum. The CASE
    * ladder is spliced identically into both engines. */
  private[operators] val benfordSelect: String = {
    val p = (1 to 9).map(dd => dd -> math.log10(1.0 + 1.0 / dd))
    val pCase = p.map { case (dd, pv) => s"WHEN digit = $dd THEN $pv" }
      .mkString("(CASE ", " ", " ELSE 0.0 END)")
    Seq(
      s"CAST(round($pCase * 1000000.0) AS BIGINT) AS exp_ppm",
      s"CAST(round(((CAST(n_obs AS DOUBLE) - n * $pCase) * (CAST(n_obs AS DOUBLE) - n * $pCase) / (n * $pCase)) * 1000000.0) AS BIGINT) AS chi2_term_micro"
    ).mkString(",\n")
  }

  /** CUPED output expressions, rendered ONCE and spliced verbatim into
    * both the Spark selectExpr and the DuckDB oracle (the shared-text
    * device every 1-row statistics formula here uses): θ from exact
    * BIGINT moments, raw and covariate-adjusted lifts. One expression
    * per line — the Spark side splits on ",\n". */
  private[operators] val cupedSelect: String = {
    val theta = "(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))"
    Seq(
      s"round($theta, 6) AS theta",
      "round(CAST(sy_b AS DOUBLE) / n_b - CAST(sy_a AS DOUBLE) / n_a, 6) AS diff_raw",
      s"round((CAST(sy_b AS DOUBLE) / n_b - $theta * (CAST(sx_b AS DOUBLE) / n_b - CAST(sx AS DOUBLE) / n)) - (CAST(sy_a AS DOUBLE) / n_a - $theta * (CAST(sx_a AS DOUBLE) / n_a - CAST(sx AS DOUBLE) / n)), 6) AS diff_cuped"
    ).mkString(",\n")
  }

  private val GapMs = 1800000L // 30 min session gap

  /** Exact global ntile(k) WITHOUT a single-partition window (the classic
    * `Window.orderBy` ntile funnels the whole table through one task —
    * VERDICT r12 flagged exactly that in event_rfm), computed for
    * SEVERAL independent orderings in ONE shuffle TOTAL (r13 item 6
    * collapsed one-shuffle-per-dim to one range shuffle; r14 item 4
    * profiling showed even that was two exchanges — repartitionByRange
    * plus the window's own hash exchange — and a hidden range-SAMPLING
    * job). Now the range bucket is a COLUMN: one job materializes the
    * caller's persisted input AND collects per-dim COMPOSITE (key,
    * tie) boundaries from a deterministic bounded sample; each
    * (tie, dim) row computes its bucket by scanning that
    * ≤`parts`-element literal array, and the ONLY exchange is the rank
    * window's own hash on (bucket, dim). The tie column must be
    * NUMERIC (castable to DECIMAL(28,2)): it participates in the
    * composite boundaries.
    * Boundary accuracy affects BALANCE ONLY — exactness comes from the
    * local row_number + an exact count-offset table (one map-side-
    * combined ≤ parts×dims aggregate off the cached input, collected
    * and re-entering the plan as a LITERAL map — join-free scoring),
    * which never assumes buckets are equal-sized. The per-dim keys
    * widen to a common exact DECIMAL(28,2) (order-preserving for
    * integral millis, counts, and 2-dp money); the bucket formula is
    * SQL ntile's (first n%k buckets one row fatter). Bit-identical to
    * k ntile windows because each (dim, key, tie) order is total.
    */
  private def globalNtileMulti(df: DataFrame, tie: String,
                               dims: Seq[(String, String)], k: Int,
                               carry: Seq[String] = Nil): DataFrame = {
    val s = df.sparkSession
    val parts = s.conf.getOption("spark.sql.shuffle.partitions").map(_.toInt).getOrElse(32)
    val dec = org.apache.spark.sql.types.DecimalType(28, 2)
    val entries = dims.zipWithIndex.map { case ((key, _), i) =>
      // Fail-loud widening (ADVICE r14): under non-ANSI Spark an
      // overflowing cast yields NULL, and a NULL ranking key would sort
      // first and silently mis-bucket the whole ntile. Coalesce is
      // lazy, so raise_error fires only on an actual overflow/NULL key.
      struct(lit(i).as("dim"),
             coalesce(
               col(key).cast(dec),
               raise_error(concat(
                 lit(s"globalNtileMulti: ranking key '$key' is NULL or exceeds " +
                     "DECIMAL(28,2) for tie "), col(tie).cast("string")))
                 .cast(dec)).as("keyd"))
    }
    // One action does double duty: it materializes the caller's persist
    // of `df` (which every later pass reads from cache) and collects a
    // deterministic bounded sample of COMPOSITE (key, tie) pairs per
    // dim — RangePartitioner's algorithm, done by hand so the resulting
    // boundaries can become a bucket COLUMN instead of a physical
    // partitioning (which the rank window could not reuse — it would
    // re-exchange). Boundaries MUST be composite: a key-only split
    // (e.g. percentile of the key) strands every tie group in one
    // bucket, and a tie-heavy dim like an event COUNT (power law: a
    // third of all users at n_events=1) would funnel a third of the
    // corpus through ONE window task at scale. With the tie in the
    // boundary, tie runs split exactly like repartitionByRange splits
    // them. The thin-out sampler is deterministic (stride doubling, no
    // RNG): sample quality shifts bucket BALANCE only, never a rank.
    // The same pass also returns the EXACT per-partition row count (one
    // sentinel tuple per partition, cnt >= 0) — it feeds the size gate
    // below for free, since the sampler streams every row anyway.
    import s.implicits._
    val sampleCap = 128 // per input partition per dim; collected ≤ cap × parts × dims
    val sampleRows: Array[(Int, BigDecimal, BigDecimal, Long)] = df
      .select(explode(array(dims.zipWithIndex.map { case ((key, _), i) =>
        // Same fail-loud widening as `entries` (ADVICE r15): without it a
        // NULL/overflowing key reaches the driver as a null BigDecimal and
        // `samples...sorted` dies in an opaque NPE BEFORE the documented
        // loud error below can fire. All three cast sites now share it.
        def loud(c: String) = coalesce(
          col(c).cast(dec),
          raise_error(concat(
            lit(s"globalNtileMulti: sampler column '$c' is NULL or exceeds " +
                "DECIMAL(28,2) for tie "), col(tie).cast("string"))).cast(dec))
        struct(lit(i).as("d"), loud(key).as("k"), loud(tie).as("t"))
      }: _*)).as("e"))
      .select(col("e.d"), col("e.k"), col("e.t"))
      .as[(Int, BigDecimal, BigDecimal)]
      .mapPartitions { it =>
        val bufs = Array.fill(dims.size)(
          scala.collection.mutable.ArrayBuffer.empty[(Int, BigDecimal, BigDecimal, Long)])
        val strides = Array.fill(dims.size)(1L)
        val seen = Array.fill(dims.size)(0L)
        it.foreach { e =>
          val d = e._1
          if (seen(d) % strides(d) == 0L) {
            bufs(d) += ((e._1, e._2, e._3, -1L))
            if (bufs(d).size > sampleCap) {
              val kept = bufs(d).zipWithIndex.collect { case (x, ix) if ix % 2 == 0 => x }
              bufs(d).clear(); bufs(d) ++= kept
              strides(d) *= 2
            }
          }
          seen(d) += 1
        }
        bufs.iterator.flatten ++ Iterator.single((0, BigDecimal(0), BigDecimal(0), seen(0)))
      }
      .collect()
    val nExact = sampleRows.filter(_._4 >= 0L).map(_._4).sum
    // Size-gated driver fast path (the Gate.bcast pattern applied to
    // compute instead of broadcast): below the budget, the whole
    // scoring input is a small per-entity table — collect it, assign
    // the k-tiles with the identical formula, and re-enter the plan as
    // a LocalRelation, skipping the counts job, the rank window, and
    // the pivot exchange entirely (3 jobs -> 1 tiny local sort). The
    // distributed path below is byte-identical in result and takes
    // over silently above the budget — scale behavior is unchanged.
    val gateRows = s.conf.getOption("spark.sql.graft.ntileDriverGateRows")
      .map(_.toLong).getOrElse(250000L)
    if (nExact <= gateRows) return ntileDriver(df, tie, dims, k, carry, nExact)
    val samples = sampleRows.filter(_._4 < 0L).map(e => (e._1, e._2, e._3))
    val bucketOf = dims.indices.map { i =>
      val sorted = samples.filter(_._1 == i).map(e => (e._2, e._3)).sorted
      val bs: Seq[(BigDecimal, BigDecimal)] =
        if (sorted.isEmpty) Nil
        else (1 until parts).map(j => sorted((j * sorted.length / parts)
          .min(sorted.length - 1))).distinct
      // bucket = #composite boundaries strictly below (keyd, tie):
      // lexicographic, so equal keys still spread across buckets by tie
      if (bs.isEmpty) lit(0)
      else bs.map { case (bk, bt) =>
        val bkL = lit(bk.bigDecimal).cast(dec)
        val btL = lit(bt.bigDecimal).cast(dec)
        when(col("keyd") > bkL ||
             (col("keyd") === bkL && col(tie).cast(dec) > btL), 1).otherwise(0)
      }.reduce(_ + _)
    }
    // `carry` columns ride the shuffle so the caller needs NO final
    // user-keyed join to recover its payload (r14 VERDICT item 4: the
    // join-back was the residual cost). They are masked onto the dim-0
    // rows ONLY — the shuffle replicates each tie #dims times, and an
    // unmasked payload would triple the shuffled bytes for nothing; the
    // pivot recovers them with the same max() it uses for the scores.
    val long = df.select(col(tie) +: carry.map(col) :+
        explode(array(entries: _*)).as("e"): _*)
      .select(col(tie) +: col("e.dim").as("dim") +: col("e.keyd").as("keyd") +:
        carry.map(c => when(col("e.dim") === 0, col(c)).as(c)): _*)
    val bucket = dims.indices.foldLeft(lit(0): org.apache.spark.sql.Column) {
      (acc, i) => when(col("dim") === i, bucketOf(i)).otherwise(acc)
    }.cast("int")
    // Per-(bucket, dim) exact counts, straight off the caller's cached
    // input: map-side combine collapses each input partition to
    // ≤ parts×dims rows, so the collected table is O(config²), never
    // O(data). Bucket ids ascend with key ranges, so the per-dim
    // running sum of counts IS each bucket's global rank offset.
    val counts = long.withColumn("__pid", bucket)
      .groupBy(col("__pid"), col("dim")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val n = counts.filter(_._2 == 0).map(_._3).sum
    val offMap: Map[Int, Long] = dims.indices.flatMap { dIx =>
      var acc = 0L
      counts.filter(_._2 == dIx).sortBy(_._1).map { case (p, _, c) =>
        val o = acc; acc += c; (p * dims.size + dIx) -> o
      }
    }.toMap
    // Scoring is then join-FREE: the ≤ parts×dims offset table rides
    // into the plan as a literal map (element_at lookup — every
    // (bucket, dim) present in the data has an entry by construction),
    // and the ntile constants are plain literals. The one remaining
    // exchange before the pivot is the rank window's own.
    val base = n / k
    val rem = n % k
    val thr = rem * (base + 1)
    val rank = element_at(typedLit(offMap), col("__pid") * dims.size + col("dim")) +
      col("__rn") // exact 1-based global rank per dim
    // Integer bucket math; operands are non-negative BIGINTs, so DIV
    // (truncating) equals floor division. SQL ntile's formula: first
    // n%k buckets one row fatter.
    def idiv(a: org.apache.spark.sql.Column, b: Long) =
      floor(a / lit(b)).cast("long")
    val scored = long.withColumn("__pid", bucket)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__pid"), col("dim")).orderBy(col("keyd"), col(tie))))
      .withColumn("__score",
        when(rank <= lit(thr), idiv(rank - 1, base + 1) + 1)
          .otherwise(lit(rem) + idiv(rank - 1 - lit(thr), math.max(base, 1L)) + 1))
    val aggs = dims.zipWithIndex.map { case ((_, out), i) =>
      max(when(col("dim") === i, col("__score"))).cast("long").as(out)
    } ++ carry.map(c => max(col(c)).as(c)) // exactly one non-null per tie
    scored.groupBy(col(tie)).agg(aggs.head, aggs.tail: _*)
  }

  /** The under-budget arm of [[globalNtileMulti]]'s size gate: collect
    * the per-entity table, assign each dim's k-tiles with the identical
    * rank formula (so the two arms are bit-interchangeable), re-enter
    * the plan as a LocalRelation with the exact schema the distributed
    * pivot would produce: (tie, dim outputs as BIGINT, carry columns).
    */
  private def ntileDriver(df: DataFrame, tie: String, dims: Seq[(String, String)],
                          k: Int, carry: Seq[String], n: Long): DataFrame = {
    val s = df.sparkSession
    val dec = org.apache.spark.sql.types.DecimalType(28, 2)
    val nd = dims.size
    val rows = df.select(
      col(tie) +: col(tie).cast(dec).as("__tieOrd") +:
      (dims.map(dd => col(dd._1).cast(dec)) ++ carry.map(col)): _*).collect()
    val n2 = rows.length
    require(n2 == n, s"globalNtileMulti gate: sampler counted $n rows, collect saw $n2")
    val base = n2.toLong / k; val rem = n2.toLong % k; val thr = rem * (base + 1)
    def scoreOf(rank: Long): Long =
      if (rank <= thr) (rank - 1) / (base + 1) + 1
      else rem + (rank - 1 - thr) / math.max(base, 1L) + 1
    val scores = Array.ofDim[Long](n2, math.max(nd, 1))
    for (d <- 0 until nd) {
      val order = (0 until n2).sortBy { i =>
        // same fail-loud contract as the distributed arm's raise_error:
        // a NULL/overflowed key aborts with the tie id, never mis-sorts
        val kd = rows(i).getDecimal(2 + d)
        val td = rows(i).getDecimal(1)
        require(kd != null && td != null,
          s"globalNtileMulti(driver): NULL ranking key '${dims(d)._1}' or tie " +
            s"for ${rows(i).get(0)}")
        (BigDecimal(kd), BigDecimal(td))
      }
      var j = 0
      while (j < n2) { scores(order(j))(d) = scoreOf(j + 1L); j += 1 }
    }
    val schema = org.apache.spark.sql.types.StructType(
      df.schema(tie) +:
      (dims.map(dd => org.apache.spark.sql.types.StructField(
         dd._2, org.apache.spark.sql.types.LongType)) ++
       carry.map(c => df.schema(c))))
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](n2)
    var i = 0
    while (i < n2) {
      val r = rows(i)
      out.add(org.apache.spark.sql.Row.fromSeq(
        r.get(0) +: (scores(i).toSeq ++ carry.indices.map(ci => r.get(2 + nd + ci)))))
      i += 1
    }
    s.createDataFrame(out, schema)
  }

  val all: Seq[Q] = Seq(

    Q(
      "event_sessionize",
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |g AS (
        |  SELECT user_id, event_id, ms,
        |         CASE WHEN lag(ms) OVER w IS NULL
        |              OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |s AS (
        |  SELECT user_id, ms,
        |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ms) AS start_ms, max(ms) AS end_ms
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
    ) { (s, d) =>
      // Gap-based batch sessionization: a session break is a >30 min gap
      // between consecutive events of one user; session_id is the running
      // count of breaks (lag + cumulative sum over the same user window).
      // One exchange on user_id feeds both window passes AND the session
      // roll-up (lag, the running sum, and groupBy(user_id, session_id)
      // all hash on user_id first) — the canonical one-shuffle
      // sessionization that holds at 100 TB, where the in-partition sort
      // is per-user-sized, never global.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      val gap = col("ms") - lag(col("ms"), 1).over(w)
      T.events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
        .withColumn("new_s", when(gap.isNull || gap > GapMs, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
             min(col("ms")).as("start_ms"),
             max(col("ms")).as("end_ms"))
        .orderBy(col("user_id"), col("session_id"))
    },

    Q(
      "event_session_stats",
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |g AS (
        |  SELECT user_id, event_id, ms,
        |         CASE WHEN lag(ms) OVER w IS NULL
        |              OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |s AS (
        |  SELECT user_id, ms,
        |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g),
        |sess AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |         max(ms) - min(ms) AS dur_ms
        |  FROM s GROUP BY user_id, session_id)
        |SELECT count(*) AS n_sessions,
        |       count(DISTINCT user_id) AS n_users,
        |       round(quantile_cont(n_events, 0.5), 4) AS med_events,
        |       round(quantile_cont(dur_ms, 0.5), 4)   AS med_dur_ms,
        |       round(quantile_cont(dur_ms, 0.9), 4)   AS p90_dur_ms
        |FROM sess""".stripMargin
    ) { (s, d) =>
      // The session-quality report over event_sessionize's construction:
      // median events/session, median and p90 duration — the dashboard
      // row a sessionization change is judged by (a gap-threshold tweak
      // shows up here first). Same one-exchange build (lag + running sum
      // + roll-up all hash on user_id); the stats pass then aggregates
      // the |sessions| table — already ≪ events — in one global reduce,
      // with percentile interpolation over exact integers (the proven
      // percentile ≡ quantile_cont recipe) so midpoints hash identically.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      val gap = col("ms") - lag(col("ms"), 1).over(w)
      T.events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
        .withColumn("new_s", when(gap.isNull || gap > GapMs, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
             (max(col("ms")) - min(col("ms"))).as("dur_ms"))
        .agg(count(lit(1)).as("n_sessions"),
             countDistinct(col("user_id")).as("n_users"),
             round(expr("percentile(n_events, 0.5)"), 4).as("med_events"),
             round(expr("percentile(dur_ms, 0.5)"), 4).as("med_dur_ms"),
             round(expr("percentile(dur_ms, 0.9)"), 4).as("p90_dur_ms"))
    },

    Q(
      "event_funnel",
      """WITH a AS (
        |  SELECT user_id, min(epoch_ms(ts)) AS ta FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |b AS (
        |  SELECT e.user_id, min(epoch_ms(e.ts)) AS tb
        |  FROM events e JOIN a ON e.user_id = a.user_id
        |  WHERE e.event_type = 'click'
        |    AND epoch_ms(e.ts) > a.ta AND epoch_ms(e.ts) <= a.ta + 86400000
        |  GROUP BY e.user_id),
        |c AS (
        |  SELECT e.user_id, min(epoch_ms(e.ts)) AS tc
        |  FROM events e JOIN b ON e.user_id = b.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_ms(e.ts) > b.tb AND epoch_ms(e.ts) <= b.tb + 86400000
        |  GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type, count(*) AS n_users FROM a
        |UNION ALL SELECT CAST(2 AS BIGINT), 'click', count(*) FROM b
        |UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM c
        |ORDER BY stage""".stripMargin
    ) { (s, d) =>
      // Ordered funnel view → click → purchase with a 24 h conversion
      // window per hop: each stage is the users whose earliest qualifying
      // event STRICTLY FOLLOWS their previous stage's earliest and lands
      // within the window (min-ts per user, then a filtered
      // re-aggregate; without the bound the fixture's 30-day log
      // converts everyone and the check discriminates nothing). Every
      // groupBy and join keys on user_id, so the three stages share one
      // partitioning of the event log; the per-user stage tables fed
      // back into the joins shrink monotonically (funnel ⊆ previous
      // stage) and are corpus-fraction-sized → size-gated broadcast,
      // shuffle join past the budget.
      val HopMs = 86400000L
      val ev = T.events(s, d)
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
      val a = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ms")).as("ta"))
      val b = ev.where(col("event_type") === "click")
        .join(Gate.bcast(a), "user_id")
        .where(col("ms") > col("ta") && col("ms") <= col("ta") + HopMs)
        .groupBy(col("user_id")).agg(min(col("ms")).as("tb"))
      val c = ev.where(col("event_type") === "purchase")
        .join(Gate.bcast(b), "user_id")
        .where(col("ms") > col("tb") && col("ms") <= col("tb") + HopMs)
        .groupBy(col("user_id")).agg(min(col("ms")).as("tc"))
      def stage(n: Int, name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(n.toLong).as("stage"), lit(name).as("event_type"), col("n_users"))
      stage(1, "view", a).unionAll(stage(2, "click", b)).unionAll(stage(3, "purchase", c))
        .orderBy(col("stage"))
    },

    Q(
      "event_retention",
      """WITH f AS (
        |  SELECT user_id,
        |         CAST(floor(min(epoch_ms(ts)) / 86400000) AS BIGINT) AS cohort_day
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id)
        |SELECT f.cohort_day,
        |       CAST(floor(epoch_ms(e.ts) / 86400000) AS BIGINT) - f.cohort_day AS day_offset,
        |       count(DISTINCT e.user_id) AS n_active
        |FROM events e JOIN f ON e.user_id = f.user_id
        |WHERE e.event_type = 'purchase'
        |  AND CAST(floor(epoch_ms(e.ts) / 86400000) AS BIGINT) >= f.cohort_day
        |GROUP BY 1, 2
        |ORDER BY cohort_day, day_offset""".stripMargin
    ) { (s, d) =>
      // Cohort retention: users cohorted by first-signup DAY (the
      // fixture's uniform 30-day log collapses to one cohort at week
      // grain — day grain discriminates), activity = distinct purchasers
      // per (cohort, day-offset) cell. The cohort table is per-user →
      // size-gated broadcast back onto the log; the distinct-count
      // aggregate hashes on the O(days²) cell key, with Spark's two-phase
      // distinct expansion keeping the map side partial. Day indices are
      // exact epoch-ms integer floors, so both engines bucket identically.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val ev = T.events(s, d)
        .select(col("user_id"), col("event_type"), day.as("day"))
      val f = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      ev.where(col("event_type") === "purchase")
        .join(Gate.bcast(f), "user_id")
        .where(col("day") >= col("cohort_day"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },

    Q(
      "event_concurrency",
      """WITH w AS (SELECT epoch_ms(ts) AS s, epoch_ms(ts) + 7200000 AS e
        |           FROM events WHERE event_type = 'purchase'),
        |edges AS (SELECT s AS t, 1 AS dlt FROM w UNION ALL SELECT e, -1 FROM w),
        |r AS (SELECT t, sum(dlt) OVER (ORDER BY t, dlt) AS depth FROM edges)
        |SELECT t // 3600000 AS hour_bucket,
        |       CAST(max(depth) AS BIGINT) AS max_concurrent
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      // CONCURRENT-INTERVAL depth (occupancy / queue-depth) — the
      // classic sweep-line: ±1 edges at window starts/ends, running sum
      // in time order, max per serving hour. The global running sum is
      // the textbook single-task-window trap; here it rides the
      // partial-offset device (the weighted-prefix-sum form of
      // TrainingOps.globalRowNumber): range-repartition the edge
      // stream on (t, dlt), per-partition edge sums collect as ≤ P
      // metadata rows, driver prefix-sums them, and the only window is
      // LOCAL per partition — no task ever sorts more than ~1/P of the
      // edges at any scale. Tie semantics are the half-open contract:
      // at equal t the −1 sorts first (a window ending at t does not
      // overlap one starting at t), and the default RANGE frame applies
      // each (t, dlt) tie group as one step. Tie groups MAY straddle a
      // range boundary: the partial cums a split produces always lie
      // BETWEEN the adjacent full depths (monotone within a group), so
      // max-per-bucket is split-independent and the hash cannot drift.
      import org.apache.spark.sql.expressions.Window
      val w = T.events(s, d).where(col("event_type") === "purchase")
        .select(unix_millis(col("ts")).as("t0"))
      val edges = w.select(col("t0").as("t"), lit(1L).as("dlt"))
        .unionByName(w.select((col("t0") + 7200000L).as("t"), lit(-1L).as("dlt")))
      val parts = s.conf.getOption("spark.sql.shuffle.partitions").map(_.toInt).getOrElse(32)
      val ranged = graft.Caches.register(
        edges.repartitionByRange(parts, col("t"), col("dlt"))
          .withColumn("_pid", spark_partition_id()).persist())
      val partials = ranged.groupBy(col("_pid")).agg(sum(col("dlt")).as("pd"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val offsets = partials.map(_._2).scanLeft(0L)(_ + _).init
      val offExpr = partials.map(_._1).zip(offsets).foldLeft(lit(0L)) {
        case (acc, (pid, off)) => when(col("_pid") === pid, lit(off)).otherwise(acc)
      }
      ranged
        .withColumn("lcum", sum(col("dlt")).over(
          Window.partitionBy(col("_pid")).orderBy(col("t"), col("dlt"))))
        .select(expr("t DIV 3600000").as("hour_bucket"),
                (col("lcum") + offExpr).as("depth"))
        .groupBy(col("hour_bucket"))
        .agg(max(col("depth")).as("max_concurrent"))
        .orderBy(col("hour_bucket"))
    },

    Q(
      "event_dau_rolling",
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM ud),
        |contrib AS (
        |  SELECT user_id, day + o.off AS report_day
        |  FROM ud, (SELECT unnest(generate_series(0, 6)) AS off) o)
        |SELECT d.day AS report_day, count(DISTINCT c.user_id) AS active_7d
        |FROM days d JOIN contrib c ON c.report_day = d.day
        |GROUP BY d.day
        |ORDER BY report_day""".stripMargin
    ) { (s, d) =>
      // Rolling 7-day distinct active users per day — the dashboard
      // staple that is quietly hard at scale because a naive
      // per-day self-join re-scans the log 7×. Here the log collapses
      // FIRST to distinct (user, day) pairs (one shuffle, and at 100 TB
      // that dedup is the big reduction: |user-days| ≪ |events|); each
      // pair then fans out to the ≤7 report days it contributes to via
      // a generator (`explode(sequence(...))` — no shuffle, no
      // re-scan), and one distinct-count per report day finishes it.
      // The observed-days table is bounded by the calendar → size-gated
      // broadcast keeps the contribution stream shuffle-free until the
      // final count.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val ud = T.events(s, d).select(col("user_id"), day.as("day")).distinct()
      val days = ud.select(col("day").as("report_day")).distinct()
      ud.select(col("user_id"),
                explode(sequence(col("day"), col("day") + lit(6))).as("report_day"))
        .join(Gate.bcast(days), "report_day")
        .groupBy(col("report_day"))
        .agg(countDistinct(col("user_id")).as("active_7d"))
        .orderBy(col("report_day"))
    },

    Q(
      "event_attribution",
      """WITH o AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events),
        |w AS (
        |  SELECT user_id, event_type,
        |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ms, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM o)
        |SELECT coalesce(touch, 'none') AS touch, count(*) AS n_purchases
        |FROM w WHERE event_type = 'purchase'
        |GROUP BY 1
        |ORDER BY touch""".stripMargin
    ) { (s, d) =>
      // Last-touch attribution: each purchase credits the user's most
      // recent non-purchase event. One user-partitioned window pass
      // (`last(..., ignoreNulls)` over an unbounded-to-previous-row
      // frame — running state, not a per-row rescan) carries the latest
      // touch along the ordered event stream; purchases then roll up by
      // touch type. Single shuffle on user_id, per-user sort — the same
      // one-exchange profile as sessionize, at any log size.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      T.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
                unix_millis(col("ts")).as("ms"))
        .withColumn("touch",
          last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
            .over(w))
        .where(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("none")).as("touch"))
        .agg(count(lit(1)).as("n_purchases"))
        .orderBy(col("touch"))
    },

    Q(
      "event_markov",
      """WITH o AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events
        |  WHERE event_type IS NOT NULL),
        |p AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS to_type
        |  FROM o),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |       CAST((1000000 * c.n) // t.n_from AS BIGINT) AS p_ppm
        |FROM c JOIN t ON c.from_type = t.from_type
        |ORDER BY c.from_type, c.to_type""".stripMargin
    ) { (s, d) =>
      // First-order Markov transition matrix over per-user event streams
      // — `event_path_topk` surfaces WHICH paths exist; this one gives
      // the per-step transition probabilities behind them (churn models,
      // next-action prediction baselines). One lead over the
      // user-partitioned window forms the (from, to) stream in a single
      // shuffle; the pair counts collapse to a bounded |types|² key
      // space, the per-from totals aggregate THAT tiny table, and the
      // probability is integer-scaled ppm ((10⁶·n) DIV n_from) — exact
      // BIGINT arithmetic, bit-identical cross-engine, no float division
      // in either plan. The totals table is |types|-sized → size-gated
      // broadcast back onto the pair counts.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      // null-typed events are not states: excluded BEFORE the lead in
      // both engines (the event_path_topk rule), so a transition bridges
      // over them rather than producing a null-keyed matrix row
      val c = T.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("user_id"), col("event_type").as("from_type"),
                unix_millis(col("ts")).as("ms"), col("event_id"))
        .withColumn("to_type", lead(col("from_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
      val t = c.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
      c.join(Gate.bcast(t), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
                expr("(1000000 * n) DIV n_from").as("p_ppm"))
        .orderBy(col("from_type"), col("to_type"))
    },

    Q(
      "event_rfm",
      """WITH u AS (
        |  SELECT user_id, max(epoch_ms(ts)) AS last_ms, count(*) AS n_events,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS monetary
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT user_id, n_events, monetary,
        |         ntile(5) OVER (ORDER BY last_ms, user_id) AS r_score,
        |         ntile(5) OVER (ORDER BY n_events, user_id) AS f_score,
        |         ntile(5) OVER (ORDER BY monetary, user_id) AS m_score
        |  FROM u)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |       round(CAST(monetary AS DOUBLE), 2) AS monetary,
        |       CAST(r_score AS BIGINT) AS r_score,
        |       CAST(f_score AS BIGINT) AS f_score,
        |       CAST(m_score AS BIGINT) AS m_score,
        |       CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
        |FROM r ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      // RFM segmentation — the classic lifecycle-marketing cut of an
      // event log: per user, Recency (last activity), Frequency (event
      // count), Monetary (exact-decimal spend), each quintile-scored 1-5,
      // composed into the 3-digit segment code (555 = recent, frequent,
      // big spender). One shuffle collapses the log to the per-user table
      // — scoring then runs over USERS, not events (a 10⁴× smaller
      // table). Every ranking is deterministic: last_ms is integer,
      // n_events is a count, monetary orders by the EXACT DECIMAL sum
      // (never the rounded double — equal-to-2dp users must not swap
      // quintiles on float noise), and user_id breaks all ties. The
      // quintiles come from [[globalNtileMulti]] — a range-partitioned
      // two-phase rank that reproduces `ntile(5) OVER (ORDER BY ...)`
      // bit-for-bit WITHOUT the single-task global window (the r12 scale
      // defect): every stage is parallel at any user count, and the only
      // driver-side state is one row-count per (range, dimension). All
      // THREE dimensions ride one composite range shuffle in long format
      // (r13 VERDICT item 6 — previously 3× repartition+persist+collect);
      // n_events/monetary ride the same shuffle as dim-0-masked carry
      // columns, so the pivot emits the finished wide row and the old
      // user-keyed join-back (the r14 residual cost) is gone entirely.
      val u = Caches.register(T.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(unix_millis(col("ts"))).as("last_ms"),
             count(lit(1)).as("n_events"),
             sum(graft.Det.dec2(col("value"))).as("monetary"))
        .persist())
      globalNtileMulti(u.toDF(), "user_id",
          Seq("last_ms" -> "r_score", "n_events" -> "f_score",
              "monetary" -> "m_score"), 5,
          carry = Seq("n_events", "monetary"))
        .select(col("user_id"), col("n_events"),
                round(col("monetary").cast("double"), 2).as("monetary"),
                col("r_score").cast("long").as("r_score"),
                col("f_score").cast("long").as("f_score"),
                col("m_score").cast("long").as("m_score"),
                (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
                  .cast("long").as("rfm"))
        .orderBy(col("user_id"))
    },

    Q(
      "event_path_topk",
      """WITH o AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id FROM events
        |  WHERE event_type IS NOT NULL),
        |w AS (
        |  SELECT user_id, event_type,
        |         lead(event_type, 1) OVER win AS t2,
        |         lead(event_type, 2) OVER win AS t3
        |  FROM o WINDOW win AS (PARTITION BY user_id ORDER BY ms, event_id))
        |SELECT event_type || '>' || t2 || '>' || t3 AS path, count(*) AS f
        |FROM w WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        |GROUP BY 1
        |ORDER BY f DESC, path
        |LIMIT 10""".stripMargin
    ) { (s, d) =>
      // Top-10 3-step behavioral paths (funnel DISCOVERY — `event_funnel`
      // measures a path you already know; this one surfaces which paths
      // exist). Two leads over one user-partitioned window turn the
      // ordered stream into overlapping type-trigrams in a single
      // shuffle + in-partition sort — no self-joins; the trigram count
      // is a partial+final agg over a bounded (|types|³) key space and
      // the cut fuses to TakeOrderedAndProject with a path tie-break.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      // null-typed events are excluded BEFORE the leads in both engines:
      // concat_ws would silently skip a null step (emitting a 2-step
      // path as a 3-step one) while the oracle's || nulls the whole path
      T.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"),
                col("event_id"))
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .where(col("t2").isNotNull && col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("path"))
        .limit(10)
    },

    Q(
      "event_anomaly",
      """WITH c AS (
        |  SELECT event_type, CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, count(*) AS nd, sum(cnt) AS s1, sum(cnt * cnt) AS s2
        |  FROM c GROUP BY 1)
        |SELECT c.event_type, c.day, c.cnt,
        |       CASE WHEN m.nd * m.s2 - m.s1 * m.s1 <= 0 THEN NULL
        |            ELSE round((CAST(c.cnt AS DOUBLE) - CAST(m.s1 AS DOUBLE) / m.nd)
        |              / sqrt(CAST(m.nd AS DOUBLE) * CAST(m.s2 AS DOUBLE) - CAST(m.s1 AS DOUBLE) * CAST(m.s1 AS DOUBLE)) * m.nd, 4)
        |       END AS z
        |FROM c JOIN m ON c.event_type = m.event_type
        |ORDER BY c.event_type, c.day""".stripMargin
    ) { (s, d) =>
      // Daily-volume anomaly score: z-score of each (event_type, day)
      // count against that type's own distribution — the monitoring
      // query behind "did error volume spike today?". The moments are
      // exact BIGINT sums over the ALREADY-COLLAPSED per-day counts
      // (two tiny aggregates after one log shuffle), so the z-scores
      // are partition-order invariant; the per-type moment table is
      // calendar × types sized → size-gated broadcast back onto the
      // daily counts. Algebraic identity: z = (cnt − s1/nd) · nd /
      // √(nd·s2 − s1²) — population std, no per-row second pass. The
      // discriminant nd·s2 − s1² is an EXACT integer, so the
      // zero-variance guard (one observed day, or constant daily
      // counts → z undefined) is a precise <= 0 test, not an epsilon:
      // both engines emit NULL instead of NaN/Inf.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val c = T.events(s, d)
        .groupBy(col("event_type"), day.as("day")).agg(count(lit(1)).as("cnt"))
      val m = c.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nd"), sum(col("cnt")).as("s1"),
             sum(col("cnt") * col("cnt")).as("s2"))
      c.join(Gate.bcast(m), "event_type")
        .select(col("event_type"), col("day"), col("cnt"),
          when(col("nd") * col("s2") - col("s1") * col("s1") <= 0L,
               lit(null).cast("double"))
            .otherwise(
              round((col("cnt").cast("double") - col("s1").cast("double") / col("nd"))
                / sqrt(col("nd").cast("double") * col("s2").cast("double")
                       - col("s1").cast("double") * col("s1").cast("double"))
                * col("nd"), 4)).as("z"))
        .orderBy(col("event_type"), col("day"))
    },

    Q(
      "event_ohlc",
      """WITH o AS (
        |  SELECT event_type, CAST(epoch_ms(ts) // 3600000 AS BIGINT) AS hour,
        |         value, epoch_ms(ts) AS ms, event_id
        |  FROM events),
        |r AS (
        |  SELECT *, row_number() OVER w AS rn,
        |            count(*)     OVER (PARTITION BY event_type, hour) AS cnt
        |  FROM o WINDOW w AS (PARTITION BY event_type, hour ORDER BY ms, event_id))
        |SELECT event_type, hour, count(*) AS n,
        |       min(value) AS low, max(value) AS high,
        |       max(CASE WHEN rn = 1 THEN value END) AS open,
        |       max(CASE WHEN rn = cnt THEN value END) AS close
        |FROM r GROUP BY event_type, hour
        |ORDER BY event_type NULLS FIRST, hour""".stripMargin
    ) { (s, d) =>
      // Time-series downsampling to hourly OHLC bars per event type —
      // the resample primitive for metrics/trading-style logs. open and
      // close are picked by a row_number over ONE in-partition sort
      // (close = last row via the partition count, so no second
      // descending sort), then a hash aggregate on the same
      // (event_type, hour) key reuses the window's exchange: one
      // shuffle total. Values pass through un-transformed (no fp
      // arithmetic) so the oracle hash is exact.
      val hour = floor(unix_millis(col("ts")) / 3600000L).cast("long")
      val p = Window.partitionBy(col("event_type"), col("hour"))
      val w = p.orderBy(col("ms"), col("event_id"))
      T.events(s, d)
        .select(col("event_type"), hour.as("hour"), col("value"),
                unix_millis(col("ts")).as("ms"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(p))
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"),
             min(col("value")).as("low"), max(col("value")).as("high"),
             max(when(col("rn") === 1, col("value"))).as("open"),
             max(when(col("rn") === col("cnt"), col("value"))).as("close"))
        .orderBy(col("event_type"), col("hour"))
    },

    Q(
      "event_ab_test",
      """WITH u AS (
        |  SELECT user_id, user_id % 2 AS variant,
        |         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
        |              THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY user_id),
        |a AS (SELECT
        |  CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
        |  CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_b
        |  FROM u)
        |SELECT n_a, c_a, n_b, c_b,
        |       round((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
        |         / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |                * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |                * (1.0 / n_a + 1.0 / n_b)), 6) AS z
        |FROM a""".stripMargin
    ) { (s, d) =>
      // Two-proportion z-test over the event log — the experimentation
      // readout every serving stack runs (variant = the user-id hash
      // bucket, here % 2; conversion = a per-user behavioral predicate,
      // here ≥15 purchase events so the synthetic log actually splits).
      // ONE shuffle on user_id collapses the log to per-user (variant,
      // conv); the 4 cohort counters then come from a single global
      // conditional aggregate (map-side partials ⇒ the reduce sees
      // #partitions rows) and the z statistic is a 1-row double formula
      // over exact BIGINTs, written as the IDENTICAL expression text on
      // both engines so the IEEE evaluation matches bit-for-bit.
      val u = T.events(s, d)
        .groupBy(col("user_id"))
        .agg((sum(when(col("event_type") === "purchase", 1).otherwise(0)) >= 15)
               .cast("int").as("conv"))
        .withColumn("variant", col("user_id") % 2)
      u.agg(
          sum(when(col("variant") === 0, 1).otherwise(0)).cast("long").as("n_a"),
          sum(when(col("variant") === 0, col("conv")).otherwise(0)).cast("long").as("c_a"),
          sum(when(col("variant") === 1, 1).otherwise(0)).cast("long").as("n_b"),
          sum(when(col("variant") === 1, col("conv")).otherwise(0)).cast("long").as("c_b"))
        .selectExpr("n_a", "c_a", "n_b", "c_b",
          """round((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
            |  / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
            |         * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
            |         * (1.0 / n_a + 1.0 / n_b)), 6) AS z""".stripMargin)
    },

    Q(
      "event_ab_srm",
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
        |c AS (
        |  SELECT event_type,
        |         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM u GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        |       round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |             / CAST(n_a + n_b AS DOUBLE), 6) AS chi2,
        |       CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |       / CAST(n_a + n_b AS DOUBLE) > 3.841 AS srm_detected
        |FROM c
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // Sample-ratio mismatch — event_ab_test's HYGIENE sibling: before
      // reading any z statistic, check that the 50/50 user-id hash split
      // actually delivered 50/50 EXPOSURE per segment; a skewed split
      // means assignment (or logging) is broken and every downstream
      // readout is invalid. Per event-type segment: distinct exposed
      // users per variant, then the 1-dof chi-square against the equal
      // split via the exact algebraic identity (n_a−n_b)²/(n_a+n_b) —
      // integer numerator and denominator, ONE IEEE division, compared
      // unrounded against the standard 3.841 (95th percentile χ²₁)
      // literal so both engines flag the same segments. Plan: one
      // distinct shuffle on (event_type, user_id) — the log's natural
      // key — then a bounded-key conditional aggregate; the chi-square
      // is |segments| rows of arithmetic.
      T.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type"))
        .agg(sum(when(col("user_id") % 2 === 0, 1).otherwise(0)).cast("long").as("n_a"),
             sum(when(col("user_id") % 2 === 1, 1).otherwise(0)).cast("long").as("n_b"))
        .selectExpr("event_type", "n_a", "n_b",
          """round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
            |      / CAST(n_a + n_b AS DOUBLE), 6) AS chi2""".stripMargin,
          """CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
            |/ CAST(n_a + n_b AS DOUBLE) > 3.841 AS srm_detected""".stripMargin)
        .orderBy(col("event_type"))
    },

    Q(
      "event_ab_mwu",
      """WITH u AS (
        |  SELECT user_id, user_id % 2 AS variant,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS m
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT m,
        |         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM u GROUP BY m),
        |r AS (
        |  SELECT m, ca, c,
        |         CAST(coalesce(sum(c) OVER (ORDER BY m
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below
        |  FROM g),
        |s AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |         CAST(sum(c - ca) AS BIGINT) AS n_b,
        |         CAST(sum(ca * (2 * below + c + 1)) AS BIGINT) AS r2_a,
        |         CAST(sum(c * c * c - c) AS BIGINT) AS tie_term
        |  FROM r)
        |SELECT n_a, n_b,
        |       CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a, tie_term,
        |       CASE WHEN n_a > 0 AND n_b > 0
        |              AND (n_a + n_b + CAST(1 AS DOUBLE)) - CAST(tie_term AS DOUBLE)
        |                  / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)) > 0
        |            THEN round((CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2
        |                        - CAST(n_a AS DOUBLE) * n_b / 2)
        |              / sqrt(CAST(n_a AS DOUBLE) * n_b / 12 * ((n_a + n_b + CAST(1 AS DOUBLE))
        |                 - CAST(tie_term AS DOUBLE)
        |                   / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))), 6)
        |            ELSE NULL END AS z
        |FROM s""".stripMargin
    ) { (s, d) =>
      // Mann-Whitney U — event_ab_test's NONPARAMETRIC sibling (Mann &
      // Whitney 1947): compares the full per-user metric DISTRIBUTIONS
      // across variants instead of a conversion proportion, so a heavy
      // tail can't hide behind an unchanged mean. Metric = per-user
      // purchase count (discrete and domain-bounded, which keeps every
      // stage exact and the rank table k-bounded). Exact-integer rank
      // algebra: for a tie group of size c with `below` users ranked
      // beneath it, DOUBLED average rank = 2·below + c + 1 (always an
      // integer), so R2_a = Σ ca·(2·below+c+1) and u2_a = 2·U_a =
      // R2_a − n_a(n_a+1) are pure BIGINT in both engines; only the
      // final z (normal approximation with the standard tie-corrected
      // variance) is IEEE, spliced as identical text, NULL-guarded for
      // the degenerate all-tied case (the event_trend_mk discipline).
      // Plan: one shuffle to per-user counts, one bounded-domain
      // group-by (≤ max purchases/user rows), and the cumulative window
      // runs over that BOUNDED table (the k-bounded window exception —
      // an unbounded metric would ride the partial-offset rank device
      // instead, as text_quality_buckets does).
      val u = T.events(s, d)
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1).otherwise(0))
               .cast("long").as("m"))
        .withColumn("variant", col("user_id") % 2)
      val g = u.groupBy(col("m"))
        .agg(sum(when(col("variant") === 0, 1).otherwise(0)).cast("long").as("ca"),
             count(lit(1)).cast("long").as("c"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("m"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      g.withColumn("below", coalesce(sum(col("c")).over(w), lit(0L)))
        .agg(sum(col("ca")).cast("long").as("n_a"),
             sum(col("c") - col("ca")).cast("long").as("n_b"),
             sum(col("ca") * (col("below") * 2 + col("c") + 1)).cast("long").as("r2_a"),
             sum(col("c") * col("c") * col("c") - col("c")).cast("long").as("tie_term"))
        .selectExpr("n_a", "n_b",
          "CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a", "tie_term",
          // All-DOUBLE splice (r19, ADVICE): bare decimal literals like
          // 12.0 parse as DECIMAL in Spark and the division rounds at
          // scale 6 before the double promotion, while DuckDB divides in
          // DOUBLE — so every operand is CAST to DOUBLE and the literals
          // are integers, making the text identical in both engines AND
          // the arithmetic pure IEEE in both.
          """CASE WHEN n_a > 0 AND n_b > 0
            |       AND (n_a + n_b + CAST(1 AS DOUBLE)) - CAST(tie_term AS DOUBLE)
            |           / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)) > 0
            |     THEN round((CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2
            |                 - CAST(n_a AS DOUBLE) * n_b / 2)
            |       / sqrt(CAST(n_a AS DOUBLE) * n_b / 12 * ((n_a + n_b + CAST(1 AS DOUBLE))
            |          - CAST(tie_term AS DOUBLE)
            |            / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))), 6)
            |     ELSE NULL END AS z""".stripMargin)
    },

    Q(
      "event_streaks",
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |         CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day
        |  FROM events),
        |g AS (
        |  SELECT user_id, day,
        |         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM days),
        |st AS (
        |  SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp)
        |SELECT user_id,
        |       CAST(max(len) AS BIGINT) AS max_streak,
        |       count(*) AS n_streaks,
        |       CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM st GROUP BY user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      // Gaps-and-islands: per-user longest consecutive-active-day streak
      // — the engagement metric cohort dashboards sit on, and the
      // canonical island-detection window idiom (day − row_number is
      // constant exactly inside a gap-free run, so one in-partition
      // window + two hash aggregates find every island; no self-join,
      // no recursion). ONE shuffle on user_id serves the distinct, the
      // window, and both aggregates (same key ⇒ Catalyst reuses the
      // exchange); the window partition is ≤ calendar-days rows per
      // user, never fact-sized. Day indices are exact epoch-ms integer
      // floors and every output is an exact integer — nothing to drift
      // cross-engine.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      T.events(s, d)
        .select(col("user_id"), day.as("day")).distinct()
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("max_streak"),
             count(lit(1)).as("n_streaks"),
             sum(col("len")).cast("long").as("n_active_days"))
        .orderBy(col("user_id"))
    },

    Q(
      "event_interarrival",
      """WITH g AS (
        |  SELECT user_id,
        |         epoch_ms(ts) - lag(epoch_ms(ts))
        |           OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap
        |  FROM events)
        |SELECT user_id, count(gap) AS n_gaps,
        |       min(gap) AS min_gap, max(gap) AS max_gap,
        |       CAST(sum(gap) AS BIGINT) AS total_span,
        |       round(quantile_cont(gap, 0.5), 4) AS median_gap
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      // Inter-arrival-time profile per user — the cadence statistic
      // behind churn scoring and bot detection (a human's gaps are
      // heavy-tailed, a scraper's are flat). One lag over the user
      // window produces exact integer epoch-ms gaps; min/max/sum stay
      // integer, and the median interpolates two exact integers the
      // same way in both engines (the agg_percentile-proven
      // percentile ≡ quantile_cont recipe). The aggregate reuses the
      // window's user_id exchange — one shuffle total.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      T.events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
        .withColumn("gap", col("ms") - lag(col("ms"), 1).over(w))
        .where(col("gap").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(col("gap")).as("n_gaps"),
             min(col("gap")).as("min_gap"), max(col("gap")).as("max_gap"),
             sum(col("gap")).cast("long").as("total_span"),
             round(expr("percentile(gap, 0.5)"), 4).as("median_gap"))
        .orderBy(col("user_id"))
    },

    Q(
      "event_bot_detect",
      """WITH g AS (
        |  SELECT user_id,
        |         (epoch_ms(ts) - lag(epoch_ms(ts))
        |            OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)) // 60000 AS gm
        |  FROM events),
        |a AS (
        |  SELECT user_id, gm,
        |         CAST(sum(gm) OVER (PARTITION BY user_id) AS BIGINT) AS sg,
        |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
        |  FROM g WHERE gm IS NOT NULL),
        |b AS (SELECT user_id, gm, n, sg // n AS mean FROM a),
        |f AS (SELECT user_id, CAST(max(n) AS BIGINT) AS n_gaps,
        |             CAST(max(mean) AS BIGINT) AS mean_gap_min,
        |             CAST(sum((gm - mean) * (gm - mean)) AS BIGINT) AS dev2
        |      FROM b GROUP BY user_id)
        |SELECT user_id, n_gaps, mean_gap_min, dev2,
        |       (n_gaps >= 20 AND mean_gap_min > 0
        |        AND 100 * dev2 <= 9 * n_gaps * mean_gap_min * mean_gap_min) AS is_bot
        |FROM f ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      // Gap-regularity bot flag — the decision rule on top of
      // event_interarrival's profile (humans are heavy-tailed, scrapers
      // metronomic): flag users with ≥ 20 gaps whose coefficient of
      // variation is ≤ 0.3. The whole test is EXACT INTEGER by
      // construction: gaps floor to minutes (non-negative, so DIV ≡ //),
      // the mean is the truncated integer mean (identical truncation
      // both engines — documented variance coarsening, not a float),
      // and CV² ≤ 0.09 becomes 100·Σd² ≤ 9·n·mean² — cross-multiplied
      // integers, no division, no rounding boundary to flip. Magnitudes
      // stay far inside BIGINT at minute resolution (Σd² ≤ n·span²
      // ≈ 1e14 at a 60-day fixture; ms resolution would not — that is
      // WHY the minutes floor exists). Scale shape: one user_id
      // exchange feeds the lag window, the per-user stat windows, and
      // the final aggregate — one shuffle total.
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      val wAll = Window.partitionBy(col("user_id"))
      T.events(s, d)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
        .withColumn("gap", col("ms") - lag(col("ms"), 1).over(wOrd))
        .where(col("gap").isNotNull)
        .withColumn("gm", expr("gap DIV 60000"))
        .withColumn("sg", sum(col("gm")).over(wAll))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("mean", expr("sg DIV n"))
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n_gaps"),
             max(col("mean")).as("mean_gap_min"),
             sum((col("gm") - col("mean")) * (col("gm") - col("mean")))
               .cast("long").as("dev2"))
        .withColumn("is_bot",
          col("n_gaps") >= 20 && col("mean_gap_min") > 0 &&
            lit(100L) * col("dev2") <= lit(9L) * col("n_gaps")
              * col("mean_gap_min") * col("mean_gap_min"))
        .orderBy(col("user_id"))
    },

    Q(
      "event_seasonality",
      """WITH e AS (
        |  SELECT event_type,
        |         CAST((CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) + 4) % 7 AS BIGINT) AS dow
        |  FROM events),
        |c AS (SELECT event_type, dow, count(*) AS n FROM e GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY 1)
        |SELECT c.event_type, c.dow, c.n,
        |       round(CAST(c.n AS DOUBLE) / t.total, 6) AS share
        |FROM c JOIN t ON c.event_type = t.event_type
        |ORDER BY c.event_type, c.dow""".stripMargin
    ) { (s, d) =>
      // Day-of-week seasonality profile per event type — the weekly-
      // rhythm readout capacity planning and anomaly baselining sit on.
      // The dow bucket is deliberately ENGINE-NEUTRAL arithmetic:
      // (epoch_days + 4) % 7 with 0 = Sunday (1970-01-01 was a
      // Thursday) — Spark's dayofweek is 1-based-Sunday and DuckDB's is
      // 0-based-Sunday, the documented cross-engine trap the integer
      // formula sidesteps entirely. One shuffle on the bounded
      // (type, dow) key; per-type totals aggregate THAT 7-row-per-type
      // table and broadcast back; shares divide two exact integers in
      // IEEE once.
      val dow = ((floor(unix_millis(col("ts")) / 86400000L).cast("long") + 4) % 7)
      val c = T.events(s, d)
        .select(col("event_type"), dow.as("dow"))
        .groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("n"))
      val t = c.groupBy(col("event_type")).agg(sum(col("n")).cast("long").as("total"))
      c.join(Gate.bcast(t), "event_type")
        .select(col("event_type"), col("dow"), col("n"),
                round(col("n").cast("double") / col("total"), 6).as("share"))
        .orderBy(col("event_type"), col("dow"))
    },

    Q(
      "event_audience_overlap",
      """WITH a AS (
        |  SELECT event_type, user_id FROM events
        |  GROUP BY event_type, user_id HAVING count(*) >= 14),
        |s AS (SELECT event_type, count(*) AS n FROM a GROUP BY 1),
        |i AS (SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS n_both
        |      FROM a x JOIN a y ON x.user_id = y.user_id AND x.event_type < y.event_type
        |      GROUP BY 1, 2)
        |SELECT i.ta, i.tb, sa.n AS n_a, sb.n AS n_b, i.n_both,
        |       round(CAST(i.n_both AS DOUBLE) / (sa.n + sb.n - i.n_both), 6) AS jaccard
        |FROM i JOIN s sa ON i.ta = sa.event_type JOIN s sb ON i.tb = sb.event_type
        |ORDER BY i.ta, i.tb""".stripMargin
    ) { (s, d) =>
      // Audience-overlap matrix: exact Jaccard between the CORE
      // audiences of every event-type pair (membership = ≥14 events of
      // the type, so the fixture's everyone-does-everything log still
      // discriminates) — the segmentation readout behind cross-sell and
      // cannibalization questions. One user_id-keyed aggregate collapses
      // the log to memberships; the pair join is user-keyed with the
      // type inequality only ordering the pair (each unordered pair
      // counted once), so its cost is Σ per-user |types|² with |types|
      // bounded — never users². Audience sizes are a |types|-row table
      // joined back broadcast; Jaccard divides exact integers once.
      val a = Caches.register(T.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt")).where(col("cnt") >= 14)
        .select(col("event_type"), col("user_id")).persist())
      val sizes = a.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val pairs = a.select(col("event_type").as("ta"), col("user_id"))
        .join(a.select(col("event_type").as("tb"), col("user_id")), "user_id")
        .where(col("ta") < col("tb"))
        .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_both"))
      pairs
        .join(Gate.bcast(sizes.select(col("event_type").as("ta"), col("n").as("n_a"))), "ta")
        .join(Gate.bcast(sizes.select(col("event_type").as("tb"), col("n").as("n_b"))), "tb")
        .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("n_both"),
                round(col("n_both").cast("double")
                      / (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"))
        .orderBy(col("ta"), col("tb"))
    },

    Q(
      "event_growth_accounting",
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day
        |  FROM events),
        |l AS (SELECT user_id, day,
        |             lag(day)  OVER (PARTITION BY user_id ORDER BY day) AS prev,
        |             lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
        |      FROM ud),
        |g AS (SELECT day,
        |             count(*) FILTER (WHERE prev IS NULL)    AS new_users,
        |             count(*) FILTER (WHERE prev = day - 1)  AS retained,
        |             count(*) FILTER (WHERE prev < day - 1)  AS resurrected
        |      FROM l GROUP BY day),
        |c AS (SELECT churn_day AS day, count(*) AS churned
        |      FROM (SELECT day + 1 AS churn_day, nxt FROM l) x
        |      WHERE nxt IS NULL OR nxt > churn_day GROUP BY churn_day)
        |SELECT coalesce(g.day, c.day) AS day,
        |       coalesce(g.new_users, 0)   AS new_users,
        |       coalesce(g.retained, 0)    AS retained,
        |       coalesce(g.resurrected, 0) AS resurrected,
        |       coalesce(c.churned, 0)     AS churned
        |FROM g FULL OUTER JOIN c ON g.day = c.day
        |ORDER BY day""".stripMargin
    ) { (s, d) =>
      // Growth accounting (the new/retained/resurrected/churned daily
      // ledger every growth team reads): day granularity, so
      // retained = active yesterday too, resurrected = seen before but
      // not yesterday, churned on d = active on d-1 with no activity on
      // d (a user's last-ever day churns them the day after — the
      // right-censored tail is reported, not hidden). Scale shape: the
      // fact log collapses to DISTINCT user-days first (one user_id
      // exchange); lag AND lead ride ONE window over that collapsed
      // table; then each user-day EMITS its contributions — the
      // classification row plus, when the next activity isn't tomorrow,
      // a (day+1, churned) row — through a generator, so ONE bounded
      // day-keyed conditional aggregate finishes the whole ledger. The
      // oracle spells the same ledger as two aggregates full-outer-
      // joined; emitting contributions instead avoids planning the
      // window subtree twice (one scan, one WindowExec — PlanSpec pins
      // it). All outputs are exact integer counts — nothing to drift
      // cross-engine.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val ud = T.events(s, d).select(col("user_id"), day.as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val l = ud.withColumn("prev", lag(col("day"), 1).over(w))
                .withColumn("nxt", lead(col("day"), 1).over(w))
      val cls = when(col("prev").isNull, lit("new"))
        .when(col("prev") === col("day") - 1, lit("retained"))
        .otherwise(lit("resurrected"))
      val churn = when(col("nxt").isNull || col("nxt") > col("day") + 1,
        struct((col("day") + 1).as("day"), lit("churned").as("kind")))
      l.select(explode(array_compact(array(
          struct(col("day"), cls.as("kind")), churn))).as("c"))
        .select(col("c.day").as("day"), col("c.kind").as("kind"))
        .groupBy(col("day")).agg(
          sum(when(col("kind") === "new", 1L).otherwise(0L)).as("new_users"),
          sum(when(col("kind") === "retained", 1L).otherwise(0L)).as("retained"),
          sum(when(col("kind") === "resurrected", 1L).otherwise(0L)).as("resurrected"),
          sum(when(col("kind") === "churned", 1L).otherwise(0L)).as("churned"))
        .orderBy(col("day"))
    },

    Q(
      "event_cohort_ltv",
      """WITH f AS (
        |  SELECT user_id,
        |         CAST(floor(min(epoch_ms(ts)) / 86400000) AS BIGINT) AS cohort_day
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |sz AS (SELECT cohort_day, count(*) AS n_users FROM f GROUP BY 1),
        |r AS (
        |  SELECT f.cohort_day,
        |         CAST(floor(epoch_ms(e.ts) / 86400000) AS BIGINT) - f.cohort_day AS day_offset,
        |         sum(CAST(e.value AS DECIMAL(18,2))) AS rev
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND CAST(floor(epoch_ms(e.ts) / 86400000) AS BIGINT) >= f.cohort_day
        |  GROUP BY 1, 2),
        |c AS (
        |  SELECT cohort_day, day_offset, rev,
        |         sum(rev) OVER (PARTITION BY cohort_day ORDER BY day_offset) AS cum_rev
        |  FROM r)
        |SELECT c.cohort_day, c.day_offset,
        |       round(CAST(c.rev AS DOUBLE), 2) AS revenue,
        |       round(CAST(c.cum_rev AS DOUBLE), 2) AS cum_revenue,
        |       round(CAST(c.cum_rev AS DOUBLE) / sz.n_users, 4) AS ltv_per_user
        |FROM c JOIN sz ON c.cohort_day = sz.cohort_day
        |ORDER BY c.cohort_day, c.day_offset""".stripMargin
    ) { (s, d) =>
      // Cohort LTV curve: cumulative purchase revenue per signup cohort
      // over day offsets, per-user — the payback readout acquisition
      // spend is judged against (event_retention says WHO comes back;
      // this says what they're WORTH). Money rides the exact-decimal
      // recipe (values are 2-dp, so sums and the cumulative window are
      // exact; scale == rounding target, so cast-then-round is safe —
      // contrast the Q9 scale-4 case). Scale shape: the per-user cohort
      // table broadcasts back onto the purchase scan (the
      // event_retention pattern); the cumulative window partitions by
      // cohort_day over the O(days²) collapsed (cohort, offset) table —
      // never facts, never unpartitioned; cohort sizes re-join as a
      // second bounded broadcast; one IEEE division per row at output.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val ev = T.events(s, d)
        .select(col("user_id"), col("event_type"), day.as("day"), col("value"))
      val f = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val sz = f.groupBy(col("cohort_day")).agg(count(lit(1)).as("n_users"))
      val r = ev.where(col("event_type") === "purchase")
        .join(Gate.bcast(f), "user_id")
        .where(col("day") >= col("cohort_day"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
      val w = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      r.withColumn("cum_rev", sum(col("rev")).over(w))
        .join(Gate.bcast(sz), "cohort_day")
        .select(col("cohort_day"), col("day_offset"),
                round(col("rev").cast("double"), 2).as("revenue"),
                round(col("cum_rev").cast("double"), 2).as("cum_revenue"),
                round(col("cum_rev").cast("double") / col("n_users"), 4).as("ltv_per_user"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },

    Q(
      "event_revenue_concentration",
      """WITH u AS (
        |  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS rev
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |t AS (SELECT quantile_cont(CAST(rev AS DOUBLE), 0.9) AS p90 FROM u)
        |SELECT count(*) AS n_users,
        |       count(*) FILTER (WHERE CAST(rev AS DOUBLE) >= t.p90) AS n_top,
        |       round(CAST(sum(rev) FILTER (WHERE CAST(rev AS DOUBLE) >= t.p90)
        |                  AS DOUBLE)
        |             / CAST(sum(rev) AS DOUBLE), 6) AS top_share,
        |       round(t.p90, 4) AS p90_revenue
        |FROM u CROSS JOIN t
        |GROUP BY t.p90""".stripMargin
    ) { (s, d) =>
      // Revenue concentration: what share of purchase revenue comes from
      // the top decile of spenders — the Pareto readout behind "how
      // fragile is this revenue base?". Two-pass like the robust stats:
      // per-user revenue collapses the log (one user_id exchange, exact
      // 2-dp decimal sums), the p90 threshold — ONE number — broadcasts
      // back, and a single conditional aggregate splits the total.
      // Determinism: the threshold interpolates the same doubles in both
      // engines (percentile ≡ quantile_cont, with the decimal→double
      // cast value-exact for 2-dp sums in range), membership compares
      // identically-computed doubles, and both revenue sums stay exact
      // decimal until the final division.
      val u = T.events(s, d).where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("rev"))
      val t = u.agg(expr("percentile(cast(rev as double), 0.9)").as("p90"))
      val top = col("rev").cast("double") >= col("p90")
      u.crossJoin(broadcast(t))
        .groupBy(col("p90"))
        .agg(count(lit(1)).as("n_users"),
             sum(when(top, 1L).otherwise(0L)).as("n_top"),
             round(sum(when(top, col("rev"))).cast("double")
                   / sum(col("rev")).cast("double"), 6).as("top_share"))
        .select(col("n_users"), col("n_top"), col("top_share"),
                round(col("p90"), 4).as("p90_revenue"))
    },

    Q(
      "event_stickiness",
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day
        |  FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |m AS (
        |  SELECT ud.day + g.g AS day, count(DISTINCT user_id) AS mau
        |  FROM ud CROSS JOIN generate_series(0, 29) g(g)
        |  GROUP BY 1)
        |SELECT dau.day, dau.dau, m.mau,
        |       round(dau.dau * 1.0 / m.mau, 6) AS stickiness
        |FROM dau JOIN m ON dau.day = m.day
        |ORDER BY dau.day""".stripMargin
    ) { (s, d) =>
      // DAU/MAU stickiness per day (MAU = distinct users over the
      // trailing 30 calendar days) — the engagement ratio product
      // reviews lead with. The event_dau_rolling pattern at the 30-day
      // horizon: the log collapses to DISTINCT user-days FIRST (the big
      // reduction at 100 TB), each pair fans out via a generator to the
      // ≤30 report days it witnesses, and one distinct-count per report
      // day finishes MAU — never a 30× per-day self-join, never a
      // window over facts. DAU re-aggregates the same collapsed table.
      // Integer counts, one IEEE division per day at output.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val ud = Caches.register(T.events(s, d)
        .select(col("user_id"), day.as("day")).distinct().persist())
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val mau = ud
        .select(col("user_id"), explode(sequence(lit(0L), lit(29L))).as("g"),
                col("day"))
        .groupBy((col("day") + col("g")).as("day"))
        .agg(countDistinct(col("user_id")).as("mau"))
      dau.join(mau, "day")
        .select(col("day"), col("dau"), col("mau"),
                round(col("dau") * 1.0 / col("mau"), 6).as("stickiness"))
        .orderBy(col("day"))
    },

    Q(
      "event_anomaly_robust",
      """WITH c AS (
        |  SELECT event_type,
        |         CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, quantile_cont(n, 0.5) AS med FROM c GROUP BY 1),
        |m AS (SELECT c.event_type, s.med,
        |             quantile_cont(abs(c.n - s.med), 0.5) AS mad
        |      FROM c JOIN s ON c.event_type = s.event_type
        |      GROUP BY c.event_type, s.med)
        |SELECT c.event_type, c.day, c.n,
        |       round(m.med, 4) AS med, round(m.mad, 4) AS mad,
        |       (abs(c.n - m.med) > 3 * m.mad) AS is_outlier
        |FROM c JOIN m ON c.event_type = m.event_type
        |ORDER BY c.event_type, c.day""".stripMargin
    ) { (s, d) =>
      // Robust daily-volume anomaly flag: |n − median| > 3·MAD per event
      // type — the detector `event_anomaly`'s mean/σ z-score is not
      // (one fat spike inflates σ and then MASKS every smaller anomaly
      // in the same window; median and MAD hold still, so the spike is
      // flagged AND the rest of the month keeps its baseline). agg_mad's
      // recipe applied to the collapsed daily counts: both percentile
      // passes and the deviation are over the days×types table — never
      // facts; the |types|-row median table broadcasts back twice; the
      // flag compares doubles computed by identical IEEE expressions on
      // both engines, so no boundary day can flip.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val c = Caches.register(T.events(s, d)
        .select(col("event_type"), day.as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
        .persist())
      val med = c.groupBy(col("event_type"))
        .agg(expr("percentile(n, 0.5)").as("med"))
      val m = c.join(Gate.bcast(med), "event_type")
        .groupBy(col("event_type"), col("med"))
        .agg(expr("percentile(abs(n - med), 0.5)").as("mad"))
      c.join(Gate.bcast(m), "event_type")
        .select(col("event_type"), col("day"), col("n"),
                round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
                (abs(col("n") - col("med")) > lit(3) * col("mad")).as("is_outlier"))
        .orderBy(col("event_type"), col("day"))
    },

    Q(
      "event_retention_fit",
      s"""WITH f AS (
         |  SELECT user_id, CAST(floor(min(epoch_ms(ts)) / 86400000) AS BIGINT) AS cohort_day
         |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM f),
         |a AS (
         |  SELECT CAST(floor(epoch_ms(e.ts) / 86400000) AS BIGINT) - f.cohort_day AS o,
         |         CAST(count(DISTINCT e.user_id) AS BIGINT) AS act
         |  FROM events e JOIN f USING (user_id)
         |  WHERE e.event_type = 'purchase'
         |    AND CAST(floor(epoch_ms(e.ts) / 86400000) AS BIGINT) >= f.cohort_day
         |  GROUP BY 1),
         |p AS (
         |  SELECT o, CAST(round(${TrainingOps.lnProbTpl("(CAST(act AS DOUBLE) / CAST(nu AS DOUBLE))")} * 1000.0) AS BIGINT) AS l
         |  FROM a, nn WHERE o >= 1 AND act > 0),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(o) AS BIGINT) AS st,
         |             CAST(sum(l) AS BIGINT) AS sl, CAST(sum(o * l) AS BIGINT) AS stl,
         |             CAST(sum(o * o) AS BIGINT) AS stt FROM p)
         |SELECT n AS n_points, ${EventOps.retentionFitSelect}
         |FROM m""".stripMargin
    ) { (s, d) =>
      // Exponential retention-decay fit — the survival-curve summary a
      // growth team reads off event_retention's cohort table: pooled
      // retention r(o) = distinct day-o purchasers / signup population
      // is linearized as ln r = ln a − λ·o and fitted by OLS, giving
      // the decay rate and its implied half-life. Determinism is the
      // full stack of established devices: exact epoch-day cohorts,
      // each ln r through the SHARED template rounded to integer
      // millinats BEFORE any sum, OLS moments as exact BIGINT
      // combinations, and the slope/intercept/half-life formulas
      // spliced as identical text (cupedSelect's device). Scale: the
      // cohort table broadcasts onto the log once; the fit runs over
      // the ≤|days| point table.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val ev = T.events(s, d)
        .select(col("user_id"), col("event_type"), day.as("day"))
      val f = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val nu = f.agg(count(lit(1)).cast("long").as("nu"))
      val a = ev.where(col("event_type") === "purchase")
        .join(Gate.bcast(f), "user_id")
        .where(col("day") >= col("cohort_day"))
        .groupBy((col("day") - col("cohort_day")).as("o"))
        .agg(countDistinct(col("user_id")).cast("long").as("act"))
      a.crossJoin(broadcast(nu))
        .where(col("o") >= 1 && col("act") > 0)
        .withColumn("l", expr(
          s"CAST(round(${TrainingOps.lnProbTpl("(CAST(act AS DOUBLE) / CAST(nu AS DOUBLE))")} * 1000.0) AS BIGINT)"))
        .agg(count(lit(1)).cast("long").as("n"),
             sum(col("o")).cast("long").as("st"),
             sum(col("l")).cast("long").as("sl"),
             sum(col("o") * col("l")).cast("long").as("stl"),
             sum(col("o") * col("o")).cast("long").as("stt"))
        .selectExpr(Seq("n AS n_points") ++ EventOps.retentionFitSelect.split(",\n").toSeq: _*)
    },

    Q(
      "event_ab_cuped",
      s"""WITH b AS (SELECT min(epoch_ms(ts)) AS lo, max(epoch_ms(ts)) AS hi FROM events),
         |u AS (
         |  SELECT user_id, user_id % 2 AS variant,
         |         CAST(sum(CASE WHEN epoch_ms(ts) * 2 < b.lo + b.hi THEN 1 ELSE 0 END) AS BIGINT) AS x,
         |         CAST(sum(CASE WHEN epoch_ms(ts) * 2 >= b.lo + b.hi THEN 1 ELSE 0 END) AS BIGINT) AS y
         |  FROM events, b GROUP BY user_id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
         |             CAST(sum(x * x) AS BIGINT) AS sxx FROM u),
         |a AS (SELECT
         |  CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |  CAST(sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
         |  CAST(sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         |  CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |  CAST(sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b,
         |  CAST(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b
         |  FROM u)
         |SELECT n_a, n_b, ${EventOps.cupedSelect}
         |FROM a, m""".stripMargin
    ) { (s, d) =>
      // CUPED variance reduction (Deng et al., "Improving the
      // Sensitivity of Online Controlled Experiments") — the modern
      // experimentation readout on top of event_ab_test's z-test: the
      // PRE-period activity x (first half of the time range, the exact
      // integer-midpoint split data_drift_psi uses) is a covariate the
      // randomization guarantees is treatment-independent, so adjusting
      // the post-period metric y by θ·(x − x̄), θ = cov(x,y)/var(x),
      // shrinks variance without biasing the lift. Exactness: θ's
      // numerator and denominator are EXACT BIGINT moment combinations
      // (n·Σxy − Σx·Σy over n·Σx² − (Σx)²) — one IEEE division; the
      // adjusted-lift formula is a 1-row expression spliced as
      // IDENTICAL text on both engines (event_ab_test's device). Scale:
      // one user_id shuffle collapses the log; everything after is two
      // global conditional aggregates (map-side partials) and a 1-row
      // join; at raw-web user counts the moment sums would widen to
      // DECIMAL(38) under the same formula.
      val ev = T.events(s, d).select(col("user_id"), unix_millis(col("ts")).as("ms"))
      val bounds = ev.agg(min(col("ms")).as("lo"), max(col("ms")).as("hi"))
      val u = ev.crossJoin(broadcast(bounds))
        .groupBy(col("user_id"))
        .agg(sum(when(col("ms") * 2 < col("lo") + col("hi"), 1).otherwise(0))
               .cast("long").as("x"),
             sum(when(col("ms") * 2 >= col("lo") + col("hi"), 1).otherwise(0))
               .cast("long").as("y"))
        .withColumn("variant", col("user_id") % 2)
      // pooled moments and per-arm cohort sums in ONE aggregate pass —
      // two separate aggregates would each re-shuffle the event fact
      // (or pay a cache that costs more than it saves at any scale:
      // everything here is algebraic, so one partial+final pass carries
      // all eleven counters; PlanSpec pins the single exchange)
      u.agg(
          count(lit(1)).cast("long").as("n"),
          sum(col("x")).cast("long").as("sx"),
          sum(col("y")).cast("long").as("sy"),
          sum(col("x") * col("y")).cast("long").as("sxy"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(when(col("variant") === 0, 1).otherwise(0)).cast("long").as("n_a"),
          sum(when(col("variant") === 0, col("x")).otherwise(0)).cast("long").as("sx_a"),
          sum(when(col("variant") === 0, col("y")).otherwise(0)).cast("long").as("sy_a"),
          sum(when(col("variant") === 1, 1).otherwise(0)).cast("long").as("n_b"),
          sum(when(col("variant") === 1, col("x")).otherwise(0)).cast("long").as("sx_b"),
          sum(when(col("variant") === 1, col("y")).otherwise(0)).cast("long").as("sy_b"))
        .selectExpr(Seq("n_a", "n_b") ++ EventOps.cupedSelect.split(",\n").toSeq: _*)
    },

    Q(
      "event_seasonal_anomaly",
      """WITH c AS (
        |  SELECT event_type,
        |         CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, day, n, CAST((day + 4) % 7 AS BIGINT) AS dow FROM c),
        |s AS (SELECT event_type, dow, quantile_cont(n, 0.5) AS med FROM d GROUP BY 1, 2),
        |m AS (SELECT d.event_type, d.dow, s.med,
        |             quantile_cont(abs(d.n - s.med), 0.5) AS mad
        |      FROM d JOIN s ON d.event_type = s.event_type AND d.dow = s.dow
        |      GROUP BY 1, 2, 3)
        |SELECT d.event_type, d.day, d.dow, d.n,
        |       round(m.med, 4) AS med, round(m.mad, 4) AS mad,
        |       (abs(d.n - m.med) > 3 * m.mad) AS is_outlier
        |FROM d JOIN m ON d.event_type = m.event_type AND d.dow = m.dow
        |ORDER BY d.event_type, d.day""".stripMargin
    ) { (s, d) =>
      // SEASONAL robust anomaly flag — the same-day-of-week baseline the
      // flat detectors miss in both directions: against a global median,
      // every ordinary Saturday looks anomalous on a weekday-heavy
      // corpus AND a quiet-weekend incident hides inside the weekday
      // spread. Baseline per (type, dow): median and MAD of THAT dow's
      // daily counts (event_anomaly_robust's recipe, keyed one level
      // finer); the dow bucket is event_seasonality's engine-neutral
      // (epoch_days + 4) % 7 integer formula. All medians interpolate
      // exact integers (halves are exact dyadics), the flag compares
      // identical IEEE expressions — no boundary day can flip. Scale:
      // both percentile passes run over the days×types table, never
      // facts; the (type, dow) baseline broadcasts back.
      val day = floor(unix_millis(col("ts")) / 86400000L).cast("long")
      val c = Caches.register(T.events(s, d)
        .select(col("event_type"), day.as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
        .withColumn("dow", (col("day") + 4) % 7)
        .persist())
      val med = c.groupBy(col("event_type"), col("dow"))
        .agg(expr("percentile(n, 0.5)").as("med"))
      val m = c.join(Gate.bcast(med), Seq("event_type", "dow"))
        .groupBy(col("event_type"), col("dow"), col("med"))
        .agg(expr("percentile(abs(n - med), 0.5)").as("mad"))
      c.join(Gate.bcast(m), Seq("event_type", "dow"))
        .select(col("event_type"), col("day"), col("dow"), col("n"),
                round(col("med"), 4).as("med"), round(col("mad"), 4).as("mad"),
                (abs(col("n") - col("med")) > lit(3) * col("mad")).as("is_outlier"))
        .orderBy(col("event_type"), col("day"))
    },

    Q(
      "event_conversion_window",
      """WITH v AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |         CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day
        |  FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, epoch_ms(ts) AS ms FROM events
        |      WHERE event_type = 'purchase'),
        |conv AS (SELECT DISTINCT v.event_id FROM v JOIN p
        |         ON v.user_id = p.user_id
        |        AND p.ms >= v.ms AND p.ms < v.ms + 86400000)
        |SELECT v.day, count(*) AS n_views,
        |       count(c.event_id) AS n_converted,
        |       round(count(c.event_id) * 1.0 / count(*), 6) AS conversion_rate
        |FROM v LEFT JOIN conv c ON v.event_id = c.event_id
        |GROUP BY v.day
        |ORDER BY v.day""".stripMargin
    ) { (s, d) =>
      // Windowed conversion rate: the share of views followed by a
      // purchase from the same user within 24 hours, reported per view
      // day — the funnel readout with a DEADLINE (event_funnel's hop
      // windows chain stages; this one answers the single-step "did it
      // convert in time?" that campaign dashboards plot). Scale shape:
      // the view↔purchase join is USER-KEYED with the 24 h bound as a
      // join residual — per-user work is |views|·|purchases| within the
      // user, never a global range join; DISTINCT collapses multi-
      // purchase credit so a view converts at most once; the converted
      // id set joins back user-partitioned, and the final aggregate
      // groups the bounded day key. Integer ms comparisons, integer
      // counts, one IEEE division per day at output.
      val ev = T.events(s, d)
      val v = ev.where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"),
                floor(unix_millis(col("ts")) / 86400000L).cast("long").as("day"))
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), unix_millis(col("ts")).as("pms"))
      val conv = v.join(p, v("user_id") === p("user_id") &&
                           col("pms") >= col("ms") && col("pms") < col("ms") + 86400000L)
        .select(v("event_id")).distinct()
        .withColumn("converted", lit(1L))
      v.join(conv, Seq("event_id"), "left_outer")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_views"),
             sum(coalesce(col("converted"), lit(0L))).as("n_converted"))
        .select(col("day"), col("n_views"), col("n_converted"),
                round(col("n_converted") * 1.0 / col("n_views"), 6).as("conversion_rate"))
        .orderBy(col("day"))
    },

    Q(
      "event_cusum",
      """WITH d AS (
        |  SELECT CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(n) AS BIGINT) AS tot FROM d),
        |x AS (
        |  SELECT day, n,
        |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
        |         CAST(sum(n) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pre
        |  FROM d),
        |c AS (SELECT day, n, nd * pre - i * tot AS cusum_scaled FROM x, t),
        |m AS (SELECT max(abs(cusum_scaled)) AS mx FROM c)
        |SELECT day, n, cusum_scaled,
        |       CAST(CASE WHEN abs(cusum_scaled) = mx THEN 1 ELSE 0 END AS BIGINT) AS is_change_point
        |FROM c, m
        |ORDER BY day""".stripMargin
    ) { (s, d) =>
      // CUSUM change-point detection over the daily event volume — the
      // classic "did the level shift, and when?" monitor (Page's
      // cumulative-sum statistic; the argmax of |CUSUM| is the standard
      // single-change-point estimate). The statistic is kept EXACT by
      // clearing the mean's denominator: S_i = Σ_{j≤i}(n_j − tot/nd)
      // scaled by nd gives nd·prefix_i − i·tot — all BIGINT (≤ #days ×
      // total events ≈ 2^40 at sf0.1; overflow needs >4e9 days·events²
      // — unreachable), so peak day and flag are partition-order
      // invariant and bit-identical cross-engine, no float mean anywhere.
      // Scale shape: the facts collapse FIRST to one row per day (one
      // partial+final agg); the ordered prefix window and the peak scan
      // run over that calendar-bounded table (≤ a few hundred rows at
      // ANY corpus size — this is the documented exception to the
      // no-global-window rule: the window input is bounded by the
      // calendar, not the corpus), and the two scalars (nd, tot / mx)
      // ride broadcast-1-row cross joins.
      val days = T.events(s, d)
        .groupBy(floor(unix_millis(col("ts")) / 86400000L).cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = days.agg(count(lit(1)).as("nd"), sum(col("n")).as("tot"))
      val w = Window.orderBy(col("day"))
      val x = days
        .select(col("day"), col("n"),
                row_number().over(w).cast("long").as("i"),
                sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding,
                  Window.currentRow)).as("pre"))
        .crossJoin(broadcast(tot))
        .select(col("day"), col("n"),
                (col("nd") * col("pre") - col("i") * col("tot")).as("cusum_scaled"))
      val mx = x.agg(max(abs(col("cusum_scaled"))).as("mx"))
      x.crossJoin(broadcast(mx))
        .select(col("day"), col("n"), col("cusum_scaled"),
                when(abs(col("cusum_scaled")) === col("mx"), 1L).otherwise(0L)
                  .as("is_change_point"))
        .orderBy(col("day"))
    },

    Q(
      "event_survival_km",
      s"""WITH u AS (
         |  SELECT user_id, min(CAST(ts AS DATE)) AS d0,
         |         min(CASE WHEN event_type = 'error' THEN CAST(ts AS DATE) END) AS de
         |  FROM events GROUP BY user_id),
         |lt AS (
         |  SELECT CASE WHEN de IS NOT NULL AND date_diff('day', d0, de) <= 5
         |              THEN CAST(date_diff('day', d0, de) AS BIGINT)
         |              ELSE CAST(5 AS BIGINT) END AS dur,
         |         CASE WHEN de IS NOT NULL AND date_diff('day', d0, de) <= 5
         |              THEN 1 ELSE 0 END AS obs
         |  FROM u),
         |c AS (
         |  SELECT dur AS t, CAST(count(*) AS BIGINT) AS cnt,
         |         CAST(sum(obs) AS BIGINT) AS d
         |  FROM lt GROUP BY dur),
         |r AS (
         |  SELECT t, d,
         |         CAST((SELECT count(*) FROM lt)
         |           - coalesce(sum(cnt) OVER (ORDER BY t
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n
         |  FROM c),
         |h AS (
         |  SELECT t, d, n,
         |         CAST(round(${TrainingOps.lnProbTpl("(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE))")} * 1000.0) AS BIGINT) AS l
         |  FROM r WHERE d > 0 AND d < n)
         |SELECT t, d, n,
         |       CAST(-sum(l) OVER (ORDER BY t
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumhaz_millinats
         |FROM h ORDER BY t""".stripMargin
    ) { (s, d) =>
      // Kaplan-Meier survival — the time-to-event readout product
      // analytics runs next to the retention matrix, here time from a
      // user's first event to their first 'error', administratively
      // CENSORED at a 5-day analysis horizon (users whose failure falls
      // past the horizon contribute risk-set time but no death —
      // ignoring censoring is the bias KM exists to fix; a common
      // horizon is the textbook fixed-follow-up design). Estimator: at
      // each event time t with d deaths out of n at risk, the survival
      // factor is (1 − d/n); we emit the CUMULATIVE HAZARD −ln S(t) =
      // −Σ ln(1 − d/n) in integer millinats so the cumulative product
      // never touches cross-engine float summation — each factor's ln
      // goes through the shared bit-deterministic template
      // [[TrainingOps.lnProbTpl]] and is rounded to a BIGINT once, the
      // running sum is exact integer arithmetic (text_perplexity's
      // discipline applied to survival analysis). Rows where d = 0
      // (pure-censoring times) or d = n (S → 0, hazard infinite) are
      // excluded by both engines alike — KM's survival curve only
      // steps at death times. Scale: ONE user_id shuffle collapses the
      // log to per-user lifetimes; the risk-set/hazard windows then run
      // over the DISTINCT-DURATION table, which is horizon-bounded
      // (event_cusum's argued exception: axis-sized, never
      // corpus-sized), so the single-partition window is O(days).
      val ev = T.events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("dt"), col("event_type"))
      val te = datediff(col("de"), col("d0"))
      val u = ev.groupBy(col("user_id"))
        .agg(min(col("dt")).as("d0"),
             min(when(col("event_type") === "error", col("dt"))).as("de"))
        .select(when(col("de").isNotNull && te <= 5, te.cast("long")).otherwise(5L).as("dur"),
                when(col("de").isNotNull && te <= 5, 1L).otherwise(0L).as("obs"))
      val nu = u.agg(count(lit(1)).as("nu"))
      val c = u.groupBy(col("dur").as("t"))
        .agg(count(lit(1)).as("cnt"), sum(col("obs")).cast("long").as("d"))
      val wPrior = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = c.crossJoin(broadcast(nu))
        .select(col("t"), col("d"),
                (col("nu") - coalesce(sum(col("cnt")).over(wPrior), lit(0L)))
                  .cast("long").as("n"))
      r.where(col("d") > 0 && col("d") < col("n"))
        .select(col("t"), col("d"), col("n"),
          expr(s"CAST(round(${TrainingOps.lnProbTpl("(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE))")} * 1000.0) AS BIGINT)").as("l"))
        .select(col("t"), col("d"), col("n"),
                (-sum(col("l")).over(wRun)).cast("long").as("cumhaz_millinats"))
        .orderBy(col("t"))
    },

    Q(
      "event_power_mde",
      s"""WITH m AS (
         |  SELECT event_type,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv,
         |         CAST(sum(CAST(round(value * 100) AS BIGINT)
         |                * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS svv
         |  FROM events GROUP BY event_type)
         |SELECT event_type, n,
         |       ${EventOps.powerSelect}
         |FROM m ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // Experiment power / sample-size planning — the pre-test sibling
      // of event_ab_test's post-test z readout: for each metric
      // (event_type), how many users per arm does a two-sample test
      // need to detect a 5% lift at α = 0.05 (two-sided), power 0.8?
      // n/arm = 2·(z_{α/2} + z_β)²·σ² / δ², δ = 0.05·mean. Exactness
      // discipline: `value` is a 2-dp money column, so moments
      // accumulate as EXACT integer cents (Σc, Σc² — BIGINT; at
      // raw-web row counts these widen to DECIMAL(38) under the same
      // formula) and the one-row-per-group double formula is spliced
      // as IDENTICAL text on both engines ([[powerSelect]], the
      // cupedSelect device). Scale: one map-side-combining groupBy on
      // the 5-value event_type key — the reduce sees #partitions×5
      // rows; no other exchange.
      val cents = round(col("value") * 100).cast("long")
      T.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
             sum(cents).cast("long").as("sv"),
             sum(cents * cents).cast("long").as("svv"))
        .selectExpr(Seq("event_type", "n") ++ EventOps.powerSelect.split(",\n").toSeq: _*)
        .orderBy(col("event_type"))
    },

    Q(
      "event_did",
      s"""WITH b AS (SELECT min(epoch_ms(ts)) AS lo, max(epoch_ms(ts)) AS hi FROM events),
         |m AS (
         |  SELECT
         |    CAST(sum(CASE WHEN user_id % 2 = 0 AND epoch_ms(ts) * 2 <  b.lo + b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_a_pre,
         |    CAST(sum(CASE WHEN user_id % 2 = 0 AND epoch_ms(ts) * 2 >= b.lo + b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_a_post,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 AND epoch_ms(ts) * 2 <  b.lo + b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_b_pre,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 AND epoch_ms(ts) * 2 >= b.lo + b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_b_post,
         |    CAST(sum(CASE WHEN user_id % 2 = 0 AND epoch_ms(ts) * 2 <  b.lo + b.hi THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sv_a_pre,
         |    CAST(sum(CASE WHEN user_id % 2 = 0 AND epoch_ms(ts) * 2 >= b.lo + b.hi THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sv_a_post,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 AND epoch_ms(ts) * 2 <  b.lo + b.hi THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sv_b_pre,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 AND epoch_ms(ts) * 2 >= b.lo + b.hi THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS sv_b_post
         |  FROM events, b)
         |SELECT n_a_pre, n_a_post, n_b_pre, n_b_post,
         |       ${EventOps.didSelect}
         |FROM m""".stripMargin
    ) { (s, d) =>
      // Difference-in-differences — the quasi-experimental readout when
      // randomization isn't available (Card & Krueger's design): the
      // treatment group's pre→post metric change, net of the control
      // group's change over the same periods. Period = the exact
      // integer-midpoint epoch-ms split (event_ab_cuped's device; no
      // float time math), group = the user-id parity bucket. All eight
      // cell moments accumulate as EXACT BIGINTs in ONE global
      // conditional aggregate (map-side partials ⇒ the reduce sees
      // #partitions rows; value in integer cents), and the DiD estimate
      // is a 1-row double formula spliced as IDENTICAL text on both
      // engines ([[didSelect]]). Scale: one fact pass, zero joins
      // beyond the broadcast 1-row bounds.
      val ev = T.events(s, d)
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
                round(col("value") * 100).cast("long").as("c"))
      val bounds = ev.agg(min(col("ms")).as("lo"), max(col("ms")).as("hi"))
      def cell(g: Int, post: Boolean, v: org.apache.spark.sql.Column) = {
        val inPeriod = if (post) col("ms") * 2 >= col("lo") + col("hi")
                       else col("ms") * 2 < col("lo") + col("hi")
        sum(when(col("user_id") % 2 === g && inPeriod, v).otherwise(0L)).cast("long")
      }
      ev.crossJoin(broadcast(bounds))
        .agg(cell(0, post = false, lit(1L)).as("n_a_pre"),
             cell(0, post = true, lit(1L)).as("n_a_post"),
             cell(1, post = false, lit(1L)).as("n_b_pre"),
             cell(1, post = true, lit(1L)).as("n_b_post"),
             cell(0, post = false, col("c")).as("sv_a_pre"),
             cell(0, post = true, col("c")).as("sv_a_post"),
             cell(1, post = false, col("c")).as("sv_b_pre"),
             cell(1, post = true, col("c")).as("sv_b_post"))
        .selectExpr(Seq("n_a_pre", "n_a_post", "n_b_pre", "n_b_post") ++
                    EventOps.didSelect.split(",\n").toSeq: _*)
    },

    Q(
      "event_trend_mk",
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT a.event_type,
        |         CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY 1),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1),
        |t AS (
        |  SELECT event_type, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        |  FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS t
        |        FROM daily GROUP BY event_type, c)
        |  GROUP BY 1)
        |SELECT n.event_type, n.n_days, s.s_stat,
        |       CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie_term AS BIGINT) AS var18,
        |       CASE WHEN n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie_term > 0
        |            THEN round((CAST(s.s_stat AS DOUBLE)
        |              - (CASE WHEN s.s_stat > 0 THEN 1.0 WHEN s.s_stat < 0 THEN -1.0 ELSE 0.0 END))
        |             / sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie_term AS DOUBLE) / 18.0), 6)
        |            ELSE NULL END AS z
        |FROM n JOIN s USING (event_type) JOIN t USING (event_type)
        |ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      // Mann-Kendall trend test (Mann 1945, Kendall's tau family) — the
      // nonparametric "is this metric drifting?" monitor that
      // environmental/SRE dashboards run where event_cusum looks for a
      // LEVEL SHIFT: S = Σ_{i<j} sign(c_j − c_i) over the daily series,
      // variance with the standard tie correction, z with continuity
      // correction. Exactness: S and the ×18-scaled variance are pure
      // BIGINT (sign comparisons and count polynomials); only the final
      // z is IEEE, spliced as identical text. Scale: the pair join runs
      // on the DAILY table — calendar-bounded (the event_cusum
      // exception: O(days²) per type, never corpus-sized) after ONE
      // fact collapse; at a 10-year horizon you'd switch S to the
      // O(n log n) inversion-count formulation, same output.
      val daily = T.events(s, d)
        .groupBy(col("event_type"),
                 floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
        .agg(count(lit(1)).as("c"))
      val sStat = daily.as("a")
        .join(daily.as("b"),
              col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(when(col("b.c") > col("a.c"), 1L)
                   .when(col("b.c") < col("a.c"), -1L).otherwise(0L))
               .cast("long").as("s_stat"))
      val nDays = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
      val ties = daily.groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("t"))
        .groupBy(col("event_type"))
        .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).cast("long").as("tie_term"))
      // degenerate series (single day or all daily counts tied) → var18 = 0:
      // z is undefined, emitted as NULL in BOTH engines rather than the
      // engine-divergent sqrt(0) division (ADVICE r17)
      nDays.join(sStat, Seq("event_type")).join(ties, Seq("event_type"))
        .selectExpr("event_type", "n_days", "s_stat",
          "CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT) AS var18",
          """CASE WHEN n_days * (n_days - 1) * (2 * n_days + 5) - tie_term > 0
            |     THEN round((CAST(s_stat AS DOUBLE)
            |       - (CASE WHEN s_stat > 0 THEN 1.0 WHEN s_stat < 0 THEN -1.0 ELSE 0.0 END))
            |      / sqrt(CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS DOUBLE) / 18.0), 6)
            |     ELSE NULL END AS z""".stripMargin)
        .orderBy(col("event_type"))
    },

    Q(
      "event_qte",
      """WITH u AS (
        |  SELECT user_id, user_id % 2 AS variant,
        |         coalesce(CAST(sum(CASE WHEN event_type = 'purchase'
        |                            THEN CAST(round(value * 100) AS BIGINT)
        |                            ELSE CAST(0 AS BIGINT) END) AS BIGINT), 0) // 100 AS m
        |  FROM events GROUP BY user_id),
        |g AS (SELECT variant, m, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1, 2),
        |r AS (
        |  SELECT variant, m, c,
        |         CAST(coalesce(sum(c) OVER (PARTITION BY variant ORDER BY m
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below,
        |         CAST(sum(c) OVER (PARTITION BY variant) AS BIGINT) AS n
        |  FROM g),
        |pos AS (
        |  SELECT r.*, q.q,
        |         (q.q * (r.n - 1)) // 4 + 1 AS plo,
        |         ((q.q * (r.n - 1)) + 3) // 4 + 1 AS phi
        |  FROM r CROSS JOIN (SELECT unnest(range(1, 4)) AS q) q),
        |v AS (
        |  SELECT variant, q,
        |         CAST(sum(CASE WHEN below < plo AND plo <= below + c THEN m ELSE 0 END) AS BIGINT) AS vlo,
        |         CAST(sum(CASE WHEN below < phi AND phi <= below + c THEN m ELSE 0 END) AS BIGINT) AS vhi,
        |         CAST(min(n) AS BIGINT) AS n
        |  FROM pos GROUP BY 1, 2)
        |SELECT a.q AS quartile, a.n AS n_a, b.n AS n_b,
        |       round((a.vlo + a.vhi) / 2.0, 6) AS q_a,
        |       round((b.vlo + b.vhi) / 2.0, 6) AS q_b,
        |       round((b.vlo + b.vhi) / 2.0 - (a.vlo + a.vhi) / 2.0, 6) AS qte
        |FROM (SELECT * FROM v WHERE variant = 0) a
        |JOIN (SELECT * FROM v WHERE variant = 1) b USING (q)
        |ORDER BY quartile""".stripMargin
    ) { (s, d) =>
      // Quantile treatment effect - the EFFECT-SIZE readout next to
      // event_ab_mwu's significance: per-variant quartiles of the
      // per-user purchase spend and their differences, showing WHERE in
      // the distribution a treatment moves users (a mean lift hiding in
      // the top quartile reads completely differently from a uniform
      // shift). Metric = per-user spend in whole DOLLARS (exact cents
      // sum, integer DIV 100): dollar quantization bounds the DISTINCT
      // metric domain, so the rank machinery runs entirely on the
      // (variant, dollars) counts table - quantile value at rank r is
      // the row where below < r <= below + c, no corpus-sized window
      // (the event_ab_mwu bounded-domain discipline; cent-resolution
      // would ride the partial-offset device instead). Quartile q =
      // midpoint of the order statistics at floor/ceil of q(n-1)/4 -
      // pure integer ranks, one IEEE halving spliced identically, so
      // both engines agree bit-for-bit.
      val u = T.events(s, d)
        .groupBy(col("user_id"))
        .agg(coalesce(sum(when(col("event_type") === "purchase",
                               round(col("value") * 100).cast("long"))
                            .otherwise(0L)), lit(0L)).as("cents"))
        .select((col("user_id") % 2).as("variant"),
                expr("cents DIV 100").as("m"))
      val g = u.groupBy(col("variant"), col("m")).agg(count(lit(1)).as("c"))
      val W = org.apache.spark.sql.expressions.Window
      val r = g
        .withColumn("below", coalesce(sum(col("c")).over(
          W.partitionBy(col("variant")).orderBy(col("m"))
            .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum(col("c")).over(W.partitionBy(col("variant"))))
      val pos = r.crossJoin(broadcast(s.range(1, 4).select(col("id").as("q"))))
        .withColumn("plo", expr("(q * (n - 1)) DIV 4 + 1"))
        .withColumn("phi", expr("((q * (n - 1)) + 3) DIV 4 + 1"))
      val v = pos.groupBy(col("variant"), col("q"))
        .agg(sum(when(col("below") < col("plo") && col("plo") <= col("below") + col("c"),
                      col("m")).otherwise(0L)).cast("long").as("vlo"),
             sum(when(col("below") < col("phi") && col("phi") <= col("below") + col("c"),
                      col("m")).otherwise(0L)).cast("long").as("vhi"),
             min(col("n")).cast("long").as("n"))
      v.where(col("variant") === 0).as("a")
        .join(v.where(col("variant") === 1).as("b"), Seq("q"))
        .selectExpr("q AS quartile", "a.n AS n_a", "b.n AS n_b",
          // 2.0D: Spark parses a bare 2.0 literal as DECIMAL(2,1) where
          // DuckDB reads DOUBLE — the halving must be IEEE in both
          "round((a.vlo + a.vhi) / 2.0D, 6) AS q_a",
          "round((b.vlo + b.vhi) / 2.0D, 6) AS q_b",
          "round((b.vlo + b.vhi) / 2.0D - (a.vlo + a.vhi) / 2.0D, 6) AS qte")
        .orderBy(col("quartile"))
    },

    Q(
      "event_theil_sen",
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |sl AS (
        |  SELECT a.event_type,
        |         CAST(b.c - a.c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |r AS (
        |  SELECT event_type, slope,
        |         row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM sl)
        |SELECT event_type, CAST(min(n) AS BIGINT) AS n_pairs,
        |       round(avg(slope), 6) AS sen_slope
        |FROM r
        |WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      // Theil-Sen estimator (Theil 1950, Sen 1968) — event_trend_mk's
      // MAGNITUDE sibling: Mann-Kendall answers "is the daily series
      // drifting" with a significance z; Theil-Sen answers "by HOW MUCH
      // per day" with the median of all pairwise slopes — robust to
      // ~29% outliers where an OLS slope is dragged by one bad day.
      // Exactness: each slope is ONE IEEE division of exact BIGINTs
      // (identical bit pattern in both engines), the median picks the
      // middle value(s) by rank (equal-slope tie order cannot change
      // the picked VALUE), and the even-count midpoint is one IEEE avg
      // of two identical doubles. Scale: the pair join runs on the
      // DAILY table — calendar-bounded O(days²) per type after one
      // fact collapse (the event_trend_mk exception, never
      // corpus-sized); the rank window partitions by type over that
      // same bounded pair table.
      val daily = T.events(s, d)
        .groupBy(col("event_type"),
                 floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
        .agg(count(lit(1)).as("c"))
      val sl = daily.as("a")
        .join(daily.as("b"),
              col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
        .select(col("a.event_type").as("event_type"),
                ((col("b.c") - col("a.c")).cast("double") /
                 (col("b.day") - col("a.day")).cast("double")).as("slope"))
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("slope"))
      val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
      sl.withColumn("rn", row_number().over(wr))
        .withColumn("n", count(lit(1)).over(wn).cast("long"))
        .where(expr("rn = (n + 1) DIV 2 OR rn = (n + 2) DIV 2"))
        .groupBy(col("event_type"))
        .agg(min(col("n")).cast("long").as("n_pairs"),
             round(avg(col("slope")), 6).as("sen_slope"))
        .orderBy(col("event_type"))
    },

    Q(
      "event_holt",
      """WITH RECURSIVE d0 AS (
        |  SELECT event_type, CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |d AS (
        |  SELECT event_type, CAST(c AS DOUBLE) AS c,
        |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM d0),
        |st(event_type, i, n, l, b) AS (
        |  SELECT event_type, i, n, c, CAST(0 AS DOUBLE)
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT s.event_type, s.i + 1, s.n,
        |         0.3 * y.c + 0.7 * (s.l + s.b),
        |         0.1 * (0.3 * y.c + 0.7 * (s.l + s.b) - s.l) + 0.9 * s.b
        |  FROM st s JOIN d y ON y.event_type = s.event_type AND y.i = s.i + 1)
        |SELECT event_type, n AS n_days,
        |       round(l, 6) AS level, round(b, 6) AS trend,
        |       round(l + 7 * b, 6) AS forecast_7
        |FROM st WHERE i = n
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // Holt's linear-trend smoothing (Holt 1957; Hyndman & Athanasopoulos
      // FPP §8.2) — the forecasting rung between win_ewma's single
      // smoother (level only, lags any trend) and sql_forecast_revenue's
      // global OLS (one straight line, no recency weighting): coupled
      // level/trend recursions l←αy+(1−α)(l+b), b←β(l−l₋₁)+(1−β)b with
      // the standard l₁=y₁, b₁=0 init, read out as the 7-day-ahead
      // forecast l+7b. CROSS-ENGINE DISCIPLINE for a genuinely
      // sequential float recursion: both engines execute the SAME
      // operation sequence — Spark as a codegen'd higher-order
      // `aggregate` fold over each type's day-ordered value array,
      // DuckDB as a recursive CTE advancing every type in lockstep —
      // with the update spliced as textually identical arithmetic
      // (D-suffixed Spark-side per the event_qte rule), so each step is
      // bit-identical and round(…,6) compares equal states, not
      // approximations. Scale: the recursion never touches the corpus —
      // one fact collapse to the calendar-bounded daily table (the
      // event_cusum exception), then a per-type fold over a ≤ |days|
      // array; the sort lives inside sort_array on that bounded array,
      // not a corpus shuffle. Null payloads (degraded lane): a forecast
      // is defined over LABELED, TIMESTAMPED series, and the filter must
      // be EXPLICIT in both engines — without it Spark's fold keeps a
      // null-type group the DuckDB recursion's equi-join silently drops
      // (measured: 6 vs 5 rows on the 10%-null corpus).
      val daily = T.events(s, d)
        .where(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"),
                 floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
        .agg(count(lit(1)).as("c"))
      val lNew = "0.3D * y + 0.7D * (st.l + st.b)"
      daily.groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("sd"))
        .selectExpr("event_type",
          "CAST(size(sd) AS BIGINT) AS n_days",
          "transform(sd, p -> CAST(p.c AS DOUBLE)) AS ys")
        .selectExpr("event_type", "n_days",
          s"""aggregate(slice(ys, 2, size(ys) - 1),
             |          named_struct('l', ys[0], 'b', 0.0D),
             |          (st, y) -> named_struct(
             |            'l', $lNew,
             |            'b', 0.1D * ($lNew - st.l) + 0.9D * st.b)) AS st""".stripMargin)
        .selectExpr("event_type", "n_days",
          "round(st.l, 6) AS level", "round(st.b, 6) AS trend",
          "round(st.l + 7.0D * st.b, 6) AS forecast_7")
        .orderBy(col("event_type"))
    },

    Q(
      "event_kalman",
      """WITH RECURSIVE d0 AS (
        |  SELECT event_type, CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |d AS (
        |  SELECT event_type, CAST(c AS DOUBLE) AS c,
        |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS i,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM d0),
        |st(event_type, i, n, x, p) AS (
        |  SELECT event_type, i, n, c, CAST(1 AS DOUBLE)
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT s.event_type, s.i + 1, s.n,
        |         s.x + ((s.p + 1) / (s.p + 1 + 4)) * (y.c - s.x),
        |         (1 - (s.p + 1) / (s.p + 1 + 4)) * (s.p + 1)
        |  FROM st s JOIN d y ON y.event_type = s.event_type AND y.i = s.i + 1)
        |SELECT event_type, n AS n_days,
        |       round(x, 6) AS level, round(p, 6) AS variance,
        |       round((p + 1) / (p + 1 + 4), 6) AS gain
        |FROM st WHERE i = n
        |ORDER BY event_type NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // 1-D Kalman filter (Kalman 1960; random-walk state, q = 1,
      // observation noise r = 4) — the STATE-SPACE rung above
      // `event_holt`: Holt's gains are fixed knobs; the Kalman gain
      // k = p⁻/(p⁻+r) ADAPTS, starting high (trust early observations)
      // and settling to the steady-state Riccati value, and the filter
      // carries an honest posterior variance next to the level — the
      // uncertainty readout an anomaly gate thresholds against. Same
      // cross-engine discipline as event_holt for a sequential float
      // recursion with a PER-STEP DIVISION: both engines execute the
      // spliced-identical operation sequence (Spark: higher-order
      // `aggregate` fold per type; DuckDB: recursive CTE in lockstep),
      // every operand DOUBLE, so each step's (x, p) state is
      // bit-identical — including the division, which IEEE defines
      // exactly for identical operands. Recursion runs on the
      // calendar-bounded daily table; integer constants (1, 4) parse
      // identically everywhere, no decimal-literal hazard at all.
      val daily = T.events(s, d)
        .where(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"),
                 floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
        .agg(count(lit(1)).as("c"))
      val gain = "((st.p + 1) / (st.p + 1 + 4))"
      daily.groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("sd"))
        .selectExpr("event_type",
          "CAST(size(sd) AS BIGINT) AS n_days",
          "transform(sd, q -> CAST(q.c AS DOUBLE)) AS ys")
        .selectExpr("event_type", "n_days",
          s"""aggregate(slice(ys, 2, size(ys) - 1),
             |          named_struct('x', ys[0], 'p', CAST(1 AS DOUBLE)),
             |          (st, y) -> named_struct(
             |            'x', st.x + $gain * (y - st.x),
             |            'p', (1 - $gain) * (st.p + 1))) AS st""".stripMargin)
        .selectExpr("event_type", "n_days",
          "round(st.x, 6) AS level", "round(st.p, 6) AS variance",
          "round((st.p + 1) / (st.p + 1 + 4), 6) AS gain")
        .orderBy(col("event_type"))
    },

    Q(
      "event_acf",
      s"""WITH d AS (
        |  SELECT event_type, CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
        |      FROM d GROUP BY 1),
        |den AS (SELECT d.event_type,
        |               CAST(sum((m.n * d.c - m.s) * (m.n * d.c - m.s)) AS BIGINT) AS den_int
        |        FROM d JOIN m ON m.event_type = d.event_type GROUP BY 1),
        |p AS (SELECT a.event_type, CAST(b.day - a.day AS BIGINT) AS lag,
        |             CAST(count(*) AS BIGINT) AS n_pairs,
        |             CAST(sum((m.n * a.c - m.s) * (m.n * b.c - m.s)) AS BIGINT) AS num_int
        |      FROM d a JOIN d b ON b.event_type = a.event_type
        |        AND b.day - a.day BETWEEN 1 AND 7
        |      JOIN m ON m.event_type = a.event_type
        |      GROUP BY 1, 2)
        |SELECT p.event_type AS event_type, lag, n_pairs,
        |       CAST(${graft.operators.LlmOps.microRoundSql("1000000 * num_int", "den_int", "//")} AS DOUBLE) / 1000000 AS acf
        |FROM p JOIN den ON den.event_type = p.event_type
        |WHERE den_int > 0
        |ORDER BY p.event_type, lag""".stripMargin
    ) { (s, d) =>
      // Sample autocorrelation at lags 1..7 of the per-type daily count
      // series — the DIAGNOSTIC rung the forecasting keys assume: Holt
      // and the Kalman filter MODEL serial dependence, the ACF MEASURES
      // it (a weekly-seasonal stream shows the lag-7 spike that says
      // event_seasonality's day-of-week profile is the right model; a
      // flat ACF says the anomaly keys' independence assumptions hold).
      // EXACT integer algebra throughout: with y the integer daily
      // counts and ȳ = S/n rational, scaling both sides by n² makes
      // every term a BIGINT — num(L) = Σ(n·yₜ−S)(n·yₜ₊L−S) over the
      // pairs at EXACT day-difference L (calendar gaps simply
      // contribute no pair, identically in both engines), den =
      // Σ(n·yₜ−S)² over the full series — so acf = num/den is a pure
      // rational read out through [[LlmOps.microRoundSql]] (a
      // denominator that is itself a data-dependent square sum is
      // exactly the midpoint class IEEE round(…,6) breaks on). Null
      // payloads are filtered EXPLICITLY in both engines (the
      // event_holt degraded-lane rule: an unlabeled or untimestamped
      // event belongs to no series). Scale shape: one corpus collapse
      // to the calendar-bounded daily table, then a ±7-band self-join
      // and the moment sums on that COLLAPSED table — |days|·|types|
      // rows, never event count; the band join is the RangeJoinExec
      // shape if the calendar ever got wide enough to matter. 63-bit
      // bound: the scaled moment terms are (n·c)², so the exact chain
      // holds to ~3e9 avg daily events on a 10-year calendar — past
      // that, rescale the series to per-day MILLIONS first (the
      // once-rounded-unit ladder the money keys use), never to floats.
      val daily = T.events(s, d)
        .where(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"),
                 floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
        .agg(count(lit(1)).as("c"))
      val m = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"), sum(col("c")).cast("long").as("s"))
      val den = daily.as("d").join(m.as("m"), col("d.event_type") === col("m.event_type"))
        .select(col("d.event_type").as("event_type"),
                ((col("n") * col("c") - col("s")) * (col("n") * col("c") - col("s"))).as("t"))
        .groupBy(col("event_type")).agg(sum(col("t")).cast("long").as("den_int"))
      val pairs = daily.as("a")
        .join(daily.as("b"),
              col("b.event_type") === col("a.event_type") &&
                (col("b.day") - col("a.day")).between(1, 7))
        .join(m.as("m"), col("m.event_type") === col("a.event_type"))
        .select(col("a.event_type").as("event_type"),
                (col("b.day") - col("a.day")).cast("long").as("lag"),
                ((col("n") * col("a.c") - col("s")) *
                 (col("n") * col("b.c") - col("s"))).as("prod"))
        .groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).cast("long").as("n_pairs"),
             sum(col("prod")).cast("long").as("num_int"))
      pairs.as("p").join(den.as("dn"), col("dn.event_type") === col("p.event_type"))
        .where(col("den_int") > 0)
        .selectExpr("p.event_type AS event_type", "lag", "n_pairs",
          s"CAST(${graft.operators.LlmOps.microRoundSql("1000000 * num_int", "den_int", "DIV")} AS DOUBLE) / 1000000 AS acf")
        .orderBy(col("event_type"), col("lag"))
    },

    Q(
      "event_funnel_ci",
      """WITH a AS (
        |  SELECT user_id, min(epoch_ms(ts)) AS ta FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |b AS (
        |  SELECT e.user_id, min(epoch_ms(e.ts)) AS tb
        |  FROM events e JOIN a ON e.user_id = a.user_id
        |  WHERE e.event_type = 'click'
        |    AND epoch_ms(e.ts) > a.ta AND epoch_ms(e.ts) <= a.ta + 86400000
        |  GROUP BY e.user_id),
        |c AS (
        |  SELECT e.user_id, min(epoch_ms(e.ts)) AS tc
        |  FROM events e JOIN b ON e.user_id = b.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_ms(e.ts) > b.tb AND epoch_ms(e.ts) <= b.tb + 86400000
        |  GROUP BY e.user_id),
        |hops AS (
        |  SELECT CAST(1 AS BIGINT) AS hop,
        |         (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_base,
        |         (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_conv
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT),
        |         (SELECT CAST(count(*) AS BIGINT) FROM b),
        |         (SELECT CAST(count(*) AS BIGINT) FROM c))
        |SELECT hop, n_base, n_conv,
        |       round(CAST(n_conv AS DOUBLE) / n_base, 6) AS rate,
        |       round(((CAST(n_conv AS DOUBLE) / n_base + 3.8416 / (2 * CAST(n_base AS DOUBLE)))
        |              - 1.96 * sqrt((CAST(n_conv AS DOUBLE) / n_base) * (1 - CAST(n_conv AS DOUBLE) / n_base) / n_base
        |                            + 3.8416 / (4 * CAST(n_base AS DOUBLE) * n_base)))
        |             / (1 + 3.8416 / CAST(n_base AS DOUBLE)), 6) AS ci_lo,
        |       round(((CAST(n_conv AS DOUBLE) / n_base + 3.8416 / (2 * CAST(n_base AS DOUBLE)))
        |              + 1.96 * sqrt((CAST(n_conv AS DOUBLE) / n_base) * (1 - CAST(n_conv AS DOUBLE) / n_base) / n_base
        |                            + 3.8416 / (4 * CAST(n_base AS DOUBLE) * n_base)))
        |             / (1 + 3.8416 / CAST(n_base AS DOUBLE)), 6) AS ci_hi
        |FROM hops WHERE n_base > 0
        |ORDER BY hop""".stripMargin
    ) { (s, d) =>
      // Wilson 95% score intervals on the funnel's hop conversion rates
      // (Wilson 1927) — the UNCERTAINTY readout event_funnel omits: a
      // 40%→40% week-over-week "no change" on 50 users is noise, on
      // 50 000 it's a finding, and the Wilson interval (unlike the Wald
      // ±z√(pq/n) taught-but-broken form) stays inside [0,1] and
      // behaves at small n and extreme p — the standard for conversion
      // dashboards. Cross-engine: n_conv/n_base are exact integers from
      // the SAME stage tables as event_funnel; the interval is one
      // spliced all-DOUBLE expression per bound over identical operand
      // bits (integer literals except 1.96/3.8416, which parse to
      // identical doubles in both engines; the Spark side carries the
      // event_qte D-suffix), one final round(…,6). Scale: the funnel's
      // own one-partitioning shape, then a 2-row readout.
      val HopMs = 86400000L
      val ev = T.events(s, d)
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
      val a = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ms")).as("ta"))
      val b = ev.where(col("event_type") === "click")
        .join(Gate.bcast(a), "user_id")
        .where(col("ms") > col("ta") && col("ms") <= col("ta") + HopMs)
        .groupBy(col("user_id")).agg(min(col("ms")).as("tb"))
      val c = ev.where(col("event_type") === "purchase")
        .join(Gate.bcast(b), "user_id")
        .where(col("ms") > col("tb") && col("ms") <= col("tb") + HopMs)
        .groupBy(col("user_id")).agg(min(col("ms")).as("tc"))
      val na = a.agg(count(lit(1)).cast("long").as("na"))
      val nb = b.agg(count(lit(1)).cast("long").as("nb"))
      val nc = c.agg(count(lit(1)).cast("long").as("nc"))
      val hops = na.crossJoin(nb).crossJoin(nc)
        .selectExpr("stack(2, CAST(1 AS BIGINT), na, nb, CAST(2 AS BIGINT), nb, nc) AS (hop, n_base, n_conv)")
      def wilson(sign: String) =
        s"""round(((CAST(n_conv AS DOUBLE) / n_base + 3.8416D / (2 * CAST(n_base AS DOUBLE)))
           |        $sign 1.96D * sqrt((CAST(n_conv AS DOUBLE) / n_base) * (1 - CAST(n_conv AS DOUBLE) / n_base) / n_base
           |                      + 3.8416D / (4 * CAST(n_base AS DOUBLE) * n_base)))
           |       / (1 + 3.8416D / CAST(n_base AS DOUBLE)), 6)""".stripMargin
      hops.where(col("n_base") > 0)
        .selectExpr("hop", "n_base", "n_conv",
          "round(CAST(n_conv AS DOUBLE) / n_base, 6) AS rate",
          s"${wilson("-")} AS ci_lo", s"${wilson("+")} AS ci_hi")
        .orderBy(col("hop"))
    },

    Q(
      "event_absorbing",
      EventOps.absorbingOracleSql
    ) { (s, d) =>
      // Absorbing-chain conversion probability (Kemeny-Snell absorbing
      // Markov chains): P(reach 'purchase' within 6 steps | current
      // state), per starting event type — the PREDICTIVE readout the
      // chain family was missing: event_markov gives one-step
      // transition probabilities, event_funnel counts one fixed path;
      // the absorption iterate h_{t+1}(x) = Σ_y P(x,y)·h_t(y) (with
      // purchase pinned at 1) folds EVERY path of length ≤ 6 into one
      // number per state — "how close to converting is a user sitting
      // at x", the quantity a real-time intervention rule thresholds.
      // Exact integer ppm: transition mass stays as counts (n_xy,
      // n_from), each step is ONE integer division per state —
      // (Σ_y n_xy·h_ppm(y)) DIV n_from — after an exact BIGINT sum
      // (tighter than per-edge DIV; 63-bit bound: n_from·10⁶, rescale
      // units past ~10¹² outgoing transitions per state). Six UNROLLED
      // steps (the pagerank device), generated from one template for
      // both engines. Scale: the chain runs entirely on the
      // |types|²-bounded transition table — one corpus shuffle builds
      // it (the event_markov shape), then 6 bounded-table joins.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      val c0 = T.events(s, d)
        .where(col("event_type").isNotNull)
        .select(col("user_id"), col("event_type").as("from_type"),
                unix_millis(col("ts")).as("ms"), col("event_id"))
        .withColumn("to_type", lead(col("from_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
      // r19 A/B (negative result): persisting the transition table
      // measured min 0.88 s → 0.95 s solo at sf0.1 — the six unrolled
      // steps' copies of the collapse subtree share one plan, so
      // ReuseExchange + concurrent stages make the recompute nearly
      // free, while the persist adds a serializing cache-fill job (the
      // same verdict as the r18 per-step-checkpoint A/B, one level up).
      val c = c0
      val t = c.groupBy(col("from_type")).agg(sum(col("n")).cast("long").as("n_from"))
      val states = c.select(col("from_type").as("event_type"))
        .union(c.select(col("to_type").as("event_type"))).distinct()
      var h = states.select(col("event_type"),
        when(col("event_type") === "purchase", 1000000L).otherwise(0L).as("p"))
      for (_ <- 1 to 6) {
        val step = c.join(Gate.bcast(h.withColumnRenamed("event_type", "ht")),
            col("to_type") === col("ht"))
          .groupBy(col("from_type"))
          .agg(sum(col("n") * col("p")).cast("long").as("num"))
          .join(Gate.bcast(t), "from_type")
          .select(col("from_type").as("event_type"),
                  expr("num DIV n_from").as("pv"))
        // measured negative result: localCheckpoint-per-step (the
        // graph_label_prop device) DOUBLED this key (1.97 → 3.97 s at
        // sf0.1) — six extra materialization jobs cost more than the
        // 6-deep lineage compiles, because every table here is
        // |types|-tiny; the lineage shape stands on that measurement
        h = states.join(step, Seq("event_type"), "left")
          .select(col("event_type"),
                  when(col("event_type") === "purchase", 1000000L)
                    .otherwise(coalesce(col("pv"), lit(0L))).as("p"))
      }
      h.select(col("event_type"), col("p").as("p_conv6_ppm"))
        .orderBy(col("event_type"))
    },

    Q(
      "event_spc",
      """WITH d AS (
        |  SELECT event_type, CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
        |      FROM d GROUP BY 1),
        |dev AS (SELECT d.event_type, day, m.n, m.n * d.c - m.s AS dv
        |        FROM d JOIN m ON m.event_type = d.event_type),
        |v AS (SELECT event_type, CAST(sum(dv * dv) AS BIGINT) AS ss FROM dev GROUP BY 1),
        |f AS (SELECT dev.event_type, day, n, dv, ss,
        |             CASE WHEN n * dv * dv > 9 * ss THEN 1 ELSE 0 END AS b3,
        |             CASE WHEN n * dv * dv > 4 * ss AND dv > 0 THEN 1 ELSE 0 END AS p2,
        |             CASE WHEN n * dv * dv > 4 * ss AND dv < 0 THEN 1 ELSE 0 END AS m2,
        |             CASE WHEN n * dv * dv > ss AND dv > 0 THEN 1 ELSE 0 END AS p1,
        |             CASE WHEN n * dv * dv > ss AND dv < 0 THEN 1 ELSE 0 END AS m1,
        |             CASE WHEN dv > 0 THEN 1 ELSE 0 END AS sp,
        |             CASE WHEN dv < 0 THEN 1 ELSE 0 END AS sm
        |      FROM dev JOIN v ON v.event_type = dev.event_type),
        |w AS (SELECT event_type, day, b3,
        |             CASE WHEN count(*) OVER w9 = 9 AND
        |                       (sum(sp) OVER w9 = 9 OR sum(sm) OVER w9 = 9)
        |                  THEN 1 ELSE 0 END AS r2,
        |             CASE WHEN count(*) OVER w3 = 3 AND
        |                       (sum(p2) OVER w3 >= 2 OR sum(m2) OVER w3 >= 2)
        |                  THEN 1 ELSE 0 END AS r3,
        |             CASE WHEN count(*) OVER w5 = 5 AND
        |                       (sum(p1) OVER w5 >= 4 OR sum(m1) OVER w5 >= 4)
        |                  THEN 1 ELSE 0 END AS r4
        |      FROM f
        |      WINDOW w9 AS (PARTITION BY event_type ORDER BY day
        |                    ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
        |             w3 AS (PARTITION BY event_type ORDER BY day
        |                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |             w5 AS (PARTITION BY event_type ORDER BY day
        |                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |agg AS (SELECT event_type,
        |               CAST(sum(b3) AS BIGINT) AS r1, CAST(sum(r2) AS BIGINT) AS r2,
        |               CAST(sum(r3) AS BIGINT) AS r3, CAST(sum(r4) AS BIGINT) AS r4
        |        FROM w GROUP BY 1)
        |SELECT event_type, rule, n_flagged FROM (
        |  SELECT event_type, 'r1_beyond_3sigma' AS rule, r1 AS n_flagged FROM agg
        |  UNION ALL SELECT event_type, 'r2_run_of_9', r2 FROM agg
        |  UNION ALL SELECT event_type, 'r3_2of3_beyond_2sigma', r3 FROM agg
        |  UNION ALL SELECT event_type, 'r4_4of5_beyond_1sigma', r4 FROM agg)
        |ORDER BY event_type, rule""".stripMargin
    ) { (s, d) =>
      // Statistical-process-control screen: the four Western Electric
      // zone rules (WECo 1956) over each type's daily-count control
      // chart — the monitoring vocabulary event_anomaly (plain 3σ),
      // event_cusum (cumulative drift) and event_changepoint
      // (retrospective splits) each speak one word of: rule 1 = one
      // point beyond 3σ, rule 2 = nine consecutive on one side of
      // center, rule 3 = two of three consecutive beyond 2σ same side,
      // rule 4 = four of five beyond 1σ same side. The entire rule
      // algebra is EXACT integers — with dᵗ = n·yᵗ − S and
      // SS = Σd², the zone test |yᵗ−ȳ| > zσ is n·dᵗ² > z²·SS
      // (population σ, both sides scaled by n³), and sidedness is
      // sign(dᵗ) — so there is NO float anywhere in the output and no
      // rounding contract at all; runs/zone membership come from
      // bounded ROWS windows (9/3/5) on the day-ordered series, flagged
      // only at full window width (identical count(*) guard in both
      // engines). Scale shape: one corpus collapse to the
      // calendar-bounded daily table (the event_cusum exception), four
      // windows sharing one sort, a per-type rollup, and a 4-way
      // unpivot — |types|×4 output rows. Same 63-bit note as event_acf:
      // n·dᵗ² holds to ~3e9 avg daily events; rescale units past that.
      val daily = T.events(s, d)
        .where(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"),
                 floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
        .agg(count(lit(1)).as("c"))
      val m = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"), sum(col("c")).cast("long").as("s"))
      val dev = daily.as("d").join(m.as("m"), col("d.event_type") === col("m.event_type"))
        .select(col("d.event_type").as("event_type"), col("day"), col("n"),
                (col("n") * col("c") - col("s")).as("dv"))
      val v = dev.groupBy(col("event_type").as("vt"))
        .agg(sum(col("dv") * col("dv")).cast("long").as("ss"))
      val f = dev.join(v, col("event_type") === col("vt")).drop("vt")
        .selectExpr("event_type", "day",
          "CASE WHEN n * dv * dv > 9 * ss THEN 1 ELSE 0 END AS b3",
          "CASE WHEN n * dv * dv > 4 * ss AND dv > 0 THEN 1 ELSE 0 END AS p2",
          "CASE WHEN n * dv * dv > 4 * ss AND dv < 0 THEN 1 ELSE 0 END AS m2",
          "CASE WHEN n * dv * dv > ss AND dv > 0 THEN 1 ELSE 0 END AS p1",
          "CASE WHEN n * dv * dv > ss AND dv < 0 THEN 1 ELSE 0 END AS m1",
          "CASE WHEN dv > 0 THEN 1 ELSE 0 END AS sp",
          "CASE WHEN dv < 0 THEN 1 ELSE 0 END AS sm")
      import org.apache.spark.sql.expressions.Window
      def wrows(k: Int) = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-(k - 1), 0)
      val flagged = f.select(col("event_type"), col("b3"),
        when(count(lit(1)).over(wrows(9)) === 9 &&
             (sum(col("sp")).over(wrows(9)) === 9 || sum(col("sm")).over(wrows(9)) === 9),
             1).otherwise(0).as("r2"),
        when(count(lit(1)).over(wrows(3)) === 3 &&
             (sum(col("p2")).over(wrows(3)) >= 2 || sum(col("m2")).over(wrows(3)) >= 2),
             1).otherwise(0).as("r3"),
        when(count(lit(1)).over(wrows(5)) === 5 &&
             (sum(col("p1")).over(wrows(5)) >= 4 || sum(col("m1")).over(wrows(5)) >= 4),
             1).otherwise(0).as("r4"))
      flagged.groupBy(col("event_type"))
        .agg(sum(col("b3")).cast("long").as("r1"), sum(col("r2")).cast("long").as("r2"),
             sum(col("r3")).cast("long").as("r3"), sum(col("r4")).cast("long").as("r4"))
        .selectExpr("event_type",
          "stack(4, 'r1_beyond_3sigma', r1, 'r2_run_of_9', r2, " +
            "'r3_2of3_beyond_2sigma', r3, 'r4_4of5_beyond_1sigma', r4) AS (rule, n_flagged)")
        .orderBy(col("event_type"), col("rule"))
    },

    Q(
      "event_changepoint",
      s"""WITH d AS (
         |  SELECT event_type, CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |x AS (
         |  SELECT event_type, day, n,
         |         CAST(row_number() OVER w AS BIGINT) AS i,
         |         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pre
         |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         |t AS (SELECT event_type, CAST(max(i) AS BIGINT) AS nd,
         |             CAST(sum(n) AS BIGINT) AS tot
         |      FROM x GROUP BY 1),
         |c AS (SELECT x.event_type, day, i, pre, nd, tot
         |      FROM x JOIN t ON x.event_type = t.event_type WHERE i < nd),
         |g1 AS (SELECT event_type, day, i, pre, nd, tot, ${EventOps.cpGain1} AS gain FROM c),
         |r1 AS (SELECT event_type, day AS cp_day, i AS i1, pre AS preS, gain
         |       FROM (SELECT *, row_number() OVER (PARTITION BY event_type
         |                       ORDER BY gain DESC, day) AS rn FROM g1)
         |       WHERE rn = 1),
         |l2 AS (SELECT c.event_type, c.day, c.i, c.pre, c.nd, c.tot, r.i1, r.preS
         |       FROM c JOIN r1 r ON c.event_type = r.event_type),
         |g2 AS (
         |  SELECT event_type, day, CAST(2 AS BIGINT) AS cp_rank, ${EventOps.cpGainL} AS gain
         |  FROM l2 WHERE i < i1
         |  UNION ALL
         |  SELECT event_type, day, CAST(3 AS BIGINT) AS cp_rank, ${EventOps.cpGainR} AS gain
         |  FROM l2 WHERE i > i1),
         |r2 AS (SELECT event_type, cp_rank, day AS cp_day, gain
         |       FROM (SELECT *, row_number() OVER (PARTITION BY event_type, cp_rank
         |                       ORDER BY gain DESC, day) AS rn FROM g2)
         |       WHERE rn = 1)
         |SELECT event_type, CAST(1 AS BIGINT) AS cp_rank, cp_day, round(gain, 6) AS gain
         |FROM r1
         |UNION ALL
         |SELECT event_type, cp_rank, cp_day, round(gain, 6) AS gain FROM r2
         |ORDER BY event_type, cp_rank""".stripMargin
    ) { (s, d) =>
      // Binary-segmentation change-point detection (Scott & Knott 1974;
      // the greedy rung above event_cusum's single CUSUM peak): level 1
      // picks the split of each type's daily series that maximally
      // reduces total SSE, level 2 re-splits each resulting half —
      // up to three ranked change points per type, the shape a
      // monitoring stack actually wants ("the level shifted twice").
      // Exactness: prefix sums and totals are BIGINT; each candidate's
      // gain is the spliced all-DOUBLE template (numerators exact
      // integer products cast once, one IEEE division per term), so the
      // argmax ranks identical doubles in both engines, ties broken by
      // day. Degenerate segments (< 2 points) yield no candidates in
      // either engine — a type with nd = 1 emits nothing at all. Scale:
      // ONE fact collapse to the calendar-bounded daily table (the
      // event_cusum exception), every window partitioned by event_type
      // over that bounded table, the level-1 winners broadcast back.
      val daily = T.events(s, d)
        .groupBy(col("event_type"),
                 floor(unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
        .agg(count(lit(1)).cast("long").as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      // r19 A/B (wash): persisting this calendar-bounded prefix-sum table
      // to dedup its three plan copies measured min 0.97 → 0.89 s but
      // median 1.10 → 1.20 s solo at sf0.1 — inside run-to-run noise,
      // the same ReuseExchange-absorbs-the-recompute verdict as
      // data_drift_psi/event_absorbing. Left unpersisted.
      val x = daily.select(col("event_type"), col("day"), col("n"),
        row_number().over(w).cast("long").as("i"),
        sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long").as("pre"))
      val t = x.groupBy(col("event_type"))
        .agg(max(col("i")).as("nd"), sum(col("n")).cast("long").as("tot"))
      val c = x.join(Gate.bcast(t), "event_type").where(col("i") < col("nd"))
      val g1 = c.selectExpr("event_type", "day", "i", "pre", "nd", "tot",
                            s"${EventOps.cpGain1} AS gain")
      val wr = Window.partitionBy(col("event_type")).orderBy(col("gain").desc, col("day"))
      val r1 = g1.withColumn("rn", row_number().over(wr)).where(col("rn") === 1)
        .select(col("event_type"), col("day").as("cp_day"),
                col("i").as("i1"), col("pre").as("preS"), col("gain"))
      val l2 = c.join(Gate.bcast(r1.select(col("event_type"), col("i1"), col("preS"))),
                      "event_type")
      val g2 = l2.where(col("i") < col("i1"))
        .selectExpr("event_type", "day", "CAST(2 AS BIGINT) AS cp_rank",
                    s"${EventOps.cpGainL} AS gain")
        .unionByName(l2.where(col("i") > col("i1"))
          .selectExpr("event_type", "day", "CAST(3 AS BIGINT) AS cp_rank",
                      s"${EventOps.cpGainR} AS gain"))
      val wr2 = Window.partitionBy(col("event_type"), col("cp_rank"))
        .orderBy(col("gain").desc, col("day"))
      val r2 = g2.withColumn("rn", row_number().over(wr2)).where(col("rn") === 1)
        .select(col("event_type"), col("cp_rank"), col("day").as("cp_day"), col("gain"))
      r1.select(col("event_type"), lit(1L).as("cp_rank"), col("cp_day"), col("gain"))
        .unionByName(r2)
        .select(col("event_type"), col("cp_rank"), col("cp_day"),
                round(col("gain"), 6).as("gain"))
        .orderBy(col("event_type"), col("cp_rank"))
    },

    Q(
      "event_benford",
      s"""WITH v AS (
         |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events WHERE round(value * 100) >= 1),
         |dg AS (
         |  SELECT event_type,
         |         CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM v),
         |o AS (SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n_obs
         |      FROM dg GROUP BY 1, 2),
         |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM dg GROUP BY 1),
         |g AS (
         |  SELECT n.event_type, d.digit, n.n, coalesce(o.n_obs, 0) AS n_obs
         |  FROM n CROSS JOIN (SELECT unnest(range(1, 10)) AS digit) d
         |  LEFT JOIN o ON o.event_type = n.event_type AND o.digit = d.digit)
         |SELECT event_type, digit, CAST(n_obs AS BIGINT) AS n_obs,
         |       ${EventOps.benfordSelect}
         |FROM g
         |ORDER BY event_type NULLS FIRST, digit""".stripMargin
    ) { (s, d) =>
      // Benford first-digit conformance (Newcomb-Benford law) — the
      // standard forensic/data-quality screen: organically-generated
      // money amounts follow P(d) = log10(1 + 1/d); fabricated or
      // truncated feeds don't. Per (event_type, digit): observed count,
      // the expected ppm (the nine log10 constants are Scala-computed
      // double literals spliced into BOTH engines), and the χ² term in
      // integer MICROS — each term is rounded ONCE per row from an
      // identical IEEE expression, so the per-type χ² rollup the user
      // does afterwards is an exact BIGINT sum (never an order-dependent
      // double sum). First digit extracts via decimal string head —
      // exact on BIGINTs in both engines, no float log10 in the hot
      // path. Scale: one fact collapse to ≤ |types|×9 cells; the digit
      // axis joins as a literal 9-row generator.
      val v = T.events(s, d)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
        .where(col("c") >= 1)
        .select(col("event_type"),
                substring(col("c").cast("string"), 1, 1).cast("long").as("digit"))
      val o = v.groupBy(col("event_type"), col("digit")).agg(count(lit(1)).as("n_obs"))
      val n = v.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val digits = s.range(1, 10).select(col("id").as("digit"))
      n.crossJoin(broadcast(digits))
        .join(o, Seq("event_type", "digit"), "left")
        .select(col("event_type"), col("digit"), col("n"),
                coalesce(col("n_obs"), lit(0L)).as("n_obs"))
        .selectExpr(Seq("event_type", "digit", "CAST(n_obs AS BIGINT) AS n_obs") ++
                    EventOps.benfordSelect.split(",\n").toSeq: _*)
        .orderBy(col("event_type"), col("digit"))
    }
  )
}
