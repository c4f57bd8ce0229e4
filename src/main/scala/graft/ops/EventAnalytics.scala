package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic event-analytics operators over the events stream — the OLAP
  * surfaces a telemetry/product warehouse runs daily, expressed as
  * chains of keyed aggregates (no per-user sorted scans, no windows):
  * every step is a groupBy/join on the user key, so the whole analysis
  * shuffles on one key and scales with users, not events-per-user.
  */
object EventAnalytics {

  /** ORDERED FUNNEL (signup → view → … conversion): per user,
    * `t_k` = the earliest event time of type `steps(k-1)` STRICTLY
    * AFTER `t_{k-1}` — the standard in-order funnel semantics (a
    * purchase before the view does not convert the view). `t_k` is
    * null as soon as a step is unreached, and `steps_reached` counts
    * the non-null prefix (nulls propagate: `ts > null` is null, so a
    * missing step nulls everything after it).
    *
    * Shape: one filtered aggregate for step 1, then per step one left
    * join + re-aggregate, all keyed on the user — k equi joins total.
    * The join fans out to that step's events per user and collapses
    * immediately; partitioning by user is reused across every stage.
    */
  /** L209 — BRADLEY-TERRY PREFERENCE STRENGTHS (fixed-point MM
    * iterations): from (winner, loser) trials, per-item strengths s_i
    * such that P(i beats j) = s_i/(s_i+s_j) — the model preference
    * data curation fits before training a reward model (and the
    * principled aggregate for pairwise human comparisons, vs win-rate
    * which ignores opponent strength). The classic minorize-maximize
    * update s_i ← W_i / Σ_j n_ij/(s_i+s_j) runs a FIXED `rounds`
    * iterations in e6 fixed point with floor division (the pagerank
    * posture: bounded rounds, exact integers, unrollable to a SQL
    * oracle; BT is scale-invariant so no normalization step is
    * needed, and strengths floor at 1 so an all-losses item stays a
    * valid denominator).
    *
    * Scale shape per round: one equi join of the directed pair-count
    * table against the (items-sized) strength table + one
    * map-side-combined sum — items are few, trials are many; the
    * trials reduce ONCE to (i, j, n) counts up front.
    *
    * Output: (item, wins, games, s_e6) after exactly `rounds` updates
    * from the uniform start 10⁶.
    */
  def bradleyTerry(trials: DataFrame, winCol: String, loseCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"need 1 <= rounds <= 8, got $rounds")
    val t = trials.select(col(winCol).as("w"), col(loseCol).as("l"))
      .filter(col("w") =!= col("l"))
    val gd = t.select(col("w").as("i"), col("l").as("j"))
      .unionByName(t.select(col("l").as("i"), col("w").as("j")))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n"))
    val items = gd.select(col("i").as("item")).distinct()
    val wins = t.groupBy(col("w").as("item")).agg(count(lit(1)).as("wins"))
    val games = gd.groupBy(col("i").as("item")).agg(sum(col("n")).as("games"))
    var s = items.select(col("item"), lit(1000000L).as("s"))
    var r = 0
    while (r < rounds) {
      val d = gd
        .join(s.select(col("item").as("i"), col("s").as("si")), Seq("i"))
        .join(s.select(col("item").as("j"), col("s").as("sj")), Seq("j"))
        .groupBy(col("i").as("item"))
        .agg(sum(expr("(n * 1000000000000L) div (si + sj)")).as("d"))
      s = d.join(wins, Seq("item"), "left")
        .select(col("item"),
          greatest(lit(1L),
            expr("(coalesce(wins, 0L) * 1000000000000L) div d")).as("s"))
      r += 1
    }
    items
      .join(wins, Seq("item"), "left")
      .join(games, Seq("item"))
      .join(s, Seq("item"))
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"),
        col("games"), col("s").as("s_e6"))
  }

  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tusCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(userCol),
      col(typeCol).as("__t"), col(tusCol).as("__ts"))
    val first = base.filter(col("__t") === steps.head)
      .groupBy(col(userCol)).agg(min(col("__ts")).as("t1"))
    val full = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (st, i)) =>
        val prevCols = (1 to i).map(j => col(s"t$j"))
        acc.join(base.filter(col("__t") === st), Seq(userCol), "left")
          .groupBy((col(userCol) +: prevCols): _*)
          .agg(min(when(col("__ts") > col(s"t$i"), col("__ts")))
            .as(s"t${i + 1}"))
    }
    full.withColumn("steps_reached",
      steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1L)
        .otherwise(0L)).reduce(_ + _))
  }

  /** COHORT RETENTION: cohort = the user's first-activity bucket
    * (`tus div bucketUs` — weekly at 604800e6); one output row per
    * (cohort, offset) with the distinct users active `offset` buckets
    * after their cohort's start. Two aggregates on the user key plus
    * one equi join back — the (user, bucket) distinct collapse runs
    * BEFORE the join, so the join input is bounded by users × buckets,
    * not raw events.
    */
  def retention(events: DataFrame, userCol: String, tusCol: String,
                bucketUs: Long): DataFrame = {
    // `div`, not `/`: Column./ on longs is double division (inexact past
    // 2^53 and a different value domain than the SQL mirror)
    val w = events
      .select(col(userCol),
        expr(s"cast($tusCol as bigint) div ${bucketUs}L").as("w"))
      .distinct()
    val cohorts = w.groupBy(col(userCol)).agg(min(col("w")).as("cohort_w"))
    w.join(cohorts, Seq(userCol))
      .withColumn("week_offset", col("w") - col("cohort_w"))
      .groupBy(col("cohort_w"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** σ-THRESHOLD OUTLIERS, integer-exact: flag rows whose integer value
    * deviates from its group mean by more than `num/den` population
    * standard deviations. The z-test is cleared of every division and
    * square root by cross-multiplication:
    *
    *   |x − S/n| > (num/den)·σ,  σ² = (n·Q − S²)/n²
    *     ⟺  den²·(n·x − S)²  >  num²·(n·Q − S²)
    *
    * with S = Σx and Q = Σx² per group — both sides are integers, so
    * the flag is bit-identical in any engine (the classic z-score in
    * doubles is NOT: Σx² accumulation order changes the low bits).
    * Arithmetic runs in decimal(38,0) (HUGEINT in the SQL mirror):
    * at corpus scale n·x can reach 10^16 and its square 10^32 —
    * far past int64, comfortably inside 38 digits.
    *
    * Shape: one hash aggregate builds the |groups|-row stats table,
    * which BROADCASTS back onto the stream — the flag itself is a
    * map-side expression, so the whole operator is one shuffle (the
    * stats agg) no matter how many rows are scored.
    */
  def sigmaOutliers(events: DataFrame, grpCol: String, valCol: String,
                    num: Int, den: Int): DataFrame = {
    val d38 = "decimal(38,0)"
    // q accumulates in decimal: Σx² crosses int64 once n·x² > 2^63
    // (n = 10^12 rows of x = 10^4 is 10^20) — long sum would wrap.
    val stats = events.groupBy(col(grpCol)).agg(
      count(lit(1)).as("n"), sum(col(valCol)).as("s"),
      sum((col(valCol) * col(valCol)).cast(d38)).as("q"))
    val dev = (col("n").cast(d38) * col(valCol).cast(d38)
      - col("s").cast(d38))
    val lhs = lit(den * den).cast(d38) * dev * dev
    val rhs = lit(num * num).cast(d38) *
      (col("n").cast(d38) * col("q").cast(d38)
        - col("s").cast(d38) * col("s").cast(d38))
    events.join(broadcast(stats), Seq(grpCol))
      .withColumn("is_outlier", lhs > rhs)
      .withColumn("dev_sign",
        when(dev > 0, 1L).when(dev < 0, -1L).otherwise(0L))
  }

  /** MAD (median-absolute-deviation) OUTLIERS — the robust complement
    * of [[sigmaOutliers]]: mean and σ are themselves dragged by the
    * outliers they're meant to find (one 10⁹ value inflates σ until
    * nothing else flags); the median and MAD have breakdown point 50%.
    * Everything stays in integers: the LOWER median is the value at
    * rank `(n+1) div 2` of the group's sort — an exact selection, no
    * averaging of middle pairs — and the gate is
    * `dev·den > num·mad` (num/den ≈ the classic 3·1.4826 scale).
    *
    * Degenerate case, by construction: if more than half the group
    * equals its median, mad = 0 and every dev > 0 flags — the standard
    * MAD behavior on discrete data; callers with such groups want a
    * coarser value domain.
    *
    * Shape: two rank-selection passes (each one shuffle on the group
    * key + an in-partition sort), each producing a 1-row-per-group
    * table that BROADCASTS back; the flag is map-side. Group count is
    * assumed small vs. rows (events per type), the same skew posture
    * as the calibrated quality gate.
    *
    * Output: input columns + (med, dev, mad, is_outlier).
    */
  def madOutliers(events: DataFrame, grpCol: String, valCol: String,
                  num: Int, den: Int): DataFrame = {
    val grp = Window.partitionBy(col(grpCol))
    def lowerMedian(df: DataFrame, c: String, as: String): DataFrame =
      df.select(col(grpCol), col(c))
        .withColumn("__rn", row_number()
          .over(Window.partitionBy(col(grpCol)).orderBy(col(c))).cast("long"))
        .withColumn("__n", count(lit(1)).over(grp))
        .filter(col("__rn") === expr("(__n + 1) div 2"))
        .select(col(grpCol), col(c).as(as))
    val med = lowerMedian(events, valCol, "med")
    val dev = events.join(broadcast(med), Seq(grpCol))
      .withColumn("dev", abs(col(valCol) - col("med")))
    val mad = lowerMedian(dev, "dev", "mad")
    dev.join(broadcast(mad), Seq(grpCol))
      .withColumn("is_outlier",
        col("dev") * lit(den.toLong) > col("mad") * lit(num.toLong))
  }

  /** MULTI-TOUCH LINEAR ATTRIBUTION: each conversion's integer credit
    * (cents) splits across the same key's touch events inside the
    * preceding `windowUs`, EXACTLY — base share `cents div k` each,
    * the `cents mod k` remainder cents one each to the EARLIEST
    * touches (largest-remainder on equal quotas, the same rounding
    * discipline as `Curation.allocateBudget`), so each CREDITED
    * conversion's cents sum bit-for-bit across its touches.
    * Conversions with zero touches inside `windowUs` are excluded by
    * the inner join (their cents are never attributed) — switch the
    * pairing to a left join if touchless conversions must be audited.
    * Last-touch/first-touch are the k=1 ends of the same join; linear
    * is the one that needs the exact-split care.
    *
    * Shape: the touch↔conversion pairing is an interval join WITH the
    * key as equi column (the j-family discipline — never a pure theta
    * join), the per-conversion rank window partitions on the
    * conversion id (touches per conversion is window-bounded, state
    * never leaves one conversion), and the final rollup is a hash
    * aggregate on the touch id. Three narrow-keyed shuffles, no
    * global sort.
    *
    * Input `touches`: (key, touchId, tus); `convs`: (key, convId, tus,
    * cents). Output: one row per credited touch —
    * (touchId, key, n_convs, attributed_cents).
    */
  def linearAttribution(touches: DataFrame, convs: DataFrame,
                        keyCol: String, windowUs: Long): DataFrame = {
    val t = touches.select(col(keyCol), col("touchId"), col("tus").as("t_tus"))
    val c = convs.select(col(keyCol), col("convId"), col("tus").as("c_tus"),
      col("cents"))
    val paired = c.join(t,
      c(keyCol) === t(keyCol) && col("t_tus") <= col("c_tus")
        && col("t_tus") > col("c_tus") - lit(windowUs))
      .select(c(keyCol), col("convId"), col("cents"), col("touchId"),
        col("t_tus"))
    val w = Window.partitionBy(col("convId"))
      .orderBy(col("t_tus"), col("touchId"))
    val credited = paired
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__k", count(lit(1))
        .over(Window.partitionBy(col("convId"))))
      .withColumn("credit",
        expr("cents div __k")
          + when(col("__rk") <= expr("cents % __k"), 1L).otherwise(0L))
    credited.groupBy(col("touchId"), col(keyCol))
      .agg(countDistinct(col("convId")).as("n_convs"),
        sum(col("credit")).as("attributed_cents"))
  }

  /** One-sided CUSUM drift detection (Page 1954), window-exact: per
    * group in (time, id) order, `S_i = max(0, S_{i-1} + x_i)` with
    * drift `x = value − target`, alarm when `S_i > h`. The recursion
    * is closed-form over prefix sums — `S_i = P_i − min(0, min_{j≤i}
    * P_j)` — so the sequential fold becomes two cumulative windows
    * over one partition-by-group sort: ONE shuffle however long the
    * history, no per-key iteration, and every value stays an exact
    * integer (the induction: S_i = max(0, P_i − m_{i−1}) =
    * P_i − min(m_{i−1}, P_i)).
    *
    * `target` rows: (grpCol, target) — one per group, broadcast back
    * (callers typically feed the group's median from [[madOutliers]]'
    * rank selection, keeping the whole detector outlier-robust).
    *
    * Output: input + (drift, cusum, alarm) — `alarm` marks every row
    * whose running drift exceeds `h`, the change-point evidence.
    */
  def cusumDrift(events: DataFrame, target: DataFrame, grpCol: String,
                 valCol: String, tusCol: String, idCol: String,
                 h: Long): DataFrame = {
    val w = Window.partitionBy(col(grpCol))
      .orderBy(col(tusCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.join(broadcast(target), Seq(grpCol))
      .withColumn("drift", col(valCol) - col("target"))
      .withColumn("__p", sum(col("drift")).over(w))
      .withColumn("cusum", col("__p") - least(lit(0L), min(col("__p")).over(w)))
      .withColumn("alarm", col("cusum") > lit(h))
      .drop("__p")
  }

  /** DISORDER PROFILE — the empirical input for sizing every watermark
    * in §2.10: per key, each row's LAG = (running max event time in
    * ARRIVAL order) − its own event time, i.e. how late it arrived
    * relative to the stream's high-water mark; the per-key max and
    * rank-selected p99 of that lag are exactly the `withWatermark`
    * delay that would keep 100% / 99% of this key's rows. An SLA set
    * from guesses drops data or bloats state — this measures it.
    *
    * `arrivalCol` is the ingest order (a monotone ingest id or arrival
    * time), `tieCol` a unique id breaking arrival ties (a ROWS frame
    * over a non-unique order would otherwise make the running max
    * depend on tie placement); p99 is the lag at rank `ceil(99·n/100)`
    * — exact integer rank selection, no interpolation. Shape: two
    * windows on the same key partitioning (arrival order, then lag
    * order) + one hash agg — one shuffle on the key, all integers.
    *
    * Output: (key, n, n_late, max_lag_us, p99_lag_us).
    */
  /** L175 — DAY-OF-WEEK SEASONALITY PROFILE with an exact-integer χ²
    * against the uniform profile — the ingest-drift detector for event
    * feeds (a feed whose weekday mix shifts is upstream breakage long
    * before volumes move): per type, χ² = Σ_d (n_d − n/7)²/(n/7)
    * computed as Σ_d (7·n_d − n)² / (7n) — the numerator is an exact
    * long (absent weekdays contribute n² each), the statistic ONE
    * division. Weekday from exact epoch arithmetic ((days + 4) mod 7,
    * Thursday epoch), never timezone-dependent date functions.
    *
    * Scale shape: one (type, dow) map-side hash agg, then a 7-row-max
    * per-type rollup.
    *
    * Output: (type, n, n_dows, chisq_num, chisq).
    */
  def dowProfile(events: DataFrame, typeCol: String,
      tusCol: String): DataFrame = {
    val days = ((col(tusCol) - pmod(col(tusCol), lit(86400000000L)))
      / 86400000000L).cast("long")
    val byDow = events
      .select(col(typeCol).as("type"), pmod(days + 4L, lit(7L)).as("dow"))
      .groupBy(col("type"), col("dow")).agg(count(lit(1)).as("nd"))
    byDow.groupBy(col("type"))
      .agg(sum(col("nd")).as("n"), count(lit(1)).as("n_dows"),
        sum(col("nd") * col("nd")).as("__ssq"))
      // Σ over ALL 7 dows (absent nd = 0) of (7nd − n)²
      //   = 49·Σnd² − 14n·Σnd + 7n² = 49·Σnd² − 7n²
      .withColumn("chisq_num",
        col("__ssq") * 49L - col("n") * col("n") * 7L)
      .select(col("type"), col("n"), col("n_dows"), col("chisq_num"))
      .withColumn("chisq",
        when(col("n") > 0L,
          col("chisq_num").cast("double") / (col("n") * 7L).cast("double"))
          .otherwise(lit(-1d)))
  }

  def disorderProfile(events: DataFrame, keyCol: String, tusCol: String,
                      arrivalCol: String, tieCol: String): DataFrame = {
    val wArr = Window.partitionBy(col(keyCol))
      .orderBy(col(arrivalCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lagged = events
      .withColumn("__lag", max(col(tusCol)).over(wArr) - col(tusCol))
    val p99 = lagged
      .withColumn("__rn", row_number().over(Window.partitionBy(col(keyCol))
        .orderBy(col("__lag"), col(arrivalCol), col(tieCol))).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .filter(col("__rn") === expr("(99 * __n + 99) div 100"))
      .select(col(keyCol), col("__lag").as("p99_lag_us"))
    lagged.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__lag") > 0L, 1L).otherwise(0L)).as("n_late"),
        max(col("__lag")).as("max_lag_us"))
      .join(p99, Seq(keyCol))
  }
}
