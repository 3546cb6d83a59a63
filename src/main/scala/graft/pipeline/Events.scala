package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event operators Spark has no native relational form for. */
object Events {

  /** Cohort retention: bucket users by the DAY of their first event
    * (the cohort), then count distinct users active at each day offset
    * since — the classic retention triangle. Two hash aggregations
    * (first-day per user, then cohort × offset distincts); the cohort
    * relation is #users rows and joins back broadcast-or-hash as the
    * optimizer sees fit. Day arithmetic is integral (epoch days), so
    * external engines reproduce it exactly.
    */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val day = floor(unix_timestamp(col(tsCol)) / 86400L)
    val firstDay = events
      .select(col(userCol), day.as("d"))
      .groupBy(userCol).agg(min("d").as("cohort_day"))
    events.select(col(userCol), day.as("d"))
      .join(firstDay, Seq(userCol))
      .groupBy(col("cohort_day"), (col("d") - col("cohort_day"))
        .as("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }


  /** Per-user stage ARRIVALS of the ordered funnel walk: one row per
    * (user, reached stage) with the arrival's epoch second and the
    * user's stage-1 arrival — the relation [[funnel]] aggregates and
    * [[funnelTiming]] measures. Same walk, same shuffles.
    */
  def funnelArrivals(events: DataFrame, stages: Seq[String],
                     userCol: String = "user_id",
                     typeCol: String = "event_type",
                     tsCol: String = "ts",
                     withinSeconds: Long = Long.MaxValue): DataFrame = {
    require(stages.nonEmpty && stages.size <= 16,
      s"funnel: 1..16 stages, got ${stages.size}")
    require(stages.distinct.size == stages.size,
      "funnel: stages must be distinct")
    val ts = unix_timestamp(col(tsCol))
    var reached = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(ts).as("t1"))
      .withColumn("t_prev", col("t1"))
    val stageSets = scala.collection.mutable.ArrayBuffer(
      reached.select(lit(1).as("stage_idx"), lit(stages.head).as("stage"),
        col(userCol), col("t1").as("t"), col("t1")))
    for (k <- 1 until stages.size) {
      reached = events.filter(col(typeCol) === stages(k))
        .select(col(userCol), ts.as("t_k"))
        .join(reached.select(col(userCol), col("t_prev"), col("t1")),
          Seq(userCol))
        .filter(col("t_k") > col("t_prev") &&
          col("t_k") - col("t1") <= lit(withinSeconds))
        .groupBy(col(userCol))
        .agg(min(col("t_k")).as("t_prev"), min(col("t1")).as("t1"))
      stageSets += reached.select(lit(k + 1).as("stage_idx"),
        lit(stages(k)).as("stage"), col(userCol),
        col("t_prev").as("t"), col("t1"))
    }
    stageSets.reduce(_.unionByName(_))
  }

  /** Ordered funnel over an event stream: for each stage k, how many
    * users reached stages 1..k IN ORDER — a user's stage-k arrival is
    * their earliest `stages(k)` event STRICTLY after their stage-(k-1)
    * arrival (simultaneous events don't advance the funnel), and
    * `withinSeconds` optionally bounds the whole funnel to a horizon
    * after the stage-1 arrival. Returns one row per stage:
    * (stage_idx, stage, n_users).
    *
    * Scale shape: one filtered min-aggregation per stage, every one
    * keyed on the USER — the same shuffle key each round, so AQE/
    * co-partitioning reuse applies and no stage widens: k user-keyed
    * aggregations of ≤ #users rows each, then a union of per-stage user
    * sets collapsing into k output rows. Timestamps compare as integral
    * epoch seconds, so external engines reproduce the walk exactly.
    */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts",
             withinSeconds: Long = Long.MaxValue): DataFrame = {
    val counts = funnelArrivals(events, stages, userCol, typeCol, tsCol,
        withinSeconds)
      .groupBy(col("stage_idx"), col("stage"))
      .agg(count(lit(1)).as("n_users"))
    // a stage nobody reached must still report 0, not vanish
    val dim = events.sparkSession.createDataFrame(
      stages.zipWithIndex.map { case (st, i) => (i + 1, st) })
      .toDF("stage_idx", "stage")
    dim.join(counts, Seq("stage_idx", "stage"), "left")
      .select(col("stage_idx"), col("stage"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy("stage_idx")
  }

  /** Time-to-convert per funnel stage: for every stage k ≥ 2, exact
    * interpolated percentiles (and max) of the seconds from the user's
    * stage-1 arrival to their stage-k arrival — "how long until
    * checkout". Gaps are integral seconds, so both engines interpolate
    * identical inputs (the corpusStats percentile recipe).
    */
  def funnelTiming(events: DataFrame, stages: Seq[String],
                   userCol: String = "user_id",
                   typeCol: String = "event_type", tsCol: String = "ts",
                   withinSeconds: Long = Long.MaxValue): DataFrame =
    funnelArrivals(events, stages, userCol, typeCol, tsCol,
        withinSeconds)
      .filter(col("stage_idx") >= 2)
      .withColumn("gap", col("t") - col("t1"))
      .groupBy("stage_idx", "stage")
      .agg(count(lit(1)).as("n_users"),
        round(expr("percentile(gap, 0.5)"), 4).as("p50_sec"),
        round(expr("percentile(gap, 0.9)"), 4).as("p90_sec"),
        max(col("gap")).as("max_sec"))
      .orderBy("stage_idx")

  /** Trailing-window anomaly scores: each event's value z-scored
    * against the SAME user's previous `n` events (frame `n PRECEDING ..
    * 1 PRECEDING` — the current value never contaminates its own
    * baseline), flagged when |z| exceeds `zThreshold`; rows with fewer
    * than `minPrior` priors are dropped (no meaningful baseline).
    *
    * Engine-portable by construction: values scale to exact integer
    * hundredths, the window sums are order-free LONG additions, and
    * mean/variance derive from those sums with one fixed association —
    * so DuckDB reproduces every z bit-for-bit (q_event_anomaly), which
    * plain double window aggregates (segment-tree vs sequential
    * summation) cannot promise. Ordering ties break on integral epoch
    * seconds then the event id, identical in both engines. One
    * user-keyed window — the same shuffle family as any per-key ordered
    * analytic; skew is governed by the user key like a groupBy.
    */
  def anomalies(events: DataFrame, n: Int = 20, minPrior: Int = 5,
                zThreshold: Double = 3.0, idCol: String = "event_id",
                userCol: String = "user_id", tsCol: String = "ts",
                valueCol: String = "value"): DataFrame = {
    require(n >= 1 && minPrior >= 1 && minPrior <= n,
      s"anomalies: need 1 <= minPrior <= n, got n=$n minPrior=$minPrior")
    requireNoReserved(events, Set("sec", "v100", "n_prior", "s1", "s2",
      "mean", "ex2", "varp", "sd", "z"), "anomalies")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("sec"), col(idCol)).rowsBetween(-n, -1)
    events
      .select(col(idCol), col(userCol),
        unix_timestamp(col(tsCol)).as("sec"),
        round(col(valueCol) * 100).cast("long").as("v100"))
      .withColumn("n_prior", count(lit(1)).over(w))
      .withColumn("s1", sum(col("v100")).over(w))
      .withColumn("s2", sum(col("v100") * col("v100")).over(w))
      .filter(col("n_prior") >= minPrior)
      .withColumn("mean",
        (col("s1").cast("double") / 100.0) / col("n_prior"))
      .withColumn("ex2",
        (col("s2").cast("double") / 10000.0) / col("n_prior"))
      .withColumn("varp", col("ex2") - col("mean") * col("mean"))
      .withColumn("sd",
        sqrt(when(col("varp") > 0, col("varp")).otherwise(0.0)))
      .withColumn("z", round(when(col("sd") === 0.0, 0.0)
        .otherwise((col("v100").cast("double") / 100.0 - col("mean"))
          / col("sd")), 4))
      .select(col(idCol), col(userCol), col("n_prior"), col("z"),
        (abs(col("z")) > zThreshold).as("is_anomaly"))
  }

  /** The operators stage internal columns on the inputs; a caller column
    * with one of these names would silently corrupt the result, so they
    * are refused up front.
    */
  private def requireNoReserved(df: DataFrame, names: Set[String],
                                op: String): Unit = {
    val clash = df.columns.filter(names.contains)
    require(clash.isEmpty,
      s"$op: input columns ${clash.mkString(", ")} collide with " +
        "operator-internal names — rename them first")
  }

  /** AS-OF join: for every left row, the single most recent right row
    * with `rightTs <= leftTs` in the same key group (the time-series
    * "latest value at event time" join — DuckDB/kdb `ASOF JOIN`,
    * pandas `merge_asof`).
    *
    * Spark-first shape: instead of a range-predicate join (which
    * Catalyst plans as a broadcast-nested-loop or a sort-merge with
    * per-row rescans), the two sides UNION into one relation tagged by
    * side, and ONE window pass per key carries the latest right payload
    * forward (`last(..., ignoreNulls)` over rows ordered by
    * (ts, side)). Cost: one hash shuffle on the key + one sort — the
    * same plan family as any windowed aggregation, linear in the data,
    * no pair blowup; skew is governed by the key exactly like a groupBy.
    * A right row sharing a left row's timestamp matches (<= semantics);
    * same-instant right rows resolve deterministically to the largest
    * `tieBreak` value.
    *
    * `rightCols` are the right-side payload columns carried onto each
    * left row; they come back null when no right row precedes it.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               rightCols: Seq[String],
               tieBreak: String = null,
               direction: String = "backward"): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin: no right payload columns")
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward or forward, got $direction")
    Seq(left, right).foreach(requireNoReserved(_,
      Set("_side", "_ts", "_tb"), "asofJoin"))
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(rightCols.contains),
      "asofJoin: right payload columns collide with left columns")
    val rTb = if (tieBreak == null) lit(0L) else col(tieBreak).cast("long")
    val lSel: Seq[Column] =
      Seq(col(keyCol), lit(1).as("_side"), col(leftTsCol).as("_ts"),
        lit(0L).as("_tb")) ++
        leftCols.filterNot(_ == keyCol).map(c => col(c)) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val rSel: Seq[Column] =
      Seq(col(keyCol), lit(0).as("_side"), col(rightTsCol).as("_ts"),
        rTb.as("_tb")) ++
        leftCols.filterNot(_ == keyCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c))
    val all = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    // right rows sort BEFORE left rows at equal ts (side 0 < 1) so the
    // boundary matches (<= backward, >= forward); among same-instant
    // right rows the largest tieBreak sorts last and wins the carry.
    // `forward` ("first right at or after") is the same walk over the
    // REVERSED time axis.
    val w = Window.partitionBy(keyCol)
      .orderBy(
        (if (direction == "backward") col("_ts").asc else col("_ts").desc),
        col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(all) { case (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select((leftCols.map(c => col(c)) ++ rightCols.map(c => col(c))): _*)
  }

  /** `merge_asof(direction="nearest")`: the right row with the SMALLEST
    * absolute time gap to each left row (ties → the earlier right row,
    * pandas' behavior). Composed from one backward and one forward pass
    * — still two union+window jobs sharing the same key shuffle shape,
    * no range join. The right timestamp is carried so the gap is
    * computable; pass it in `rightCols`.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keyCol: String,
                      leftTsCol: String, rightTsCol: String,
                      rightCols: Seq[String],
                      tieBreak: String = null): DataFrame = {
    require(rightCols.nonEmpty, "asofJoinNearest: no right payload columns")
    Seq(left, right).foreach(requireNoReserved(_,
      Set("_side", "_ts", "_tb", "_rts"), "asofJoinNearest"))
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(rightCols.contains),
      "asofJoinNearest: right payload columns collide with left columns")
    val rTb = if (tieBreak == null) lit(0L) else col(tieBreak).cast("long")
    val lSel: Seq[Column] =
      Seq(col(keyCol), lit(1).as("_side"), col(leftTsCol).as("_ts"),
        lit(0L).as("_tb")) ++
        leftCols.filterNot(_ == keyCol).map(c => col(c)) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val rSel: Seq[Column] =
      Seq(col(keyCol), lit(0).as("_side"), col(rightTsCol).as("_ts"),
        rTb.as("_tb")) ++
        leftCols.filterNot(_ == keyCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c))
    val all = left.select(lSel: _*).unionByName(right.select(rSel: _*))
      .withColumn("_rts", when(col("_side") === 0, col("_ts")))
    val bw = Window.partitionBy(keyCol)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fw = Window.partitionBy(keyCol)
      .orderBy(col("_ts").desc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (rightCols :+ "_rts").foldLeft(all) { case (df, c) =>
      df.withColumn(s"_b_$c", last(col(c), ignoreNulls = true).over(bw))
        .withColumn(s"_f_$c", last(col(c), ignoreNulls = true).over(fw))
    }
    val bGap = abs(col("_ts").cast("long") - col("_b__rts").cast("long"))
    val fGap = abs(col("_ts").cast("long") - col("_f__rts").cast("long"))
    // backward wins ties (the earlier right row, pandas' behavior); a
    // side with no match loses
    val useB = col("_b__rts").isNotNull &&
      (col("_f__rts").isNull || bGap <= fGap)
    val out = rightCols.foldLeft(carried) { case (df, c) =>
      df.withColumn(c, when(useB, col(s"_b_$c")).otherwise(col(s"_f_$c")))
    }
    out.filter(col("_side") === 1)
      .select((leftCols.map(c => col(c)) ++ rightCols.map(c => col(c))): _*)
  }

  /** BAND (range-window) join: every (left, right) pair in the same key
    * group whose timestamps differ by at most `maxGap` (inclusive, in
    * the ts columns' units — pass epoch seconds/millis, not raw
    * timestamps). The naive formulation is an inequality join Catalyst
    * can only plan as a nested loop; here both sides bucket by
    * `ts div maxGap` and the RIGHT side replicates into its own and both
    * neighboring buckets, making the join a plain EQUI-join on
    * (key, bucket) with a post-filter — any qualifying pair shares a
    * bucket with one of the three right copies, and pair work is bounded
    * by per-bucket density, never |L|×|R|. Timestamps must be
    * non-negative (`div` truncation).
    */
  def bandJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               maxGap: Long): DataFrame = {
    require(maxGap > 0, "bandJoin: maxGap must be positive")
    Seq(left, right).foreach(requireNoReserved(_, Set("_b", "_b0"),
      "bandJoin"))
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => c != keyCol && right.columns.contains(c)),
      "bandJoin: column names collide across sides (rename first)")
    val l = left.withColumn("_b",
      expr(s"CAST($leftTsCol AS BIGINT) div $maxGap"))
    val r = right.withColumn("_b0",
        expr(s"CAST($rightTsCol AS BIGINT) div $maxGap"))
      .withColumn("_b", explode(array(col("_b0") - 1, col("_b0"),
        col("_b0") + 1)))
      .drop("_b0")
    l.join(r, Seq(keyCol, "_b"))
      .filter(abs(col(leftTsCol).cast("long") -
        col(rightTsCol).cast("long")) <= maxGap)
      .drop("_b")
  }

  /** Skew-safe (salted) inner equi-join. A hash join's task holding a
    * hot key receives that key's ENTIRE left side; at 100 TB one
    * pathological key strands the stage on one executor. Here keys whose
    * left-side count exceeds `hotThreshold` (one bounded aggregation —
    * at most `maxHotKeys` survive, by count) get their left rows spread
    * across `salts` buckets by a deterministic row hash, while the RIGHT
    * side replicates its hot-key rows into every bucket; cold keys keep
    * salt 0 on both sides. The join is then a plain equi-join on
    * (key, salt) whose biggest task is ~1/salts of the hot key. The
    * result set is EXACTLY the unsalted join's (salting only re-buckets
    * rows), which is what the oracle checks. Complements AQE's skew
    * splitting by also working where AQE can't (e.g. below aggregates
    * that force a single partitioning).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keyCol: String,
                 salts: Int = 8, hotThreshold: Long = 100000L,
                 maxHotKeys: Int = 10000): DataFrame = {
    require(salts >= 2, "saltedJoin: salts >= 2")
    Seq(left, right).foreach(requireNoReserved(_,
      Set("_salt", "_hot", "_n"), "saltedJoin"))
    val hot = left.groupBy(keyCol).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > hotThreshold)
      .orderBy(col("_n").desc, col(keyCol))
      .limit(maxHotKeys)
      .select(col(keyCol), lit(true).as("_hot"))
    val l = left
      .join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("_salt",
        when(col("_hot").isNotNull,
          pmod(xxhash64(struct(left.columns.map(c => col(c)): _*)),
            lit(salts)).cast("int"))
          .otherwise(lit(0)))
      .drop("_hot")
    val r = right
      .join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("_salt",
        explode(when(col("_hot").isNotNull,
          sequence(lit(0), lit(salts - 1)))
          .otherwise(array(lit(0)))))
      .drop("_hot")
    l.join(r, Seq(keyCol, "_salt")).drop("_salt")
  }
}
