package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream — the standard
  * product-analytics primitive: for each user, the first time of
  * stage 1, the first stage-2 event STRICTLY after it, and so on;
  * `stage` counts how deep the user got. Out-of-order events do not
  * count (a click before the first view is not funnel progress), and
  * the first-qualifying-time rule makes the result deterministic and
  * exactly replayable (min over timestamps per stage, no
  * session/attribution heuristics to pin).
  *
  * Shape at 100 TB: stage k is one filtered scan + hash aggregation +
  * join, ALL keyed on the user column — after the first shuffle every
  * stage reuses the same hash partitioning (Exchange reuse /
  * co-partitioned joins), and the per-stage frames are ≤ one row per
  * user. No window over the event stream, so a hot user's million
  * events collapse map-side in the min() partial. */
object Funnel {

  /** Funnel over `events(userCol, typeCol, tsCol)` through `stages`
    * (event-type values, in order). Output: one row per distinct
    * user — (user_id, t1..tN, stage) where tK is the first stage-K
    * time strictly after t(K-1), NULL once the user drops out, and
    * stage ∈ [0, N] is the reached depth.
    *
    * `maxGapMs` is the CONVERSION WINDOW, the standard
    * product-analytics parameter: stage K must occur within
    * `maxGapMs` of stage K-1 (t(K-1) < tK ≤ t(K-1) + maxGapMs); the
    * first stage is unbounded (no predecessor). First-qualifying-time
    * semantics are preserved — tK is the min qualifying time UNDER
    * the gap constraint, so a user is never "rescued" by a later
    * in-window event once an earlier stage time is fixed. */
  def funnel(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "tms", maxGapMs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapMs.forall(_ >= 1), s"maxGapMs must be >= 1, got $maxGapMs")
    val ev = events.select(col(userCol).as("user_id"),
      col(typeCol).as("et"), col(tsCol).as("tms"))
    var acc = ev.select(col("user_id")).distinct()
    var prevT: Option[String] = None
    stages.zipWithIndex.foreach { case (st, i) =>
      val name = s"t${i + 1}"
      val stageEv = ev.where(col("et") === st)
      val qualified = prevT match {
        case None => stageEv
        case Some(p) =>
          val after = stageEv
            .join(acc.where(col(p).isNotNull).select(col("user_id"), col(p)),
              Seq("user_id"))
            .where(col("tms") > col(p))
          maxGapMs match {
            case Some(g) => after.where(col("tms") <= col(p) + g)
            case None    => after
          }
      }
      val mins = qualified.groupBy("user_id").agg(min(col("tms")).as(name))
      acc = acc.join(mins, Seq("user_id"), "left")
      prevT = Some(name)
    }
    val stage = stages.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("stage", stage.cast("int"))
  }

  /** COHORT RETENTION — the third leg of the product-analytics triad
    * next to funnels and sessions: users are cohorted by the period
    * of their FIRST event (`cohort = floor(min(ts) / periodMs)`), and
    * each (cohort, period_offset) row counts the cohort's users
    * active `offset` periods later. All floor-integer arithmetic —
    * the DuckDB twin replays it exactly; offset 0 rows give cohort
    * sizes, so rates are a downstream division the caller owns
    * (ratios are presentation, counts are the data).
    *
    * Shape at 100 TB: one min() hash aggregation per user (map-side
    * partials collapse a hot user's events), one distinct over
    * (user, period) — both shuffle on the user key and the join
    * reuses that partitioning — then a #cohorts×#offsets-row rollup.
    * No window over the event stream. */
  def retention(events: DataFrame, periodMs: Long,
      userCol: String = "user_id", tsCol: String = "tms"): DataFrame = {
    require(periodMs >= 1, s"periodMs must be >= 1, got $periodMs")
    val ev = events.select(col(userCol).as("user_id"), col(tsCol).as("tms"))
    val cohort = ev.groupBy("user_id")
      .agg(expr(s"min(tms) div $periodMs").as("cohort"))
    val active = ev
      .select(col("user_id"), expr(s"tms div $periodMs").as("period"))
      .distinct()
    active.join(cohort, Seq("user_id"))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
