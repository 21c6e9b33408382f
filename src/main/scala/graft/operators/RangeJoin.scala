package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Interval (range) join via time-binning. Spark plans a plain
  * `point BETWEEN start AND end` join as a broadcast-nested-loop or
  * cartesian — O(n·m) compares, hopeless at corpus scale. Binning makes
  * it an EQUI join: every interval of length ≤ W lands in at most two
  * W-wide time bins, every point in exactly one, so joining on
  * (key, bin) and re-checking the exact range bounds visits only pairs
  * whose bins collide — the standard interval-bucketing rewrite of a
  * band join, with candidate cardinality ∝ temporal co-location, not
  * n·m.
  */
object RangeJoin {

  /** q21: attribute purchase events to the 1-hour window opened by the
    * same user's signup events ([signup, signup + windowSec)). Returns
    * one row of funnel-style attribution totals.
    */
  def purchasesInSignupWindows(t: Tables, windowSec: Long = 3600): DataFrame = {
    val ev = t.events.select(col("user_id"), col("event_id"), col("event_type"),
      unix_timestamp(col("ts")).as("es"))
    val intervals = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
        col("es").as("start"), (col("es") + windowSec).as("end"))
      // an interval of length windowSec overlaps at most 2 bins of that width
      .withColumn("bin", explode(array_distinct(array(
        floor(col("start") / windowSec), floor(col("end") / windowSec)))))
    val points = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("es"))
      .withColumn("bin", floor(col("es") / windowSec))
    intervals
      .join(points, Seq("user_id", "bin"))
      .filter(col("es") >= col("start") && col("es") < col("end"))
      .select(col("signup_id"), col("purchase_id"))
      .distinct() // the two-bin explode can surface a pair twice
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("purchase_id")).as("n_purchases_matched"),
        countDistinct(col("signup_id")).as("n_signups_matched"))
  }
}
