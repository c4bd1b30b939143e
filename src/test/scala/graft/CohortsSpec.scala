package graft

import org.apache.spark.sql.functions._
import graft.queries.Cohorts

class CohortsSpec extends SparkSpec {
  import spark.implicits._

  test("funnel stages are monotone and stage-2 users really clicked after viewing") {
    val stages = Cohorts.funnelSteps(spark, sf)
      .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(stages("1_view") >= stages("2_click_after_view"))
    assert(stages("2_click_after_view") >= stages("3_purchase_after_click"))
    assert(stages("1_view") > 0)
    // independent recheck of stage 2 on one user: first click strictly
    // after first view
    val e = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)].collect().groupBy(_._1)
    val expect2 = e.count { case (_, evs) =>
      val v = evs.filter(_._2 == "view").map(_._3)
      v.nonEmpty && evs.exists(x => x._2 == "click" && x._3 > v.min)
    }
    assert(stages("2_click_after_view") == expect2)
  }

  test("retention offset 0 equals cohort size; counts never exceed it") {
    val df = Cohorts.retentionCohorts(spark, sf).cache()
    val day0 = df.filter(col("offset") === 0)
      .select("cohort_day", "n_users").as[(java.sql.Date, Long)].collect().toMap
    // every user is active on their own cohort day by construction
    val cohortSizes = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id").agg(min("day").as("cohort_day"))
      .groupBy("cohort_day").agg(count(lit(1)).as("n"))
      .as[(java.sql.Date, Long)].collect().toMap
    assert(day0 == cohortSizes)
    val tooBig = df.join(
        df.filter(col("offset") === 0)
          .select(col("cohort_day"), col("n_users").as("n0")), "cohort_day")
      .filter(col("n_users") > col("n0"))
    assert(tooBig.count() == 0)
  }
}
