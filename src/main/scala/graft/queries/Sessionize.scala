package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Typed sessionization via KeyValueGroupedDataset.flatMapGroups — the
  * Dataset[T] path for per-key stateful logic the reference never needed
  * (SURVEY.md §2.7 UDF/stateful gap). Events of one user sort by time in
  * memory (bounded per key) and split into sessions at >30-minute gaps.
  * The same semantics are SQL-expressible (lag + windowed cumsum), which
  * is exactly what the DuckDB oracle does — so the typed path is
  * cross-checked against an independent relational formulation.
  *
  * Scale: one shuffle on user_id; per-group memory is one user's events.
  * For keys too hot for that, the lag+cumsum window formulation (see the
  * oracle) is the drop-in alternative with identical output.
  */
object Sessionize {

  val GapUs: Long = 30L * 60 * 1000000 // 30 min in microseconds

  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (user: Long, it: Iterator[(Long, Long, Long)]) =>
        val evs = it.toArray.sortBy(e => (e._2, e._3))
        var session = 0
        var prev = Long.MinValue
        val out = Seq.newBuilder[(Long, Int, Long, Long)]
        var start = 0L
        var n = 0
        def flush(end: Long): Unit =
          if (n > 0) out += ((user, session, n.toLong, end - start))
        evs.foreach { case (_, ts, _) =>
          if (prev != Long.MinValue && ts - prev > GapUs) {
            flush(prev); session += 1; n = 0
          }
          if (n == 0) start = ts
          n += 1; prev = ts
        }
        flush(prev)
        out.result()
      }
      .toDF("user_id", "session_id", "n_events", "duration_us")
      .orderBy("user_id", "session_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sessionize" -> sessionize _)

  val oracles: Map[String, String] = Map(
    "sessionize" ->
      """WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM x)
        |SELECT user_id, CAST(session_id AS INTEGER) AS session_id,
        |       COUNT(*) AS n_events,
        |       MAX(ts_us) - MIN(ts_us) AS duration_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)
}
