package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's derived-column chain (P2–P5, stock_harvester.py:160-163):
  * epoch ms → UTC timestamp → New York wall time → trade date.
  *
  * The NY conversion is the semantic heart of the pipeline: late-session
  * trades near midnight UTC must land on the *US-market* calendar day, not
  * the UTC one (stock_harvester.py:154-159; DESIGN.md:43-46 shows the naive
  * UTC derivation the code superseded). `trade_date` is also the partition
  * column, so deriving it eagerly keeps predicates sargable
  * (DESIGN.md:27-33) — a `WHERE trade_date = …` prunes partitions without
  * wrapping `timestamp_ms` in casts.
  *
  * timestamp_millis() is used instead of `(ms/1000).cast("timestamp")`:
  * identical semantics for epoch input, but exact long arithmetic (no
  * double rounding) and ANSI-safe.
  */
object Enrich {

  val NyZone = "America/New_York"

  def withTimeColumns(df: DataFrame): DataFrame =
    df.withColumn("event_time_utc", timestamp_millis(col("timestamp_ms")))
      .withColumn("event_time_ny", from_utc_timestamp(col("event_time_utc"), NyZone))
      .withColumn("trade_date", to_date(col("event_time_ny")))
}
