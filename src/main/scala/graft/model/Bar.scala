package graft.model

import org.apache.spark.sql.types._

/** The stock-bar row type — mirrors the reference's STOCK_SCHEMA
  * (stock_harvester.py:51-61): minute OHLCV with nullable numerics
  * (null-safe API coercion, stock_harvester.py:87-94) and a non-null
  * ticker. The three derived columns (event_time_utc, event_time_ny,
  * trade_date — stock_harvester.py:160-163) are added by
  * [[graft.transform.Enrich]], not stored here.
  */
final case class Bar(
    ticker: String,
    open: Option[Double],
    high: Option[Double],
    low: Option[Double],
    close: Option[Double],
    volume: Option[Long],
    vwap: Option[Double],
    timestamp_ms: Option[Long],
    num_transactions: Option[Int])

object Bar {
  /** Explicit StructType, declared not inferred — the reference's schema
    * discipline (stock_harvester.py:51-61). */
  val schema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("open", DoubleType, nullable = true),
    StructField("high", DoubleType, nullable = true),
    StructField("low", DoubleType, nullable = true),
    StructField("close", DoubleType, nullable = true),
    StructField("volume", LongType, nullable = true),
    StructField("vwap", DoubleType, nullable = true),
    StructField("timestamp_ms", LongType, nullable = true),
    StructField("num_transactions", IntegerType, nullable = true)))

  /** The reference's 8 tickers (stock_harvester.py:43). */
  val Tickers: Seq[String] =
    Seq("AAPL", "MSFT", "GOOGL", "AMZN", "TSLA", "META", "NVDA", "JPM")
}
