package graft.ingest

import java.time.{DayOfWeek, Instant, LocalDate, LocalTime, ZoneId}

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Bar

/** Synthetic replacement for the reference's Polygon.io REST source
  * (S1/S2, stock_harvester.py:64-97,120-143). The environment has zero
  * egress, so the HTTP fetch becomes a deterministic seeded generator with
  * the same output schema, nullability, and paging/rate-limit seams:
  *
  *  - [[FetchClient]] abstracts the per-(ticker, day) "request"; the
  *    production path would be an HTTP GET, tests inject failures;
  *  - [[RateLimiter]] reproduces the 13 s inter-call delay and the
  *    60 s retry-once-on-429 semantics (stock_harvester.py:48-49,131-134)
  *    against an injectable clock, so the retry logic is unit-testable
  *    without real sleeps;
  *  - results accumulate across tickers and become ONE DataFrame with an
  *    explicit schema (write-once atomicity, stock_harvester.py:117-152 —
  *    bug-fix #1 of the reference, DESIGN.md:12-14).
  *
  * Bars cover 09:30–16:00 America/New_York (regular session) plus an
  * extended block to 20:00 ET whose late bars land past midnight UTC —
  * exercising the reference's timezone-edge rationale
  * (stock_harvester.py:154-159). ~2 % of numeric fields are null,
  * mirroring the null-safe coercion boundary (stock_harvester.py:87-94).
  */
object BarSource {

  /** Injectable clock+sleep pair (production: real time; tests: virtual). */
  trait Sleeper {
    def nowMs(): Long
    def sleepMs(ms: Long): Unit
  }
  object SystemSleeper extends Sleeper {
    def nowMs(): Long = System.currentTimeMillis()
    def sleepMs(ms: Long): Unit = Thread.sleep(ms)
  }

  /** One "API page" of bars, or a rate-limit signal. */
  sealed trait FetchResult
  final case class Page(bars: Seq[Bar]) extends FetchResult
  case object RateLimited extends FetchResult
  final case class FetchError(msg: String) extends FetchResult

  trait FetchClient {
    def fetch(ticker: String, day: LocalDate): FetchResult
  }

  /** Rate-limit + retry loop — the S2 semantics: sleep `delayMs` between
    * calls; on RateLimited sleep `backoffMs` and retry once; on error log
    * and skip (stock_harvester.py:123-137). */
  final class RateLimiter(
      client: FetchClient,
      sleeper: Sleeper,
      delayMs: Long = 13000,
      backoffMs: Long = 60000) {

    def fetchAll(tickers: Seq[String], days: Seq[LocalDate]): (Seq[Bar], Seq[String]) = {
      val errors = Seq.newBuilder[String]
      val bars = Seq.newBuilder[Bar]
      var first = true
      for (t <- tickers; d <- days) {
        if (!first) sleeper.sleepMs(delayMs)
        first = false
        client.fetch(t, d) match {
          case Page(b) => bars ++= b
          case RateLimited =>
            sleeper.sleepMs(backoffMs)
            client.fetch(t, d) match {
              case Page(b) => bars ++= b
              case _ => errors += s"$t/$d: rate-limited twice, skipped"
            }
          case FetchError(m) => errors += s"$t/$d: $m"
        }
      }
      (bars.result(), errors.result())
    }
  }

  private val NY = ZoneId.of("America/New_York")

  /** Deterministic per-(ticker, day) bar generator — the test FetchClient.
    * A splitmix-style hash keys the stream so order of fetches is
    * irrelevant to content. */
  final class SyntheticClient(seed: Long, nullRate: Double = 0.02) extends FetchClient {
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    def fetch(ticker: String, day: LocalDate): FetchResult = {
      if (day.getDayOfWeek == DayOfWeek.SATURDAY || day.getDayOfWeek == DayOfWeek.SUNDAY)
        return Page(Nil)
      val base = mix(seed ^ ticker.hashCode.toLong ^ day.toEpochDay)
      val basePrice = 50.0 + (Math.floorMod(base, 40000L) / 100.0) // 50.00–449.99
      val open930 = day.atTime(LocalTime.of(9, 30)).atZone(NY).toInstant
      val bars = Seq.newBuilder[Bar]
      // 390 regular minutes + 240 extended minutes (16:00–20:00 ET; the
      // last ~1 h lands on the next UTC calendar day in winter months)
      for (i <- 0 until 630) {
        val r = mix(base + i)
        def unit(k: Int): Double = // uniform [0,1) from hashed lanes
          (Math.floorMod(mix(r + k), 1000000L)) / 1000000.0
        val ts = open930.plusSeconds(i * 60L)
        val drift = (unit(1) - 0.5) * 2.0
        val o = Math.rint((basePrice + drift) * 100) / 100
        val c = Math.rint((o + (unit(2) - 0.5)) * 100) / 100
        val h = Math.max(o, c) + Math.rint(unit(3) * 50) / 100
        val l = Math.min(o, c) - Math.rint(unit(4) * 50) / 100
        val vol = 1000L + Math.floorMod(r, 9000L)
        val vw = Math.rint((o + c) / 2 * 100) / 100
        def maybe[A](k: Int, v: A): Option[A] =
          if (unit(k + 10) < nullRate) None else Some(v)
        bars += Bar(
          ticker = ticker,
          open = maybe(1, o), high = maybe(2, Math.rint(h * 100) / 100),
          low = maybe(3, Math.rint(l * 100) / 100), close = maybe(4, c),
          volume = maybe(5, vol), vwap = maybe(6, vw),
          timestamp_ms = Some(ts.toEpochMilli),
          num_transactions = maybe(7, (vol / 100).toInt))
      }
      Page(bars.result())
    }
  }

  /** Harvest entry point: fetch all tickers × days through the rate
    * limiter, then build ONE DataFrame with the explicit schema (S3,
    * stock_harvester.py:152). Driver-side accumulation is the reference's
    * design; at real scale the fetch itself would be distributed
    * (mapPartitions over a ticker×day task list), which
    * [[distributedHarvest]] demonstrates. */
  def harvest(
      spark: SparkSession,
      tickers: Seq[String] = Bar.Tickers,
      days: Seq[LocalDate] = tradingDays(LocalDate.of(2024, 1, 8), 5),
      seed: Long = 42L,
      sleeper: Sleeper = SystemSleeper,
      delayMs: Long = 0): DataFrame = {
    val limiter = new RateLimiter(new SyntheticClient(seed), sleeper, delayMs = delayMs)
    val (bars, _) = limiter.fetchAll(tickers, days)
    import spark.implicits._
    spark.createDataset(bars).toDF()
  }

  /** Scale path: the (ticker, day) task grid is parallelized so each
    * executor fetches its own slice — no driver-side accumulation. */
  def distributedHarvest(
      spark: SparkSession,
      tickers: Seq[String],
      days: Seq[LocalDate],
      seed: Long): DataFrame = {
    import spark.implicits._
    val grid = for (t <- tickers; d <- days) yield (t, d.toEpochDay)
    spark.createDataset(grid)
      .repartition(Math.min(grid.size, 32))
      .flatMap { case (t, epochDay) =>
        new SyntheticClient(seed).fetch(t, LocalDate.ofEpochDay(epochDay)) match {
          case Page(bars) => bars
          case _ => Nil
        }
      }
      .toDF()
  }

  /** Weekday sequence of length n starting at `from` (trading calendar
    * minus holidays — the reference uses a plain days_back window,
    * stock_harvester.py:109-112). */
  def tradingDays(from: LocalDate, n: Int): Seq[LocalDate] =
    Iterator.iterate(from)(_.plusDays(1))
      .filter(d => d.getDayOfWeek != DayOfWeek.SATURDAY && d.getDayOfWeek != DayOfWeek.SUNDAY)
      .take(n).toSeq
}
