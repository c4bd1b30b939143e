package graft.text

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Misra–Gries heavy hitters — the frequent-items sketch for streams too
  * large to count exactly: each partition keeps at most k counters
  * (bounded memory regardless of vocabulary size), partial summaries
  * merge associatively, and every item with true frequency > n/k is
  * guaranteed to survive with its count underestimated by at most n/k.
  * The exact groupBy top-k (explode_words) shuffles every distinct word;
  * this shuffles k counters per partition — the 100 TB trade.
  *
  * Sketch contents depend on within-partition fold order → rows-only;
  * HeavyHittersSpec pins the MG guarantees against exact counts.
  */
object HeavyHitters {

  val K = 50

  /** Misra–Gries summary over string keys, capacity k. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {

    def zero: Map[String, Long] = Map.empty

    def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
      if (buf.contains(item)) buf.updated(item, buf(item) + 1L)
      else if (buf.size < k) buf.updated(item, 1L)
      else buf.flatMap { case (w, c) => // decrement-all step
        if (c > 1L) Some(w -> (c - 1L)) else None
      }

    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val combined = y.foldLeft(x) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest count, drop non-positive
        val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
        combined.flatMap { case (w, c) =>
          if (c > cut) Some(w -> (c - cut)) else None
        }
      }
    }

    def finish(buf: Map[String, Long]): Map[String, Long] = buf

    def bufferEncoder: Encoder[Map[String, Long]] = MisraGries.mapEncoder
    def outputEncoder: Encoder[Map[String, Long]] = MisraGries.mapEncoder
  }

  object MisraGries {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val mapEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  }

  /** Frequent words via sketch-then-verify: the MG pass yields at most
    * K candidate words (a guaranteed SUPERSET of every word with true
    * frequency > n/K — bounded memory, k counters per partition, no
    * full-vocabulary shuffle), then one exact recount of ONLY the
    * candidates keeps those that truly clear the threshold. The output
    * is therefore the EXACT heavy-hitter set with exact counts —
    * deterministic despite the fold-order-defined sketch contents, so
    * DuckDB hash-verifies it (and would catch a sketch losing a
    * guaranteed survivor). Integer threshold (count·K > n) avoids any
    * float boundary. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = new MisraGries(K)
    val words = documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]{2,}$"))
    // per-partition MG summaries merged as a TREE (treeAggregate depth
    // 2): at thousands of partitions no single task (or the driver)
    // merges them all — each level combines √P sketches of K counters
    val sketch = words.as[String].rdd.treeAggregate(agg.zero)(
      seqOp = (buf, w) => agg.reduce(buf, w),
      combOp = (x, y) => agg.merge(x, y),
      depth = 2)
    val candidates = sketch.keys.toSeq
    // the corpus token total rides the plan as a broadcast one-row
    // frame (the bm25/collocations scalar shape, r12): the eager
    // words.count() it replaces ran an extra tokenize pass of the
    // corpus before the recount job. The sketch pass above is the one
    // unavoidable pre-plan job — it must finish to know the candidate
    // list the recount filters on.
    val total = words.select(count(lit(1)).as("n_tok"))
    words.filter(col("word").isin(candidates: _*))
      .groupBy("word").agg(count(lit(1)).as("exact_count"))
      .crossJoin(broadcast(total))
      .filter(col("exact_count") * K > col("n_tok"))
      .drop("n_tok")
      .orderBy(desc("exact_count"), col("word"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "heavy_hitters" -> heavyHitters _)

  val oracles: Map[String, String] = Map(
    "heavy_hitters" ->
      s"""WITH w AS (
         |  SELECT word FROM (
         |    SELECT unnest(string_split(lower(text), ' ')) AS word
         |    FROM documents)
         |  WHERE regexp_matches(word, '^[a-z]{2,}$$')),
         |n AS (SELECT COUNT(*) AS total FROM w),
         |c AS (SELECT word, COUNT(*) AS exact_count FROM w GROUP BY 1)
         |SELECT c.word, c.exact_count FROM c, n
         |WHERE c.exact_count * $K > n.total
         |ORDER BY c.exact_count DESC, c.word""".stripMargin)
}
