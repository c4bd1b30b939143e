package graft

import org.apache.spark.sql.functions._
import graft.queries.Salting

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed fixture") {
    // hot key: 90% of big-side rows share key 1
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 100 else 1L, i.toLong))
      .toDF("k", "payload")
    val small = (0L to 99L).map(k => (k, s"dim_$k")).toDF("sk", "name")
    val plain = big.join(small, col("k") === col("sk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val salted = Salting.saltedJoin(big, small, "k", "sk", 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salt spreads the hot key across all n buckets") {
    val big = (1 to 5000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val spread = big.withColumn("s", Salting.salt(big.columns.map(col).toSeq, 8))
      .groupBy("s").count().count()
    assert(spread == 8)
  }
}

class TrigramPackSpec extends SparkSpec {
  import spark.implicits._

  test("packed trigrams decode to the naive substring formulation") {
    val df = Seq((1L, "hello spark"), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val packed = df.select(col("doc_id"),
      explode(graft.text.TrigramPack.trigrams_packed(col("text"))).as("tg"))
      .select(col("doc_id"), concat(
        char(shiftright(col("tg"), 16).bitwiseAND(lit(255))),
        char(shiftright(col("tg"), 8).bitwiseAND(lit(255))),
        char(col("tg").bitwiseAND(lit(255)))).as("trigram"))
    val naive = df.select(col("doc_id"), explode(expr(
      "transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3))"))
      .as("trigram")).filter(length(col("trigram")) === 3)
    assert(packed.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(packed).count() == 0)
  }
}
