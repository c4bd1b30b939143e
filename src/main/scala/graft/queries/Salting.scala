package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-join salting (SURVEY.md §4 / builder mandate "salting for skew").
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one key dominates so heavily that even split
  * partitions bottleneck, or when AQE is unavailable (streaming joins).
  *
  * `saltedJoin(big, small, key, n)`: the big side gets a deterministic
  * salt in [0, n) from its row content; the small side is replicated n
  * times with every salt value. The join key becomes (key, salt), so the
  * hot key's rows spread across n reducers instead of one.
  */
object Salting {

  /** Deterministic per-row salt: hash of all columns modulo n. The salt
    * must NOT be derived from the join key alone (that would keep all
    * hot-key rows together — the thing salting exists to prevent). */
  def salt(allCols: Seq[Column], n: Int): Column =
    pmod(hash(allCols: _*), lit(n))

  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, n: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      salt(big.columns.map(col).toSeq, n))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    saltedBig.join(saltedSmall,
        col(bigKey) === col(smallKey) && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
