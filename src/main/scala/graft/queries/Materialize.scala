package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** Persist a query result past the lifetime of the temp table that
  * backs it — the mutation-lifecycle queries (`MergeOps`,
  * `StockPipeline`) build a throwaway graft table, run DML against it,
  * and must return a frame that stays readable after the table's temp
  * directory is deleted.
  *
  * The obvious move — `collect()` + `parallelize` — is O(result) driver
  * memory and would be a scale-killer imitated at 100 TB, so instead
  * the result is written once to a JVM-lifetime temp parquet directory
  * and the LAZY read of that dump is returned: O(files) driver state,
  * distributed all the way through, and the downstream consumer
  * (Verify's parquet dump, a bench count) re-scans executor-side. The
  * dump directory lives under `java.io.tmpdir` for the JVM's lifetime
  * (same contract as StockPipeline's seed-42 bars dump) and is unique
  * per invocation, so concurrent queries never collide.
  */
object Materialize {

  /** Write `out` to a fresh temp parquet dir and return the lazy read.
    * The parquet roundtrip is type-exact for the lifecycle results
    * (long / double / string — no timestamp annotation drift). */
  def beyondSource(out: DataFrame, prefix: String): DataFrame = {
    val dump = graft.GraftTmp.dir(prefix).toString
    out.write.mode("overwrite").parquet(dump)
    out.sparkSession.read.parquet(dump)
  }
}
