package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-pack query maps; `oracleSql` carries a
  * DuckDB-equivalent SQL string for every SQL-expressible query (same column
  * names, same total ordering). Approximate / stateful operators (MinHash,
  * LSH, maintenance commands, streaming) omit the oracle → rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Analytics.dailySummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Analytics.queries ++
      graft.queries.Joins.queries ++
      graft.queries.MultiJoins.queries ++
      graft.queries.TpchClassics.queries ++
      graft.queries.TpchAdvanced.queries ++
      graft.queries.Windows.queries ++
      graft.queries.Ranking.queries ++
      graft.queries.Stats.queries ++
      graft.queries.TimeSeries.queries ++
      graft.queries.Sampling.queries ++
      graft.queries.Cohorts.queries ++
      graft.queries.StockPipeline.queries ++
      graft.text.TextAnalysis.queries ++
      graft.text.QualityFilters.queries ++
      graft.text.Chunking.queries ++
      graft.text.HeavyHitters.queries ++
      graft.text.Safety.queries ++
      graft.text.Repetition.queries ++
      graft.text.Classifier.queries ++
      graft.dedup.Dedup.queries ++
      graft.similarity.Similarity.queries ++
      graft.similarity.HybridSearch.queries ++
      graft.queries.Relational.queries ++
      graft.queries.MergeOps.queries ++
      graft.queries.SqlInterface.queries ++
      graft.queries.Sessionize.queries ++
      graft.queries.IoAndScalars.queries ++
      graft.queries.Profiling.queries ++
      graft.queries.Indexing.queries ++
      graft.table.Bucketing.queries ++
      graft.streaming.Streaming.queries ++
      graft.multimodal.Media.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Analytics.oracles ++
      graft.queries.Joins.oracles ++
      graft.queries.MultiJoins.oracles ++
      graft.queries.TpchClassics.oracles ++
      graft.queries.TpchAdvanced.oracles ++
      graft.queries.Windows.oracles ++
      graft.queries.Ranking.oracles ++
      graft.queries.Stats.oracles ++
      graft.queries.TimeSeries.oracles ++
      graft.queries.Sampling.oracles ++
      graft.queries.Cohorts.oracles ++
      graft.queries.StockPipeline.oracles ++
      graft.text.TextAnalysis.oracles ++
      graft.text.QualityFilters.oracles ++
      graft.text.Chunking.oracles ++
      graft.text.HeavyHitters.oracles ++
      graft.text.Safety.oracles ++
      graft.text.Repetition.oracles ++
      graft.text.Classifier.oracles ++
      graft.dedup.Dedup.oracles ++
      graft.similarity.Similarity.oracles ++
      graft.similarity.HybridSearch.oracles ++
      graft.queries.Relational.oracles ++
      graft.queries.MergeOps.oracles ++
      graft.queries.SqlInterface.oracles ++
      graft.queries.Sessionize.oracles ++
      graft.queries.IoAndScalars.oracles ++
      graft.queries.Profiling.oracles ++
      graft.queries.Indexing.oracles ++
      graft.table.Bucketing.oracles ++
      graft.streaming.Streaming.oracles ++
      graft.multimodal.Media.oracles
}
