package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions —
  * the standard technique for third-party Catalyst extensions (the
  * conversions are public at the bytecode level; only the Scala access
  * modifier narrows them). Keeps all other graft code out of Spark's
  * namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a streaming-tagged DataFrame from a batch plan's InternalRow
    * RDD — what every DSv1 streaming Source returns from `getBatch`
    * (`internalCreateDataFrame` is public bytecode, `private[sql]` in
    * Scala only). */
  def streamingDataFrame(session: org.apache.spark.sql.classic.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    session.internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Re-plan a micro-batch's streaming-tagged DataFrame as a BATCH frame
    * over the same InternalRow RDD — what a DSv1 streaming Sink must do
    * before handing the batch to a batch writer (executing the streaming
    * frame directly throws UnsupportedOperationChecker). */
  def batchDataFrame(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
        .queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
