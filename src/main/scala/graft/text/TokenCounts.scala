package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term-frequency map computed inside the scan — the
  * in-row twin of
  * `explode(split(lower(trim(text)), "\\s+")) → groupBy(doc_id, word).count()`,
  * which is the tf census every lexical operator (bm25, tf-idf) starts
  * from. A document's tokens all live in one row, so counting them never
  * needed a cluster-wide exchange: the explode→groupBy form shuffles the
  * corpus's ENTIRE token stream just to bring equal (doc_id, word) pairs
  * together, where this kernel counts them in the row and the downstream
  * explode emits the already-unique (doc_id, word, tf) relation with no
  * exchange at all (optimization guide §2.4 "remove shuffles outright" /
  * §2.3 "aggregate before you shuffle").
  *
  * Equality with the explode pipeline is exact and spec-pinned: same
  * trim (0x20 only — UTF8String.trim, what StringTrim calls), same lower
  * (UTF8String.toLowerCase, what Lower calls), same split (Java regex
  * `\s+`, limit −1 — what StringSplit compiles), empty tokens dropped
  * like the pipeline's `word =!= ""` filter, counts as longs like
  * `count(lit(1))`. */
object TokenCountsKernel {
  def counts(s: UTF8String): MapData = {
    val toks = s.trim().toLowerCase().toString.split("\\s+", -1)
    val m = new java.util.LinkedHashMap[String, java.lang.Long](
      math.max(8, toks.length * 2))
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      if (!w.isEmpty) {
        val c = m.get(w)
        m.put(w, if (c == null) 1L else c.longValue() + 1L)
      }
      i += 1
    }
    val n = m.size()
    val keys = new Array[AnyRef](n)
    val vals = new Array[Long](n)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue.longValue()
      j += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

/** string → map<word, tf> over whitespace tokens (trim+lower first). */
case class TokenCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TokenCountsKernel.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TokenCountsKernel.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

object TokenCounts {
  import org.apache.spark.sql.graft.ColumnBridge

  def token_counts(c: Column): Column =
    ColumnBridge.column(TokenCounts(ColumnBridge.expression(c)))
}
