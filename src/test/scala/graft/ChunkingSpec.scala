package graft

import org.apache.spark.sql.functions._
import graft.text.Chunking

class ChunkingSpec extends SparkSpec {

  test("chunk counts, sizes, and overlap arithmetic") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = Chunking.docChunks(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq

    val perDoc = chunks.groupBy(_._1)
    assert(perDoc.keySet == docs.keySet)
    perDoc.foreach { case (doc, cs) =>
      val len = docs(doc)
      // starts 0, stride, … < len → ceil(len / stride) chunks
      assert(cs.size == (len - 1) / Chunking.ChunkStride + 1, s"doc $doc")
      // all full-size except possibly the tail chunks
      assert(cs.forall(_._3 <= Chunking.ChunkChars))
      val lastStart = (cs.size - 1) * Chunking.ChunkStride
      assert(cs.maxBy(_._2)._3 == math.min(Chunking.ChunkChars, len - lastStart))
    }
  }

  test("packs respect the token budget except single-chunk overflow") {
    val packs = Chunking.contextPack(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packs.nonEmpty)
    // contiguous fill: a pack only exceeds the budget by at most the
    // final chunk that crossed the boundary
    val maxChunkTokens = (Chunking.ChunkChars + 3) / 4
    packs.foreach { case (_, _, _, tokens) =>
      assert(tokens <= Chunking.PackTokens + maxChunkTokens)
    }
    // pack ids are dense per shard
    packs.groupBy(_._1).foreach { case (_, ps) =>
      val ids = ps.map(_._2).sorted.toList
      assert(ids == List.range(0L, ids.size.toLong))
    }
  }
}
