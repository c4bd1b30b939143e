package graft

import org.apache.spark.sql.functions._
import graft.text.Chunking

class ChunkingSpec extends SparkSpec {

  test("sequence_pack: contiguous global stream, boundary-independent") {
    import spark.implicits._
    val rows = Chunking.sequencePack(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // the stream is gapless and starts at 0: each doc begins exactly
    // where the previous one ended
    assert(rows.head._3 == 0L, "first doc must start at token 0")
    rows.sliding(2).foreach {
      case Array((_, n1, s1, _, _, _), (d2, _, s2, _, _, _)) =>
        assert(s2 == s1 + n1, s"gap before doc $d2: $s2 != ${s1 + n1}")
      case _ =>
    }
    // span arithmetic: first/last sequence and offset derive from
    // start_tok exactly
    rows.foreach { case (d, n, s, f, l, o) =>
      assert(f == s / Chunking.SeqLen && o == s % Chunking.SeqLen &&
        l == (s + n - 1) / Chunking.SeqLen, s"span arithmetic off for $d")
    }
    // partition-boundary independence: the two-pass prefix sum gives
    // the SAME global offsets at any partition count (incl. P=1, the
    // degenerate single-range case)
    val p1 = Chunking.sequencePackWith(spark, sf, 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val p5 = Chunking.sequencePackWith(spark, sf, 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(p1.toSeq == rows.toSeq && p5.toSeq == rows.toSeq)
  }

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
