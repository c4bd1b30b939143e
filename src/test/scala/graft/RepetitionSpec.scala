package graft

import graft.text.{Classifier, Repetition}

/** Driver-side recounts for the Gopher repetition signals and the
  * hashed-linear classifier — the within-JVM mirror of the DuckDB
  * oracles, so a hash mismatch at verify time can be triaged to
  * engine-vs-engine rather than definition drift. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def words(text: String): Array[String] =
    text.trim.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty)

  test("gopher_repetition matches a driver-side recount on every doc") {
    val got = Repetition.gopherRepetition(spark, sf).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    }.toMap
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    var sawDup5 = false
    docs.foreach { case (id, text) =>
      val ws = words(text)
      if (ws.isEmpty) assert(!got.contains(id))
      else {
        val totalChars = ws.map(_.length.toLong).sum
        val g2 = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
        val c2 = g2.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val top2n = if (c2.isEmpty) 0L else c2.values.max
        val top2chars =
          if (c2.isEmpty) 0L
          else top2n * c2.collect { case (g, n) if n == top2n => g.length - 1 }.min
        val g5 = ws.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toArray
        val c5 = g5.groupBy(identity).view.mapValues(_.size).toMap
        val dupStart = g5.zipWithIndex.collect {
          case (g, i) if c5(g) > 1 => i
        }.toSet
        val dup5chars = ws.indices.collect {
          case p if (math.max(0, p - 4) to p).exists(s =>
            s <= ws.length - 5 && dupStart(s)) => ws(p).length.toLong
        }.sum
        if (dup5chars > 0) sawDup5 = true
        val keep = top2chars * 5 <= totalChars && dup5chars * 20 <= totalChars * 3
        assert(got(id) == ((ws.length.toLong, totalChars, top2n, top2chars,
          dup5chars, keep)), s"doc $id")
      }
    }
    // the corpus actually exercises the duplicated-5-gram path
    assert(sawDup5 == got.values.exists(_._5 > 0))
  }

  test("quality_classifier matches a driver-side rescore on every doc") {
    val got = Classifier.qualityClassifier(spark, sf).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))
    }.toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(f: String): Long = {
      md.reset()
      val hex = md.digest(f.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 6)
      java.lang.Long.parseLong(hex, 16) % Classifier.Buckets
    }
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    docs.foreach { case (id, text) =>
      val ws = words(text)
      if (ws.isEmpty) assert(!got.contains(id))
      else {
        val feats = ws.toSeq ++ ws.sliding(2).filter(_.length == 2)
          .map(_.mkString(" "))
        val score = feats.map(f =>
          (bucket(f) * 2654435761L) % Classifier.WeightMod -
            Classifier.WeightBias).sum
        assert(got(id) == ((feats.length.toLong, score, score > 0)), s"doc $id")
      }
    }
    // both labels occur — the threshold actually separates the corpus
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  test("feature-bucket kernel ≡ regex tokenize + md5-hex bucketing") {
    // byte-level whitespace scanning must match Java \s+ splitting for
    // every input shape: mixed whitespace runs, leading/trailing ws,
    // single token, empty, whitespace-only, multi-byte UTF-8 content
    val md = java.security.MessageDigest.getInstance("MD5")
    def refBucket(f: String): Long = {
      md.reset()
      val hex = md.digest(f.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 6)
      java.lang.Long.parseLong(hex, 16) % Classifier.Buckets
    }
    def ref(text: String): Seq[Long] = {
      val ws = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val feats = ws ++ ws.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      feats.map(refBucket)
    }
    val cases = Seq("", " \t\n ", "one", "a b", "  a\t\tb\nc\r\nd  ",
      "café naïve 中文 token", "xy\fz",
      "a  b   c", "tab\tsep", (1 to 50).map(i => s"w$i").mkString(" "))
    cases.foreach { text =>
      val got = graft.text.FeatureBucketsKernel
        .buckets(org.apache.spark.unsafe.types.UTF8String.fromString(text),
          Classifier.Buckets)
        .toLongArray().toSeq
      // kernel emits unigrams then bigrams; reference builds the same order
      assert(got == ref(text), s"text=${text.replace("\n", "\\n")}")
    }
  }

  test("classifier plan broadcast-joins the weight table") {
    val df = Classifier.qualityClassifier(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
