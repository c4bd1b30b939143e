package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties for the pure codegen kernels — the invariants
  * the oracles and pruning proofs lean on, checked over the full input
  * space instead of fixture samples (SURVEY §5c). Raw ScalaCheck
  * (Prop + Test.check) — no scalatestplus bridge in the offline cache.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, min: Int = 500): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$name: $res")
  }

  private val asciiChar: Gen[Char] = Gen.choose(32.toChar, 126.toChar)
  private def asciiString(min: Int, max: Int): Gen[String] =
    Gen.choose(min, max).flatMap(n => Gen.stringOfN(n, asciiChar))

  test("ShinglePack: packed MIN chooses the same shingle as raw-string MIN") {
    // the containment_dedup oracle-parity contract (ShinglePack.scala):
    // packed(a) < packed(b) ⇔ a < b byte-wise, for ASCII 5-grams
    val p = Prop.forAll(asciiString(5, 5), asciiString(5, 5)) { (a, b) =>
      val pa = packOne(a); val pb = packOne(b)
      (java.lang.Long.compare(pa, pb).sign == a.compareTo(b).sign) &&
        ((pa == pb) == (a == b))
    }
    check("order-isomorphism", p)
    // whole-text agreement: min over packed shingles == pack(min raw)
    val q = Prop.forAll(asciiString(5, 60)) { s =>
      val packed = packAll(s)
      val raw = (0 to s.length - 5).map(i => s.substring(i, i + 5))
      packed.min == packOne(raw.min) && packed.length == s.length - 4
    }
    check("min-agreement", q)
  }

  private def packOne(s: String): Long = packAll(s).head
  private def packAll(s: String): Array[Long] =
    graft.text.ShinglePackKernel.pack(UTF8String.fromString(s))
      .toLongArray()

  test("TrigramPack: count and byte-exact decode for ASCII text") {
    val p = Prop.forAll(asciiString(0, 80)) { s =>
      val packed = graft.text.TrigramPackKernel
        .pack(UTF8String.fromString(s)).toIntArray().map(_.toLong)
      val countOk = packed.length == math.max(s.length - 2, 0)
      val decodeOk = packed.zipWithIndex.forall { case (v, i) =>
        val dec = new String(Array(
          ((v >> 16) & 0xff).toChar, ((v >> 8) & 0xff).toChar,
          (v & 0xff).toChar))
        dec == s.substring(i, i + 3)
      }
      countOk && decodeOk
    }
    check("trigram-pack", p)
  }

  test("ZOrderKernel: interleave is monotone in the product order") {
    // the data-skipping argument for multi-column Z-order: growing any
    // coordinate never shrinks the Morton key, so per-file min/max of
    // the key bound the min/max of each coordinate's contribution
    val coord = Gen.choose(0, 0xffff)
    val p = Prop.forAll(coord, coord, coord, coord) { (a, b, da, db) =>
      val a2 = math.min(0xffff, a + da % 16)
      val b2 = math.min(0xffff, b + db % 16)
      graft.functions.ZOrderKernel.interleave2(a, b) <=
        graft.functions.ZOrderKernel.interleave2(a2, b2)
    }
    check("morton-monotone-2d", p)
    val q = Prop.forAll(coord, coord, coord) { (a, b, c) =>
      // distinct triples give distinct keys (16-bit injectivity)
      val k1 = graft.functions.ZOrderKernel.interleave3(a, b, c)
      val k2 = graft.functions.ZOrderKernel.interleave3(b, c, a)
      ((a, b, c) == ((b, c, a))) == (k1 == k2)
    }
    check("morton-injective-3d", q)
  }

  test("unescapePathValue: inverts %XX escaping, never throws on garbage") {
    // encode mimicking Spark's escapePathName char set (the writer side)
    def escape(s: String): String = s.flatMap { c =>
      if (c < ' ' || "\"#%'*/:=?\\{[]^".contains(c)) f"%%${c.toInt}%02X"
      else c.toString
    }
    val p = Prop.forAll(asciiString(0, 40)) { s =>
      graft.table.GraftTable.unescapePathValue(escape(s)) == s
    }
    check("unescape-roundtrip", p)
    // malformed escapes stay literal, and nothing ever throws
    val q = Prop.forAll(asciiString(0, 40)) { s =>
      val garbled = "%" + s + "%Z" + s
      val out = graft.table.GraftTable.unescapePathValue(garbled)
      out.length <= garbled.length && out.nonEmpty
    }
    check("unescape-total", q)
  }

  test("ExactDecimal: the 0.01-grid scaled-integer recovery is exact") {
    // floor(x·100 + 0.5) must recover k for every representable grid
    // value x = k/100.0 — the bit the summation-order-free revenue sums
    // stand on (ExactDecimal.scala). Range covers the 10 PB headroom
    // bound documented there.
    val p = Prop.forAll(Gen.choose(-9000000000000L, 9000000000000L)) { k =>
      val x = k / 100.0
      math.floor(x * 100 + 0.5).toLong == k
    }
    check("s2-exact", p, min = 2000)
  }
}
