package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.CommonPrefixLen
import org.apache.spark.sql.catalyst.expressions.Literal

/** Property laws of the common-prefix-length kernel over random
  * Unicode strings — 1-byte ASCII, 2-byte accents, 3-byte CJK, and
  * 4-byte astral code points, i.e. every UTF-8 width class, which the
  * fixture corpus (ASCII word soup) never exercises.  The reference
  * implementation counts CODE POINTS (matching Spark's character
  * semantics), not UTF-16 chars. */
object CommonPrefixLenPropSpec extends Properties("CommonPrefixLen") {

  private def lcp(a: String, b: String): Long =
    CommonPrefixLen(Literal.create(a), Literal.create(b))
      .eval(null).asInstanceOf[Long]

  private def cps(s: String): Array[Int] =
    s.codePoints().toArray

  private def refLcp(a: String, b: String): Long =
    cps(a).zip(cps(b)).takeWhile { case (x, y) => x == y }.length.toLong

  private val uniChar: Gen[String] = Gen.oneOf(
    Gen.alphaLowerChar.map(_.toString),          // 1-byte
    Gen.oneOf("é", "ü", "ß", "ñ"),               // 2-byte
    Gen.oneOf("日", "本", "語", "字"),            // 3-byte
    Gen.oneOf("😀", "🚀"))   // 4-byte astral

  private val uniStr: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, uniChar).map(_.mkString))

  property("agrees with the code-point reference") =
    forAll(uniStr, uniStr) { (a, b) => lcp(a, b) == refLcp(a, b) }

  property("symmetric") =
    forAll(uniStr, uniStr) { (a, b) => lcp(a, b) == lcp(b, a) }

  property("identity is the code-point count") =
    forAll(uniStr) { a => lcp(a, a) == cps(a).length.toLong }

  property("bounded by the shorter side") =
    forAll(uniStr, uniStr) { (a, b) =>
      lcp(a, b) <= math.min(cps(a).length, cps(b).length)
    }

  property("a code-point prefix measures exactly its own length") =
    forAll(uniStr, Gen.chooseNum(0, 24)) { (a, k0) =>
      val pts = cps(a)
      val k = math.min(k0, pts.length)
      val prefix = new String(pts, 0, k)
      lcp(a, prefix) == k.toLong
    }

  property("appending divergent tails never changes the LCP") =
    forAll(uniStr, uniStr, uniStr) { (p, t1, t2) =>
      val l = lcp(p + "x" + t1, p + "y" + t2)
      l == refLcp(p + "x" + t1, p + "y" + t2) && l >= cps(p).length.toLong
    }

  /** UTF8String round-trip sanity for the eval path used above. */
  property("eval path equals direct UTF8String construction") =
    forAll(uniStr, uniStr) { (a, b) =>
      val u = CommonPrefixLen(
        Literal(UTF8String.fromString(a),
          org.apache.spark.sql.types.StringType),
        Literal(UTF8String.fromString(b),
          org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[Long]
      u == lcp(a, b)
    }
}
