package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.JaroWinkler

/** Property-based laws of the Jaro-Winkler kernel over random ASCII
  * strings — the generator explores lengths and alphabets the fixture
  * corpus never produces. */
object JaroWinklerPropSpec extends Properties("JaroWinkler") {

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  private val asciiStr: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  property("bounded in [0, 1]") = forAll(asciiStr, asciiStr) { (a, b) =>
    val s = jw(a, b); s >= 0.0 && s <= 1.0
  }

  property("symmetric") = forAll(asciiStr, asciiStr) { (a, b) =>
    jw(a, b) == jw(b, a)
  }

  property("identity scores exactly 1 on nonempty strings") =
    forAll(asciiStr) { a => a.isEmpty || jw(a, a) == 1.0 }

  property("disjoint alphabets score exactly 0") =
    forAll(Gen.chooseNum(1, 30), Gen.chooseNum(1, 30)) { (n, m) =>
      jw("a" * n, "b" * m) == 0.0
    }

  property("a shared 4-prefix with high jaro earns the Winkler boost") =
    forAll(Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)) { s =>
      // one trailing edit keeps jaro > 0.7; boost must apply
      val t = s.dropRight(1) + (if (s.last == 'z') 'y' else 'z')
      val score = jw(s, t)
      score > 0.7 && score < 1.0
    }
}
