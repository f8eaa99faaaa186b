package graft.expressions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the native winnow expression: the rolling
  * Karp-Rabin + monotonic-deque implementation must equal the
  * straight-line definition (per-position Horner fold, per-window
  * slice-min, global distinct) for ANY input — including the
  * adversarial shapes example specs undersample: tiny alphabets
  * (maximal hash ties and repeated grams, the deque's and the
  * emit-on-change rule's hardest case), exact boundary lengths, and
  * surrogate-pair code points.
  */
object WinnowFingerprintsPropSpec extends Properties("WinnowFingerprints") {

  import WinnowFingerprints.{B1, B2, K, M1, M2, PosMod, W}

  private def horner(cps: Array[Int], from: Int, b: Long, m: Long): Long = {
    var acc = 0L
    var i = from
    while (i < from + K) { acc = (acc * b + cps(i)) % m; i += 1 }
    acc
  }

  /** The straight-line definition: every gram hashed independently,
    * every window min'd by slicing, duplicates removed globally.
    */
  private def naive(text: String): Seq[(Long, Long)] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n < K + W - 1) Seq.empty
    else {
      val np = n - (K - 1)
      val keys = (1 to np).map(p =>
        horner(cps, p - 1, B1, M1) * PosMod + (PosMod - 1L - p))
      (0 until np - (W - 1)).map(j => keys.slice(j, j + W).min)
        .distinct.map { wk =>
          val pos = PosMod - 1L - (wk % PosMod)
          (pos, (wk / PosMod) * 1073741824L +
            horner(cps, pos.toInt - 1, B2, M2))
        }
    }
  }

  private def engine(text: String): Seq[(Long, Long)] =
    WinnowFingerprints.compute(UTF8String.fromString(text)).array.toSeq
      .map(_.asInstanceOf[GenericInternalRow])
      .map(r => (r.getLong(0), r.getLong(1)))

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.stringOfN(n, Gen.chooseNum(32, 126).map(_.toChar)))

  // 2-symbol alphabet: long runs and repeated grams everywhere — every
  // window is full of ties and the selected keys repeat in long runs
  private val binaryText: Gen[String] =
    Gen.chooseNum(K + W - 1, 250).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf('a', 'b')))

  private val unicodeText: Gen[String] =
    Gen.chooseNum(K + W - 1, 150).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(97, 122).map(_.toChar.toString),
        Gen.oneOf("é", "三", "€"),
        Gen.const(new String(Character.toChars(0x1F600)))))
        .map(_.mkString))

  property("engine = straight-line definition on printable ASCII") =
    forAll(asciiText)(t => engine(t) == naive(t))

  property("engine = straight-line definition on a 2-symbol alphabet") =
    forAll(binaryText)(t => engine(t) == naive(t))

  property("engine = straight-line definition on mixed BMP/astral text") =
    forAll(unicodeText)(t => engine(t) == naive(t))

  property("selected positions are distinct and within gram bounds") =
    forAll(binaryText) { t =>
      val out = engine(t)
      val np = t.codePoints().toArray.length - (K - 1)
      out.map(_._1).distinct.size == out.size &&
        out.forall { case (p, _) => p >= 1 && p <= np }
    }
}
