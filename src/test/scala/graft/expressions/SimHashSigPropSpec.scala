package graft.expressions

import java.security.MessageDigest

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the native SimHash signature: the md5-BYTES bit
  * extraction must equal the straight-line hex-digit definition (the
  * formula q80's oracle runs: bit b = bit 3−(b%4) of hex digit b/4 of
  * `md5(token)`) for ANY input — including the shapes the corpus
  * undersamples: whitespace runs of every class the tokenizer splits
  * on, leading/trailing whitespace (empty tokens), astral-plane code
  * points, single-token and empty documents, and tiny alphabets that
  * maximize token collisions (the distinctness rule's hardest case).
  */
object SimHashSigPropSpec extends Properties("SimHashSig") {

  /** Straight-line definition via the HEX route — independent of the
    * byte-level extraction under test.
    */
  private def naive(text: String): String = {
    val md = MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val votes = new Array[Int](64)
    text.split("[ \t\n\f\r]+", -1).distinct.foreach { t =>
      val h = md5hex(t)
      var b = 0
      while (b < 64) {
        val dv = Integer.parseInt(h.charAt(b / 4).toString, 16)
        val bit = (dv >> (3 - b % 4)) & 1
        votes(b) += 2 * bit - 1
        b += 1
      }
    }
    votes.map(v => if (v > 0) '1' else '0').mkString
  }

  private def engine(text: String): String =
    SimHashSig.compute(UTF8String.fromString(text)).toString

  private val wsChar = Gen.oneOf(' ', '\t', '\n', '\f', '\r')
  private val tinyTok = Gen.choose(1, 3)
    .flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b')))
  private val unicodeTok = Gen.choose(1, 6).flatMap(n =>
    Gen.stringOfN(n, Gen.oneOf('x', 'é', 'ß', '中', '\ud83d', 'q'))
      // lone surrogates break UTF-8 round-trips identically on both
      // routes only when paired — pair them up
      .map(_.replace("\ud83d", "😀")))
  private def docOf(tok: Gen[String]): Gen[String] = for {
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, tok)
    seps <- Gen.listOfN(n + 1, Gen.choose(0, 2).flatMap(k =>
      Gen.stringOfN(k, wsChar)))
  } yield seps.zipAll(toks, "", "").map { case (s, t) => s + t }.mkString

  property("tiny-alphabet docs (max collisions)") =
    forAll(docOf(tinyTok))(d => engine(d) == naive(d))

  property("unicode docs (astral + combining + multibyte)") =
    forAll(docOf(unicodeTok))(d => engine(d) == naive(d))

  property("whitespace-only and empty docs") =
    forAll(Gen.choose(0, 5).flatMap(k => Gen.stringOfN(k, wsChar)))(d =>
      engine(d) == naive(d))
}
