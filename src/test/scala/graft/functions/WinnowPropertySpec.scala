package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

/** Property checks for the native winnowing kernel against a direct
  * Scala transliteration of the algorithm's definition — randomized
  * texts (including repeats and non-ASCII codepoints) plus the paper's
  * guarantee: two texts sharing a substring of length ≥ k+w−1 share a
  * selected hash.
  */
class WinnowPropertySpec extends AnyFunSuite {

  private def reference(text: String, k: Int, w: Int): Seq[Long] = {
    val cps = text.codePoints().toArray
    val gl = cps.length - k + 1
    if (gl < 1) return Seq.empty
    val grams = (0 until gl).map { i =>
      (0 until k).foldLeft(0L)((h, j) => (h * 31 + cps(i + j)) % 2147483647L)
    }
    val wn = math.max(gl - w + 1, 1)
    (0 until wn).map(j => grams.slice(j, j + w).min).distinct.sorted
  }

  private def native(text: String, k: Int, w: Int): Seq[Long] = {
    val arr = WinnowKernel.select(UTF8String.fromString(text), k, w)
    (0 until arr.numElements()).map(arr.getLong)
  }

  private val charGen: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar, 2 -> Gen.const(' '),
    1 -> Gen.oneOf('é', 'ß', '中', '!'))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, charGen).map(_.mkString))
  private val kwGen: Gen[(Int, Int)] = for {
    k <- Gen.chooseNum(2, 12)
    w <- Gen.chooseNum(1, 8)
  } yield (k, w)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("kernel equals the definitional reference on random texts") {
    check(Prop.forAll(textGen, kwGen) { case (t, (k, w)) =>
      native(t, k, w) == reference(t, k, w)
    })
  }

  test("guarantee: a shared >= k+w-1 substring yields a shared selection") {
    val gen = for {
      (k, w) <- kwGen
      shared <- Gen.listOfN(k + w - 1, Gen.alphaNumChar).map(_.mkString)
      pre <- Gen.listOfN(20, Gen.alphaNumChar).map(_.mkString)
      post <- Gen.listOfN(20, Gen.alphaNumChar).map(_.mkString)
    } yield (k, w, pre + shared, shared + post)
    check(Prop.forAll(gen) { case (k, w, a, b) =>
      val (sa, sb) = (native(a, k, w).toSet, native(b, k, w).toSet)
      sa.intersect(sb).nonEmpty
    })
  }
}
