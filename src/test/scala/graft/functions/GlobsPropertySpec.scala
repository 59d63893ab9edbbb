package graft.functions

import java.nio.file.FileSystems
import java.util.regex.Pattern

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check: segment-mode translation agrees with `java.nio`'s
  * glob PathMatcher on the shared dialect (`*`, `?`, `[a-z]`, `[!...]`,
  * literals — no `**`/braces, which fnmatch lacks). Both treat `*`/`?`
  * as not crossing `/`, which is exactly `starCrossesSlash = false`.
  */
class GlobsPropertySpec extends AnyFunSuite {

  private val litChar = Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('.', '-', '_'))
  private val classPart: Gen[String] = for {
    neg <- Gen.oneOf("", "!")
    chars <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  } yield s"[$neg$chars]"
  private val piece: Gen[String] = Gen.frequency(
    5 -> litChar.map(_.toString), 2 -> Gen.const("*"),
    2 -> Gen.const("?"), 1 -> classPart)
  // `**` is excluded: nio gives it cross-directory semantics, fnmatch
  // treats it as `*` — outside the shared dialect under test.
  private val glob: Gen[String] =
    Gen.listOfN(6, piece).map(_.mkString)
      .suchThat(g => g.nonEmpty && !g.contains("**"))
  // Candidates are single path SEGMENTS (no '/'): fnmatch is a string
  // matcher whose wildcards/classes can match '/', nio's never do — the
  // dialects only agree where '/' cannot occur, which is exactly the
  // segment-mode use.
  private val candidate: Gen[String] =
    Gen.listOfN(6, litChar).map(_.mkString).suchThat(_.nonEmpty)

  test("segment-mode translate matches java.nio glob semantics") {
    val fs = FileSystems.getDefault
    val prop = Prop.forAllNoShrink(glob, candidate) { (g: String, s: String) =>
      val nio = fs.getPathMatcher(s"glob:$g").matches(fs.getPath(s))
      val ours = Pattern.matches(
        Globs.translate(g, starCrossesSlash = false), s)
      nio == ours
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(result.passed, result.status.toString)
  }
}
