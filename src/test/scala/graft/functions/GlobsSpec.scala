package graft.functions

import java.util.regex.Pattern

import org.scalatest.funsuite.AnyFunSuite

/** fnmatch-parity tests for the glob→regex translation (reference
  * semantics: scanner/scanner.py:71-97 checks full path AND each
  * segment; tests/scanner/test_parallel_scanner.py:49-62).
  */
class GlobsSpec extends AnyFunSuite {

  private def m(glob: String, s: String, cross: Boolean = true): Boolean =
    Pattern.matches(Globs.translate(glob, cross), s)

  test("* crosses slash in full-path mode, not in segment mode") {
    assert(m("a*b", "a/x/b", cross = true))
    assert(!m("a*b", "a/x/b", cross = false))
    assert(m("a*b", "axxb", cross = false))
  }

  test("? matches exactly one char") {
    assert(m("f?o", "foo"))
    assert(!m("f?o", "fo"))
    assert(!m("f?o", "fooo"))
  }

  test("literal dots and regex metachars are escaped") {
    assert(m("*.tmp", "x.tmp"))
    assert(!m("*.tmp", "xotmp"))
    assert(m("a+b(c)", "a+b(c)"))
    assert(!m("a+b(c)", "aab(c)"))
  }

  test("character classes: ranges and negation") {
    assert(m("[a-c]x", "bx"))
    assert(!m("[a-c]x", "dx"))
    assert(m("[!a-c]x", "dx"))
    assert(!m("[!a-c]x", "bx"))
  }

  test("fnmatch edge: []] matches a literal ]") {
    assert(m("[]]", "]"))
    assert(!m("[]]", "x"))
  }

  test("fnmatch edge: [!]x] negated class containing ]") {
    assert(m("[!]x]", "a"))
    assert(!m("[!]x]", "]"))
    assert(!m("[!]x]", "x"))
  }

  test("fnmatch edge: leading ^ is a literal member, not negation") {
    assert(m("[^ab]", "^"))
    assert(m("[^ab]", "a"))
    assert(!m("[^ab]", "c"))
  }

  test("unterminated [ is a literal bracket") {
    assert(m("a[b", "a[b"))
  }

  test("skipRegex: segment match anywhere in the path") {
    val re = Globs.skipRegex(Seq(".git", "node_modules")).r
    assert(re.findFirstIn("repo/.git/config").isDefined)
    assert(re.findFirstIn("x/node_modules/y/z.js").isDefined)
    assert(re.findFirstIn("x/node_modulesX/y.js").isEmpty)
    assert(re.findFirstIn("repo/src/a.scala").isEmpty)
  }

  test("segment-mode negated classes never match across a '/'") {
    // "a[!b]c" as a segment must not match the path "x/a/c" by letting
    // [^b] swallow the separator (fnmatch per segment sees no '/')
    val re = Globs.skipRegex(Seq("a[!b]c")).r
    assert(re.findFirstIn("x/a/c").isEmpty)
    assert(re.findFirstIn("x/axc/y").isDefined)
  }

  test("skipRegex: full-path glob match") {
    val re = Globs.skipRegex(Seq("*.tmp")).r
    assert(re.findFirstIn("a/b/c.tmp").isDefined)
    assert(re.findFirstIn("a/b/c.tmpx").isEmpty)
    // segment alternative also catches a .tmp *directory* en route
    assert(re.findFirstIn("a/x.tmp/keep.txt").isDefined)
  }
}
