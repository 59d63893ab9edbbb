package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the reference's utils/size_formatter.py:1-25 parity:
  * 1024 steps, whole values print as integers, fractional values as one
  * decimal rounded half-even (Python f"{x:.1f}" / C printf semantics).
  */
class SizeFormatSpec extends AnyFunSuite {

  private def f(n: Long): String = SizeFormat.formatSize(n)

  test("null and zero → 0 B (falsy check in the reference)") {
    assert(SizeFormat.formatSize(null) == "0 B")
    assert(f(0) == "0 B")
  }

  test("bytes below 1024 stay in B, integer-formatted") {
    assert(f(1) == "1 B")
    assert(f(1023) == "1023 B")
  }

  test("whole multiples print without a decimal") {
    assert(f(1024) == "1 KB")
    assert(f(1024L * 1024) == "1 MB")
    assert(f(3L * 1024 * 1024 * 1024) == "3 GB")
    assert(f(1024L * 1024 * 1024 * 1024 * 1024) == "1 PB")
  }

  test("fractional values round half-even to one decimal") {
    assert(f(1536) == "1.5 KB")
    assert(f(1280) == "1.2 KB") // 1.25 → half-even → 1.2 (printf parity)
    assert(f(1792) == "1.8 KB") // 1.75 → half-even → 1.8
    assert(f(1587) == "1.5 KB") // 1.5498…
  }

  test("units cap at PB") {
    assert(f(Long.MaxValue) == "8192 PB")
  }
}
