package graft.functions

import graft.SparkSpecBase

/** F20 goldens vs Python `urllib.parse.quote(p)` outputs. */
class UrlEncodeSpec extends SparkSpecBase {

  private def q(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("p").select(UrlEncode.quotePath($"p")).collect()(0)
      .getString(0)
  }

  test("unreserved chars and slashes pass through") {
    assert(q("/data/a-b_c.txt~") == "/data/a-b_c.txt~")
  }

  test("spaces become %20, not +") {
    assert(q("/My Files/report 2.pdf") == "/My%20Files/report%202.pdf")
  }

  test("reserved characters are percent-encoded") {
    assert(q("/a&b?c=d#e") == "/a%26b%3Fc%3Dd%23e")
  }

  test("non-ASCII is UTF-8 percent-encoded") {
    assert(q("/ü") == "/%C3%BC")
  }

  test("* is encoded like Python quote (URLEncoder keeps it literal)") {
    assert(q("/renders/shot*v2.mov") == "/renders/shot%2Av2.mov")
  }
}
