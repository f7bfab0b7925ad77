package graft

import org.scalatest.funsuite.AnyFunSuite

class LogSpec extends AnyFunSuite {

  test("render emits one valid JSON object with typed values") {
    val line = Log.render("gold_build", "table" -> "gold_draw_summary",
      "rows" -> 42L, "ok" -> true, "ratio" -> 0.5)
    assert(line ==
      """{"event":"gold_build","table":"gold_draw_summary","rows":42,"ok":true,"ratio":0.5}""")
  }

  test("render escapes quotes, backslashes, and control characters") {
    val line = Log.render("x", "msg" -> "a\"b\\c\nd\te")
    assert(line == """{"event":"x","msg":"a\"b\\c\nd\te"}""")
    val ctl = Log.render("x", "msg" -> "a\u0001b")
    assert(ctl == "{\"event\":\"x\",\"msg\":\"a\\u0001b\"}")
  }

  test("timed returns the body's value and logs elapsed") {
    assert(Log.timed("t")(7) == 7)
  }
}
