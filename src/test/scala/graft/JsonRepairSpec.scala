package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.JsonRepair

class JsonRepairSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def one(s: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    val r = Seq(s).toDF("t").select(f(col("t"))).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("E3: strips markdown fences, picks largest valid candidate") {
    assert(one("""```json
{"a": 1, "b": 2}
```""", JsonRepair.extractJsonCandidate) == """{"a": 1, "b": 2}""")
    // two candidates: the larger valid one wins regardless of order
    assert(one("""{"x":1} noise {"longer": "candidate"}""",
      JsonRepair.extractJsonCandidate) == """{"longer": "candidate"}""")
    assert(one("no json at all", JsonRepair.extractJsonCandidate) == null)
  }

  test("E3 idempotence on valid JSON (property)") {
    val js = Seq("""{"k": 1}""", """{"a": [1, 2]}""", """{"s": "v"}""")
    js.foreach { j =>
      assert(one(j, JsonRepair.extractJsonCandidate) == j)
    }
  }

  test("E4: direct parse, greedy-block fallback, null on garbage") {
    assert(one("""{"ok": true}""", JsonRepair.safeJson) == """{"ok": true}""")
    assert(one("""prefix {"ok": true} suffix""", JsonRepair.safeJson) == """{"ok": true}""")
    assert(one("not json", JsonRepair.safeJson) == null)
  }
}
