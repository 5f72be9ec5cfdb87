package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI JSON contract (reference README.md:50-85 shape, v1.5.2 field set). */
class AppSpec extends AnyFunSuite {

  test("toJson emits the reference output contract") {
    val out = pipeline.TurnExtractor.extract(
      "t", 0, "^C Договор поставки\nТело договора.")
    val json = App.toJson(
      core.MultiDoc(out.documents, out.spans, out.version))
    assert(json.startsWith("{\"documents\":[{\"documentType\":\"CONTRACT\""))
    assert(json.contains(
      "\"paragraphHeader\":{\"offset\":0,\"text\":\"Договор поставки\",\"length\":16}"))
    assert(json.contains(
      "\"paragraphBody\":{\"offset\":16,\"text\":\"Тело договора.\",\"length\":14}"))
    assert(json.endsWith("\"version\":\"" + BuildInfo.version + "\"}"))
  }

  test("escaping: quotes, backslashes, control chars") {
    val md = core.MultiDoc(Seq(core.Doc("UNKNOWN", Seq(core.Para(
      core.TextSeg(0, "a\"b\\c\nd", 8), core.TextSeg.empty)))), Nil, "v")
    val json = App.toJson(md)
    assert(json.contains("a\\\"b\\\\c\\nd\\u0001"))
  }
}
