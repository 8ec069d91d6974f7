package graft.lakehouse

import org.scalatest.funsuite.AnyFunSuite

/** The schema-history channel's versioned record codec: ONE
  * encode/parse pair shared by the four former regex sites (emit in
  * `schemaChangesBetween`, apply in `applySchemaChange`, seq-order in
  * the sink, ADD-guard in the feed) — so names with JSON-hostile
  * characters round-trip and a new record field lands in one place.
  */
class DdlRecordSpec extends AnyFunSuite {

  test("every op round-trips through encode/parse") {
    val recs = Seq(
      DdlRecord.rename(1, "old", "new"),
      DdlRecord.widen(2, "k", "bigint"),
      DdlRecord.add(3, "tag", "string"),
      DdlRecord.drop(4, "stale"),
      DdlRecord.setSpec(5, Seq("bucket(8, k)", "cell")))
    recs.foreach { r =>
      val back = DdlRecord.parse(r.json)
      assert(back === r, r.json)
      assert(back.v === DdlRecord.V)
    }
  }

  test("JSON-hostile column names (quotes, backslashes, unicode) round-trip instead of desyncing") {
    val evil = Seq("""he"said""", """back\slash""", "tab\tchar", "uniécol")
    evil.foreach { name =>
      val r = DdlRecord.parse(DdlRecord.add(1, name, "string").json)
      assert(r.column === Some(name), s"name <$name> mangled to ${r.column}")
      val rn = DdlRecord.parse(DdlRecord.rename(2, name, name + "2").json)
      assert(rn.from === Some(name) && rn.to === Some(name + "2"))
    }
  }

  test("seqOf orders records; garbage sorts first (the loud failure stays in apply)") {
    val js = Seq(DdlRecord.drop(3, "c").json, DdlRecord.add(1, "a", "int").json,
      DdlRecord.widen(2, "b", "bigint").json, "not json at all")
    val sorted = js.sortBy(DdlRecord.seqOf)
    assert(sorted.head === "not json at all")
    assert(sorted.tail.map(j => DdlRecord.parse(j).seq) === Seq(1, 2, 3))
  }

  test("a record without a version field reads as v1 (hand-written / legacy records)") {
    val r = DdlRecord.parse("""{"seq":2,"op":"rename","from":"a","to":"b"}""")
    assert(r.v === 1 && r.seq === 2 && r.from === Some("a") && r.to === Some("b"))
  }

  test("a record version newer than the reader refuses loudly") {
    val future = DdlRecord.drop(1, "c").copy(v = DdlRecord.V + 1).json
    val e = intercept[IllegalStateException](DdlRecord.parse(future))
    assert(e.getMessage.contains("newer than this reader"), e.getMessage)
  }

  test("malformed records refuse loudly") {
    val e = intercept[IllegalStateException](DdlRecord.parse("{{nope"))
    assert(e.getMessage.contains("unparseable schema change"), e.getMessage)
    val e2 = intercept[IllegalStateException](DdlRecord.parse("""{"v":1,"seq":1,"op":""}"""))
    assert(e2.getMessage.toLowerCase.contains("no op"), e2.getMessage)
    // a record missing `op` entirely is equally loud
    val e3 = intercept[IllegalStateException](DdlRecord.parse("""{"v":1,"seq":1}"""))
    assert(e3.getMessage.toLowerCase.contains("no op"), e3.getMessage)
  }
}
