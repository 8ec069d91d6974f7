package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Slot/publication lifecycle vectors (`sources/wal/slot_manager.py:
  * 27-93`): statement text + parameterization, check-then-create
  * idempotence, reader start ordering, and the injection guards the
  * interpolated DDL demands.
  */
class SlotManagerSpec extends AnyFunSuite {

  /** Recording executor: existence queries answer from `existing`. */
  private class Recorder(existing: Set[String] = Set.empty) {
    val statements = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    def exec(sql: String, params: Seq[String]): Seq[Seq[Any]] = {
      statements += ((sql, params))
      if (sql.contains("FROM pg_publication") && existing.contains(params.head)) Seq(Seq(1))
      else if (sql.contains("FROM pg_replication_slots") && existing.contains(params.head)) Seq(Seq(1))
      else Seq.empty
    }
  }

  test("fresh database: publication then slot created with the reference statements") {
    val r = new Recorder()
    val m = new SlotManager(r.exec, "cdc_slot", "cdc_publication")
    m.ensureAll(Seq("public.users", "public.orders"))
    assert(r.statements.toSeq === Seq(
      ("SELECT 1 FROM pg_publication WHERE pubname = ?", Seq("cdc_publication")),
      ("CREATE PUBLICATION cdc_publication FOR TABLE public.users, public.orders", Nil),
      ("SELECT 1 FROM pg_replication_slots WHERE slot_name = ?", Seq("cdc_slot")),
      ("SELECT pg_create_logical_replication_slot(?, 'pgoutput')", Seq("cdc_slot"))))
  }

  test("idempotent: existing publication and slot are never re-created") {
    val r = new Recorder(existing = Set("cdc_publication", "cdc_slot"))
    val m = new SlotManager(r.exec)
    assert(!m.ensurePublication(Seq("public.users")))
    assert(!m.ensureSlot())
    assert(!r.statements.exists(_._1.startsWith("CREATE PUBLICATION")))
    assert(!r.statements.exists(_._1.contains("pg_create_logical_replication_slot")))
  }

  test("drop slot issues the drop function call") {
    val r = new Recorder()
    new SlotManager(r.exec, slotName = "s1").dropSlot()
    assert(r.statements.toSeq === Seq(
      ("SELECT pg_drop_replication_slot(?)", Seq("s1"))))
  }

  test("interpolated DDL is injection-guarded (identifiers + qualified tables only)") {
    val r = new Recorder()
    intercept[IllegalArgumentException] {
      new SlotManager(r.exec, publicationName = "p; DROP TABLE x")
    }
    intercept[IllegalArgumentException] {
      new SlotManager(r.exec).ensurePublication(Seq("users; --"))
    }
    intercept[IllegalArgumentException] {
      new SlotManager(r.exec).ensurePublication(Nil)
    }
    assert(!r.statements.exists(_._1.startsWith("CREATE")))
  }
}
