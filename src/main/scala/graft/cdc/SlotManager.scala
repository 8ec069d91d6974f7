package graft.cdc

/** PostgreSQL replication-slot + publication lifecycle (SURVEY.md §2
  * S8; statements and flow from `sources/wal/slot_manager.py:27-93`,
  * consumed by the WAL reader's start sequence `wal/reader.py:69-75`):
  * existence-check then create, so repeated pipeline starts are
  * idempotent.
  *
  * The SQL is built here and runs through an injectable executor
  * `(statement, params) => rows` — this environment ships no
  * PostgreSQL driver, so production wires a JDBC call; the statement
  * text, parameterization and ordering are the tested behavior.
  * Parameters travel separately (the psycopg placeholder model) except
  * the publication DDL, where PostgreSQL forbids bind parameters — so
  * identifiers and the table list are validated before interpolation
  * (the reference relies on the same upstream config validation,
  * `config/models.py:89-106`).
  */
final class SlotManager(
    execute: (String, Seq[String]) => Seq[Seq[Any]],
    slotName: String = "cdc_slot",
    publicationName: String = "cdc_publication") {

  private val Identifier = """^[A-Za-z_]\w*$""".r
  private val QualifiedName = """^[A-Za-z_]\w*\.[A-Za-z_]\w*$""".r

  require(Identifier.findFirstIn(slotName).isDefined,
    s"invalid slot name: $slotName")
  require(Identifier.findFirstIn(publicationName).isDefined,
    s"invalid publication name: $publicationName")

  /** Create the publication over `tables` unless it exists; returns
    * true when created (`slot_manager.py:27-57`).
    */
  def ensurePublication(tables: Seq[String]): Boolean = {
    require(tables.nonEmpty, "publication needs at least one table")
    tables.foreach(t => require(QualifiedName.findFirstIn(t).isDefined,
      s"table '$t' must be schema-qualified"))
    val exists = execute(
      "SELECT 1 FROM pg_publication WHERE pubname = ?", Seq(publicationName)).nonEmpty
    if (!exists)
      execute(s"CREATE PUBLICATION $publicationName FOR TABLE ${tables.mkString(", ")}", Nil)
    !exists
  }

  /** Create the pgoutput logical replication slot unless it exists;
    * returns true when created (`slot_manager.py:59-80`).
    */
  def ensureSlot(): Boolean = {
    val exists = execute(
      "SELECT 1 FROM pg_replication_slots WHERE slot_name = ?", Seq(slotName)).nonEmpty
    if (!exists)
      execute("SELECT pg_create_logical_replication_slot(?, 'pgoutput')", Seq(slotName))
    !exists
  }

  /** Drop the replication slot (`slot_manager.py:82-93`). */
  def dropSlot(): Unit =
    execute("SELECT pg_drop_replication_slot(?)", Seq(slotName))

  /** The WAL reader's start sequence: publication first, then slot
    * (`wal/reader.py:74-75`).
    */
  def ensureAll(tables: Seq[String]): Unit = {
    ensurePublication(tables)
    ensureSlot()
  }
}
