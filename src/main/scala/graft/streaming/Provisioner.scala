package graft.streaming

import java.nio.file.{Files, Path, Paths}

/** Idempotent provisioning with best-effort rollback (SURVEY.md §2.1
  * S16; reference semantics in `streaming/topics.py:72-107` and the
  * per-transport provisioners): create the per-table channel
  * directories (topic + `.dlq` side-channel) under the pipeline root;
  * already-existing channels are left untouched; on a failure partway
  * through, channels created by THIS invocation are removed, while
  * pre-existing ones survive.
  */
final class Provisioner(root: String) {
  private val rootPath = Paths.get(root)

  /** Topic names for a capture list of `schema.table` entries
    * (`{prefix}.{schema}.{table}` + DLQ, `streaming/topics.py:21-69`).
    */
  def topicsFor(prefix: String, tables: Seq[String]): Seq[String] =
    tables.flatMap(t => Seq(s"$prefix.$t", s"$prefix.$t.dlq"))

  /** Create channel dirs; returns the newly created set. Rolls back its
    * own creations if any step fails.
    */
  def provision(topics: Seq[String]): Seq[String] = {
    val created = scala.collection.mutable.ListBuffer.empty[Path]
    try {
      Files.createDirectories(rootPath)
      topics.foreach { t =>
        require(!t.contains('/') && !t.contains(".."), s"invalid topic name: $t")
        val dir = rootPath.resolve(t)
        if (!Files.exists(dir)) {
          Files.createDirectory(dir)
          created += dir
        }
      }
      created.map(p => p.getFileName.toString).toList
    } catch {
      case e: Exception =>
        created.reverse.foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => })
        throw e
    }
  }
}
