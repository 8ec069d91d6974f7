package graft.streaming

import org.apache.spark.sql.types._

/** Schema-change detection (SURVEY.md §2.9 T10), re-expressed from the
  * registry poller (`streaming/schema_monitor.py:51-130`) as a per-batch
  * structural diff: additive changes are compatible; column removal or
  * type narrowing is incompatible and should stop (or warn, per config)
  * the pipeline.
  */
object SchemaMonitor {
  sealed trait Verdict
  case object Unchanged extends Verdict
  final case class Compatible(addedColumns: Seq[String]) extends Verdict
  final case class Incompatible(reasons: Seq[String]) extends Verdict

  /** Widening primitive chains considered safe (Spark's own implicit
    * cast lattice, narrowed to the unambiguous steps).
    */
  private val widens: Set[(DataType, DataType)] = Set(
    (ByteType, ShortType), (ByteType, IntegerType), (ByteType, LongType),
    (ShortType, IntegerType), (ShortType, LongType),
    (IntegerType, LongType),
    (FloatType, DoubleType),
    (IntegerType, DoubleType), (LongType, DoubleType))

  def diff(previous: StructType, next: StructType): Verdict = {
    val prevByName = previous.fields.map(f => f.name -> f).toMap
    val nextByName = next.fields.map(f => f.name -> f).toMap

    val removed = previous.fieldNames.filterNot(nextByName.contains)
    val narrowed = previous.fields.flatMap { pf =>
      nextByName.get(pf.name).collect {
        case nf if nf.dataType != pf.dataType && !widens((pf.dataType, nf.dataType)) =>
          s"column ${pf.name} changed ${pf.dataType.simpleString} -> ${nf.dataType.simpleString}"
      }
    }
    val added = next.fieldNames.filterNot(prevByName.contains)

    if (removed.nonEmpty || narrowed.nonEmpty)
      Incompatible(removed.map(c => s"column $c removed").toSeq ++ narrowed)
    else if (added.nonEmpty) Compatible(added.toSeq)
    else Unchanged
  }
}
