package graft.lakehouse

/** Background table maintenance beside the sink (SURVEY.md §1.3;
  * behavior from `lakehouse/maintenance.py:40-124`): snapshot expiry
  * and compaction each run on their own daemon timer, and every run
  * serializes with sink writes through the table's single-writer lock
  * (the reference shares an asyncio lock between the iceberg sink and
  * both loops — here the lock lives inside [[LakehouseTable]], so
  * exclusion is intrinsic rather than caller-supplied). Errors are
  * swallowed per-run: maintenance must never take the pipeline down —
  * including [[ConcurrentCommitException]] when ANOTHER PROCESS wins
  * the publish race against a compaction/expiry (rewrite-shaped
  * commits don't rebase): the cycle skips and the next interval
  * re-plans against the new head, which is the correct OCC response
  * for idempotent maintenance.
  */
final class MaintenanceScheduler(
    table: LakehouseTable,
    expireOlderThanMs: Long,
    expireIntervalMs: Long,
    compactIntervalMs: Long,
    compactFileThreshold: Int,
    compactMaxRows: Long,
    zorderCols: Seq[String] = Nil,
    bloomIndexCols: Seq[String] = Nil,
    annIndexRoot: Option[String] = None,
    annRebuildIntervalMs: Long = 0L,
    /** MoR tombstone-volume budget (0 = off): when the live tombstone
      * KEY count (or byte size) crosses the budget, the next
      * maintenance tick runs a targeted [[LakehouseTable.foldTombstones]]
      * — count-triggered compaction alone lets masks accumulate
      * unboundedly on a target that keeps missing its compaction
      * window, inflating every plan's broadcast mask.
      */
    maxTombstoneKeys: Long = 0L,
    maxTombstoneBytes: Long = 0L,
    /** Partition-scoped compaction (`compactPartitioned`): only
      * partitions whose file count exceeds the threshold rewrite, each
      * within the row cap, untouched partitions carry by reference —
      * the form that still works when the TABLE outgrows in-process
      * whole-table compaction but each partition fits. Unset = the
      * whole-table pass.
      */
    compactPartitionCol: Option[String] = None,
    /** Occupancy-triggered ANN REBALANCE (0 = off): on the compaction
      * cadence, probe [[AnnIndex.occupancy]] (manifest-only, zero file
      * opens) and when `skew = max/mean` crosses this threshold run
      * [[AnnIndex.rebalanceFromCorpus]] pinned to the table's current
      * head — the cheap half of a rebuild (coarse cells retrain,
      * published codebooks kept bit-identical), with the established
      * provenance bump. A healthy Lloyd layout sits near 1–3; 4.0 is
      * a reasonable starting threshold. Needs `annIndexRoot`.
      */
    annRebalanceSkewThreshold: Double = 0.0) {

  @volatile private var expiredTotal = 0
  @volatile private var compactionsTotal = 0
  @volatile private var bloomFilesTotal = 0
  @volatile private var annRebuildsTotal = 0
  @volatile private var annRebalancesTotal = 0
  @volatile private var foldsTotal = 0
  private var timer: Option[java.util.Timer] = None

  def stats: (Int, Int) = (expiredTotal, compactionsTotal)

  def foldStats: Int = foldsTotal

  def bloomStats: Int = bloomFilesTotal

  def annStats: Int = annRebuildsTotal

  def annRebalanceStats: Int = annRebalancesTotal

  /** One expiry pass (cutoff = now - retention). */
  def runExpiry(): Int = {
    val n = table.expireSnapshotsOlderThan(System.currentTimeMillis() - expireOlderThanMs)
    expiredTotal += n
    n
  }

  /** One compaction pass: z-order clustering when curve columns are
    * configured (same trigger thresholds), plain coalesce otherwise.
    * The z-order target file count honors `compactMaxRows` (ADVICE r5:
    * a hardcoded targetFiles = 1 collapsed the table into ONE unbounded
    * file whose min/max spanned everything, erasing the multi-column
    * skipping the curve exists for): files = ceil(rows / rowCap), so
    * each output file stays under the row cap and keeps a tight z-range.
    */
  def runCompaction(): Option[Snapshot] = {
    val s =
      if (zorderCols.nonEmpty) {
        val cur = table.currentSnapshot()
        if (cur.exists(_.files.size >= compactFileThreshold)) {
          val target =
            if (compactMaxRows <= 0L) 1
            else {
              val rows = table.read().count()
              math.max(1L, (rows + compactMaxRows - 1L) / compactMaxRows).toInt
            }
          table.compactZOrder(zorderCols, targetFiles = target)
        } else None
      } else compactPartitionCol match {
        case Some(c) => table.compactPartitioned(c, compactFileThreshold, compactMaxRows)
        case None => table.compact(compactFileThreshold, compactMaxRows)
      }
    if (s.isDefined) compactionsTotal += 1
    // bloom sidecars ride the compaction cadence: data files are
    // immutable, so only files NEW since the last pass (appends, the
    // compaction output just produced) get a sidecar — incremental by
    // construction, and running AFTER compaction means the freshly
    // rewritten files are indexed in the same pass
    if (bloomIndexCols.nonEmpty) runBloomIndex()
    s
  }

  /** Build missing bloom sidecars for the configured columns; returns
    * files indexed this pass.
    */
  def runBloomIndex(): Int = {
    // runs right after compaction, whose output files hold up to
    // compactMaxRows rows — a bloom sized at the 100k default would sit
    // at ~5x capacity (80%+ false-positive rate) on exactly the files
    // this pass exists to index, silently disabling pruning
    val expected = if (compactMaxRows > 0) compactMaxRows else 100000L
    val n = bloomIndexCols.map(c => table.buildBloomIndex(c, expectedPerFile = expected)).sum
    bloomFilesTotal += n
    table.pruneBloomSidecars()
    n
  }

  /** One tombstone-budget check: folds iff a budget is configured AND
    * the live volume (manifest stats, zero jobs) crosses it. Runs on
    * the compaction cadence, BEFORE the count-triggered pass — a fold
    * both shrinks the mask and adds rewrite files the count trigger
    * may then coalesce.
    */
  def runTombstoneFold(): Option[Snapshot] = {
    val over = (maxTombstoneKeys > 0 || maxTombstoneBytes > 0) &&
      table.currentSnapshot().exists { s =>
        val (_, keys, bytes) = table.tombstoneVolume(s)
        (maxTombstoneKeys > 0 && keys > maxTombstoneKeys) ||
          (maxTombstoneBytes > 0 && bytes > maxTombstoneBytes)
      }
    if (!over) None
    else {
      val s = table.foldTombstones()
      if (s.isDefined) foldsTotal += 1
      s
    }
  }

  /** One full ANN-index retrain over the table's CURRENT rows — the
    * codebook-drift repair for [[AnnIndex.append]]'s frozen-codebook
    * incremental encodes (append keeps ingestion cheap; this cadence
    * re-fits cells and codebooks to the corpus the index now actually
    * holds). The table must carry the (vec_id, embedding) shape
    * [[AnnIndex.build]] trains on. No-op when unconfigured.
    */
  def runAnnRebuild(): Boolean = annIndexRoot match {
    case Some(root) =>
      val corpus = table.read()
      AnnIndex.build(corpus.sparkSession, corpus, root)
      annRebuildsTotal += 1
      true
    case None => false
  }

  /** One occupancy-triggered rebalance check: probe the index's
    * per-cell skew (manifest-only — safe on every compaction tick) and
    * fire [[AnnIndex.rebalanceFromCorpus]] pinned to the table's
    * current head when it crosses the configured threshold. Returns
    * true iff a rebalance ran. No-op when unconfigured or the index
    * isn't published yet.
    */
  def runAnnRebalanceCheck(): Boolean = (annIndexRoot, annRebalanceSkewThreshold) match {
    case (Some(root), th) if th > 0.0 && AnnIndex.currentVersion(root).isDefined =>
      val occ = AnnIndex.occupancy(table.session, root)
      if (occ.skew > th) {
        AnnIndex.rebalanceFromCorpus(table.session, table.root, root)
        annRebalancesTotal += 1
        true
      } else false
    case _ => false
  }

  def start(): Unit = {
    val t = new java.util.Timer("lakehouse-maintenance", true)
    t.scheduleAtFixedRate(task(() => runExpiry()), expireIntervalMs, expireIntervalMs)
    t.scheduleAtFixedRate(task(() => { runTombstoneFold(); runCompaction();
      runAnnRebalanceCheck() }), compactIntervalMs, compactIntervalMs)
    if (annIndexRoot.isDefined && annRebuildIntervalMs > 0)
      t.scheduleAtFixedRate(task(() => runAnnRebuild()), annRebuildIntervalMs, annRebuildIntervalMs)
    timer = Some(t)
  }

  def stop(): Unit = { timer.foreach(_.cancel()); timer = None }

  private def task(body: () => Any): java.util.TimerTask =
    new java.util.TimerTask {
      override def run(): Unit =
        try body() catch { case _: Exception => () } // maintenance.* _error: log-only
    }
}
