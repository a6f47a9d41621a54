package graft.engine

import java.nio.file.{Files, Paths}

/** Block-store retention — the maintenance pair of [[Snapshot]]'s time
  * travel (the lakehouse VACUUM role, scoped to what is actually safe
  * here).
  *
  * Under accumulate semantics every CONSUMED block stays load-bearing
  * forever: `Snapshot.asOf(seq)` for ANY seq — including the latest —
  * unions all blocks consumed at or before it, so consumed blocks are
  * never reclaimable while the log that references them lives. What IS
  * reclaimable is the other kind of file a block store accumulates:
  * ORPHANS — block directories neither any lineage row nor any
  * consumption ledger references, left by landings that crashed before
  * their first consumption or by superseded re-lands. (A RESET source's
  * blocks stay referenced through lineage, so a pending backfill can
  * never lose its inputs to a sweep.) On a month-old incremental
  * pipeline orphans are the dominant garbage, and deleting a consumed
  * block by accident destroys time travel — which is why the
  * referenced-set diff is computed from the log, not guessed from file
  * ages alone.
  *
  * The grace period guards the one race a ledger diff cannot see: a
  * landing that has written its directory but whose consuming run has
  * not yet appended — same reason Delta's VACUUM defaults to a retention
  * window. Driver-side file ops on driver-side metadata state (the block
  * roots at 100 TB live in object storage; the same plan/sweep split
  * applies, with the listing swapped for the store's API). */
object Vacuum {

  /** What a sweep WOULD do: block-store subdirectories of `blockRoot`
    * split into (referenced, orphaned) by [[RunLog.referencedBlocks]]
    * (lineage ∪ consumption ledgers). A block directory's name IS its
    * block id (one dir per block, the landing layout). */
  def plan(log: RunLog, blockRoot: String): (Seq[String], Seq[String]) = {
    val root = Paths.get(blockRoot)
    require(Files.isDirectory(root), s"not a readable directory: $blockRoot")
    val referenced = log.referencedBlocks
    val dirs = {
      val s = Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isDirectory(_))
          .map(_.getFileName.toString).toSeq.sorted
      } finally s.close()
    }
    // ids-as-directory-names is a CONVENTION this store must actually
    // follow — block ids may legally contain '/' and a consumer may
    // ledger logical ids ('batch0') that are not dir names (corpusIngest
    // does). If the log references blocks but NONE of them matches a
    // directory here, classifying everything as orphaned would delete a
    // store this vacuum does not understand; refuse instead. (Conservative
    // corner: a root holding only true orphans under a non-empty log also
    // refuses — delete those by hand, with eyes on them.)
    require(referenced.isEmpty || dirs.isEmpty || dirs.exists(referenced),
      s"$blockRoot has no directory matching any of the ${referenced.size} " +
        "referenced block ids — this store does not use ids-as-directory-" +
        "names (e.g. a stream landing ledgered as batchN over pN dirs); " +
        "refusing to classify its entire contents as orphaned")
    dirs.partition(referenced)
  }

  /** Delete orphaned block directories older than `graceMs` (by the
    * NEWEST modification time anywhere under the directory — a landing
    * still being written keeps touching its files, and a writer
    * overwriting files INSIDE an existing entry refreshes child mtimes
    * without refreshing the top-level dir's own). Returns (deleted,
    * keptYoung, referenced) counts; never touches a referenced block.
    *
    * The ledger is RE-READ between planning and deleting, so an old
    * orphan adopted by a run that appended after the plan snapshot is
    * skipped. That narrows — not closes — the adoption race (a run can
    * still append mid-loop); full closure needs the single-maintainer
    * discipline every VACUUM implementation assumes: don't run the sweep
    * concurrently with a writer adopting week-old crash remnants. */
  def sweep(log: RunLog, blockRoot: String,
      graceMs: Long = 24L * 3600 * 1000): (Int, Int, Int) = {
    val (referenced, orphans) = plan(log, blockRoot)
    val cutoff = System.currentTimeMillis() - graceMs
    val adopted = log.referencedBlocks // re-read: see Scaladoc
    var deleted = 0
    var young = 0
    orphans.filterNot(adopted).foreach { name =>
      val p = Paths.get(blockRoot, name)
      // a dir another process (or a racing second sweep) removed between
      // plan and this loop is already in the sweep's goal state — count
      // it deleted instead of aborting the whole sweep mid-way
      try {
        if (newestMtime(p) <= cutoff) {
          graft.sources.Layout.deleteRecursively(p); deleted += 1
        } else young += 1
      } catch {
        case _: java.nio.file.NoSuchFileException => deleted += 1
        // Files.walk wraps a mid-walk disappearance in UncheckedIOException
        case e: java.io.UncheckedIOException
            if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] =>
          deleted += 1
      }
    }
    (deleted, young, referenced.size)
  }

  /** Newest mtime of the directory or anything under it — the liveness
    * signal the grace window judges. Throws NoSuchFileException if the
    * root vanished (handled by the sweep loop); a child vanishing during
    * the walk just drops out of the max. */
  private def newestMtime(p: java.nio.file.Path): Long = {
    val walk = Files.walk(p)
    try walk.mapToLong { c =>
      try Files.getLastModifiedTime(c).toMillis
      catch { case _: java.nio.file.NoSuchFileException => Long.MinValue }
    }.max.orElseThrow(() => new java.nio.file.NoSuchFileException(p.toString))
    finally walk.close()
  }
}
