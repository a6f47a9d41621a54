package graft.engine

import java.nio.file.{Files, Path, Paths}

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
    dirs.partition(referenced)
  }

  /** Delete orphaned block directories older than `graceMs` (by last
    * modification of the directory itself — a landing still being
    * written keeps touching it). Returns (deleted, keptYoung, referenced)
    * counts; never touches a referenced block. */
  def sweep(log: RunLog, blockRoot: String,
      graceMs: Long = 24L * 3600 * 1000): (Int, Int, Int) = {
    val (referenced, orphans) = plan(log, blockRoot)
    val cutoff = System.currentTimeMillis() - graceMs
    var deleted = 0
    var young = 0
    orphans.foreach { name =>
      val p = Paths.get(blockRoot, name)
      if (Files.getLastModifiedTime(p).toMillis <= cutoff) {
        deleteRecursively(p); deleted += 1
      } else young += 1
    }
    (deleted, young, referenced.size)
  }

  private def deleteRecursively(p: Path): Unit = {
    val walk = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
    } finally walk.close()
  }
}
