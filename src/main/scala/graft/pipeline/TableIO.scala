package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** The commit-layer seam between the extraction pipeline and the table
  * format (ICEBERG.md encoded as an interface instead of prose).
  *
  * Data files are parquet either way — what a table format changes is the
  * COMMIT protocol: how a bucket's completion becomes visible atomically,
  * and how readers discover the committed set. `ResumableExtract` writes
  * data, validates it, then calls `commitBucket`; readers ask
  * `committedBuckets` and scan only those bucket directories. Swapping the
  * implementation swaps the Iceberg touchpoints compile-checked:
  *
  *  - [[ParquetManifestIO]] — one tiny JSON manifest file per bucket,
  *    atomic-renamed into place (the sandbox stand-in; round-1/2 behavior).
  *  - [[SnapshotLogIO]] — an Iceberg-HadoopTableOperations-style snapshot
  *    log: every commit writes an immutable `vN.json` snapshot holding the
  *    FULL committed state and flips `version-hint.text` atomically. Commits
  *    are serialized snapshots, rollback = committing a snapshot without the
  *    bucket — the semantics Iceberg's real catalog provides, minus the jars
  *    (absent in this sandbox, zero egress).
  */
final case class BucketStat(bucket: Int, turns: Long, modules: Long, errors: Long)

trait TableIO extends Serializable {

  def init(outDir: String): Unit

  /** Buckets whose commit landed — the only buckets a reader may scan. */
  def committedBuckets(outDir: String): Seq[Int]

  /** Atomically publish one bucket (called only AFTER its data files are
    * fully written and validated). Crash before this call = the bucket is
    * invisible and will be redone; crash after = it is durably committed. */
  def commitBucket(outDir: String, stat: BucketStat): Unit

  /** Remove a bucket from the committed set (test/crash-simulation hook;
    * Iceberg's rollback-to-snapshot analog). Data files are left in place —
    * an uncommitted bucket's directory is overwritten by the redo. */
  def rollback(outDir: String, bucket: Int): Unit
}

/** Per-bucket JSON manifest files under `_manifest/`, committed by atomic
  * rename — the plain-filesystem stand-in. */
object ParquetManifestIO extends TableIO {

  private def manifestPath(outDir: String, bucket: Int): Path =
    Paths.get(outDir, "_manifest", f"bucket-$bucket%05d.json")

  override def init(outDir: String): Unit =
    Files.createDirectories(Paths.get(outDir, "_manifest"))

  override def committedBuckets(outDir: String): Seq[Int] = {
    val dir = Paths.get(outDir, "_manifest")
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val stream = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .map(_.getFileName.toString)
          .flatMap { n =>
            // digits-only between the markers: a stray foreign file in the
            // manifest dir (operator backup, editor temp) must be ignored,
            // not crash the read with NumberFormatException
            val mid = n.stripPrefix("bucket-").stripSuffix(".json")
            if (n.startsWith("bucket-") && n.endsWith(".json") &&
              mid.nonEmpty && mid.forall(_.isDigit)) Some(mid.toInt)
            else None
          }
          .toSeq.sorted
      } finally stream.close()
    }
  }

  override def commitBucket(outDir: String, stat: BucketStat): Unit = {
    val json =
      s"""{"bucket":${stat.bucket},"turns":${stat.turns},"modules":${stat.modules},""" +
        s""""errors":${stat.errors},"watermark":"complete"}"""
    val target = manifestPath(outDir, stat.bucket)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, json)
    // REPLACE_EXISTING: re-committing a bucket (redo after rollback, or a
    // crash between data rewrite and manifest move) must overwrite the stale
    // manifest — ATOMIC_MOVE alone leaves replace behavior
    // implementation-specific and can wedge with FileAlreadyExistsException
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def rollback(outDir: String, bucket: Int): Unit =
    Files.deleteIfExists(manifestPath(outDir, bucket))
}

/** Iceberg-style snapshot log: immutable versioned snapshots + an atomic
  * version pointer. Mirrors HadoopTableOperations' commit protocol
  * (version-hint file + vN metadata), so the swap to real Iceberg is a
  * mechanical re-targeting of this class onto the catalog API. */
object SnapshotLogIO extends TableIO {

  private def metaDir(outDir: String): Path = Paths.get(outDir, "metadata")
  private def hintPath(outDir: String): Path = metaDir(outDir).resolve("version-hint.text")

  override def init(outDir: String): Unit = Files.createDirectories(metaDir(outDir))

  /** Raised when a commit loses the version-file CAS to a concurrent
    * committer. The caller refreshes (re-reads current state) and retries —
    * Iceberg's CommitFailedException contract. */
  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  /** Version discovery mirrors HadoopTableOperations.findVersion: start at
    * the hint, then probe forward while v(N+1).json exists. The snapshot-file
    * rename is the commit point; the hint is only a hint. A crash between the
    * vN.json move and the hint flip leaves an orphan vN.json — probing adopts
    * it as committed instead of letting the next commit wedge on it. */
  private def currentVersion(outDir: String): Int = {
    val hint = hintPath(outDir)
    var v = if (Files.exists(hint)) Files.readString(hint).trim.toInt else 0
    while (Files.exists(metaDir(outDir).resolve(s"v${v + 1}.json"))) v += 1
    v
  }

  /** Committed state = the bucket list inside the current snapshot. */
  override def committedBuckets(outDir: String): Seq[Int] = {
    val v = currentVersion(outDir)
    if (v == 0) Seq.empty
    else {
      val body = Files.readString(metaDir(outDir).resolve(s"v$v.json"))
      // snapshot body: {"version":N,"buckets":[{"bucket":B,...},...]}
      "\"bucket\":(\\d+)".r.findAllMatchIn(body).map(_.group(1).toInt).toSeq.sorted
    }
  }

  /** Publish `stats` as snapshot `v`. The EXCLUSIVE rename onto v$v.json is
    * the compare-and-swap: if another committer already published that
    * version, the move fails and we surface a loud [[CommitConflictException]]
    * instead of silently clobbering the winner's snapshot. Package-private so
    * the concurrent-commit contract spec can race two committers
    * deterministically at the same version. */
  private[pipeline] def publishAt(outDir: String, v: Int, stats: Seq[BucketStat]): Unit = {
    val body = stats.sortBy(_.bucket).map { s =>
      s"""{"bucket":${s.bucket},"turns":${s.turns},"modules":${s.modules},"errors":${s.errors}}"""
    }.mkString(s"""{"version":$v,"buckets":[""", ",", "]}")
    val target = metaDir(outDir).resolve(s"v$v.json")
    // tmp name carries a unique suffix: two racing committers must not
    // overwrite each other's STAGED bytes either
    val tmp = target.resolveSibling(
      s"v$v.json.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.writeString(tmp, body)
    // createLink, not ATOMIC_MOVE: POSIX rename(2) silently REPLACES an
    // existing target, so a move is not a compare-and-swap. A hard link is
    // atomic AND exclusive — exactly one of two racing committers creates
    // v$v.json; the other gets FileAlreadyExistsException.
    try { Files.createLink(target, tmp); Files.deleteIfExists(tmp) }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new CommitConflictException(
          s"snapshot v$v already committed by a concurrent writer; " +
            "refresh and retry")
      case e: UnsupportedOperationException =>
        // Some network/object-store mounts don't support hard links; name
        // the requirement instead of surfacing a bare UOE per commit.
        Files.deleteIfExists(tmp)
        throw new UnsupportedOperationException(
          "SnapshotLogIO commit requires hard-link support (atomic-" +
            "exclusive Files.createLink) on the metadata filesystem; " +
            s"'${metaDir(outDir)}' does not provide it. Host the snapshot " +
            "log on a POSIX filesystem, or swap the commit primitive for " +
            "a catalog CAS (see ICEBERG.md)", e)
    }
    // flip the pointer last, atomically — a pure optimization for readers:
    // the version-file rename above was the real commit point
    val hintTmp = hintPath(outDir).resolveSibling(
      s"version-hint.text.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.writeString(hintTmp, v.toString)
    Files.move(hintTmp, hintPath(outDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def statsAt(outDir: String, v: Int): Seq[BucketStat] = {
    if (v == 0) Seq.empty
    else {
      val body = Files.readString(metaDir(outDir).resolve(s"v$v.json"))
      val entry =
        ("""\{"bucket":(\d+),"turns":(\d+),"modules":(\d+),"errors":(\d+)\}""").r
      entry.findAllMatchIn(body).map(m =>
        BucketStat(m.group(1).toInt, m.group(2).toLong,
          m.group(3).toLong, m.group(4).toLong)).toSeq
    }
  }

  /** Read-modify-publish with bounded CAS retry: read version v, edit v's
    * stats, publish at EXACTLY v+1 — one version read per attempt, so any
    * concurrent commit between the read and the publish trips the CAS (a
    * stale edit can never skip past a version it did not read). On conflict,
    * refresh and re-attempt — the Iceberg commit-retry loop. Progress is
    * guaranteed: each conflict means some OTHER committer advanced. */
  private def retrying(outDir: String, attempts: Int = 64)(
      edit: Seq[BucketStat] => Seq[BucketStat]): Unit = {
    var left = attempts
    while (left > 0) {
      val v = currentVersion(outDir)
      try { publishAt(outDir, v + 1, edit(statsAt(outDir, v))); return }
      catch { case _: CommitConflictException if left > 1 => left -= 1 }
    }
  }

  override def commitBucket(outDir: String, stat: BucketStat): Unit =
    retrying(outDir)(cur => cur.filterNot(_.bucket == stat.bucket) :+ stat)

  override def rollback(outDir: String, bucket: Int): Unit =
    retrying(outDir)(cur => cur.filterNot(_.bucket == bucket))
}
