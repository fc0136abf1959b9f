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
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
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

  private def currentVersion(outDir: String): Int = {
    val hint = hintPath(outDir)
    if (Files.exists(hint)) Files.readString(hint).trim.toInt else 0
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

  private def writeSnapshot(outDir: String, stats: Seq[BucketStat]): Unit = {
    val v = currentVersion(outDir) + 1
    val body = stats.sortBy(_.bucket).map { s =>
      s"""{"bucket":${s.bucket},"turns":${s.turns},"modules":${s.modules},"errors":${s.errors}}"""
    }.mkString(s"""{"version":$v,"buckets":[""", ",", "]}")
    val target = metaDir(outDir).resolve(s"v$v.json")
    val tmp = target.resolveSibling(s"v$v.json.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    // flip the pointer last, atomically — the commit point
    val hintTmp = hintPath(outDir).resolveSibling("version-hint.text.tmp")
    Files.writeString(hintTmp, v.toString)
    Files.move(hintTmp, hintPath(outDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def currentStats(outDir: String): Seq[BucketStat] = {
    val v = currentVersion(outDir)
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

  override def commitBucket(outDir: String, stat: BucketStat): Unit =
    writeSnapshot(outDir,
      currentStats(outDir).filterNot(_.bucket == stat.bucket) :+ stat)

  override def rollback(outDir: String, bucket: Int): Unit =
    writeSnapshot(outDir, currentStats(outDir).filterNot(_.bucket == bucket))
}
