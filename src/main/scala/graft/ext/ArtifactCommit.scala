package graft.ext

import org.apache.spark.sql.SparkSession

/** Shared commit + mutation-lock protocol for multi-table serving
  * artifacts (the persisted ANN index, the scored BM25 full index):
  * a single `_INDEX_SUCCESS` marker whose PAYLOAD names the live
  * snapshot's table directories, flipped atomically via tmp + rename.
  * Mutators build the NEXT snapshot's directories beside the live ones
  * and flip the marker last, so a committed reader is never taken
  * offline by maintenance — it keeps serving the old snapshot until
  * the flip, and a crash mid-mutation leaves only unreferenced orphan
  * directories (reclaimed by the next mutation's retention sweep).
  * (Reference anchor: the reload goroutine serves the OLD in-memory
  * index while a refresh runs, clickhouse.go:155-204 — maintenance is
  * never an outage.)
  *
  * Marker payload: one `key=value` line per entry (values may be
  * comma-separated lists). Parsing is strict enough to fail loudly on
  * a torn write — which the tmp+rename discipline prevents anyway.
  *
  * Mutation lock: exclusive-create `._INDEX_LOCK` carrying an
  * ownership TOKEN (the rollup-claim discipline,
  * streaming/Downsample.scala). A second mutator fails FAST and LOUD;
  * a stale lock from a dead mutator breaks after `staleMs`, and the
  * breaker must re-read its OWN token back before proceeding (two
  * waiters racing a stale break could otherwise each delete the
  * other's fresh lock and both proceed). Holders re-verify the token
  * immediately before every marker flip, so a holder whose lock was
  * broken mid-build can never commit over the breaker's work.
  */
object ArtifactCommit {

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def lockPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/._INDEX_LOCK")

  def markerPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_INDEX_SUCCESS")

  /** Acquire the mutation lock for `dir`, returning the ownership
    * token. `staleConf` names the spark-conf key overriding the stale
    * horizon (default 1 h — longer than any sane build of one
    * artifact). */
  def acquireLock(spark: SparkSession, dir: String,
      staleConf: String = "graft.ann.lockStaleMs",
      what: String = "artifact"): String = {
    val lock = lockPath(dir)
    val fs = fsOf(spark, lock)
    fs.mkdirs(lock.getParent)
    val token = java.util.UUID.randomUUID().toString
    val staleMs = spark.conf.getOption(staleConf)
      .map(_.toLong).getOrElse(3600000L)
    def tryOnce(): Boolean =
      try {
        fs match {
          case _: org.apache.hadoop.fs.LocalFileSystem |
               _: org.apache.hadoop.fs.RawLocalFileSystem =>
            val lp = java.nio.file.Paths.get(lock.toUri.getPath)
            java.nio.file.Files.createFile(lp)
            java.nio.file.Files.write(lp, token.getBytes("UTF-8"))
          case _ =>
            val out = fs.create(lock, false)
            try out.write(token.getBytes("UTF-8")) finally out.close()
        }
        true
      } catch { case _: java.io.IOException => false }
    def busy() = throw new IllegalStateException(
      s"$what at $dir is being mutated by another process (lock $lock); " +
        "concurrent mutations would interleave table writes. If the holder " +
        s"is dead, delete the lock (it auto-breaks after $staleConf).")
    if (tryOnce()) return token
    val st = try Some(fs.getFileStatus(lock)) catch {
      case _: java.io.FileNotFoundException => None
    }
    val stale = st.exists(s =>
      System.currentTimeMillis() - s.getModificationTime > staleMs)
    if (!stale) busy()
    fs.delete(lock, false)
    if (!tryOnce()) busy()
    // Stale-break TOCTOU guard: a SECOND waiter that also judged the old
    // lock stale may delete the lock we just created and plant its own.
    // Only the waiter whose token survives the re-read owns the mutation;
    // everyone else backs off. (The write above and this read are not one
    // atomic op, so exclusive-create alone is not enough after a break.)
    if (!readToken(spark, dir).contains(token)) busy()
    token
  }

  /** The lock's current token, if a readable lock exists. */
  def readToken(spark: SparkSession, dir: String): Option[String] = {
    val lock = lockPath(dir)
    val fs = fsOf(spark, lock)
    try {
      val in = fs.open(lock)
      try Some(new String(in.readAllBytes(), "UTF-8").trim) finally in.close()
    } catch { case _: java.io.IOException => None }
  }

  /** Throw unless the lock still carries `token` — called immediately
    * before every marker flip (the Downsample rollup-claim discipline):
    * a holder whose lock was stale-broken must NOT commit. */
  def verifyLock(spark: SparkSession, dir: String, token: String,
      what: String = "artifact"): Unit =
    if (!readToken(spark, dir).contains(token))
      throw new IllegalStateException(
        s"$what mutation lock at $dir was broken by another process " +
          "mid-build; aborting before commit (the breaker owns the artifact now)")

  /** Release a lock we still own (a stale-break may have replaced it —
    * never delete someone else's). */
  def releaseLock(spark: SparkSession, dir: String, token: String): Unit = {
    val lock = lockPath(dir)
    if (readToken(spark, dir).contains(token)) fsOf(spark, lock).delete(lock, false)
  }

  /** Atomically publish `payload` as the snapshot marker: tmp +
    * rename-over-existing, per filesystem.
    *
    * Hadoop's `FileSystem.rename(src, dst)` REFUSES an existing dst
    * (ChecksumFileSystem, HDFS; S3A "rename" is copy+delete), so the
    * pre-r16 tmp+`fs.rename` form took a delete-then-rename fallback on
    * EVERY replace — and its marker-not-found window was observed by a
    * 1 ms poller mid-rebuild (r15), violating the zero-downtime contract
    * both serving artifacts advertise. The flip is now atomic where the
    * filesystem can do it:
    *   - local FS: `Files.move(tmp, marker, ATOMIC_MOVE,
    *     REPLACE_EXISTING)` — rename(2) replaces atomically; readers see
    *     the old or the new marker, never none. The tmp is NIO-written
    *     (no checksum sidecar) and any legacy `.crc` from a pre-r16
    *     fs-written marker is dropped first — a stale sidecar would fail
    *     verification of the new content, while a missing one is merely
    *     unverified.
    *   - HDFS: `FileContext.rename(…, Options.Rename.OVERWRITE)` —
    *     atomic there by contract.
    *   - object stores with no FileContext binding: the old
    *     delete-then-rename window survives as the last resort, which is
    *     why [[readMarker]] carries a bounded not-found retry on
    *     non-local filesystems (defense in depth, not a license). */
  def writeMarker(spark: SparkSession, dir: String,
      payload: Map[String, String]): Unit = {
    val marker = markerPath(dir)
    val fs = fsOf(spark, marker)
    val bytes = payload.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v\n" }.mkString.getBytes("UTF-8")
    fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val mp = java.nio.file.Paths.get(marker.toUri.getPath)
        java.nio.file.Files.createDirectories(mp.getParent)
        val tmp = mp.resolveSibling(
          s"._INDEX_SUCCESS.tmp-${java.util.UUID.randomUUID()}")
        try {
          java.nio.file.Files.write(tmp, bytes)
          java.nio.file.Files.deleteIfExists(
            mp.resolveSibling("._INDEX_SUCCESS.crc"))
          java.nio.file.Files.move(tmp, mp,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } catch {
          case e: Throwable =>
            try java.nio.file.Files.deleteIfExists(tmp)
            catch { case _: java.io.IOException => () }
            throw e
        }
      case _ =>
        val tmp = new org.apache.hadoop.fs.Path(
          s"$dir/._INDEX_SUCCESS.tmp-${java.util.UUID.randomUUID()}")
        try {
          val out = fs.create(tmp, true)
          try out.write(bytes) finally out.close()
          try {
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(
              marker.toUri, spark.sparkContext.hadoopConfiguration)
            fc.rename(tmp, marker, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          } catch {
            case _: org.apache.hadoop.fs.UnsupportedFileSystemException |
                 _: UnsupportedOperationException =>
              // last resort (object store without an AbstractFileSystem
              // binding): the replace has a not-found window; readers
              // retry (readMarker)
              if (fs.exists(marker)) fs.delete(marker, false)
              if (!fs.rename(tmp, marker))
                throw new java.io.IOException(
                  s"artifact marker rename failed: $tmp -> $marker")
          }
        } catch {
          case e: Throwable =>
            try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
            throw e
        }
    }
  }

  /** Parse the live snapshot marker, if committed. Keys and values are
    * trimmed; blank lines ignored; the first `=` splits. On a NON-local
    * filesystem a not-found gets ONE bounded retry: the only replace
    * path with a marker-absent window is the object-store
    * delete-then-rename last resort in [[writeMarker]] (local flips are
    * ATOMIC_MOVE, HDFS flips are Rename.OVERWRITE — no window), so the
    * retry is defense in depth there and dead code here. */
  def readMarker(spark: SparkSession, dir: String): Option[Map[String, String]] = {
    val marker = markerPath(dir)
    val fs = fsOf(spark, marker)
    def once(): Option[Map[String, String]] =
      try {
        val in = fs.open(marker)
        val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        Some(text.split('\n').map(_.trim).filter(_.nonEmpty).map { line =>
          val i = line.indexOf('=')
          require(i > 0, s"malformed marker line at $marker: '$line' " +
            "(a bare word here is a legacy pre-versioned marker — " +
            "rebuild the artifact to migrate it)")
          (line.substring(0, i), line.substring(i + 1))
        }.toMap)
      } catch { case _: java.io.FileNotFoundException => None }
    val local = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    once().orElse {
      // the not-found window only exists DURING a flip; an artifact whose
      // directory doesn't exist yet has never been built, so the common
      // poll-before-first-build path returns immediately instead of
      // paying the sleep (r16 ADVICE)
      if (local || !fs.exists(marker.getParent)) None
      else { Thread.sleep(25); once() }
    }
  }

  /** True iff a snapshot marker is present. Same non-local bounded
    * retry as [[readMarker]] — on local FS and HDFS the flip is atomic
    * and a single `exists` is the truth. */
  def committed(spark: SparkSession, dir: String): Boolean = {
    val marker = markerPath(dir)
    val fs = fsOf(spark, marker)
    val local = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    fs.exists(marker) || {
      // see readMarker: a never-built artifact (no directory) has no flip
      // window to retry against
      if (local || !fs.exists(marker.getParent)) false
      else { Thread.sleep(25); fs.exists(marker) }
    }
  }

  /** Retention sweep after a marker flip: under each `root` (an
    * artifact table directory holding `v=N` snapshot subdirectories),
    * delete every version directory referenced by NEITHER `keep` set —
    * callers pass the NEW snapshot's dirs plus the PRIOR snapshot's
    * (kept one generation for in-flight readers mid-scan of the old
    * files; two flips later it goes). Paths in `keep` are relative to
    * `dir`. Best-effort: a failed delete is an orphan the next sweep
    * retries, never an error. */
  def sweepVersions(spark: SparkSession, dir: String, tableRoots: Seq[String],
      keep: Set[String]): Unit = {
    tableRoots.foreach { root =>
      val rp = new org.apache.hadoop.fs.Path(s"$dir/$root")
      val fs = fsOf(spark, rp)
      val kids = try fs.listStatus(rp) catch {
        case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus]
      }
      kids.filter(k => k.isDirectory && k.getPath.getName.startsWith("v="))
        .foreach { k =>
          val rel = s"$root/${k.getPath.getName}"
          val referenced = keep.exists(p => p == rel || p.startsWith(rel + "/"))
          if (!referenced)
            try fs.delete(k.getPath, true)
            catch { case _: java.io.IOException => () }
        }
    }
  }
}
