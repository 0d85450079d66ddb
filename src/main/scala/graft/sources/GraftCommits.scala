package graft.sources

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-table COMMIT JOURNAL — the feed positions and file accounting
  * behind batch-DML change capture and per-commit time travel (r14
  * verdict items 1–2; Delta's `_delta_log` / Iceberg's snapshot
  * metadata re-expressed as one tiny record file per commit, written
  * inside the commit-lock critical section every batch publish already
  * runs under).
  *
  * Every ROW-CHANGING batch commit appends one record carrying:
  *
  *  - `id` — the table's monotonic commit sequence, assigned under the
  *    table commit lock ([[GraftCommitLock]] serializes committers, so
  *    max+1 is race-free). Batch `_change_epoch` values ARE these ids.
  *  - `adds` — relative paths the commit made visible;
  *  - `removes` — relative paths the commit retired, each with the
  *    tombstone commit directory ([[GraftRetired]]) that preserves its
  *    bytes (empty = not preserved: the preimage is unservable);
  *  - `dv` — per-file row ordinals NEWLY deleted by a merge-on-read
  *    DELETE (the delta, not the merged vector — replaying the deltas
  *    reconstructs any commit's deletion state exactly).
  *
  * Kinds split three ways:
  *
  *  - FEED-VISIBLE (`append`, `overwrite`, `rewrite`, `delete`,
  *    `mor_delete`): served by `<t>.changes` as insert/delete rows.
  *  - FLOOR (`genesis`, `replace`, `rollback`): account for files
  *    whose row-level history is NOT captured — the pre-journal
  *    generation, a full replace that superseded every row, or a
  *    rollback that rewrote history out from under mid-stream
  *    consumers. The feed serves only ids ABOVE the max floor;
  *    explicit bounds at or below it refuse loudly (the same contract
  *    as the streaming rewrite-deletes horizon). Consumers
  *    re-bootstrap from table state. A rollback record's `dv` is the
  *    ABSOLUTE post-rollback deletion state (replay resets to it),
  *    not a delta.
  *  - NEUTRAL (`maintenance`): file churn with no logical row change
  *    (compaction) — accounted, never fed.
  *
  * Self-healing by construction: a full-directory swap (create-or-
  * replace, compact via safeSwapWrite) replaces the table dir and the
  * journal inside it; the next journaled commit finds visible files no
  * record accounts for and writes a `genesis` floor record claiming
  * them. A write path that bypasses the journal therefore degrades to
  * a LOUD feed refusal (unaccounted files), never a silent gap, and
  * `CALL system.compact` always resets the table to a servable state.
  *
  * Crash window: records are finalized AFTER their commit's publish,
  * still under the lock. A crash in between leaves published files
  * unjournaled — the next feed read refuses on the accounting check
  * and the next commit's genesis/claim logic re-converges. Loud, never
  * silently partial (the engine-wide refusal posture).
  *
  * Scale: one O(100 B) record per commit; assignment lists ONLY the
  * journal directory (bounded by commit count, prunable with history
  * expiry); no data listing beyond what the owning commit already
  * performs. Stream epochs do NOT journal — their feed derives from
  * epoch-named files ([[GraftChanges]]); a table mixing live stream
  * emissions with feed-visible batch records refuses the feed.
  */
private[graft] object GraftCommits {

  val DirName = "_graft_commits"

  /** Feed-visible row-changing kinds (`_change_type` mapping: adds →
    * insert, removes/dv → delete).
    */
  val FeedKinds: Set[String] =
    Set("append", "overwrite", "rewrite", "delete", "mor_delete")

  /** Kinds that FLOOR the feed: history at or below them is not
    * row-level-servable.
    */
  val FloorKinds: Set[String] = Set("genesis", "replace", "rollback")

  val NeutralKinds: Set[String] = Set("maintenance")

  final case class Remove(rel: String, tomb: String)

  /** Free-form record annotation (5th header column, absent on legacy
    * records): row-level commits carry their originating COMMAND
    * (`update` / `merge` / `delete`) so the changes feed can label
    * Delta-CDF update pairs; stream-epoch records carry `tag:epoch`.
    */
  final case class Rec(id: Long, kind: String, ts: Long,
      adds: Seq[String], removes: Seq[Remove],
      dv: Map[String, Array[Long]], note: String = "") {
    require(FeedKinds(kind) || FloorKinds(kind) || NeutralKinds(kind),
      s"unknown commit kind '$kind'")
    def feedVisible: Boolean = FeedKinds(kind)
    def isFloor: Boolean = FloorKinds(kind)
  }

  def dir(tableDir: Path): Path = new Path(tableDir, DirName)

  def exists(fs: FileSystem, tableDir: Path): Boolean =
    try fs.exists(dir(tableDir)) && fs.listStatus(dir(tableDir))
      .exists(_.getPath.getName.endsWith(".rec"))
    catch { case _: java.io.FileNotFoundException => false }

  // ---- record codec (TSV + base64, the sidecar house style) -------------

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  private def recName(id: Long): String = f"c$id%012d.rec"

  private def render(r: Rec): String = {
    val sb = new StringBuilder
    // note rides as a 5th header column; b64("") renders empty and
    // split drops the trailing field, so legacy parsers stay compatible
    sb.append(s"v1\t${r.id}\t${r.kind}\t${r.ts}\t${b64(r.note)}\n")
    r.adds.foreach(a => sb.append(s"A\t${b64(a)}\n"))
    r.removes.foreach(rm => sb.append(s"R\t${b64(rm.rel)}\t${b64(rm.tomb)}\n"))
    r.dv.foreach { case (rel, ords) =>
      sb.append(s"D\t${b64(rel)}\t${ords.mkString(",")}\n")
    }
    sb.toString
  }

  private def parse(txt: String): Rec = {
    val lines = txt.split('\n').filter(_.nonEmpty)
    val hdr = lines.head.split('\t')
    require(hdr.length >= 4 && hdr(0) == "v1", s"bad commit record: $txt")
    val adds = Seq.newBuilder[String]
    val removes = Seq.newBuilder[Remove]
    val dv = Map.newBuilder[String, Array[Long]]
    lines.tail.foreach { ln =>
      val f = ln.split('\t')
      f(0) match {
        case "A" => adds += unb64(f(1))
        case "R" => removes += Remove(unb64(f(1)),
          if (f.length > 2) unb64(f(2)) else "")
        case "D" => dv += (unb64(f(1)) ->
          (if (f.length > 2 && f(2).nonEmpty)
            f(2).split(',').map(_.toLong) else Array.empty[Long]))
        case other => throw new IllegalStateException(
          s"bad commit record line tag '$other'")
      }
    }
    Rec(hdr(1).toLong, hdr(2), hdr(3).toLong,
      adds.result(), removes.result(), dv.result(),
      note = if (hdr.length > 4 && hdr(4).nonEmpty) unb64(hdr(4)) else "")
  }

  /** All records, id-ascending. Cheap: one listStatus of the journal
    * dir + one small read per record (bounded by commit count).
    */
  def list(fs: FileSystem, tableDir: Path): Seq[Rec] = {
    val d = dir(tableDir)
    val statuses =
      try fs.listStatus(d)
      catch { case _: java.io.FileNotFoundException => return Nil }
    statuses.toSeq.filter(st => st.isFile &&
        st.getPath.getName.matches("c\\d{12}\\.rec"))
      .map { st =>
        val in = fs.open(st.getPath)
        try parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        finally in.close()
      }.sortBy(_.id)
  }

  // ---- recording (caller holds the table commit lock) -------------------

  /** Names stamped by the STREAMING writers — outside the journal's
    * accounting universe (their feed derives from the names
    * themselves; [[GraftChanges]] owns that contract).
    */
  private def isStreamArtifact(name: String): Boolean =
    GraftEqDel.emissionOf(name).isDefined || GraftEqDel.hasFloorStamp(name)

  /** The accounting universe: visible batch data files as table-
    * relative paths.
    */
  def universe(fs: FileSystem, tableDir: Path): Set[String] = {
    val base = fs.makeQualified(tableDir).toUri.getPath
    GraftEvolved.listVisible(fs, tableDir)
      .filterNot(st => isStreamArtifact(st.getPath.getName))
      .map(st => fs.makeQualified(st.getPath).toUri.getPath
        .stripPrefix(base).stripPrefix("/"))
      .toSet
  }

  def relOf(fs: FileSystem, tableDir: Path, p: Path): String = {
    val base = fs.makeQualified(tableDir).toUri.getPath
    val q = fs.makeQualified(p).toUri.getPath
    require(q.startsWith(base + "/"),
      s"commit journal: $p is not under $tableDir")
    q.stripPrefix(base).stripPrefix("/")
  }

  private def writeRec(fs: FileSystem, tableDir: Path, r: Rec): Unit = {
    val d = dir(tableDir)
    fs.mkdirs(d)
    val out = fs.create(new Path(d, recName(r.id)), false)
    try out.write(render(r).getBytes("UTF-8"))
    finally out.close()
  }

  /** Append one commit record. MUST run inside the table's commit-lock
    * critical section, after the commit's publish/retire completed.
    * If the journal is empty and OTHER visible batch files exist (the
    * pre-journal generation, or a post-swap generation), a `genesis`
    * floor record claims them first so accounting stays total.
    * Returns the assigned commit id.
    */
  def record(fs: FileSystem, tableDir: Path, kind: String,
      adds: Seq[String], removes: Seq[Remove] = Nil,
      dv: Map[String, Array[Long]] = Map.empty,
      note: String = ""): Long = {
    val existing = list(fs, tableDir)
    var nextId = existing.lastOption.map(_.id + 1).getOrElse(0L)
    if (existing.isEmpty) {
      val others = universe(fs, tableDir) -- adds -- removes.map(_.rel)
      if (others.nonEmpty) {
        writeRec(fs, tableDir, Rec(nextId, "genesis",
          System.currentTimeMillis(), others.toSeq.sorted, Nil, Map.empty))
        nextId += 1
      }
    }
    writeRec(fs, tableDir,
      Rec(nextId, kind, System.currentTimeMillis(), adds, removes, dv, note))
    nextId
  }

  /** Append a record whose adds are CLAIMED as the visible batch files
    * not present in `before` (for publish paths that don't know their
    * final file names — the V1 append, delegated Spark writes). The
    * claim runs under the lock and ALSO subtracts the journal's own
    * accounted-live set (ADVICE r15 medium): a `before` listed before
    * an unlocked save can miss a concurrent committer's just-published
    * files, and two such committers would otherwise each claim the
    * other's files — the feed would serve those rows as inserts TWICE
    * under two ids. Diffing against the journal's accounting is
    * monotonic under the lock, so every file lands in exactly one
    * record's adds (a racing pair may attribute the slower save to the
    * faster record's id — same rows, served once, net-change intact).
    * An unjournaled foreign writer still degrades to the loud feed
    * accounting refusal, never misattribution of a SERVED row.
    */
  def recordClaiming(fs: FileSystem, tableDir: Path, kind: String,
      before: Set[String], removes: Seq[Remove] = Nil,
      dv: Map[String, Array[Long]] = Map.empty,
      note: String = ""): Long = {
    val existing = list(fs, tableDir)
    val now = universe(fs, tableDir)
    val claim = (now -- before -- accountedLive(existing)).toSeq.sorted
    var nextId = existing.lastOption.map(_.id + 1).getOrElse(0L)
    if (existing.isEmpty) {
      val others = now -- claim -- removes.map(_.rel)
      if (others.nonEmpty) {
        writeRec(fs, tableDir, Rec(nextId, "genesis",
          System.currentTimeMillis(), others.toSeq.sorted, Nil, Map.empty))
        nextId += 1
      }
    }
    writeRec(fs, tableDir,
      Rec(nextId, kind, System.currentTimeMillis(), claim, removes, dv,
        note))
    nextId
  }

  /** The rel paths the journal currently accounts as live: every
    * record's adds minus later removes. The race-free component of the
    * claiming baseline — unlike a directory listing, it only ever
    * grows under the commit lock.
    */
  def accountedLive(recs: Seq[Rec]): Set[String] = {
    val files = scala.collection.mutable.HashSet.empty[String]
    recs.foreach { r =>
      r.removes.foreach(rm => files -= rm.rel)
      files ++= r.adds
    }
    files.toSet
  }

  /** Best-effort journaling wrapper for commit paths: the journal is
    * derived metadata — a failure to record must not fail a commit
    * whose data publish already succeeded (the feed's accounting check
    * turns the gap into a loud refusal instead).
    */
  def tryRecord(fs: FileSystem, tableDir: Path, kind: String,
      adds: => Seq[String], removes: => Seq[Remove] = Nil,
      dv: => Map[String, Array[Long]] = Map.empty,
      note: String = ""): Unit =
    try { record(fs, tableDir, kind, adds, removes, dv, note); () }
    catch { case NonFatal(e) => logWarn(tableDir, kind, e) }

  def tryRecordClaiming(fs: FileSystem, tableDir: Path, kind: String,
      before: => Set[String], removes: => Seq[Remove] = Nil,
      dv: => Map[String, Array[Long]] = Map.empty,
      note: String = ""): Unit =
    try { recordClaiming(fs, tableDir, kind, before, removes, dv, note); () }
    catch { case NonFatal(e) => logWarn(tableDir, kind, e) }

  private def logWarn(tableDir: Path, kind: String, e: Throwable): Unit =
    System.err.println(s"[graft] WARN commit journal: could not record " +
      s"$kind on $tableDir: ${e.getMessage} — the changes feed will " +
      "refuse until CALL system.compact resets the table")

  // ---- replay (per-commit time travel / rollback) ------------------------

  /** The table's logical file/deletion state AS OF commit `id`:
    * rel path -> the commit that added the live instance, and
    * rel path -> deleted row ordinals accumulated on that instance.
    * Pure journal replay — no filesystem access.
    */
  def stateAt(recs: Seq[Rec], id: Long)
      : (Map[String, Long], Map[String, Array[Long]]) = {
    val files = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val dv = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.SortedSet[Long]]
    recs.takeWhile(_.id <= id).foreach { r =>
      r.removes.foreach { rm => files.remove(rm.rel); dv.remove(rm.rel) }
      r.adds.foreach { a => files.update(a, r.id); dv.remove(a) }
      if (r.kind == "rollback") {
        // a rollback REBUILT the whole table's deletion-vector state
        // (dropAll + replay-to-target); its record carries that state
        // ABSOLUTELY. Without the reset, post-target mor_delete deltas
        // on kept-live files would linger in replay and `VERSION AS OF
        // 'c<rollbackId>'` would hide rows the live table serves — and
        // restored files' target-time deletions would be lost entirely
        // (ADVICE r15 medium).
        dv.clear()
      }
      r.dv.foreach { case (rel, ords) =>
        dv.getOrElseUpdate(rel,
          scala.collection.mutable.SortedSet.empty[Long]) ++= ords
      }
    }
    (files.toMap, dv.map { case (k, v) => (k, v.toArray) }.toMap)
  }

  /** ROLLBACK to the state as of commit `target` (Iceberg's
    * `rollback_to_snapshot`, Delta's RESTORE): under the table commit
    * lock, files added after the target retire (tombstoned — the
    * rolled-back history stays time-travelable), files the target had
    * that were since removed rename back from their tombstones (the
    * SAME bytes — one rename per file, the retire cost class), and
    * deletion-vector state is rebuilt from the replayed per-commit
    * deltas. The rollback journals as a FLOOR record: the feed serves
    * only commits after it, so a CDC consumer mid-history gets the
    * loud lagging refusal and re-bootstraps — never a silently
    * rewritten delivery (the Delta RESTORE-under-CDF posture).
    *
    * Returns (files restored, files retired).
    */
  def rollbackToCommit(fs: FileSystem, tableDir: Path, target: Long)
      : (Int, Int) = {
    var out = (0, 0)
    GraftCommitLock.withLock(fs, tableDir, s"rollback-c$target") {
      GraftEqDel.requireNone(fs, tableDir, "a commit rollback")
      val recs = list(fs, tableDir)
      require(recs.exists(_.id == target),
        s"$tableDir has no commit $target (journal: " +
          s"${recs.map(_.id).mkString(",")})")
      val (want, wantDv) = stateAt(recs, target)
      // every wanted instance must still exist somewhere
      val resolved: Map[String, Path] = want.map { case (rel, addId) =>
        (rel, resolveInstance(fs, tableDir, recs, rel, addId).getOrElse(
          throw new IllegalArgumentException(
            s"$tableDir: cannot roll back to commit $target — the " +
              s"tombstone preserving $rel was expired by remove_orphans")))
      }
      val current = universe(fs, tableDir)
      val toRetire = (current -- want.keySet).toSeq.sorted
      val qualBase = fs.makeQualified(tableDir).toString
      val toRestore = resolved.filter { case (rel, p) =>
        fs.makeQualified(p).toString != s"$qualBase/$rel"
      }.toSeq.sortBy(_._1)
      // phase 1 — retire the post-target generation (tombstoned, so
      // the rolled-back-PAST state remains addressable)
      val tomb = GraftRetired.retireFiles(fs, tableDir,
        toRetire.map(new Path(tableDir, _)))
      // phase 2 — restore parked instances (same bytes, one rename)
      toRestore.foreach { case (rel, parked) =>
        val dest = new Path(tableDir, rel)
        fs.mkdirs(dest.getParent)
        require(fs.rename(parked, dest),
          s"rollback: could not restore $parked as $dest")
      }
      // phase 3 — deletion-vector state replays to the target
      GraftDv.dropAll(fs, tableDir)
      wantDv.foreach { case (rel, ords) =>
        if (want.contains(rel) && ords.nonEmpty) {
          val st = fs.getFileStatus(new Path(tableDir, rel))
          GraftDv.write(fs, tableDir,
            GraftDv.Dv(rel, st.getLen, st.getModificationTime, ords))
        }
      }
      // phase 4 — the floor record (restored rels re-listed as adds so
      // instance resolution finds the moved-back copies; dv carries the
      // target's FULL deletion state — stateAt replays rollback dv as
      // an absolute reset, matching phase 3's dropAll + rebuild)
      record(fs, tableDir, "rollback",
        adds = toRestore.map(_._1),
        removes = toRetire.map(Remove(_, tomb.getOrElse(""))),
        dv = wantDv.filter { case (rel, ords) =>
          want.contains(rel) && ords.nonEmpty
        })
      out = (toRestore.size, toRetire.size)
    }
    out
  }

  /** Where the instance of `rel` ADDED at commit `addId` lives NOW:
    * the live table if never removed since; the removing commit's
    * tombstone ([[GraftRetired]] preserves relative layout); or — when
    * a rollback restored the same instance — the live table again.
    * None = the preserving tombstone was GC'd: not servable.
    */
  def resolveInstance(fs: FileSystem, tableDir: Path, recs: Seq[Rec],
      rel: String, addId: Long): Option[Path] = {
    val livePath = new Path(tableDir, rel)
    recs.find(r => r.id > addId && r.removes.exists(_.rel == rel)) match {
      case None =>
        if (fs.exists(livePath)) Some(livePath) else None
      case Some(r) =>
        val tomb = r.removes.find(_.rel == rel).get.tomb
        val parked = new Path(GraftRetired.retiredRoot(tableDir),
          s"$tomb/$rel")
        if (tomb.nonEmpty && fs.exists(parked)) Some(parked)
        else if (recs.exists(r2 => r2.id > r.id && r2.adds.contains(rel))
            && fs.exists(livePath))
          // rollback-restored: the SAME instance moved back live (the
          // restore record re-added the rel) — identical bytes
          Some(livePath)
        else None
    }
  }
}
