package graft.sources

import java.io.FileNotFoundException
import java.net.URI
import java.nio.file.{Files, LinkOption, NoSuchFileException}
import java.nio.file.attribute.{PosixFileAttributes, PosixFilePermission}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FsConstants, FsServerDefaults, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Fork-free local filesystem (guide §6: metadata cost).
  *
  * Hadoop's `RawLocalFileSystem` without the libhadoop native library
  * shells out for POSIX metadata: `setPermission` execs `chmod` (and
  * every `create`/`mkdirs` calls it), symlink-aware statuses exec
  * `readlink`, and lazily-loaded permissions exec `ls -ld` — measured
  * on this box at 4-9 MILLISECONDS per operation (tools.MicroFs), a
  * process fork each, so a catalog statement creating a handful of
  * journal/commit/data files pays tens of milliseconds of pure fork
  * overhead and the DML tier pays seconds per query. The same
  * operations through `java.nio.file` are single syscalls (~2-10 µs).
  *
  * These subclasses replace only the metadata mechanism — semantics
  * (checksum sidecars, rename/create contracts, FileStatus fields)
  * are unchanged, so file layout and query results are identical.
  * Wired in [[graft.runtime.GraftSession]] via `fs.file.impl` /
  * `fs.AbstractFileSystem.file.impl` (the latter covers FileContext,
  * which streaming checkpoints use). Production deployments on
  * HDFS/S3 never hit the `file://` impl, so this is a local-adapter
  * fix, not a tuned-for-local config.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  import NioLocalFsUtil._

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val s = permission.toShort.toInt
    // anything beyond the 9 rwx bits (sticky is 0x200 in FsPermission's
    // encoding; setuid/setgid aren't representable at all) can't be
    // expressed as PosixFilePermissions: keep Hadoop's shell path for
    // those (never used by Spark locally) instead of silently dropping
    // the bit (r17 ADVICE)
    if ((s & ~0x1ff) != 0) super.setPermission(p, permission)
    else {
      try Files.setPosixFilePermissions(pathToFile(p).toPath, permsOf(s))
      catch {
        case _: NoSuchFileException =>
          throw new FileNotFoundException(s"File $p does not exist")
      }
    }
  }

  override def getFileStatus(f: Path): FileStatus = {
    val nio = pathToFile(f).toPath
    val attrs =
      try Files.readAttributes(nio, classOf[PosixFileAttributes])
      catch {
        case _: NoSuchFileException =>
          throw new FileNotFoundException(
            s"File $f does not exist")
      }
    statusOf(f, nio, attrs, symlink = null)
  }

  override def getFileLinkStatus(f: Path): FileStatus = {
    val nio = pathToFile(f).toPath
    val attrs =
      try Files.readAttributes(nio, classOf[PosixFileAttributes],
        LinkOption.NOFOLLOW_LINKS)
      catch {
        case _: NoSuchFileException =>
          throw new FileNotFoundException(s"File $f does not exist")
      }
    if (!attrs.isSymbolicLink) statusOf(f, nio, attrs, symlink = null)
    else {
      val target = new Path(Files.readSymbolicLink(nio).toString)
      try {
        val followed = Files.readAttributes(nio, classOf[PosixFileAttributes])
        statusOf(f, nio, followed, symlink = target)
      } catch {
        // dangling link: zero-length symlink status, like Hadoop's own
        case _: NoSuchFileException =>
          val st = new FileStatus(0L, false, 0, 0L, 0L, 0L,
            FsPermission.getDefault, "", "", target,
            makeQualified(f))
          st
      }
    }
  }

  private def statusOf(f: Path, nio: java.nio.file.Path,
      attrs: PosixFileAttributes, symlink: Path): FileStatus =
    new NioFileStatus(attrs.size(), attrs.isDirectory,
      getDefaultBlockSize(f), attrs.lastModifiedTime().toMillis,
      attrs.lastAccessTime().toMillis,
      fsPermissionOf(attrs.permissions()), symlink, makeQualified(f),
      attrs)
}

/** FileStatus whose owner/group resolve lazily from the captured NIO
  * attributes: the user-principal lookup is a getpwuid round-trip per
  * call and almost no consumer asks, so the common path stays at the
  * single readAttributes syscall. (Hadoop's own DeprecatedRawLocal-
  * FileStatus is lazy here too — via an `ls -ld` FORK.)
  */
private final class NioFileStatus(len: Long, isdir: Boolean,
    blocksize: Long, mtime: Long, atime: Long, perm: FsPermission,
    symlink: Path, qualified: Path,
    // transient: FileStatus is Serializable and PosixFileAttributes is
    // not (r17 ADVICE) — writeObject below resolves owner/group into
    // the parent's plain String fields before the attrs are dropped,
    // so a serialized status round-trips with its owner intact
    @transient private var attrs: PosixFileAttributes)
    extends FileStatus(len, isdir, 1, blocksize, mtime, atime, perm,
      null, null, symlink, qualified) {
  @volatile private var ownerLoaded = false
  private def load(): Unit = synchronized {
    if (!ownerLoaded) {
      try {
        if (attrs != null) {
          setOwner(attrs.owner().getName)
          setGroup(attrs.group().getName)
        }
      } catch { case _: Exception => () } // keep "" on lookup failure
      ownerLoaded = true
    }
  }
  override def getOwner: String = { if (!ownerLoaded) load(); super.getOwner }
  override def getGroup: String = { if (!ownerLoaded) load(); super.getGroup }
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    load()
    out.defaultWriteObject()
  }
}

private object NioLocalFsUtil {
  import PosixFilePermission._
  private val bits: Array[PosixFilePermission] = Array(
    OTHERS_EXECUTE, OTHERS_WRITE, OTHERS_READ,
    GROUP_EXECUTE, GROUP_WRITE, GROUP_READ,
    OWNER_EXECUTE, OWNER_WRITE, OWNER_READ)

  /** Low 9 permission bits -> NIO permission set (sticky callers are
    * routed to the shell fallback before reaching here).
    */
  def permsOf(mode: Int): java.util.Set[PosixFilePermission] = {
    val s = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    var i = 0
    while (i < 9) {
      if ((mode & (1 << i)) != 0) s.add(bits(i))
      i += 1
    }
    s
  }

  def fsPermissionOf(perms: java.util.Set[PosixFilePermission]): FsPermission = {
    var mode = 0
    var i = 0
    while (i < 9) {
      if (perms.contains(bits(i))) mode |= (1 << i)
      i += 1
    }
    new FsPermission(mode.toShort)
  }
}

/** Checksummed local FS over the fork-free raw impl — the drop-in
  * `fs.file.impl` for `file://`, byte-compatible with Hadoop's
  * LocalFileSystem (same .crc sidecars, same statuses).
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

/** FileContext (AbstractFileSystem) mirror of
  * org.apache.hadoop.fs.local.RawLocalFs over the fork-free raw impl.
  */
class NioRawLocalFs(uri: URI, conf: Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new NioRawLocalFileSystem, conf,
      FsConstants.LOCAL_FS_URI.getScheme, false) {
  def this(conf: Configuration) = this(FsConstants.LOCAL_FS_URI, conf)
  override def getUriDefaultPort: Int = -1
  override def getServerDefaults(f: Path): FsServerDefaults =
    org.apache.hadoop.fs.local.LocalConfigKeys.getServerDefaults()
  @deprecated("inherited contract", "")
  override def getServerDefaults: FsServerDefaults =
    org.apache.hadoop.fs.local.LocalConfigKeys.getServerDefaults()
  override def isValidName(src: String): Boolean = true
}

/** FileContext mirror of org.apache.hadoop.fs.local.LocalFs (the
  * `fs.AbstractFileSystem.file.impl`): checksummed over the fork-free
  * raw impl. Streaming checkpoint managers resolve through this.
  */
class NioLocalFs(uri: URI, conf: Configuration)
    extends org.apache.hadoop.fs.ChecksumFs(new NioRawLocalFs(uri, conf)) {
  def this(conf: Configuration) = this(FsConstants.LOCAL_FS_URI, conf)
}
