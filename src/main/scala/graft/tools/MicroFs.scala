package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path, FsShell}

/** Dev-only local-FS metadata cost probe: runMain graft.tools.MicroFs
  *
  * Times the Hadoop local-FS operations the commit protocol issues per
  * statement (create+close, getFileStatus, listStatus, mkdirs, rename,
  * getFileLinkStatus) under (a) the default checksummed LocalFileSystem
  * and (b) RawLocalFileSystem, to price the no-native-lib fork overhead
  * (setPermission execs chmod; readLink execs readlink) and the .crc
  * sidecar tax. Read-only diagnostics; never used by the driver contract.
  */
object MicroFs {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 300
    val conf = new Configuration()
    val base = new Path("/tmp/microfs_" + System.nanoTime())

    def bench(label: String, fs: FileSystem): Unit = {
      val dir = new Path(base, label)
      fs.mkdirs(dir)
      def time(what: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"[microfs] $label%-22s $what%-18s ${ms}%8.1f ms  (${ms * 1000 / n}%6.1f us/op)")
      }
      time("create+close") {
        (0 until n).foreach { i =>
          val out = fs.create(new Path(dir, s"f$i"), true)
          out.write(42); out.close()
        }
      }
      time("getFileStatus") {
        (0 until n).foreach(i => fs.getFileStatus(new Path(dir, s"f${i % n}")))
      }
      time("getFileLinkStatus") {
        (0 until n).foreach(i => fs.getFileLinkStatus(new Path(dir, s"f${i % n}")))
      }
      time("listStatus(dir)") {
        (0 until 20).foreach(_ => fs.listStatus(dir))
      }
      time("exists") {
        (0 until n).foreach(i => fs.exists(new Path(dir, s"f${i % n}")))
      }
      time("mkdirs") {
        (0 until n).foreach(i => fs.mkdirs(new Path(dir, s"d$i")))
      }
      time("rename") {
        (0 until n).foreach(i =>
          fs.rename(new Path(dir, s"f$i"), new Path(dir, s"r$i")))
      }
      time("delete") {
        (0 until n).foreach(i => fs.delete(new Path(dir, s"r$i"), false))
      }
      time("perm-load(getPermission)") {
        val sts = fs.listStatus(dir)
        sts.take(n).foreach(_.getPermission)
      }
    }

    println(s"[microfs] NativeIO available: " +
      org.apache.hadoop.io.nativeio.NativeIO.isAvailable)
    val local = new org.apache.hadoop.fs.LocalFileSystem()
    local.initialize(java.net.URI.create("file:///"), conf)
    bench("LocalFileSystem", local)
    val raw = local.getRawFileSystem
    bench("RawLocalFileSystem", raw)
    val nio = new graft.sources.NioLocalFileSystem()
    nio.initialize(java.net.URI.create("file:///"), conf)
    bench("NioLocalFileSystem", nio)
    bench("NioRawLocal", nio.getRawFileSystem)
    local.delete(base, true)
  }
}
