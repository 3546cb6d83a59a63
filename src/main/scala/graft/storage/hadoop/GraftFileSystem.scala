package graft.storage.hadoop

import java.io.{ByteArrayOutputStream, FileNotFoundException}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.SparkSession
import graft.storage.{Store, StoreConf}

/** Hadoop `FileSystem` over a [[graft.storage.Store]] (`graft://` scheme):
  * lets Spark's Parquet reader/writer operate directly on any store
  * backend — in this environment, the [[graft.storage.s3.S3Store]] client
  * (no s3a on the classpath). The role s3a + the object-store committers
  * play on a production cluster; this adapter keeps the engine's
  * manifest/tx-log plane backend-agnostic.
  *
  * Semantics on an object store:
  *  - directories are virtual (a key prefix with children); `mkdirs` is a
  *    no-op success
  *  - `rename` is copy+delete per key (server-side copy when the backend
  *    supports it) — exactly what FileOutputCommitter v1 does on s3a
  *  - reads are '''ranged GETs''' through a positioned stream with a small
  *    readahead buffer (Parquet footers + column chunks, not whole files)
  *  - writes buffer in memory and PUT on close (multipart above the
  *    store's threshold) — manifest splits are bounded, so one in-flight
  *    file fits comfortably
  *
  * Executor-side resolution: `register` stores the serialized
  * [[StoreConf]] in the Hadoop configuration (`fs.graft.store.<authority>`),
  * which Spark ships with every task; `initialize` first consults a
  * JVM-local registry (driver fast path), then deserializes from conf.
  */
final class GraftFileSystem extends FileSystem {
  private var store: Store = _
  private var fsUri: URI = _
  private var workDir: Path = new Path("/")

  override def getScheme: String = "graft"
  override def getUri: URI = fsUri

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"graft://${name.getAuthority}")
    store = GraftFileSystem.resolve(name.getAuthority, conf)
  }

  private def keyOf(path: Path): String = {
    val p = makeQualified(path).toUri.getPath
    p.stripPrefix("/").stripSuffix("/")
  }

  private def fileStatus(key: String, size: Long, mtime: Long): FileStatus =
    new FileStatus(size, false, 1, 32 * 1024 * 1024, mtime,
      new Path(fsUri.toString + "/" + key))

  private def dirStatus(key: String): FileStatus =
    new FileStatus(0, true, 1, 0, 0,
      new Path(fsUri.toString + (if (key.isEmpty) "/" else "/" + key)))

  override def getFileStatus(path: Path): FileStatus = {
    val key = keyOf(path)
    if (key.isEmpty) return dirStatus("")
    // exact key sorts first under its own prefix: one single-key page
    // answers "file?", a second answers "directory?"
    val filePage = store.listPage(key, None, 1)
    filePage.find(_.key == key) match {
      case Some(o) => fileStatus(key, o.size, o.mtimeMillis)
      case None =>
        if (store.listPage(key + "/", None, 1).nonEmpty) dirStatus(key)
        else throw new FileNotFoundException(path.toString)
    }
  }

  override def listStatus(path: Path): Array[FileStatus] = {
    val key = keyOf(path)
    val prefix = if (key.isEmpty) "" else key + "/"
    val all = store.list(prefix)
    if (all.isEmpty) {
      // an empty dir exists only as a concept; a file lists as itself
      val self = store.listPage(key, None, 1).find(_.key == key)
      return self match {
        case Some(o) => Array(fileStatus(key, o.size, o.mtimeMillis))
        case None if key.isEmpty => Array.empty
        case None => throw new FileNotFoundException(path.toString)
      }
    }
    val files = scala.collection.mutable.ArrayBuffer[FileStatus]()
    val dirs = scala.collection.mutable.LinkedHashSet[String]()
    all.foreach { o =>
      val rest = o.key.stripPrefix(prefix)
      val slash = rest.indexOf('/')
      if (slash < 0) files += fileStatus(o.key, o.size, o.mtimeMillis)
      else dirs += prefix + rest.take(slash)
    }
    (files ++ dirs.map(dirStatus)).toArray
  }

  override def open(path: Path, bufferSize: Int): FSDataInputStream = {
    val key = keyOf(path)
    val st = getFileStatus(path)
    if (st.isDirectory)
      throw new FileNotFoundException(s"$path is a directory")
    new FSDataInputStream(new StoreInputStream(store, key, st.getLen))
  }

  override def create(path: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(path)
    if (!overwrite && store.exists(key))
      throw new FileAlreadyExistsException(path.toString)
    val buf = new ByteArrayOutputStream(64 * 1024)
    val out = new java.io.OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = store.putBytes(key, buf.toByteArray)
    }
    new FSDataOutputStream(out, statistics)
  }

  override def append(path: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append on object store")

  override def rename(src: Path, dst: Path): Boolean = {
    val srcKey = keyOf(src)
    val dstKey = keyOf(dst)
    val srcStatus =
      try getFileStatus(src)
      catch { case _: FileNotFoundException => return false }
    // renaming INTO an existing directory nests, like HDFS
    val target =
      try {
        val d = getFileStatus(dst)
        if (d.isDirectory) dstKey + "/" + src.getName else dstKey
      } catch { case _: FileNotFoundException => dstKey }
    if (srcStatus.isDirectory) {
      store.list(srcKey + "/").foreach { o =>
        store.copy(o.key, target + "/" + o.key.stripPrefix(srcKey + "/"))
      }
      store.deletePrefix(srcKey + "/")
    } else {
      store.copy(srcKey, target)
      store.delete(Seq(srcKey))
    }
    true
  }

  override def delete(path: Path, recursive: Boolean): Boolean = {
    val key = keyOf(path)
    val st =
      try getFileStatus(path)
      catch { case _: FileNotFoundException => return false }
    if (st.isDirectory) {
      if (!recursive && store.listPage(key + "/", None, 1).nonEmpty)
        throw new java.io.IOException(s"$path is a non-empty directory")
      store.deletePrefix(if (key.isEmpty) "" else key + "/")
    } else store.delete(Seq(key))
    true
  }

  override def mkdirs(path: Path, permission: FsPermission): Boolean = true

  override def setWorkingDirectory(dir: Path): Unit = workDir = dir
  override def getWorkingDirectory: Path = workDir
}

object GraftFileSystem {
  private val registry = new ConcurrentHashMap[String, Store]()

  /** Make `store.rootUri` (a `graft://authority` URI) resolvable by Spark:
    * JVM-local registry for the driver, serialized conf in the Hadoop
    * configuration for executors. Idempotent.
    */
  def register(spark: SparkSession, store: Store): Unit = {
    val uri = URI.create(store.rootUri)
    if (uri.getScheme != "graft") return
    val auth = uri.getAuthority
    registry.put(auth, store)
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.graft.impl", classOf[GraftFileSystem].getName)
    // FileSystem instances are cached per (scheme, authority): safe here
    hconf.set(s"fs.graft.store.$auth", encodeConf(store.conf))
  }

  private[hadoop] def resolve(authority: String,
                              conf: Configuration): Store = {
    val hit = registry.get(authority)
    if (hit != null) return hit
    val enc = conf.get(s"fs.graft.store.$authority")
    if (enc == null)
      throw new java.io.IOException(
        s"no registered graft store for authority '$authority' " +
          "(call GraftFileSystem.register or ship fs.graft.store.* conf)")
    val store = StoreConf.cached(decodeConf(enc))
    registry.putIfAbsent(authority, store)
    store
  }

  /** Hadoop conf entries that make `store.rootUri` resolvable in another
    * JVM (ship these inside serialized task descriptors). Empty for
    * non-graft roots (`file:` URIs need nothing).
    */
  def shippableConf(store: Store): Map[String, String] = {
    val uri = URI.create(store.rootUri)
    if (uri.getScheme != "graft") Map.empty
    else Map(
      "fs.graft.impl" -> classOf[GraftFileSystem].getName,
      s"fs.graft.store.${uri.getAuthority}" -> encodeConf(store.conf))
  }

  private def encodeConf(c: StoreConf): String = {
    val bos = new ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(c); oos.close()
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  private def decodeConf(s: String): StoreConf = {
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(java.util.Base64.getDecoder.decode(s)))
    try in.readObject().asInstanceOf[StoreConf] finally in.close()
  }
}

/** Seekable read stream over ranged GETs with a readahead buffer:
  * positional `read` fetches `max(wanted, 64 KB)` in one range request and
  * serves subsequent sequential reads from the buffer — Parquet's
  * footer-then-column access pattern costs a handful of GETs per file, not
  * one per `read()` call.
  */
private final class StoreInputStream(store: Store, key: String, size: Long)
    extends FSInputStream {
  private var pos = 0L
  private var bufStart = 0L
  private var buf: Array[Byte] = Array.emptyByteArray
  private val MinFetch = 64 * 1024

  override def seek(p: Long): Unit = {
    if (p < 0 || p > size) throw new java.io.EOFException(s"seek($p) size=$size")
    pos = p
  }
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n <= 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= size) return -1
    val inBuf = pos - bufStart
    if (inBuf < 0 || inBuf >= buf.length) {
      val want = math.max(len, MinFetch).toLong
        .min(size - pos)
      buf = store.getRange(key, pos, want)
      bufStart = pos
    }
    val avail = (buf.length - (pos - bufStart)).toInt
    if (avail <= 0) return -1
    val n = math.min(len, avail)
    System.arraycopy(buf, (pos - bufStart).toInt, b, off, n)
    pos += n
    n
  }
}
