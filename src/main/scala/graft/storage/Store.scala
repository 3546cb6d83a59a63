package graft.storage

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** Object-store abstraction for the metadata/data plane.
  *
  * Mirrors the reference `Storage` trait (icechunk-storage/src/storage.rs:
  * 476-618): get/put/list/delete plus the *conditional create* primitive that
  * makes commits serializable. On S3 `putIfAbsent` is a conditional PUT with
  * `If-None-Match: *`; on local FS it is `CREATE_NEW` (atomic fail-if-exists).
  * The commit protocol only ever needs put-if-absent because the mutable repo
  * pointer is modeled as a monotonically numbered file chain (one file per
  * generation), like a transaction log — see [[graft.meta.RepoPointer]].
  *
  * All other files (snapshots, manifests, chunks, tx logs) are immutable,
  * write-once — the discipline both object stores and Spark jobs want
  * (spec-v2.md:160-170).
  */
final case class ObjectInfo(key: String, size: Long, mtimeMillis: Long)

trait Store {
  /** Root URI usable by `spark.read` / `df.write` (e.g. `file:/...`). */
  def rootUri: String
  def uri(key: String): String = rootUri.stripSuffix("/") + "/" + key

  def getBytes(key: String): Array[Byte]
  def putBytes(key: String, bytes: Array[Byte]): Unit
  /** Atomic create-if-absent. Returns false (and writes nothing) if the key
    * already exists. This is the single serialization point of the engine.
    */
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean
  /** List keys under a prefix (recursive): (key, sizeBytes, mtimeMillis). */
  def list(prefix: String): Seq[ObjectInfo]
  def exists(key: String): Boolean
  def delete(keys: Iterable[String]): Unit
  /** Recursive delete of a prefix (directories on FS; key prefix on S3). */
  def deletePrefix(prefix: String): Unit
}

/** Local-filesystem store. `putIfAbsent` uses `CREATE_NEW` which is atomic
  * on POSIX; concurrent committers race on file creation exactly as they
  * would race on S3 conditional PUTs.
  */
final class LocalStore(val root: Path) extends Store {
  Files.createDirectories(root)
  override def rootUri: String = "file:" + root.toAbsolutePath.toString

  private def p(key: String): Path = root.resolve(key)

  override def getBytes(key: String): Array[Byte] = Files.readAllBytes(p(key))

  override def putBytes(key: String, bytes: Array[Byte]): Unit = {
    val path = p(key)
    Files.createDirectories(path.getParent)
    // write-temp + atomic move: readers never observe partial files
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp." +
      java.util.UUID.randomUUID().toString)
    Files.write(tmp, bytes)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val path = p(key)
    Files.createDirectories(path.getParent)
    try {
      val ch = Files.newByteChannel(path, StandardOpenOption.WRITE,
        StandardOpenOption.CREATE_NEW)
      try ch.write(java.nio.ByteBuffer.wrap(bytes)) finally ch.close()
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  override def list(prefix: String): Seq[ObjectInfo] = {
    val base = p(prefix)
    if (!Files.exists(base)) return Nil
    val stream = Files.walk(base)
    try stream.iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(f => ObjectInfo(root.relativize(f).toString.replace('\\', '/'),
        Files.size(f), Files.getLastModifiedTime(f).toMillis))
      .toVector
    finally stream.close()
  }

  override def exists(key: String): Boolean = Files.exists(p(key))

  override def delete(keys: Iterable[String]): Unit =
    keys.foreach(k => Files.deleteIfExists(p(k)))

  override def deletePrefix(prefix: String): Unit = {
    val base = p(prefix)
    if (Files.exists(base)) {
      val stream = Files.walk(base)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally stream.close()
    }
  }
}

object Store {
  def local(dir: String): LocalStore = new LocalStore(Paths.get(dir))
}
