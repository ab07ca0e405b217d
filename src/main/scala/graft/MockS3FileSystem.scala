package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import java.io.OutputStream
import java.net.URI
import java.nio.file.{Files, StandardCopyOption}

/**
 * A Hadoop FileSystem with OBJECT-STORE semantics over a local backing
 * directory — the adversarial fixture the PathIO/IndexIO commit
 * protocols are proven against (scheme `mocks3:`, registered via
 * `fs.mocks3.impl` + listed in `graft.objectstore.schemes`):
 *
 *  - `rename` is COPY + DELETE: it REPLACES an existing destination
 *    object (no fail-if-exists anywhere), and a directory rename is
 *    per-entry — nothing about it is atomic. Any protocol that leaned
 *    on exclusive or atomic rename breaks here, loudly or (worse)
 *    silently — exactly the S3 failure mode the pointer-indirection
 *    and conditional-PUT protocols exist to close.
 *  - `create(path, overwrite=false)` is a CONDITIONAL PUT: bytes are
 *    staged invisibly and the object materializes complete-or-not-at-
 *    all at close(), which throws Hadoop's FileAlreadyExistsException
 *    when the object already exists (the if-none-match 412).
 *    `overwrite=true` is a plain PUT — also visible only at close,
 *    replacing atomically.
 *  - it is NOT a [[RawLocalFileSystem]] subclass, so PathIO's local
 *    hard-link fast path cannot engage; there are no links here.
 *
 * Paths are `mocks3:/abs/path`, mapped 1:1 onto the local filesystem —
 * only the scheme changes, so tests can create roots with
 * `Files.createTempDirectory` and inspect them with java.nio.
 *
 * Every operation increments a global per-op counter
 * ([[MockS3FileSystem.Ops]]) in the object store's own cost units —
 * LIST, HEAD (getFileStatus), GET (open), conditional PUT, overwrite
 * PUT, per-object COPY (inside "rename"), DELETE — so a stress run can
 * report per-batch request counts, the axis object stores bill and
 * throttle on, alongside walls. Lives in main (not test) sources
 * because the Stress tiers drive it.
 */
class MockS3FileSystem extends FileSystem {
  private var fsUri: URI = _
  private val local = new RawLocalFileSystem()

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"${MockS3FileSystem.Scheme}:///")
    local.initialize(URI.create("file:///"), conf)
    setConf(conf)
  }

  override def getScheme: String = MockS3FileSystem.Scheme
  override def getUri: URI = fsUri

  private def toLocal(p: Path): Path = new Path("file", null, p.toUri.getPath)
  private def toMock(p: Path): Path =
    new Path(MockS3FileSystem.Scheme, null, p.toUri.getPath)
  private def fix(st: FileStatus): FileStatus = {
    st.setPath(toMock(st.getPath)); st
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    MockS3FileSystem.Ops.get.incrementAndGet()
    local.open(toLocal(f), bufferSize)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    (if (overwrite) MockS3FileSystem.Ops.put
     else MockS3FileSystem.Ops.condPut).incrementAndGet()
    new FSDataOutputStream(
      new MockS3FileSystem.PutStream(
        java.nio.file.Paths.get(f.toUri.getPath), overwrite), null)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("object stores cannot append")

  override def rename(src: Path, dst: Path): Boolean = {
    MockS3FileSystem.Ops.rename.incrementAndGet()
    val ls = toLocal(src)
    var ld = toLocal(dst)
    if (!local.exists(ls)) false
    else {
      // Hadoop contract: renaming INTO an existing directory nests the
      // source under it (FileOutputCommitter relies on this)
      if (local.exists(ld) && local.getFileStatus(ld).isDirectory)
        ld = new Path(ld, ls.getName)
      // otherwise: per-object copy + delete, REPLACING existing objects
      // — the object-store "rename" (each object copy is atomic like a
      // server-side COPY, but the rename as a whole is neither atomic
      // nor fail-if-exists)
      copyTree(ls, ld)
      local.delete(ls, true)
    }
  }

  private def copyTree(src: Path, dst: Path): Unit = {
    val st = local.getFileStatus(src)
    if (st.isDirectory) {
      local.mkdirs(dst): Unit
      local.listStatus(src).foreach(c =>
        copyTree(c.getPath, new Path(dst, c.getPath.getName)))
    } else {
      MockS3FileSystem.Ops.copy.incrementAndGet()
      val bytes = {
        val in = local.open(src)
        try {
          val b = new Array[Byte](st.getLen.toInt)
          in.readFully(0, b); b
        } finally in.close()
      }
      val out = new MockS3FileSystem.PutStream(
        java.nio.file.Paths.get(dst.toUri.getPath), overwrite = true)
      try out.write(bytes) finally out.close()
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    MockS3FileSystem.Ops.delete.incrementAndGet()
    local.delete(toLocal(f), recursive)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    MockS3FileSystem.Ops.list.incrementAndGet()
    local.listStatus(toLocal(f)).map(fix)
  }

  override def setWorkingDirectory(dir: Path): Unit =
    local.setWorkingDirectory(toLocal(dir))

  override def getWorkingDirectory: Path = toMock(local.getWorkingDirectory)

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(f), permission)

  override def getFileStatus(f: Path): FileStatus = {
    MockS3FileSystem.Ops.head.incrementAndGet()
    fix(local.getFileStatus(toLocal(f)))
  }

  override def setTimes(f: Path, mtime: Long, atime: Long): Unit =
    local.setTimes(toLocal(f), mtime, atime)
}

object MockS3FileSystem {
  val Scheme = "mocks3"

  /** Global request counters in object-store cost units. Static (the
    * Hadoop FileSystem cache hands out instances per scheme+UGI, and a
    * Spark job touches them from many task threads), reset between
    * measured regions. `copy` counts the per-OBJECT server-side copies
    * a "rename" decomposes into; `rename` counts the logical calls. */
  object Ops {
    import java.util.concurrent.atomic.AtomicLong
    val list = new AtomicLong
    val head = new AtomicLong
    val get = new AtomicLong
    val condPut = new AtomicLong
    val put = new AtomicLong
    val copy = new AtomicLong
    val delete = new AtomicLong
    val rename = new AtomicLong
    private def all = Seq("list" -> list, "head" -> head, "get" -> get,
      "condPut" -> condPut, "put" -> put, "copy" -> copy,
      "delete" -> delete, "rename" -> rename)
    def snapshot(): Map[String, Long] = all.map { case (n, c) => n -> c.get }.toMap
    def reset(): Unit = all.foreach(_._2.set(0L))
    /** Compact one-line rendering of a snapshot delta, stable order. */
    def render(m: Map[String, Long]): String =
      all.map(_._1).filter(k => m.getOrElse(k, 0L) != 0L)
        .map(k => s"$k=${m(k)}").mkString(",")
    def delta(before: Map[String, Long], after: Map[String, Long]): Map[String, Long] =
      after.map { case (k, v) => k -> (v - before.getOrElse(k, 0L)) }
  }

  /** Register the scheme on a Hadoop conf (idempotent). */
  def register(conf: Configuration): Unit = {
    conf.set(s"fs.$Scheme.impl", classOf[MockS3FileSystem].getName)
    conf.set("graft.objectstore.schemes", Scheme)
  }

  /** PUT emulation: bytes staged in an invisible tmp file; the object
    * materializes at close() — hard-link (fail-if-exists = the 412)
    * for conditional PUTs, atomic replace for overwrite PUTs. The tmp
    * file is staged in the TARGET's parent directory, not
    * java.io.tmpdir: the materialization is a link/ATOMIC_MOVE, and
    * neither can cross filesystems — a backing root on a different
    * device than tmpdir would fail with FileSystemException instead of
    * emulating the PUT (ADVICE r15). */
  private final class PutStream(target: java.nio.file.Path,
                                overwrite: Boolean) extends OutputStream {
    private val tmp = {
      Option(target.getParent).foreach(Files.createDirectories(_))
      Files.createTempFile(target.getParent, ".mocks3-put", ".staged")
    }
    private val out = Files.newOutputStream(tmp)
    private var closed = false

    override def write(b: Int): Unit = out.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      out.write(b, off, len)
    override def flush(): Unit = out.flush()

    override def close(): Unit = {
      if (closed) return
      closed = true
      out.close()
      try {
        Option(target.getParent).foreach(Files.createDirectories(_))
        if (overwrite)
          Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE): Unit
        else {
          try Files.createLink(target, tmp)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              throw new org.apache.hadoop.fs.FileAlreadyExistsException(
                s"conditional PUT precondition failed: $target exists")
          }
        }
      } finally { Files.deleteIfExists(tmp); () }
    }
  }
}
