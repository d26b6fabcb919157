package org.apache.spark.sql.graft

import java.io.{FileNotFoundException, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption, StandardOpenOption, Path => JPath}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, PathFilter, PositionedReadable, Seekable}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** java.nio-backed [[CheckpointFileManager]] for `file:` checkpoint paths.
  *
  * Why it exists (optimization round, guide §1 measurement): the default
  * local-FS managers route every checkpoint file operation through Hadoop's
  * `LocalFileSystem`/`RawLocalFs`, which without the native hadoop library
  * FORKS A PROCESS per permission-bearing operation (`chmod` on create,
  * `readlink`/`stat` on getFileStatus) and writes `.crc` checksum siblings
  * for every file. A single 8-micro-batch stream-stream join replay was
  * measured at ~11,900 forks (vs ~500 for a batch query in the same
  * harness) — ~1,500 forks per micro-batch across 32 state-store commits
  * plus offset/commit/sink metadata log writes, dominating the per-batch
  * floor. This manager performs the same operations with java.nio calls:
  * zero forks, zero checksum siblings, identical atomic rename-based commit
  * semantics (write to hidden temp in the same directory, `ATOMIC_MOVE`
  * into place).
  *
  * Scale posture: this class REFUSES non-`file:` schemes loudly. A 100 TB
  * deployment checkpoints to HDFS/S3 and keeps the default managers (this
  * conf is simply not set there); any local-disk checkpoint — the bench's
  * shape, CI replays, single-node deployments — is strictly better served
  * by NIO. Durability semantics are unchanged: the commit point is the
  * same directory-local atomic rename the default managers use.
  */
class NioCheckpointFileManager(path: Path, hadoopConf: Configuration)
    extends CheckpointFileManager {

  import NioCheckpointFileManager._

  private val root: JPath = toLocal(path)

  override def createAtomic(p: Path, overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val dst = toLocal(p)
    val dir = dst.getParent
    if (!Files.isDirectory(dir)) Files.createDirectories(dir)
    val tmp = dir.resolve(s".${dst.getFileName}.${UUID.randomUUID}.tmp")
    val out = Files.newOutputStream(tmp, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    new NioAtomicOutputStream(out, tmp, dst, overwriteIfPossible)
  }

  override def open(p: Path): FSDataInputStream = {
    val f = toLocal(p)
    if (!Files.exists(f)) throw new FileNotFoundException(f.toString)
    new FSDataInputStream(new NioSeekableInputStream(f))
  }

  override def list(p: Path, filter: PathFilter): Array[FileStatus] = {
    val dir = toLocal(p)
    if (!Files.exists(dir)) throw new FileNotFoundException(dir.toString)
    if (!Files.isDirectory(dir)) {
      val st = status(dir)
      return if (filter.accept(st.getPath)) Array(st) else Array.empty
    }
    val out = Array.newBuilder[FileStatus]
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val st = status(it.next())
        if (filter.accept(st.getPath)) out += st
      }
    } finally s.close()
    out.result()
  }

  override def mkdirs(p: Path): Unit = Files.createDirectories(toLocal(p))

  override def exists(p: Path): Boolean = Files.exists(toLocal(p))

  override def delete(p: Path): Unit = {
    val f = toLocal(p)
    try {
      if (Files.isDirectory(f, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        import scala.jdk.CollectionConverters._
        Files.walk(f).iterator().asScala.toSeq.reverseIterator
          .foreach(x => try Files.delete(x) catch { case _: FileNotFoundException => () })
      } else Files.deleteIfExists(f)
    } catch { case _: java.nio.file.NoSuchFileException => () } // delete is best-effort, like the default managers
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    Files.createDirectories(root)
    path
  }

  private def status(f: JPath): FileStatus = {
    val attrs = Files.readAttributes(f, classOf[java.nio.file.attribute.BasicFileAttributes])
    new FileStatus(attrs.size(), attrs.isDirectory, 1, 33554432L,
      attrs.lastModifiedTime().toMillis, new Path(f.toUri))
  }
}

object NioCheckpointFileManager {

  /** Conf key the streaming engine reads ([[org.apache.spark.sql.internal.SQLConf]]
    * STREAMING_CHECKPOINT_FILE_MANAGER_CLASS).
    */
  val ConfKey = "spark.sql.streaming.checkpointFileManagerClass"
  val ClassName: String = classOf[NioCheckpointFileManager].getName

  private def toLocal(p: Path): JPath = {
    val uri = p.toUri
    val scheme = uri.getScheme
    require(scheme == null || scheme == "file",
      s"NioCheckpointFileManager handles only file: paths, got $p — " +
        "unset spark.sql.streaming.checkpointFileManagerClass for remote checkpoints")
    Paths.get(uri.getPath)
  }

  /** Atomic-rename commit stream: close() moves the temp file into place
    * (the same commit point as Spark's RenameBasedFSDataOutputStream);
    * cancel() discards the temp.
    */
  private final class NioAtomicOutputStream(out: OutputStream, tmp: JPath, dst: JPath,
                                            overwrite: Boolean)
      extends CancellableFSDataOutputStream(out) {
    @volatile private var terminated = false

    override def close(): Unit = synchronized {
      if (terminated) return
      terminated = true
      super.close() // flushes and closes the temp file stream
      if (!overwrite && Files.exists(dst)) {
        Files.deleteIfExists(tmp)
        throw new FileAlreadyExistsException(dst.toString)
      }
      Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    }

    override def cancel(): Unit = synchronized {
      if (terminated) return
      terminated = true
      try super.close() catch { case _: Throwable => () }
      Files.deleteIfExists(tmp)
    }
  }

  /** Seekable/PositionedReadable local-file stream — the adapter contract
    * [[FSDataInputStream]] demands of its wrapped stream.
    */
  private final class NioSeekableInputStream(f: JPath)
      extends InputStream with Seekable with PositionedReadable {
    private val ch: FileChannel = FileChannel.open(f, StandardOpenOption.READ)

    override def read(): Int = {
      val b = ByteBuffer.allocate(1)
      if (ch.read(b) <= 0) -1 else b.get(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int =
      ch.read(ByteBuffer.wrap(b, off, len))

    override def close(): Unit = ch.close()

    override def seek(pos: Long): Unit = ch.position(pos)
    override def getPos: Long = ch.position()
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int =
      ch.read(ByteBuffer.wrap(buffer, offset, length), position)

    override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      var done = 0
      while (done < length) {
        val n = ch.read(ByteBuffer.wrap(buffer, offset + done, length - done), position + done)
        if (n < 0) throw new java.io.EOFException(
          s"EOF at ${position + done} reading $length bytes from $f")
        done += n
      }
    }

    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
