package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FileSystem, FSDataInputStream,
  FSDataOutputStream, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** PROCESS-LOCAL in-memory store — the `memory://` scheme of the
  * reference (store/memory.py:16-27: "all keys held in a process-local
  * dict; chiefly for tests"), re-expressed as a Hadoop [[FileSystem]]
  * so EVERY graft path works over it unchanged: collections, views,
  * indexes, clones, streams — `Collection.create(spark,
  * "graftmem://bucket/coll", ...)` after one [[InMemoryFileSystem
  * .register]] call.
  *
  * Scope matches the reference exactly: keys live in a JVM-global map,
  * so the store is visible to every local-mode executor (one JVM) and
  * to nothing outside the process — tests and ephemeral pipelines, not
  * durable data. On a multi-JVM cluster each executor would see its own
  * map; like the reference's MemoryStore (whose `root_uri` is keyed off
  * a Python object id), this is by design, not a distributed store.
  *
  * Commit arbitration: the manifest publish rides a REAL conditional
  * put — [[java.util.concurrent.ConcurrentHashMap#putIfAbsent]] IS an
  * atomic compare-and-swap — registered as the `graftmem` scheme's
  * [[Collection.CommitArbiter]], so racing writers arbitrate exactly
  * like the object-store adapters (one wins, the loser rebases), never
  * through the refused plain-rename path. */
class InMemoryFileSystem extends FileSystem {
  import InMemoryFileSystem._

  private var fsUri: URI = URI.create(s"$Scheme:///")
  private var workDir: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(
      s"$Scheme://${Option(name.getAuthority).getOrElse("")}")
    setConf(conf)
  }

  override def getScheme: String = Scheme
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = workDir = dir

  private def st: Store = storeOf(fsUri.getAuthority)

  private def isImplicitDir(key: String): Boolean = {
    if (key == "/") return true
    if (st.dirs.contains(key)) return true
    val prefix = key + "/"
    st.dirs.asScalaIterator.exists(_.startsWith(prefix)) ||
      st.files.keySet().asScalaIterator.exists(_.startsWith(prefix))
  }

  private def status(key: String): FileStatus = {
    val f = st.files.get(key)
    if (f != null)
      new FileStatus(f.data.length.toLong, false, 1, BlockSize, f.mtime,
        new Path(s"$Scheme://${Option(fsUri.getAuthority).getOrElse("")}$key"))
    else if (isImplicitDir(key))
      new FileStatus(0L, true, 1, BlockSize, 0L,
        new Path(s"$Scheme://${Option(fsUri.getAuthority).getOrElse("")}$key"))
    else throw new FileNotFoundException(s"$Scheme://$key")
  }

  override def getFileStatus(f: Path): FileStatus = status(norm(f))

  override def exists(f: Path): Boolean =
    try { getFileStatus(f); true } catch { case _: FileNotFoundException => false }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = norm(f)
    if (st.files.containsKey(key)) return Array(status(key))
    if (!isImplicitDir(key)) throw new FileNotFoundException(s"$Scheme://$key")
    val prefix = if (key == "/") "/" else key + "/"
    val children = scala.collection.mutable.SortedSet.empty[String]
    def childOf(k: String): Unit =
      if (k.startsWith(prefix) && k.length > prefix.length) {
        val rest = k.substring(prefix.length)
        val head = rest.takeWhile(_ != '/')
        if (head.nonEmpty) children += prefix + head
      }
    st.files.keySet().asScalaIterator.foreach(childOf)
    st.dirs.asScalaIterator.foreach(childOf)
    children.toArray.map(status)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val e = st.files.get(norm(f))
    if (e == null) throw new FileNotFoundException(s"$Scheme://${norm(f)}")
    new FSDataInputStream(new SeekableBytes(e.data))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val key = norm(f)
    if (!overwrite && st.files.containsKey(key))
      throw new FileAlreadyExistsException(s"$Scheme://$key")
    if (isImplicitDir(key)) throw new FileAlreadyExistsException(
      s"$Scheme://$key is a directory")
    val parent = parentOf(key)
    if (parent != null) mkdirKeys(parent)
    val buf = new ByteArrayOutputStream() {
      override def close(): Unit = {
        super.close()
        st.files.put(key, FileEntry(toByteArray, System.currentTimeMillis()))
      }
    }
    new FSDataOutputStream(buf, null)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(s"$Scheme does not support append")

  override def rename(src: Path, dst: Path): Boolean = {
    val s = norm(src)
    var d = norm(dst)
    if (s == d) return st.files.containsKey(s) || isImplicitDir(s)
    // Hadoop semantics: renaming onto an existing directory moves INTO it
    if (isImplicitDir(d) && !st.files.containsKey(d))
      d = (if (d == "/") "" else d) + "/" + s.substring(s.lastIndexOf('/') + 1)
    val fe = st.files.get(s)
    if (fe != null) {
      if (st.files.containsKey(d) || isImplicitDir(d)) return false
      st.files.put(d, fe)
      st.files.remove(s)
      return true
    }
    if (!isImplicitDir(s)) return false
    if (st.files.containsKey(d)) return false
    val prefix = s + "/"
    val moved = st.files.keySet().asScalaIterator.filter(_.startsWith(prefix)).toList
    moved.foreach { k =>
      val e = st.files.remove(k)
      if (e != null) st.files.put(d + "/" + k.substring(prefix.length), e)
    }
    val movedDirs = st.dirs.asScalaIterator
      .filter(k => k == s || k.startsWith(prefix)).toList
    movedDirs.foreach { k =>
      st.dirs.remove(k)
      st.dirs.add(if (k == s) d else d + "/" + k.substring(prefix.length))
    }
    st.dirs.add(d)
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = norm(f)
    if (st.files.remove(key) != null) return true
    if (!isImplicitDir(key)) return false
    val prefix = if (key == "/") "/" else key + "/"
    val files = st.files.keySet().asScalaIterator.filter(_.startsWith(prefix)).toList
    val dirs = st.dirs.asScalaIterator
      .filter(k => k == key || k.startsWith(prefix)).toList
    if (!recursive && (files.nonEmpty ||
        dirs.exists(k => k != key))) throw new IOException(
      s"$Scheme://$key is a non-empty directory (recursive = false)")
    files.foreach(st.files.remove)
    dirs.foreach(st.dirs.remove)
    true
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    mkdirKeys(norm(f)); true
  }

  private def mkdirKeys(key: String): Unit = {
    var k = key
    while (k != null && k != "/") {
      if (st.files.containsKey(k))
        throw new FileAlreadyExistsException(s"$Scheme://$k is a file")
      st.dirs.add(k)
      k = parentOf(k)
    }
  }

  private def parentOf(key: String): String = {
    val i = key.lastIndexOf('/')
    if (i <= 0) if (key == "/") null else "/" else key.substring(0, i)
  }
}

object InMemoryFileSystem {
  val Scheme = "graftmem"
  private val BlockSize = 128L * 1024 * 1024

  private[core] final case class FileEntry(data: Array[Byte], mtime: Long)

  private[core] final class Store {
    val files = new ConcurrentHashMap[String, FileEntry]()
    val dirs = ConcurrentHashMap.newKeySet[String]()
  }

  /** authority -> namespace: `graftmem://a/x` and `graftmem://b/x` are
    * independent stores (the reference keys its MemoryStore URI per
    * instance the same way, store/memory.py:27). */
  private val stores = new ConcurrentHashMap[String, Store]()
  private def storeOf(auth: String): Store =
    stores.computeIfAbsent(Option(auth).getOrElse(""), _ => new Store)

  private implicit final class JIterOps[A](private val it: java.lang.Iterable[A])
      extends AnyVal {
    def asScalaIterator: Iterator[A] = {
      val i = it.iterator(); new Iterator[A] {
        def hasNext = i.hasNext; def next() = i.next()
      }
    }
  }
  private implicit final class JSetOps[A](private val s: java.util.Set[A])
      extends AnyVal {
    def asScalaIterator: Iterator[A] = {
      val i = s.iterator(); new Iterator[A] {
        def hasNext = i.hasNext; def next() = i.next()
      }
    }
  }

  private def norm(p: Path): String = {
    val raw = p.toUri.getPath
    val s = if (raw == null || raw.isEmpty) "/" else raw
    if (s != "/" && s.endsWith("/")) s.dropRight(1) else s
  }

  /** One call makes `graftmem://...` usable session-wide: binds the
    * scheme's FileSystem impl on the session's Hadoop configuration
    * (executors inherit it through the broadcast conf) and registers
    * the CAS commit arbiter. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.hadoopConfiguration.set(
      s"fs.$Scheme.impl", classOf[InMemoryFileSystem].getName)
    Collection.registerCommitArbiter(Scheme, PutIfAbsentArbiter)
  }

  /** Drop a whole namespace (the reference store has no durability to
    * reclaim; tests call this between cases). */
  def clear(authority: String): Unit = stores.remove(Option(authority).getOrElse(""))

  /** The exclusive-publish primitive over the map itself:
    * `putIfAbsent` is an atomic conditional PUT, so two writers racing
    * one manifest generation arbitrate exactly once — the
    * object-store-adapter contract with zero transport. */
  object PutIfAbsentArbiter extends Collection.CommitArbiter {
    def publish(fs: FileSystem, tmp: Path, target: Path): Boolean = {
      val s = storeOf(target.toUri.getAuthority)
      val tkey = norm(tmp)
      val data = s.files.get(tkey)
      if (data == null) throw new IOException(s"missing commit tmp $tmp")
      val won = s.files.putIfAbsent(norm(target), data) == null
      s.files.remove(tkey)
      won
    }
  }

  /** A byte-array input stream speaking Hadoop's random-access
    * interfaces (parquet footers seek). */
  private final class SeekableBytes(data: Array[Byte])
      extends ByteArrayInputStream(data) with Seekable with PositionedReadable {
    override def seek(pos: Long): Unit = {
      if (pos < 0 || pos > data.length) throw new IOException(s"seek past end: $pos")
      this.pos = pos.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
                      length: Int): Int = {
      if (position >= data.length) return -1
      val n = math.min(length, data.length - position.toInt)
      System.arraycopy(data, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
                           length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new java.io.EOFException(s"readFully past end at $position")
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
