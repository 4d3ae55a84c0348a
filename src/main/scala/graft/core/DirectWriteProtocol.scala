package graft.core

import java.util.UUID

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.{FileCommitProtocol, FileNameSpec}
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage

/** Zero-rename commit protocol for object stores (and anyone else who
  * wants it): every task writes its FINAL file directly into the Hive
  * partition dir under the collection root, with a name made unique by a
  * job UUID and the task-attempt id. There is no `_temporary` dir, no
  * task-commit rename and no job-commit rename — on S3 the staged
  * `_stage/<uuid>` + move protocol pays a server-side COPY + DELETE per
  * data file (rename is not a metadata op on a keystore), which doubles
  * the data IO of every insert. Here the bytes are written exactly once,
  * where they will live.
  *
  * This is safe for the same reason the staged protocol is safe: FILE
  * VISIBILITY IS GOVERNED BY THE MANIFEST, not by directory listing. The
  * job reports the exact file set it wrote (collected from task commit
  * messages, never by listing), the manifest commit references precisely
  * those files, and anything a crashed or speculated task leaves behind
  * is an unreferenced data file that [[Collection.vacuum]]'s age-gated GC
  * reclaims. Concurrent writers never collide: each job's UUID namespaces
  * its filenames, and nobody shares committer state.
  *
  * Delta Lake's `DelayedCommitProtocol` established this shape for
  * manifest-governed tables on object stores; the reference gets the
  * equivalent from Icechunk's content-addressed chunk keys
  * (store/icechunk_store.py — chunks land under unique keys, the
  * snapshot file is the only commit point).
  *
  * Task-side state: [[newTaskTempFile]] records each path it hands out;
  * [[commitTask]] ships the list to the driver; [[commitJob]] (driver)
  * aggregates into [[committedFiles]]. [[abortTask]] deletes its own
  * files best-effort (vacuum covers the rest).
  *
  * Instantiated by Spark via reflection (`spark.sql.sources.
  * commitProtocolClass`) on an internal execution thread (AQE result
  * stages run off the calling thread), so the driver-side instance is
  * handed back through a registry keyed by the job's output path —
  * [[DirectWriteProtocol.take]]. Two concurrent writers to the SAME
  * collection root in one JVM would be indistinguishable under that key,
  * so [[Collection]] serializes the physical-write JOB per root within
  * the JVM (manifest-commit concurrency — the contended part — is
  * untouched, and separate driver JVMs never share a registry).
  */
final class DirectWriteProtocol(jobId: String, path: String,
                                dynamicPartitionOverwrite: Boolean)
    extends FileCommitProtocol with Serializable {

  def this(jobId: String, path: String) = this(jobId, path, false)

  require(!dynamicPartitionOverwrite,
    "DirectWriteProtocol appends under manifest governance; dynamic " +
    "partition overwrite must be expressed as a manifest commit, not a " +
    "filesystem overwrite")

  /** Job-unique filename namespace (jobId is caller-supplied and not
    * guaranteed unique across concurrent writers; this is). */
  private val uuid: String = UUID.randomUUID().toString

  // driver-side registration: Spark reflects this class into existence
  // right before the write job runs; the writer that armed the conf
  // collects it by output path after the job returns
  DirectWriteProtocol.register(path, this)

  /** Task-side: paths handed out by [[newTaskTempFile]] on this attempt. */
  @transient private var added: ArrayBuffer[String] = _

  /** Driver-side: the exact relative paths of every committed task's
    * files, available after [[commitJob]]. */
  @transient @volatile private var committed: Seq[String] = _

  def committedFiles: Seq[String] = {
    require(committed != null,
      "committedFiles read before commitJob — the write job did not complete")
    committed
  }

  override def newTaskTempFile(ctx: TaskAttemptContext, dir: Option[String],
                               spec: FileNameSpec): String = {
    val attempt = ctx.getTaskAttemptID
    val name = f"${spec.prefix}part-${attempt.getTaskID.getId}%05d-$uuid" +
      f"-a${attempt.getId}${spec.suffix}"
    val rel = dir.map(d => s"$d/$name").getOrElse(name)
    added += rel
    new Path(path, rel).toString
  }

  override def newTaskTempFileAbsPath(ctx: TaskAttemptContext,
                                      absoluteDir: String,
                                      spec: FileNameSpec): String =
    throw new UnsupportedOperationException(
      "absolute-path writes are not part of the collection write protocol")

  override def setupJob(jobContext: JobContext): Unit = ()

  override def commitJob(jobContext: JobContext,
                         taskCommits: Seq[TaskCommitMessage]): Unit = {
    committed = taskCommits.flatMap(_.obj.asInstanceOf[Seq[String]])
  }

  override def abortJob(jobContext: JobContext): Unit = ()
  // files of committed tasks stay behind as unreferenced data files;
  // vacuum's age-gated sweep reclaims them (same contract as a crashed
  // staged write)

  override def setupTask(taskContext: TaskAttemptContext): Unit = {
    added = ArrayBuffer.empty[String]
  }

  override def commitTask(taskContext: TaskAttemptContext): TaskCommitMessage =
    new TaskCommitMessage(added.toList)

  override def abortTask(taskContext: TaskAttemptContext): Unit = {
    val fs = new Path(path).getFileSystem(taskContext.getConfiguration)
    added.foreach { rel =>
      try fs.delete(new Path(path, rel), false)
      catch { case _: Exception => () }
    }
  }
}

object DirectWriteProtocol {
  /** SQLConf key selecting the commit protocol class for V1 file writes. */
  val ConfKey = "spark.sql.sources.commitProtocolClass"

  /** The conf is SESSION-wide but direct writes can run concurrently on
    * many threads of one session (each collection write is a separate V1
    * job): refcount the install so the first writer in sets the conf and
    * the last writer out restores it — a plain set/restore pair per
    * writer would let writer A's restore race writer B's job planning. */
  private val installs =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.SparkSession,
      (java.util.concurrent.atomic.AtomicInteger, Option[String])]

  def install(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    val entry = installs.computeIfAbsent(spark, s =>
      (new java.util.concurrent.atomic.AtomicInteger(0), s.conf.getOption(ConfKey)))
    if (entry._1.incrementAndGet() == 1)
      spark.conf.set(ConfKey, classOf[DirectWriteProtocol].getName)
  }

  def uninstall(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    val entry = installs.get(spark)
    if (entry != null && entry._1.decrementAndGet() == 0) {
      installs.remove(spark)
      entry._2 match {
        case Some(v) => spark.conf.set(ConfKey, v)
        case None    => spark.conf.unset(ConfKey)
      }
    }
  }

  /** Driver-side instances by output path (the only identity Spark
    * threads through to the protocol constructor). One entry per root at
    * a time — [[Collection]] holds the per-root write lock while a direct
    * job is in flight. */
  private val byPath =
    new java.util.concurrent.ConcurrentHashMap[String, DirectWriteProtocol]

  private def register(path: String, p: DirectWriteProtocol): Unit =
    byPath.put(path, p)

  /** Remove and return the protocol instance the just-finished write job
    * registered for `path` (qualified URI string), if any. */
  def take(path: String): Option[DirectWriteProtocol] =
    Option(byPath.remove(path))
}
