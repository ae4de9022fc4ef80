package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** A11/A12 — object-store transfer, re-expressed on the Hadoop FS
  * connector. The reference hand-rolls chunked/resumable GCS uploads above
  * 10 MB and chunked downloads
  * (`/root/reference/dags/ethereum2etl_airflow/gcs_utils.py:7-42,45-59`);
  * with Spark the FS connector (gs://, s3a://, file://) owns transport,
  * retry and multipart behavior — these helpers keep the same call shape
  * (upload/download/exists) against any scheme.
  */
object FsTransfer {

  /** Threshold the reference switches to resumable uploads at
    * (`gcs_utils.py:4,17`) — the FS connector handles this internally;
    * retained as documentation of the semantic boundary. */
  val ChunkThresholdBytes: Long = 10L * 1024 * 1024

  private def fs(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  /** Upload a local file to `destUri` (any Hadoop scheme). Overwrites.
    * Returns false when the source is missing (the reference returns False
    * on 404 — `gcs_utils.py:38-42`). */
  def upload(localFile: String, destUri: String,
             conf: Configuration = new Configuration()): Boolean = {
    val src = new java.io.File(localFile)
    if (!src.exists()) return false
    val target = fs(destUri, conf)
    target.copyFromLocalFile(false, true, new Path(localFile), new Path(destUri))
    true
  }

  /** Download `srcUri` to a local file. False when absent. */
  def download(srcUri: String, localFile: String,
               conf: Configuration = new Configuration()): Boolean = {
    val source = fs(srcUri, conf)
    val p = new Path(srcUri)
    if (!source.exists(p)) return false
    source.copyToLocalFile(false, p, new Path(localFile), true)
    true
  }

  /** Existence probe (sensor predicate for Orchestration.waitFor). */
  def exists(uri: String, conf: Configuration = new Configuration()): Boolean =
    fs(uri, conf).exists(new Path(uri))

  /** Recursive directory copy (export-tree publish). */
  def copyTree(srcUri: String, destUri: String,
               conf: Configuration = new Configuration()): Boolean = {
    val s = fs(srcUri, conf); val d = fs(destUri, conf)
    if (!s.exists(new Path(srcUri))) return false
    FileUtil.copy(s, new Path(srcUri), d, new Path(destUri), false, true, conf)
  }
}
