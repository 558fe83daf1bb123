package graft.core

import org.apache.hadoop.conf.Configuration

/** Hadoop Configuration factory for the copy layer.
  *
  * Uses RawLocalFileSystem for file:// so local copies don't grow `.crc`
  * shadow files (ChecksumFileSystem). On HDFS/object stores the scheme's own
  * FileSystem is unaffected. Checksum comparison then returns null locally,
  * which the update-diff treats as "same" — exactly the reference's
  * null-checksum contract (DistCpUtils.java:257-291).
  */
object Fs {
  def conf(): Configuration = {
    val c = new Configuration()
    c.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    c
  }
}
