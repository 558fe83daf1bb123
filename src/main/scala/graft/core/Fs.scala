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
    // FileSystem.CACHE is keyed by (scheme, authority), NOT by conf — if any
    // other code in the JVM (e.g. Spark's own parquet reads) instantiates the
    // default checksummed LocalFileSystem for file:// first, a cached lookup
    // would hand it back here and the copy layer would silently grow .crc
    // shadow files. Bypass the cache so fs.file.impl is always honored.
    c.setBoolean("fs.file.impl.disable.cache", true)
    c
  }
}
