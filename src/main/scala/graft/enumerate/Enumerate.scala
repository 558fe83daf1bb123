package graft.enumerate

import java.util.regex.Pattern

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.{FileMeta, Fs, PathUtils}

/** Parallel filesystem enumeration (SURVEY.md §2.1 ops 1-4, 18).
  *
  * The reference walks each source tree with a driver-side stack
  * (DistCPPlus.java:611-750) and batches metadata RPCs by parent dir
  * (FileStatusClusterOptimizer.java:50-115). Here the walk is a distributed
  * level-by-level BFS: each round lists the current frontier of directories
  * with one `listStatus` per dir executed inside `mapPartitions`, so a
  * 1000-executor cluster fans the metadata RPCs out instead of serializing
  * them on the driver — the reference's worst scalability bottleneck
  * (SURVEY.md §2.2). The result is metadata-scale (one row per file), so
  * collect-free Dataset unions stay cheap relative to the data being copied.
  */
object Enumerate {

  /** Canonical rendering of a root path for prefix-relativization against
    * enumerated [[FileMeta.path]]s: qualified by the path's OWN filesystem,
    * so user-typed roots ("/a/b", "hdfs://nn/a") and status paths
    * ("file:/a/b", "hdfs://nn/a/x") agree segment-for-segment. */
  def qualify(root: String): String = {
    val p = new Path(root)
    p.getFileSystem(Fs.conf()).makeQualified(p).toString
  }

  def toMeta(st: FileStatus): FileMeta =
    FileMeta(
      // the FULL qualified URI, scheme included: stripping to the bare path
      // (toUri.getPath) made every later access re-resolve against the
      // DEFAULT filesystem — invisible locally, but a dual-cluster copy
      // (hdfs://nn1 → hdfs://nn2, the reference's primary use case,
      // DistCPPlus.java:38-43) would read the wrong cluster, and checksum
      // fetches degraded to the default FS's (null ⇒ CRC diff silently off)
      path = st.getPath.toString,
      length = st.getLen,
      isDir = st.isDirectory,
      replication = st.getReplication.toInt,
      blockSize = st.getBlockSize,
      mtime = st.getModificationTime,
      atime = st.getAccessTime,
      perm = st.getPermission.toString,
      owner = st.getOwner,
      group = st.getGroup,
    )

  private def fs(conf: Configuration, path: String): FileSystem =
    new Path(path).getFileSystem(conf)

  /** List the children of a set of directories, one listStatus RPC per dir
    * (executor-side). */
  private def listLevel(spark: SparkSession, dirs: Dataset[String]): Dataset[FileMeta] = {
    import spark.implicits._
    dirs.mapPartitions { paths =>
      val conf = Fs.conf()
      paths.flatMap { p =>
        val f = fs(conf, p)
        f.listStatus(new Path(p)).iterator.map(toMeta)
      }
    }
  }

  /** Full recursive enumeration of `root` (the root entry itself included). */
  def listTree(spark: SparkSession, root: String): Dataset[FileMeta] = {
    import spark.implicits._
    val conf = Fs.conf()
    val rootMeta = toMeta(fs(conf, root).getFileStatus(new Path(root)))
    var acc = spark.createDataset(Seq(rootMeta))
    var frontier = spark.createDataset(if (rootMeta.isDir) Seq(rootMeta.path) else Nil)
    var depth = 0
    while (frontier.count() > 0) {
      val level = listLevel(spark, frontier).localCheckpoint()
      acc = acc.union(level)
      frontier = level.filter(_.isDir).map(_.path)
      depth += 1
      // the union chain otherwise grows one plan node per tree level:
      // flatten the accumulator's lineage periodically so pathologically
      // deep trees (depth 10³+) don't bloat the plan / driver stack
      if (depth % 8 == 0) acc = acc.localCheckpoint()
    }
    acc
  }

  /** `-f <urilist>`: newline-delimited URI list (DistCpUtils.java:378-394).
    * Lines are TRIMMED, not just emptiness-filtered: a CRLF list authored
    * on Windows otherwise yields paths with a trailing \r that fail
    * getFileStatus for files that exist. */
  def fileList(spark: SparkSession, uri: String): Dataset[String] = {
    import spark.implicits._
    spark.read.textFile(uri).map(_.trim).filter(_.nonEmpty)
  }

  /** `-rg` flat source selection — all three reference branches
    * (Arguments.java:184-201 parse; 306-346 getFilePaths). The combined path
    * `dir/pattern` is resolved in order:
    *   1. it IS a directory → its immediate FILES only (subdirectories are
    *      skipped), names filtered by `startsWith(prefix)`. The `-rg` CLI
    *      passes "" exactly as the reference's does (Arguments.java:196);
    *      the parameter exists for parity with getFilePaths' programmatic
    *      surface, where callers pass a real name prefix;
    *   2. it IS a file → that file alone;
    *   3. otherwise, if the parent exists → the parent's children — files
    *      AND directories, the reference's regex branch has no isDir skip —
    *      whose NAME fully matches the trailing segment as a regex;
    *   4. a missing parent yields the empty set (reference returns an empty
    *      collection rather than failing).
    */
  def flatRegex(
      spark: SparkSession,
      dirAndPattern: String,
      prefix: String = "",
  ): Dataset[FileMeta] = {
    import spark.implicits._
    val conf = Fs.conf()
    val full = new Path(dirAndPattern)
    val f = full.getFileSystem(conf)
    val st =
      try Some(f.getFileStatus(full))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case Some(s) if s.isDirectory =>
        listLevel(spark, spark.createDataset(Seq(s.getPath.toString)))
          .filter { m =>
            val name = m.path.substring(m.path.lastIndexOf('/') + 1)
            !m.isDir && name.startsWith(prefix)
          }
      case Some(s) =>
        spark.createDataset(Seq(toMeta(s)))
      case None =>
        val idx = dirAndPattern.lastIndexOf('/')
        // no '/' at all (relative pattern with no parent): branch 4 — the
        // reference returns the empty selection; new Path("") would throw
        if (idx < 0) return spark.emptyDataset[FileMeta]
        // idx == 0 is a root-level pattern ("/part.*"): the parent is "/",
        // not the empty string new Path rejects
        val dir = if (idx == 0) "/" else dirAndPattern.take(idx)
        val pattern = dirAndPattern.drop(idx + 1)
        if (!f.exists(new Path(dir))) spark.emptyDataset[FileMeta]
        else
          listLevel(spark, spark.createDataset(Seq(dir))).filter { m =>
            val name = m.path.substring(m.path.lastIndexOf('/') + 1)
            Pattern.matches(pattern, name)
          }
    }
  }

  /** `-regexPath` depth-wise regex selection (Arguments.java:363-437): the
    * relative path segment at depth d must fully match `regexes(d)`; leaves
    * are entries with exactly `regexes.length` matching segments. Returns
    * (selected leaves, touched intermediate dirs). */
  def depthRegex(
      spark: SparkSession,
      root: String,
      regexes: Seq[String],
  ): (Dataset[FileMeta], Dataset[FileMeta]) = {
    val compiled = regexes.map(Pattern.compile(_))
    val tree = listTree(spark, root)
    val qRoot = qualify(root)
    def relSegs(m: FileMeta): Option[Vector[String]] =
      PathUtils.makeRelative(qRoot, m.path).filter(_ != ".").map(_.split('/').toVector)
    def prefixMatches(segs: Vector[String]): Boolean =
      segs.length <= compiled.length &&
        segs.zip(compiled).forall { case (s, p) => p.matcher(s).matches() }
    val leaves = tree.filter { m =>
      relSegs(m).exists(s => s.length == compiled.length && prefixMatches(s))
    }
    val touched = tree.filter { m =>
      m.isDir && relSegs(m).exists(s => s.length < compiled.length && prefixMatches(s))
    }
    (leaves, touched)
  }

  /** The `-regexPath` FILE selection [[graft.plan.Planner]] copies: leaf
    * files at exactly `regexes.length` matching segments PLUS every file
    * underneath a matched directory — one distributed filter over the tree
    * [[depthRegex]]'s BFS already enumerated, with no driver-side dir
    * collection and no per-dir re-walk. */
  def depthRegexFiles(
      spark: SparkSession,
      root: String,
      regexes: Seq[String],
  ): Dataset[FileMeta] = {
    val compiled = regexes.map(Pattern.compile(_))
    val len = compiled.length
    val tree = listTree(spark, root)
    val qRoot = qualify(root)
    tree.filter { m =>
      !m.isDir && PathUtils.makeRelative(qRoot, m.path).filter(_ != ".").exists { rel =>
        val segs = rel.split('/')
        segs.length >= len &&
          segs.take(len).zip(compiled).forall { case (s, p) => p.matcher(s).matches() }
      }
    }
  }

  /** Batched metadata fetch (FileStatusClusterOptimizer.java:33-147): group
    * requested paths by parent, hydrate each group with ONE listStatus RPC. */
  def batchedStatus(spark: SparkSession, paths: Dataset[String]): Dataset[FileMeta] = {
    import spark.implicits._
    paths
      .groupByKey(p => p.take(math.max(p.lastIndexOf('/'), 1)))
      .flatMapGroups { (parent, children) =>
        // membership on the scheme-less URI path so callers may request with
        // or without a scheme; emitted metas carry the qualified URI
        val want = children.map(c => new Path(c).toUri.getPath).toSet
        val conf = Fs.conf()
        val f = fs(conf, parent)
        f.listStatus(new Path(parent)).iterator
          .filter(st => want.contains(st.getPath.toUri.getPath))
          .map(toMeta)
      }
  }
}
