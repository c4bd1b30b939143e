package graft.table

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Shared plumbing for STANDING index tables — the dedup sketch corpus,
  * the IVF index, and the positional postings table. Each is a graft
  * table living beside the corpus it indexes: built once, appended
  * incrementally, read by every consumer instead of re-scanning corpus
  * text/vectors per query.
  *
  * Two shared concerns live here:
  *
  *  1. '''Content-addressed location.''' The table's path is keyed by a
  *     fingerprint of the SOURCE table's files, so an unchanged corpus
  *     reuses (and appends to) its standing index across runs while a
  *     regenerated corpus keys to a fresh one. The fingerprint covers
  *     (name, length, mtime) '''plus a footer-byte sample of every
  *     part file''': a source regenerated in place with identical file
  *     sizes inside the filesystem's mtime granularity — plausible for
  *     a deterministic generator — still re-keys, because parquet
  *     footers carry row-group statistics that change with content.
  *     The sample reads 4 KiB per part file: metadata-cheap even for a
  *     many-file source, and never a data scan.
  *
  *  2. '''Byte-targeted file sizing.''' Index writes bin-pack their
  *     output toward a target file size using [[GraftTable.optimize]]'s
  *     exact logged-bytes computation (write, then OPTIMIZE clustered
  *     by the index's probe key), replacing fixed `repartition(8)`
  *     constants that under-split at sf1+ and over-split tiny
  *     fixtures. The OPTIMIZE doubles as layout: files cover disjoint
  *     probe-key ranges, so point probes (a phrase vocabulary pushed as
  *     a literal In, an IVF cell id) skip row groups via footer stats —
  *     the actual inverted-index layout, not just size hygiene.
  *     Incremental appends re-bin only their own tail (the provenance
  *     skip carries every ≥half-target file unread).
  */
object StandingIndex {

  /** Default target file size for standing-index writes (shared with
    * OPTIMIZE's bin-packing default). */
  val DefaultTargetBytes: Long = GraftTable.DefaultTargetFileSizeBytes

  /** Content fingerprint of `dir/table` (see class doc).
    *
    * '''Graft-table sources skip the walk entirely''': the manifest
    * version already IS the content identity (commits are the only way
    * content changes, and versions are immutable once written), so the
    * digest covers just (canonical table path, latest manifest name,
    * its length, its mtime) — one directory listing of `_graft_log` +
    * one stat, no LIST+read storm over 100k+ data files per path
    * resolution. The manifest's CONTENT (a few hundred bytes of commit
    * JSON, hashed whole) guards the one hole version numbers alone
    * leave: a table deleted and regenerated at the same path restarts
    * at v0 — and because commit JSON carries an in-commit timestamp,
    * the regenerated manifest's bytes differ even when its name,
    * length, and (within filesystem granularity) mtime all collide
    * with the old one's.
    *
    * '''Raw parquet dirs keep the recursive walk''': nothing else pins
    * their identity. The walk recurses into subdirectories (a
    * hive-partitioned source keeps its leaf files' identity in the
    * digest) and keys each file by its ROOT-RELATIVE path, so two
    * layouts with identical leaf names in different partition dirs
    * cannot collide; a directory whose listing fails contributes its
    * path only (never an NPE). */
  def fingerprint(dir: String, table: String): String = {
    val root = new java.io.File(dir, table)
    val manifests = Option(new java.io.File(root, "_graft_log").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.getName.startsWith("v") && f.getName.endsWith(".json"))
    if (manifests.nonEmpty) {
      val latest = manifests.maxBy(_.getName) // zero-padded → lexicographic max
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update((s"graft:${root.getCanonicalPath}:${latest.getName}:")
        .getBytes("UTF-8"))
      // hash the manifest's bytes, not (length, mtime): commit JSON is
      // tiny and its in-commit timestamp makes a same-name same-length
      // regenerated manifest distinguishable within mtime granularity
      md.update(java.nio.file.Files.readAllBytes(latest.toPath))
      return md.digest().map(b => f"$b%02x").mkString
    }
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        .sortBy(_.getName).flatMap(walk)
    val parts = walk(root)
    val rootPath = root.toPath
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach { f =>
      val rel =
        if (f == root) f.getName
        else try rootPath.relativize(f.toPath).toString
        catch { case _: IllegalArgumentException => f.getName }
      md.update(s"$rel:${f.length}:${f.lastModified}:".getBytes("UTF-8"))
      md.update(footerSample(f))
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Last ≤4 KiB of a file — covers the parquet footer (schema +
    * row-group stats + data-page offsets), which differs whenever
    * content differs even at equal byte length. */
  private def footerSample(f: java.io.File): Array[Byte] = {
    if (!f.isFile || f.length == 0) return Array.emptyByteArray
    val take = math.min(4096L, f.length).toInt
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      raf.seek(f.length - take)
      val buf = new Array[Byte](take)
      raf.readFully(buf)
      buf
    } finally raf.close()
  }

  /** Root directory standing indexes live under: the
    * SPARK_GRAFT_INDEX_ROOT env var when set (the deployment hook — a
    * real catalog points this at its managed location), else the JVM
    * temp dir (the builder-environment stand-in). */
  def root: String =
    sys.env.getOrElse("SPARK_GRAFT_INDEX_ROOT", sys.props("java.io.tmpdir"))

  /** Standing location for an index over `dir/table`, under [[root]]. */
  def path(prefix: String, dir: String, table: String): String =
    new java.io.File(root, s"$prefix${fingerprint(dir, table)}").toString

  /** Write (or append) `df` into the standing table at `path` and
    * byte-target its files: OPTIMIZE clustered by `clusterBy` toward
    * `targetBytes`, sized from the commit's LOGGED file bytes — exact,
    * no estimator. On append, only the appended tail (plus any
    * undersized prior tail) rewrites. Returns the table handle. */
  def writeSized(spark: SparkSession, path: String, df: DataFrame,
      clusterBy: Seq[String], mode: SaveMode = SaveMode.Overwrite,
      targetBytes: Long = DefaultTargetBytes): GraftTable = {
    val t = GraftTable(spark, path)
    t.write(df, mode)
    t.optimize(clusterBy, targetBytes)
    t
  }
}
