package graft

import java.nio.file.{Files, Path, Paths}

/** Project-owned temp-dir namespace (r16, ADVICE + verdict #2): every
  * THROWAWAY fixture dir — query-lifecycle tables, Materialize dumps,
  * ScalaTest fixtures — is minted under ONE root
  * (`java.io.tmpdir/graft-tmp/`) instead of scattering prefixed dirs
  * across the shared tmpdir. Two things fall out:
  *
  *  1. '''Sweeping is safe by construction.''' The bench's stale-dir
  *     sweep deletes only inside this root, so a foreign process's
  *     `gt_backup_20260816`-style dir in /tmp is outside the blast
  *     radius no matter what prefixes it shares — the r15 sweep's
  *     prefix+digit-tail heuristic over the tmpdir ROOT is retired.
  *
  *  2. '''Leak accounting is exact.''' `entries()` counts the root's
  *     children — a per-run/per-section delta of graft-owned fixture
  *     dirs, not a census of whatever else the machine dropped in /tmp
  *     (the r15 `tmp_entries` counter mixed this repo's leaks with the
  *     rest of the box, so lineage drift was unattributable).
  *
  * STANDING cross-run assets (postings/IVF/sketch-corpus tables under
  * [[graft.table.StandingIndex.root]], the fixed-path oracle bars dump)
  * deliberately do NOT live here: everything under this root is
  * deletable once it is older than the sweep horizon.
  */
object GraftTmp {

  /** The namespace root; created on first use. */
  def root: Path = {
    val r = Paths.get(sys.props("java.io.tmpdir"), "graft-tmp")
    Files.createDirectories(r)
    r
  }

  /** Drop-in replacement for `Files.createTempDirectory(prefix)` that
    * mints the dir inside [[root]]. */
  def dir(prefix: String): Path = Files.createTempDirectory(root, prefix)

  /** Number of fixture dirs currently under the root — the leak
    * counter the bench stamps before/after each section. */
  def entries(): Int = {
    val f = root.toFile
    Option(f.list()).map(_.length).getOrElse(0)
  }

  /** Delete every child of the root older than `maxAgeMs` (default
    * 2 h — older than any live run: the bench budget is < 1 h and the
    * test suite ~20 min). Owner-gated like the r15 sweep so a shared
    * /tmp with another user's graft-tmp contents never mixes blast
    * radii. Returns (dirs deleted, bytes reclaimed). */
  def sweep(maxAgeMs: Long = 2 * 3600 * 1000L): (Int, Long) = {
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val me = sys.props("user.name")
    def ownedByMe(d: java.io.File): Boolean = scala.util.Try(
      Files.getOwner(d.toPath).getName == me).getOrElse(false)
    var n = 0
    var bytes = 0L
    Option(root.toFile.listFiles()).getOrElse(Array.empty).foreach { d =>
      if (d.lastModified() < cutoff && ownedByMe(d)) {
        val sz = dirBytes(d)
        if (scala.util.Try(
            org.apache.commons.io.FileUtils.deleteDirectory(d)).isSuccess ||
            !d.exists()) { n += 1; bytes += sz }
      }
    }
    (n, bytes)
  }

  private def dirBytes(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).getOrElse(Array.empty).map(dirBytes).sum
}
