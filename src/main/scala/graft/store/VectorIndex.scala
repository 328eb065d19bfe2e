package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ANN INDEX AT REST (round-15 verdict item 1): persistence for the
  * serving cascade's per-corpus artifacts — signature words, PQ codebook,
  * per-row subspace codes + reconstructed norms
  * ([[graft.queries.VectorOps.buildIndexFrames]]).
  *
  * The r15 cascade was CORRECT but carried its index build inside every
  * query: the 496-bit signature pass was the measured 2.6 → 4.1 s serve
  * regression, and the in-query argmin re-encode is why the k=64 codebook
  * arm (the recall dial at the 4-bit-fidelity boundary) was rejected as
  * serve-uneconomical (SWEEP15). A production vector store encodes ONCE
  * at ingest and serves lookups — this object is that move: the index is
  * a parquet sidecar keyed by (corpus identity, dial set), built on first
  * use and reused by every later query, bench pass, and process.
  *
  * Layout: `<base>/<sha1(corpus path + embeddings fingerprint + dials)>`
  * holding `codes` and `codebook` parquet dirs plus a `_built` marker.
  * Base defaults to
  * `java.io.tmpdir/graft_vindex` (override: `-Dgraft.vindex.dir=`); on a
  * cluster it would live next to the table like any secondary index. The
  * fingerprint (embeddings file length + mtime) keys the cache to the
  * corpus CONTENT, so a regenerated testdata dir can never serve a stale
  * index to the oracle gate.
  *
  * Build is crash/race-safe by write-then-atomic-rename: frames land in a
  * hidden sibling dir, the marker is written LAST, and the dir renames
  * into place atomically — two processes racing (e.g. Bench and its own
  * isolated-recheck child) produce one winner; the loser deletes its
  * attempt and reads the winner's. Content is a pure deterministic
  * function of the corpus (fixed seeds, tie-broken argmins, rounded
  * means), so WHO wins never matters — the bytes are the same.
  */
object VectorIndex {

  private def baseDir: java.io.File =
    new java.io.File(sys.props.getOrElse("graft.vindex.dir",
      System.getProperty("java.io.tmpdir") + "/graft_vindex"))

  /** Corpus-content fingerprint: embeddings file size + mtime (the same
    * staleness signal a metastore keeps). Directory-shaped corpora hash
    * their children. */
  private def fingerprint(dir: String): String = {
    val f = new java.io.File(dir, "embeddings.parquet")
    if (f.isFile) s"${f.length}_${f.lastModified}"
    else if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .sortBy(_.getName).map(c => s"${c.getName}:${c.length}").mkString(",")
    else "absent"
  }

  /** Deterministic index location for (corpus, dials). */
  def indexDir(dir: String, words: Int, k: Int, stride: Int,
      steps: Int, m: Int): java.io.File = {
    val canonical = new java.io.File(dir).getCanonicalPath
    val keySrc =
      s"$canonical|${fingerprint(dir)}|w$words k$k s$stride t$steps m$m"
    val key = java.security.MessageDigest.getInstance("SHA-1")
      .digest(keySrc.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(16)
    new java.io.File(baseDir, key)
  }

  /** Read the index for (dir, dials), building it first via `build` if it
    * is not yet at rest. Returns (codes, codebook) frames. */
  def ensure(spark: SparkSession, dir: String, words: Int, k: Int,
      stride: Int, steps: Int, m: Int = 16)(build: => (DataFrame, DataFrame))
      : (DataFrame, DataFrame) = {
    val target = indexDir(dir, words, k, stride, steps, m)
    if (!new java.io.File(target, "_built").isFile) {
      baseDir.mkdirs()
      val tmp = new java.io.File(baseDir,
        s".build-${java.util.UUID.randomUUID}")
      val (codes, cb) = build
      codes.write.mode("overwrite").parquet(s"$tmp/codes")
      cb.write.mode("overwrite").parquet(s"$tmp/codebook")
      // marker BEFORE the rename: a crash mid-build leaves a hidden
      // marker-less dir that can never be read as an index
      java.nio.file.Files.write(tmp.toPath.resolve("_built"),
        Array.emptyByteArray)
      try {
        java.nio.file.Files.move(tmp.toPath, target.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        ()
      } catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException |
             _: java.nio.file.AccessDeniedException =>
          // lost the race — identical bytes already at rest
          org.apache.commons.io.FileUtils.deleteDirectory(tmp)
      }
    }
    (spark.read.parquet(s"$target/codes"),
      spark.read.parquet(s"$target/codebook"))
  }
}
