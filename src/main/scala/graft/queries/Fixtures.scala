package graft.queries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once-per-sf-dir fixture cache under the JVM tmpdir — derived
  * corpus state (ANN indexes, PQ codebooks/code frames, text-format
  * copies) that the prebuilt gate queries treat as "the index is corpus
  * state, not query work".
  *
  * ATOMICITY: fixtures are built into a `.tmp` sibling and renamed into
  * place, so a run killed mid-build can never leave a partial directory
  * that a bare exists() check would accept forever; a lost rename race
  * (concurrent builder finished first) is detected and the loser's tmp
  * discarded.
  *
  * LOCAL-MODE PATH: the JVM tmpdir is correct here because the gate
  * harness runs local[N] (driver and executors share one filesystem).
  * On a real cluster this base must be SHARED storage (set
  * `java.io.tmpdir` to a scratch mount or adapt `cachedPath`) — a
  * node-local path would scatter fixture files across executors.
  *
  * STALENESS CONTRACT: the cache key is the sf DIRECTORY PATH (md5) —
  * the driver's testdata is immutable within a round, so path identity
  * is content identity here. If parquet under an sf dir is ever
  * regenerated IN PLACE, delete `/tmp/graft_*` (or reboot the sandbox)
  * before re-running gates; a content fingerprint would cost a full
  * data pass per query construction, which is exactly what the cache
  * exists to avoid.
  */
object Fixtures {

  /** Deterministic fixture location for (sf dir, kind) — pure path math,
    * no build. Verify uses this to splice fixture-reading oracle SQL
    * (`__GRAFT_FIXTURE:kind__` placeholders) so DuckDB can read the SAME
    * parquet a fixture-gated query read.
    */
  def pathFor(dir: String, kind: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_$key"
  }

  /** Path to the cached fixture, building it first if absent. */
  def cachedPath(s: SparkSession, dir: String, kind: String)(
      write: String => Unit): String = {
    val path = pathFor(dir, kind)
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val tmp = new Path(s"$path.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      try {
        write(tmp.toString)
        // re-check BEFORE renaming: on RawLocalFileSystem a rename onto an
        // existing directory silently COPIES the source inside it and
        // reports success, which would corrupt the winner's fixture — the
        // exists check narrows the race to the window between it and the
        // rename (fine for the sequential gate harness this serves; a
        // cross-JVM lock would be the next step if that ever mattered)
        if (fs.exists(p) || !fs.rename(tmp, p))
          require(fs.exists(p), s"fixture build failed for $path")
      } finally {
        if (fs.exists(tmp)) fs.delete(tmp, true) // loser's tmp or failed build
      }
    }
    path
  }

  /** Parquet-roundtripped fixture: build once, read back. */
  def cachedParquet(s: SparkSession, dir: String, kind: String)(
      build: => DataFrame): DataFrame =
    s.read.parquet(cachedPath(s, dir, kind)(tmp =>
      build.write.mode("overwrite").parquet(tmp)))
}
