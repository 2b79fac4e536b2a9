package graft

import graft.streaming.{StoreCatalog, StoreMaintenance}

/** The standing-store catalog's guards: every streaming fold that writes
  * a store path is cataloged (parsed from the StreamingOps SOURCE, so a
  * new fold without a catalog row fails here), every cataloged family
  * names a prune path, and the two versioned layouts' prune operators
  * actually reclaim old versions.
  */
class StoreCatalogSpec extends SparkSpec {

  test("every storePath-writing fold in StreamingOps is cataloged") {
    val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/scala/graft/streaming/StreamingOps.scala")), "UTF-8")
    // defs whose parameter list includes a store/assign path
    val defs = "def (\\w+)\\(([^)]*)\\)".r.findAllMatchIn(src)
      .filter(m => m.group(2).contains("storePath:") ||
        m.group(2).contains("assignPath:"))
      .map(_.group(1)).toSet - "latestHllVersionBefore" // a reader, not a fold
    // exact identifier-set membership, not substring containment: a
    // future fold whose name is a substring of a cataloged fold string
    // (e.g. `clusterStream` vs `semanticClusterStream`) must NOT pass
    // vacuously
    val cataloged: Set[String] =
      (StoreCatalog.All.map(_.fold) ++ StoreCatalog.FoldAliases.keys)
        .flatMap(_.split("\\W+")).filter(_.nonEmpty).toSet
    val missing = defs.filterNot(cataloged.contains)
    assert(missing.isEmpty, s"uncataloged store folds: $missing")
    assert(defs.size >= 20, s"source parse degraded: only $defs")
  }

  test("every cataloged family has a prune path; catalog covers all five layouts") {
    for (f <- StoreCatalog.All)
      assert(f.layout.prunePath.nonEmpty, f.name)
    val layouts = StoreCatalog.All.map(_.layout).distinct
    assert(layouts.size === 5, s"layouts present: $layouts")
    assert(StoreCatalog.All.size >= 26)
    // names are unique (the SURVEY §8 table keys on them)
    assert(StoreCatalog.All.map(_.name).distinct.size === StoreCatalog.All.size)
  }

  test("pruneVersions reclaims flat-versioned history (keepLast honored, newest kept)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-prune").toString
    for (v <- Seq(3L, 7L, 12L, 20L))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/v=$v"))
    assert(StoreMaintenance.versions(spark, tmp) === Seq(3L, 7L, 12L, 20L))
    val pruned = StoreMaintenance.pruneVersions(spark, tmp, keepLast = 2)
    assert(pruned === Seq(3L, 7L))
    assert(StoreMaintenance.versions(spark, tmp) === Seq(12L, 20L))
    // idempotent
    assert(StoreMaintenance.pruneVersions(spark, tmp, keepLast = 2) === Seq.empty)
  }

  test("pruneBucketVersions reclaims per-bucket history independently") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bprune").toString
    for ((b, v) <- Seq((0L, 1L), (0L, 5L), (0L, 9L), (3L, 2L), (3L, 4L)))
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$tmp/bucket=$b/v=$v"))
    val pruned = StoreMaintenance.pruneBucketVersions(spark, tmp, keepLast = 2)
    assert(pruned === Seq((0L, 1L)))
    assert(StoreMaintenance.bucketVersions(spark, tmp) ===
      Map(0L -> Seq(5L, 9L), 3L -> Seq(2L, 4L)))
  }
}
