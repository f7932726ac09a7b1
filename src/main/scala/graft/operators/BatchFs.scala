package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** The file half of the idempotent batch-append protocol, shared by
  * every batch-keyed sink ([[IvfIndex.appendBatch]] and
  * [[TextSearch.appendTermBatch]]): a staged partitioned parquet write
  * is committed into a live partitioned directory by MOVING each data
  * file in under a `b<tag>-` prefix, after first deleting any files of
  * that prefix left by a crashed earlier attempt. On a local
  * filesystem the move is a rename; on an object store the same
  * protocol runs against a manifest.
  *
  * Directory streams are eagerly listed and CLOSED — these sinks live
  * in long-running streaming jobs, and an unclosed Files.list holds a
  * directory fd until GC, which is not guaranteed before exhaustion.
  */
private[graft] object BatchFs {

  def children(p: Path): List[Path] = {
    val s = Files.list(p)
    try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toList }
    finally s.close()
  }

  private def partitionDirs(root: Path, partPrefix: String): List[Path] =
    children(root).filter(p => Files.isDirectory(p) &&
      p.getFileName.toString.startsWith(partPrefix))

  /** Step 3a: clear `b<tag>-*` files from a crashed prior commit
    * attempt out of the live partition directories. */
  def clearBatch(liveRoot: Path, partPrefix: String, tag: String): Unit =
    if (Files.exists(liveRoot)) {
      partitionDirs(liveRoot, partPrefix).foreach { dir =>
        children(dir)
          .filter(_.getFileName.toString.startsWith(s"b$tag-"))
          .foreach(Files.delete(_))
      }
    }

  /** Step 3b: move staged parquet data files into the live partition
    * directories under the batch prefix. */
  def commitStaged(stagingRoot: Path, liveRoot: Path, partPrefix: String,
                   tag: String): Unit =
    partitionDirs(stagingRoot, partPrefix).foreach { stagedDir =>
      val dst = liveRoot.resolve(stagedDir.getFileName)
      Files.createDirectories(dst)
      children(stagedDir)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach { f =>
          Files.move(f, dst.resolve(s"b$tag-${f.getFileName}"),
            StandardCopyOption.REPLACE_EXISTING)
        }
    }

  /** Step 4: the commit marker, written LAST. */
  def writeMarker(marker: Path, payload: String): Unit = {
    Files.createDirectories(marker.getParent)
    Files.write(marker, payload.getBytes("UTF-8"))
    ()
  }

  /** Markers live under a VERSIONED directory: the tag scheme has
    * changed once already (32-bit hashCode → SHA-256 namespaces), and
    * a persisted sink spanning such a change replays its last
    * committed batch under the new scheme — silent duplication. The
    * version dir makes the break explicit: any future scheme change
    * bumps this constant, and an index/sink that spans the upgrade
    * must be rebuilt (or its stats refreshed from committed data)
    * once, instead of trusting markers the new scheme can't see. */
  private[graft] val MarkerSchemeVersion = "v2"

  def markerFor(dir: String, batchId: Long, namespace: String): Path = {
    val tag = batchTag(batchId, namespace)
    Paths.get(s"$dir/_committed/$MarkerSchemeVersion/$tag")
  }

  def batchTag(batchId: Long, namespace: String): String =
    if (namespace.isEmpty) s"$batchId" else s"$namespace-$batchId"

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try {
        s.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { Files.delete(f); () })
      } finally s.close()
    }
}
