package graft.sinks

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.IndexProtocol

/** Manifest-pinned snapshot-isolated lake (round-13 verdict #1): readers
  * and maintenance on the same table without coordination.
  *
  * The swap-managed tables ([[Sinks.swapIn]], [[Sinks.compactLakePartition]])
  * are crash-safe but assume readers and maintenance take turns — the
  * reference's cron cadence (reference: bigdata-project/app-deployment.yaml:
  * 95-96, overlapping runs forbidden). A 100 TB lake has ALWAYS-ON
  * readers: a reader that lists files mid-swap can observe a partition
  * half-moved. The industry answer (Iceberg/Delta) is snapshot isolation
  * via manifests, re-expressed here in its minimal form:
  *
  *   - data files are IMMUTABLE once published and NEVER deleted by a
  *     writer — only [[vacuum]] removes files, and only files no retained
  *     manifest references;
  *   - a manifest is the complete file listing of one table generation,
  *     made visible by one atomic rename ([[Manifests]] naming — the
  *     highest number wins);
  *   - a reader resolves a manifest ONCE ([[pin]]) and reads exactly
  *     those files; nothing any concurrent append/compaction does can
  *     change, remove or add to that file set, so the read is
  *     repeatable for as long as the generation stays inside the vacuum
  *     retention window.
  *
  * Layout:
  * {{{
  *   <root>/data/g<gen>/part-*.parquet   immutable generation data dirs
  *   <root>/_manifests/m<gen>.txt        one relative file path per line
  *   <root>/__stage/...                  invisible until renamed in
  * }}}
  *
  * Single-WRITER contract (readers are unrestricted — that is the point):
  * appends/compactions/vacuums must be serialized by the caller, like
  * every other maintenance writer in this engine. A crash at any point
  * leaves either a fully-published generation or an orphan stage/data
  * dir no manifest references (cleaned by the next [[vacuum]]); the
  * manifest rename is the commit point.
  *
  * Scale shape: manifests list files, not rows — a generation's manifest
  * is O(file count) text read once per pin by the driver; the data read
  * itself is the ordinary parquet scan over an explicit file list, with
  * the same pushdown/pruning as a directory scan.
  */
object SnapshotLake {

  /** A pinned snapshot: the generation and its exact file set (relative
    * to the table root). Everything a reader needs; immutable. */
  final case class Snapshot(root: String, generation: Long, files: Seq[String])

  private def manifestDir(root: String) = new Path(root, "_manifests")
  private def dataDir(root: String, gen: Long) = new Path(root, f"data/g$gen%06d")
  private val ManifestRe = "m(\\d+)\\.txt".r

  private def fs(spark: SparkSession, root: String): FileSystem =
    IndexProtocol.fileSystem(spark, root)

  /** All published generations, ascending; empty for a fresh table. */
  def generations(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .flatMap(st => st.getPath.getName match {
        case ManifestRe(g) => Some(g.toLong)
        case _ => None
      })
      .sorted
  }

  /** The current (highest-numbered) generation; None for a fresh table. */
  def currentGeneration(spark: SparkSession, root: String): Option[Long] =
    generations(spark, root).lastOption

  /** Read one manifest's file list. */
  private def readManifest(f: FileSystem, root: String, gen: Long): Seq[String] = {
    val p = new Path(manifestDir(root), f"m$gen%06d.txt")
    val in = f.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, UTF_8).split("\n").toSeq
        .map(_.trim).filter(_.nonEmpty)
    } finally in.close()
  }

  /** Pin the table at a generation (default: the current one). The
    * returned [[Snapshot]] is the reader's whole contract — file sets of
    * published generations never change, so every read through it is
    * repeatable regardless of concurrent maintenance (until a [[vacuum]]
    * retires the generation).
    */
  def pin(spark: SparkSession, root: String, generation: Long = -1L): Snapshot = {
    val gen =
      if (generation >= 0) generation
      else currentGeneration(spark, root).getOrElse(
        throw new IllegalStateException(s"snapshot lake at $root has no published generation"))
    Snapshot(root, gen, readManifest(fs(spark, root), root, gen))
  }

  /** Read a pinned snapshot: exactly its manifest's files — no directory
    * listing, no visibility race with concurrent maintenance. An empty
    * manifest is unrepresentable (publish requires rows). */
  def read(spark: SparkSession, snap: Snapshot): DataFrame =
    spark.read.parquet(snap.files.map(f => s"${snap.root}/$f"): _*)

  /** Pin-and-read the current generation — the always-on reader's call. */
  def readSnapshot(spark: SparkSession, root: String): DataFrame =
    read(spark, pin(spark, root))

  /** List a generation data dir's parquet files relative to the root. */
  private def relativeFiles(f: FileSystem, root: String, dir: Path): Seq[String] = {
    val rootUri = new Path(root).toUri.getPath.stripSuffix("/")
    val it = f.listFiles(dir, true)
    val b = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath.toUri.getPath
      if (p.endsWith(".parquet")) b += p.stripPrefix(rootUri + "/")
    }
    b.result().sorted
  }

  /** Publish `files` as generation `gen`: write the manifest OUTSIDE the
    * manifest dir, then one atomic rename in — the commit point. A
    * generation number collision (concurrent writer, or a replay of an
    * already-published publish) fails the rename and throws: the
    * single-writer contract was violated or the work is already done.
    */
  private[sinks] def publishManifest(
      f: FileSystem, root: String, gen: Long, files: Seq[String]): Unit = {
    require(files.nonEmpty, "refusing to publish an empty manifest")
    val dir = manifestDir(root)
    if (!f.exists(dir)) f.mkdirs(dir)
    val stage = new Path(root + "__stage", f"m$gen%06d.txt")
    if (!f.exists(stage.getParent)) f.mkdirs(stage.getParent)
    val out = f.create(stage, true)
    try out.write((files.mkString("\n") + "\n").getBytes(UTF_8))
    finally out.close()
    val target = new Path(dir, f"m$gen%06d.txt")
    require(f.rename(stage, target),
      s"snapshot publish of generation $gen at $root failed — " +
        "already published (replay) or a concurrent writer (contract violation)")
  }

  /** Append `df` as a new generation: its rows land in a fresh immutable
    * data dir, and the new manifest is the previous generation's file
    * list PLUS the new files. Returns the published generation. Nothing
    * existing is read, moved or rewritten — O(batch), and invisible to
    * every pinned reader until (and unless) they re-pin.
    */
  def append(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val prev = currentGeneration(spark, root)
    val gen = prev.map(_ + 1L).getOrElse(0L)
    val data = dataDir(root, gen)
    val stage = new Path(root + "__stage", data.getName)
    df.write.mode("overwrite").parquet(stage.toString)
    if (!f.exists(data.getParent)) f.mkdirs(data.getParent)
    require(f.rename(stage, data), s"failed to install data dir $data")
    val newFiles = relativeFiles(f, root, data)
    val carried = prev.map(readManifest(f, root, _)).getOrElse(Seq.empty)
    publishManifest(f, root, gen, carried ++ newFiles)
    gen
  }

  /** Compact the current generation: rewrite its rows into
    * `ceil(rows/targetRecordsPerFile)` evenly-sized files in a fresh data
    * dir and publish a manifest listing ONLY those — the small-file
    * antidote with zero reader coordination: the old generation's files
    * are untouched (pinned readers keep reading them) and become
    * unreferenced-by-latest, reclaimed later by [[vacuum]] once outside
    * the retention window. Returns the published generation.
    */
  def compact(
      spark: SparkSession, root: String,
      targetRecordsPerFile: Long = 1000000L,
      sortWithin: Seq[String] = Nil): Long = {
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be positive")
    val f = fs(spark, root)
    val snap = pin(spark, root)
    val rows = read(spark, snap)
    val n = rows.count()
    require(n > 0, s"snapshot lake at $root is empty")
    val nFiles = ((n + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
    val gen = snap.generation + 1L
    val data = dataDir(root, gen)
    val stage = new Path(root + "__stage", data.getName)
    // sort-on-write => parquet row-group skipping on the sort columns
    // (RowGroupSkipSpec) — compaction rewrites anyway, ordering is free
    val shaped =
      if (sortWithin.isEmpty) rows.repartition(nFiles)
      else rows.repartition(nFiles)
        .sortWithinPartitions(sortWithin.map(org.apache.spark.sql.functions.col): _*)
    shaped.write.mode("overwrite").parquet(stage.toString)
    require(f.rename(stage, data), s"failed to install data dir $data")
    publishManifest(f, root, gen, relativeFiles(f, root, data))
    gen
  }

  /** Retire history: keep the newest `keepGenerations` manifests, delete
    * older ones, then delete every data file (and empty data dir) no
    * retained manifest references — including orphans a crashed publish
    * left behind. Pinned readers inside the retention window are
    * unaffected; pinning a retired generation afterwards fails loudly
    * (missing manifest), never silently reads partial data.
    */
  def vacuum(spark: SparkSession, root: String, keepGenerations: Int = 2): Unit = {
    require(keepGenerations >= 1, "must keep at least the current generation")
    val f = fs(spark, root)
    val gens = generations(spark, root)
    if (gens.isEmpty) return
    val keep = gens.takeRight(keepGenerations)
    val referenced = keep.flatMap(readManifest(f, root, _)).toSet
    gens.dropRight(keepGenerations).foreach { g =>
      f.delete(new Path(manifestDir(root), f"m$g%06d.txt"), false)
    }
    val dataRoot = new Path(root, "data")
    if (f.exists(dataRoot)) {
      f.listStatus(dataRoot).foreach { dirSt =>
        val rel = relativeFiles(f, root, dirSt.getPath)
        val (kept, dead) = rel.partition(referenced.contains)
        dead.foreach(d => f.delete(new Path(root, d), false))
        if (kept.isEmpty) f.delete(dirSt.getPath, true)
      }
    }
    // stage leftovers from crashed publishes are garbage by definition
    f.delete(new Path(root + "__stage"), true)
  }
}
