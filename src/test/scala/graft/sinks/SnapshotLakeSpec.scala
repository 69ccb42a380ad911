package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotLakeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Range) =
    ids.map(i => (i.toLong, s"text $i")).toDF("id", "t")

  test("append publishes generations; a pinned reader never sees later appends") {
    val root = Files.createTempDirectory("snap").toString + "/tbl"
    assert(SnapshotLake.currentGeneration(spark, root).isEmpty)
    val g0 = SnapshotLake.append(docs(0 until 10), root)
    assert(g0 == 0L)
    val pinned = SnapshotLake.pin(spark, root)
    val g1 = SnapshotLake.append(docs(10 until 25), root)
    assert(g1 == 1L)
    // latest sees both, the pin still sees exactly generation 0
    assert(SnapshotLake.readSnapshot(spark, root).count() == 25L)
    assert(SnapshotLake.read(spark, pinned).count() == 10L)
    assert(SnapshotLake.read(spark, pinned).select("id").as[Long].collect().sorted.toSeq
      == (0L until 10L))
  }

  test("compaction rewrites files but never content, and never disturbs a pinned reader") {
    val root = Files.createTempDirectory("snap_c").toString + "/tbl"
    SnapshotLake.append(docs(0 until 50), root)
    SnapshotLake.append(docs(50 until 80), root)
    val pinned = SnapshotLake.pin(spark, root) // generation 1: two data dirs
    assert(pinned.files.size >= 2)
    val before = SnapshotLake.read(spark, pinned)
      .agg(count(lit(1)), bit_xor(xxhash64(col("id"), col("t")))).head()
    val g = SnapshotLake.compact(spark, root, targetRecordsPerFile = 1000L)
    assert(g == 2L)
    val latest = SnapshotLake.pin(spark, root)
    assert(latest.files.size == 1, latest.files.toString) // 80 rows, one file
    assert(latest.files.toSet.intersect(pinned.files.toSet).isEmpty,
      "compaction must write fresh files, not touch pinned ones")
    // identical content through both manifests
    val after = SnapshotLake.read(spark, latest)
      .agg(count(lit(1)), bit_xor(xxhash64(col("id"), col("t")))).head()
    val pinnedAfter = SnapshotLake.read(spark, pinned)
      .agg(count(lit(1)), bit_xor(xxhash64(col("id"), col("t")))).head()
    assert(after == before && pinnedAfter == before)
  }

  test("compact(sortWithin) imposes file-internal order: the row-group-skipping layout") {
    val root = Files.createTempDirectory("snap_s").toString + "/tbl"
    // write deliberately unsorted in id
    SnapshotLake.append(
      docs(0 until 500).orderBy(expr("t")).coalesce(1), root)
    SnapshotLake.compact(spark, root, 1000L, sortWithin = Seq("id"))
    val latest = SnapshotLake.pin(spark, root)
    assert(latest.files.size == 1)
    // physical order inside the compacted file is the sort order
    val physical = spark.read.parquet(s"$root/${latest.files.head}")
      .select("id").as[Long].collect().toSeq
    assert(physical == physical.sorted, "file-internal order must follow sortWithin")
    assert(physical.size == 500)
  }

  test("vacuum retires history outside the retention window, keeps everything inside it") {
    val root = Files.createTempDirectory("snap_v").toString + "/tbl"
    SnapshotLake.append(docs(0 until 10), root) // g0
    SnapshotLake.append(docs(10 until 20), root) // g1
    SnapshotLake.compact(spark, root, 1000L) // g2 (fresh files)
    SnapshotLake.append(docs(20 until 30), root) // g3
    SnapshotLake.vacuum(spark, root, keepGenerations = 2) // keep g2, g3
    assert(SnapshotLake.generations(spark, root) == Seq(2L, 3L))
    // retained pins read fully (g2's files carried into g3's manifest)
    assert(SnapshotLake.read(spark, SnapshotLake.pin(spark, root, 2L)).count() == 20L)
    assert(SnapshotLake.readSnapshot(spark, root).count() == 30L)
    // g0/g1's pre-compaction data files are gone (unreferenced)
    intercept[Exception](SnapshotLake.pin(spark, root, 0L))
    // and vacuum after compaction actually reclaimed the old dirs
    val dataDirs = new java.io.File(s"$root/data").listFiles().map(_.getName).sorted
    assert(dataDirs.toSeq == Seq("g000002", "g000003"), dataDirs.mkString(","))
  }

  test("a crashed publish (orphan data dir, no manifest) is invisible and vacuumed") {
    val root = Files.createTempDirectory("snap_o").toString + "/tbl"
    SnapshotLake.append(docs(0 until 10), root)
    // simulate the crash window: a data dir written but never published
    docs(900 until 950).write.parquet(s"$root/data/g000099")
    assert(SnapshotLake.readSnapshot(spark, root).count() == 10L,
      "unpublished data must be invisible")
    SnapshotLake.vacuum(spark, root, keepGenerations = 1)
    assert(!new java.io.File(s"$root/data/g000099").exists(),
      "vacuum must reclaim orphan dirs")
    assert(SnapshotLake.readSnapshot(spark, root).count() == 10L)
  }

  test("CONCURRENT reader vs maintenance: every read is a complete generation, no errors") {
    val root = Files.createTempDirectory("snap_r").toString + "/tbl"
    SnapshotLake.append(docs(0 until 40), root)
    // legal row counts: 40, then +20 per append (maintenance below does
    // append(20) -> compact -> vacuum, five rounds)
    val legal = (0 to 5).map(i => 40L + 20L * i).toSet
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try counts.add(SnapshotLake.readSnapshot(spark, root).count())
        catch { case t: Throwable => errors.add(t) }
      }
    })
    reader.start()
    try {
      (1 to 5).foreach { i =>
        SnapshotLake.append(docs(40 + 20 * (i - 1) until 40 + 20 * i), root)
        SnapshotLake.compact(spark, root, 1000L)
        SnapshotLake.vacuum(spark, root, keepGenerations = 2)
      }
    } finally {
      stop.set(true)
      reader.join(60000)
    }
    assert(errors.isEmpty, s"reader saw errors: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    val seen = counts.asScala.toSet
    assert(seen.nonEmpty && seen.subsetOf(legal),
      s"reader observed illegal counts: ${seen.diff(legal)} (legal: $legal)")
    assert(SnapshotLake.readSnapshot(spark, root).count() == 140L)
  }

  test("a generation-number collision (concurrent writer / replay) fails the publish loudly") {
    val root = Files.createTempDirectory("snap_w").toString + "/tbl"
    SnapshotLake.append(docs(0 until 5), root) // g0 published
    // a concurrent writer (or a replayed publish) that lost the race to
    // generation 0's name must fail at the manifest rename — the commit
    // point — rather than silently clobber or coexist
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val e = intercept[IllegalArgumentException] {
      SnapshotLake.publishManifest(fs, root, 0L, Seq("data/g000000/x.parquet"))
    }
    assert(e.getMessage.contains("generation 0"), e.getMessage)
    // the loser's staged manifest must not have corrupted the winner
    assert(SnapshotLake.readSnapshot(spark, root).count() == 5L)
  }
}
