package graft.sources

/** Deterministic single-JVM micro-benchmark of [[Warc.RecordStream]]
  * parse throughput — no Spark, no disk, no scheduler: build one
  * in-memory container and time repeated full parses. Used to adjudicate
  * the round-14 q113 constant-factor fix (head-offset window vs
  * per-record full-window arraycopy) without bench-box noise.
  *
  * Run: `sbt "Test/runMain graft.sources.WarcParseBench [records] [bodyBytes]"`.
  */
object WarcParseBench {
  def main(args: Array[String]): Unit = {
    val nRecords = args.headOption.map(_.toInt).getOrElse(20000)
    val bodyBytes = args.lift(1).map(_.toInt).getOrElse(2048)
    val body = ("x" * bodyBytes).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bos = new java.io.ByteArrayOutputStream(nRecords * (bodyBytes + 200))
    (0 until nRecords).foreach { i =>
      bos.write(Warc.recordBytes(
        s"urn:graft:$i", s"https://example.com/p/$i", "text/html", body))
    }
    val container = bos.toByteArray
    println(s"container: $nRecords records x $bodyBytes B = ${container.length} bytes")
    def once(): (Long, Double) = {
      val t0 = System.nanoTime()
      var n = 0L
      val it = new Warc.RecordStream("bench.warc",
        new java.io.ByteArrayInputStream(container), quarantineStreamErrors = false)
      while (it.hasNext) { val r = it.next(); if (r.error == null) n += 1 }
      (n, (System.nanoTime() - t0) / 1e9)
    }
    (1 to 7).foreach { i =>
      val (n, sec) = once()
      println(f"pass $i: $n records in $sec%.3f s (${n / sec / 1000}%.0f krec/s)")
    }
  }
}
