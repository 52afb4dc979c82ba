package graft

/** Dev utility: measured scaling of the streaming `.warc.gz` record
  * reader (the source of BASELINE.md's ".warc.gz ingest scale
  * behavior" table).
  *
  * Builds on-disk archives of increasing size — one gzip member per
  * WARC record (the CommonCrawl layout), record payloads of mixed
  * compressibility — then times [[graft.sources.Warc.readWarcGz]]
  * over each. The claims under test:
  *   - records/s is FLAT in archive size (streaming walk, no
  *     whole-archive materialization);
  *   - an archive whose DECOMPRESSED size exceeds the ~2 GiB JVM
  *     array cap ingests fine (the batch gunzip-whole plan throws
  *     before its first record).
  *
  * A `single:<MiB>` argument probes the OTHER layout: one gzip
  * member holding the whole archive (plain `gzip` of a `.warc`),
  * 64 KiB records — thousands of records per member. The claim under
  * test there: the record walk's byte-shifting is linear in member
  * size (head-offset buffer with amortized compaction), not
  * O(records × member) — pre-fix, a 256 MiB single member with 4k
  * records cost ~0.5 TB of memmove; post-fix it is < 2× the member.
  * Memory in this layout is the whole decompressed member (inherent:
  * CRC verification precedes the walk), so it stays under the JVM
  * array cap by definition of the input.
  *
  * Usage: runMain graft.WarcScaleProbe [decompressedMiB|single:MiB...]
  * (default 64 256 1024; pass 2600 to cross the array cap —
  * ~3 min of fixture writing)
  */
object WarcScaleProbe {
  def main(args: Array[String]): Unit = {
    val specs = if (args.nonEmpty) args.toSeq else Seq("64", "256", "1024")
    val spark = LocalSession()

    // ~1 MiB per record: a 64 KiB pseudo-random head (incompressible,
    // keeps deflate honest) + a repetitive tail (compressible, keeps
    // fixture write time sane) — overall ~10:1 like crawled HTML+gzip
    val headLen = 64 * 1024
    val recPayload = 1024 * 1024
    val tail = ("the quick brown fox jumps over the lazy dog " * 64)
      .getBytes("US-ASCII")

    def writeArchive(path: java.io.File, nRecs: Int): Unit = {
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(path), 1 << 20)
      val rnd = new java.util.Random(42)
      val head = new Array[Byte](headLen)
      var i = 0
      while (i < nRecs) {
        rnd.nextBytes(head)
        val body = new java.io.ByteArrayOutputStream(recPayload + 64)
        body.write(head)
        while (body.size() < recPayload) {
          body.write(tail, 0, math.min(tail.length,
            recPayload - body.size()))
        }
        val payload = body.toByteArray
        val rec = (s"WARC/1.0\r\nWARC-Type: resource\r\n" +
          s"WARC-Target-URI: https://x.example.com/$i\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n")
          .getBytes("US-ASCII") ++ payload
        out.write(org.apache.spark.sql.graftext.GzipBytes.compute(rec))
        i += 1
      }
      out.close()
    }

    // single-member layout: ONE GZIPOutputStream over all records,
    // \r\n\r\n-separated (a .warc file gzipped whole), 64 KiB records
    def writeSingleMember(path: java.io.File, nRecs: Int): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(path), 1 << 20), 1 << 16)
      val rnd = new java.util.Random(42)
      val head = new Array[Byte](16 * 1024)
      val recPayload64 = 64 * 1024
      var i = 0
      while (i < nRecs) {
        if (i > 0) out.write("\r\n\r\n".getBytes("US-ASCII"))
        rnd.nextBytes(head)
        val body = new java.io.ByteArrayOutputStream(recPayload64 + 64)
        body.write(head)
        while (body.size() < recPayload64) {
          body.write(tail, 0, math.min(tail.length,
            recPayload64 - body.size()))
        }
        val payload = body.toByteArray
        out.write((s"WARC/1.0\r\nWARC-Type: resource\r\n" +
          s"WARC-Target-URI: https://x.example.com/$i\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n")
          .getBytes("US-ASCII"))
        out.write(payload)
        i += 1
      }
      out.close()
    }

    val dir = java.nio.file.Files
      .createTempDirectory("graft-warc-probe").toFile
    println("layout\tdecompressed_MiB\tcompressed_MiB\trecords\twall_s\trecords_per_s\tMiB_per_s")
    specs.foreach { spec =>
      val single = spec.startsWith("single:")
      val mib = (if (single) spec.stripPrefix("single:") else spec).toInt
      val f = new java.io.File(dir, s"probe_$mib.warc.gz")
      val nRecs = if (single) mib * 16 else mib // 64 KiB vs 1 MiB recs
      if (single) writeSingleMember(f, nRecs) else writeArchive(f, nRecs)
      val t0 = System.nanoTime()
      val n = graft.sources.Warc.readWarcGz(spark,
          Seq(f.getAbsolutePath))
        .selectExpr("count(*) AS n", "sum(content_length) AS bytes")
        .head
      val wall = (System.nanoTime() - t0) / 1e9
      require(n.getLong(0) == nRecs,
        s"expected $nRecs records, got ${n.getLong(0)}")
      val layout = if (single) "single-member" else "member-per-rec"
      println(f"$layout\t$mib%d\t${f.length() / (1024.0 * 1024)}%.1f\t" +
        f"${n.getLong(0)}%d\t$wall%.2f\t${nRecs / wall}%.1f\t" +
        f"$mib%d/${wall}%.2f = ${mib / wall}%.1f")
      f.delete()
    }
    spark.stop()
  }
}
