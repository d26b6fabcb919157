package graft.store

import graft.SparkSuite

class SidecarSpec extends SparkSuite {

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_sidecar_spec")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Throwable => () })
    }))
    p
  }

  test("swap + read roundtrips; absent reads are None/typed") {
    val t = root.resolve("t1").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t))
    assert(Sidecar.read(spark, t, "_m/x.tsv").isEmpty)
    intercept[java.io.FileNotFoundException](Sidecar.readRequired(spark, t, "_m/x.tsv"))
    Sidecar.swap(spark, t, "_m/x.tsv", "a\t1\nb\t2\n")
    assert(Sidecar.readRequired(spark, t, "_m/x.tsv") == "a\t1\nb\t2\n")
    Sidecar.swap(spark, t, "_m/x.tsv", "c\t3\n") // overwrite swaps atomically
    assert(Sidecar.readRequired(spark, t, "_m/x.tsv") == "c\t3\n")
  }

  test("a fenced-out writer's sidecar swap dies without changing the file") {
    val t = root.resolve("t2").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t))
    Sidecar.swap(spark, t, "_m/x.tsv", "original\n")
    val a = WriterLease.acquire(spark, t, "writerA", ttlMs = 60000)
    val leaseFile = new org.apache.hadoop.fs.Path(t + "__lease", "LEASE")
    leaseFile.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .setTimes(leaseFile, System.currentTimeMillis() - 120000, -1)
    val b = WriterLease.acquire(spark, t, "writerB", ttlMs = 60000)
    WriterLease.adopt(a)
    intercept[WriterLease.FencedException](
      Sidecar.swap(spark, t, "_m/x.tsv", "loser\n"))
    WriterLease.adopt(b)
    assert(Sidecar.readRequired(spark, t, "_m/x.tsv") == "original\n")
    // the refused swap left no staging file behind — only a process CRASH
    // may leave __tmp, which read() diagnoses (next test)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, "_m/x.tsv__tmp")))
    WriterLease.release(spark, b)
  }

  test("missing sidecar with STALE staging is typed corruption; FRESH staging reads as absent") {
    val t = root.resolve("t3").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t, "_m"))
    val tmp = java.nio.file.Paths.get(t, "_m/x.tsv__tmp")
    java.nio.file.Files.writeString(tmp, "half-written\n")
    // fresh staging = a live writer's FIRST swap in flight: a concurrent
    // reader must see the pre-swap state (no sidecar), not corruption
    assert(Sidecar.read(spark, t, "_m/x.tsv").isEmpty)
    // stale staging = the writer died mid-first-swap: diagnose loudly
    java.nio.file.Files.setLastModifiedTime(tmp,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - Sidecar.StagingGraceMs - 5000))
    val e = intercept[Sidecar.SidecarCorruptionError](Sidecar.read(spark, t, "_m/x.tsv"))
    assert(e.getMessage.contains("crashed"))
    assert(e.sidecarPath.endsWith("_m/x.tsv"))
  }

  test("truncated files fail the integrity header, torn lines fail the field parse") {
    val t = root.resolve("t4").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t))
    Sidecar.swap(spark, t, "_m/x.tsv", "a\t1\nb\t2\nc\t3\n")
    val p = java.nio.file.Paths.get(t, "_m/x.tsv")
    val full = java.nio.file.Files.readString(p)
    // external tamper below bypasses Hadoop's checksum sidecar — drop it so
    // the test exercises OUR integrity layer, not the crc's
    def dropCrc(): Unit =
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(t, "_m/.x.tsv.crc"))
    // truncate at a line boundary: the line-count header catches it
    java.nio.file.Files.writeString(p, full.substring(0, full.lastIndexOf("c\t3\n")))
    dropCrc()
    val e1 = intercept[Sidecar.SidecarCorruptionError](Sidecar.read(spark, t, "_m/x.tsv"))
    assert(e1.getMessage.contains("declares 3 lines"))
    // truncate mid-line: the trailing-newline check catches it
    java.nio.file.Files.writeString(p, full.substring(0, full.length - 2))
    dropCrc()
    val e2 = intercept[Sidecar.SidecarCorruptionError](Sidecar.read(spark, t, "_m/x.tsv"))
    assert(e2.getMessage.contains("mid-line"))
    // a malformed line inside an intact file: fields() raises typed, not MatchError
    val e3 = intercept[Sidecar.SidecarCorruptionError](
      Sidecar.fields(t, "_m/x.tsv", "only-one-field", 2))
    assert(e3.getMessage.contains("expected 2 tab-separated fields"))
    // headerless external fixtures still read verbatim
    java.nio.file.Files.writeString(p, "x\t9\n")
    dropCrc()
    assert(Sidecar.readRequired(spark, t, "_m/x.tsv") == "x\t9\n")
  }

  test("truncation INSIDE the integrity header is corruption, not a fixture") {
    val t = root.resolve("t5").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(t))
    Sidecar.swap(spark, t, "_m/y.tsv", "a\t1\n")
    val p = java.nio.file.Paths.get(t, "_m/y.tsv")
    def dropCrc(): Unit =
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(t, "_m/.y.tsv.crc"))
    // torn write cut inside the first ~20 bytes: a strict PREFIX of the
    // header tag used to read as a 'headerless external fixture'
    java.nio.file.Files.writeString(p, "#graft-sid")
    dropCrc()
    val e1 = intercept[Sidecar.SidecarCorruptionError](Sidecar.read(spark, t, "_m/y.tsv"))
    assert(e1.getMessage.contains("integrity header"))
    // '#'-leading content that is not the full header: garbled, not a fixture
    java.nio.file.Files.writeString(p, "#graft-sidecar junk\nx\t9\n")
    dropCrc()
    val e2 = intercept[Sidecar.SidecarCorruptionError](Sidecar.read(spark, t, "_m/y.tsv"))
    assert(e2.getMessage.contains("malformed integrity header"))
    java.nio.file.Files.writeString(p, "# hand comment\nx\t9\n")
    dropCrc()
    intercept[Sidecar.SidecarCorruptionError](Sidecar.read(spark, t, "_m/y.tsv"))
  }
}
