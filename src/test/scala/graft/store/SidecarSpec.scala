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
    WriterLease.release(spark, b)
  }
}
