package graft.streaming

import java.nio.file.{FileAlreadyExistsException, Files}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, PathFilter}
import org.apache.spark.sql.graft.NioCheckpointFileManager

import graft.SparkSuite

/** The fork-free NIO checkpoint manager must reproduce the default
  * managers' commit semantics exactly — atomic rename into place,
  * FileAlreadyExists on no-overwrite collisions, cancel leaves nothing —
  * because every streaming replay's exactly-once story rides on them.
  */
class NioCheckpointFileManagerSpec extends SparkSuite {

  private def mk(): (NioCheckpointFileManager, java.nio.file.Path) = {
    val dir = Files.createTempDirectory("nio_ckpt_spec")
    (new NioCheckpointFileManager(new Path(dir.toUri), new Configuration()), dir)
  }

  test("createAtomic commits on close; content visible only after") {
    val (fm, dir) = mk()
    val target = new Path(new Path(dir.toUri), "offsets/0")
    val out = fm.createAtomic(target, overwriteIfPossible = false)
    out.write("v1\nbatch0".getBytes("UTF-8"))
    assert(!fm.exists(target), "target must not exist before close")
    out.close()
    assert(fm.exists(target))
    val in = fm.open(target)
    val buf = new Array[Byte](64)
    val n = in.read(buf)
    in.close()
    assert(new String(buf, 0, n, "UTF-8") == "v1\nbatch0")
    // no temp or checksum siblings survive the commit
    val leftovers = Files.list(dir.resolve("offsets")).iterator()
    var names = List.empty[String]
    while (leftovers.hasNext) names ::= leftovers.next().getFileName.toString
    assert(names == List("0"), s"unexpected siblings: $names")
  }

  test("createAtomic without overwrite throws FileAlreadyExists and keeps the original") {
    val (fm, dir) = mk()
    val target = new Path(new Path(dir.toUri), "commits/7")
    val first = fm.createAtomic(target, overwriteIfPossible = false)
    first.write("original".getBytes("UTF-8")); first.close()
    val second = fm.createAtomic(target, overwriteIfPossible = false)
    second.write("usurper".getBytes("UTF-8"))
    intercept[FileAlreadyExistsException](second.close())
    val in = fm.open(target)
    val buf = new Array[Byte](16); val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") == "original")
    // and with overwriteIfPossible the new content wins
    val third = fm.createAtomic(target, overwriteIfPossible = true)
    third.write("replaced".getBytes("UTF-8")); third.close()
    val in2 = fm.open(target)
    val n2 = in2.read(buf); in2.close()
    assert(new String(buf, 0, n2, "UTF-8") == "replaced")
  }

  test("cancel discards the temp file and never creates the target") {
    val (fm, dir) = mk()
    val target = new Path(new Path(dir.toUri), "state/0/1/1.delta")
    val out = fm.createAtomic(target, overwriteIfPossible = true)
    out.write(Array.fill[Byte](128)(7))
    out.cancel()
    assert(!fm.exists(target))
    assert(!Files.list(dir.resolve("state/0/1")).iterator().hasNext,
      "cancel must leave no temp debris")
  }

  test("open supports seek and positioned reads (state file replay shape)") {
    val (fm, dir) = mk()
    val target = new Path(new Path(dir.toUri), "state/0/0/1.snapshot")
    val out = fm.createAtomic(target, overwriteIfPossible = true)
    out.write((0 until 256).map(_.toByte).toArray); out.close()
    val in = fm.open(target)
    in.seek(100)
    assert(in.getPos == 100 && in.read() == 100)
    val buf = new Array[Byte](4)
    in.readFully(200L, buf)
    assert(buf.toSeq == Seq(200, 201, 202, 203).map(_.toByte))
    assert(in.getPos == 101, "positioned read must not move the cursor")
    in.close()
  }

  test("list applies the filter and reports sizes; delete is recursive") {
    val (fm, dir) = mk()
    fm.mkdirs(new Path(new Path(dir.toUri), "state/0/0"))
    for (n <- Seq("1.delta", "2.delta", "x.tmp")) {
      val o = fm.createAtomic(new Path(new Path(dir.toUri), s"state/0/0/$n"), true)
      o.write(Array.fill[Byte](10)(1)); o.close()
    }
    val deltas = fm.list(new Path(new Path(dir.toUri), "state/0/0"),
      new PathFilter { def accept(p: Path) = p.getName.endsWith(".delta") })
    assert(deltas.map(_.getPath.getName).sorted.toSeq == Seq("1.delta", "2.delta"))
    assert(deltas.forall(_.getLen == 10))
    fm.delete(new Path(new Path(dir.toUri), "state"))
    assert(!fm.exists(new Path(new Path(dir.toUri), "state")))
  }

  test("refuses non-file schemes loudly") {
    val (fm, _) = mk()
    intercept[IllegalArgumentException](
      fm.exists(new Path("hdfs://nn/ckpt/offsets/0")))
  }

  test("a streaming query checkpointed through the manager replays exactly-once") {
    import spark.implicits._
    val root = Files.createTempDirectory("nio_ckpt_stream")
    val src = root.resolve("src"); val out = root.resolve("out"); val ckpt = root.resolve("ckpt")
    Seq(1L, 2L, 3L).toDF("v").coalesce(1).write.parquet(src.toString)
    Seq(4L, 5L).toDF("v").coalesce(1).write.mode("append").parquet(src.toString)
    val prev = spark.conf.getOption(NioCheckpointFileManager.ConfKey)
    spark.conf.set(NioCheckpointFileManager.ConfKey, NioCheckpointFileManager.ClassName)
    try {
      val q = spark.readStream.schema("v LONG").option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .writeStream.format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      assert(spark.read.parquet(out.toString).as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L))
      // restart with no new data: exactly-once means nothing re-emits
      val q2 = spark.readStream.schema("v LONG").option("maxFilesPerTrigger", 1)
        .parquet(src.toString)
        .writeStream.format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q2.awaitTermination()
      assert(spark.read.parquet(out.toString).as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L))
      // and the checkpoint carries no Hadoop .crc siblings
      import scala.jdk.CollectionConverters._
      val crcs = Files.walk(ckpt).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".crc")).toSeq
      assert(crcs.isEmpty, s"checksum siblings leaked: $crcs")
    } finally prev match {
      case Some(v) => spark.conf.set(NioCheckpointFileManager.ConfKey, v)
      case None    => spark.conf.unset(NioCheckpointFileManager.ConfKey)
    }
  }
}
