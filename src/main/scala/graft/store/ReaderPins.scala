package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Reader-side version pins for the versioned stores ([[VersionedTable]],
  * [[MultiTablePublish]]) — the upgrade of the round-10 `minAgeMs` vacuum
  * heuristic into an explicit registry (round-10 verdict item 6). A
  * min-age guard protects readers only as long as an operator guesses
  * their maximum runtime correctly; a PIN is the reader saying so itself.
  *
  * Mechanics reuse the [[WriterLease]] file shape: a pin is a one-off
  * file `<root>__pins/v=<version>.<nonce>` whose CONTENT is the pin's
  * ttl (ms) and whose MTIME is its liveness heartbeat — a reader that
  * outlives its declared ttl keeps the pin alive by re-touching it
  * ([[heartbeat]], or [[withPin]]'s automatic beat every ttl/3). Vacuum
  * asks [[livePinned]] and skips any version with at least one live pin
  * REGARDLESS of age/retention; a pin whose mtime lapses past its ttl is
  * dead (its reader crashed or finished without releasing) and is
  * garbage-collected by the next vacuum, so an abandoned pin delays
  * reclamation by one ttl, never forever.
  *
  * Pins are advisory between READERS and VACUUM only — they do not gate
  * writers (a publish always proceeds; it only ADDS versions) and they
  * are create-only/immutable, so no create-exclusive race arbitration is
  * needed: N readers pinning one version just make N pin files.
  */
object ReaderPins {

  final case class Pin(root: String, version: Int, path: Path, ttlMs: Long)

  private def pinsDir(root: String) = new Path(root + "__pins")

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Unparseable pin content (torn write): the reader's ttl is unknown,
    * and failing OPEN would delete files under a live reader — assume
    * this conservative ttl instead, so the torn pin still ages out.
    */
  val TornPinTtlMs: Long = 3600000L

  /** Register a live pin on `version`. The pin file name carries a random
    * nonce, so concurrent readers (or one reader pinning twice) never
    * collide.
    */
  def pin(spark: SparkSession, root: String, version: Int,
          ttlMs: Long): Pin = {
    val f = fs(spark, pinsDir(root))
    f.mkdirs(pinsDir(root))
    val p = new Path(pinsDir(root),
      s"v=$version.${java.util.UUID.randomUUID().toString.take(12)}")
    val out = f.create(p, false)
    try out.write(s"$ttlMs\n".getBytes("UTF-8")) finally out.close()
    Pin(root, version, p, ttlMs)
  }

  /** Refresh the pin's liveness clock (a reader outliving its ttl). */
  def heartbeat(spark: SparkSession, pin: Pin): Unit =
    fs(spark, pin.path).setTimes(pin.path, System.currentTimeMillis(), -1)

  /** Drop the pin; the version becomes vacuumable again (subject to
    * retention). Missing file (already GC'd after a lapse) is a no-op.
    */
  def release(spark: SparkSession, pin: Pin): Unit = {
    val f = fs(spark, pin.path)
    try f.delete(pin.path, false) catch { case _: java.io.IOException => () }
  }

  /** Versions with at least one LIVE pin (mtime younger than the pin's
    * declared ttl). As a side effect, lapsed pin files are deleted —
    * vacuum calls this, so pin GC rides the pass that needs the answer.
    */
  def livePinned(spark: SparkSession, root: String): Set[Int] = {
    val d = pinsDir(root)
    val f = fs(spark, d)
    if (!f.exists(d)) return Set.empty
    val now = System.currentTimeMillis()
    f.listStatus(d).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (!name.startsWith("v=")) None
      else {
        val version = name.stripPrefix("v=").takeWhile(_.isDigit)
        if (version.isEmpty) None
        else {
          val ttl =
            try {
              val in = f.open(st.getPath)
              val s = try new String(
                org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
              finally in.close()
              if (s.nonEmpty && s.forall(_.isDigit)) s.toLong else TornPinTtlMs
            } catch { case _: java.io.IOException => TornPinTtlMs }
          if (now - st.getModificationTime <= ttl) Some(version.toInt)
          else { f.delete(st.getPath, false); None } // lapsed: GC the pin
        }
      }
    }.toSet
  }

  /** Scoped pin with an automatic heartbeat every ttl/3 (same rationale
    * as [[WriterLease.withHeartbeat]]: a reader genuinely running longer
    * than its ttl must not lose its files to a vacuum mid-query).
    */
  def withPin[T](spark: SparkSession, root: String, version: Int,
                 ttlMs: Long = 60000L)(body: => T): T = {
    val p = pin(spark, root, version, ttlMs)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat = new Thread(() => {
      val interval = math.max(ttlMs / 3, 100L)
      while (!stop.get()) {
        try heartbeat(spark, p) catch { case _: Throwable => () }
        var waited = 0L
        while (!stop.get() && waited < interval) { Thread.sleep(50); waited += 50 }
      }
    }, s"reader-pin-heartbeat-v${version}")
    beat.setDaemon(true)
    beat.start()
    try body
    finally {
      stop.set(true); beat.join(2000)
      release(spark, p)
    }
  }
}
