package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArchiveFs, SerializableHadoopConf}

/** The Hadoop-FileSystem byte seam under every archive source/sink
  * (r11 verdict ask #1): behavior of the primitives, and a source-tree
  * pin that nothing in sources/ regresses to direct local-FS IO.
  */
class ArchiveFsSpec extends AnyFunSuite {

  private def tmpDir(): String = {
    val d = s"/tmp/graft-afs-${java.util.UUID.randomUUID.toString.take(8)}"
    ArchiveFs.mkdirs(d)
    d
  }

  test("sources/ holds no direct local-filesystem IO (the ArchiveFs seam pin)") {
    val dir = new java.io.File("src/main/scala/graft/sources")
    assert(dir.isDirectory, s"expected source tree at ${dir.getAbsolutePath}")
    val banned = Seq(
      "java.io.File(", "java.io.FileInputStream", "java.io.FileOutputStream",
      "FileInputStream(", "FileOutputStream(", "java.nio.file.",
      "FileChannel", "scala.io.Source", "new java.io.File")
    val offenders = dir.listFiles().filter(_.getName.endsWith(".scala")).flatMap { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      banned.filter(txt.contains).map(b => s"${f.getName}: $b")
    }
    assert(offenders.isEmpty,
      s"direct local-FS IO in sources/ (route through ArchiveFs): " +
        offenders.mkString(", "))
  }

  test("byte round-trip, length, list, exists through the Hadoop FS API") {
    val d = tmpDir()
    val f = ArchiveFs.child(d, "a.bin")
    val payload = Array.tabulate[Byte](70000)(i => (i * 31).toByte)
    ArchiveFs.writeBytes(f, payload)
    assert(ArchiveFs.exists(f))
    assert(ArchiveFs.length(f) === 70000L)
    assert(java.util.Arrays.equals(ArchiveFs.readBytes(f), payload))
    assert(ArchiveFs.list(d).map(ArchiveFs.name) === Seq("a.bin"))
    assert(ArchiveFs.isDirectory(d))
    assert(!ArchiveFs.isDirectory(f))
    ArchiveFs.delete(d, recursive = true)
  }

  test("open(offset) positions the read exactly (the CDX-cut seek path)") {
    val d = tmpDir()
    val f = ArchiveFs.child(d, "seek.bin")
    ArchiveFs.writeBytes(f, (0 until 256).map(_.toByte).toArray)
    val in = ArchiveFs.open(f, 200L)
    try {
      assert(in.read() === 200)
      assert(in.read() === 201)
    } finally in.close()
    ArchiveFs.delete(d, recursive = true)
  }

  test("create(overwrite=false) is exclusive; renameOverwrite replaces atomically") {
    val d = tmpDir()
    val f = ArchiveFs.child(d, "x.txt")
    ArchiveFs.writeBytes(f, "one".getBytes("UTF-8"))
    assert(!ArchiveFs.createExclusive(f), "exclusive create must fail on existing")
    val t = ArchiveFs.child(d, "x.tmp")
    ArchiveFs.writeBytes(t, "two".getBytes("UTF-8"))
    ArchiveFs.renameOverwrite(t, f)
    assert(ArchiveFs.readString(f) === "two")
    assert(!ArchiveFs.exists(t))
    ArchiveFs.delete(d, recursive = true)
  }

  test("withLock serializes concurrent read-modify-writes (the manifest guard)") {
    val d = tmpDir()
    val counter = ArchiveFs.child(d, "counter.txt")
    val lock = ArchiveFs.child(d, "counter.lock")
    ArchiveFs.writeBytes(counter, "0".getBytes("UTF-8"))
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        (1 to 10).foreach { _ =>
          ArchiveFs.withLock(lock) {
            val v = ArchiveFs.readString(counter).trim.toInt
            val t = ArchiveFs.child(d, s"c-${java.util.UUID.randomUUID}.tmp")
            ArchiveFs.writeBytes(t, (v + 1).toString.getBytes("UTF-8"))
            ArchiveFs.renameOverwrite(t, counter)
          }
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(ArchiveFs.readString(counter).trim.toInt === 40,
      "lost updates — the lock did not serialize the RMW")
    assert(!ArchiveFs.exists(lock), "lock file must be released")
    ArchiveFs.delete(d, recursive = true)
  }

  test("withLock breaks a stale lock instead of deadlocking") {
    val d = tmpDir()
    val lock = ArchiveFs.child(d, "stale.lock")
    ArchiveFs.writeBytes(lock, Array.emptyByteArray) // a dead holder's leftover
    val got = ArchiveFs.withLock(lock, staleMs = 300L) { 42 }
    assert(got === 42)
    ArchiveFs.delete(d, recursive = true)
  }

  test("release is token-checked: a broken-and-replaced lock is not deleted") {
    val d = tmpDir()
    val lock = ArchiveFs.child(d, "steal.lock")
    ArchiveFs.withLock(lock, staleMs = 60000L) {
      // simulate a breaker replacing our lock mid-body (wrongly tuned
      // stale window on another driver): release must NOT delete the
      // new holder's file
      ArchiveFs.delete(lock)
      ArchiveFs.writeBytes(lock, "someone-else".getBytes("UTF-8"))
    }
    assert(ArchiveFs.exists(lock), "release deleted a foreign lock")
    assert(ArchiveFs.readString(lock) === "someone-else")
    ArchiveFs.delete(d, recursive = true)
  }

  test("stale break leaves no .stale debris and the RMW stays serialized") {
    val d = tmpDir()
    val lock = ArchiveFs.child(d, "brk.lock")
    ArchiveFs.writeBytes(lock, "dead-holder-token".getBytes("UTF-8"))
    // age it so it reads as stale immediately
    val counter = ArchiveFs.child(d, "n.txt")
    ArchiveFs.writeBytes(counter, "0".getBytes("UTF-8"))
    Thread.sleep(350)
    val threads = (1 to 3).map { _ =>
      new Thread(() => {
        ArchiveFs.withLock(lock, staleMs = 300L) {
          val v = ArchiveFs.readString(counter).trim.toInt
          Thread.sleep(30)
          val t = ArchiveFs.child(d, s"t-${java.util.UUID.randomUUID}.tmp")
          ArchiveFs.writeBytes(t, (v + 1).toString.getBytes("UTF-8"))
          ArchiveFs.renameOverwrite(t, counter)
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(ArchiveFs.readString(counter).trim.toInt === 3)
    assert(!ArchiveFs.list(d).exists(f => ArchiveFs.name(f).contains(".stale.")),
      "break left a .stale tombstone behind")
    ArchiveFs.delete(d, recursive = true)
  }

  test("acquisition defers while a lock break is in flight") {
    // the r13 advice window: a breaker renames a live racer's fresh
    // lock aside and is about to rename it BACK; an acquirer that
    // slipped into the no-lock window must back out (or the restored
    // holder and the new acquirer would both run the manifest RMW).
    // The in-flight marker is a FRESH .stale.* aside next to the lock.
    val d = tmpDir()
    val lock = ArchiveFs.child(d, "defer.lock")
    ArchiveFs.writeBytes(lock + ".stale.deadbeef",
      "displaced-live-token".getBytes("UTF-8"))
    val done = new java.util.concurrent.atomic.AtomicLong(-1L)
    val t0 = System.nanoTime()
    val t = new Thread(() => {
      ArchiveFs.withLock(lock, staleMs = 60000L) {
        done.set(System.nanoTime() - t0)
      }
    })
    t.start()
    Thread.sleep(250)
    assert(done.get() === -1L,
      "acquired while a fresh break-aside existed — two-holder window")
    // the breaker finishes (here: the aside resolves); acquisition lands
    ArchiveFs.delete(lock + ".stale.deadbeef")
    t.join(30000)
    assert(done.get() > 0L, "acquisition never completed after the break")
    assert(!ArchiveFs.exists(lock), "lock file must be released")
    ArchiveFs.delete(d, recursive = true)
  }

  test("an AGED aside does not wedge acquisition (crashed breaker)") {
    val d = tmpDir()
    val lock = ArchiveFs.child(d, "aged.lock")
    ArchiveFs.writeBytes(lock + ".stale.cafe0000", "orphan".getBytes("UTF-8"))
    Thread.sleep(350) // older than staleMs: ignored, not a live break
    val got = ArchiveFs.withLock(lock, staleMs = 300L) { 7 }
    assert(got === 7)
    ArchiveFs.delete(d, recursive = true)
  }

  test("conf fingerprint is content-canonical") {
    import org.apache.hadoop.conf.Configuration
    val a = new Configuration(false)
    a.set("fs.s3a.access.key", "k1"); a.set("x.y", "z")
    val b = new Configuration(false)
    b.set("x.y", "z"); b.set("fs.s3a.access.key", "k1") // other order
    val c = new Configuration(false)
    c.set("fs.s3a.access.key", "OTHER"); c.set("x.y", "z")
    assert(SerializableHadoopConf.fingerprint(a) ===
      SerializableHadoopConf.fingerprint(b),
      "equal content must fingerprint equal regardless of build order")
    assert(SerializableHadoopConf.fingerprint(a) !==
      SerializableHadoopConf.fingerprint(c),
      "changed settings must change the fingerprint")
    // round-trip through task serialization preserves content (and so
    // the executor-side install's fingerprint); installing a BARE test
    // conf here would hijack the shared test JVM's effective conf, so
    // install() itself is exercised by every sink/source suite
    val ser = new SerializableHadoopConf(a)
    val bytes = {
      val bo = new java.io.ByteArrayOutputStream()
      val oo = new java.io.ObjectOutputStream(bo)
      oo.writeObject(ser); oo.close(); bo.toByteArray
    }
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes)).readObject()
      .asInstanceOf[SerializableHadoopConf]
    assert(back.value.get("fs.s3a.access.key") === "k1")
  }

  test("manifest protocol: numbered generations, newest wins, legacy fallback") {
    val d = tmpDir()
    assert(ArchiveFs.readManifest(d).isEmpty && !ArchiveFs.hasManifest(d))
    // legacy-only directory (pre-protocol) still reads
    ArchiveFs.writeBytes(ArchiveFs.child(d, "_MANIFEST.json"),
      """["legacy"]""".getBytes("UTF-8"))
    assert(ArchiveFs.readManifest(d) === Some("""["legacy"]"""))
    // publishes create numbered generations; newest wins
    ArchiveFs.publishManifest(d, """["g1"]""")
    ArchiveFs.publishManifest(d, """["g1","g2"]""")
    assert(ArchiveFs.readManifest(d) === Some("""["g1","g2"]"""))
    // the legacy mirror tracks the newest too
    assert(ArchiveFs.readString(ArchiveFs.child(d, "_MANIFEST.json"))
      === """["g1","g2"]""")
    // GC keeps a bounded window of generations
    (3 to 9).foreach(i => ArchiveFs.publishManifest(d, s"""["g$i"]"""))
    val numbered = ArchiveFs.list(d).map(ArchiveFs.name)
      .filter(_.startsWith("_MANIFEST-")).sorted
    assert(numbered.size === 3, s"GC window: $numbered")
    assert(ArchiveFs.readManifest(d) === Some("""["g9"]"""))
    ArchiveFs.delete(d, recursive = true)
  }

  test("manifest survives an object-store-style copy+delete mirror window") {
    val d = tmpDir()
    ArchiveFs.publishManifest(d, """["s1"]""")
    // simulate S3A renameOverwrite mid-swap: the legacy mirror is GONE
    ArchiveFs.delete(ArchiveFs.child(d, "_MANIFEST.json"))
    // a reader still sees the full newest manifest via the numbered file
    assert(ArchiveFs.readManifest(d) === Some("""["s1"]"""))
    assert(ArchiveFs.hasManifest(d))
    ArchiveFs.delete(d, recursive = true)
  }

  test("concurrent publishers under the lock never lose a generation") {
    val d = tmpDir()
    val lock = ArchiveFs.child(d, "_MANIFEST.lock")
    val threads = (1 to 4).map { t =>
      new Thread(() => {
        (1 to 5).foreach { i =>
          ArchiveFs.withLock(lock) {
            val prev = ArchiveFs.readManifest(d).getOrElse("[]")
            val n = prev.count(_ == 'e') // count of "entry" markers
            ArchiveFs.publishManifest(d,
              (0 to n).map(_ => "e").mkString("[", ",", "]"))
          }
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    val fin = ArchiveFs.readManifest(d).get
    assert(fin.count(_ == 'e') === 20, s"lost RMW generations: $fin")
    ArchiveFs.delete(d, recursive = true)
  }

  test("write-checksum stays OFF privately: the shared FS cache is untouched") {
    val d = tmpDir()
    // our instance writes no .crc sidecars (list via java.io.File —
    // ChecksumFileSystem.listStatus HIDES crc sidecars, so a Hadoop
    // listing cannot observe either outcome)
    def onDisk(): Seq[String] = new java.io.File(d).list().toSeq.sorted
    ArchiveFs.writeBytes(ArchiveFs.child(d, "plain.bin"), "x".getBytes("UTF-8"))
    assert(!onDisk().exists(_.endsWith(".crc")), onDisk())
    // the JVM-shared FileSystem.get instance still writes checksums —
    // proving ArchiveFs never mutated the shared cache under Spark's feet
    val shared = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), new org.apache.hadoop.conf.Configuration())
    val sp = new org.apache.hadoop.fs.Path(d, "shared.bin")
    val out = shared.create(sp, true)
    try out.write(1) finally out.close()
    assert(onDisk().contains(".shared.bin.crc"),
      "shared FileSystem.get cache lost its checksum default — " +
        s"ArchiveFs mutated a JVM-shared instance (files: ${onDisk()})")
    ArchiveFs.delete(d, recursive = true)
  }

  test("SerializableHadoopConf round-trips custom keys through Java serialization") {
    val c = new org.apache.hadoop.conf.Configuration(false)
    c.set("graft.test.key", "shipped-value")
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(new graft.sources.SerializableHadoopConf(c))
    oos.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = in.readObject().asInstanceOf[graft.sources.SerializableHadoopConf]
    assert(back.value.get("graft.test.key") === "shipped-value")
  }
}
