package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ArchiveFs

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
}
