package graft

import org.scalatest.funsuite.AnyFunSuite

/** TempDirs — the shutdown-hook-cleaned workspace registry every
  * store-building QueryDef allocates through. The purge loop is what the
  * bench calls between reps, so it must survive anything the filesystem
  * does to individual roots (ADVICE r14 #3: an externally-vanished root
  * aborted purgeAll mid-loop, stranding the remaining registrations and
  * crashing the rep loop).
  */
class TempDirsSpec extends AnyFunSuite {

  test("scoped roots are deleted recursively by purgeAll") {
    val root = java.nio.file.Paths.get(TempDirs.scoped("graft-tdspec"))
    val sub = root.resolve("a/b")
    java.nio.file.Files.createDirectories(sub)
    java.nio.file.Files.write(sub.resolve("f.txt"), "x".getBytes)
    TempDirs.purgeAll()
    assert(!java.nio.file.Files.exists(root))
  }

  test("a root that vanished externally does not abort the purge of the rest") {
    val gone = java.nio.file.Paths.get(TempDirs.scoped("graft-tdspec-gone"))
    val alive = java.nio.file.Paths.get(TempDirs.scoped("graft-tdspec-alive"))
    java.nio.file.Files.write(alive.resolve("keepme.txt"), "y".getBytes)
    // tmpwatch-style external removal between registration and purge
    java.nio.file.Files.delete(gone)
    TempDirs.purgeAll()
    assert(!java.nio.file.Files.exists(alive),
      "the live root after the vanished one must still purge")
  }

  test("purgeAll is idempotent and re-registration works after a purge") {
    TempDirs.purgeAll()
    TempDirs.purgeAll() // second call over an empty registry: no-op
    val again = java.nio.file.Paths.get(TempDirs.scoped("graft-tdspec-again"))
    assert(java.nio.file.Files.isDirectory(again))
    TempDirs.purgeAll()
    assert(!java.nio.file.Files.exists(again))
  }
}
