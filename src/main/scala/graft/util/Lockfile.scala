package graft.util

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Single-instance lock (reference O12, driver.go:94-111,128-131):
  * a PID-stamped lockfile created atomically; a second instance refuses
  * to start while the file exists.  Driver-side only — this guards the
  * submit host, not executors.
  */
final class Lockfile(val path: Path) {
  def acquire(): Boolean =
    try {
      Files.write(
        path,
        ProcessHandle.current.pid.toString.getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  def release(): Unit = Files.deleteIfExists(path)

  def holderPid: Option[Long] =
    if (Files.exists(path))
      scala.util.Try(new String(Files.readAllBytes(path), "UTF-8").trim.toLong).toOption
    else None
}

object Lockfile {
  /** Reference uses ./reindex.lock (driver.go:96). */
  def default(dir: String = "."): Lockfile =
    new Lockfile(Paths.get(dir, "reindex.lock"))
}
