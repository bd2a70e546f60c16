package graft.io

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Dual audit/error logging with date-based rotation — the reference's
  * logging scheme (`R/logger.R:4-58`): every message goes to a date-stamped
  * audit log (`audit_YYYY-MM-DD.log`); errors additionally go to a separate
  * error log; lines are `[timestamp] [LEVEL] message`. The clock is
  * injected for testability (the reference stamps wall-clock, SURVEY.md §8
  * Q6 applies to data, not logs — but determinism costs nothing here).
  *
  * Driver-side by design: executors log through Spark's own log4j; this
  * logger records pipeline-level audit events (files queued, batch
  * verdicts, write confirmations), which are inherently driver-scoped and
  * low-volume.
  */
final class PipelineLogger(
    logDir: String,
    auditBase: String = "audit.log",
    errorBase: String = "errors.log",
    clock: () => LocalDateTime = () => LocalDateTime.now()) {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val dateFmt = DateTimeFormatter.ISO_LOCAL_DATE

  /** `base.ext` -> `base_YYYY-MM-DD.ext` (`R/logger.R:4-15`). */
  private def stamped(base: String): java.nio.file.Path = {
    val dot = base.lastIndexOf('.')
    val (stem, ext) =
      if (dot >= 0) (base.substring(0, dot), base.substring(dot))
      else (base, "")
    Paths.get(logDir, s"${stem}_${clock().format(dateFmt)}$ext")
  }

  private def write(base: String, level: String, msg: String): Unit =
    synchronized {
      val p = stamped(base)
      Files.createDirectories(p.getParent)
      Files.writeString(p,
        s"[${clock().format(tsFmt)}] [$level] $msg\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

  def info(msg: String): Unit = write(auditBase, "INFO", msg)

  def warn(msg: String): Unit = write(auditBase, "WARN", msg)

  def audit(msg: String): Unit = write(auditBase, "AUDIT", msg)

  /** Errors land in BOTH logs (`R/logger.R:44-48`). */
  def error(msg: String): Unit = {
    write(errorBase, "ERROR", msg)
    write(auditBase, "ERROR", msg)
  }

  def auditLogPath: String = stamped(auditBase).toString
  def errorLogPath: String = stamped(errorBase).toString
}
