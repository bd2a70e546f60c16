package graft.io

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

class PipelineLoggerSpec extends AnyFunSuite {

  private def mk(): (PipelineLogger, String) = {
    val dir = Files.createTempDirectory("graft_logs").toString
    val fixed = LocalDateTime.of(2024, 5, 6, 7, 8, 9)
    (new PipelineLogger(dir, clock = () => fixed), dir)
  }

  test("info goes to date-stamped audit log with level and timestamp") {
    val (log, dir) = mk()
    log.info("queued 3 files")
    val lines = Files.readAllLines(Paths.get(dir, "audit_2024-05-06.log"))
    assert(lines.size() == 1)
    assert(lines.get(0) == "[2024-05-06 07:08:09] [INFO] queued 3 files")
  }

  test("errors land in both error and audit logs") {
    val (log, dir) = mk()
    log.error("boom")
    log.info("continuing")
    val audit = Files.readAllLines(Paths.get(dir, "audit_2024-05-06.log"))
    val errors = Files.readAllLines(Paths.get(dir, "errors_2024-05-06.log"))
    assert(errors.size() == 1 && errors.get(0).contains("[ERROR] boom"))
    assert(audit.size() == 2)
    assert(audit.get(0).contains("[ERROR] boom"))
    assert(audit.get(1).contains("[INFO] continuing"))
  }

  test("date rotation: new date, new file") {
    val dir = Files.createTempDirectory("graft_logs").toString
    var day = 6
    val log = new PipelineLogger(dir,
      clock = () => LocalDateTime.of(2024, 5, day, 0, 0, 0))
    log.info("day six")
    day = 7
    log.info("day seven")
    assert(Files.exists(Paths.get(dir, "audit_2024-05-06.log")))
    assert(Files.exists(Paths.get(dir, "audit_2024-05-07.log")))
  }
}
