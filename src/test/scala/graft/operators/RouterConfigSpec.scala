package graft.operators

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

class RouterConfigSpec extends AnyFunSuite {

  private def write(dir: Path, name: String, content: String): Path = {
    val p = dir.resolve(name)
    Files.write(p, content.getBytes("UTF-8"))
    p
  }

  test("defaults ← user ← project merge, later files win key-by-key") {
    val dir = Files.createTempDirectory("graft_cfg")
    val user = write(dir, ".erde.yml",
      """routers:
        |  local: http://user-override:5000
        |  foot: http://foot.example:5001
        |""".stripMargin)
    val project = write(dir, "erde.yml",
      """# project config
        |routers:
        |  foot: "http://project-foot:5002"
        |other:
        |  key: ignored
        |""".stripMargin)
    val r = RouterConfig.routers(userPath = user, projectPath = project)
    assert(r("local") == "http://user-override:5000") // user beats default
    assert(r("foot") == "http://project-foot:5002") // project beats user
    assert(!r.contains("key")) // other sections don't leak
  }

  test("missing files read as empty; defaults survive") {
    val dir = Files.createTempDirectory("graft_cfg")
    val r = RouterConfig.routers(
      userPath = dir.resolve("absent"), projectPath = dir.resolve("also-absent"))
    assert(r == RouterConfig.Defaults)
  }

  test("resolve passes unknown names through; requireRouter validates") {
    val reg = Map("local" -> "http://localhost:5000")
    assert(RouterConfig.resolve("local", reg) == "http://localhost:5000")
    assert(RouterConfig.resolve("http://x:9/y", reg) == "http://x:9/y")
    assert(RouterConfig.requireRouter("https://r.example", reg) == "https://r.example")
    val e = intercept[IllegalArgumentException](RouterConfig.requireRouter("nope", reg))
    assert(e.getMessage.contains("routers section"))
  }
}
