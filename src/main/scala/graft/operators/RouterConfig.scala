package graft.operators

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Router registry (reference: erde/cfg.py — a `routers:` map built from
  * defaults, then `~/.erde.yml`, then `./erde.yml`, later files winning
  * key-by-key; erde/op/route.py:29 resolves `CONFIG['routers'].get(mode,
  * mode)` so an unknown name passes through as a URL, and erde/op/table.py:
  * 149 additionally validates name-or-http).
  *
  * The parser reads the documented config shape — a two-level `section:` /
  * `  key: value` file — not full YAML (no YAML library exists in this
  * zero-egress build, and the reference's config never nests deeper).
  */
object RouterConfig {

  val Defaults: Map[String, String] = Map("local" -> "http://localhost:5000")

  /** routers section after the default ← user ← project merge. */
  def routers(
      userPath: Path = Paths.get(System.getProperty("user.home", "."), ".erde.yml"),
      projectPath: Path = Paths.get("erde.yml")): Map[String, String] =
    Seq(userPath, projectPath).foldLeft(Defaults) { (acc, p) =>
      acc ++ parseSection(p, "routers")
    }

  /** `mode` resolved through the registry; unknown names pass through
    * unchanged (the reference treats them as literal URLs).
    */
  def resolve(mode: String,
      registry: Map[String, String] = routers()): String =
    registry.getOrElse(mode, mode)

  /** The table.py validation: mode must be a registry key or an http(s) URL. */
  def requireRouter(mode: String,
      registry: Map[String, String] = routers()): String = {
    if (!registry.contains(mode) && !mode.matches("^https?://.*"))
      throw new IllegalArgumentException(
        s"router must be a key in erde config routers section, or a URL. got: '$mode'")
    registry.getOrElse(mode, mode)
  }

  /** Parses one `section:` block of `key: value` pairs from a config file;
    * missing files read as empty (the reference skips absent paths).
    */
  private[operators] def parseSection(path: Path, section: String): Map[String, String] = {
    if (!Files.exists(path)) return Map.empty
    val lines = Files.readAllLines(path).asScala
    val out = Map.newBuilder[String, String]
    var inSection = false
    lines.foreach { raw =>
      val noComment = raw.takeWhile(_ != '#')
      if (noComment.trim.nonEmpty) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        if (!indented) inSection = noComment.trim == s"$section:"
        else if (inSection) {
          val t = noComment.trim
          val i = t.indexOf(':')
          if (i > 0) {
            val v = t.substring(i + 1).trim
            val unquoted =
              if (v.length >= 2 && ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
                v.substring(1, v.length - 1)
              else v
            if (unquoted.nonEmpty) out += t.substring(0, i).trim -> unquoted
          }
        }
      }
    }
    out.result()
  }
}
