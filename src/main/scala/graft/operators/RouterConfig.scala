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

  /** Type-conflict failure during [[dataMerge]] (reference: erde/cfg.py
    * `MergeError`).
    */
  final class MergeError(msg: String) extends RuntimeException(msg)

  /** The reference's `data_merge(a, b)` (erde/cfg.py, exercised by
    * tests/test_data_merge.py), value model Map[String, Any] / Seq[Any] /
    * scalars / null:
    *
    *  - null or scalar `a` → `b` wins;
    *  - list `a`: list `b` appends element-wise, scalar `b` appends as one
    *    element;
    *  - dict `a`: dict `b` merges RECURSIVELY key-by-key; non-dict `b` is a
    *    MergeError;
    *  - anything else (the reference's tuples/arbitrary objects) →
    *    MergeError.
    */
  def dataMerge(a: Any, b: Any): Any = a match {
    case null => b
    case _: String | _: Int | _: Long | _: Double | _: Float | _: Boolean => b
    case la: Seq[_] => b match {
      case lb: Seq[_] => la ++ lb
      case _ => la :+ b
    }
    case ma: Map[_, _] => b match {
      case mb: Map[_, _] =>
        val am = ma.asInstanceOf[Map[String, Any]]
        mb.asInstanceOf[Map[String, Any]].foldLeft(am) { case (acc, (k, v)) =>
          acc.updated(k, dataMerge(acc.getOrElse(k, null), v))
        }
      case _ => throw new MergeError(s"""Cannot merge non-dict "$b" into dict "$a"""")
    }
    case _ => throw new MergeError(s"""NOT IMPLEMENTED "$b" into "$a"""")
  }

  /** Full config after the default ← user ← project [[dataMerge]] cascade
    * (each file parsed as a section→entries dict, later files merging in
    * recursively — the reference's CONFIG loop).
    */
  def config(
      userPath: Path = Paths.get(System.getProperty("user.home", "."), ".erde.yml"),
      projectPath: Path = Paths.get("erde.yml")): Map[String, Any] =
    Seq(userPath, projectPath).foldLeft(
      Map[String, Any]("routers" -> (Defaults: Map[String, Any]))) { (acc, p) =>
      val parsed = parseFile(p)
      if (parsed.isEmpty) acc
      else dataMerge(acc, parsed).asInstanceOf[Map[String, Any]]
    }

  /** routers section after the default ← user ← project merge. */
  def routers(
      userPath: Path = Paths.get(System.getProperty("user.home", "."), ".erde.yml"),
      projectPath: Path = Paths.get("erde.yml")): Map[String, String] =
    config(userPath, projectPath).getOrElse("routers", Map.empty) match {
      case m: Map[_, _] => m.collect { case (k: String, v: String) => k -> v }.toMap
      case _ => Map.empty
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

  /** Parses a whole config file as a section→entries dict for [[config]]:
    * top-level `name:` lines open a section (a nested Map), indented
    * `key: value` lines fill it, top-level `key: value` lines are scalar
    * entries. Missing files read as empty (the reference skips absent
    * paths). Same documented two-level shape as [[parseSection]].
    */
  private[operators] def parseFile(path: Path): Map[String, Any] = {
    if (!Files.exists(path)) return Map.empty
    val lines = Files.readAllLines(path).asScala
    var out = Map.empty[String, Any]
    var section: Option[String] = None
    def unquote(v: String): String =
      if (v.length >= 2 && ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
        v.substring(1, v.length - 1)
      else v
    lines.foreach { raw =>
      val noComment = raw.takeWhile(_ != '#')
      if (noComment.trim.nonEmpty) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        val t = noComment.trim
        val i = t.indexOf(':')
        if (!indented) {
          if (i == t.length - 1) { // `name:` opens a section
            section = Some(t.dropRight(1).trim)
            if (!out.contains(section.get)) out += section.get -> Map.empty[String, Any]
          } else if (i > 0) {
            section = None
            out += t.substring(0, i).trim -> unquote(t.substring(i + 1).trim)
          }
        } else section.foreach { s =>
          if (i > 0) {
            val v = unquote(t.substring(i + 1).trim)
            if (v.nonEmpty) out.get(s) match {
              case Some(m: Map[_, _]) =>
                out += s -> (m.asInstanceOf[Map[String, Any]] + (t.substring(0, i).trim -> v))
              case _ => ()
            }
          }
        }
      }
    }
    out
  }
}
