package graft.config

import scala.collection.immutable.ListMap

/** Typed config surface for the integrator — the Spark rewrite of the
  * reference's `config/config_editor.py` (typed ini with `; type: ...;
  * range: ...; default: ...;` hint comments) and
  * `integrator/integrator_config.py:50-182` (the typed fields driving
  * throttle rate, paths and flags).
  *
  * Format, per the reference's own config.ini header:
  *  - section/key lookup is case-insensitive
  *  - the comment lines directly above a variable are its description
  *  - a comment line `; type: int; range: (0, 100]; default: 10;`
  *    declares type (bool/int/float/string), optional range
  *    (`(a,b)`, `[a,b]`, `(a,b]`, `[a,b)`, `{v1, v2}` — inf/empty =
  *    unbounded) and optional default
  *  - `; #tags# k="v"; n=1;` lines carry display tags
  *  - bool accepts 0/1 and true/false
  */
object ConfigIni {

  sealed trait CfgType
  object CfgType {
    case object Bool extends CfgType
    case object IntT extends CfgType
    case object FloatT extends CfgType
    case object Str extends CfgType
    def parse(s: String): CfgType = s.trim.toLowerCase match {
      case "bool" => Bool
      case "int" => IntT
      case "float" => FloatT
      case "string" => Str
      case other => throw new IllegalArgumentException(
        s"unknown config type '$other'")
    }
    def render(t: CfgType): String = t match {
      case Bool => "bool"; case IntT => "int"
      case FloatT => "float"; case Str => "string"
    }
  }

  /** Numeric interval or value set (config_editor.py RangeType). */
  final case class CfgRange(raw: String,
      lo: Option[Double], hi: Option[Double],
      loIncl: Boolean, hiIncl: Boolean,
      set: Option[Set[String]]) {
    def check(v: Double): Boolean = set match {
      case Some(s) => s.exists(x => x.toDoubleOption.contains(v))
      case None =>
        lo.forall(l => if (loIncl) v >= l else v > l) &&
          hi.forall(h => if (hiIncl) v <= h else v < h)
    }
    def checkStr(v: String): Boolean =
      set.forall(_.contains(v))
  }

  object CfgRange {
    def parse(raw: String): CfgRange = {
      val s = raw.trim
      if (s.startsWith("{")) {
        val vals = s.stripPrefix("{").stripSuffix("}").split(",")
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSet
        CfgRange(raw, None, None, loIncl = false, hiIncl = false,
          Some(vals))
      } else {
        val loIncl = s.startsWith("[")
        val hiIncl = s.endsWith("]")
        val parts = s.drop(1).dropRight(1).split(",", -1).map(_.trim)
        require(parts.length == 2, s"bad range '$raw'")
        def bound(x: String): Option[Double] = x match {
          case "" | "inf" | "-inf" =>
            if (x == "inf") Some(Double.PositiveInfinity)
            else if (x == "-inf") Some(Double.NegativeInfinity)
            else None
          case v => Some(v.toDouble)
        }
        CfgRange(raw,
          bound(parts(0)).filter(_ != Double.NegativeInfinity),
          bound(parts(1)).filter(_ != Double.PositiveInfinity),
          loIncl, hiIncl, None)
      }
    }
  }

  final case class CfgVar(name: String, key: String, raw: String,
      typ: CfgType, range: Option[CfgRange], default: Option[String],
      comments: Seq[String], tags: Map[String, String]) {

    private def fail(msg: String) = throw new IllegalArgumentException(
      s"config $name: $msg")

    def str: String = {
      // a set-range on a string variable is an allowed-value list —
      // enforce it like the reference's typed editor does
      range.filter(_.set.isDefined).filterNot(_.checkStr(raw))
        .foreach(r => fail(s"'$raw' not in allowed set ${r.raw}"))
      raw
    }
    def bool: Boolean = raw.trim.toLowerCase match {
      case "1" | "true" => true
      case "0" | "false" => false
      case v => fail(s"'$v' is not a bool")
    }
    def int: Int = {
      val v = raw.trim.toIntOption.getOrElse(fail(s"'$raw' is not int"))
      range.filterNot(_.check(v.toDouble)).foreach(r =>
        fail(s"$v outside range ${r.raw}"))
      v
    }
    def float: Double = {
      val v = raw.trim.toDoubleOption
        .getOrElse(fail(s"'$raw' is not float"))
      range.filterNot(_.check(v)).foreach(r =>
        fail(s"$v outside range ${r.raw}"))
      v
    }
  }

  final case class CfgSection(name: String, comments: Seq[String],
      tags: Map[String, String], vars: ListMap[String, CfgVar]) {
    def apply(key: String): CfgVar =
      vars.getOrElse(key.toUpperCase,
        throw new NoSuchElementException(s"[$name] has no key $key"))
    def get(key: String): Option[CfgVar] = vars.get(key.toUpperCase)
  }

  private val TagLine = """^#tags#\s*(.*)$""".r
  private val HintLine =
    """(?i)^type:\s*(\w+)\s*;(.*)$""".r
  private val SectionLine = """^\[(.+)\]\s*$""".r
  private val KvLine = """^([^=;\[]+)=(.*)$""".r

  private def parseTags(body: String): Map[String, String] =
    body.split(";").map(_.trim).filter(_.nonEmpty).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          Some(k.trim -> v.trim.stripPrefix("\"").stripSuffix("\""))
        case _ => None
      }
    }.toMap

  def parse(text: String): Parsed = {
    var fileComments = Vector.empty[String]
    var sections = ListMap.empty[String, CfgSection]
    var curSection: Option[String] = None
    var pendingComments = Vector.empty[String]
    var pendingTags = Map.empty[String, String]
    var pendingType: Option[CfgType] = None
    var pendingRange: Option[CfgRange] = None
    var pendingDefault: Option[String] = None
    var seenFirstSection = false

    def resetPending(): Unit = {
      pendingComments = Vector.empty; pendingTags = Map.empty
      pendingType = None; pendingRange = None; pendingDefault = None
    }

    text.linesIterator.foreach { line =>
      val t = line.trim
      t match {
        case "" =>
          // a blank line ends a comment block; the block before the
          // first section is the file comment
          if (!seenFirstSection && pendingComments.nonEmpty) {
            fileComments ++= pendingComments
          }
          resetPending()
        case c if c.startsWith(";") || c.startsWith("#") =>
          val body = c.dropWhile(ch => ch == ';' || ch == '#').trim
          // re-attach '#tags#' marker consumed by dropWhile
          val tagBody = c.stripPrefix(";").trim
          tagBody match {
            case TagLine(inner) => pendingTags ++= parseTags(inner)
            case _ => body match {
              case HintLine(typ, rest) =>
                pendingType = Some(CfgType.parse(typ))
                rest.split(";").map(_.trim).filter(_.nonEmpty).foreach {
                  seg =>
                    // tolerate colon-less segments like configparser
                    // (a bare `foo;` is noise, not a crash)
                    seg.split(":", 2).map(_.trim) match {
                      case Array(k, v) => k.toLowerCase match {
                        case "range" =>
                          pendingRange = Some(CfgRange.parse(v))
                        case "default" => pendingDefault =
                          Some(v.stripPrefix("\"").stripSuffix("\""))
                        case _ => ()
                      }
                      case _ => ()
                    }
                }
              case _ => pendingComments :+= body
            }
          }
        case SectionLine(name) =>
          seenFirstSection = true
          // strict like the reference's configparser base
          // (DuplicateSectionError) — silently replacing would drop
          // every key parsed under the first occurrence. Deviation:
          // sections are canonically uppercase here, so [Api] after
          // [API] is also rejected, where case-sensitive configparser
          // would keep them as two distinct sections.
          if (sections.contains(name.toUpperCase))
            throw new IllegalArgumentException(
              s"duplicate section [$name]: section names are" +
                s" case-insensitive (canonical [${name.toUpperCase}]" +
                " already defined)")
          sections += name.toUpperCase -> CfgSection(name.toUpperCase,
            pendingComments, pendingTags, ListMap.empty)
          curSection = Some(name.toUpperCase)
          resetPending()
        case KvLine(k, v) =>
          val sec = curSection.getOrElse(
            throw new IllegalArgumentException(
              s"key ${k.trim} outside any section"))
          val cv = CfgVar(s"[$sec] ${k.trim.toUpperCase}",
            k.trim.toUpperCase, v.trim,
            pendingType.getOrElse(CfgType.Str), pendingRange,
            pendingDefault, pendingComments, pendingTags)
          val s0 = sections(sec)
          sections += sec ->
            s0.copy(vars = s0.vars + (k.trim.toUpperCase -> cv))
          resetPending()
        case _ => () // tolerate unknown lines, like configparser
      }
    }
    Parsed(fileComments, sections)
  }

  final case class Parsed(fileComments: Seq[String],
      sections: ListMap[String, CfgSection]) {
    def apply(section: String): CfgSection =
      sections.getOrElse(section.toUpperCase,
        throw new NoSuchElementException(s"no section [$section]"))
    def get(section: String): Option[CfgSection] =
      sections.get(section.toUpperCase)

    /** Serialize back to ini — comments, tags and hints included —
      * such that parse(render) == this (the reference's
      * ConfigEditor.save round-trip, test_config_editor.py).
      */
    def render: String = {
      val sb = new StringBuilder
      fileComments.foreach(c => sb.append(s"; $c\n"))
      if (fileComments.nonEmpty) sb.append("\n")
      sections.values.foreach { s =>
        s.comments.foreach(c => sb.append(s"; $c\n"))
        if (s.tags.nonEmpty) sb.append(
          s.tags.toSeq.sortBy(_._1).map { case (k, v) => s"""$k="$v"""" }
            .mkString("; #tags# ", "; ", ";\n"))
        sb.append(s"[${s.name}]\n")
        s.vars.values.foreach { v =>
          v.comments.foreach(c => sb.append(s"; $c\n"))
          if (v.tags.nonEmpty) sb.append(
            v.tags.toSeq.sortBy(_._1).map { case (k, t) => s"""$k="$t"""" }
              .mkString("; #tags# ", "; ", ";\n"))
          val hint = new StringBuilder(s"; type: ${CfgType.render(v.typ)};")
          v.range.foreach(r => hint.append(s" range: ${r.raw};"))
          v.default.foreach(d => hint.append(s""" default: "$d";"""))
          sb.append(hint).append("\n")
          sb.append(s"${v.key}=${v.raw}\n")
        }
        sb.append("\n")
      }
      sb.toString
    }
  }
}

/** The typed fields a user operating the integrator sets on day one
  * (integrator_config.py:88-160), resolved from the parsed ini with
  * the same semantics: `{BASE_DIR}` substitution in paths, the
  * REQUESTS_PER_SEC < 0 → 3600/REQUESTS_PER_HOUR fallback, and env-var
  * token indirection (TOKEN_ENV_NAME wins over API_TOKEN when set).
  */
final case class GraftConfig(
    apiTokenEnv: String,
    apiToken: String,
    requestsPerHour: Int,
    requestsPerSec: Double,
    saveRawData: Boolean,
    rawDataDir: String,
    jsonEncoding: String,
    includeCanceledForms: Boolean,
    ignoreBasicDataError: Boolean,
    dbPath: String,
    logPath: String,
    timezone: String) {
  /** Throttle interval for Ingest.Throttle / Integrator. */
  def minIntervalMs: Long = math.max(0L, (requestsPerSec * 1000).toLong)
  /** Token resolution (integrator_config.py:92-96). */
  def resolveToken(env: String => Option[String]): String =
    (if (apiTokenEnv.nonEmpty) env(apiTokenEnv) else None)
      .getOrElse(apiToken)
}

object GraftConfig {
  import ConfigIni._

  def fromIni(ini: Parsed, baseDir: String): GraftConfig = {
    def sub(p: String): String = p.replace("{BASE_DIR}", baseDir)
    val api = ini("API")
    val dr = ini("DATA_RETRIEVAL")
    val db = ini("DATABASE")
    val log = ini("LOGGING")
    val rph = api("REQUESTS_PER_HOUR").int
    val rpsRaw = api("REQUESTS_PER_SEC").float
    GraftConfig(
      apiTokenEnv = api("TOKEN_ENV_NAME").str,
      apiToken = api("API_TOKEN").str,
      requestsPerHour = rph,
      // integrator_config.py:99: negative → derive from the hourly cap.
      // Fail fast on rph <= 0 here: 3600.0/0 = Infinity would turn
      // minIntervalMs into Long.MaxValue and the second throttled
      // request would sleep forever.
      requestsPerSec = if (rpsRaw >= 0) rpsRaw else {
        require(rph > 0, s"REQUESTS_PER_SEC < 0 derives the rate from " +
          s"REQUESTS_PER_HOUR, which must be positive (got $rph)")
        3600.0 / rph
      },
      saveRawData = dr("SAVE_RAW_DATA").bool,
      rawDataDir = sub(dr("RAW_DATA_DIR").str),
      jsonEncoding = dr("JSON_ENCODING").str,
      includeCanceledForms = dr("INCLUDE_CANCELED_FORMS").bool,
      ignoreBasicDataError =
        dr.get("IGNORE_BASIC_DATA_ERROR").map(_.bool).getOrElse(false),
      dbPath = sub(db("DB_PATH").str),
      logPath = sub(log("LOG_PATH").str),
      timezone =
        log.get("TIMEZONE").map(_.str).getOrElse("UTC"))
  }

  def fromFile(path: String, baseDir: String): GraftConfig =
    fromIni(ConfigIni.parse(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")), baseDir)
}
