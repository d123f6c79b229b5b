package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Typed-ini parsing + round-trip, mirroring the reference's
  * test/test_config_editor.py over its test/data/simple_config.ini
  * shape, plus the integrator-field resolution rules of
  * integrator_config.py (BASE_DIR substitution, negative
  * REQUESTS_PER_SEC fallback, env-token indirection).
  */
class ConfigSpec extends AnyFunSuite {

  private val sample =
    """; file comment 1
      |; file comment 2
      |
      |; section comment
      |; #tags# icon="api";
      |[API]
      |; token env var
      |; type: string; default: "JOBCAN_API_TOKEN";
      |TOKEN_ENV_NAME=MY_TOKEN_ENV
      |; type: string; default: "";
      |API_TOKEN=fallback-token
      |; type: int; range: (0, 10000]; default: 5000;
      |REQUESTS_PER_HOUR=5000
      |; type: float; range: (-inf, inf); default: 0.72;
      |REQUESTS_PER_SEC=-1
      |
      |[DATA_RETRIEVAL]
      |; type: bool; range: {0, 1}; default: 0;
      |SAVE_RAW_DATA=1
      |; type: string; default: "{BASE_DIR}/raw_data";
      |RAW_DATA_DIR={BASE_DIR}/raw_data
      |; type: string; default: "utf-8";
      |JSON_ENCODING=utf-8
      |; type: bool; range: {0, 1}; default: 0;
      |INCLUDE_CANCELED_FORMS=true
      |; type: bool; range: {0, 1}; default: 0;
      |IGNORE_BASIC_DATA_ERROR=0
      |
      |[DATABASE]
      |; type: string; default: "{BASE_DIR}/jobcan-data.db";
      |DB_PATH={BASE_DIR}/state
      |
      |[LOGGING]
      |; type: string; default: "{BASE_DIR}/jobcan-retrieval.log";
      |LOG_PATH={BASE_DIR}/run.log
      |; type: string; default: "UTC";
      |TIMEZONE=Asia/Tokyo
      |""".stripMargin

  private lazy val parsed = ConfigIni.parse(sample)

  test("sections, keys and comments parse; lookup is " +
    "case-insensitive (config.ini header contract)") {
    assert(parsed.sections.keySet ==
      Set("API", "DATA_RETRIEVAL", "DATABASE", "LOGGING"))
    assert(parsed("api")("requests_per_hour").int == 5000)
    assert(parsed("API").tags == Map("icon" -> "api"))
    assert(parsed("API")("TOKEN_ENV_NAME").comments ==
      Seq("token env var"))
    assert(parsed.fileComments ==
      Seq("file comment 1", "file comment 2"))
  }

  test("typed access: bool accepts 0/1 and true/false; range " +
    "violations and type mismatches throw") {
    assert(parsed("DATA_RETRIEVAL")("SAVE_RAW_DATA").bool)
    assert(parsed("DATA_RETRIEVAL")("INCLUDE_CANCELED_FORMS").bool)
    val bad = ConfigIni.parse(
      "[API]\n; type: int; range: (0, 10000]; default: 5000;\n" +
        "REQUESTS_PER_HOUR=20000\n")
    intercept[IllegalArgumentException] {
      bad("API")("REQUESTS_PER_HOUR").int
    }
    val notInt = ConfigIni.parse(
      "[API]\n; type: int;\nREQUESTS_PER_HOUR=abc\n")
    intercept[IllegalArgumentException] {
      notInt("API")("REQUESTS_PER_HOUR").int
    }
  }

  test("string set-range is enforced; malformed hint segments are " +
    "tolerated; spaced keys survive the round-trip") {
    val bad = ConfigIni.parse(
      "[A]\n; type: string; range: {\"utf-8\", \"shift_jis\"};\n" +
        "ENC=latin-1\n")
    intercept[IllegalArgumentException] { bad("A")("ENC").str }
    val ok = ConfigIni.parse(
      "[A]\n; type: string; range: {\"utf-8\", \"shift_jis\"};\n" +
        "ENC=shift_jis\n")
    assert(ok("A")("ENC").str == "shift_jis")
    // colon-less hint segment must not crash the parser
    val noisy = ConfigIni.parse("[A]\n; type: int; foo;\nX=1\n")
    assert(noisy("A")("X").int == 1)
    // a key containing a space keeps its full name through save
    val spaced = ConfigIni.parse("[A]\n; type: string;\nMY KEY=v\n")
    val again = ConfigIni.parse(spaced.render)
    assert(again("A")("MY KEY").str == "v")
  }

  test("render → parse round-trips (ConfigEditor.save contract)") {
    val again = ConfigIni.parse(parsed.render)
    assert(again == parsed)
    // and a second round-trip is byte-identical (fixed point)
    assert(again.render == parsed.render)
  }

  test("GraftConfig resolves integrator fields like " +
    "integrator_config.py:88-160") {
    val cfg = GraftConfig.fromIni(parsed, "/app")
    // negative REQUESTS_PER_SEC → 3600 / REQUESTS_PER_HOUR
    assert(cfg.requestsPerSec == 3600.0 / 5000)
    assert(cfg.minIntervalMs == 720L)
    // {BASE_DIR} substitution in every path
    assert(cfg.rawDataDir == "/app/raw_data")
    assert(cfg.dbPath == "/app/state")
    assert(cfg.logPath == "/app/run.log")
    assert(cfg.timezone == "Asia/Tokyo")
    // token indirection: env wins when set, falls back otherwise
    assert(cfg.resolveToken(e =>
      if (e == "MY_TOKEN_ENV") Some("from-env") else None) == "from-env")
    assert(cfg.resolveToken(_ => None) == "fallback-token")
  }

  test("duplicate [SECTION] is rejected, not silently replaced " +
    "(configparser DuplicateSectionError semantics)") {
    val dup = "[API]\nA=1\n[API]\nB=2\n"
    val e = intercept[IllegalArgumentException](ConfigIni.parse(dup))
    assert(e.getMessage.contains("duplicate section"))
  }

  test("negative REQUESTS_PER_SEC with non-positive " +
    "REQUESTS_PER_HOUR fails fast instead of sleeping forever") {
    // drop the range hint too — the (0, 10000] range would reject 0
    // earlier with its own message; the require guards inis without one
    val bad = ConfigIni.parse(sample
      .replace("; type: int; range: (0, 10000]; default: 5000;",
        "; type: int; default: 5000;")
      .replace("REQUESTS_PER_HOUR=5000", "REQUESTS_PER_HOUR=0"))
    val e = intercept[IllegalArgumentException](
      GraftConfig.fromIni(bad, "/app"))
    assert(e.getMessage.contains("REQUESTS_PER_HOUR"))
  }
}
