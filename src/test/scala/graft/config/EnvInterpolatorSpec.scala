package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** F9 interpolation semantics (`config/loader.py:21-52`). */
class EnvInterpolatorSpec extends AnyFunSuite {
  private val env = Map("HOST" -> "db.example", "PORT" -> "5432")

  test("set variable substitutes") {
    assert(EnvInterpolator.interpolate("host: ${HOST}", env) === "host: db.example")
  }

  test("unset with default falls back") {
    assert(EnvInterpolator.interpolate("user: ${DB_USER:-cdc}", env) === "user: cdc")
  }

  test("set variable wins over default") {
    assert(EnvInterpolator.interpolate("p: ${PORT:-9999}", env) === "p: 5432")
  }

  test("unset without default becomes empty") {
    assert(EnvInterpolator.interpolate("x: [${MISSING}]", env) === "x: []")
  }

  test("multiple occurrences, mixed forms") {
    assert(EnvInterpolator.interpolate(
      "url: ${HOST}:${PORT}/${DB:-cdc_db}?ssl=${SSL:-false}", env) ===
      "url: db.example:5432/cdc_db?ssl=false")
  }

  test("special replacement characters in values survive") {
    assert(EnvInterpolator.interpolate("v: ${P:-a$b\\c}", env) === "v: a$b\\c")
  }
}
