package graft.config

/** `${VAR}` / `${VAR:-default}` environment interpolation for config
  * text (SURVEY.md §2.8 F9; behavior of the reference loader
  * `config/loader.py:21-52`): every occurrence is replaced by the
  * variable's value; with a `:-default`, an unset variable falls back
  * to the default; without one, an unset variable resolves to the
  * empty string.
  */
object EnvInterpolator {
  private val Pattern = """\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\}""".r

  def interpolate(text: String, env: Map[String, String] = sys.env): String =
    Pattern.replaceAllIn(text, m => {
      val value = env.get(m.group(1))
        .orElse(Option(m.group(2)))
        .getOrElse("")
      scala.util.matching.Regex.quoteReplacement(value)
    })
}
