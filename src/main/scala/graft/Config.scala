package graft

/** The reference's config layer (`Defaults`, proteofav/config.py:42,
  * over config.ini) re-expressed for a path-driven CLI: a flat INI
  * parse — `[section]` headers group keys but the attribute namespace
  * is global, exactly like the reference's `populate_attributes` —
  * plus the two resolution rules scripted workflows rely on:
  *
  *  - a `db*` key holding the reference's `...` placeholder resolves
  *    to the system temp dir (config.py:85);
  *  - a `db_root` key prefixes every RELATIVE path-valued CLI option
  *    coming from the config, so one knob points a whole scripted
  *    workflow at a data root (the reference's per-resource db_* dirs
  *    collapsed to their common use).
  *
  * [[cliDefaults]] projects a loaded config onto [[Cli]] option names
  * (underscores normalize to dashes, so the reference's
  * `output_type = tab` spelling works); command-line arguments always
  * override config values.
  */
object Config {

  /** Parse an INI file into a flat key → value map. Comments (`#`,
    * `;`) and section headers are skipped; `db*` keys with the `...`
    * placeholder resolve to the temp dir. */
  def load(path: String): Map[String, String] = {
    val src = scala.io.Source.fromFile(path)
    val lines = try src.getLines().toList finally src.close()
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith(";") &&
        !(l.startsWith("[") && l.endsWith("]")))
      .flatMap { l =>
        val i = l.indexWhere(c => c == '=' || c == ':')
        if (i < 0) None else Some(l.take(i).trim -> l.drop(i + 1).trim)
      }
      .toMap
      .map { case (k, v) =>
        k -> (if (k.startsWith("db") && v == "...")
          System.getProperty("java.io.tmpdir") else v)
      }
  }

  /** CLI options that name files/directories — these resolve against
    * `db_root` when given as relative paths in the config. */
  private val pathOpts = Set("atoms", "dssp", "sifts", "validation",
    "annotations", "variants", "output")

  private val knownOpts = pathOpts ++ Set("input-format", "uniprot",
    "chains", "res", "atom-names", "sequence-check", "output-type",
    "master", "keep-altlocs", "keep-partial")

  /** CLI options that are presence-only flags downstream (Cli tests
    * `opts.contains`, never the value) — the config must interpret
    * their VALUE here, or `keep_altlocs = false` would enable the
    * flag by mere key presence. */
  private val flagOpts = Set("keep-altlocs", "keep-partial")

  private def truthy(v: String): Boolean =
    Set("true", "yes", "on", "1")(v.trim.toLowerCase)

  /** Project a loaded config onto CLI option defaults: normalize
    * `_` → `-`, keep only known option names (the reference config's
    * api/fetch URLs have no meaning to a no-egress engine), resolve
    * relative path options under `db_root` when set, and drop flag
    * options whose value is falsy (downstream checks key presence). */
  def cliDefaults(cfg: Map[String, String]): Map[String, String] = {
    val norm = cfg.map { case (k, v) => k.replace('_', '-') -> v }
    val root = norm.get("db-root")
    norm.collect {
      case (k, v) if knownOpts(k) && (!flagOpts(k) || truthy(v)) =>
        k -> (root match {
          case Some(r) if pathOpts(k) && !new java.io.File(v).isAbsolute =>
            new java.io.File(r, v).getPath
          case _ => v
        })
    }
  }
}
