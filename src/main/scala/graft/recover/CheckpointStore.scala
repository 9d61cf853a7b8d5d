package graft.recover

import graft.model.AtrState
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Reference-shaped JSON checkpoint store for explicit state snapshots.
  *
  * Reference: /root/reference/modules/recovery/checkpoint_manager.py —
  * document shape `{last_window, atr_state: {ticker: {prev_close, prev_atr,
  * tr_history, candle_count}}, saved_at, sheets_write_confirmed}`
  * (checkpoint_manager.py:62-67), atomic tmp+fsync+rename write
  * (:69-105), rotation keep-N (:161-182), and load-newest-valid falling
  * back over rotated copies (:107-159).
  *
  * In the engine, Structured Streaming's checkpointLocation is the primary
  * recovery mechanism (SURVEY.md §2.2); this store exists for the explicit
  * cross-validation snapshot the reference keeps beside the sink, and for
  * interop with tooling that reads the reference's checkpoint format. Pure
  * JVM (driver-side, tiny document — one entry per symbol), hand-rolled
  * JSON to stay dependency-free.
  */
object CheckpointStore {

  final case class Checkpoint(
      lastWindow: Option[String],
      atrState: Map[String, AtrState],
      savedAt: String,
      sheetsWriteConfirmed: Boolean)

  // ---- JSON (hand-rolled: fixed schema, no external deps) ----

  private def jStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jNumOpt(o: Option[Double]): String = o.map(_.toString).getOrElse("null")

  def render(cp: Checkpoint): String = {
    val states = cp.atrState.toSeq.sortBy(_._1).map { case (sym, st) =>
      jStr(sym) + ":{" +
        s""""prev_close":${jNumOpt(st.prevClose)},""" +
        s""""prev_atr":${jNumOpt(st.prevAtr)},""" +
        s""""tr_history":[${st.trHistory.mkString(",")}],""" +
        s""""candle_count":${st.candleCount}}"""
    }.mkString(",")
    "{" +
      s""""last_window":${cp.lastWindow.map(jStr).getOrElse("null")},""" +
      s""""atr_state":{$states},""" +
      s""""saved_at":${jStr(cp.savedAt)},""" +
      s""""sheets_write_confirmed":${cp.sheetsWriteConfirmed}}"""
  }

  /** Minimal recursive-descent parser for the fixed checkpoint schema. */
  def parse(json: String): Option[Checkpoint] = Try {
    val p = new P(json)
    p.ws(); val obj = p.obj()
    val state = obj.get("atr_state").map(_.asInstanceOf[Map[String, Any]]).getOrElse(Map.empty)
    Checkpoint(
      lastWindow = obj.get("last_window").collect { case s: String => s },
      atrState = state.map { case (sym, v) =>
        val m = v.asInstanceOf[Map[String, Any]]
        sym -> AtrState(
          m.get("prev_close").collect { case d: Double => d },
          m.get("prev_atr").collect { case d: Double => d },
          m.get("tr_history").map(_.asInstanceOf[List[Any]].map(_.asInstanceOf[Double])).getOrElse(Nil),
          m.get("candle_count").collect { case d: Double => d.toInt }.getOrElse(0))
      },
      savedAt = obj.get("saved_at").collect { case s: String => s }.getOrElse(""),
      sheetsWriteConfirmed = obj.get("sheets_write_confirmed").collect { case b: Boolean => b }.getOrElse(false))
  }.toOption

  private final class P(s: String) {
    private var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = { ws(); require(s(i) == c, s"expected $c at $i"); i += 1 }
    def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (s(i) == '}') { i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws(); val k = str(); expect(':'); val v = value(); b += (k -> v); ws()
        if (s(i) == ',') i += 1 else { expect('}'); done = true }
      }
      b.result()
    }
    private def arr(): List[Any] = {
      expect('['); ws()
      if (s(i) == ']') { i += 1; return Nil }
      val b = List.newBuilder[Any]
      var done = false
      while (!done) {
        b += value(); ws()
        if (s(i) == ',') i += 1 else { expect(']'); done = true }
      }
      b.result()
    }
    private def str(): String = {
      expect('"'); val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += s(i)
        i += 1
      }
      i += 1; sb.toString
    }
    def value(): Any = { ws(); s(i) match {
      case '{' => obj()
      case '[' => arr()
      case '"' => str()
      case 't' => i += 4; true
      case 'f' => i += 5; false
      case 'n' => i += 4; null
      case _ =>
        val j = i
        while (i < s.length && "+-.eE0123456789".indexOf(s(i)) >= 0) i += 1
        s.substring(j, i).toDouble
    } }
  }

  // ---- atomic write + rotation + newest-valid load ----

  /** Generation file names match the reference layout
    * (checkpoint_manager.py `_rotate_checkpoints`): primary
    * `checkpoint.json`, backups `checkpoint_1.json` … `checkpoint_<keep>
    * .json` — so tooling that reads the reference's checkpoint directory
    * reads ours unchanged.
    */
  private def path(dir: String, gen: Int): Path =
    Paths.get(dir, if (gen == 0) "checkpoint.json" else s"checkpoint_$gen.json")

  /** Atomic save: write tmp, fsync, rotate older generations, rename into
    * place. `keep` counts BACKUPS (the reference's MAX_BACKUPS): primary +
    * `keep` rotated copies stay on disk (checkpoint_manager.py:161-182).
    */
  /** Pre-rename layout used legacy `checkpoint.<n>.json` backup names;
    * migrate them on the first save so rotation/load keep seeing them. */
  private def migrateLegacy(dir: String, keep: Int): Unit =
    for (g <- 1 to keep) {
      val legacy = Paths.get(dir, s"checkpoint.$g.json")
      if (Files.exists(legacy) && !Files.exists(path(dir, g)))
        Files.move(legacy, path(dir, g))
    }

  def save(dir: String, cp: Checkpoint, keep: Int = 3): Unit = {
    Files.createDirectories(Paths.get(dir))
    migrateLegacy(dir, keep)
    val tmp = Paths.get(dir, "checkpoint.json.tmp")
    val ch = java.nio.channels.FileChannel.open(tmp, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.write(java.nio.ByteBuffer.wrap(render(cp).getBytes(StandardCharsets.UTF_8)))
      ch.force(true) // fsync before rename — a crash must not lose both the
                     // new and (rotated) previous generation
    } finally ch.close()
    // rotate: keep-1 → keep, …, 0 → 1 (oldest backup beyond `keep` falls off)
    for (g <- (keep - 1) to 0 by -1)
      if (Files.exists(path(dir, g)))
        Files.move(path(dir, g), path(dir, g + 1), StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmp, path(dir, 0), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Load the newest parseable checkpoint, falling back over rotated
    * generations (checkpoint_manager.py:107-159).
    */
  def load(dir: String, keep: Int = 3): Option[Checkpoint] =
    ((0 to keep).map(path(dir, _)) ++
      // legacy pre-rename backup names still count as fallback generations
      (1 to keep).map(g => Paths.get(dir, s"checkpoint.$g.json"))).iterator
      .filter(Files.exists(_))
      .flatMap(p => Try(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)).toOption)
      .flatMap(parse)
      .nextOption()

  /** All on-disk generations, newest first (for audits/tests) — including
    * legacy-named backups, which [[load]] also falls back to. */
  def generations(dir: String, keep: Int = 3): Seq[Path] =
    ((0 to keep).map(path(dir, _)) ++
      (1 to keep).map(g => Paths.get(dir, s"checkpoint.$g.json")))
      .filter(Files.exists(_))
}
