package graft.core

/** ASCII whitespace, spelled as an explicit class instead of `\s`.
  *
  * Java regex `\s` is `[ \t\n\x0B\f\r]` while RE2 (DuckDB's engine) reads
  * `\s` as `[ \t\n\f\r]` — the two disagree on vertical tab U+000B, so any
  * oracle-compared tokenizer written as `\s+` carries a latent divergence
  * on text containing U+000B (untested by the ASCII synthetic corpus, but
  * a real portability hole). Spelling the class out pins BOTH engines to
  * the same five code points; U+000B is whitespace on neither side.
  *
  * The same string works verbatim in both dialects: Java and RE2 each
  * interpret `\t`/`\n`/`\f`/`\r` escapes inside a class identically. Use
  * [[Plus]] from Scala code; oracle SQL spells the class literally (the
  * triple-quoted SQL strings are raw, so the backslashes reach RE2).
  */
object Ws {
  /** `[ \t\n\f\r]` — one ASCII whitespace char, both dialects. */
  val Cls: String = "[ \\t\\n\\f\\r]"

  /** `[ \t\n\f\r]+` — an ASCII whitespace run (the tokenizer separator). */
  val Plus: String = Cls + "+"

  /** Negated-class fragment to splice into `[^...]` character classes,
    * e.g. `s"[^A-Za-z0-9$InClass]+"` for q47's punctuation-run branch.
    */
  val InClass: String = " \\t\\n\\f\\r"
}
