"""SQL lexer: the token stream under the statement parser.

The reference front-end is a hand-written lexer + recursive-descent parser
(reference src/sql-lexer/src/lexer.rs, src/sql-parser/src/parser.rs:140).
This is the same design in miniature: one linear scan producing typed
tokens, so everything downstream (statement parsing, paren matching,
statement splitting) is defined over tokens — string literals, quoted
identifiers, and comments can never confuse structural analysis the way
they can confuse regexes over raw text.

Token kinds:

| kind    | example                  | notes                                |
|---------|--------------------------|--------------------------------------|
| WORD    | ``SELECT``, ``lineitem`` | unquoted identifier or keyword       |
| QIDENT  | ``"Weird Name"``         | ``""`` escapes a quote               |
| STRING  | ``'it''s'``              | ``''`` escapes a quote               |
| NUMBER  | ``12``, ``3.5``, ``1e-2``| no leading sign (that's an OP)       |
| PARAM   | ``$1``                   | prepared-statement placeholder       |
| OP      | ``::``, ``->>``, ``<=``  | longest-match operators              |
| LP / RP | ``(`` / ``)``            |                                      |
| COMMA   | ``,``                    |                                      |
| SEMI    | ``;``                    | statement separator                  |

Comments (``-- ...`` to end of line, nested ``/* ... */`` like PG) are
skipped entirely and never produce tokens.
"""

from __future__ import annotations

from typing import NamedTuple


class LexError(ValueError):
    def __init__(self, msg: str, pos: int):
        super().__init__(f"{msg} at position {pos}")
        self.pos = pos


class Token(NamedTuple):
    kind: str
    text: str   # raw source span, quotes included for STRING/QIDENT
    start: int
    end: int

    @property
    def upper(self) -> str:
        """Case-folded text — keyword matching is case-insensitive."""
        return self.text.upper()

    @property
    def value(self) -> str:
        """The semantic value: unquoted/unescaped for STRING and QIDENT."""
        if self.kind == "STRING":
            return self.text[1:-1].replace("''", "'")
        if self.kind == "QIDENT":
            return self.text[1:-1].replace('""', '"')
        return self.text


# Multi-char operators, longest first so maximal munch works. Includes the
# PG-isms the dialect rewriter understands (reference src/sql-lexer's
# operator set): casts (::), json arrows (-> ->>), LIKE/regex families
# (~~* !~~* ~ !~), comparisons, string concat (||).
_OPERATORS = (
    "!~~*", "!~~", "~~*", "~~", "!~*", "!~", "~*",
    "->>", "->", "#>>", "#>", "=>", "::",
    "<=", ">=", "<>", "!=", "||", "<<", ">>", "@>", "<@",
    "+", "-", "*", "/", "%", "<", ">", "=", "~", "!", "?", "@", "#",
    "&", "|", "^", ".", "[", "]", ":",
)

_WORD_START = set("abcdefghijklmnopqrstuvwxyz"
                  "ABCDEFGHIJKLMNOPQRSTUVWXYZ_")
_WORD_CONT = _WORD_START | set("0123456789$")
_DIGITS = set("0123456789")


def tokens(sql: str, lenient: bool = False) -> list[Token]:
    """Tokenize one statement (or script) — always ends with an EOF token.

    ``lenient=True`` turns unknown characters into single-char OP tokens
    instead of raising — for consumers (the dialect rewriter) that must
    pass anything they don't understand through to Catalyst verbatim.
    Unterminated strings/comments still raise in both modes."""
    out: list[Token] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in " \t\r\n":
            i += 1
            continue
        if ch == "-" and sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if ch == "/" and sql.startswith("/*", i):
            depth, j = 1, i + 2
            while j < n and depth:
                if sql.startswith("/*", j):
                    depth += 1
                    j += 2
                elif sql.startswith("*/", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            if depth:
                raise LexError("unterminated /* comment", i)
            i = j
            continue
        if ch == "'":
            j = i + 1
            while True:
                j = sql.find("'", j)
                if j < 0:
                    raise LexError("unterminated string literal", i)
                if j + 1 < n and sql[j + 1] == "'":  # '' escape
                    j += 2
                    continue
                break
            out.append(Token("STRING", sql[i:j + 1], i, j + 1))
            i = j + 1
            continue
        if ch in '"`':   # PG-style and Spark-style quoted identifiers
            j = i + 1
            while True:
                j = sql.find(ch, j)
                if j < 0:
                    raise LexError("unterminated quoted identifier", i)
                if j + 1 < n and sql[j + 1] == ch:
                    j += 2
                    continue
                break
            out.append(Token("QIDENT", sql[i:j + 1], i, j + 1))
            i = j + 1
            continue
        if ch in _DIGITS or (ch == "." and i + 1 < n and sql[i + 1] in _DIGITS):
            j = i
            while j < n and sql[j] in _DIGITS:
                j += 1
            if j < n and sql[j] == ".":
                j += 1
                while j < n and sql[j] in _DIGITS:
                    j += 1
            if j < n and sql[j] in "eE":
                k = j + 1
                if k < n and sql[k] in "+-":
                    k += 1
                if k < n and sql[k] in _DIGITS:
                    j = k
                    while j < n and sql[j] in _DIGITS:
                        j += 1
            out.append(Token("NUMBER", sql[i:j], i, j))
            i = j
            continue
        if ch in _WORD_START:
            j = i + 1
            while j < n and sql[j] in _WORD_CONT:
                j += 1
            out.append(Token("WORD", sql[i:j], i, j))
            i = j
            continue
        if ch == "$":
            j = i + 1
            while j < n and sql[j] in _DIGITS:
                j += 1
            if j == i + 1:
                raise LexError("stray '$'", i)
            out.append(Token("PARAM", sql[i:j], i, j))
            i = j
            continue
        if ch == "(":
            out.append(Token("LP", "(", i, i + 1))
            i += 1
            continue
        if ch == ")":
            out.append(Token("RP", ")", i, i + 1))
            i += 1
            continue
        if ch == ",":
            out.append(Token("COMMA", ",", i, i + 1))
            i += 1
            continue
        if ch == ";":
            out.append(Token("SEMI", ";", i, i + 1))
            i += 1
            continue
        for op in _OPERATORS:
            if sql.startswith(op, i):
                out.append(Token("OP", op, i, i + len(op)))
                i += len(op)
                break
        else:
            if not lenient:
                raise LexError(f"unexpected character {ch!r}", i)
            out.append(Token("OP", ch, i, i + 1))
            i += 1
    out.append(Token("EOF", "", n, n))
    return out


def split_statements(script: str) -> list[str]:
    """Split a script on top-level ``;`` — token-aware, so semicolons in
    string literals, comments, and quoted identifiers never split."""
    parts: list[str] = []
    depth = 0
    first = last = None   # token span of the statement being accumulated
    for t in tokens(script):
        if t.kind == "LP":
            depth += 1
        elif t.kind == "RP":
            depth -= 1
        if (t.kind == "SEMI" and depth == 0) or t.kind == "EOF":
            if first is not None:
                parts.append(script[first:last])
            first = last = None
            continue
        if first is None:
            first = t.start
        last = t.end
    return parts
