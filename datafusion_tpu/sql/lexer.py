"""SQL tokenizer.

Replaces the forked sqlparser-rs tokenizer used by the reference
(/root/reference/datafusion/src/sql/parser.rs wraps cube-js/sqlparser-rs).
Postgres-flavored: case-insensitive keywords, '...' strings with '' escapes,
"..." quoted identifiers, --/**/ comments, numeric literals with exponents.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..errors import ParserError


@dataclass
class Token:
    kind: str  # 'ident' | 'quoted_ident' | 'number' | 'string' | 'op' | 'eof'
    value: str
    pos: int

    def __repr__(self):
        return f"{self.kind}:{self.value}"


_OPS = [
    "<>",
    "!=",
    ">=",
    "<=",
    "||",
    "::",
    "->>",
    "->",
    "=",
    "<",
    ">",
    "+",
    "-",
    "*",
    "/",
    "%",
    "(",
    ")",
    ",",
    ".",
    ";",
    "@",
]


def tokenize(sql: str) -> list[Token]:
    tokens: list[Token] = []
    i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            i += 1
            continue
        if sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if sql.startswith("/*", i):
            j = sql.find("*/", i)
            if j < 0:
                raise ParserError("unterminated block comment")
            i = j + 2
            continue
        if c == "'":
            j = i + 1
            buf = []
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            if j >= n:
                raise ParserError("unterminated string literal")
            tokens.append(Token("string", "".join(buf), i))
            i = j + 1
            continue
        if c == '"':
            j = sql.find('"', i + 1)
            if j < 0:
                raise ParserError("unterminated quoted identifier")
            tokens.append(Token("quoted_ident", sql[i + 1 : j], i))
            i = j + 1
            continue
        if c == "`":
            j = sql.find("`", i + 1)
            if j < 0:
                raise ParserError("unterminated quoted identifier")
            tokens.append(Token("quoted_ident", sql[i + 1 : j], i))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            seen_dot = False
            seen_e = False
            while j < n:
                ch = sql[j]
                if ch.isdigit():
                    j += 1
                elif ch == "." and not seen_dot and not seen_e:
                    seen_dot = True
                    j += 1
                elif ch in "eE" and not seen_e and j > i:
                    if j + 1 < n and (sql[j + 1].isdigit() or sql[j + 1] in "+-"):
                        seen_e = True
                        j += 2 if sql[j + 1] in "+-" else 1
                    else:
                        break
                else:
                    break
            tokens.append(Token("number", sql[i:j], i))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            tokens.append(Token("ident", sql[i:j].lower(), i))
            i = j
            continue
        matched = False
        for op in _OPS:
            if sql.startswith(op, i):
                tokens.append(Token("op", op, i))
                i += len(op)
                matched = True
                break
        if not matched:
            raise ParserError(f"unexpected character {c!r} at position {i}")
    tokens.append(Token("eof", "", n))
    return tokens
