"""Tokenizer for the supported openCypher subset.

Keywords are case-insensitive; identifiers are case-sensitive (openCypher
spec). Backtick-quoted identifiers supported. Strings use single or double
quotes with backslash escapes.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..exceptions import TranspilerSyntaxError

KEYWORDS = {
    "MATCH",
    "OPTIONAL",
    "WHERE",
    "WITH",
    "RETURN",
    "DISTINCT",
    "ORDER",
    "BY",
    "ASC",
    "ASCENDING",
    "DESC",
    "DESCENDING",
    "LIMIT",
    "SKIP",
    "UNION",
    "ALL",
    "AND",
    "OR",
    "XOR",
    "NOT",
    "IN",
    "STARTS",
    "ENDS",
    "CONTAINS",
    "IS",
    "NULL",
    "TRUE",
    "FALSE",
    "CASE",
    "WHEN",
    "THEN",
    "ELSE",
    "END",
    "AS",
    "UNWIND",
    # recognized-to-reject (reference scope fence, SURVEY.md §2.7)
    "CREATE",
    "MERGE",
    "SET",
    "DELETE",
    "DETACH",
    "REMOVE",
    "CALL",
    "EXISTS",
}

PUNCT = [
    "<=",
    ">=",
    "<>",
    "=~",
    "(",
    ")",
    "[",
    "]",
    "{",
    "}",
    ",",
    ".",
    ":",
    ";",
    "+",
    "-",
    "*",
    "/",
    "%",
    "^",
    "=",
    "<",
    ">",
    "|",
    "$",
]


@dataclass
class Token:
    kind: str  # 'kw' | 'ident' | 'int' | 'float' | 'string' | 'punct' | 'eof'
    value: str | int | float
    pos: int

    def is_kw(self, *names: str) -> bool:
        return self.kind == "kw" and self.value in names

    def is_punct(self, *vals: str) -> bool:
        return self.kind == "punct" and self.value in vals


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "/" and text[i : i + 2] == "//":  # line comment
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "/" and text[i : i + 2] == "/*":
            j = text.find("*/", i + 2)
            if j < 0:
                raise TranspilerSyntaxError(f"Unterminated comment at {i}")
            i = j + 2
            continue
        # string literal
        if c in ("'", '"'):
            quote, j, buf = c, i + 1, []
            while j < n:
                ch = text[j]
                if ch == "\\" and j + 1 < n:
                    nxt = text[j + 1]
                    buf.append(
                        {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"'}.get(
                            nxt, nxt
                        )
                    )
                    j += 2
                    continue
                if ch == quote:
                    break
                buf.append(ch)
                j += 1
            else:
                raise TranspilerSyntaxError(f"Unterminated string literal at {i}")
            if j >= n or text[j] != quote:
                raise TranspilerSyntaxError(f"Unterminated string literal at {i}")
            tokens.append(Token("string", "".join(buf), i))
            i = j + 1
            continue
        # number (a leading digit is required: '.5' would make the '..'
        # range punctuation in '*1..2' ambiguous — write '0.5')
        if c.isdigit():
            j = i
            is_float = False
            while j < n and text[j].isdigit():
                j += 1
            if j < n and text[j] == "." and j + 1 < n and text[j + 1].isdigit():
                is_float = True
                j += 1
                while j < n and text[j].isdigit():
                    j += 1
            if j < n and text[j] in "eE":
                k = j + 1
                if k < n and text[k] in "+-":
                    k += 1
                if k < n and text[k].isdigit():
                    is_float = True
                    j = k
                    while j < n and text[j].isdigit():
                        j += 1
            raw = text[i:j]
            tokens.append(
                Token("float", float(raw), i) if is_float else Token("int", int(raw), i)
            )
            i = j
            continue
        # backtick identifier
        if c == "`":
            j = text.find("`", i + 1)
            if j < 0:
                raise TranspilerSyntaxError(f"Unterminated backtick identifier at {i}")
            tokens.append(Token("ident", text[i + 1 : j], i))
            i = j + 1
            continue
        # identifier / keyword
        if c.isalpha() or c == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j]
            upper = word.upper()
            if upper in KEYWORDS:
                tokens.append(Token("kw", upper, i))
            else:
                tokens.append(Token("ident", word, i))
            i = j
            continue
        # punctuation (longest match first)
        for p in PUNCT:
            if text.startswith(p, i):
                tokens.append(Token("punct", p, i))
                i += len(p)
                break
        else:
            raise TranspilerSyntaxError(f"Unexpected character {c!r} at position {i}")
    tokens.append(Token("eof", "", n))
    return tokens
