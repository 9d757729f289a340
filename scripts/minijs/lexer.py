"""minijs lexer: source text -> token stream.

Regex vs division and template literals make JS lexing context
dependent; the lexer tracks the previous significant token to decide,
and tokenizes template literals into (TEMPLATE, [str parts], [expr
sources]) so the parser can sub-parse the interpolations."""

from __future__ import annotations

import re

KEYWORDS = {
    "var", "let", "const", "function", "return", "if", "else", "for",
    "while", "do", "break", "continue", "new", "delete", "typeof",
    "instanceof", "in", "of", "try", "catch", "finally", "throw",
    "switch", "case", "default", "null", "true", "false", "undefined",
    "this", "async", "await", "void", "class",
}

PUNCT = [
    "...", "=>", "===", "!==", "==", "!=", "<<=", ">>=", "**=",
    "&&=", "||=", "<=", ">=", "&&", "||", "++", "--", "+=", "-=",
    "*=", "/=", "%=", "&=", "|=", "^=", "**", "<<", ">>",
    "{", "}", "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*",
    "/", "%", "&", "|", "^", "!", "~", "?", ":", "=", ".",
]
_PUNCT_RE = re.compile("|".join(re.escape(p) for p in PUNCT))
_ID_RE = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_NUM_RE = re.compile(
    r"0[xX][0-9a-fA-F]+|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")
_WS_RE = re.compile(r"[ \t\r]+")


class Token:
    __slots__ = ("kind", "value", "line", "nl_before")

    def __init__(self, kind, value, line, nl_before=False):
        self.kind = kind          # id kw num str template regex punct eof
        self.value = value
        self.line = line
        self.nl_before = nl_before

    def __repr__(self):
        return f"<{self.kind} {self.value!r} L{self.line}>"


class LexError(SyntaxError):
    pass


def _scan_string(src, i, line):
    quote = src[i]
    out = []
    i += 1
    while i < len(src):
        c = src[i]
        if c == "\\":
            nxt = src[i + 1]
            out.append(_ESCAPES.get(nxt))
            if out[-1] is None:
                if nxt == "u":
                    if src[i + 2] == "{":
                        j = src.index("}", i + 3)
                        out[-1] = chr(int(src[i + 3:j], 16))
                        i = j + 1
                        continue
                    out[-1] = chr(int(src[i + 2:i + 6], 16))
                    i += 6
                    continue
                if nxt == "x":
                    out[-1] = chr(int(src[i + 2:i + 4], 16))
                    i += 4
                    continue
                out[-1] = nxt
            i += 2
            continue
        if c == quote:
            return "".join(out), i + 1, line
        if c == "\n":
            raise LexError(f"line {line}: unterminated string")
        out.append(c)
        i += 1
    raise LexError(f"line {line}: unterminated string")


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            "v": "\v", "0": "\0", "\n": ""}


def _scan_template(src, i, line):
    """`...${expr}...` -> (strings, expr_sources, next_i, line)."""
    assert src[i] == "`"
    i += 1
    strings, exprs = [], []
    cur = []
    while i < len(src):
        c = src[i]
        if c == "\\":
            nxt = src[i + 1]
            esc = _ESCAPES.get(nxt)
            if esc is None:
                if nxt == "u":
                    if src[i + 2] == "{":
                        j = src.index("}", i + 3)
                        cur.append(chr(int(src[i + 3:j], 16)))
                        i = j + 1
                        continue
                    cur.append(chr(int(src[i + 2:i + 6], 16)))
                    i += 6
                    continue
                esc = nxt
            cur.append(esc)
            i += 2
            continue
        if c == "`":
            strings.append("".join(cur))
            return strings, exprs, i + 1, line
        if c == "$" and i + 1 < len(src) and src[i + 1] == "{":
            strings.append("".join(cur))
            cur = []
            depth = 1
            j = i + 2
            start = j
            while j < len(src) and depth:
                ch = src[j]
                if ch in "'\"":
                    _, j, line = _scan_string(src, j, line)
                    continue
                if ch == "`":
                    _, _, j, line = _scan_template(src, j, line)
                    continue
                if ch == "{":
                    depth += 1
                elif ch == "}":
                    depth -= 1
                    if not depth:
                        break
                elif ch == "\n":
                    line += 1
                j += 1
            if depth:
                raise LexError(f"line {line}: unterminated ${{}} in template")
            exprs.append(src[start:j])
            i = j + 1
            continue
        if c == "\n":
            line += 1
        cur.append(c)
        i += 1
    raise LexError(f"line {line}: unterminated template literal")


_REGEX_ALLOWED_AFTER = {
    None, "(", "[", "{", ",", ";", ":", "=>", "=", "+", "-", "*", "/",
    "%", "!", "&", "|", "^", "?", "<", ">", "==", "===", "!=", "!==",
    "<=", ">=", "&&", "||", "return", "typeof", "in", "of", "new",
    "throw", "case", "delete", "void", "await",
}


def tokenize(src: str):
    tokens = []
    i = 0
    line = 1
    nl_pending = False
    prev = None   # previous significant token value (for regex decision)
    n = len(src)
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            nl_pending = True
            continue
        m = _WS_RE.match(src, i)
        if m:
            i = m.end()
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i)
            if j < 0:
                raise LexError(f"line {line}: unterminated comment")
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c in "'\"":
            val, i, line = _scan_string(src, i, line)
            tokens.append(Token("str", val, line, nl_pending))
            nl_pending = False
            prev = "str"
            continue
        if c == "`":
            strings, exprs, i, line = _scan_template(src, i, line)
            tokens.append(Token("template", (strings, exprs), line,
                                nl_pending))
            nl_pending = False
            prev = "str"
            continue
        if c == "/" and prev in _REGEX_ALLOWED_AFTER:
            # regex literal
            j = i + 1
            in_class = False
            while j < n:
                ch = src[j]
                if ch == "\\":
                    j += 2
                    continue
                if ch == "[":
                    in_class = True
                elif ch == "]":
                    in_class = False
                elif ch == "/" and not in_class:
                    break
                elif ch == "\n":
                    raise LexError(f"line {line}: unterminated regex")
                j += 1
            if j >= n:
                raise LexError(f"line {line}: unterminated regex")
            body = src[i + 1:j]
            k = j + 1
            while k < n and src[k] in "gimsuy":
                k += 1
            flags = src[j + 1:k]
            tokens.append(Token("regex", (body, flags), line, nl_pending))
            nl_pending = False
            prev = "regex"
            i = k
            continue
        m = _NUM_RE.match(src, i)
        if m and (c.isdigit() or (c == "." and i + 1 < n
                                  and src[i + 1].isdigit())):
            text = m.group(0)
            val = (int(text, 16) if text[:2].lower() == "0x"
                   else float(text))
            tokens.append(Token("num", val, line, nl_pending))
            nl_pending = False
            prev = "num"
            i = m.end()
            continue
        m = _ID_RE.match(src, i)
        if m:
            word = m.group(0)
            kind = "kw" if word in KEYWORDS else "id"
            tokens.append(Token(kind, word, line, nl_pending))
            nl_pending = False
            prev = word if kind == "kw" else "id"
            i = m.end()
            continue
        m = _PUNCT_RE.match(src, i)
        if m:
            p = m.group(0)
            tokens.append(Token("punct", p, line, nl_pending))
            nl_pending = False
            prev = p
            i = m.end()
            continue
        raise LexError(f"line {line}: unexpected character {c!r}")
    tokens.append(Token("eof", None, line, nl_pending))
    return tokens
