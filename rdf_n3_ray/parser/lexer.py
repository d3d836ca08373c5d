"""Tokenizer for N3/Turtle, mirroring the reference's lexical analysis.

Terminal regexes transcribed from /root/reference/lib/rdf/n3/terminals.rb:7-80
and registered in the same order as /root/reference/lib/rdf/n3/reader.rb:180-209
(order matters: first match at the current position wins, as in
EBNF::LL1::Lexer).  Tokens carrying `unescape: true` in the reference
(IRIREF, PNAME_LN, strings, QUICK_VAR_NAME) are unescaped here too.

This is the per-turn hot loop of the parse stage; the compiled pattern
table is module-level so an actor pool shares one compilation per worker
process (SURVEY.md §2.4).
"""
from __future__ import annotations

import re
from typing import NamedTuple

from ..terms import unescape_string

# --- character classes (terminals.rb:7-36) ---------------------------------
U_CHARS1 = (
    "\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF"
    "\u0370-\u037D\u037F-\u1FFF\u200C-\u200D"
    "\u2070-\u218F\u2C00-\u2FEF\u3001-\uD7FF"
    "\uF900-\uFDCF\uFDF0-\uFFFD\U00010000-\U000EFFFF"
)
U_CHARS2 = "\u00B7\u0300-\u036F\u203F-\u2040"

IRI_RANGE = r'[^<>"{}|^`\\\x00-\x20]'
ESCAPE_CHAR4 = r"\\u[0-9A-Fa-f]{4}"
ESCAPE_CHAR8 = r"\\U[0-9A-Fa-f]{8}"
UCHAR = f"(?:{ESCAPE_CHAR4}|{ESCAPE_CHAR8})"
PERCENT = "%[0-9A-Fa-f]{2}"
PN_LOCAL_ESC = r"\\[_~\.\-\!\$&'\(\)\*\+,;=/\?#@%]"
PLX = f"(?:{PERCENT}|{PN_LOCAL_ESC})"
PN_CHARS_BASE = f"[A-Za-z{U_CHARS1}]"
PN_CHARS_U = f"[_A-Za-z{U_CHARS1}]"
PN_CHARS = f"[\\-0-9_A-Za-z{U_CHARS1}{U_CHARS2}]"
PN_LOCAL_BODY = f"(?:(?:[\\.:]|{PN_CHARS}|{PLX})*(?:{PN_CHARS}|:|{PLX}))?"
PN_CHARS_BODY = f"(?:(?:\\.|{PN_CHARS})*{PN_CHARS})?"
PN_PREFIX = f"{PN_CHARS_BASE}{PN_CHARS_BODY}"
PN_LOCAL = f"(?:[0-9:]|{PN_CHARS_U}|{PLX}){PN_LOCAL_BODY}"
EXPONENT = r"[eE][+-]?[0-9]+"
ECHAR = r"\\[tbnrf\\\"']"

# --- terminals (terminals.rb:42-80) ----------------------------------------
IRIREF = f"<(?:{IRI_RANGE}|{UCHAR})*>"
PNAME_NS = f"(?:{PN_PREFIX})?:"
PNAME_LN = f"{PNAME_NS}{PN_LOCAL}"
BLANK_NODE_LABEL = f"_:(?:[0-9]|{PN_CHARS_U})(?:(?:{PN_CHARS}|\\.)*{PN_CHARS})?"
# exclude EXACTLY @is/@has (the is-of/has verb escapes, KWESC below).
# DELIBERATE divergence from the reference here: terminals.rb:51 uses
# a boundary-less lookahead /@(?!(?:is|has))/ that also rejects every
# tag merely STARTING with is/has (@is-IS Icelandic-Iceland, @isl,
# @hash) — legitimate language tags with no grammar conflict (the W3C
# n3.ebnf LANGTAG [145s] has no exclusion at all).  We accept those;
# only the exact verb-escape words are diverted.
LANGTAG = r"@(?!(?:is|has)(?![a-zA-Z0-9-]))(?:[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)"
INTEGER = r"[+-]?[0-9]+"
DECIMAL = r"[+-]?(?:[0-9]*\.[0-9]+)"
DOUBLE = f"[+-]?(?:[0-9]+\\.[0-9]*{EXPONENT}|\\.?[0-9]+{EXPONENT})"
STRING_LITERAL_SINGLE_QUOTE = f"'(?:[^'\\\\\\n\\r]|{ECHAR}|{UCHAR})*'"
STRING_LITERAL_QUOTE = f"\"(?:[^\"\\\\\\n\\r]|{ECHAR}|{UCHAR})*\""
STRING_LITERAL_LONG_SINGLE_QUOTE = (
    f"'''(?:(?:'|'')?(?:[^'\\\\]|{ECHAR}|{UCHAR}))*'''"
)
STRING_LITERAL_LONG_QUOTE = (
    f'"""(?:(?:"|"")?(?:[^"\\\\]|{ECHAR}|{UCHAR}))*"""'
)
IPLSTART = r"\[\s*id(?![\-0-9_A-Za-z])"
PREFIX = r"@?prefix"
BASE = r"@?base"
QUICK_VAR_NAME = f"\\?{PN_LOCAL}"
# Legacy-N3 bareword (cwm `@keywords` mode): a prefixless name token.
# Not in the reference grammar (reader.rb has no production for it) —
# emitted so the parser can either reject it (default, matching the
# reference's error) or resolve it in the default namespace when the
# opt-in `legacy=True` reader option saw an `@keywords` directive.
BAREWORD = PN_PREFIX
WS = r"(?:\s|#[^\n\r]*)+"
ANON = r"\[\s*\]"

# reader.rb:198-205 — single-char & word string terminals, one alternation
STR_TERMINAL = (
    r"[\(\){},.;\[\]a!]"
    r"|\^\^|\^"
    r"|<-|<=|=>|="
    r"|true|false"
    r"|has|is|of"
)

_WORDY = {"a", "true", "false", "has", "is", "of"}
_PN_CONT = re.compile(PN_CHARS)

# (name, pattern, unescape) — exact order of reader.rb:180-209
_TERMINALS: list[tuple[str, str, bool]] = [
    ("ANON", ANON, False),
    ("IPLSTART", IPLSTART, False),
    ("BLANK_NODE_LABEL", BLANK_NODE_LABEL, False),
    ("IRIREF", IRIREF, True),
    ("DOUBLE", DOUBLE, False),
    ("DECIMAL", DECIMAL, False),
    ("INTEGER", INTEGER, False),
    ("PNAME_LN", PNAME_LN, True),
    ("PNAME_NS", PNAME_NS, False),
    ("STRING_LITERAL_LONG_SINGLE_QUOTE", STRING_LITERAL_LONG_SINGLE_QUOTE, True),
    ("STRING_LITERAL_LONG_QUOTE", STRING_LITERAL_LONG_QUOTE, True),
    ("STRING_LITERAL_QUOTE", STRING_LITERAL_QUOTE, True),
    ("STRING_LITERAL_SINGLE_QUOTE", STRING_LITERAL_SINGLE_QUOTE, True),
    ("__STR__", STR_TERMINAL, False),
    ("PREFIX", PREFIX, False),
    ("BASE", BASE, False),
    # cwm keyword escapes: LANGTAG's lookahead excludes @is/@has so a
    # literal's language can never swallow an is-of/has verb; this
    # token gives them an identity of their own (legacy read_verb
    # consumes them, default mode rejects like any stray directive)
    ("KWESC", r"@(?:is|has)(?![a-zA-Z0-9\-])", False),
    ("LANGTAG", LANGTAG, False),
    ("QUICK_VAR_NAME", QUICK_VAR_NAME, True),
    ("BAREWORD", BAREWORD, False),  # last: every real terminal wins first
]

# PREFIX/BASE are case-insensitive in the reference (terminals.rb:71-73 `ui`)
_COMPILED: list[tuple[str, re.Pattern, bool]] = [
    (name, re.compile(pat, re.IGNORECASE if name in ("PREFIX", "BASE") else 0), unesc)
    for name, pat, unesc in _TERMINALS
]
_WS_RE = re.compile(WS)

# --- first-character dispatch ----------------------------------------------
# The reference tries every terminal in order at each position; most
# positions can only start a handful of terminals, so we pre-bucket the
# candidate list by first character (relative order preserved — the
# first-match-wins semantics are unchanged).  Non-ASCII first chars can
# only begin pnames (PN_CHARS_BASE).
_ASCII_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_FIRST_CHARS: dict[str, str] = {
    "ANON": "[",
    "IPLSTART": "[",
    "BLANK_NODE_LABEL": "_",
    "IRIREF": "<",
    "DOUBLE": "0123456789+-.",
    "DECIMAL": "0123456789+-.",
    "INTEGER": "0123456789+-",
    "PNAME_LN": ":" + _ASCII_LETTERS,
    "PNAME_NS": ":" + _ASCII_LETTERS,
    "STRING_LITERAL_LONG_SINGLE_QUOTE": "'",
    "STRING_LITERAL_LONG_QUOTE": '"',
    "STRING_LITERAL_QUOTE": '"',
    "STRING_LITERAL_SINGLE_QUOTE": "'",
    "__STR__": "(){},.;[]a!^<=tfhio",
    "PREFIX": "@pP",
    "BASE": "@bB",
    "KWESC": "@",
    "LANGTAG": "@",
    "QUICK_VAR_NAME": "?",
    "BAREWORD": _ASCII_LETTERS,
}
_DISPATCH: dict[str, list[tuple[str, re.Pattern, bool]]] = {}
for _entry in _COMPILED:
    for _c in _FIRST_CHARS[_entry[0]]:
        _DISPATCH.setdefault(_c, []).append(_entry)
# non-ASCII (unicode pname start) fallback
_UNICODE_CANDIDATES = [
    e for e in _COMPILED if e[0] in ("PNAME_LN", "PNAME_NS", "BAREWORD")
]
_EMPTY: list[tuple[str, re.Pattern, bool]] = []


class Token(NamedTuple):
    type: str | None  # terminal name, or None for string terminals
    value: str
    pos: int


class LexerError(Exception):
    def __init__(self, message: str, pos: int):
        super().__init__(message)
        self.pos = pos


def tokenize(text: str, recover: bool = False) -> tuple[list[Token], list[str]]:
    """Scan the whole document into a token list.

    With ``recover=False`` raises LexerError at the first position where
    no terminal matches (the reference's `validate:` behavior,
    reader.rb:150-156).  With ``recover=True`` the offending character is
    skipped and scanning resumes, mirroring `@lexer.recover`
    (reader.rb:860-867); the skip is recorded in the returned error list.
    """
    tokens: list[Token] = []
    errors: list[str] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _WS_RE.match(text, pos)
        if m:
            pos = m.end()
            if pos >= n:
                break
        matched = False
        c = text[pos]
        candidates = (_DISPATCH.get(c, _EMPTY) if c < "\x80"
                      else _UNICODE_CANDIDATES)
        for name, pat, unesc in candidates:
            m = pat.match(text, pos)
            if not m:
                continue
            value = m.group(0)
            if name == "__STR__":
                # word-like terminals must not be a prefix of a longer name
                if value in _WORDY and m.end() < n and _PN_CONT.match(text, m.end()):
                    continue
                tokens.append(Token(None, value, pos))
            elif name in ("PREFIX", "BASE"):
                # must be followed by non-name char (e.g. not `prefixed`)
                if m.end() < n and _PN_CONT.match(text, m.end()):
                    continue
                tokens.append(Token(name, value, pos))
            else:
                try:
                    if unesc and name != "IRIREF":
                        value = unescape_string(value, strict=not recover)
                    elif name == "IRIREF":
                        value = _unescape_iri(value, strict=not recover)
                except ValueError as e:  # non-scalar \u/\U codepoint
                    raise LexerError(f"{e} at {pos}", pos) from None
                tokens.append(Token(name, value, pos))
            pos = m.end()
            matched = True
            break
        if not matched:
            if not recover:
                raise LexerError(
                    f"no terminal matches at {pos}: {text[pos:pos+20]!r}", pos
                )
            errors.append(f"lexer: skipped {text[pos]!r} at {pos}")
            pos += 1
    return tokens, errors


_UCHAR_RE = re.compile(UCHAR)


def _unescape_iri(value: str, strict: bool = False) -> str:
    """IRIREF unescape: only \\uXXXX / \\UXXXXXXXX forms."""
    from ..terms import _uchar

    if "\\" not in value:
        return value
    return _UCHAR_RE.sub(lambda m: _uchar(m.group(0)[2:], strict), value)
