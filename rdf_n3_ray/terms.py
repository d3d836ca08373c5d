"""Term model: RDF terms encoded as N-Triples-style lexical strings.

The reference (ruby-rdf/rdf-n3) passes rich Ruby objects (RDF::URI,
RDF::Node, RDF::Literal, RDF::Query::Variable) through a callback per
statement (/root/reference/lib/rdf/n3/reader.rb:774-784).  For a columnar
Arrow engine we instead fix ONE sortable, hashable, zero-copy-friendly
encoding: every term is a single string in (extended) N-Triples lexical
form.  Comparison = string equality, which matches the reference's term
equality for ground terms (RDF::Term#==), and the encoding round-trips.

    <http://ex/a>                       IRI
    _:b0                                blank node
    "chat"                              plain literal
    "chat"@fr                           language literal
    "1"^^<http://...#integer>           datatyped literal
    ?x                                  quick variable (universal)

Kind dispatch is the first character: '<', '_', '"', '?'.

Vocabulary IRIs mirror /root/reference/lib/rdf/n3/vocab.rb:5-36.
"""
from __future__ import annotations

# --- namespaces (vocab.rb:5-36, reader.rb:105-117) -------------------------
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
LOG_NS = "http://www.w3.org/2000/10/swap/log#"
MATH_NS = "http://www.w3.org/2000/10/swap/math#"
STR_NS = "http://www.w3.org/2000/10/swap/string#"
TIME_NS = "http://www.w3.org/2000/10/swap/time#"
LIST_NS = "http://www.w3.org/2000/10/swap/list#"
CRYPTO_NS = "http://www.w3.org/2000/10/swap/crypto#"
REI_NS = "http://www.w3.org/2004/06/rei#"

RDF_TYPE = f"<{RDF_NS}type>"
RDF_FIRST = f"<{RDF_NS}first>"
RDF_REST = f"<{RDF_NS}rest>"
RDF_NIL = f"<{RDF_NS}nil>"
OWL_SAMEAS = f"<{OWL_NS}sameAs>"
LOG_IMPLIES = f"<{LOG_NS}implies>"

XSD_INTEGER = f"{XSD_NS}integer"
XSD_DECIMAL = f"{XSD_NS}decimal"
XSD_DOUBLE = f"{XSD_NS}double"
XSD_BOOLEAN = f"{XSD_NS}boolean"
XSD_STRING = f"{XSD_NS}string"
XSD_DATETIME = f"{XSD_NS}dateTime"
XSD_DATE = f"{XSD_NS}date"
XSD_TIME = f"{XSD_NS}time"

# kind tags for the int8 `kind` columns (SURVEY.md §1.1)
KIND_IRI = 0
KIND_BNODE = 1
KIND_LITERAL = 2
KIND_VAR = 3
KIND_LIST = 4  # only in list_terms mode

_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}

_UNESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def iri(value: str) -> str:
    return f"<{value}>"


def bnode(label: str) -> str:
    return f"_:{label}"


def var(name: str) -> str:
    return f"?{name}"


def escape_string(value: str) -> str:
    out = []
    for ch in value:
        out.append(_ESCAPES.get(ch, ch))
    return "".join(out)


def _uchar(hexdigits: str, strict: bool) -> str:
    """UCHAR codepoint -> character.  Codepoints past U+10FFFF and the
    surrogate block are not Unicode scalar values (they cannot be
    UTF-8-encoded, so they would poison every downstream Arrow string
    column); strict mode raises (the reference's Ruby `hex.chr(UTF_8)`
    raises RangeError the same way), recover mode substitutes U+FFFD
    so batch parsing stays total."""
    cp = int(hexdigits, 16)
    if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
        if strict:
            raise ValueError(
                f"\\u escape U+{cp:X} is not a Unicode scalar value")
        return "�"
    return chr(cp)


def unescape_string(value: str, strict: bool = False) -> str:
    """Undo N-Triples string escapes (ECHAR + UCHAR)."""
    if "\\" not in value:
        return value
    out = []
    i, n = 0, len(value)
    while i < n:
        ch = value[i]
        if ch == "\\" and i + 1 < n:
            nxt = value[i + 1]
            if nxt == "u" and i + 6 <= n:
                out.append(_uchar(value[i + 2:i + 6], strict))
                i += 6
                continue
            if nxt == "U" and i + 10 <= n:
                out.append(_uchar(value[i + 2:i + 10], strict))
                i += 10
                continue
            if nxt in _UNESCAPES:
                out.append(_UNESCAPES[nxt])
                i += 2
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def literal(value: str, datatype: str | None = None, lang: str | None = None) -> str:
    """Build the N-Triples encoding of a literal.

    `value` is the (already unescaped) lexical form; mirrors
    reader.rb:812-822 `literal` (we keep lexical forms verbatim, like the
    reference does when `canonicalize` is off).
    """
    enc = f'"{escape_string(value)}"'
    if lang:
        return f"{enc}@{lang}"
    if datatype and datatype != XSD_STRING:
        return f"{enc}^^<{datatype}>"
    return enc


def kind_of(term: str) -> int:
    c = term[0] if term else ""
    if c == "<":
        return KIND_IRI
    if c == "_":
        return KIND_BNODE
    if c == '"':
        return KIND_LITERAL
    if c == "?":
        return KIND_VAR
    if c == "(":
        return KIND_LIST
    return KIND_LITERAL


def is_iri(term: str) -> bool:
    return term.startswith("<")


def is_bnode(term: str) -> bool:
    return term.startswith("_:")


def is_literal(term: str) -> bool:
    return term.startswith('"')


def is_var(term: str) -> bool:
    return term.startswith("?")


def iri_value(term: str) -> str:
    return term[1:-1]


def bnode_label(term: str) -> str:
    return term[2:]


def var_name(term: str) -> str:
    return term[1:]


def literal_parts(term: str) -> tuple[str, str | None, str | None]:
    """Split a literal term into (value, datatype, lang).

    The value returned is the unescaped string value.
    """
    if not term.startswith('"'):
        raise ValueError(f"not a literal: {term!r}")
    # find closing quote, honoring escapes
    i = 1
    n = len(term)
    while i < n:
        c = term[i]
        if c == "\\":
            i += 2
            continue
        if c == '"':
            break
        i += 1
    value = unescape_string(term[1:i])
    rest = term[i + 1:]
    if rest.startswith("@"):
        return value, None, rest[1:]
    if rest.startswith("^^<"):
        return value, rest[3:-1], None
    return value, None, None


def literal_value(term: str) -> str:
    return literal_parts(term)[0]


def datatype_of(term: str) -> str | None:
    return literal_parts(term)[1]


def encode_list(elements: list) -> str:
    """Encode a first-class list term (list_terms mode): `(a b (c))`."""
    parts = [encode_list(e) if isinstance(e, list) else e for e in elements]
    return "(" + " ".join(parts) + ")"


def is_list_term(term: str) -> bool:
    return term.startswith("(")


def parse_list_term(term: str):
    """Decode a `( ... )` list term into a (possibly nested) python list
    of term strings; returns None if not a list term."""
    if not term.startswith("("):
        return None
    pos = 1

    def parse_elems(pos: int) -> tuple[list, int]:
        out = []
        n = len(term)
        while pos < n:
            c = term[pos]
            if c == " ":
                pos += 1
            elif c == ")":
                return out, pos + 1
            elif c == "(":
                inner, pos = parse_elems(pos + 1)
                out.append(inner)
            else:
                start = pos
                in_str = False
                while pos < n:
                    ch = term[pos]
                    if in_str:
                        if ch == "\\":
                            pos += 2
                            continue
                        if ch == '"':
                            in_str = False
                    elif ch == '"':
                        in_str = True
                    elif ch in " )":
                        break
                    pos += 1
                out.append(term[start:pos])
        return out, pos

    elems, _ = parse_elems(pos)
    return elems


def ruby_succ(s: str) -> str:
    """Ruby String#succ for the label shapes we use ("b0" -> "b1" ...
    "b9" -> "b10", "az" -> "ba").  Mirrors the reference's incrementing
    bnode labeler (reader.rb:743-758) and formula uniquifier
    (reader.rb:835-839 `unique_label`).
    """
    chars = list(s)
    i = len(chars) - 1
    carry = True
    rightmost_alnum = None
    while i >= 0 and carry:
        c = chars[i]
        if c.isdigit():
            rightmost_alnum = i
            if c == "9":
                chars[i] = "0"
            else:
                chars[i] = chr(ord(c) + 1)
                carry = False
        elif "a" <= c <= "z":
            rightmost_alnum = i
            if c == "z":
                chars[i] = "a"
            else:
                chars[i] = chr(ord(c) + 1)
                carry = False
        elif "A" <= c <= "Z":
            rightmost_alnum = i
            if c == "Z":
                chars[i] = "A"
            else:
                chars[i] = chr(ord(c) + 1)
                carry = False
        else:
            # non-alnum: only increments if there are no alnums at all
            break
        i -= 1
    if carry:
        if rightmost_alnum is None:
            # pure punctuation string: Ruby bumps last char; we don't need it
            return s + "1"
        lead = chars[i + 1] if i + 1 < len(chars) else "1"
        insert = "1" if lead.isdigit() else ("a" if lead.islower() else "A")
        chars.insert(i + 1, insert)
    return "".join(chars)


# --- canonical lexical forms (reader `canonicalize: true` option) ----------
# Behavior pinned to /root/reference/spec/reader_spec.rb:1295-1346 (RDF.rb
# Literal/URI #canonicalize): integers drop sign/leading zeros, decimals get
# a digit on both sides of the dot, doubles become mantissa-in-[1,10) E
# notation, booleans map to true/false, IRIs get RFC3986-ish cleanup.

def canonical_integer(lex: str) -> str:
    try:
        return str(int(lex))
    except ValueError:
        return lex


def canonical_decimal(lex: str) -> str:
    from decimal import Decimal, InvalidOperation

    try:
        d = Decimal(lex)
    except InvalidOperation:
        return lex
    s = format(d, "f")
    if "." not in s:
        s += ".0"
    int_part, _, frac = s.partition(".")
    frac = frac.rstrip("0") or "0"
    if int_part in ("", "-", "+"):
        int_part += "0"
    if int_part.startswith("+"):
        int_part = int_part[1:]
    int_part2 = int_part.lstrip("-").lstrip("0") or "0"
    sign = "-" if int_part.startswith("-") and (int_part2 != "0" or frac != "0") else ""
    return f"{sign}{int_part2}.{frac}"


def canonical_double(lex: str) -> str:
    try:
        f = float(lex)
    except ValueError:
        return lex
    if f != f or f in (float("inf"), float("-inf")):
        return lex
    if f == 0.0:
        return "-0.0E0" if str(f).startswith("-") else "0.0E0"
    # shortest round-trip digits (repr), normalized to mantissa in
    # [1, 10).  The old f"{f:E}" path silently rounded to 6 significant
    # digits — tan(pi/4) = 0.9999999999999999 became "1.0E0", flipping
    # downstream math:lessThan comparisons.
    from decimal import Decimal

    sign, digits, dexp = Decimal(repr(f)).as_tuple()
    ds = "".join(map(str, digits)).rstrip("0") or "0"
    exp10 = len(digits) - 1 + dexp
    mant = ds[0] + "." + (ds[1:] or "0")
    return f"{'-' if sign else ''}{mant}E{exp10}"


def canonical_boolean(lex: str) -> str:
    low = lex.lower()
    if low in ("true", "1"):
        return "true"
    if low in ("false", "0"):
        return "false"
    return lex


def canonical_iri_value(value: str) -> str:
    """URI cleanup per the reference spec table: empty path -> '/',
    duplicate path slashes collapsed, '#' inside fragments
    percent-encoded, lowercase scheme/host."""
    import re as _re
    from urllib.parse import urlsplit, urlunsplit

    try:
        parts = urlsplit(value)
    except ValueError:
        return value
    if not parts.scheme:
        return value
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    path = parts.path
    if netloc and not path:
        path = "/"
    if netloc:
        path = _re.sub(r"/{2,}", "/", path)
    fragment = parts.fragment.replace("#", "%23")
    out = urlunsplit((scheme, netloc, path, parts.query, fragment))
    # urlunsplit drops a bare trailing '#'; the reference keeps it
    if value.endswith("#") and not out.endswith("#"):
        out += "#"
    return out
