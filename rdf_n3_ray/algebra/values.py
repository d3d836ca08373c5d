"""Literal value coercion for builtin evaluation.

Mirrors the reference's extensions (/root/reference/lib/rdf/n3/extensions.rb:87-113):
``as_number`` regex-dispatches the lexical value to Double/Decimal/Integer
(else literal 0), ``as_datetime`` pads YYYY / YYYY-MM to full dates.
Python value domain: int | Decimal | float; datetimes as
``datetime.datetime``.
"""
from __future__ import annotations

import math
import re
from datetime import datetime, timedelta, timezone
from decimal import Decimal

from .. import terms as T

_INT_RE = re.compile(r"^[+-]?[0-9]+$")
_DECIMAL_RE = re.compile(r"^[+-]?(?:[0-9]*\.[0-9]+)$")
_DOUBLE_RE = re.compile(r"^[+-]?(?:[0-9]+\.[0-9]*[eE][+-]?[0-9]+|\.?[0-9]+[eE][+-]?[0-9]+)$")

_NUMERIC_DT = {T.XSD_INTEGER, T.XSD_DECIMAL, T.XSD_DOUBLE}


def as_number(term: str):
    """Numeric value of a literal term (int/Decimal/float), else 0."""
    if not T.is_literal(term):
        return 0
    value, dt, _ = T.literal_parts(term)
    try:
        if dt == T.XSD_INTEGER or (dt and dt.endswith(("int", "long", "short", "byte"))):
            return int(value)
        if dt == T.XSD_DECIMAL:
            return Decimal(value)
        if dt in (T.XSD_DOUBLE, T.XSD_NS + "float"):
            return float(value)
        if _DOUBLE_RE.match(value):
            return float(value)
        if _DECIMAL_RE.match(value):
            return Decimal(value)
        if _INT_RE.match(value):
            return int(value)
    except (ValueError, ArithmeticError):
        return 0
    return 0


def is_numeric_literal(term: str) -> bool:
    if not T.is_literal(term):
        return False
    value, dt, _ = T.literal_parts(term)
    if dt in _NUMERIC_DT:
        return True
    return bool(_INT_RE.match(value) or _DECIMAL_RE.match(value) or _DOUBLE_RE.match(value))


def _canonical_double(f: float) -> str:
    """xsd:double canonical form (8.0E0 style), VALUE-EXACT: delegates
    to terms.canonical_double's shortest-round-trip digits.  The old
    f"{f:E}" copy here rounded builtin results to 6 significant digits
    (tan(pi/4) -> "1.0E0"), corrupting downstream comparisons."""
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "INF" if f > 0 else "-INF"
    return T.canonical_double(repr(f))


def from_number(value) -> str:
    """Python number -> literal term with matching XSD datatype."""
    if isinstance(value, bool):
        return T.literal("true" if value else "false", datatype=T.XSD_BOOLEAN)
    if isinstance(value, int):
        return T.literal(str(value), datatype=T.XSD_INTEGER)
    if isinstance(value, Decimal):
        if value == value.to_integral_value():
            # int() avoids Decimal.quantize's InvalidOperation when the
            # magnitude exceeds the 28-digit default context
            return T.literal(f"{int(value)}.0", datatype=T.XSD_DECIMAL)
        # 'f' formatting: normalize() can yield exponent form (1E-7),
        # which is outside xsd:decimal's lexical space
        lex = format(value.normalize(), "f")
        return T.literal(lex, datatype=T.XSD_DECIMAL)
    if isinstance(value, float):
        return T.literal(_canonical_double(value), datatype=T.XSD_DOUBLE)
    raise TypeError(f"not a number: {value!r}")


def xpath_string(term: str) -> str:
    """XPath/SPARQL xs:string cast of a term's VALUE — what
    `SPARQL::Algebra::Expression.cast(RDF::XSD.string, o)` does in the
    reference (str/concatenation.rb:21, log/output_string.rb:16):
    integers/decimals/doubles render their canonical value ("01"->"1",
    0.0->"0", 1.23E3->"1230"; scientific notation only outside the
    XPath [1e-6, 1e6) window), booleans normalize to true/false.
    Invalid lexicals and other datatypes keep their raw string form."""
    if not (isinstance(term, str) and T.is_literal(term)):
        return string_value(term)
    value, dt, _lang = T.literal_parts(term)
    try:
        if dt == T.XSD_INTEGER:
            return str(int(value))
        if dt == T.XSD_BOOLEAN:
            if value in ("true", "1"):
                return "true"
            if value in ("false", "0"):
                return "false"
            return value
        if dt == T.XSD_DECIMAL:
            s = format(Decimal(value), "f")
            if "." in s:
                s = s.rstrip("0").rstrip(".")
            return s if s not in ("", "-") else "0"
        if dt in (T.XSD_DOUBLE, _XSD_FLOAT):
            f = float(value)
            if math.isnan(f):
                return "NaN"
            if math.isinf(f):
                return "INF" if f > 0 else "-INF"
            if f == 0.0:
                return "0"
            if 1e-6 <= abs(f) < 1e6:
                s = format(Decimal(repr(f)), "f")
                if "." in s:
                    s = s.rstrip("0").rstrip(".")
                return s
            return T.canonical_double(repr(f))
    except (ValueError, ArithmeticError):
        pass
    return value


_XSD_FLOAT = T.XSD_NS + "float"


def from_bool(b: bool) -> str:
    return T.literal("true" if b else "false", datatype=T.XSD_BOOLEAN)


TRUE = from_bool(True)
FALSE = from_bool(False)


def string_value(term: str) -> str:
    """String form a str: builtin sees (literal value, IRI string, ...)."""
    if T.is_literal(term):
        return T.literal_parts(term)[0]
    if T.is_iri(term):
        return T.iri_value(term)
    return term


def as_datetime(term: str) -> datetime | None:
    """extensions.rb:105-113: pad YYYY / YYYY-MM, ISO8601 parse, else None
    (the reference falls back to literal 0; callers here treat None as
    invalid input and drop the solution)."""
    if not T.is_literal(term):
        return None
    value = T.literal_parts(term)[0]
    mvalue = value
    if re.match(r"^\d{4}$", mvalue):
        mvalue += "-01"
    if re.match(r"^\d{4}-\d{2}$", mvalue):
        mvalue += "-01"
    if re.match(r"^\d{4}-\d{2}-\d{2}$", mvalue):
        mvalue += "T00:00:00"
    try:
        if mvalue.endswith("Z"):
            return datetime.fromisoformat(mvalue[:-1]).replace(tzinfo=timezone.utc)
        return datetime.fromisoformat(mvalue)
    except ValueError:
        return None


def datetime_lexical(term: str) -> str:
    return T.literal_parts(term)[0] if T.is_literal(term) else ""


def tz_offset_string(dt: datetime) -> str:
    if dt.tzinfo is None:
        return ""
    off = dt.utcoffset() or timedelta(0)
    if off == timedelta(0):
        return "Z"
    total = int(off.total_seconds())
    sign = "+" if total >= 0 else "-"
    total = abs(total)
    return f"{sign}{total // 3600:02d}:{(total % 3600) // 60:02d}"
