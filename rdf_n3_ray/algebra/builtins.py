"""Builtin operator registry — the N3 "algebra" scalar functions.

Reimplements the dispatch table of /root/reference/lib/rdf/n3/algebra.rb:118-205
and the two evaluation shapes:

- **ListOperator** (list_operator.rb:19-50): subject resolves to a list;
  ``resolve(list)`` computes a value; a variable object binds it, a
  constant object filters on equality.
- **ResourceOperator** (resource_operator.rb:19-71): subject and object
  resolve independently; bind whichever side is a variable (when the op
  is bidirectional), else ``apply`` -> keep / drop / merge.

Both dedup solutions (``.compact.uniq``).  Every function here is a pure
kernel over encoded term strings — they run row-wise inside
``map_batches`` on a bindings table, or inside the local reasoning
engine (SURVEY.md §2.9).

`gmTime`/`localTime` use a fixed clock injected via EvalContext.now —
never the wall clock — so distributed evaluation is deterministic and
retry-safe (deviation from the reference, which calls Time.now).
"""
from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass, field
from datetime import datetime, timezone
from decimal import Decimal
from typing import Callable

from .. import terms as T
from .values import (
    FALSE,
    TRUE,
    as_datetime,
    as_number,
    datetime_lexical,
    from_bool,
    from_number,
    is_numeric_literal,
    string_value,
    tz_offset_string,
    xpath_string,
)

LOG = T.LOG_NS
MATH = T.MATH_NS
STR = T.STR_NS
TIME = T.TIME_NS
LIST = T.LIST_NS
CRYPTO = T.CRYPTO_NS


@dataclass
class EvalContext:
    """Per-evaluation context: list expansion against the knowledge
    base, formula contents, output-string accumulator, fixed clock,
    and an optional resource fetcher for log:content/log:semantics.

    `fetcher(iri) -> str | None` dereferences ANY scheme the caller
    supports — the seam that restores the reference's web dereference
    (log/content.rb:20-33 uses RDF::Util::File) in deployments that
    have network access; this sandboxed engine ships no http client,
    so without a fetcher only file:// IRIs resolve (deliberate
    hardening, see engine._resource_to_path)."""

    expand_list: Callable[[str], list | None] = lambda t: None
    formula_quads: Callable[[str], list | None] = lambda g: None
    strings: dict = field(default_factory=dict)
    now: datetime = datetime(2024, 1, 1, tzinfo=timezone.utc)
    fetcher: Callable[[str], str | None] | None = None
    # outer document base: inherited by log:parsedAsN3's inner parse
    # (parsed_as_n3.rb:21 passes **@options, which carry base_uri)
    base_uri: str | None = None


def is_var(t) -> bool:
    return isinstance(t, str) and t.startswith("?")


def _subst(term, sol: dict):
    if isinstance(term, list):
        return [_subst(e, sol) for e in term]
    if is_var(term):
        return sol.get(term, term)
    return term


def _to_list(term, sol: dict, ctx: EvalContext):
    """try_list semantics (list.rb:35-44): expand bnode-headed ladders,
    decode `(...)` terms, substitute bindings."""
    term = _subst(term, sol)
    if isinstance(term, list):
        return [_subst(e, sol) for e in term]
    if isinstance(term, str):
        if term == T.RDF_NIL:
            return []
        if T.is_list_term(term):
            return [_subst(e, sol) for e in T.parse_list_term(term)]
        if T.is_bnode(term):
            expanded = ctx.expand_list(term)
            if expanded is not None:
                return [_subst(e, sol) for e in expanded]
    return None


def _ground(x) -> bool:
    if isinstance(x, list):
        return all(_ground(e) for e in x)
    return not is_var(x)


def eq_terms(a, b) -> bool:
    """RDF value equality: numeric literals compare by value, others by
    encoded form (RDF::Literal#== semantics for the kernel domain)."""
    if isinstance(a, list) or isinstance(b, list):
        if not (isinstance(a, list) and isinstance(b, list)):
            return False
        return len(a) == len(b) and all(eq_terms(x, y) for x, y in zip(a, b))
    if isinstance(a, str) and isinstance(b, str):
        if a == b:
            return True
        if T.is_literal(a) and T.is_literal(b) and is_numeric_literal(a) and is_numeric_literal(b):
            na, nb = as_number(a), as_number(b)
            try:
                # exact cross-type compare: Python int/Decimal/float
                # comparisons are exact — float() coercion would
                # conflate distinct integers beyond 2^53
                return na == nb
            except (TypeError, ValueError):
                return False
    return False


Solutions = list  # list[dict]


@dataclass
class Builtin:
    uri: str
    evaluate: Callable  # (subj, obj, sol, ctx) -> list[dict] | None
    rank_vars: Callable | None = None  # optional custom input-var counter


REGISTRY: dict[str, Builtin] = {}


def _register(uri: str, fn):
    REGISTRY[uri] = Builtin(uri=uri, evaluate=fn)


def _encode(value):
    return T.encode_list(value) if isinstance(value, list) else value


# ---------------------------------------------------------------------------
# evaluation shapes
# ---------------------------------------------------------------------------

def list_op(uri: str, resolve, validate=None):
    """ListOperator shape (list_operator.rb:19-50)."""

    def ev(subj, obj, sol: dict, ctx: EvalContext):
        lst = _to_list(subj, sol, ctx)
        if lst is None or not _ground(lst):
            return None
        if validate and not validate(lst):
            return None
        lhs = resolve(lst, ctx)
        if lhs is None:
            return None
        obj_s = _subst(obj, sol)
        if is_var(obj_s):
            return [{**sol, obj_s: _encode(lhs)}]
        ol = _to_list(obj, sol, ctx)
        cmp_to = ol if ol is not None and isinstance(lhs, list) else obj_s
        return [sol] if eq_terms(lhs, cmp_to) else []

    _register(uri, ev)


def resource_op(uri: str, resolve_subj, resolve_obj=None, apply=None, require_literal=True):
    """ResourceOperator shape (resource_operator.rb:19-71).

    resolve_subj(term, ctx) computes the forward value; resolve_obj, when
    given, makes the op bidirectional (computes subject from object).
    apply(lhs, rhs) -> bool for comparison ops.
    """

    def ev(subj, obj, sol: dict, ctx: EvalContext):
        s = _subst(subj, sol)
        o = _subst(obj, sol)
        s_var, o_var = is_var(s), is_var(o)
        if s_var and o_var:
            return None
        if apply is not None:
            # comparison: both sides must be bound
            if s_var or o_var:
                return None
            lhs = resolve_subj(s, ctx)
            rhs = resolve_subj(o, ctx)
            if lhs is None or rhs is None:
                return None
            try:
                return [sol] if apply(lhs, rhs) else []
            except (TypeError, ValueError, ArithmeticError):
                return None
        if o_var:
            if require_literal and not (isinstance(s, str) and T.is_literal(s)):
                return None
            lhs = resolve_subj(s, ctx)
            if lhs is None:
                return None
            return [{**sol, o: _encode(lhs)}]
        if s_var:
            if resolve_obj is None:
                return None
            if require_literal and not (isinstance(o, str) and T.is_literal(o)):
                return None
            rhs = resolve_obj(o, ctx)
            if rhs is None:
                return None
            return [{**sol, s: _encode(rhs)}]
        # both bound: compare forward value against object
        lhs = resolve_subj(s, ctx)
        if lhs is None:
            return None
        return [sol] if eq_terms(_encode(lhs), o) else []

    _register(uri, ev)


# ---------------------------------------------------------------------------
# math: n-ary list folds and pairs (ListOperator)
# ---------------------------------------------------------------------------

def _nums(lst):
    return [as_number(e) for e in lst if isinstance(e, str)]


def _fold(fn, empty=None):
    def resolve(lst, ctx):
        ns = _nums(lst)
        if not ns:
            return empty
        acc = ns[0]
        for n in ns[1:]:
            try:
                acc = fn(acc, n)
            except (ArithmeticError, TypeError):
                return None
        return from_number(acc)
    return resolve


def _pair_only(lst):
    return len(lst) == 2 and all(isinstance(e, str) and T.is_literal(e) for e in lst)


def _coerce2(a, b):
    if isinstance(a, float) or isinstance(b, float):
        return float(a), float(b)
    if isinstance(a, Decimal) or isinstance(b, Decimal):
        return Decimal(a) if not isinstance(a, Decimal) else a, Decimal(b) if not isinstance(b, Decimal) else b
    return a, b


def _add(a, b):
    a, b = _coerce2(a, b)
    return a + b


def _mul(a, b):
    a, b = _coerce2(a, b)
    return a * b


def _sub(a, b):
    a, b = _coerce2(a, b)
    return a - b


def _div(a, b):
    a, b = _coerce2(a, b)
    if isinstance(a, int) and isinstance(b, int):
        return Decimal(a) / Decimal(b)  # xpath: integer division yields decimal
    return a / b


list_op(MATH + "sum", _fold(_add, empty=from_number(0)))
list_op(MATH + "product", _fold(_mul, empty=from_number(1)))
list_op(MATH + "difference", _fold(_sub), validate=_pair_only)
list_op(MATH + "quotient", _fold(_div), validate=_pair_only)
list_op(
    MATH + "exponentiation",
    lambda lst, ctx: from_number(_pow(*_nums(lst))),
    validate=_pair_only,
)
list_op(
    MATH + "remainder",
    lambda lst, ctx: _remainder(*_nums(lst)),
    validate=lambda lst: _pair_only(lst),
)


def _pow(a, b):
    r = a ** b
    if isinstance(r, complex):
        raise ValueError("complex power")
    return r


def _remainder(a, b):
    if b == 0:
        return None
    if isinstance(a, int) and isinstance(b, int):
        # Python % == Ruby % (floored modulo), matching the reference's
        # list.reduce(&:%) — and exact for arbitrary-size ints, unlike
        # math.fmod which rounds through float
        return from_number(a % b)
    return from_number(float(a) % float(b))


# math unary / bidirectional (ResourceOperator)
def _unary(fn):
    def resolve(term, ctx):
        if not (isinstance(term, str) and T.is_literal(term)):
            return None
        try:
            return from_number(fn(as_number(term)))
        except (ArithmeticError, TypeError, ValueError):
            return None
    return resolve


def _unary_f(fn):
    return _unary(lambda n: fn(float(n)))


resource_op(MATH + "absoluteValue", _unary(lambda n: abs(n)))
resource_op(MATH + "negation", _unary(lambda n: -n), resolve_obj=_unary(lambda n: -n))
resource_op(MATH + "ceiling", _unary(lambda n: math.ceil(n)))
resource_op(MATH + "floor", _unary(lambda n: math.floor(n)))
resource_op(MATH + "rounded", _unary(lambda n: _ruby_round(n)))
resource_op(MATH + "sin", _unary_f(math.sin), resolve_obj=_unary_f(math.asin))
resource_op(MATH + "cos", _unary_f(math.cos), resolve_obj=_unary_f(math.acos))
resource_op(MATH + "tan", _unary_f(math.tan), resolve_obj=_unary_f(math.atan))
resource_op(MATH + "sinh", _unary_f(math.sinh), resolve_obj=_unary_f(math.asinh))
resource_op(MATH + "cosh", _unary_f(math.cosh), resolve_obj=_unary_f(math.acosh))
resource_op(MATH + "tanh", _unary_f(math.tanh), resolve_obj=_unary_f(math.atanh))
resource_op(MATH + "asin", _unary_f(math.asin), resolve_obj=_unary_f(math.sin))
resource_op(MATH + "acos", _unary_f(math.acos), resolve_obj=_unary_f(math.cos))
resource_op(MATH + "atan", _unary_f(math.atan), resolve_obj=_unary_f(math.tan))
resource_op(MATH + "asinh", _unary_f(math.asinh), resolve_obj=_unary_f(math.sinh))
resource_op(MATH + "acosh", _unary_f(math.acosh), resolve_obj=_unary_f(math.cosh))
resource_op(MATH + "atanh", _unary_f(math.atanh), resolve_obj=_unary_f(math.tanh))


def _ruby_round(n):
    """Ruby's round: half away from zero (unlike python banker's)."""
    if isinstance(n, float):
        return float(Decimal(repr(n)).quantize(Decimal(1), rounding="ROUND_HALF_UP"))
    if isinstance(n, Decimal):
        return int(n.quantize(Decimal(1), rounding="ROUND_HALF_UP"))
    return n


def _num_cmp(op):
    def resolve(term, ctx):
        if not (isinstance(term, str) and T.is_literal(term)):
            return None
        return as_number(term)
    def apply(lhs, rhs):
        a, b = _coerce2(lhs, rhs)
        # int/Decimal/float cross-type comparison is exact in Python —
        # no float coercion (would be wrong beyond 2^53)
        return op(a, b)
    return resolve, apply


for name, op in [
    ("greaterThan", lambda a, b: a > b),
    ("lessThan", lambda a, b: a < b),
    ("notGreaterThan", lambda a, b: a <= b),
    ("notLessThan", lambda a, b: a >= b),
    ("equalTo", lambda a, b: a == b),
    ("notEqualTo", lambda a, b: a != b),
]:
    res, app = _num_cmp(op)
    resource_op(MATH + name, res, apply=app)


# ---------------------------------------------------------------------------
# string:
# ---------------------------------------------------------------------------

def _str_resolve(term, ctx):
    if not isinstance(term, str) or is_var(term):
        return None
    return string_value(term)


def _str_apply(fn):
    return lambda lhs, rhs: fn(lhs, rhs)


def _sv(t):
    # XPath xs:string cast, NOT the raw lexical: the reference runs
    # every list member through Expression.cast (concatenation.rb:21)
    # so (1 01) concatenates to "11" and (0.0 1.23E3) to "01230"
    return xpath_string(t)


list_op(STR + "concatenation", lambda lst, ctx: T.literal("".join(_sv(e) for e in lst)))
list_op(
    STR + "format",
    lambda lst, ctx: _format(lst),
    validate=lambda lst: len(lst) >= 1,
)
list_op(
    STR + "scrape",
    lambda lst, ctx: _scrape(lst),
    validate=lambda lst: len(lst) == 2,
)
list_op(
    STR + "replace",
    lambda lst, ctx: _replace(lst),
    validate=lambda lst: len(lst) == 3,
)


def _format(lst):
    fmt, *args = [_sv(e) for e in lst]
    try:
        return T.literal(fmt % tuple(args))
    except (TypeError, ValueError):
        return None


def _scrape(lst):
    inp, regex = [_sv(e) for e in lst]
    try:
        md = re.search(regex, inp)
    except re.error:
        return None
    return T.literal(md.group(1)) if md and md.groups() else None


def _replace(lst):
    inp, pat, repl = [_sv(e) for e in lst]
    try:
        return T.literal(re.sub(pat, repl.replace("\\", "\\\\"), inp))
    except re.error:
        return None


for name, fn in [
    ("contains", lambda a, b: b in a),
    ("containsIgnoringCase", lambda a, b: b.lower() in a.lower()),
    ("endsWith", lambda a, b: a.endswith(b)),
    ("startsWith", lambda a, b: a.startswith(b)),
    ("equalIgnoringCase", lambda a, b: a.lower() == b.lower()),
    ("notEqualIgnoringCase", lambda a, b: a.lower() != b.lower()),
    ("greaterThan", lambda a, b: a > b),
    ("lessThan", lambda a, b: a < b),
    ("notGreaterThan", lambda a, b: a <= b),
    ("notLessThan", lambda a, b: a >= b),
    ("matches", lambda a, b: bool(re.search(b, a))),
    ("notMatches", lambda a, b: not re.search(b, a)),
]:
    resource_op(STR + name, _str_resolve, apply=_str_apply(fn))


# ---------------------------------------------------------------------------
# time: component extraction (ResourceOperator; lexical-form gated like
# time/day.rb:29-33 — component must be present in the lexical value)
# ---------------------------------------------------------------------------

def _time_component(pattern: str, fmt):
    rx = re.compile(pattern)

    def resolve(term, ctx):
        if not (isinstance(term, str) and T.is_literal(term)):
            return None
        lex = datetime_lexical(term)
        if not rx.match(lex):
            return None
        dt = as_datetime(term)
        if dt is None:
            return None
        return fmt(dt, lex)

    return resolve


resource_op(TIME + "year", _time_component(r"^\d{4}", lambda dt, lex: from_number(dt.year)))
resource_op(TIME + "month", _time_component(r"^\d{4}-\d{2}", lambda dt, lex: from_number(dt.month)))
resource_op(TIME + "day", _time_component(r"^\d{4}-\d{2}-\d{2}", lambda dt, lex: from_number(dt.day)))
resource_op(TIME + "hour", _time_component(r"^\d{4}-\d{2}-\d{2}T\d{2}", lambda dt, lex: from_number(dt.hour)))
resource_op(TIME + "minute", _time_component(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}", lambda dt, lex: from_number(dt.minute)))
resource_op(TIME + "second", _time_component(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}", lambda dt, lex: from_number(dt.second)))
resource_op(TIME + "dayOfWeek", _time_component(r"^\d{4}-\d{2}-\d{2}", lambda dt, lex: from_number((dt.weekday() + 1) % 7)))
resource_op(
    TIME + "timeZone",
    _time_component(r".", lambda dt, lex: T.literal(tz_offset_string(dt)) if tz_offset_string(dt) else None),
)
resource_op(
    TIME + "inSeconds",
    lambda term, ctx: _in_seconds_fwd(term),
    resolve_obj=lambda term, ctx: _in_seconds_back(term),
)
resource_op(
    TIME + "gmTime",
    lambda term, ctx: T.literal(ctx.now.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")),
    require_literal=False,
)
resource_op(
    TIME + "localTime",
    lambda term, ctx: T.literal(ctx.now.strftime("%Y-%m-%dT%H:%M:%S%z")),
    require_literal=False,
)


def _in_seconds_fwd(term):
    dt = as_datetime(term)
    if dt is None:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return from_number(int(dt.timestamp()))


def _in_seconds_back(term):
    n = as_number(term)
    dt = datetime.fromtimestamp(float(n), tz=timezone.utc)
    return T.literal(dt.strftime("%Y-%m-%dT%H:%M:%S+00:00"), datatype=T.XSD_DATETIME)


# ---------------------------------------------------------------------------
# list:
# ---------------------------------------------------------------------------

list_op(LIST + "length", lambda lst, ctx: from_number(len(lst)))
list_op(LIST + "first", lambda lst, ctx: lst[0] if lst else None)
list_op(LIST + "last", lambda lst, ctx: lst[-1] if lst else None)


def _append_resolve(lst, ctx):
    out = []
    for e in lst:
        if not isinstance(e, list):
            return None
        out.extend(e)
    return out


def _append_ev(subj, obj, sol, ctx):
    lst = _to_list(subj, sol, ctx)
    if lst is None:
        return None
    lists = []
    for e in lst:
        el = e if isinstance(e, list) else _to_list(e, sol, ctx)
        if el is None or not _ground(el):
            return None
        lists.append(el)
    flat = [x for sub in lists for x in sub]
    obj_s = _subst(obj, sol)
    if is_var(obj_s):
        return [{**sol, obj_s: T.encode_list(flat)}]
    ol = _to_list(obj, sol, ctx)
    return [sol] if ol is not None and eq_terms(flat, ol) else []


_register(LIST + "append", _append_ev)


def _member_ev(subj, obj, sol, ctx):
    """list:member — var object fans out one solution per member
    (list/member.rb:10-44)."""
    lst = _to_list(subj, sol, ctx)
    if lst is None:
        return None
    obj_s = _subst(obj, sol)
    if is_var(obj_s):
        return [{**sol, obj_s: _encode(e)} for e in lst]
    return [sol] if any(eq_terms(e, obj_s) for e in lst) else []


_register(LIST + "member", _member_ev)


def _in_ev(subj, obj, sol, ctx):
    """list:in — mirror of member: subject in object list
    (list/in.rb:10-48)."""
    subj_s = _subst(subj, sol)
    lst = _to_list(obj, sol, ctx)
    if lst is None:
        return None
    if is_var(subj_s):
        return [{**sol, subj_s: _encode(e)} for e in lst]
    return [sol] if any(eq_terms(e, subj_s) for e in lst) else []


_register(LIST + "in", _in_ev)


def _iterate_ev(subj, obj, sol, ctx):
    """list:iterate — (index value) pair enumeration, 4 binding modes
    (list/iterate.rb:36-96)."""
    lst = _to_list(subj, sol, ctx)
    if lst is None or not _ground(lst):
        return None
    pairs = [(from_number(i), e) for i, e in enumerate(lst)]
    obj_s = _subst(obj, sol)
    if is_var(obj_s):
        return [{**sol, obj_s: T.encode_list([i, _encode(v)])} for i, v in pairs]
    ol = _to_list(obj, sol, ctx)
    if ol is None or len(ol) != 2:
        return None
    idx_t, val_t = ol
    out = []
    for i, v in pairs:
        s2 = dict(sol)
        iv = _subst(idx_t, s2)
        if is_var(iv):
            s2[iv] = i
        elif not eq_terms(iv, i):
            continue
        vv = _subst(val_t, s2)
        if is_var(vv):
            s2[vv] = _encode(v)
        elif not eq_terms(vv, _encode(v) if isinstance(v, list) else v):
            continue
        out.append(s2)
    return out


_register(LIST + "iterate", _iterate_ev)


# ---------------------------------------------------------------------------
# log: pure kernels (the impure ones — implies, includes, conclusion,
# n3String, parsedAsN3, outputString — live in the engine, which has
# access to formulae and the serializer/parser; SURVEY.md §2.9)
# ---------------------------------------------------------------------------

def _log_equal_ev(subj, obj, sol, ctx):
    """log:equalTo — sameTerm (log/equal_to.rb); binds a variable side."""
    s, o = _subst(subj, sol), _subst(obj, sol)
    if is_var(s) and is_var(o):
        return None
    if is_var(o):
        return [{**sol, o: _encode(s)}]
    if is_var(s):
        return [{**sol, s: _encode(o)}]
    return [sol] if _encode(s) == _encode(o) else []


def _log_not_equal_ev(subj, obj, sol, ctx):
    s, o = _subst(subj, sol), _subst(obj, sol)
    if is_var(s) or is_var(o):
        return None
    return [sol] if _encode(s) != _encode(o) else []


_register(LOG + "equalTo", _log_equal_ev)
_register(LOG + "notEqualTo", _log_not_equal_ev)


def _dtlit_ev(subj, obj, sol, ctx):
    """log:dtlit — ("lex" dt-iri) <-> "lex"^^dt (log/dtlit.rb)."""
    lst = _to_list(subj, sol, ctx)
    obj_s = _subst(obj, sol)
    if lst is not None and _ground(lst) and len(lst) == 2:
        lex, dt = lst
        if not T.is_literal(lex) or not T.is_iri(dt):
            return None
        lit = T.literal(string_value(lex), datatype=T.iri_value(dt))
        if is_var(obj_s):
            return [{**sol, obj_s: lit}]
        return [sol] if lit == obj_s else []
    if isinstance(obj_s, str) and T.is_literal(obj_s):
        value, dt, lang = T.literal_parts(obj_s)
        dt = dt or (T.RDF_NS + "langString" if lang else T.XSD_STRING)
        pair = [T.literal(value), T.iri(dt)]
        subj_s = _subst(subj, sol)
        if is_var(subj_s):
            return [{**sol, subj_s: T.encode_list(pair)}]
        sl = _to_list(subj, sol, ctx)
        return [sol] if sl is not None and eq_terms(sl, pair) else []
    return None


def _langlit_ev(subj, obj, sol, ctx):
    lst = _to_list(subj, sol, ctx)
    obj_s = _subst(obj, sol)
    if lst is not None and _ground(lst) and len(lst) == 2:
        lex, lang = lst
        if not T.is_literal(lex) or not T.is_literal(lang):
            return None
        lit = T.literal(string_value(lex), lang=string_value(lang))
        if is_var(obj_s):
            return [{**sol, obj_s: lit}]
        return [sol] if lit == obj_s else []
    if isinstance(obj_s, str) and T.is_literal(obj_s):
        value, _, lang = T.literal_parts(obj_s)
        if not lang:
            return None
        pair = [T.literal(value), T.literal(lang)]
        subj_s = _subst(subj, sol)
        if is_var(subj_s):
            return [{**sol, subj_s: T.encode_list(pair)}]
        sl = _to_list(subj, sol, ctx)
        return [sol] if sl is not None and eq_terms(sl, pair) else []
    return None


_register(LOG + "dtlit", _dtlit_ev)
_register(LOG + "langlit", _langlit_ev)


def _output_string_ev(subj, obj, sol, ctx):
    """log:outputString — accumulate object string keyed by subject
    (log/output_string.rb:36-39); drained sorted by key at the end
    (reasoner.rb:254-259)."""
    s, o = _subst(subj, sol), _subst(obj, sol)
    if is_var(s) or is_var(o):
        return None
    key = string_value(s) if isinstance(s, str) else str(s)
    ctx.strings.setdefault(key, [])
    # the reference casts the accumulated object via xs:string
    # (output_string.rb:16 Expression.cast)
    val = xpath_string(o) if isinstance(o, str) else str(o)
    if val not in ctx.strings[key]:
        ctx.strings[key].append(val)
    return [sol]


_register(LOG + "outputString", _output_string_ev)

# crypto: content hashes (crypto vocab, vocab.rb:5-36)
for alg in ("md5", "sha1", "sha256", "sha384", "sha512"):
    _register(
        CRYPTO + alg,
        (lambda a: lambda subj, obj, sol, ctx: _hash_ev(a, subj, obj, sol))(alg),
    )


def _hash_ev(alg, subj, obj, sol):
    s, o = _subst(subj, sol), _subst(obj, sol)
    if is_var(s) or not (isinstance(s, str) and T.is_literal(s)):
        return None
    digest = hashlib.new(alg, string_value(s).encode()).hexdigest()
    lit = T.literal(digest)
    if is_var(o):
        return [{**sol, o: lit}]
    return [sol] if lit == o else []


NOT_IMPLEMENTED = {
    LOG + "supports",       # algebra.rb:142 NotImplemented upstream too
    STR + "containsRoughly",  # algebra.rb:178 NotImplemented upstream too
    # log:content / log:semantics are implemented for LOCAL files in
    # engine._content/_semantics (web fetch stays out of scope)
}


def input_vars(subj, obj, sol: dict) -> int:
    """Rank heuristic: count unbound variables among the operands
    (builtin.rb:15-19)."""
    count = 0

    def walk(t):
        nonlocal count
        if isinstance(t, list):
            for e in t:
                walk(e)
        elif is_var(t) and t not in sol:
            count += 1

    walk(subj)
    walk(obj)
    return count
