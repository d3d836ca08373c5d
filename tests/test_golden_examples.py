"""Golden-pair conformance against the reference's OWN example corpus.

The reference ships cwm-generated golden outputs
(/root/reference/examples/{reason,list,includes,string,norm,unify}/*-ref.n3,
string/*-out.n3; see SURVEY.md §5.3).  Each test parses the input with
our engine, runs the forward-chaining reasoner where the pair was
produced with cwm --think, and compares against the golden file parsed
with the same base URI, under bnode-bijection graph isomorphism.

Files are read from /root/reference at test time (never copied).

Inputs using the legacy cwm directives @forAll / @forSome / @keywords
are NOT parity targets for the default reader (the reference reader has
no support for them: zero occurrences in /root/reference/lib, no such
productions in etc/n3.ebnf — the default-mode pinning test verifies
they error).  We additionally run them through the opt-in ``legacy=True``
extension (LEGACY_PAIRS below), which reproduces the cwm goldens the
reference ships but cannot execute.

Remaining skipped pairs, with reasons pinned to the reference:
- string/uriEncode: str:uriEncode is absent from the reference's builtin
  dispatch table (/root/reference/lib/rdf/n3/algebra.rb:118-205).
- andy/D and includes/concat: the goldens (andy/D-ref.n3,
  includes/concat-ref.n3) are ZERO-BYTE files — no expected output.
- supports/simple: needs log:supports, NotImplemented in the reference
  itself (algebra.rb:142).
- string/roughly: needs str:containsRoughly, NotImplemented in the
  reference itself (algebra.rb:178).
- includes/conjunction: the cwm golden shows NO derivation (store
  reprinted unchanged), but the reference's own log:conjunction
  (algebra/log/conjunction.rb) — and our engine — derives
  `F a :result` from it; the golden predates the builtin and
  contradicts the reference's semantics, so it is pinned as a
  divergence (test_conjunction_golden_predates_builtin).
"""
import os

import pytest

from rdf_n3_ray.algebra.engine import reason_n3
from rdf_n3_ray.isomorphism import isomorphic
from rdf_n3_ray.parser.n3_parser import parse_n3

EX = "/root/reference/examples"

# (relpath-sans-.n3, ref-suffix, mode)
#   think  : cwm --think --data equivalent -> reason(think=True).data()
#   parse  : plain cwm reprint -> parse + ground-default-graph projection
REASON_PAIRS = [
    ("reason/socrates", "-ref", "think"),
    ("reason/t1", "-ref", "think"),
    ("reason/t2", "-ref", "think"),
    ("reason/t3", "-ref", "think"),
    ("reason/t4", "-ref", "think"),
    ("reason/t5", "-ref", "think"),
    ("reason/t6", "-ref", "think"),
    ("reason/t8", "-ref", "think"),
    ("reason/t9", "-ref", "think"),
    ("list/list-bug2", "-ref", "think"),
    ("list/unify2", "-ref", "think"),
    ("list/unify4", "-ref", "think"),
    ("list/append", "-ref", "parse"),
    ("includes/conclusion-simple", "-ref", "think"),
    ("string/endsWith", "-out", "think"),
    ("unify/reflexive", "-ref", "think"),
    # ref file uses a dashed name; a "/"-containing suffix is a full
    # replacement relpath
    ("includes/bnodeConclude", "includes/bnode-conclude-ref", "think"),
]

# cwm goldens whose inputs need the opt-in legacy=True extension
# (@forAll/@forSome/@keywords, `@a` escape, bareword mode, formula
# alpha-unification, rdf:first/rest cons-cell matching).  All compare
# reason(think=True, legacy=True).data() against the golden.
LEGACY_PAIRS = [
    "reason/double",
    "list/builtin_generated_match",
    "list/list-bug1",
    "list/unify3",
    "list/unify5",
    "list/r1",
    "includes/list-in",
    "norm/av",
    "unify/unify1",
    "unify/unify2",
]

# every legacy-directive input (run in LEGACY_PAIRS or skip-documented
# above): the default-mode pinning test asserts each still errors
# without legacy=True, preserving reference parity.
LEGACY_DIRECTIVE_INPUTS = LEGACY_PAIRS + [
    "includes/concat", "includes/conjunction", "string/roughly",
    "supports/simple",
]


def _ground_data_projection(quads):
    """Parse-only analogue of ReasonResult.data (reasoner.rb:184-209):
    default graph only, nothing mentioning formulae or variables."""
    from rdf_n3_ray.algebra.engine import is_var

    graphs = {g for _, _, _, g in quads if g}
    return [
        (s, p, o, g)
        for s, p, o, g in quads
        if g is None and not any(is_var(t) or t in graphs for t in (s, p, o))
    ]


@pytest.mark.parametrize("rel,suffix,mode",
                         REASON_PAIRS, ids=[p[0] for p in REASON_PAIRS])
def test_golden_pair(rel, suffix, mode):
    inp = os.path.join(EX, rel + ".n3")
    ref = os.path.join(
        EX, (suffix if "/" in suffix else rel + suffix) + ".n3")
    base = f"http://example.com/{os.path.basename(rel)}.n3#"
    text = open(inp).read()
    reftext = open(ref).read()

    if mode == "think":
        got = reason_n3(text, think=True, base_uri=base).data()
    else:
        r = parse_n3(text, base_uri=base, list_terms=True)
        assert not r.errors, r.errors
        got = _ground_data_projection(r.quads)

    exp = parse_n3(reftext, base_uri=base, list_terms=True)
    assert not exp.errors, exp.errors
    assert isomorphic(got, exp.quads), (
        f"GOT ({len(got)}): {sorted(got)[:8]}\n"
        f"EXP ({len(exp.quads)}): {sorted(exp.quads)[:8]}")


@pytest.mark.parametrize("rel", LEGACY_PAIRS, ids=LEGACY_PAIRS)
def test_legacy_golden_pair(rel):
    base = f"http://example.com/{os.path.basename(rel)}.n3#"
    text = open(os.path.join(EX, rel + ".n3")).read()
    reftext = open(os.path.join(EX, rel + "-ref.n3")).read()
    got = reason_n3(text, think=True, base_uri=base, legacy=True).data()
    exp = parse_n3(reftext, base_uri=base, list_terms=True, legacy=True)
    assert not exp.errors, exp.errors
    assert isomorphic(got, exp.quads), (
        f"GOT ({len(got)}): {sorted(got)[:8]}\n"
        f"EXP ({len(exp.quads)}): {sorted(exp.quads)[:8]}")


def test_legacy_directive_cases_unsupported_by_reference():
    """The legacy inputs really do use the legacy directives, and
    without legacy=True they still fail to parse cleanly (validate
    mode) — the default reader keeps reference parity."""
    for rel in LEGACY_DIRECTIVE_INPUTS:
        text = open(os.path.join(EX, rel + ".n3")).read()
        assert any(d in text for d in ("@forAll", "@forSome", "@keywords")), rel
        r = parse_n3(text, validate=True)
        assert r.errors, f"{rel}: default reader unexpectedly accepted legacy N3"


def test_conjunction_golden_predates_builtin():
    """includes/conjunction: cwm's golden derives nothing, but the
    reference's log:conjunction (algebra/log/conjunction.rb) does fire
    on this input — our engine follows the reference: the conjoined
    formula is typed :result and its statements land in the store."""
    base = "http://example.com/conjunction.n3#"
    text = open(os.path.join(EX, "includes/conjunction.n3")).read()
    r = reason_n3(text, think=True, base_uri=base, legacy=True)
    derived = [q for q in r.quads if "conj_form" in q[0] and q[3] is None]
    assert derived, "log:conjunction rule should fire (reference semantics)"


def test_uri_encode_golden_needs_builtins_absent_from_reference():
    """string/uriEncode's cwm golden exercises string:encodeForURI /
    string:encodeForFragID, which the reference never implemented (no
    algebra/str/encode_*.rb) — running the reference on this input
    would not reproduce the golden either, so it is out of parity
    scope, not a gap."""
    import glob

    assert not glob.glob("/root/reference/lib/rdf/n3/algebra/str/encode*")
