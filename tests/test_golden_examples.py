"""Golden-pair conformance against the reference's OWN example corpus.

The reference ships cwm-generated golden outputs
(/root/reference/examples/{reason,list,includes,string,norm}/*-ref.n3,
string/*-out.n3; see SURVEY.md §5.3).  Each test parses the input with
our engine, runs the forward-chaining reasoner where the pair was
produced with cwm --think, and compares against the golden file parsed
with the same base URI, under bnode-bijection graph isomorphism.

Files are read from /root/reference at test time (never copied).

Skipped pairs, with reasons pinned to the reference:
- inputs using the legacy cwm directives @forAll / @forSome / @keywords:
  the reference reader itself does not support them (zero occurrences in
  /root/reference/lib; the N3 CG grammar in etc/n3.ebnf has no such
  productions), so they are not parity targets.
- string/uriEncode: str:uriEncode is absent from the reference's builtin
  dispatch table (/root/reference/lib/rdf/n3/algebra.rb:118-205).
- andy/D: the golden (examples/andy/D-ref.n3) is a ZERO-BYTE file, so
  there is no expected output to compare against.
- list/r1, supports/simple, unify/unify1, unify/unify2: legacy
  @forAll/@keywords directives (in LEGACY_DIRECTIVE_SKIPS so the
  pinning test verifies the claim); supports/simple additionally needs
  log:supports, NotImplemented in the reference itself (algebra.rb:142).
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

LEGACY_DIRECTIVE_SKIPS = [
    "reason/double", "list/builtin_generated_match", "list/list-bug1",
    "list/unify3", "list/unify5", "includes/concat", "includes/list-in",
    "includes/conjunction", "string/roughly", "norm/av",
    # supports/simple additionally needs log:supports (NotImplemented
    # in the reference, algebra.rb:142) — but the directive alone
    # already disqualifies it, so the pinning test covers it too
    "list/r1", "supports/simple", "unify/unify1", "unify/unify2",
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


def test_legacy_directive_cases_unsupported_by_reference():
    """The skipped inputs really do use the legacy directives, and the
    reference reader really has no support for them."""
    for rel in LEGACY_DIRECTIVE_SKIPS:
        text = open(os.path.join(EX, rel + ".n3")).read()
        assert any(d in text for d in ("@forAll", "@forSome", "@keywords")), rel


def test_uri_encode_golden_needs_builtins_absent_from_reference():
    """string/uriEncode's cwm golden exercises string:encodeForURI /
    string:encodeForFragID, which the reference never implemented (no
    algebra/str/encode_*.rb) — running the reference on this input
    would not reproduce the golden either, so it is out of parity
    scope, not a gap."""
    import glob

    assert not glob.glob("/root/reference/lib/rdf/n3/algebra/str/encode*")
