"""Conformance-suite runner over tests/fixtures/n3_suite.py — the
P/R >= 0.95 gate (BASELINE.md; suite structure per
/root/reference/spec/suite_parser_spec.rb + suite_reasoner_spec.rb)."""
import pytest

from rdf_n3_ray.algebra.engine import reason
from rdf_n3_ray.isomorphism import isomorphic, precision_recall
from rdf_n3_ray.parser.n3_parser import parse_n3

from fixtures.n3_suite import CASES


def parse_expected(text):
    """Parse hand-written expected quads: one `s p o [g] .` per line,
    terms already in engine encoding."""
    quads = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        assert line.endswith(" .") or line.endswith(".")
        line = line[:-1].strip()
        terms = _split_terms(line)
        if len(terms) == 3:
            quads.append((terms[0], terms[1], terms[2], None))
        elif len(terms) == 4:
            quads.append((terms[0], terms[1], terms[2], terms[3]))
        else:
            raise ValueError(f"bad expected line: {line!r}")
    return quads


def _split_terms(line):
    out, i, n = [], 0, len(line)
    while i < n:
        c = line[i]
        if c == " ":
            i += 1
            continue
        start = i
        depth = 0
        in_str = False
        while i < n:
            ch = line[i]
            if in_str:
                if ch == "\\":
                    i += 2
                    continue
                if ch == '"':
                    in_str = False
            elif ch == '"':
                in_str = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == " " and depth == 0:
                break
            i += 1
        out.append(line[start:i])
    return out


EVAL_CASES = [c for c in CASES if c[1] == "Eval"]
POS_CASES = [c for c in CASES if c[1] == "PositiveSyntax"]
NEG_CASES = [c for c in CASES if c[1] == "NegativeSyntax"]
REASON_CASES = [c for c in CASES if c[1] == "Reason"]


@pytest.mark.parametrize("case", POS_CASES, ids=[c[0] for c in POS_CASES])
def test_positive_syntax(case):
    _, _, text, _, opts = case
    r = parse_n3(text, validate=True, **opts)
    assert not r.errors, r.errors


@pytest.mark.parametrize("case", NEG_CASES, ids=[c[0] for c in NEG_CASES])
def test_negative_syntax(case):
    _, _, text, _, opts = case
    r = parse_n3(text, validate=True, **opts)
    assert r.errors, f"expected syntax error for {text!r}"


@pytest.mark.parametrize("case", EVAL_CASES, ids=[c[0] for c in EVAL_CASES])
def test_eval(case):
    cid, _, text, expected, opts = case
    r = parse_n3(text, **opts)
    assert not r.errors, (cid, r.errors)
    exp = parse_expected(expected)
    assert isomorphic(r.quads, exp), f"{cid}\nGOT: {r.quads}\nWANT: {exp}"


@pytest.mark.parametrize("case", REASON_CASES, ids=[c[0] for c in REASON_CASES])
def test_reason(case):
    cid, _, text, expected, opts = case
    parsed = parse_n3(text, list_terms=True, legacy=opts.get("legacy", False))
    assert not parsed.errors, (cid, parsed.errors)
    result = reason(parsed.quads, think=opts.get("think", False))
    got = result.conclusions() if opts.get("conclusions") else result.data()
    exp = parse_expected(expected)
    assert isomorphic(got, exp), f"{cid}\nGOT: {got}\nWANT: {exp}"


def test_aggregate_precision_recall_gate():
    """Triple P/R across all Eval cases must clear 0.95 (BASELINE.md)."""
    tp_g = tp_e = n_g = n_e = 0
    for cid, _, text, expected, opts in EVAL_CASES:
        got = parse_n3(text, **opts).quads
        exp = parse_expected(expected)
        p, r = precision_recall(got, exp)
        n_g += len(set(got))
        n_e += len(set(exp))
        tp_g += p * len(set(got))
        tp_e += r * len(set(exp))
    precision = tp_g / n_g
    recall = tp_e / n_e
    assert precision >= 0.95, precision
    assert recall >= 0.95, recall
