"""Writer tests: round-trip parse(serialize(parse(doc))) ≅ parse(doc)."""
import glob

import pytest

from rdf_n3_ray.isomorphism import isomorphic
from rdf_n3_ray.parser.n3_parser import parse_n3
from rdf_n3_ray.serializer.n3_writer import serialize_n3, to_ntriples

P = "@prefix : <http://ex/> .\n"

DOCS = [
    P + ":a :b :c .",
    P + ":a :b :c ; :d :e, :f .",
    P + ":a a :B .",
    P + ':s :p 1, 2.5, true, "str", "s"@en, "d"^^:dt .',
    P + "_:x :p [ :q :r ] .",
    P + ":s :p ( 1 2 3 ) .",
    P + ":s :p () .",
    P + ":s :p ( 1 ( 2 ) 3 ) .",
    P + "{ :a :b :c } => { :d :e :f } .",
    P + ":s :p ?x . ?x :q :r .",
    P + "[ :p :o ] :q :r .",
    P + "[] :only :prop .",
    P + ":s :p _:shared . :t :q _:shared . _:shared :x :y .",
    P + "{ :a :b { :c :d :e } } :p :o .",
]


@pytest.mark.parametrize("doc", DOCS)
def test_round_trip(doc):
    orig = parse_n3(doc)
    assert not orig.errors
    text = serialize_n3(orig.quads)
    back = parse_n3(text)
    assert not back.errors, (text, back.errors)
    assert isomorphic(orig.quads, back.quads), f"IN:\n{doc}\nOUT:\n{text}\nGOT:{back.quads}\nWANT:{orig.quads}"


def test_round_trip_reference_examples():
    ok = 0
    total = 0
    for f in sorted(glob.glob("/root/reference/examples/**/*.n3", recursive=True)):
        text = open(f, encoding="utf-8").read()
        orig = parse_n3(text, base_uri="http://example.org/doc")
        if orig.errors or not orig.quads:
            continue
        total += 1
        out = serialize_n3(orig.quads)
        back = parse_n3(out, base_uri="http://example.org/doc")
        if not back.errors and isomorphic(orig.quads, back.quads):
            ok += 1
    assert total > 30
    assert ok / total >= 0.95, f"{ok}/{total}"


def test_ntriples_lines():
    quads = parse_n3(P + ":a :b :c . { :d :e :f } :g :h .").quads
    nt = to_ntriples(quads)
    assert "<http://ex/a> <http://ex/b> <http://ex/c> ." in nt
    assert "_:_form_0" in nt
