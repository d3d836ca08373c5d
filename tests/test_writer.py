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


def test_shared_list_head_keeps_label():
    """A list referenced from two statements must render by label with
    an explicit ladder — inlining at the first reference would leave
    the second dangling (review regression)."""
    from rdf_n3_ray import terms as T
    from rdf_n3_ray.parser.n3_parser import parse_n3
    from rdf_n3_ray.serializer.n3_writer import serialize_n3
    from rdf_n3_ray.isomorphism import isomorphic

    q = [("<http://x/a>", "<http://x/p>", "_:l", None),
         ("<http://x/b>", "<http://x/p>", "_:l", None),
         ("_:l", T.RDF_FIRST, '"1"', None),
         ("_:l", T.RDF_REST, T.RDF_NIL, None)]
    back = parse_n3(serialize_n3(q), base_uri="http://x/")
    assert not back.errors
    assert isomorphic(q, back.quads)


def test_invalid_lexical_never_bare():
    """Ill-typed numeric lexicals (incl. trailing-newline forms) must
    keep the quoted ^^datatype form (review regression)."""
    from rdf_n3_ray import terms as T
    from rdf_n3_ray.parser.n3_parser import parse_n3
    from rdf_n3_ray.serializer.n3_writer import serialize_n3
    from rdf_n3_ray.isomorphism import isomorphic

    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    for bad in ("abc", "1\n", "1 2"):
        q = [("<http://x/a>", "<http://x/p>",
              T.literal(bad, datatype=xsd_int), None)]
        out = serialize_n3(q)
        back = parse_n3(out, base_uri="http://x/")
        assert not back.errors, (bad, out, back.errors)
        assert isomorphic(q, back.quads), (bad, out)
