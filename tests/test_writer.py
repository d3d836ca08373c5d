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


# --- surface-format parity: transcribed from the reference's own
# writer_spec.rb regexp expectations (:37-157 simple tests, :154-200
# collections).  Each case parses the input, serializes with the given
# options, and asserts every regexp matches a line of the output —
# exactly what the reference's `serialize(input, regexps)` helper does.
import re as _re2

_WRITER_SURFACE_CASES = [
    ("full URIs without base",
     '<http://a/b> <http://a/c> <http://a/d> .',
     [r'(?m)^<http://a/b> <http://a/c> <http://a/d> \.$'], {}),
    ("relative URIs with base",
     '<http://a/b> <http://a/c> <http://a/d> .',
     [r'(?m)^@base <http://a/> \.$', r'(?m)^<b> <c> <d> \.$'],
     {"base_uri": "http://a/"}),
    ("pname URIs with prefix",
     '<http://example.com/b> <http://example.com/c> <http://example.com/d> .',
     [r'(?m)^@prefix ex: <http://example.com/> \.$',
      r'(?m)^ex:b ex:c ex:d \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("pname URIs with empty prefix",
     '<http://example.com/b> <http://example.com/c> <http://example.com/d> .',
     [r'(?m)^@prefix : <http://example.com/> \.$', r'(?m)^:b :c :d \.$'],
     {"prefixes": {"": "http://example.com/"}}),
    ("pname URIs with empty suffix",
     '<http://xmlns.com/foaf/0.1/> <http://xmlns.com/foaf/0.1/> <http://xmlns.com/foaf/0.1/> .',
     [r'(?m)^@prefix foaf: <http://xmlns.com/foaf/0\.1/> \.$',
      r'(?m)^foaf: foaf: foaf: \.$'],
     {"prefixes": {"foaf": "http://xmlns.com/foaf/0.1/"}}),
    ("order properties",
     '@prefix ex: <http://example.com/> .\n'
     '@prefix dc: <http://purl.org/dc/elements/1.1/> .\n'
     '@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n'
     'ex:b ex:c ex:d .\nex:b dc:title "title" .\n'
     'ex:b a ex:class .\nex:b rdfs:label "label" .',
     [r'(?m)^ex:b a ex:class;$',
      r'ex:class;\s+rdfs:label "label"',
      r'"label";\s+ex:c ex:d',
      r'(?m)ex:d;\s+dc:title "title" \.$'],
     {"prefixes": {"ex": "http://example.com/",
                   "dc": "http://purl.org/dc/elements/1.1/",
                   "rdfs": "http://www.w3.org/2000/01/rdf-schema#"}}),
    ("object list",
     '@prefix ex: <http://example.com/> . ex:b ex:c ex:d, ex:e .',
     [r'(?m)^@prefix ex: <http://example.com/> \.$',
      r'(?m)^ex:b ex:c ex:[de],\s+ex:[de] \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("property list",
     '@prefix ex: <http://example.com/> . ex:b ex:c ex:d; ex:e ex:f .',
     [r'(?m)^@prefix ex: <http://example.com/> \.$',
      r'(?m)^ex:b ex:c ex:d;$',
      r'(?m)^\s+ex:e ex:f \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("bare anon",
     '@prefix ex: <http://example.com/> . [ex:a ex:b] .',
     [r'(?m)^\s*\[ex:a ex:b\] \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("anon as subject",
     '@prefix ex: <http://example.com/> . [ex:a ex:b] ex:c ex:d .',
     [r'(?m)^\s*\[\s*ex:a ex:b;$',
      r'(?m)^\s+ex:c ex:d\s*\] \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("anon as object",
     '@prefix ex: <http://example.com/> . ex:a ex:b [ex:c ex:d] .',
     [r'(?m)^ex:a ex:b \[ex:c ex:d\] \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("standard prefixes",
     '<http://x/a> a <http://xmlns.com/foaf/0.1/Person>;'
     ' <http://purl.org/dc/terms/title> "Person" .',
     [r'(?m)^@prefix foaf: <http://xmlns\.com/foaf/0\.1/> \.$',
      r'(?m)^@prefix dc: <http://purl\.org/dc/terms/> \.$',
      r'(?m)a foaf:Person;$',
      r'(?m)dc:title "Person" \.$'],
     {"standard_prefixes": True}),
    ("no pname with illegal local part",
     '@prefix db: <http://dbpedia.org/resource/> .\n'
     '@prefix dbo: <http://dbpedia.org/ontology/> .\n'
     'db:Michael_Jackson dbo:artistOf <http://dbpedia.org/resource/(I_Can%27t_Make_It)_Another_Day> .',
     [r'(?m)^@prefix db: <http://dbpedia\.org/resource/> \.$',
      r'(?m)^db:Michael_Jackson dbo:artistOf <http://dbpedia\.org/resource/\(I_Can%27t_Make_It\)_Another_Day> \.$'],
     {"prefixes": {"db": "http://dbpedia.org/resource/",
                   "dbo": "http://dbpedia.org/ontology/"}}),
    ("bare list",
     '@prefix ex: <http://example.com/> . (ex:a ex:b) .',
     [r'(?m)^\(\s*ex:a ex:b\s*\) \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("literal list",
     '@prefix ex: <http://example.com/> . ex:a ex:b ( "apple" "banana" ) .',
     [r'(?m)^ex:a ex:b \(\s*"apple" "banana"\s*\) \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("empty list",
     '@prefix ex: <http://example.com/> . ex:a ex:b () .',
     [r'(?m)^ex:a ex:b \(\s*\) \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("list as subject",
     '@prefix ex: <http://example.com/> . (ex:a) ex:b ex:c .',
     [r'(?m)^\(\s*ex:a\s*\) ex:b ex:c \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    # --- writer_spec.rb:172-332 collections tail -----------------------
    ("empty list as subject",
     '@prefix ex: <http://example.com/> . () ex:a ex:b .',
     [r'(?m)^\(\s*\) ex:a ex:b \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("empty list(2) via sameAs sugar",
     '@prefix : <http://xmlns.com/foaf/0.1/> . :emptyList = () .',
     [r'(?m)^:emptyList (<.*sameAs>|owl:sameAs|=) \(\s*\) \.$'],
     {"prefixes": {"": "http://xmlns.com/foaf/0.1/"}}),
    ("list of empties",
     '@prefix ex: <http://example.com/> . [ex:listOf2Empties (() ())] .',
     [r'\[\s*ex:listOf2Empties \(\s*\(\s*\) \(\s*\)\s*\)\s*\] \.'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("list anon",
     '@prefix ex: <http://example.com/> .'
     ' [ex:twoAnons ([a ex:mother] [a ex:father])] .',
     [r'\[\s*ex:twoAnons \(\s*\[\s*a ex:mother\s*\] '
      r'\[\s*a ex:father\s*\]\s*\)\s*\] \.'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("list subjects",
     '@prefix ex: <http://example.com/> . (ex:a ex:b) . '
     'ex:a a ex:Thing . ex:b a ex:Thing .',
     [r'\(\s*ex:a ex:b\s*\) \.',
      r'(?m)^ex:a a ex:Thing \.$',
      r'(?m)^ex:b a ex:Thing \.$'],
     {"prefixes": {"ex": "http://example.com/"}}),
    ("embedded list",
     '@prefix : <http://example.com/> . ((:q)) a :Thing .',
     [r'\(\s*\(\s*:q\s*\)\s*\) a :Thing \.'],
     {"prefixes": {"": "http://example.com/"}}),
    ("owl:unionOf list",
     '@prefix ex: <http://example.com/> .\n'
     '@prefix owl: <http://www.w3.org/2002/07/owl#> .\n'
     '@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n'
     '@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n'
     'ex:a rdfs:domain [ a owl:Class; owl:unionOf '
     '[ a owl:Class; rdf:first ex:b; rdf:rest '
     '[ a owl:Class; rdf:first ex:c; rdf:rest rdf:nil ] ] ] .',
     # DOCUMENTED DIVERGENCE from writer_spec.rb "owl:unionOf list":
     # the reference collapses cons cells to "( ex:b ex:c )" even when
     # they carry rdf:type props (writer.rb:741-752 counts cell props
     # "other than rdf:type"), silently DROPPING the inner `a
     # owl:Class` statements — lossy.  This repo's bar is round-trip
     # isomorphism (SURVEY §7e), so type-annotated cells keep the
     # explicit rdf:first/rdf:rest ladder instead.
     [r'ex:a rdfs:domain \[a owl:Class;\s+owl:unionOf \[a owl:Class;\s+'
      r'rdf:first ex:b;\s+rdf:rest \[a owl:Class;\s+rdf:first ex:c;\s+'
      r'rdf:rest \(\)\]\]\] \.',
      r'(?m)^@prefix ex: <http://example\.com/> \.$'],
     {"prefixes": {"ex": "http://example.com/",
                   "owl": "http://www.w3.org/2002/07/owl#",
                   "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
                   "rdfs": "http://www.w3.org/2000/01/rdf-schema#"}}),
    ("list with first subject a URI",
     '<http://example.com> <http://www.w3.org/1999/02/22-rdf-syntax-ns#first>'
     ' "1"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
     '<http://example.com> <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>'
     ' _:g1 .\n'
     '_:g1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first>'
     ' "2"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
     '_:g1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:g2 .\n'
     '_:g2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first>'
     ' "3"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
     '_:g2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>'
     ' <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .',
     [r'rdf:first 1;',
      r'rdf:rest \(\s*2 3\s*\)'],
     {"standard_prefixes": True}),
    ("list pattern without rdf:nil",
     '<http://example.com> <http://example.com/property> _:a .\n'
     '_:a <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .\n'
     '_:a <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:b .\n'
     '_:b <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "b" .\n'
     '_:b <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:c .\n'
     '_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "c" .',
     [r'rdf:first "a";',
      r'rdf:rest \[',
      r'rdf:first "b";',
      r'rdf:first "c"'],
     {"standard_prefixes": True}),
    ("list with empty list",
     '<http://example.com/a> <http://example.com/property> _:l1 .\n'
     '_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first>'
     ' <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .\n'
     '_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>'
     ' <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .',
     [r'<http://example\.com/a> <http://example\.com/property>'
      r' \(\s*\(\s*\)\s*\) \.'],
     {"standard_prefixes": True}),
    ("list with multiple lists",
     '<http://example.com/a> <http://example.com/property> _:l1 .\n'
     '_:a <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .\n'
     '_:a <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>'
     ' <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .\n'
     '_:b <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "b" .\n'
     '_:b <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>'
     ' <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .\n'
     '_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> _:a .\n'
     '_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:l2 .\n'
     '_:l2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> _:b .\n'
     '_:l2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>'
     ' <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .',
     [r'<http://example\.com/a> <http://example\.com/property>'
      r' \(\s*\(\s*"a"\s*\) \(\s*"b"\s*\)\s*\) \.'],
     {"standard_prefixes": True}),
    ("xsd:anyURI typed literal",
     '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .'
     ' <http://a> <http://b> "http://foo/"^^xsd:anyURI .',
     [r'(?m)^@prefix xsd: <http://www\.w3\.org/2001/XMLSchema#> \.$',
      r'"http://foo/"\^\^xsd:anyURI \.'],
     {"prefixes": {"xsd": "http://www.w3.org/2001/XMLSchema#"}}),
]


@pytest.mark.parametrize(
    "case", _WRITER_SURFACE_CASES, ids=[c[0] for c in _WRITER_SURFACE_CASES])
def test_writer_surface_format(case):
    name, doc, regexps, opts = case
    r = parse_n3(doc, base_uri=opts.get("base_uri"))
    assert not r.errors, (name, r.errors)
    out = serialize_n3(r.quads, **opts)
    for rx in regexps:
        assert _re2.search(rx, out), f"{name}: /{rx}/ not found in:\n{out}"
    # surface format must never break the round-trip contract
    back = parse_n3(out, base_uri=opts.get("base_uri"))
    assert not back.errors, (name, out, back.errors)
    assert isomorphic(r.quads, back.quads), (name, out)


# formulae / variables / list_terms results (writer_spec.rb:514-652)
_WRITER_FORMULA_CASES = [
    ("empty formula subject", '{} <b> <c> .',
     [r'\{\} <http://a/b> <http://a/c> \.'], {}),
    ("empty formula object", '<a> <b> {} .',
     [r'<http://a/a> <http://a/b> \{\} \.'], {}),
    ("formula subject with content", '{<x> <y> <z>} <b> <c> .',
     [r'\{\s+<http://a/x> <http://a/y> <http://a/z> \.\s+\} <http://a/b> <http://a/c> \.'], {}),
    ("formula object with content", '<a> <b> {<x> <y> <z>} .',
     [r'<http://a/a> <http://a/b> \{\s+<http://a/x> <http://a/y> <http://a/z> \.\s+\} \.'], {}),
    ("implies with scoped bnodes",
     '@prefix : <http://ex/>. { _:x :is _:x } => {_:x :is _:x } .',
     [r'\{\s+_:\S+ :is _:\S+ \.\s+\} => \{\s+_:\S+ :is _:\S+ \.\s+\} \.'],
     {"prefixes": {"": "http://ex/"}}),
    ("quickvar statement", '@prefix : <http://ex/>. :s :p ?o .',
     [r'(?m)^:s :p \?o \.$'], {"prefixes": {"": "http://ex/"}}),
    ("list plus member statements",
     '@prefix : <http://ex/>. ( "one"  "two" ) a :whatever. '
     '"one" a :SUCCESS. "two" a :SUCCESS.',
     [r'\(\s*"one"\s+"two"\s*\) a :whatever\s*\.',
      r'(?m)^"one" a :SUCCESS \.$',
      r'(?m)^"two" a :SUCCESS \.$'],
     {"prefixes": {"": "http://ex/"}}),
    # writer_spec.rb:552-571 "nested": bpl with a formula object that
    # itself holds bpls (ordering softened — order_subjects differs
    # on ties; structure and content pinned)
    ("nested bpl with formula object",
     '@prefix doc: <http://www.w3.org/2000/10/swap/pim/doc#> .\n'
     '@prefix ex: <http://www.example.net/2000/10/whatever#> .\n'
     '@prefix contact: <http://www.w3.org/2000/10/swap/pim/contact#> .\n'
     '[] doc:creator [contact:email <mailto:fred@example.com> ];\n'
     '   ex:says { [] doc:title "Huckleberry Finn";\n'
     '     doc:creator [contact:knownAs "Mark Twain"] }.',
     [r'ex:says \{',
      r'doc:creator \[contact:knownAs "Mark Twain"\]',
      r'doc:title "Huckleberry Finn"',
      r'doc:creator \[contact:email <mailto:fred@example\.com>\]'],
     {"prefixes": {"doc": "http://www.w3.org/2000/10/swap/pim/doc#",
                   "ex": "http://www.example.net/2000/10/whatever#",
                   "contact":
                       "http://www.w3.org/2000/10/swap/pim/contact#"}}),
    # writer_spec.rb:598-615 "implication": quantified list subject
    # inside the antecedent, strict no-padding "(17)" list form
    ("implication with list subjects",
     '@prefix : <http://a/b#> .\n'
     '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n'
     '("17"^^xsd:integer) a :TestCase .\n'
     '{ ( ?x ) a :TestCase }  => { ?x a :RESULT } .',
     [r'\(17\) a :TestCase \.',
      r'\(\?x\) a :TestCase \.',
      r'\?x a :RESULT \.'],
     {"prefixes": {"": "http://a/b#",
                   "xsd": "http://www.w3.org/2001/XMLSchema#"}}),
]


@pytest.mark.parametrize(
    "case", _WRITER_FORMULA_CASES, ids=[c[0] for c in _WRITER_FORMULA_CASES])
def test_writer_formula_surface(case):
    name, doc, regexps, opts = case
    r = parse_n3(doc, base_uri="http://a/b")
    assert not r.errors, (name, r.errors)
    out = serialize_n3(r.quads, **opts)
    for rx in regexps:
        assert _re2.search(rx, out), f"{name}: /{rx}/ not found in:\n{out}"
    back = parse_n3(out, base_uri="http://a/b")
    assert not back.errors, (name, out, back.errors)
    assert isomorphic(r.quads, back.quads), (name, out)


# literal canonicalization option (writer_spec.rb:339-513 tables)
_CANON_LITERAL_CASES = [
    ('"true"^^xsd:boolean', r'(?m) true \.$'),
    ('"TrUe"^^xsd:boolean', r'(?m) true \.$'),
    ('"1"^^xsd:boolean', r'(?m) true \.$'),
    ("true", r'(?m) true \.$'),
    ('"false"^^xsd:boolean', r'(?m) false \.$'),
    ('"FaLsE"^^xsd:boolean', r'(?m) false \.$'),
    ('"0"^^xsd:boolean', r'(?m) false \.$'),
    ("false", r'(?m) false \.$'),
    ('"1"^^xsd:integer', r'(?m) 1 \.$'),
    ("1", r'(?m) 1 \.$'),
    ('"010"^^xsd:integer', r'(?m) 10 \.$'),
    ('"+5"^^xsd:integer', r'(?m) 5 \.$'),
    ('"1.50"^^xsd:decimal', r'(?m) 1\.5 \.$'),
    # doubles: canonical mantissa-in-[1,10) with the exponent marker
    # DOWNCASED by the N3 writer (writer.rb:295 `.sub('E', 'e')`;
    # writer_spec.rb:474-513 expects 1.0e1 / 1.002e2 forms)
    ('"1.0e3"^^xsd:double', r'(?m) 1\.0e3 \.$'),
    ('"1.0e1"^^xsd:double', r'(?m) 1\.0e1 \.$'),
    ('"0.1e1"^^xsd:double', r'(?m) 1\.0e0 \.$'),
    ('"10.02e1"^^xsd:double', r'(?m) 1\.002e2 \.$'),
    ('"14"^^xsd:double', r'(?m) 1\.4e1 \.$'),
    # xsd:int is NOT xsd:integer: stays a typed literal even under
    # canonicalize (writer_spec.rb:420-434 — only the XSD.integer
    # branch bare-tokenizes)
    ('"1"^^xsd:int', r'"1"\^\^xsd:int \.'),
    # invalid double lexicals pass through UNTOUCHED under
    # canonicalize — the writer's E->e downcase applies only to
    # successfully canonicalized forms (review finding: a blanket
    # replace would mutate "brokEn" to "broken")
    ('"brokEn"^^xsd:double', r'"brokEn"\^\^xsd:double \.'),
    ('"NaN"^^xsd:double', r'"NaN"\^\^xsd:double \.'),
]


@pytest.mark.parametrize("case", _CANON_LITERAL_CASES,
                         ids=[c[0] for c in _CANON_LITERAL_CASES])
def test_writer_canonicalize_literals(case):
    lit, rx = case
    doc = ('@prefix xsd: <http://www.w3.org/2001/XMLSchema#> . '
           f'<http://a> <http://b> {lit} .')
    r = parse_n3(doc)
    assert not r.errors, r.errors
    out = serialize_n3(r.quads, canonicalize=True)
    assert _re2.search(rx, out), (lit, out)


def test_named_graphs_keep_their_name():
    """writer_spec.rb:572-597 'named with URI'/'named with BNode': a
    4-term quad whose graph label is an IRI or a user bnode (the
    N-Quads reader path — there is no TriG reader, matching the
    reference whose trig input arrives via RDF::TriG) renders as
    `<name> = { ... } .`, never as an anonymous orphan formula."""
    from rdf_n3_ray.serializer.n3_writer import serialize_n3

    quads = [("<http://a/a>", "<http://a/b>", "<http://a/c>", None),
             ("<http://a/A>", "<http://a/b>", "<http://a/c>",
              "<http://a/C>")]
    out = serialize_n3(quads)
    assert _re2.search(r'(?m)^<http://a/a> <http://a/b> <http://a/c> \.$',
                       out)
    assert _re2.search(r'<http://a/C> = \{', out)
    assert _re2.search(r'<http://a/A> <http://a/b> <http://a/c> \.', out)
    assert _re2.search(r'\} \.', out)

    bq = [("<http://a/a>", "<http://a/b>", "<http://a/c>", None),
          ("<http://a/A>", "<http://a/b>", "<http://a/c>", "_:C")]
    outb = serialize_n3(bq)
    assert _re2.search(r'_:C = \{', outb)
    # a minted formula label keeps the anonymous `{ ... } .` form
    fq = [("<http://a/A>", "<http://a/b>", "<http://a/c>", "_:x_form_1")]
    outf = serialize_n3(fq)
    assert "= {" not in outf and outf.lstrip().startswith("{")


def test_explicit_formula_labels_disable_heuristic():
    """ADVICE r2: a USER-authored bnode labeled like _:x_form_1 must not
    be misrendered as '{}' when the caller supplies the authoritative
    formula set; the label-pattern heuristic remains the default for
    bare quad-set callers."""
    from rdf_n3_ray.serializer.n3_writer import serialize_n3

    quads = [("_:x_form_1", "<http://ex/p>", '"v"', None)]
    # explicit (empty) formula set: plain bnode rendering, no '{'
    out = serialize_n3(quads, formula_labels=set())
    assert "{" not in out and '"v"' in out
    # default heuristic keeps legacy behavior (documented fallback)
    legacy = serialize_n3(quads)
    assert "{" in legacy


def test_parse_result_formula_labels_round_trip():
    """ParseResult.formula_labels carries every minted formula node —
    including EMPTY {} formulae — so writer round-trips are exact
    without label-pattern guessing."""
    from rdf_n3_ray.parser.n3_parser import parse_n3
    from rdf_n3_ray.serializer.n3_writer import serialize_n3

    text = '@prefix : <http://ex/> .\n{ :a :b :c } :says :x .\n{} :p :q .\n'
    r = parse_n3(text)
    assert r.ok
    assert len(r.formula_labels) == 2
    out = serialize_n3(r.quads, formula_labels=r.formula_labels)
    assert "{}" in out            # empty formula survives
    assert "{ <http://ex/a> <http://ex/b> <http://ex/c> . }" in out


def test_orphan_formula_emitted_as_subject_only_statement():
    """A formula parsed from a subject-only statement (`{ ... } .` is
    valid surface N3 — `triples ::= subject predicateObjectList?`) is
    never referenced from an outer quad; the writer must still emit it
    (as a subject-only `{ ... } .`) so its quads survive round-trip."""
    text = '@prefix : <http://ex/> .\n{ :a :b :c . :d :e :f } .\n'
    r = parse_n3(text)
    assert not r.errors, r.errors
    assert len(r.quads) == 2
    out = serialize_n3(r.quads,
                       formula_labels=getattr(r, "formula_labels", None))
    back = parse_n3(out)
    assert not back.errors, (out, back.errors)
    assert isomorphic(r.quads, back.quads), (out, back.quads)
    # nested orphan: outer orphan references an inner formula — one
    # root statement, fixpoint consumes the inner one
    text2 = '@prefix : <http://ex/> .\n{ :x :says { :y :z :w } } .\n'
    r2 = parse_n3(text2)
    assert not r2.errors
    out2 = serialize_n3(r2.quads,
                        formula_labels=getattr(r2, "formula_labels", None))
    back2 = parse_n3(out2)
    assert not back2.errors, (out2, back2.errors)
    assert isomorphic(r2.quads, back2.quads), (out2, back2.quads)


def test_round_trip_full_conformance_suite():
    """Every PositiveSyntax/Eval input of the vendored 395-case suite
    must survive parse -> serialize -> reparse isomorphically (pins the
    writer against the complete grammar surface the parser accepts,
    including formula terms, list ladders, langtags, and escapes)."""
    from fixtures.n3_suite import CASES

    checked = 0
    for cid, ctype, text, _exp, opts in CASES:
        if ctype not in ("PositiveSyntax", "Eval"):
            continue
        orig = parse_n3(text, **opts)
        if orig.errors:
            continue  # lenient-mode recoveries are out of scope here
        out = serialize_n3(orig.quads,
                           formula_labels=getattr(orig, "formula_labels",
                                                  None))
        back = parse_n3(out, list_terms=opts.get("list_terms", False))
        assert not back.errors, (cid, out, back.errors)
        assert isomorphic(orig.quads, back.quads), (
            f"{cid}\nIN:\n{text}\nOUT:\n{out}\n"
            f"GOT:{back.quads}\nWANT:{orig.quads}")
        checked += 1
    assert checked >= 200, checked


def test_list_term_mode_renders_member_sugar():
    """First-class list terms (list_terms mode) re-render members
    through the full term formatter: numeric/boolean bare tokens and
    nested lists — `(1 2 3)`, not `("1"^^xsd:integer ...)` — matching
    the ladder path and the reference's collection form
    (writer.rb:497-512)."""
    from rdf_n3_ray.parser.n3_parser import parse_n3
    from rdf_n3_ray.serializer.n3_writer import serialize_n3

    q = parse_n3("@prefix : <http://ex/> . :s :p (1 2 3) .",
                 list_terms=True).quads
    assert "(1 2 3)" in serialize_n3(q)

    q = parse_n3('@prefix : <http://ex/> . :s :p (1 ("a"@en 2.5) true ()) .',
                 list_terms=True).quads
    assert '(1 ("a"@en 2.5) true ())' in serialize_n3(q)

    # subject-position list (rule-style) gets the same treatment
    q = parse_n3("@prefix : <http://ex/> . (1 2) :sum 3 .",
                 list_terms=True).quads
    out = serialize_n3(q)
    assert "(1 2) <http://ex/sum> 3 ." in out


def test_golden_byte_locks():
    """Byte-level golden locks for canonical writer shapes (ordering,
    POL grouping, bnode/[ ] sugar, formula rendering) — regression
    pins on the writer's reference-shaped output."""
    from rdf_n3_ray.parser.n3_parser import parse_n3
    from rdf_n3_ray.serializer.n3_writer import serialize_n3

    def rt(src, **kw):
        return serialize_n3(parse_n3(src, list_terms=True).quads, **kw)

    got = rt("@prefix ex: <http://example.org/> . "
             "ex:b ex:p ex:o . ex:a ex:p ex:o ; ex:q 5 .")
    assert got == (
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n\n"
        "<http://example.org/a> <http://example.org/p> "
        "<http://example.org/o>;\n"
        "    <http://example.org/q> 5 .\n"
        "<http://example.org/b> <http://example.org/p> "
        "<http://example.org/o> .\n")

    got = rt("@prefix : <http://ex/> . :s :p [ :q :r ] .")
    assert got == ("<http://ex/s> <http://ex/p> [<http://ex/q> "
                   "<http://ex/r>] .\n")

    got = rt("@prefix : <http://ex/> . { :a :b :c } => { :d :e :f } .")
    assert got == (
        "@prefix log: <http://www.w3.org/2000/10/swap/log#> .\n\n"
        "{ <http://ex/a> <http://ex/b> <http://ex/c> . } => "
        "{ <http://ex/d> <http://ex/e> <http://ex/f> . } .\n")


def test_list_member_bnode_identity_and_prefixes():
    """Bnodes shared between a list member and another position keep
    their label (round trip stays isomorphic), and namespaces used
    ONLY inside a list term still mint a prefix declaration."""
    from rdf_n3_ray.isomorphism import isomorphic
    from rdf_n3_ray.parser.n3_parser import parse_n3
    from rdf_n3_ray.serializer.n3_writer import serialize_n3

    for src in (
        "@prefix : <http://ex/> . _:b :q :r . :s :p (_:b _:b) .",
        "@prefix : <http://ex/> . :s :o _:b . :s :p (_:b) .",
    ):
        r = parse_n3(src, list_terms=True)
        back = parse_n3(serialize_n3(r.quads, prefixes=r.prefixes),
                        list_terms=True).quads
        assert isomorphic(r.quads, back)

    r = parse_n3("@prefix ex: <http://example.org/> . "
                 "@prefix : <http://ex/> . :s :p (ex:a ex:b) .",
                 list_terms=True)
    out = serialize_n3(r.quads, prefixes=r.prefixes)
    assert "@prefix ex: <http://example.org/> ." in out
    assert "(ex:a ex:b)" in out
