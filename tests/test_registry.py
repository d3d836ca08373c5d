"""Format registry / detection tests (format.rb:19-99, format_spec.rb:9-39)."""
from rdf_n3_ray.sources.registry import detect, for_content_type, for_extension


def test_content_types():
    assert for_content_type("text/n3").name == "n3"
    assert for_content_type("text/turtle; charset=utf-8").name == "turtle"
    assert for_content_type("application/n-triples").name == "ntriples"
    assert for_content_type("application/json") is None


def test_extensions():
    assert for_extension("foo.n3").name == "n3"
    assert for_extension("FOO.TTL").name == "turtle"
    assert for_extension("x.nt").name == "ntriples"
    assert for_extension("x.csv") is None


def test_detect():
    assert detect("<a> <b> <c> .") == "ntriples"
    assert detect("@prefix : <x> .\n:a :b { :c :d :e } .") == "n3"
    assert detect(":a :b :c . { :x :y :z } => { :q :r :s } .") == "n3"
