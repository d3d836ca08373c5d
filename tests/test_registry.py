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


def test_read_nt_files_nquads_reload(ray_session, tmp_path):
    """A .nq engine dump (4-term formula lines) reloads through
    read_n3_files via the fast-path reader."""
    from rdf_n3_ray.isomorphism import isomorphic
    from rdf_n3_ray.parser.n3_parser import parse_n3
    from rdf_n3_ray.serializer.n3_writer import to_ntriples
    from rdf_n3_ray.sources.n3_files import read_n3_files

    orig = parse_n3(
        "@prefix : <http://ex/>. :g :says { :a :b :c } . :x :y 5 .")
    assert not orig.errors
    p = tmp_path / "dump.nq"
    p.write_text(to_ntriples(orig.quads))
    ds = read_n3_files([str(p)])
    df = ds.to_pandas()
    got = [(r.subj, r.pred, r.obj,
            r.graph if isinstance(r.graph, str) and r.graph else None)
           for r in df.itertuples()]
    assert isomorphic(got, orig.quads)
