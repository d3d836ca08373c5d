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


def test_cli_read_source_url_and_base_resolution():
    """`n3.py parse <url>` fetches over real HTTP and resolves relative
    IRIs against the URL (the reference's RDF::Reader.open behavior,
    script/parse:26-46)."""
    import http.server
    import importlib.util
    import os
    import threading

    spec = importlib.util.spec_from_file_location(
        "n3cli", os.path.join(os.path.dirname(__file__), "..",
                              "scripts", "n3.py"))
    n3cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(n3cli)

    doc = b"@prefix : <http://ex/> . <rel> :b :c ."

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(doc)))
            self.end_headers()
            self.wfile.write(doc)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/dir/doc.n3"
        text, base = n3cli._read_source(url)
        assert text == doc.decode() and base == url
        from rdf_n3_ray.parser.n3_parser import parse_n3

        quads = parse_n3(text, base_uri=base).quads
        assert quads[0][0] == \
            f"<http://127.0.0.1:{srv.server_address[1]}/dir/rel>"
    finally:
        srv.shutdown()
        srv.server_close()
