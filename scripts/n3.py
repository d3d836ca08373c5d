"""CLI — the engine's equivalent of the reference's `script/parse` and
the CLI `reason` command (format.rb:37-97; script/parse:24-100).

  python scripts/n3.py parse [--validate] [--canonicalize] FILE...
  python scripts/n3.py reason [--think] [--conclusions|--data|--strings] FILE...
  python scripts/n3.py pipeline --out DIR [--convs N] [--turns K]   # KG job

Owns its Ray session (the library never calls ray.init).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdf_n3_ray.datatune import tune_data_context  # noqa: E402

tune_data_context()  # polars sort path for the Ray-backed subcommands


def _read_source(path: str) -> tuple[str, str]:
    """(text, base_uri) for a local path or an http(s) URL — the CLI
    twin of the reference's RDF::Reader.open, which accepts either
    (script/parse:26-46)."""
    from urllib.parse import urlsplit

    if urlsplit(path).scheme.lower() in ("http", "https"):
        from rdf_n3_ray.sources.webfetch import urllib_fetcher

        # document loads get a larger cap than rule-input fetches (a
        # local file has none); failures surface as clean OSErrors
        try:
            text = urllib_fetcher(max_bytes=256 * 1024 * 1024)(path)
        except Exception as e:
            raise OSError(f"could not fetch {path}: {e}") from e
        if text is None:
            raise OSError(f"could not fetch {path}")
        return text, path
    return (open(path, encoding="utf-8").read(),
            f"file://{os.path.abspath(path)}")


def cmd_parse(args) -> int:
    from rdf_n3_ray.parser.n3_parser import parse_n3
    from rdf_n3_ray.serializer.n3_writer import to_ntriples

    total, t0, had_errors = 0, time.time(), False
    for path in args.files:
        text, base = _read_source(path)
        r = parse_n3(text, base_uri=base,
                     validate=args.validate, canonicalize=args.canonicalize,
                     legacy=args.legacy)
        for e in r.errors:
            print(f"# error: {e}", file=sys.stderr)
        had_errors = had_errors or bool(r.errors)
        sys.stdout.write(to_ntriples(r.quads))
        total += len(r.quads)
    el = time.time() - t0
    print(f"Parsed {total} statements in {el:.3f} seconds @ {total / max(el, 1e-9):.1f} statements/second.",
          file=sys.stderr)
    # exit 1 on parse errors, like the reference's script/parse rescue
    return 1 if had_errors else 0


def cmd_reason(args) -> int:
    from rdf_n3_ray.algebra.engine import reason_n3
    from rdf_n3_ray.serializer.n3_writer import serialize_n3, to_ntriples

    fetcher = None
    if getattr(args, "web", False):
        from rdf_n3_ray.sources.webfetch import urllib_fetcher

        fetcher = urllib_fetcher()
    for path in args.files:
        text, base = _read_source(path)
        result = reason_n3(text, think=args.think,
                           base_uri=base,
                           legacy=args.legacy,
                           max_iterations=args.max_iterations,
                           fetcher=fetcher)
        if args.strings:
            sys.stdout.write(result.strings)
        elif args.conclusions:
            sys.stdout.write(serialize_n3(result.conclusions(),
                                          prefixes=result.prefixes))
        elif args.data:
            sys.stdout.write(serialize_n3(result.data(),
                                          prefixes=result.prefixes))
        else:
            sys.stdout.write(to_ntriples(result.quads))
    return 0


def cmd_pipeline(args) -> int:
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from rdf_n3_ray.pipelines.kg import run_kg_job

    metrics = run_kg_job(args.out, n_convs=args.convs,
                         turns_per_conv=args.turns, n_shards=args.shards)
    print(metrics)
    ray.shutdown()
    return 0


def cmd_append(args) -> int:
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from rdf_n3_ray.pipelines.kg import append_kg_job

    metrics = append_kg_job(args.out, n_convs=args.convs, lo=args.lo,
                            hi=args.hi, turns_per_conv=args.turns)
    print(metrics)
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from rdf_n3_ray.pipelines.kg import compact_kg_job

    print(compact_kg_job(args.out))
    ray.shutdown()
    return 0


def cmd_diff(args) -> int:
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from rdf_n3_ray.pipelines.kg import kg_diff

    print(kg_diff(args.a, args.b, out_dir=args.out))
    ray.shutdown()
    return 0


def main() -> int:
    p = argparse.ArgumentParser(prog="n3")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("parse")
    pp.add_argument("files", nargs="+")
    pp.add_argument("--validate", action="store_true")
    pp.add_argument("--canonicalize", action="store_true")
    pp.add_argument("--legacy", action="store_true",
                    help="accept cwm-era @forAll/@forSome/@keywords")
    pp.set_defaults(fn=cmd_parse)

    pr = sub.add_parser("reason")
    pr.add_argument("files", nargs="+")
    pr.add_argument("--think", action="store_true")
    pr.add_argument("--conclusions", action="store_true")
    pr.add_argument("--data", action="store_true")
    pr.add_argument("--strings", action="store_true")
    pr.add_argument("--legacy", action="store_true",
                    help="accept cwm-era @forAll/@forSome/@keywords")
    pr.add_argument("--web", action="store_true",
                    help="dereference http(s) IRIs for log:content/"
                         "log:semantics (stdlib urllib fetcher)")
    pr.add_argument("--max-iterations", type=int, default=100,
                    help="fixpoint bound (deep closures need more)")
    pr.set_defaults(fn=cmd_reason)

    pl = sub.add_parser("pipeline")
    pl.add_argument("--out", required=True)
    pl.add_argument("--convs", type=int, default=1000)
    pl.add_argument("--turns", type=int, default=20)
    pl.add_argument("--shards", type=int, default=8)
    pl.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    pl.set_defaults(fn=cmd_pipeline)

    pa_ = sub.add_parser(
        "append", help="incrementally ingest conv range [lo, hi) into "
        "an existing pipeline output (hash-sidecar anti-join)")
    pa_.add_argument("--out", required=True)
    pa_.add_argument("--convs", type=int, required=True,
                     help="transcript-universe size")
    pa_.add_argument("--lo", type=int, required=True)
    pa_.add_argument("--hi", type=int, required=True)
    pa_.add_argument("--turns", type=int, default=20)
    pa_.add_argument("--num-cpus", type=int,
                     default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    pa_.set_defaults(fn=cmd_append)

    pc = sub.add_parser(
        "compact", help="merge committed stages (final + appends) into "
        "one generation")
    pc.add_argument("--out", required=True)
    pc.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    pc.set_defaults(fn=cmd_compact)

    pd_ = sub.add_parser(
        "diff", help="quad-level diff of two committed KB directories "
        "(hash-sidecar anti-joins; writes differing quads when --out "
        "is given)")
    pd_.add_argument("a")
    pd_.add_argument("b")
    pd_.add_argument("--out", default=None)
    pd_.add_argument("--num-cpus", type=int,
                     default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    pd_.set_defaults(fn=cmd_diff)

    args = p.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
