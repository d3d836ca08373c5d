"""Distributed N3/Turtle/N-Triples file source.

The reference's `script/parse` (script/parse:26-100) reads documents
one at a time in-process; here each file is a row and parsing fans out
through the same per-document parser used by the transcript stage:

    read_n3_files(paths) ->
        Dataset(doc:string, subj, pred, obj, graph, subj_kind,
                obj_kind, emit_idx)

Files are read with ray.data.read_binary_files(include_paths=True) so
block assignment and retry semantics are Ray-native; each file's
triples are deterministic in its own path (bnode labels salted by the
doc identity is unnecessary — labels are file-scoped like the
reference's per-Reader labeler).
"""
from __future__ import annotations

import pyarrow as pa

from ..parser.n3_parser import parse_n3, parse_ntriples
from ..terms import kind_of


def _parse_files(batch: pa.Table, base_from_path: bool,
                 list_terms: bool) -> pa.Table:
    paths = batch.column("path").to_pylist()
    blobs = batch.column("bytes").to_pylist()
    oc, os_, op, oo, og, oe, oerr = [], [], [], [], [], [], []
    for path, blob in zip(paths, blobs):
        text = blob.decode("utf-8", "replace")
        base = f"file://{path}" if base_from_path else None
        if path.endswith((".nt", ".nq")):
            # engine dump reload: the line-oriented fast path also
            # accepts the 4th graph term full N3 cannot.  Lenient like
            # the N3 path (recover past bad statements, never drop the
            # file), and the same base resolution for relative IRIs;
            # list_terms is moot — NT has no collection syntax, ladders
            # stay ladders in both modes
            result = parse_ntriples(text, validate=False, base_uri=base)
        else:
            result = parse_n3(text, base_uri=base, list_terms=list_terms)
        emit = 0
        n_err = len(result.errors)
        for s, p, o, g in result.quads:
            oc.append(path)
            os_.append(s)
            op.append(p)
            oo.append(o)
            og.append(g)
            oe.append(emit)
            oerr.append(n_err)
            emit += 1
        if not result.quads and n_err:
            # corrupt file with nothing recovered: emit a sentinel row so
            # the error is visible downstream, never silently dropped
            oc.append(path)
            os_.append("")
            op.append("")
            oo.append("")
            og.append(None)
            oe.append(-1)
            oerr.append(n_err)
    return pa.table({
        "doc": pa.array(oc, pa.string()),
        "subj": pa.array(os_, pa.string()),
        "pred": pa.array(op, pa.string()),
        "obj": pa.array(oo, pa.string()),
        "graph": pa.array(og, pa.string()),
        "subj_kind": pa.array([kind_of(s) for s in os_], pa.int8()),
        "obj_kind": pa.array([kind_of(o) for o in oo], pa.int8()),
        "emit_idx": pa.array(oe, pa.int32()),
        "n_errors": pa.array(oerr, pa.int32()),
    })


def read_n3_files(paths, base_from_path: bool = True,
                  list_terms: bool = False, **read_kwargs):
    """paths: file/dir paths or glob list. Returns the triple Dataset."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True, **read_kwargs)
    return files.map_batches(
        lambda b: _parse_files(b, base_from_path, list_terms),
        batch_format="pyarrow")
