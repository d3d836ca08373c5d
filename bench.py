"""Benchmark harness (driver contract, BASELINE.md).

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "kg_turns": N, "kg_turns_per_sec": X}

`--scaling`: same job in fresh processes at num_cpus=8 and 32 (the
sandbox stand-in for N- vs 4N-node clusters); reports both throughputs
and the scaling efficiency.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from rdf_n3_ray.pipelines import relational as R
    from rdf_n3_ray.pipelines.kg import build_kg_dataset
    from rdf_n3_ray.sources.transcripts import transcripts_dataset
    from rdf_n3_ray.stages.neardup import minhash_lsh_dedup

    timings: dict[str, float] = {}

    # warm the page cache so we measure compute+shuffle, not first read
    R._read(sf_dir, "lineitem").count()

    def timed(name, fn):
        t0 = time.time()
        result = fn()
        timings[name] = round(time.time() - t0, 3)
        return result

    # headline: KG construction over the synthetic transcript table
    n_convs, turns = 2500, 20  # ~50k turns
    ts = transcripts_dataset(n_convs=n_convs, turns_per_conv=turns,
                             override_num_blocks=num_cpus * 4)
    kg_turns = ts.count()
    kg_rows = timed("kg_build", lambda: build_kg_dataset(ts).count())

    timed("lineitem_agg", lambda: R.lineitem_agg(sf_dir).to_pandas())
    timed("events_hourly", lambda: R.events_hourly(sf_dir).to_pandas())
    timed("orders_by_nation", lambda: R.orders_by_nation(sf_dir).to_pandas())
    timed("top_events", lambda: R.top_events(sf_dir).to_pandas())
    timed("doc_token_stats", lambda: R.doc_token_stats(sf_dir).to_pandas())
    timed(
        "minhash_pairs",
        lambda: minhash_lsh_dedup(
            R._read(sf_dir, "documents", columns=["doc_id", "text"]),
            threshold=0.5,
        ).count(),
    )
    timed("ann_topk", lambda: R.ann_topk(sf_dir))

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "kg_construction+ops total wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "kg_turns": int(kg_turns),
        "kg_triples": int(kg_rows),
        "kg_turns_per_sec": round(kg_turns / timings["kg_build"], 1),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    tp_lo = lo["kg_turns_per_sec"]
    tp_hi = hi["kg_turns_per_sec"]
    eff_kg = (tp_hi / tp_lo) / (32 / 8)
    eff_total = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling efficiency 8->32 cpus",
        "kg_turns_per_sec_8": tp_lo,
        "kg_turns_per_sec_32": tp_hi,
        "kg_scaling_efficiency": round(eff_kg, 3),
        "total_sec_8": lo["value"],
        "total_sec_32": hi["value"],
        "total_scaling_efficiency": round(eff_total, 3),
        "queries_8": lo["queries"],
        "queries_32": hi["queries"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
